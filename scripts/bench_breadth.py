"""Breadth timings on the real chip (seeded weights, bf16): per-call costs
for every workload family beyond the flagship bench, so PERF_NOTES can quote
measured numbers for the whole capability surface.

Measures (wall over N iters through the tunnel — dispatch amortized):
  sd.unet4        batch-4 SD UNet fwd (the flagship unit)
  sd.masactrl4    batch-4 fwd under MasaCtrl (fused-path k/v source swap)
  sd.pnp4         batch-4 fwd under PnP q/k injection gates
  sd.vae_enc/dec  512^2 VAE encode / decode (per-sample, once per image)
  sd.text         CLIP text encoder, 3 prompts
  face.unet       [1,256,256,3] CelebA-HQ DDPM UNet fwd
  face.id_vjp     ArcFace ID loss VJP through Tweedie (the per-opt-loop grad)
  face.lpips_vjp  VGG-LPIPS VJP through Tweedie
From these: face s/image estimate for the reference config (100 steps, K=3:
per step 1 + 3*2 = 7 UNet fwd + 3 ID VJPs + 3 LPIPS VJPs; + 100 fwd SDE
inversion).
"""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hedit_tpu.utils.profiling import device_sync  # noqa: E402  axon-safe barrier
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


# Barrier rationale: jax.block_until_ready can return EARLY through the axon
# tunnel (a 6.7 ms forward 'measured' at 0.3 ms); device execution is
# in-order, so reading real bytes of the last output (device_sync) proves
# every prior dispatch finished.


def timeit(name, fn, *args, iters=8):
    device_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<16} {ms:8.2f} ms/call")
    return ms


def seeded(shapes_tree):
    return jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes_tree)


def sd_section():
    from hedit_tpu.control.masactrl import MasaCtrlControl
    from hedit_tpu.control.pnp import PnPControl
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    ucfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    x4 = jnp.zeros((4, 64, 64, 4), jnp.bfloat16)
    t4 = jnp.full((4,), 500, jnp.int32)
    ctx4 = jnp.zeros((4, 77, 768), jnp.bfloat16)
    params = seeded(jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), x4, t4, ctx4))

    f_plain = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
    timeit("sd.unet4", f_plain, params, x4, t4, ctx4)

    masa = MasaCtrlControl(step=jnp.array(10, jnp.int32), start_step=4,
                           start_layer=10)
    f_masa = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c, masa))
    timeit("sd.masactrl4", f_masa, params, x4, t4, ctx4)

    pnp = PnPControl(qk_on=jnp.array(True), conv_on=jnp.array(True))
    x2 = x4[:2]
    f_pnp = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c, pnp))
    timeit("sd.pnp2", f_pnp, params, x2, t4[:2], ctx4[:2])

    from hedit_tpu.models.vae import AutoencoderKL, VAEConfig

    vcfg = dataclasses.replace(VAEConfig.sd(), dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    img = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    vparams = seeded(jax.eval_shape(vae.init, jax.random.PRNGKey(0), img))
    f_enc = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode_moments))
    f_dec = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
    timeit("sd.vae_enc", f_enc, vparams, img, iters=4)
    timeit("sd.vae_dec", f_dec, vparams, lat, iters=4)

    from hedit_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

    tcfg = CLIPTextConfig.sd15()
    tm = CLIPTextModel(tcfg)
    ids = jnp.zeros((3, 77), jnp.int32)
    tparams = seeded(jax.eval_shape(tm.init, jax.random.PRNGKey(0), ids))
    f_txt = jax.jit(lambda p, i: tm.apply(p, i))
    timeit("sd.text3", f_txt, tparams, ids, iters=4)


def face_section():
    from hedit_tpu.models.arcface import IRSE50, cosine_loss
    from hedit_tpu.models.ddpm_unet import DDPMConfig, DDPMUNet
    from hedit_tpu.models.lpips_vgg import LPIPSVgg

    # reference-parity dtype (the CLI runs f32 like the torch original)
    funet = DDPMUNet(DDPMConfig.celeba_hq())
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    fparams = seeded(jax.eval_shape(funet.init, jax.random.PRNGKey(0), x, t))
    f_face = jax.jit(lambda p, x, t: funet.apply(p, x, t))
    unet_ms = timeit("face.unet", f_face, fparams, x, t, iters=8)

    arc = IRSE50()
    aparams = seeded(jax.eval_shape(arc.init, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 112, 112, 3))))
    ref_emb = jnp.ones((1, 512), jnp.float32)
    eps_c = jnp.zeros((1, 256, 256, 3), jnp.float32)

    @jax.jit
    def id_vjp(xt):
        def obj(xx):
            x0 = (xx - 0.5 * eps_c) / 0.9
            return cosine_loss(aparams, arc, x0, ref_emb)
        return jax.grad(obj)(xt)

    id_ms = timeit("face.id_vjp", id_vjp, x, iters=8)

    lp = LPIPSVgg()
    lparams = seeded(jax.eval_shape(
        lp.init, jax.random.PRNGKey(0), x, x))
    src = jnp.zeros((1, 256, 256, 3), jnp.float32)

    @jax.jit
    def lp_vjp(xt):
        def obj(xx):
            x0 = (xx - 0.5 * eps_c) / 0.9
            return jnp.mean(lp.apply(lparams, x0, src))
        return jax.grad(obj)(xt)

    lp_ms = timeit("face.lpips_vjp", lp_vjp, x, iters=8)

    # reference config: 100-step SDE inversion (1 fwd/step) + 100 edit steps
    # of [1 fwd + K=3 * (2 fwd + 1 id VJP + 1 lpips VJP)]
    per_step = (1 + 6) * unet_ms + 3 * id_ms + 3 * lp_ms
    total_s = (100 * unet_ms + 100 * per_step) / 1e3
    print(f"face.s/image estimate (100 steps, K=3): {total_s:.2f} s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "sd"):
        sd_section()
    if which in ("all", "face"):
        face_section()
