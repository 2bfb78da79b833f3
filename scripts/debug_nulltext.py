"""Root-cause the red null-text+PnP parity case (epsilon=1.0).

Replicates tests/test_e2e_pnp_parity.py::test_nulltext_pnp_matches_reference
[1.0-...] but instruments both sides: per outer step, print the reference's
per-Adam-iteration losses + break point, and ours; then the carry diff after
each step.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import conftest  # noqa: F401  (forces cpu platform, stack limits, cache)

import numpy as np
import torch
import jax
import jax.numpy as jnp
from types import SimpleNamespace

from test_e2e_text_parity import _install_shims, _TextEnc, _Tok, _UNetWrap
from test_torch_parity import _load_ref_module, _randomize, _state_np
from test_torch_parity_sd import _TorchSDUNet
from test_e2e_pnp_parity import (
    _attach_diffusers_attn_api, _attach_diffusers_resnet_api, S, ATTN_T, F_T,
    PROMPTS,
)

_install_shims()
ref_pnp_utils = _load_ref_module(
    "ref_pnp_utils_e2e", "text-guided/plug_n_play/pnp_utils.py")
ref_base = _load_ref_module(
    "ref_pnp_baselines_e2e", "text-guided/inversion/pnp_baselines.py")
ref_ddim = _load_ref_module(
    "ref_ddim_inv_pnp", "text-guided/inversion/ddim_inversion.py")

tm = _TorchSDUNet()
_randomize(tm, 20)

from hedit_tpu.core.schedule import Schedule

sched = Schedule.create(S)
fake_sched = SimpleNamespace(
    alphas_cumprod=torch.from_numpy(np.asarray(sched.alphas_cumprod).copy()),
    alphas=torch.from_numpy(np.asarray(sched.alphas).copy()),
    final_alpha_cumprod=torch.from_numpy(
        np.asarray(sched.final_alpha_cumprod).copy()),
    timesteps=torch.from_numpy(np.asarray(sched.timesteps).copy()).long(),
    num_inference_steps=S,
    config=SimpleNamespace(num_train_timesteps=1000),
)
wrap = _UNetWrap(tm, 16)
wrap.up_blocks = tm.up_blocks
wrap.down_blocks = tm.down_blocks
wrap.mid_block = tm.mid_block
pipe = SimpleNamespace(
    unet=wrap, scheduler=fake_sched, tokenizer=_Tok(),
    text_encoder=_TextEnc(), device=torch.device("cpu"),
)

rng = np.random.RandomState(4)
w0 = rng.randn(1, 4, 16, 16).astype(np.float32) * 0.3
with torch.no_grad():
    _, zs_ddim, lat_ddim = ref_ddim.ddim_inversion(
        pipe, torch.from_numpy(w0), PROMPTS[0], 1.0)
xts_ddim = torch.cat(lat_ddim)

for res, blocks in {1: [1, 2], 2: [0, 1, 2], 3: [0, 1, 2]}.items():
    for b in blocks:
        _attach_diffusers_attn_api(
            tm.up_blocks[res].attentions[b].transformer_blocks[0].attn1)
_attach_diffusers_resnet_api(tm.up_blocks[1].resnets[1])
qk_ts = fake_sched.timesteps[: int(S * ATTN_T)]
conv_ts = fake_sched.timesteps[: int(S * F_T)]
ref_pnp_utils.register_attention_control_efficient(
    SimpleNamespace(unet=tm), qk_ts)
ref_pnp_utils.register_conv_control_efficient(
    SimpleNamespace(unet=tm), conv_ts)

from hedit_tpu.control.pnp import pnp_step_gates
from hedit_tpu.io_utils.weights import convert_unet
from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

params = convert_unet(_state_np(tm))
model = UNet2DCondition(UNetConfig.tiny())


def eps_fn(x, t, c, ctrl):
    return model.apply(params, x, t, c, ctrl)


def ctx_of(prompt):
    ids = pipe.tokenizer(prompt).input_ids
    with torch.no_grad():
        return jnp.asarray(pipe.text_encoder(ids)[0].numpy())


qk_mask, conv_mask = pnp_step_gates(S, ATTN_T, F_T)
uncond, src, tar = ctx_of(""), ctx_of(PROMPTS[0]), ctx_of(PROMPTS[1])

epsilon = 1.0
zs_t, xts_t = zs_ddim, xts_ddim

# ---- reference side, instrumented copy of nulltext_pnp ----
import torch.nn.functional as F
from torch.optim import Adam

encode_text = ref_base.encode_text
reverse_step = ref_base.reverse_step
register_time = ref_base.register_time

cfg_scales = [1.0, 5.0]
prompts = PROMPTS
model_r = pipe
xT = xts_t[S]
xT_ori = xts_t[: S + 1]
zs = zs_t
optimization_steps = 10

batch_size = len(prompts)
cfg_scales_tensor = torch.Tensor(cfg_scales).view(-1, 1, 1, 1)
text_embeddings = encode_text(model_r, prompts)
uncond_embedding = encode_text(model_r, [""] * batch_size)
timesteps = model_r.scheduler.timesteps

xt = xT.expand(batch_size, -1, -1, -1)
op = list(timesteps[-zs.shape[0]:])
_, cfg_scales_tensor_tar = cfg_scales_tensor.chunk(2)

ref_losses = []
ref_xts = []
for i, t in enumerate(op):
    xt_recon, xt_target = xt.chunk(2)
    xtm1_ori = xT_ori[len(xT_ori) - i - 2]
    register_time(model_r, t.item())
    with torch.no_grad():
        noise_pred_cond = model_r.unet(
            xt_recon, t, encoder_hidden_states=text_embeddings[:1]).sample
    with torch.enable_grad():
        uncond_embed_optimized = uncond_embedding[0:1].detach().requires_grad_(True)
        optimizer = Adam([uncond_embed_optimized], lr=1e-2 * (1. - i / 100.))
        losses = []
        for j in range(optimization_steps):
            noise_pred_uncond = model_r.unet(
                xt_recon, t, encoder_hidden_states=uncond_embed_optimized).sample
            noise_pred_src = noise_pred_uncond + cfg_scales_tensor_tar * (
                noise_pred_cond - noise_pred_uncond)
            xtm1_recon = reverse_step(model_r, noise_pred_src, t, xt_recon,
                                      eta=0.0, variance_noise=None)
            loss = F.mse_loss(xtm1_recon, xtm1_ori)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            losses.append(loss.item())
            if loss.item() < epsilon + i * 2e-5:
                break
        ref_losses.append(losses)
    with torch.no_grad():
        uncond_out_src = model_r.unet(
            xt[0:1], t, encoder_hidden_states=uncond_embed_optimized).sample
        uncond_out_tar = model_r.unet(
            xt[1:2], t, encoder_hidden_states=uncond_embed_optimized).sample
        noise_pred_text = model_r.unet(
            xt, t, encoder_hidden_states=text_embeddings).sample
        cond_out_src, cond_out_tar = noise_pred_text.chunk(2)
        noise_pred_src = uncond_out_src + cfg_scales_tensor_tar * (
            cond_out_src - uncond_out_src)
        noise_pred_tar = uncond_out_tar + cfg_scales_tensor_tar * (
            cond_out_tar - uncond_out_tar)
    xt_0 = reverse_step(model_r, noise_pred_src, t, xt[0], eta=0.0,
                        variance_noise=None)
    xt_1 = reverse_step(model_r, noise_pred_tar, t, xt[1], eta=0.0,
                        variance_noise=None)
    xt = torch.cat([xt_0, xt_1])
    ref_xts.append(xt.detach().clone())

print("ref per-step losses:", ref_losses)

# ---- our side, instrumented eager replica of null_text_pnp body ----
from hedit_tpu.control.base import NO_CONTROL
from hedit_tpu.control.pnp import PnPControl
from hedit_tpu.edit.h_edit import make_step_grid
from hedit_tpu.edit.pnp_baselines import _pnp_pair_eps

N = S
xT_j = jnp.asarray(xts_t[S][None].numpy().transpose(0, 2, 3, 1))
xts_ori_j = jnp.asarray(xts_t[: S + 1].numpy().transpose(0, 2, 3, 1))
zs_j = jnp.asarray(zs_t.numpy().transpose(0, 2, 3, 1))
grid = make_step_grid(sched, zs_j, N)
gt_prev = xts_ori_j[::-1][1:]
b1, b2, adam_eps = 0.9, 0.999, 1e-8
cfg_tar = 5.0
lr_base = 1e-2

x_orig, x_edit = xT_j, xT_j
ours_losses = []
for i in range(N):
    t = grid.ts[i]
    xtm1_ori = gt_prev[i][None]
    qk_on, conv_on = qk_mask[i], conv_mask[i]
    cond_src = eps_fn(x_orig, jnp.broadcast_to(t, (1,)), src, NO_CONTROL)
    lr = lr_base * (1.0 - i / 100.0)
    thresh = epsilon + i * 2e-5

    u = uncond
    m = jnp.zeros_like(u)
    v = jnp.zeros_like(u)
    stopped = False
    losses = []
    for j in range(10):
        def loss_fn(uu):
            eps_u = eps_fn(x_orig, jnp.broadcast_to(t, (1,)), uu, NO_CONTROL)
            eps_cfg = eps_u + cfg_tar * (cond_src - eps_u)
            x_pred = sched.reverse_step(eps_cfg, t, x_orig, eta=0.0)
            return jnp.mean((x_pred - xtm1_ori) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(u)
        losses.append(float(loss))
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        jf = j + 1
        mhat = m / (1 - b1 ** jf)
        vhat = v / (1 - b2 ** jf)
        u = u - lr * mhat / (jnp.sqrt(vhat) + adam_eps)
        if float(loss) < thresh:
            break
    ours_losses.append(losses)

    pair = jnp.concatenate([x_orig, x_edit], axis=0)
    eps_src, eps_tar = _pnp_pair_eps(
        eps_fn, pair, t, src, tar, uncond, cfg_tar, qk_on, conv_on,
        uncond_override=u,
    )
    x_prev_orig = sched.reverse_step(eps_src, t, x_orig, eta=0.0)
    x_prev_edit = sched.reverse_step(eps_tar, t, x_edit, eta=0.0)
    x_orig, x_edit = x_prev_orig, x_prev_edit

    r = ref_xts[i].numpy()
    o = np.concatenate([np.asarray(x_orig), np.asarray(x_edit)], 0).transpose(0, 3, 1, 2)
    print(f"step {i}: ref losses {ref_losses[i]} ours {ours_losses[i]} "
          f"carry diff orig {np.abs(o[0]-r[0]).mean():.3e} "
          f"edit {np.abs(o[1]-r[1]).mean():.3e}")

# ---- gradient A/B at step 0: sign-flip census --------------------------- #
i0, t0 = 0, op[0]
xt0 = xT.expand(2, -1, -1, -1)
xt_recon0 = xt0.chunk(2)[0]
xtm1_ori0 = xT_ori[len(xT_ori) - 0 - 2]
register_time(model_r, t0.item())
with torch.no_grad():
    npc = model_r.unet(xt_recon0, t0, encoder_hidden_states=text_embeddings[:1]).sample
ue = uncond_embedding[0:1].detach().requires_grad_(True)
npu = model_r.unet(xt_recon0, t0, encoder_hidden_states=ue).sample
nps = npu + cfg_scales_tensor_tar * (npc - npu)
xr = reverse_step(model_r, nps, t0, xt_recon0, eta=0.0, variance_noise=None)
loss_t = F.mse_loss(xr, xtm1_ori0.unsqueeze(0))
loss_t.backward()
g_torch = ue.grad.detach().numpy()

x_orig0 = xT_j
cond_src0 = eps_fn(x_orig0, jnp.broadcast_to(grid.ts[0], (1,)), src, NO_CONTROL)
def loss_fn0(uu):
    eps_u = eps_fn(x_orig0, jnp.broadcast_to(grid.ts[0], (1,)), uu, NO_CONTROL)
    eps_cfg = eps_u + cfg_tar * (cond_src0 - eps_u)
    x_pred = sched.reverse_step(eps_cfg, grid.ts[0], x_orig0, eta=0.0)
    return jnp.mean((x_pred - gt_prev[0][None]) ** 2)
g_jax = np.asarray(jax.grad(loss_fn0)(uncond))

diff = np.abs(g_torch - g_jax)
flips = (np.sign(g_torch) != np.sign(g_jax))
print(f"grad A/B: max|diff|={diff.max():.3e} mean|diff|={diff.mean():.3e}")
print(f"sign flips: {flips.sum()}/{flips.size} ({100*flips.mean():.2f}%)")
print(f"|g_torch| at flipped elems: max={np.abs(g_torch)[flips].max():.3e} "
      f"median={np.median(np.abs(g_torch)[flips]):.3e}")
print(f"|g_torch| overall: median={np.median(np.abs(g_torch)):.3e} "
      f"90pct={np.percentile(np.abs(g_torch), 90):.3e}")
