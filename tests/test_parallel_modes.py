"""Data-parallel coverage for the last two hedit-p2p modes (VERDICT r3 #5):
``ef`` (controller-less EF baseline) and ``nmg_p2p`` (through-UNet L1
gradient guidance) — batched + mesh-sharded must equal the serial
per-sample path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hedit_tpu.edit.h_edit import HEditConfig
from hedit_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from hedit_tpu.parallel.sweep import stack_pytrees

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    from hedit_tpu.pipelines.sd import create_sd_pipeline

    S = 3
    pipe = create_sd_pipeline(tiny=True, num_inference_steps=S, seed=0)
    B = 4
    rs = np.random.RandomState(5)
    ucfg = pipe.unet.cfg
    x0s = jnp.asarray(rs.randn(B, ucfg.sample_size, ucfg.sample_size,
                               4).astype(np.float32) * 0.2)
    mk = lambda: jnp.asarray(  # noqa: E731
        rs.randn(B, 77, ucfg.cross_attention_dim).astype(np.float32) * 0.1)
    return dict(pipe=pipe, S=S, B=B, x0s=x0s,
                unconds=mk(), srcs=mk(), tars=mk())


def test_ef_batch_sharded_matches_serial(setup):
    """mode 'ef' through edit_batch_fn: DDPM inversion + plain target-CFG
    sampling (p2p_baselines.py:19-95), batch-4 over the 'data' axis."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from hedit_tpu.edit.h_edit import ef_sample
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.parallel.sweep import edit_batch_fn

    s = setup
    pipe, S, B = s["pipe"], s["S"], s["B"]
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0, eta=1.0)
    rngs = jax.random.split(jax.random.PRNGKey(3), B)

    def eps_plain(x, t, c):
        return pipe.unet.apply(pipe.unet_params, x, t, c)

    singles = []
    for b in range(B):
        inv = invert_ddpm(
            eps_plain, pipe.schedule, s["x0s"][b][None],
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            cfg_scale_src=1.0, eta=1.0, rng=rngs[b], step_chunk=2,
        )
        edited = ef_sample(
            eps_plain, pipe.schedule, inv.xts[S][None], inv.zs,
            uncond_ctx=s["unconds"][b][None], tar_ctx=s["tars"][b][None],
            cfg_tar=cfg.cfg_tar, eta=1.0, after_skip_steps=S,
        )
        singles.append(np.asarray(edited[0]))
    singles = np.stack(singles)

    mesh = make_mesh(4)
    fn = jax.jit(edit_batch_fn(pipe, cfg, mode="ef", after_skip_steps=S,
                               step_chunk=2))
    with jax.set_mesh(mesh):
        out = fn(replicate(pipe.unet_params, mesh),
                 shard_batch(s["x0s"], mesh),
                 shard_batch(s["unconds"], mesh),
                 shard_batch(s["srcs"], mesh),
                 shard_batch(s["tars"], mesh),
                 shard_batch(rngs, mesh))
        out.block_until_ready()
    assert "data" in str(out.sharding.spec)
    d = np.abs(np.asarray(out) - singles)
    # identical algebra; residual = batched-matmul accumulation order
    # (same bound rationale as test_parallel.py's flagship test)
    assert d.mean() < 3e-4 and d.max() < 3e-3, (d.mean(), d.max())


def test_nmg_p2p_batch_sharded_matches_serial(setup):
    """mode 'nmg_p2p' through edit_batch_p2p_fn: DDIM inversion + per-step
    L1 noise-map-guidance jax.grad through the UNet inside the vmapped
    per-sample body (reference dispatch main_p2p.py:241-243)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from hedit_tpu.edit.baselines import nmg_p2p
    from hedit_tpu.invert.ddim import invert_ddim
    from hedit_tpu.parallel.sweep import edit_batch_p2p_fn, neutral_blend
    from tests.test_parallel import _mk_controls_blends

    s = setup
    pipe, S, B = s["pipe"], s["S"], s["B"]
    ucfg = pipe.unet.cfg
    res = ucfg.sample_size // 4
    rs = np.random.RandomState(9)
    controls, _ = _mk_controls_blends(B, S, ucfg.num_heads, res, rs)
    blends = [neutral_blend(S, ucfg.num_heads, res) for _ in range(B)]
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0,
                      eta=1.0, is_ddim_inversion=True)
    rngs = jax.random.split(jax.random.PRNGKey(4), B)

    def eps_plain(x, t, c):
        return pipe.unet.apply(pipe.unet_params, x, t, c)

    def eps_ctrl(x, t, c, c_obj):
        if getattr(c_obj, "stores_attn", False):
            out, aux = pipe.unet.apply(pipe.unet_params, x, t, c, c_obj, True,
                                       mutable=["attn_store"])
            return out, aux["attn_store"]
        return pipe.unet.apply(pipe.unet_params, x, t, c, c_obj)

    singles = []
    for b in range(B):
        inv = invert_ddim(
            eps_plain, pipe.schedule, s["x0s"][b][None],
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            cfg_scale=1.0, step_chunk=2,
        )
        edited, _ = nmg_p2p(
            eps_ctrl, pipe.schedule, inv.xts[S][None], inv.xts[: S + 1],
            inv.zs, uncond_ctx=s["unconds"][b][None],
            src_ctx=s["srcs"][b][None], tar_ctx=s["tars"][b][None],
            cfg_tar=cfg.cfg_tar, after_skip_steps=S,
            control=controls[b], local_blend=blends[b],
        )
        singles.append(np.asarray(edited[0]))
    singles = np.stack(singles)

    mesh = make_mesh(4)
    fn = jax.jit(edit_batch_p2p_fn(pipe, cfg, mode="nmg_p2p",
                                   after_skip_steps=S, step_chunk=2))
    with jax.set_mesh(mesh):
        out = fn(replicate(pipe.unet_params, mesh),
                 shard_batch(s["x0s"], mesh),
                 shard_batch(s["unconds"], mesh),
                 shard_batch(s["srcs"], mesh),
                 shard_batch(s["tars"], mesh),
                 shard_batch(rngs, mesh),
                 jax.tree_util.tree_map(lambda x: shard_batch(x, mesh),
                                        stack_pytrees(controls)),
                 jax.tree_util.tree_map(lambda x: shard_batch(x, mesh),
                                        stack_pytrees(blends)))
        out.block_until_ready()
    assert "data" in str(out.sharding.spec)
    d = np.abs(np.asarray(out) - singles)
    # the through-UNet gradient amplifies accumulation-order noise vs the
    # forward-only modes; still orders of magnitude below inter-sample
    # spread (O(1e-1))
    assert d.mean() < 1e-3 and d.max() < 1e-2, (d.mean(), d.max())
