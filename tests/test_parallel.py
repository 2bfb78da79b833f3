"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_tests():
    """This module accumulates the suite's largest executables (batch-8
    sweeps, 12MB cached scans); with them retained, the style test's cache
    LOAD segfaults deterministically after ~13 in-module tests (round-4
    postmortem in PERF_NOTES — process-local XLA:CPU state decay; every
    entry loads clean in a fresh process).  Dropping executables per TEST
    (the suite-wide conftest does it per MODULE) keeps the process healthy;
    reloads come from the persistent disk cache."""
    yield
    jax.clear_caches()

from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
from hedit_tpu.parallel.mesh import (
    make_mesh,
    param_spec,
    shard_batch,
    shard_unet_params,
)


def test_mesh_axes():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_param_spec_rules():
    assert param_spec("down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q/kernel") == \
        jax.sharding.PartitionSpec(None, "model")
    assert param_spec("mid_block/attentions_0/transformer_blocks_0/attn2/to_out_0/kernel") == \
        jax.sharding.PartitionSpec("model", None)
    assert param_spec("down_blocks_0/resnets_0/conv1/kernel") == \
        jax.sharding.PartitionSpec(None, None, None, "model")
    assert param_spec("down_blocks_0/resnets_0/norm1/scale") == jax.sharding.PartitionSpec()


def test_shard_unet_params_and_batch():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=2)
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    x = jnp.zeros((4, 16, 16, 4))
    ctx = jnp.zeros((4, 77, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(1), ctx)
    sharded = shard_unet_params(params, mesh)
    # a to_q kernel should be sharded over 'model' on its output dim
    leaf = sharded["params"]["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert "model" in str(leaf.sharding.spec)
    xb = shard_batch(x, mesh)
    assert "data" in str(xb.sharding.spec)
    # forward still runs with sharded params + batch
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))(
            sharded, xb, jnp.array(1), ctx
        )
    assert out.shape == (4, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_tp4_forward_matches_single_device():
    """Tensor-parallel at tp=4 (mesh 2x4): the sharded forward must equal the
    replicated single-device forward (round-2 coverage stopped at tp=2)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 4) * 0.2,
                    jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 77, cfg.cross_attention_dim) * 0.1,
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(1), ctx)
    ref = np.asarray(model.apply(params, x, jnp.array(7), ctx))

    mesh = make_mesh(8, model_parallel=4)
    assert mesh.shape == {"data": 2, "model": 4}
    sharded = shard_unet_params(params, mesh)
    leaf = sharded["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert "model" in str(leaf.sharding.spec)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))(
            sharded, shard_batch(x, mesh), jnp.array(7), ctx)
        out.block_until_ready()
    d = np.abs(np.asarray(out) - ref)
    # psum over 4 shards reorders the f32 reduction
    assert d.max() < 1e-5, d.max()


def test_sd15_full_size_tp_census_eval_shape():
    """The tp rules at FULL SD-1.5 dims, proven without a forward pass:
    ``jax.eval_shape`` materializes the 859.5M-param shape tree and
    ``resolve_spec`` (the exact placement decision ``shard_unet_params``
    makes) is censused at tp=2/4/8 — every rule-matched leaf must shard
    cleanly at production head counts (320/640/1280 are all 8-divisible);
    at a pathological tp=7 every leaf must fall back to replication rather
    than error (VERDICT r2 stretch #9)."""
    from jax.sharding import PartitionSpec as P

    from hedit_tpu.parallel.mesh import param_spec as _rule, resolve_spec
    from hedit_tpu.parallel.mesh import _path_str

    cfg = UNetConfig.sd15()
    model = UNet2DCondition(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
        jnp.array(1), jnp.zeros((1, 77, 768)),
    )
    leaves = jax.tree_util.tree_leaves_with_path(tmpl)
    assert sum(int(np.prod(l.shape)) for _, l in leaves) == 859_520_964

    ruled = [(p, l) for p, l in leaves if _rule(_path_str(p)) != P()]
    # every attention (to_q/k/v, to_out), GEGLU ff pair, resnet conv and
    # time_emb_proj across 4 down + mid + 4 up blocks carries a rule:
    # 16 transformers x (2 attn x 4 proj + 2 ff) + resnet convs/time_emb
    # + down/up samplers = 246 leaves at SD-1.5 topology (pinned)
    assert len(ruled) == 246
    for axis in (2, 4, 8):
        for p, l in ruled:
            spec = resolve_spec(_path_str(p), l.shape, axis)
            assert spec == _rule(_path_str(p)), (
                f"tp={axis}: {_path_str(p)} {l.shape} fell back")
    # non-dividing axis size: clean replication fallback, never an error
    for p, l in ruled:
        assert resolve_spec(_path_str(p), l.shape, 7) == P()


def test_resolve_spec_uneven_fallback_unit():
    """The divisibility guard itself: a rule-matched leaf whose sharded dim
    does not divide the axis replicates instead of erroring."""
    from jax.sharding import PartitionSpec as P

    from hedit_tpu.parallel.mesh import resolve_spec

    assert resolve_spec("x/to_q/kernel", (32, 64), 4) == P(None, "model")
    assert resolve_spec("x/to_q/kernel", (32, 30), 4) == P()
    assert resolve_spec("x/resnets_0/conv1/kernel", (3, 3, 16, 4), 8) == P()
    assert resolve_spec("x/resnets_0/conv1/kernel", (3, 3, 16, 64), 8) == \
        P(None, None, None, "model")


def test_bf16_forward_finite():
    import dataclasses

    cfg = dataclasses.replace(UNetConfig.tiny(), dtype=jnp.bfloat16)
    model = UNet2DCondition(cfg)
    x = jnp.ones((1, 16, 16, 4), jnp.float32) * 0.1
    ctx = jnp.ones((1, 77, cfg.cross_attention_dim), jnp.float32) * 0.1
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(1), ctx)
    out = model.apply(params, x, jnp.array(501), ctx)
    assert bool(jnp.isfinite(out).all())


# ------------------------------------------------------- batched P2P sweep #

def _mk_controls_blends(B, S, heads, res, rs):
    """Per-sample P2P controls with REAL variation (alphas, equalizer, self
    window) + mixed blend/no-blend LocalBlend states."""
    import dataclasses

    from hedit_tpu.control.p2p import LocalBlendState, P2PControl
    from hedit_tpu.parallel.sweep import neutral_blend

    px = res * res
    controls, blends = [], []
    for b in range(B):
        xa = 0.25 + 0.5 * (b % 3) / 2.0
        ctrl = P2PControl(
            step=jnp.zeros((), jnp.int32),
            cross_alpha=jnp.asarray(
                (np.arange(S + 1) < int(xa * (S + 1))).astype(np.float32)[:, None]
                * np.ones((1, 77), np.float32)),
            refine_mapper=jnp.arange(77),
            refine_alphas=jnp.ones(77),
            replace_mapper=jnp.eye(77),
            equalizer=jnp.asarray(
                1.0 + 0.5 * (rs.rand(77) > 0.5).astype(np.float32) * (b % 2)),
            mode="refine", use_reweight=True,
            # static fields (self window, mode, reweight) are part of the
            # treedef and therefore BATCH-CONSTANT — exactly the production
            # shape: --sa/--xa are sweep-wide CLI constants, per-sample
            # variation lives in the dynamic leaves (alphas/mappers/eq)
            self_replace_until=2, blend_px=px,
        )
        controls.append(ctrl)
        if b % 2 == 0:
            alpha = np.zeros((2, 77), np.float32)
            alpha[:, 3 + b % 4] = 1.0
            blends.append(LocalBlendState(
                alpha_layers=jnp.asarray(alpha),
                store_sum=jnp.zeros((5, 2, heads, px, 77), jnp.float32),
                start_blend=1, res=res,
            ))
        else:
            blends.append(neutral_blend(S, heads, res))
    return controls, blends


@pytest.fixture(scope="module")
def p2p_batch_setup():
    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.pipelines.sd import create_sd_pipeline

    S = 4
    pipe = create_sd_pipeline(tiny=True, num_inference_steps=S, seed=0)
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0,
                      implicit=True)
    B = 8
    rs = np.random.RandomState(3)
    ucfg = pipe.unet.cfg
    res = ucfg.sample_size // 4
    controls, blends = _mk_controls_blends(
        B, S, ucfg.num_heads, res, rs)
    x0s = jnp.asarray(rs.randn(B, ucfg.sample_size, ucfg.sample_size,
                               4).astype(np.float32) * 0.2)
    mk = lambda: jnp.asarray(  # noqa: E731
        rs.randn(B, 77, ucfg.cross_attention_dim).astype(np.float32) * 0.1)
    return dict(pipe=pipe, cfg=cfg, S=S, B=B, x0s=x0s,
                unconds=mk(), srcs=mk(), tars=mk(),
                controls=controls, blends=blends)


def test_p2p_batch_scan_sharded_equals_single(p2p_batch_setup):
    """The flagship P2P edit, batch-8 sharded over the mesh 'data' axis,
    must equal the per-sample single-device path (VERDICT r2 #2)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    s = p2p_batch_setup
    pipe, cfg, S, B = s["pipe"], s["cfg"], s["S"], s["B"]

    from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.parallel.mesh import replicate, shard_batch
    from hedit_tpu.parallel.sweep import edit_batch_p2p_fn, stack_pytrees

    rngs = jax.random.split(jax.random.PRNGKey(11), B)

    # ---- single-device per-sample reference ------------------------------ #
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
        inv = invert_ddpm(
            eps_plain, pipe.schedule, s["x0s"][b][None],
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            cfg_scale_src=1.0, eta=1.0, rng=rngs[b], step_chunk=2,
            skip_zs=True,
        )
        edited, _ = h_edit_p2p(
            eps_ctrl, pipe.schedule, inv.xts[S][None], None,
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            tar_ctx=s["tars"][b][None], cfg=cfg, after_skip_steps=S,
            control=s["controls"][b], local_blend=s["blends"][b],
            xts=inv.xts[: S + 1], derive_zs=True,
        )
        singles.append(np.asarray(edited[0]))
    singles = np.stack(singles)

    # ---- batched, data-sharded over the 4x2 mesh -------------------------- #
    mesh = make_mesh(8, model_parallel=2)
    fn = jax.jit(edit_batch_p2p_fn(pipe, cfg, after_skip_steps=S,
                                   step_chunk=2))
    with jax.set_mesh(mesh):
        out = fn(
            replicate(pipe.unet_params, mesh),
            shard_batch(s["x0s"], mesh),
            shard_batch(s["unconds"], mesh),
            shard_batch(s["srcs"], mesh),
            shard_batch(s["tars"], mesh),
            shard_batch(rngs, mesh),
            jax.tree_util.tree_map(lambda x: shard_batch(x, mesh),
                                   stack_pytrees(s["controls"])),
            jax.tree_util.tree_map(lambda x: shard_batch(x, mesh),
                                   stack_pytrees(s["blends"])),
        )
        out.block_until_ready()
    assert "data" in str(out.sharding.spec)
    d = np.abs(np.asarray(out) - singles)
    # identical algebra; the residual is batched-matmul accumulation order
    # (vmap fuses B rows into one dot, CPU oneDNN picks shape-dependent
    # reduction algorithms) amplified by the 1/sqrt(variance) division over
    # 4 chained steps — measured mean 8.5e-5 / max 6e-4.  Cross-sample
    # contamination or a wrong-row bug would show the inter-sample spread
    # (O(1e-1)), far above this bound.
    assert d.mean() < 3e-4 and d.max() < 3e-3, (d.mean(), d.max())


def test_flagship_runner_skip_matches_scan(p2p_batch_setup):
    """skip > 0: the runner must step the AFTER-SKIP timestep grid
    (timesteps[-S:], make_step_grid semantics) — a 6-step schedule edited
    for 4 steps must equal the scan form, which indexes the same grid."""
    s = p2p_batch_setup
    pipe, cfg, S = s["pipe"], s["cfg"], s["S"]

    from hedit_tpu.core.schedule import Schedule
    from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
    from hedit_tpu.invert.ddpm import sample_xts_from_x0
    from hedit_tpu.parallel.sweep import make_flagship_runner, stack_pytrees

    sched6 = Schedule.create(6, steps_offset=1)
    run = make_flagship_runner(pipe.unet, sched6, cfg, after_skip_steps=S)
    b = 0
    ctx4 = jnp.concatenate([s["unconds"][b][None], s["srcs"][b][None],
                            s["srcs"][b][None], s["tars"][b][None]], axis=0)
    rng = jax.random.PRNGKey(9)
    out = run(pipe.unet_params, s["x0s"][:1][:, None], ctx4[None],
              stack_pytrees(s["controls"][:1]), stack_pytrees(s["blends"][:1]),
              rng)

    def eps_ctrl(x, t, c, c_obj):
        if getattr(c_obj, "stores_attn", False):
            o, aux = pipe.unet.apply(pipe.unet_params, x, t, c, c_obj, True,
                                     mutable=["attn_store"])
            return o, aux["attn_store"]
        return pipe.unet.apply(pipe.unet_params, x, t, c, c_obj)

    keys = jax.random.split(rng, 1)
    xts = sample_xts_from_x0(sched6, s["x0s"][0][None], keys[0])[0]
    edited, _ = h_edit_p2p(
        eps_ctrl, sched6, xts[S][None], None,
        uncond_ctx=s["unconds"][0][None], src_ctx=s["srcs"][0][None],
        tar_ctx=s["tars"][0][None], cfg=cfg, after_skip_steps=S,
        control=s["controls"][0], local_blend=s["blends"][0],
        xts=xts[: S + 1], derive_zs=True,
    )
    d = np.abs(np.asarray(out[0]) - np.asarray(edited))
    assert d.mean() < 3e-4 and d.max() < 3e-3, (d.mean(), d.max())


def test_flagship_runner_matches_scan(p2p_batch_setup):
    """The hostloop flagship runner (promoted from bench.py) must reproduce
    the library scan path bit-for-bit up to f32 reduction order."""
    s = p2p_batch_setup
    pipe, cfg, S = s["pipe"], s["cfg"], s["S"]
    B = 4

    from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
    from hedit_tpu.invert.ddpm import sample_xts_from_x0
    from hedit_tpu.parallel.sweep import make_flagship_runner, stack_pytrees

    run = make_flagship_runner(pipe.unet, pipe.schedule, cfg,
                               after_skip_steps=S)
    ctx4s = jnp.stack([
        jnp.concatenate([s["unconds"][b][None], s["srcs"][b][None],
                         s["srcs"][b][None], s["tars"][b][None]], axis=0)
        for b in range(B)
    ])
    controls = stack_pytrees(s["controls"][:B])
    blends = stack_pytrees(s["blends"][:B])
    rng = jax.random.PRNGKey(5)
    out = run(pipe.unet_params, s["x0s"][:B][:, None], ctx4s, controls,
              blends, rng)

    # scan path on the same sampled trajectories
    def eps_ctrl(x, t, c, c_obj):
        if getattr(c_obj, "stores_attn", False):
            o, aux = pipe.unet.apply(pipe.unet_params, x, t, c, c_obj, True,
                                     mutable=["attn_store"])
            return o, aux["attn_store"]
        return pipe.unet.apply(pipe.unet_params, x, t, c, c_obj)

    keys = jax.random.split(rng, B)
    for b in range(B):
        xts = sample_xts_from_x0(pipe.schedule, s["x0s"][b][None], keys[b])[0]
        edited, _ = h_edit_p2p(
            eps_ctrl, pipe.schedule, xts[S][None], None,
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            tar_ctx=s["tars"][b][None], cfg=cfg, after_skip_steps=S,
            control=s["controls"][b], local_blend=s["blends"][b],
            xts=xts[: S + 1], derive_zs=True,
        )
        d = np.abs(np.asarray(out[b]) - np.asarray(edited))
        # same accumulation-order bound as above (measured mean 8.7e-5)
        assert d.mean() < 3e-4 and d.max() < 3e-3, (b, d.mean(), d.max())


# ------------------------------------------------------------- face batch #


@pytest.mark.parametrize("mode", ["h_edit_R", "ef"])
def test_face_batch_sharded_matches_serial(mode):
    """The reward-guided face edit, batched + sharded over the mesh 'data'
    axis (``face_batch_fn``), must equal the serial per-pair loop the CLI
    runs at --data_parallel 0."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from hedit_tpu.edit.face_swap import ef_face, h_edit_r_face
    from hedit_tpu.invert.sde import invert_sde
    from hedit_tpu.parallel.mesh import dp_mesh, replicate, shard_batch
    from hedit_tpu.parallel.sweep import face_batch_fn
    from hedit_tpu.pipelines.face import create_face_pipeline

    S, B, W = 4, 4, 3.0
    pipe = create_face_pipeline(tiny=True, num_inference_steps=S, seed=0,
                                with_rewards=False)
    res = pipe.unet.cfg.resolution
    rs = np.random.RandomState(0)
    srcs = jnp.asarray(rs.randn(B, res, res, 3).astype(np.float32) * 0.2)
    refs = jnp.asarray(rs.randn(B, 8).astype(np.float32))  # toy embeddings
    keys = jax.random.split(jax.random.PRNGKey(42), B)

    # toy losses with per-pair dependence on both the ref embedding and the
    # source image (the real builder closes over ArcFace / LPIPS the same way)
    def build(arc_p, lp_p, src_img, ref_embed):
        idf = lambda img: -jnp.mean(img) * jnp.mean(ref_embed)  # noqa: E731
        lpf = lambda img: jnp.mean((img - src_img) ** 2)  # noqa: E731
        return idf, lpf

    eps = lambda x, t: pipe.unet.apply(pipe.unet_params, x, t)  # noqa: E731
    singles = []
    for b in range(B):
        inv = invert_sde(eps, pipe.schedule, srcs[b][None], eta=1.0,
                         rng=keys[b], step_chunk=2)
        idf, lpf = build(None, None, srcs[b][None], refs[b][None])
        if mode == "h_edit_R":
            out = h_edit_r_face(
                eps, pipe.schedule, inv.xts[S][None], inv.zs, id_loss_fn=idf,
                lpips_loss_fn=lpf, weight_edit_face=W, eta=1.0,
                optimization_steps=2, after_skip_steps=S)
        else:
            out = ef_face(
                eps, pipe.schedule, inv.xts[S][None], inv.zs, id_loss_fn=idf,
                lpips_loss_fn=lpf, weight_edit_face=W, eta=1.0,
                after_skip_steps=S)
        singles.append(np.asarray(out[0]))
    singles = np.stack(singles)

    mesh = dp_mesh(B)
    fn = jax.jit(face_batch_fn(
        pipe, mode=mode, weight_edit_face=W, eta=1.0, optimization_steps=2,
        after_skip_steps=S, step_chunk=2, loss_builder=build,
    ))
    with jax.set_mesh(mesh):
        out = fn(replicate(pipe.unet_params, mesh), None, None,
                 shard_batch(srcs, mesh), shard_batch(refs, mesh),
                 shard_batch(keys, mesh))
        out.block_until_ready()
    assert "data" in str(out.sharding.spec)
    d = np.abs(np.asarray(out) - singles)
    assert d.mean() < 3e-4 and d.max() < 3e-3, (d.mean(), d.max())


def test_ctrl_batch_sharded_matches_serial(p2p_batch_setup):
    """The generic MasaCtrl/PnP data-parallel wrapper (``ctrl_batch_fn``)
    sharded over the mesh 'data' axis must equal the serial per-sample
    loop the CLIs run at --data_parallel 0 (here: h_edit_R_masactrl)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    s = p2p_batch_setup
    pipe, cfg, S = s["pipe"], s["cfg"], s["S"]
    B = 4

    from hedit_tpu.edit.h_edit_ctrl import h_edit_masactrl
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.parallel.mesh import dp_mesh, replicate, shard_batch
    from hedit_tpu.parallel.sweep import ctrl_batch_fn

    rngs = jax.random.split(jax.random.PRNGKey(7), B)

    def eps_plain(x, t, c):
        return pipe.unet.apply(pipe.unet_params, x, t, c)

    def eps_ctrl(x, t, c, ctrl):
        return pipe.unet.apply(pipe.unet_params, x, t, c, ctrl)

    singles = []
    for b in range(B):
        inv = invert_ddpm(
            eps_plain, pipe.schedule, s["x0s"][b][None],
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            cfg_scale_src=1.0, eta=1.0, rng=rngs[b], step_chunk=2)
        edited, _ = h_edit_masactrl(
            eps_ctrl, pipe.schedule, inv.xts[S][None], inv.zs,
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            tar_ctx=s["tars"][b][None], cfg=cfg, after_skip_steps=S,
            start_step=1, start_layer=0, xts=inv.xts[: S + 1])
        singles.append(np.asarray(edited[0]))
    singles = np.stack(singles)

    def edit_one(ep, ec, xT, zs, xts, uncond, src, tar):
        edited, _ = h_edit_masactrl(
            ec, pipe.schedule, xT, zs, uncond_ctx=uncond, src_ctx=src,
            tar_ctx=tar, cfg=cfg, after_skip_steps=S,
            start_step=1, start_layer=0, xts=xts)
        return edited

    mesh = dp_mesh(B)
    fn = jax.jit(ctrl_batch_fn(pipe, edit_one, is_ddim=False,
                               cfg_scale_src=1.0, inv_eta=1.0, step_chunk=2,
                               after_skip_steps=S))
    with jax.set_mesh(mesh):
        out = fn(replicate(pipe.unet_params, mesh),
                 shard_batch(s["x0s"][:B], mesh),
                 shard_batch(s["unconds"][:B], mesh),
                 shard_batch(s["srcs"][:B], mesh),
                 shard_batch(s["tars"][:B], mesh),
                 shard_batch(rngs, mesh))
        out.block_until_ready()
    assert "data" in str(out.sharding.spec)
    d = np.abs(np.asarray(out) - singles)
    assert d.mean() < 3e-4 and d.max() < 3e-3, (d.mean(), d.max())


def test_style_batch_sharded_matches_serial(p2p_batch_setup):
    """The batched text+style editor (``style_batch_fn``) sharded over the
    mesh 'data' axis must equal the serial per-sample loop (tiny SD pipe +
    tiny CLIP tower, h_edit_R_p2p + Gram style step)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import dataclasses

    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.style import h_edit_style, make_style_step
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionTower
    from hedit_tpu.models.vae import AutoencoderKL
    from hedit_tpu.parallel.mesh import dp_mesh, replicate, shard_batch
    from hedit_tpu.parallel.sweep import stack_pytrees, style_batch_fn
    from hedit_tpu.rewards.clip_style import reference_gram

    s = p2p_batch_setup
    pipe, S = s["pipe"], s["S"]
    B = 4
    cfg = dataclasses.replace(s["cfg"], eta=1.0)

    vcfg = CLIPVisionConfig.tiny()
    vision = CLIPVisionTower(vcfg)
    rs = np.random.RandomState(5)
    dummy = jnp.zeros((1, vcfg.input_resolution, vcfg.input_resolution, 3))
    vp = vision.init(jax.random.PRNGKey(3), dummy)
    vision_apply = lambda x: vision.apply(vp, x)  # noqa: E731
    ref_gs = jnp.stack([
        reference_gram(vision_apply, jnp.asarray(
            rs.rand(1, vcfg.input_resolution, vcfg.input_resolution, 3)
            .astype(np.float32)))
        for _ in range(B)
    ])
    rngs = jax.random.split(jax.random.PRNGKey(13), B)
    clip_sz = vcfg.input_resolution
    W = 0.5

    def vae_dec(z):
        return pipe.vae.apply(pipe.vae_params, z, method=AutoencoderKL.decode)

    def eps_plain(x, t, c):
        return pipe.unet.apply(pipe.unet_params, x, t, c)

    def eps_ctrl(x, t, c, co):
        if getattr(co, "stores_attn", False):
            out, aux = pipe.unet.apply(pipe.unet_params, x, t, c, co, True,
                                       mutable=["attn_store"])
            return out, aux.get("attn_store", {})
        return pipe.unet.apply(pipe.unet_params, x, t, c, co)

    singles = []
    for b in range(B):
        inv = invert_ddpm(
            eps_plain, pipe.schedule, s["x0s"][b][None],
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            cfg_scale_src=1.0, eta=1.0, rng=rngs[b], step_chunk=2)
        style_fn = make_style_step(vae_dec, vision_apply, ref_gs[b],
                                   pipe.schedule, W, clip_size=clip_sz)
        edited, _ = h_edit_style(
            eps_ctrl, pipe.schedule, inv.xts[S][None], inv.zs,
            uncond_ctx=s["unconds"][b][None], src_ctx=s["srcs"][b][None],
            tar_ctx=s["tars"][b][None], cfg=cfg, after_skip_steps=S,
            control=s["controls"][b], local_blend=None, style_fn=style_fn)
        singles.append(np.asarray(edited[0]))
    singles = np.stack(singles)

    mesh = dp_mesh(B)
    fn = jax.jit(style_batch_fn(
        pipe, vision, cfg, mode="h_edit_R_p2p", after_skip_steps=S,
        weight_edit_clip=W, clip_size=clip_sz, step_chunk=2))
    shard = lambda x: shard_batch(x, mesh)  # noqa: E731
    with jax.set_mesh(mesh):
        out = fn(replicate(pipe.unet_params, mesh),
                 replicate(pipe.vae_params, mesh), replicate(vp, mesh),
                 shard(s["x0s"][:B]), shard(s["unconds"][:B]),
                 shard(s["srcs"][:B]), shard(s["tars"][:B]),
                 jax.tree_util.tree_map(shard,
                                        stack_pytrees(s["controls"][:B])),
                 shard(ref_gs), shard(rngs))
        out.block_until_ready()
    assert "data" in str(out.sharding.spec)
    d = np.abs(np.asarray(out) - singles)
    assert d.mean() < 3e-4 and d.max() < 3e-3, (d.mean(), d.max())
