"""Model-stack tests: tiny forwards, flash attention oracle, CLIP parity
against torch transformers (real cross-framework check of both the module
numerics and the weight converter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
from hedit_tpu.models.vae import AutoencoderKL, VAEConfig
from hedit_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from hedit_tpu.ops.flash_attention import flash_attention, reference_attention


def test_tiny_unet_forward_jit():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    x = jnp.ones((2, 16, 16, 4)) * 0.1
    ctx = jnp.ones((2, 77, cfg.cross_attention_dim)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(1), ctx)
    out = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))(params, x, jnp.array(501), ctx)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())
    # per-sample timesteps batch too
    out2 = model.apply(params, x, jnp.array([1, 981]), ctx)
    assert out2.shape == (2, 16, 16, 4)


def test_tiny_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    img = jnp.ones((1, 64, 64, 3)) * 0.5
    params = model.init(jax.random.PRNGKey(0), img)
    z = model.apply(params, img, method=AutoencoderKL.encode_mode)
    assert z.shape == (1, 8, 8, 4)
    rec = model.apply(params, z, method=AutoencoderKL.decode)
    assert rec.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(rec).all())


@pytest.mark.parametrize("sq,sk,d", [
    (256, 256, 40),    # SD res-64 head dim
    (128, 77, 64),     # cross-attention: sk masked within one block
    (512, 512, 160),   # SD res-8 head dim
    (300, 300, 40),    # sq and sk both non-multiples of the block
    (128, 400, 80),    # multi-k-block with a masked tail block
])
def test_flash_attention_oracle(sq, sk, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, sq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, sk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, sk, d).astype(np.float32))
    want = reference_attention(q, k, v)
    got = flash_attention(q, k, v, blk_q=128, blk_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sq,sk,d", [
    (256, 256, 40),
    (128, 77, 64),     # masked tail keys within one block
    (300, 300, 40),    # unaligned both ways
])
def test_flash_attention_bounded_oracle(sq, sk, d):
    """Max-free (Cauchy-Schwarz-bounded) kernel matches the oracle; softmax
    shift-invariance makes it exact up to f32 underflow of scores far below
    the bound."""
    from hedit_tpu.ops.flash_attention import flash_attention_bounded

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, sq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, sk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, sk, d).astype(np.float32))
    want = reference_attention(q, k, v)
    got = flash_attention_bounded(q, k, v, blk_q=128, blk_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_attention_bounded_sharp_logits():
    """Large-norm q/k (sharp, near-one-hot softmax) stress the bound slack."""
    from hedit_tpu.ops.flash_attention import flash_attention_bounded

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 256, 40).astype(np.float32) * 8.0)
    k = jnp.asarray(rng.randn(1, 1, 256, 40).astype(np.float32) * 8.0)
    v = jnp.asarray(rng.randn(1, 1, 256, 40).astype(np.float32))
    want = reference_attention(q, k, v)
    got = flash_attention_bounded(q, k, v, blk_q=128, blk_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)


def test_flash_diff_grads_match_oracle():
    """The differentiable flash wrapper (Pallas forward, XLA-recompute
    backward) must produce the exact reference-attention gradients — the
    through-UNet gradient modes (NMG, null-text, EF style) ride it on TPU."""
    from hedit_tpu.ops.flash_attention import flash_attention_diff

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 256, 40).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 256, 40).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 256, 40).astype(np.float32))
    co = jnp.asarray(rng.randn(1, 2, 256, 40).astype(np.float32))

    def f_flash(q, k, v):
        return jnp.sum(flash_attention_diff(q, k, v, True) * co)

    def f_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) * co)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sq,sk,d", [
    (300, 300, 40),    # unaligned both axes: padded-row/col masking in bwd
    (256, 77, 64),     # cross-attention shape (sq != sk, masked tail keys)
    (140, 260, 40),    # unaligned, sq < sk
])
def test_flash_diff_grads_oracle_padded_shapes(sq, sk, d):
    """The Pallas backward's padding masks: padded KEY rows must not leak
    into dq, padded QUERY columns must not leak into dk/dv."""
    from hedit_tpu.ops.flash_attention import flash_attention_diff

    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, sq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, sk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, sk, d).astype(np.float32))
    co = jnp.asarray(rng.randn(1, 2, sq, d).astype(np.float32))

    g1 = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention_diff(q, k, v, True) * co), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        reference_attention(q, k, v) * co), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=3e-5)


def test_flash_diff_grads_bf16():
    """bf16 grads: the backward's score/dp/accumulation matmuls run in the
    input dtype like the forward — drift vs the f32 oracle is bf16-rounding
    sized, not structural."""
    from hedit_tpu.ops.flash_attention import flash_attention_diff

    rng = np.random.RandomState(3)
    qf = rng.randn(1, 2, 256, 40).astype(np.float32) * 0.5
    kf = rng.randn(1, 2, 256, 40).astype(np.float32) * 0.5
    vf = rng.randn(1, 2, 256, 40).astype(np.float32)
    cof = rng.randn(1, 2, 256, 40).astype(np.float32)
    q, k, v, co = (jnp.asarray(x, jnp.bfloat16) for x in (qf, kf, vf, cof))

    g1 = jax.grad(lambda q, k, v: jnp.sum(
        (flash_attention_diff(q, k, v, True)
         * co).astype(jnp.float32)), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        reference_attention(q, k, v) * jnp.asarray(cof)),
        argnums=(0, 1, 2))(jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf))
    for a, b in zip(g1, g2):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b)
        denom = np.abs(b32).max() + 1e-6
        assert np.abs(a32 - b32).max() / denom < 0.05, \
            np.abs(a32 - b32).max() / denom


def test_flash_attention_bf16_tolerance():
    """bf16 inputs run the QK/PV matmuls in bf16 (v3 design) — documents the
    expected drift vs the f32 oracle (bf16 has ~3 decimal digits)."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 256, 40).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 256, 40).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 256, 40).astype(np.float32))
    want = np.asarray(reference_attention(q, k, v))
    got = flash_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        blk_q=128, blk_k=128, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    err = np.abs(np.asarray(got, np.float32) - want)
    scale = np.abs(want).max()
    assert err.max() / scale < 3e-2, err.max() / scale


def test_flash_vmem_routing():
    """Scoped-VMEM sizing rules: f32 halves the q-block (observed 18.41M >
    16M at f32 d=40 S=4096 with the bf16-tuned 2048x512 blocks), and shapes
    whose full-K/V VMEM residency exceeds half the scoped budget must leave
    the Pallas path entirely (f32 VAE-mid-block scale)."""
    from hedit_tpu.ops.flash_attention import _shrink_blocks, flash_kv_fits

    assert _shrink_blocks(40, 2, 2048, 512) == (2048, 512)   # bf16: tuned
    assert _shrink_blocks(40, 4, 2048, 512) == (1024, 512)   # f32: half q
    assert _shrink_blocks(512, 2, 2048, 512) == (1024, 1024)  # big-d bf16
    assert _shrink_blocks(512, 4, 2048, 512) == (512, 1024)   # big-d f32
    # explicit small test blocks are never raised — including at d > 128,
    # where the 1024-wide k block applies only to the untouched default
    assert _shrink_blocks(40, 4, 128, 128) == (128, 128)
    assert _shrink_blocks(512, 2, 2048, 128) == (1024, 128)
    assert _shrink_blocks(160, 4, 512, 128) == (512, 128)

    assert flash_kv_fits(4096, 40, 2)       # bf16 UNet self-attn
    assert flash_kv_fits(4096, 40, 4)       # f32 UNet self-attn (entry())
    assert flash_kv_fits(4096, 512, 2)      # bf16 VAE mid-block (8.4M, fits)
    assert not flash_kv_fits(4096, 512, 4)  # f32 VAE mid-block (16.8M): XLA
    # residency is charged on the PADDED Sk: 6500 f32 d=160 fits unpadded
    # (8.32M) but pads to 7168 (9.17M) — must route to XLA
    assert not flash_kv_fits(6500, 160, 4)
    assert flash_kv_fits(6144, 160, 4)      # aligned boundary still fits


def test_clip_text_parity_with_torch():
    """Random-init torch CLIPTextModel -> weight port -> activation parity."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=77,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    from hedit_tpu.io_utils.weights import convert_clip_text, validate_against

    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text(state)

    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = np.array([[0, 5, 9, 2, 1] + [1] * 72], dtype=np.int32)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.asarray(ids))
    validate_against(template, params, "clip_text_tiny")

    ours = model.apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(ids)
    )
    with torch.no_grad():
        theirs = hf(torch.tensor(ids, dtype=torch.long)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-5)


def test_unet_param_count_sd15():
    model = UNet2DCondition(UNetConfig.sd15())
    x = jnp.zeros((1, 64, 64, 4))
    ctx = jnp.zeros((1, 77, 768))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, jnp.array(1), ctx)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(shapes))
    assert n == 859_520_964  # diffusers UNet2DConditionModel SD-1.5


def test_vae_param_count_sd():
    model = AutoencoderKL(VAEConfig.sd())
    img = jnp.zeros((1, 64, 64, 3))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), img)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(shapes))
    assert n == 83_653_863  # diffusers AutoencoderKL SD


def test_clip_text_param_count_sd():
    model = CLIPTextModel(CLIPTextConfig.sd15())
    ids = jnp.zeros((1, 77), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(shapes))
    assert n == 123_060_480  # HF CLIPTextModel ViT-L/14 (sans projection)


@pytest.mark.parametrize("b,h,sq,sk,d", [
    (2, 3, 300, 300, 40),   # unaligned seq, packed head slicing
    (1, 8, 256, 256, 40),   # SD res-64 head layout
    (2, 2, 128, 400, 80),   # multi-k-block with masked tail
])
def test_flash_attention_packed_oracle(b, h, sq, sk, d):
    """Packed-layout kernel ([B, S, H*D] in/out, heads sliced in-kernel)
    matches the head-split reference."""
    from hedit_tpu.ops.flash_attention import flash_attention_packed

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, sq, h * d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, sk, h * d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, sk, h * d).astype(np.float32))

    def split(x, s):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    want = reference_attention(split(q, sq), split(k, sk), split(v, sk))
    want = want.transpose(0, 2, 1, 3).reshape(b, sq, h * d)
    got = flash_attention_packed(q, k, v, heads=h, blk_q=128, blk_k=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
