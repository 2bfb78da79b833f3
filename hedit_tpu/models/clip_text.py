"""Flax CLIP text encoder (ViT-L/14 text tower used by SD-1.x).

Parity: transformers ``CLIPTextModel`` — 12 layers, d=768, 12 heads,
quick_gelu, causal mask, final LN; the editing stack consumes
``last_hidden_state`` exactly as ``encode_text`` does
(``text-guided/inversion/inversion_utils.py:13-35``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    intermediate_size: int = 3072
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=2,
                              num_heads=2, intermediate_size=64)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=c.dtype, name="q_proj")(x) * head_dim**-0.5
        k = nn.Dense(c.hidden_size, dtype=c.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=c.dtype, name="v_proj")(x)
        b, s, _ = x.shape
        q = q.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + mask
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=c.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1", dtype=c.dtype)(x)
        x = x + CLIPAttention(c, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2", dtype=c.dtype)(x)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids [B, 77] -> last_hidden_state [B, 77, hidden]."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok + pos[None, : input_ids.shape[1]]
        s = input_ids.shape[1]
        causal = jnp.triu(jnp.full((s, s), np.finfo(np.float32).min), k=1)
        mask = causal[None, None]
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, name=f"layers_{i}")(x, mask)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm", dtype=c.dtype)(x)
