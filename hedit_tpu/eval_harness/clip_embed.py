"""Full CLIP embedder (text + vision with projections) for the metrics.

The reference evaluates with ViT-L/14 (torchmetrics CLIPScore and the
directional metric both load openai CLIP ViT-L/14,
``matrics_calculator.py:273`` / ``local_clip_evaluation.py:49``).  This
wrapper composes the in-repo text transformer and vision tower with the
projection heads; weights port from an OpenAI CLIP state dict when available,
else seeded random (CI / zero-egress images).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hedit_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from hedit_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionTower
from hedit_tpu.models.tokenizer import CLIPTokenizer


def vit_l14_configs():
    text = CLIPTextConfig()  # 12 layers, 768 wide (ViT-L/14 text tower)
    vision = CLIPVisionConfig(input_resolution=224, patch_size=14, width=1024,
                              layers=24, heads=16, output_dim=768)
    return text, vision


def tiny_configs():
    return CLIPTextConfig.tiny(), CLIPVisionConfig.tiny()


class CLIPTextEmbed(nn.Module):
    """Pooled text embedding: EOT-position hidden state @ text_projection."""

    cfg: CLIPTextConfig
    embed_dim: int

    @nn.compact
    def __call__(self, ids):
        hidden = CLIPTextModel(self.cfg, name="text_model")(ids)
        eot = jnp.argmax(ids, axis=-1)  # EOT has the highest token id
        pooled = hidden[jnp.arange(ids.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.cfg.hidden_size, self.embed_dim))
        return pooled @ proj


@dataclasses.dataclass
class CLIPEmbedder:
    text_model: CLIPTextEmbed
    text_params: Any
    vision_model: CLIPVisionTower
    vision_params: Any
    tokenizer: Optional[CLIPTokenizer]

    def embed_text(self, texts) -> jnp.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        if self.tokenizer is None:
            # per-TEXT seeding (not per-call-tuple): ids must be a pure
            # function of each text so the batched metric lane reproduces
            # the serial lane's embeddings
            vocab = self.text_model.cfg.vocab_size
            rows = []
            for t in texts:
                seed = int.from_bytes(
                    __import__("hashlib").sha1(t.encode()).digest()[:4],
                    "little") % (2**31)
                rows.append(np.random.RandomState(seed).randint(
                    1, vocab - 1, size=77))
            ids = np.stack(rows).astype(np.int32)
            ids[:, -1] = vocab - 1
        else:
            ids = self.tokenizer(texts)
        return self._text_apply(jnp.asarray(ids))

    def embed_image(self, images_normalized) -> jnp.ndarray:
        emb, _ = self._vision_apply(images_normalized)
        return emb

    # jitted tower applies (one compilation per input shape; the batched
    # evaluation lane pads its tail batch so each tower compiles once).
    # Params are jit ARGUMENTS, not closures — closing over the ViT-L
    # weights bakes them into the HLO, which the axon remote-compile
    # service rejects (HTTP 413; same constraint as cli/common.py:
    # jit_with_params, measured round 4 on the eval bench)
    @property
    def _text_apply(self):
        if getattr(self, "_text_apply_j", None) is None:
            f = jax.jit(lambda p, ids: self.text_model.apply(p, ids))
            self._text_apply_j = lambda ids: f(self.text_params, ids)
        return self._text_apply_j

    @property
    def _vision_apply(self):
        if getattr(self, "_vision_apply_j", None) is None:
            f = jax.jit(lambda p, x: self.vision_model.apply(p, x))
            self._vision_apply_j = lambda x: f(self.vision_params, x)
        return self._vision_apply_j


def convert_openai_or_hf_clip(state):
    """Full CLIP state dict -> (text_embed_params, vision_params).

    Detects the checkpoint family: the OpenAI layout (what ``clip.load`` and
    the vendored ``clip_guidance/clip`` save — ``transformer.resblocks.*``
    text keys) vs the HF transformers layout (``text_model.encoder.layers``).
    Both carry ``visual.*``-style vision keys only in the OpenAI case; HF
    vision checkpoints are not used by the reference's metrics."""
    from hedit_tpu.io_utils.weights import (
        convert_clip_text, convert_clip_text_openai,
    )
    from hedit_tpu.models.clip_vision import convert_clip_vision

    vp = convert_clip_vision(state)
    if any(k.startswith("transformer.resblocks") for k in state):
        tp_inner = convert_clip_text_openai(state)
    else:
        tp_inner = convert_clip_text(
            {k: v for k, v in state.items() if not k.startswith("visual")}
        )
    tp = {"params": {"text_model": tp_inner["params"],
                     "text_projection": np.asarray(state["text_projection"])}}
    return tp, vp


def create_clip_embedder(weights_path: Optional[str] = None, *, tiny=False,
                         seed: int = 0) -> CLIPEmbedder:
    tcfg, vcfg = tiny_configs() if tiny else vit_l14_configs()
    embed_dim = vcfg.output_dim
    text = CLIPTextEmbed(tcfg, embed_dim)
    vision = CLIPVisionTower(vcfg)
    rngs = jax.random.split(jax.random.PRNGKey(seed), 2)
    ids = jnp.zeros((1, 77), jnp.int32)
    img = jnp.zeros((1, vcfg.input_resolution, vcfg.input_resolution, 3))
    if weights_path:
        from hedit_tpu.io_utils.weights import load_torch_state

        state = load_torch_state(weights_path)
        tp, vp = convert_openai_or_hf_clip(state)
        from hedit_tpu.io_utils.weights import validate_against

        validate_against(jax.eval_shape(text.init, rngs[0], ids), tp, "clip_text_embed")
        validate_against(jax.eval_shape(vision.init, rngs[1], img), vp, "clip_vision_l14")
        text_params = jax.tree_util.tree_map(jnp.asarray, tp)
        vision_params = jax.tree_util.tree_map(jnp.asarray, vp)
    else:
        text_params = text.init(rngs[0], ids)
        vision_params = vision.init(rngs[1], img)
    try:
        tok = None if tiny else CLIPTokenizer()
    except FileNotFoundError:
        tok = None
    return CLIPEmbedder(text, text_params, vision, vision_params, tok)
