"""Directional ("local") CLIP metric.

Parity: ``text-guided/evaluation/local_clip_evaluation.py`` — cosine between
the image-pair direction and the text direction, where the text direction
averages (target - source) embeddings over the 79 standard ImageNet prompt
templates (``text_templates.py``, the public OpenAI CLIP template set);
images resized/center-cropped to 224 and CLIP-normalized (:63-70), embedding
vectors unit-normalized, the mean text direction re-normalized (:141-147).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hedit_tpu.rewards.clip_style import CLIP_MEAN, CLIP_STD

# The standard OpenAI CLIP ImageNet prompt templates (public template set).
IMAGENET_TEMPLATES: Sequence[str] = (
    "a bad photo of a {}.", "a sculpture of a {}.",
    "a photo of the hard to see {}.", "a low resolution photo of the {}.",
    "a rendering of a {}.", "graffiti of a {}.", "a bad photo of the {}.",
    "a cropped photo of the {}.", "a tattoo of a {}.", "the embroidered {}.",
    "a photo of a hard to see {}.", "a bright photo of a {}.",
    "a photo of a clean {}.", "a photo of a dirty {}.",
    "a dark photo of the {}.", "a drawing of a {}.", "a photo of my {}.",
    "the plastic {}.", "a photo of the cool {}.", "a close-up photo of a {}.",
    "a black and white photo of the {}.", "a painting of the {}.",
    "a painting of a {}.", "a pixelated photo of the {}.",
    "a sculpture of the {}.", "a bright photo of the {}.",
    "a cropped photo of a {}.", "a plastic {}.", "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.", "a blurry photo of the {}.",
    "a photo of the {}.", "a good photo of the {}.", "a rendering of the {}.",
    "a {} in a video game.", "a photo of one {}.", "a doodle of a {}.",
    "a close-up photo of the {}.", "a photo of a {}.", "the origami {}.",
    "the {} in a video game.", "a sketch of a {}.", "a doodle of the {}.",
    "a origami {}.", "a low resolution photo of a {}.", "the toy {}.",
    "a rendition of the {}.", "a photo of the clean {}.",
    "a photo of a large {}.", "a rendition of a {}.",
    "a photo of a nice {}.", "a photo of a weird {}.",
    "a blurry photo of a {}.", "a cartoon {}.", "art of a {}.",
    "a sketch of the {}.", "a embroidered {}.", "a pixelated photo of a {}.",
    "itap of the {}.", "a jpeg corrupted photo of the {}.",
    "a good photo of a {}.", "a plushie {}.", "a photo of the nice {}.",
    "a photo of the small {}.", "a photo of the weird {}.",
    "the cartoon {}.", "art of the {}.", "a drawing of the {}.",
    "a photo of the large {}.", "a black and white photo of a {}.",
    "the plushie {}.", "a dark photo of a {}.", "itap of a {}.",
    "graffiti of the {}.", "a toy {}.", "itap of my {}.",
    "a photo of a cool {}.", "a photo of a small {}.", "a tattoo of the {}.",
)


def clip_image_preprocess(img: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """uint8-scale [B, H, W, 3] -> CLIP-normalized (resize shorter side +
    center crop per torchvision Resize(224)/CenterCrop(224))."""
    x = img / 255.0 if img.max() > 2.0 else img
    b, h, w, c = x.shape
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(x, (b, nh, nw, c), method="bilinear")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top : top + size, left : left + size, :]
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


class DirectionalCLIPMetric:
    """direction_sim(src_img, src_prompt, tar_img, tar_prompt)."""

    def __init__(self, image_embed_fn: Callable, text_embed_fn: Callable,
                 size: int = 224):
        """image_embed_fn: CLIP-normalized [B,size,size,3] -> [B, D];
        text_embed_fn: list[str] -> [N, D]."""
        self.image_embed_fn = image_embed_fn
        self.text_embed_fn = text_embed_fn
        self.size = size

    def text_direction(self, source_class: str, target_class: str) -> jnp.ndarray:
        src = [t.format(source_class) for t in IMAGENET_TEMPLATES]
        tar = [t.format(target_class) for t in IMAGENET_TEMPLATES]
        es = self.text_embed_fn(src)
        et = self.text_embed_fn(tar)
        es = es / jnp.linalg.norm(es, axis=-1, keepdims=True)
        et = et / jnp.linalg.norm(et, axis=-1, keepdims=True)
        d = (et - es).mean(axis=0, keepdims=True)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def __call__(self, src_img, src_prompt, tar_img, tar_prompt) -> float:
        td = self.text_direction(src_prompt, tar_prompt)
        se = self.image_embed_fn(
            clip_image_preprocess(jnp.asarray(src_img)[None], size=self.size))
        te = self.image_embed_fn(
            clip_image_preprocess(jnp.asarray(tar_img)[None], size=self.size))
        se = se / jnp.linalg.norm(se, axis=-1, keepdims=True)
        te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
        idir = te - se
        idir = idir / (jnp.linalg.norm(idir, axis=-1, keepdims=True) + 1e-12)
        return float(jnp.sum(idir * td))

    def batch(self, src_imgs, src_prompts, tar_imgs, tar_prompts,
              text_chunk: int = 632):
        """Per-pair directional similarities [B]: two vision forwards over
        the stacked images + the 79-template text sweeps batched across
        samples (chunked at ``text_chunk`` texts per forward, a multiple of
        the 158 texts each pair contributes)."""
        import numpy as np

        B = len(src_prompts)
        se = self.image_embed_fn(clip_image_preprocess(
            jnp.asarray(np.stack([np.asarray(x, np.float32)
                                  for x in src_imgs])), size=self.size))
        te = self.image_embed_fn(clip_image_preprocess(
            jnp.asarray(np.stack([np.asarray(x, np.float32)
                                  for x in tar_imgs])), size=self.size))
        texts = []
        for sp, tp in zip(src_prompts, tar_prompts):
            texts.extend(t.format(sp) for t in IMAGENET_TEMPLATES)
            texts.extend(t.format(tp) for t in IMAGENET_TEMPLATES)
        embs = []
        for i in range(0, len(texts), text_chunk):
            embs.append(self.text_embed_fn(texts[i:i + text_chunk]))
        et = jnp.concatenate(embs, axis=0).reshape(
            B, 2, len(IMAGENET_TEMPLATES), -1)
        et = et / jnp.linalg.norm(et, axis=-1, keepdims=True)
        td = (et[:, 1] - et[:, 0]).mean(axis=1)  # [B, D]
        td = td / jnp.linalg.norm(td, axis=-1, keepdims=True)
        se = se / jnp.linalg.norm(se, axis=-1, keepdims=True)
        te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
        idir = te - se
        idir = idir / (jnp.linalg.norm(idir, axis=-1, keepdims=True) + 1e-12)
        return np.asarray(jnp.sum(idir * td, axis=-1))
