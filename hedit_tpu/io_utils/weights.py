"""Pretrained-weight porting: torch / safetensors state dicts -> Flax pytrees.

The environment the framework ships into may or may not have the pretrained
checkpoints (SD UNet/VAE/CLIP from HF, ArcFace/face-parser/CelebA ckpts from
the reference release).  This module is the complete, validated mapping; model
factories call it when a weight path is provided and fall back to seeded
random init otherwise.

Every converter validates the ported tree leaf-by-leaf against the target
module's ``eval_shape`` init — the "per-layer activation-diff harness"
prerequisite from SURVEY.md §7 (hard part 2): a wrong mapping fails loudly at
port time, never silently at sample time.

Key mapping rules (diffusers/HF torch -> this repo's Flax):
* ``.N`` list indices -> ``_N`` module-name suffixes
* Dense:  ``weight`` [out,in]      -> ``kernel`` [in,out] (transpose)
* Conv:   ``weight`` OIHW          -> ``kernel`` HWIO (transpose 2,3,1,0)
* Norms:  ``weight``/``bias`` (1D) -> ``scale``/``bias``
* Embed:  ``weight``               -> ``embedding``
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np


def _seg(key: str) -> str:
    """'down_blocks.0.attentions.1' -> 'down_blocks_0.attentions_1'"""
    return re.sub(r"\.(\d+)", r"_\1", key)


def _is_embed(key: str) -> bool:
    return "token_embedding" in key or key.endswith("embedding.weight")


def torch_key_to_flax(
    key: str, arr: np.ndarray, fixups: Optional[List[Tuple[str, str]]] = None
) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Map one flat torch key/tensor to a flax path/tensor."""
    k = _seg(key)
    for pat, rep in fixups or []:
        k = re.sub(pat, rep, k)
    parts = k.split(".")
    leaf = parts[-1]
    if leaf == "weight":
        if _is_embed(k):
            leaf, arr = "embedding", arr
        elif arr.ndim == 4:
            leaf, arr = "kernel", arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:
            leaf, arr = "kernel", arr.T
        elif arr.ndim == 1:
            leaf = "scale"
        else:
            leaf = "kernel"
    return tuple(parts[:-1] + [leaf]), np.asarray(arr)


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return tree


def _flatten_tree(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten_tree(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def validate_against(template, ported: Dict[str, Any], name: str = "model"):
    """Leaf-by-leaf shape check of a ported tree vs an eval_shape init tree.

    Raises with the full list of missing / unexpected / mis-shaped leaves.
    """
    want = _flatten_tree(template["params"] if "params" in template else template)
    got = _flatten_tree(ported["params"] if "params" in ported else ported)
    errors = []
    for path, leaf in want.items():
        if path not in got:
            errors.append(f"MISSING {'/'.join(path)} (want {tuple(leaf.shape)})")
        elif tuple(got[path].shape) != tuple(leaf.shape):
            errors.append(
                f"SHAPE {'/'.join(path)}: got {tuple(got[path].shape)} want {tuple(leaf.shape)}"
            )
    for path in got:
        if path not in want:
            errors.append(f"UNEXPECTED {'/'.join(path)}")
    if errors:
        raise ValueError(
            f"weight port validation failed for {name} ({len(errors)} problems):\n"
            + "\n".join(errors[:50])
        )


# --------------------------------------------------------------------------- #
# Model-specific fixups
# --------------------------------------------------------------------------- #

UNET_FIXUPS: List[Tuple[str, str]] = [
    (r"\.to_out_0\.", ".to_out_0."),  # already right after _seg
    (r"\.to_out\.0\.", ".to_out_0."),
    (r"time_embedding\.linear_(\d)", r"time_embedding.linear_\1"),
]

VAE_FIXUPS: List[Tuple[str, str]] = [
    # encoder/decoder block flattening: down_blocks_0.resnets_0 -> down_blocks_0_resnets_0
    (r"(down_blocks_\d+)\.(resnets_\d+)", r"\1_\2"),
    (r"(down_blocks_\d+)\.(downsamplers_\d+)", r"\1_\2"),
    (r"(up_blocks_\d+)\.(resnets_\d+)", r"\1_\2"),
    (r"(up_blocks_\d+)\.(upsamplers_\d+)", r"\1_\2"),
    # legacy diffusers VAE attention names -> to_q/to_k/to_v/to_out_0
    (r"mid_block\.attentions_0\.query", "mid_block.attentions_0.to_q"),
    (r"mid_block\.attentions_0\.key", "mid_block.attentions_0.to_k"),
    (r"mid_block\.attentions_0\.value", "mid_block.attentions_0.to_v"),
    (r"mid_block\.attentions_0\.proj_attn", "mid_block.attentions_0.to_out_0"),
    (r"mid_block\.attentions_0\.q\.", "mid_block.attentions_0.to_q."),
    (r"mid_block\.attentions_0\.k\.", "mid_block.attentions_0.to_k."),
    (r"mid_block\.attentions_0\.v\.", "mid_block.attentions_0.to_v."),
    (r"mid_block\.attentions_0\.proj_out", "mid_block.attentions_0.to_out_0"),
]

CLIP_TEXT_FIXUPS: List[Tuple[str, str]] = [
    (r"^text_model\.", ""),
    (r"^encoder\.", ""),
    (r"embeddings\.token_embedding", "token_embedding"),
    (r"embeddings\.position_embedding\.weight", "position_embedding"),
    (r"\.mlp\.fc1", ".mlp_fc1"),
    (r"\.mlp\.fc2", ".mlp_fc2"),
]


def convert_state_dict(
    state: Dict[str, np.ndarray],
    fixups: List[Tuple[str, str]],
    skip: Callable[[str], bool] = lambda k: False,
) -> Dict[str, Any]:
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, arr in state.items():
        if skip(key):
            continue
        path, out = torch_key_to_flax(key, np.asarray(arr), fixups)
        flat[path] = out
    return {"params": _unflatten(flat)}


def _clip_skip(key: str) -> bool:
    return (
        "position_ids" in key
        or key.startswith("text_projection")
        or key.startswith("logit_scale")
        or key.startswith("visual")
        or key.startswith("vision_model")
    )


def convert_unet(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return convert_state_dict(state, UNET_FIXUPS)


def convert_vae(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    def fix_attn_shapes(tree):
        # legacy VAE attention weights may be [C, C, 1, 1]; squeeze to dense
        flat = _flatten_tree(tree)
        for path, arr in flat.items():
            if "attentions_0" in path and arr.ndim == 4 and arr.shape[:2] == (1, 1):
                flat[path] = arr.reshape(arr.shape[2], arr.shape[3])
        return _unflatten(flat)

    out = convert_state_dict(state, VAE_FIXUPS)
    out["params"] = fix_attn_shapes(out["params"])
    return out


def convert_clip_text(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out = convert_state_dict(state, CLIP_TEXT_FIXUPS, skip=_clip_skip)
    params = out["params"]
    # position_embedding is a bare param (not an Embed module)
    if "position_embedding" in params and isinstance(params["position_embedding"], dict):
        params["position_embedding"] = params["position_embedding"]["embedding"]
    return out


def convert_clip_text_openai(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """OpenAI CLIP (``clip.load`` / the vendored ``clip_guidance/clip``)
    TEXT-tower keys -> the CLIPTextModel tree.

    The eval harness loads ViT-L/14 the way the reference's directional
    metric does (``local_clip_evaluation.py:49``: the OpenAI checkpoint),
    whose text keys (transformer.resblocks.N.attn.in_proj_*) differ from the
    HF transformers layout handled by :func:`convert_clip_text`."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, arr in state.items():
        arr = np.asarray(arr, np.float32)
        if key == "token_embedding.weight":
            flat[("token_embedding", "embedding")] = arr
        elif key == "positional_embedding":
            flat[("position_embedding",)] = arr
        elif key.startswith("ln_final."):
            flat[("final_layer_norm",
                  "scale" if key.endswith("weight") else "bias")] = arr
        elif key.startswith("transformer.resblocks."):
            parts = key.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            base: Tuple[str, ...] = (f"layers_{i}",)
            if rest == "attn.in_proj_weight":
                for name, w in zip(("q_proj", "k_proj", "v_proj"),
                                   np.split(arr, 3, axis=0)):
                    flat[base + ("self_attn", name, "kernel")] = w.T
            elif rest == "attn.in_proj_bias":
                for name, b in zip(("q_proj", "k_proj", "v_proj"),
                                   np.split(arr, 3, axis=0)):
                    flat[base + ("self_attn", name, "bias")] = b
            elif rest == "attn.out_proj.weight":
                flat[base + ("self_attn", "out_proj", "kernel")] = arr.T
            elif rest == "attn.out_proj.bias":
                flat[base + ("self_attn", "out_proj", "bias")] = arr
            elif rest in ("ln_1.weight", "ln_1.bias", "ln_2.weight", "ln_2.bias"):
                ln, leaf = rest.split(".")
                name = "layer_norm1" if ln == "ln_1" else "layer_norm2"
                flat[base + (name, "scale" if leaf == "weight" else "bias")] = arr
            elif rest.startswith("mlp."):
                _, sub, leaf = rest.split(".")
                name = "mlp_fc1" if sub == "c_fc" else "mlp_fc2"
                flat[base + (name, "kernel" if leaf == "weight" else "bias")] = (
                    arr.T if leaf == "weight" else arr
                )
    return {"params": _unflatten(flat)}


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.pth/.ckpt (torch) or .safetensors file to numpy."""
    if path.endswith(".safetensors"):
        from hedit_tpu.io_utils.safetensors_io import load_safetensors

        return load_safetensors(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, (list, tuple)):  # reference celeba ckpt quirk
        obj = obj[0]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}
