"""Prompt-to-Prompt attention control as a jit-resident pytree.

Functional re-design of ``text-guided/p2p/ptp_classes.py``:
* ``AttentionReplace`` / ``AttentionRefine`` / ``AttentionReweight`` become
  pure probability-space edits selected by static mode flags (:229-283).
* The layer/step counter state machine (:74-118) disappears: the editing
  scan's step index is threaded in as a dynamic leaf (`step`), and layer
  identity is static (``LayerTag``).
* The attention store keeps exactly the maps LocalBlend consumes — the
  blend-resolution cross maps (``down_cross[2:4] + up_cross[:3]`` at 16x16 for
  SD, :59-63); those list indices are precisely "the down/up cross layers at
  resolution sample/4", which is how they are selected here (robust to model
  size).  Stored maps are post-edit, matching the reference's shared-storage
  mutation (see control/base.py docstring).
* ``save_attn=False`` (intermediate implicit-optimization loops,
  ``p2p_h_edit.py:636-640``) applies edits but stores nothing and advances no
  counters (:100-101) — here simply a static flag that empties the store dict.
* LocalBlend (:17-72) is a pure function over the accumulated store sums,
  applied as the scan-carry step callback.

Edits apply to the CONDITIONAL half of the batch only (:96-98); the batch
layout is [uncond rows, cond_base_row, cond_edit_row] with ``cond_start``
static.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import LayerTag

MAX_LEN = 77


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class P2PControl:
    """Dynamic leaves + static config for one controlled UNet call."""

    # --- dynamic (traced) ---
    step: jnp.ndarray                      # scalar int32 — editing step index
    cross_alpha: jnp.ndarray               # [num_steps+1, 77] time-word alphas
    refine_mapper: jnp.ndarray             # [77] int (refine) or zeros
    refine_alphas: jnp.ndarray             # [77] float (refine) or ones
    replace_mapper: jnp.ndarray            # [77, 77] float (replace) or eye
    equalizer: jnp.ndarray                 # [77] float multiplier

    # --- static ---
    mode: str = _static(default="refine")          # 'replace' | 'refine'
    use_reweight: bool = _static(default=False)
    self_replace_until: int = _static(default=0)   # int(sa * num_steps)
    cond_start: int = _static(default=1)           # index of cond base row
    save_attn: bool = _static(default=True)
    blend_px: int = _static(default=256)           # (sample/4)^2 store filter
    # Static step gates for host-loop drivers: when the caller KNOWS (at trace
    # time) that the current step is past the self-replace window /
    # cross-alpha window, the corresponding edit is the identity
    # (ptp_classes.py:216-225 with alpha==0 / step >= self window) and the
    # probability path can be skipped entirely for those layers.  Scan-based
    # drivers leave both True (step is traced there) — bit-identical, just
    # slower.  Cross STORE layers keep the probability path regardless, since
    # LocalBlend accumulates maps every step.
    self_edit_active: bool = _static(default=True)
    cross_edit_active: bool = _static(default=True)

    # ------------------------------------------------------------ protocol #
    @property
    def stores_attn(self) -> bool:
        return self.save_attn

    def map_qkv(self, q, k, v, layer: LayerTag):
        """Self-attention replace WITHOUT materialized probabilities.

        The P2P self edit copies the base row's probability map into the edit
        row while keeping the edit row's values (``ptp_classes.py:221-225``):
        ``out_edit = softmax(q_base k_base^T) @ v_edit``.  That is exactly a
        q/k row-select before the fused attention kernel — no probability
        tensor ever exists.  Outside the window the select is the identity
        (bit-identical), so the gate can stay dynamic inside a scan.
        """
        if (
            layer.is_cross
            or not self.self_edit_active
            or layer.place not in ("down", "mid", "up")
            or layer.num_pixels > 32 * 32  # (ptp_classes.py:194-200)
        ):
            return q, k, v
        cs = self.cond_start
        assert cs + 2 <= q.shape[0], (
            f"cond_start={cs} needs batch >= {cs + 2}, got {q.shape[0]}"
        )
        in_window = self.step < self.self_replace_until
        q = q.at[cs + 1].set(jnp.where(in_window, q[cs], q[cs + 1]))
        k = k.at[cs + 1].set(jnp.where(in_window, k[cs], k[cs + 1]))
        return q, k, v

    def map_features(self, h, site: str):
        return h

    def needs_probs(self, layer: LayerTag) -> bool:
        # Probabilities are materialized ONLY where the attention store reads
        # them (the blend-resolution cross layers).  Every other P2P edit is
        # linear over the token axis and rides the fused path: self-attention
        # via the map_qkv row-select, cross-attention via linear_token_edit.
        return self._is_store_layer(layer)

    def linear_token_edit(self, layer: LayerTag):
        """The cross edit as a linear map over the 77-token axis.

        Replace/Refine/Reweight and the time-word alpha blend
        (``ptp_classes.py:202-220, 229-283``) compose to

            new_repl = base @ A + repl * b[None, None, :]

        so the edited row's output needs no probability tensor:

            out_edit = softmax_base @ (A @ v_edit)
                     + softmax_edit @ (b[:, None] * v_edit)

        Returns (A [77,77], b [77]) in float32, or None where the edit does
        not apply (self-attention, store layers — those keep the probability
        path so the post-edit maps can be stored).
        """
        if (
            not layer.is_cross
            or layer.place not in ("down", "mid", "up")
            or not self.cross_edit_active
            or self._is_store_layer(layer)
        ):
            return None
        alpha_t = self.cross_alpha[self.step]  # [77]
        eq = self.equalizer if self.use_reweight else jnp.ones(
            (MAX_LEN,), jnp.float32)
        if self.mode == "replace":
            a_cols = eq * alpha_t
            A = self.replace_mapper * a_cols[None, :]
            b = 1.0 - alpha_t
        else:
            # refine: new_base = gather(base, mapper)*ra + repl*(1-ra), then
            # reweight multiplies the WHOLE new_base (incl. the repl part),
            # then the alpha blend mixes with repl (:258-262, :276-283).
            M = jax.nn.one_hot(self.refine_mapper, MAX_LEN,
                               dtype=jnp.float32).T  # M[w, n] = [mapper[n]==w]
            A = M * (self.refine_alphas * eq * alpha_t)[None, :]
            b = (1.0 - self.refine_alphas) * eq * alpha_t + (1.0 - alpha_t)
        return A, b

    def _is_store_layer(self, layer: LayerTag) -> bool:
        return (
            self.save_attn
            and layer.is_cross
            and layer.num_pixels == self.blend_px
            and layer.place in ("down", "up")
        )

    def replace_cross(self, base: jnp.ndarray) -> jnp.ndarray:
        """The Replace/Refine core on the base map [H, Q, 77]."""
        if self.mode == "replace":
            return jnp.einsum("hpw,wn->hpn", base, self.replace_mapper)
        gathered = jnp.take(base, self.refine_mapper, axis=2)  # [H, Q, 77]
        a = self.refine_alphas[None, None, :]
        return gathered * a  # blended with att_replace by the caller

    def edit_probs(
        self, probs: jnp.ndarray, layer: LayerTag
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cs = self.cond_start
        new_repl, store = self.edit_pair(probs[cs], probs[cs + 1], layer)
        return probs.at[cs + 1].set(new_repl), store

    def edit_pair(
        self, base: jnp.ndarray, repl: jnp.ndarray, layer: LayerTag
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """The P2P edit on just the (cond base, cond edit) rows [H, Q, K].

        P2P reads row ``cond_start`` and writes row ``cond_start + 1`` only
        (``ptp_classes.py:96-98, 202-227``); every other batch row's attention
        is untouched, so callers may run those rows through the fused path and
        materialize probabilities for this pair alone."""
        if layer.is_cross:
            if self.mode == "replace":
                new_base = self.replace_cross(base)
            else:
                # refine blend: base_rep*alpha + repl*(1-alpha)  (:258-262)
                new_base = self.replace_cross(base) + repl * (
                    1.0 - self.refine_alphas[None, None, :]
                )
            if self.use_reweight:
                # reweight chains over the previous controller (:276-283)
                new_base = new_base * self.equalizer[None, None, :]
            alpha_words = self.cross_alpha[self.step][None, None, :]
            new_repl = new_base * alpha_words + (1.0 - alpha_words) * repl
        else:
            in_window = self.step < self.self_replace_until  # (:216-218 window)
            new_repl = jnp.where(in_window, base, repl)

        store: Dict[str, jnp.ndarray] = {}
        if self._is_store_layer(layer):
            # post-edit cond half, [2, H, Q, 77] (storage-sharing semantics)
            store[layer.store_name] = jnp.stack([base, new_repl])
        return new_repl, store


def build_p2p_control(
    *,
    num_steps: int,
    cross_replace_steps,
    self_replace_steps: float,
    prompts,
    tokenizer,
    is_replace: bool,
    eq_params: Optional[dict] = None,
    cond_start: int = 1,
    blend_px: int = 256,
) -> P2PControl:
    """Factory matching ``make_controller`` (``ptp_controller_utils.py:106-134``)."""
    import numpy as np

    from hedit_tpu.control import p2p_prep

    cross_alpha = p2p_prep.get_time_words_attention_alpha(
        prompts, num_steps, cross_replace_steps, tokenizer
    )[:, 0, :]
    if is_replace:
        replace_mapper = p2p_prep.get_replacement_mapper(prompts, tokenizer)[0]
        refine_mapper = np.zeros(MAX_LEN, dtype=np.int64)
        refine_alphas = np.ones(MAX_LEN, dtype=np.float32)
    else:
        rm, ra = p2p_prep.get_refinement_mapper(prompts, tokenizer)
        refine_mapper, refine_alphas = rm[0], ra[0]
        replace_mapper = np.eye(MAX_LEN, dtype=np.float32)
    if eq_params is not None:
        equalizer = p2p_prep.get_equalizer(
            prompts[1], eq_params["words"], eq_params["values"], tokenizer
        )
    else:
        equalizer = np.ones(MAX_LEN, dtype=np.float32)
    if isinstance(self_replace_steps, float):
        self_replace_until = int(num_steps * self_replace_steps)
    else:
        self_replace_until = int(num_steps * self_replace_steps[1])

    return P2PControl(
        step=jnp.zeros((), jnp.int32),
        cross_alpha=jnp.asarray(cross_alpha),
        refine_mapper=jnp.asarray(refine_mapper),
        refine_alphas=jnp.asarray(refine_alphas),
        replace_mapper=jnp.asarray(replace_mapper),
        equalizer=jnp.asarray(equalizer),
        mode="replace" if is_replace else "refine",
        use_reweight=eq_params is not None,
        self_replace_until=self_replace_until,
        cond_start=cond_start,
        blend_px=blend_px,
    )


# ------------------------------------------------------------- local blend #

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LocalBlendState:
    """Scan-carried LocalBlend inputs (``ptp_classes.py:17-72``).

    ``start_blend`` is a DYNAMIC leaf (scalar int): the blend-active test
    ``(step + 1) > start_blend`` stays inside the traced graph, so per-sample
    blend enablement can be batched (a no-blend sample carries
    ``start_blend > num_steps``) and the data-parallel sweep can vmap one
    pytree over mixed blend/no-blend batches."""

    alpha_layers: jnp.ndarray   # [2, 77] word-mask per prompt row
    store_sum: jnp.ndarray      # [5, 2, H, px, 77] accumulated post-edit maps
    start_blend: int = 0        # int(0.2 * num_steps); traced scalar
    threshold: float = _static(default=0.3)
    res: int = _static(default=16)          # blend_res = sample // 4


def init_local_blend(
    prompts, words, tokenizer, *, num_steps: int, heads: int, res: int = 16,
    start_blend: float = 0.2, threshold: float = 0.3,
) -> LocalBlendState:
    import numpy as np

    from hedit_tpu.control.p2p_prep import get_word_inds

    alpha = np.zeros((len(prompts), MAX_LEN), dtype=np.float32)
    for i, (prompt, words_) in enumerate(zip(prompts, words)):
        if isinstance(words_, str):
            words_ = [words_]
        for word in words_:
            ind = get_word_inds(prompt, word, tokenizer)
            alpha[i, ind] = 1.0
    return LocalBlendState(
        alpha_layers=jnp.asarray(alpha),
        store_sum=jnp.zeros((5, 2, heads, res * res, MAX_LEN), jnp.float32),
        start_blend=int(start_blend * num_steps),
        threshold=threshold,
        res=res,
    )


def accumulate_store(
    lb: LocalBlendState, store: Dict[str, jnp.ndarray]
) -> LocalBlendState:
    """Add this step's sown maps into the running sum.

    Order: down-cross maps (store_index ascending) then up-cross — the
    reference's ``down_cross[2:4] + up_cross[:3]`` concatenation (:59-63).
    """
    down = sorted((k for k in store if k.startswith("down_cross")),
                  key=lambda s: int(s.rsplit("_", 1)[1]))
    up = sorted((k for k in store if k.startswith("up_cross")),
                key=lambda s: int(s.rsplit("_", 1)[1]))
    names = down + up
    if not names:
        return lb
    # flax sow wraps values in a tuple per call
    maps = jnp.stack([store[n][0] if isinstance(store[n], tuple) else store[n]
                      for n in names])
    return dataclasses.replace(lb, store_sum=lb.store_sum + maps)


def _max_pool_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3, stride 1, pad 1 max-pool over trailing two spatial dims of
    [B, H, W]."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
    )


def apply_local_blend(
    lb: LocalBlendState, x_pair: jnp.ndarray, step: jnp.ndarray
) -> jnp.ndarray:
    """Blend edited latents into the original outside the word mask (:44-72).

    x_pair: [2, H, W, C] = [x_orig, x_edit].  Active when counter
    (= step + 1) > start_blend; otherwise identity (via jnp.where).
    """
    r = lb.res
    # [5, 2, heads, px, 77] -> [2, 5*heads, r, r, 77]
    maps = lb.store_sum.transpose(1, 0, 2, 3, 4)
    maps = maps.reshape(2, -1, r, r, MAX_LEN)
    alpha = lb.alpha_layers[:, None, None, None, :]  # [2,1,1,1,77]
    m = (maps * alpha).sum(-1).mean(1)  # [2, r, r]
    m = _max_pool_3x3(m)
    H, W = x_pair.shape[1], x_pair.shape[2]
    m = jax.image.resize(m, (2, H, W), method="nearest")
    m = m / jnp.max(m, axis=(1, 2), keepdims=True)
    mask = m > lb.threshold
    mask = jnp.logical_or(mask[:1], mask)  # (:54) mask[:1] + mask
    mask = mask[..., None].astype(x_pair.dtype)
    blended = x_pair[:1] + mask * (x_pair - x_pair[:1])
    active = (step + 1) > lb.start_blend
    return jnp.where(active, blended, x_pair)
