"""Trajectory capture / injection — the pixel-level parity route.

h-Edit-R outputs depend on the sampled inversion trajectory (the independent
q(x_t|x0) draws and the derived residuals, SURVEY.md §7 hard-part 4), so
cross-framework A/B at the pixel level requires injecting a CAPTURED
trajectory instead of sampling a new one.  This module defines the file
format and the load/save helpers; ``main_p2p`` / ``main_face`` expose them
as ``--save_trajectory`` / ``--load_trajectory``.

File format: a NumPy ``.npz`` with keys
  * ``xts``  — [S+1, H, W, C] float (required; ``xts[0] = x0``, ``xts[S] = xT``
    — the indexing convention of ``ddpm_inversion.py:101`` /
    ``invert/ddpm.py:sample_xts_from_x0``)
  * ``zs``   — [S, H, W, C] posterior residuals (optional; when absent the
    edit loops re-derive them in-loop, ``derive_zs``)
  * ``noise_added`` — [S+1, H, W, C] raw q-sampling noises (optional,
    diagnostic only)
  * ``num_steps`` — scalar S (optional consistency check)

Layout is auto-detected: torch-side captures may store NCHW arrays with or
without a singleton batch dim ([S+1, 1, C, H, W] or [S+1, C, H, W]); they
are transposed to NHWC on load.  Reference-side capture is two lines at the
end of ``inversion_forward_process_ddpm`` (``ddpm_inversion.py:157-167``)
or its SDE analog:

    np.savez(path, xts=xts.squeeze(1).cpu().numpy(),
                   zs=zs.squeeze(1).cpu().numpy())
"""

from __future__ import annotations

import numpy as np

from hedit_tpu.invert.ddpm import InversionResult


def _to_nhwc(arr: np.ndarray, name: str) -> np.ndarray:
    """[T, ...] stack of latents/images -> [T, H, W, C] (C in {3, 4})."""
    if arr.ndim == 5:
        if arr.shape[1] != 1:
            raise ValueError(f"{name}: expected singleton batch dim, got {arr.shape}")
        arr = arr[:, 0]
    if arr.ndim != 4:
        raise ValueError(f"{name}: expected 4D/5D stack, got {arr.shape}")
    if arr.shape[-1] in (3, 4):
        return arr  # already NHWC
    if arr.shape[1] in (3, 4):
        return arr.transpose(0, 2, 3, 1)  # torch NCHW capture
    raise ValueError(
        f"{name}: cannot infer layout from shape {arr.shape} "
        "(channel dim must be 3 or 4)"
    )


def save_trajectory(path: str, inv: InversionResult) -> None:
    """Write an InversionResult (NHWC, exact float32) to ``path``."""
    data = {
        "xts": np.asarray(inv.xts),
        "num_steps": np.asarray(inv.xts.shape[0] - 1, np.int64),
    }
    if inv.zs is not None:
        data["zs"] = np.asarray(inv.zs)
    if inv.noise_added is not None:
        data["noise_added"] = np.asarray(inv.noise_added)
    np.savez(path, **data)


def load_trajectory(path: str, expect_steps: int | None = None) -> InversionResult:
    """Read a captured trajectory (this framework's or a torch-side one)."""
    import jax.numpy as jnp

    with np.load(path) as f:
        xts = _to_nhwc(np.asarray(f["xts"], np.float32), "xts")
        zs = (
            _to_nhwc(np.asarray(f["zs"], np.float32), "zs")
            if "zs" in f else None
        )
        noise = (
            _to_nhwc(np.asarray(f["noise_added"], np.float32), "noise_added")
            if "noise_added" in f else None
        )
        if "num_steps" in f:
            S = int(f["num_steps"])
            if xts.shape[0] != S + 1:
                raise ValueError(
                    f"trajectory file claims {S} steps but xts has "
                    f"{xts.shape[0]} entries (want S+1)"
                )
    if expect_steps is not None and xts.shape[0] != expect_steps + 1:
        raise ValueError(
            f"trajectory has {xts.shape[0] - 1} steps, run expects {expect_steps}"
        )
    if zs is not None and zs.shape[0] != xts.shape[0] - 1:
        raise ValueError(f"zs/xts length mismatch: {zs.shape[0]} vs {xts.shape[0]}")
    return InversionResult(
        xT=jnp.asarray(xts[-1])[None],
        zs=None if zs is None else jnp.asarray(zs),
        xts=jnp.asarray(xts),
        noise_added=None if noise is None else jnp.asarray(noise),
    )
