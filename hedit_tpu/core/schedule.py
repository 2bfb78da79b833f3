"""Diffusion schedule tables and posterior-step numerics.

TPU-native re-design of the reference's scheduler math
(``text-guided/inversion/inversion_utils.py:38-195`` plus the DDIMScheduler
configuration constructed at ``text-guided/main_p2p.py:139-146``).  Everything is
precomputed into fixed-shape ``jnp`` tables at trace time so that the editing /
inversion loops can run as a single ``lax.scan`` with per-step scalar gathers —
no host sync, no data-dependent Python control flow.

Conventions
-----------
* ``t`` always denotes an *absolute training timestep* (0..num_train_timesteps-1),
  matching the reference which indexes ``alphas_cumprod`` by absolute timestep.
* All tables are float32.  Model compute may be bfloat16; posterior math stays in
  float32 for parity with the reference (torch default dtype).
* ``is_ddim_inversion`` is a *static* Python bool — it selects a different closed
  form (reference ``inversion_utils.py:102-119``), so we compile one branch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
) -> np.ndarray:
    """Beta schedule table.

    Covers both backbones in the reference:
    * ``scaled_linear`` 0.00085 -> 0.012 for Stable Diffusion
      (DDIMScheduler config at ``text-guided/main_p2p.py:139-146``).
    * ``linear`` 1e-4 -> 2e-2 for the CelebA-HQ pixel DDPM
      (``face-swapping/diffusion/diffusion_utils.py:4-34`` /
      ``face-swapping/main_edit.py:130-134``).
    Plus the remaining reference variants (quad/const/jsd/sigmoid) for parity.
    """
    T = num_train_timesteps
    if schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif schedule == "jsd":
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif schedule == "sigmoid":
        x = np.linspace(-6, 6, T, dtype=np.float64)
        betas = 1 / (1 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas.astype(np.float32)


def leading_timesteps(
    num_train_timesteps: int, num_inference_steps: int, steps_offset: int = 1
) -> np.ndarray:
    """Inference timesteps, descending, diffusers "leading" spacing.

    For (1000, 50, offset=1): [981, 961, ..., 21, 1] — matches the trajectory
    documented in the reference (``ddpm_inversion.py`` docstring example
    "t: 1, 11, ..., 991" for 100 steps).
    """
    ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64)
    ts += steps_offset
    return ts[::-1].copy()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed diffusion tables + the inference-time step list.

    Array fields are jnp arrays (leaves); ints are static metadata.
    """

    alphas_cumprod: jnp.ndarray  # [T] float32
    alphas: jnp.ndarray  # [T]
    final_alpha_cumprod: jnp.ndarray  # scalar; abar[0] (set_alpha_to_one=False)
    timesteps: jnp.ndarray  # [S] int32, descending
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    num_inference_steps: int = dataclasses.field(metadata=dict(static=True))

    # ------------------------------------------------------------------ setup
    @staticmethod
    def create(
        num_inference_steps: int,
        num_train_timesteps: int = 1000,
        beta_schedule: str = "scaled_linear",
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        steps_offset: int = 1,
        timesteps: Optional[np.ndarray] = None,
    ) -> "Schedule":
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas = (1.0 - betas).astype(np.float32)
        # float32 cumprod, mirroring torch's float32 pipeline in the reference
        abar = np.cumprod(alphas, dtype=np.float32)
        if timesteps is None:
            timesteps = leading_timesteps(num_train_timesteps, num_inference_steps, steps_offset)
        return Schedule(
            alphas_cumprod=jnp.asarray(abar),
            alphas=jnp.asarray(alphas.astype(np.float32)),
            final_alpha_cumprod=jnp.asarray(abar[0]),
            timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
            num_train_timesteps=num_train_timesteps,
            num_inference_steps=num_inference_steps,
        )

    # ----------------------------------------------------------------- helpers
    @property
    def step_ratio(self) -> int:
        return self.num_train_timesteps // self.num_inference_steps

    def abar(self, t) -> jnp.ndarray:
        """alphas_cumprod[t] for absolute timestep(s) t >= 0."""
        return jnp.take(self.alphas_cumprod, t)

    def abar_prev(self, t) -> jnp.ndarray:
        """alphas_cumprod[t - step_ratio], with final_alpha_cumprod below zero.

        Mirrors the `prev_timestep >= 0 else final_alpha_cumprod` branch used
        throughout the reference (``inversion_utils.py:87-90``).
        """
        prev_t = t - self.step_ratio
        return jnp.where(
            prev_t >= 0,
            jnp.take(self.alphas_cumprod, jnp.clip(prev_t, 0)),
            self.final_alpha_cumprod,
        )

    def variance(self, t) -> jnp.ndarray:
        """DDIM posterior variance omega^2_{t,t-1} (``inversion_utils.py:38-56``)."""
        abar_t = self.abar(t)
        abar_prev = self.abar_prev(t)
        beta_t = 1.0 - abar_t
        beta_prev = 1.0 - abar_prev
        return (beta_prev / beta_t) * (1.0 - abar_t / abar_prev)

    # ------------------------------------------------------------ core steps
    def tweedie_x0(self, eps, t, sample) -> jnp.ndarray:
        """Predicted x0 via Tweedie (``inversion_utils.py:128-140``)."""
        abar_t = self.abar(t)
        beta_t = 1.0 - abar_t
        return (sample - jnp.sqrt(beta_t) * eps) / jnp.sqrt(abar_t)

    def reverse_step(
        self,
        eps,
        t,
        sample,
        *,
        eta: float | jnp.ndarray = 0.0,
        variance_noise: Optional[jnp.ndarray] = None,
        is_ddim_inversion: bool = False,
        return_pred_x0: bool = False,
        return_mu: bool = False,
    ):
        """One posterior step x_t -> x_{t-1} (``inversion_utils.py:58-127``).

        is_ddim_inversion=True: direction coeff sqrt(1-abar_prev), noise added
        un-normalized (+ eta*z).  False: DDPM form — direction
        sqrt(1-abar_prev - eta^2*var), noise + eta*sqrt(var)*z.
        """
        abar_t = self.abar(t)
        abar_prev = self.abar_prev(t)
        beta_t = 1.0 - abar_t
        pred_x0 = (sample - jnp.sqrt(beta_t) * eps) / jnp.sqrt(abar_t)
        var = self.variance(t)
        if is_ddim_inversion:
            direction = jnp.sqrt(1.0 - abar_prev) * eps
        else:
            direction = jnp.sqrt(1.0 - abar_prev - (eta**2) * var) * eps
        mu = jnp.sqrt(abar_prev) * pred_x0 + direction
        prev_sample = mu
        if variance_noise is not None:
            if is_ddim_inversion:
                prev_sample = mu + eta * variance_noise
            else:
                prev_sample = mu + eta * jnp.sqrt(var) * variance_noise
        if return_pred_x0:
            return prev_sample, pred_x0
        if return_mu:
            return prev_sample, mu
        return prev_sample

    def next_step(self, eps, t, sample) -> jnp.ndarray:
        """DDIM forward-inversion Euler step (``ddim_inversion.py:8-29``).

        Maps x at timestep (t - ratio) to x at timestep t:
        the reference treats `timestep` as the *next* (larger) step and derives
        the current one by subtracting the ratio.
        """
        cur_t = t - self.step_ratio
        abar_cur = jnp.where(
            cur_t >= 0,
            jnp.take(self.alphas_cumprod, jnp.clip(cur_t, 0)),
            self.final_alpha_cumprod,
        )
        abar_next = self.abar(t)
        beta_cur = 1.0 - abar_cur
        x0 = (sample - jnp.sqrt(beta_cur) * eps) / jnp.sqrt(abar_cur)
        direction = jnp.sqrt(1.0 - abar_next) * eps
        return jnp.sqrt(abar_next) * x0 + direction

    def compute_full_coeff(
        self, t, tt, eta, *, is_ddim_inversion: bool = False
    ) -> jnp.ndarray:
        """sqrt(1 - abar_tt - omega^2_{t,tt}) (``inversion_utils.py:168-195``).

        ``tt`` is the next (smaller) timestep in the inference schedule (or 0 at
        the final step), indexed directly into the tables as in the reference.
        """
        abar = self.alphas_cumprod
        abar_t = jnp.take(abar, t)
        abar_tt = jnp.take(abar, tt)
        sigma_t = jnp.sqrt(1.0 - abar_t)
        sigma_tt = jnp.sqrt(1.0 - abar_tt)
        a_tt = jnp.sqrt(abar_tt)
        omega = eta * (sigma_tt / (sigma_t * a_tt)) * jnp.sqrt(abar_tt - abar_t)
        if is_ddim_inversion:
            omega = jnp.zeros_like(omega)
        return jnp.sqrt(1.0 - abar_tt - omega**2)

    def h_edit_coeff(self, t, tt, eta, *, is_ddim_inversion: bool = False) -> jnp.ndarray:
        """The full editing coefficient used by every h-Edit variant:

        ``compute_full_coeff(t, tt) - sqrt(1-abar_t) * sqrt(abar_tt)/sqrt(abar_t)``
        (``p2p_h_edit.py:141-142, 347-348, 508-509, 664-665``).
        """
        abar = self.alphas_cumprod
        abar_t = jnp.take(abar, t)
        abar_tt = jnp.take(abar, tt)
        ratio_alpha = jnp.sqrt(abar_tt) / jnp.sqrt(abar_t)
        return (
            self.compute_full_coeff(t, tt, eta, is_ddim_inversion=is_ddim_inversion)
            - jnp.sqrt(1.0 - abar_t) * ratio_alpha
        )


def slerp(val, low, high):
    """Spherical interpolation over flattened batch dims
    (``inversion_utils.py:142-152``); used by the negative-prompt baseline."""
    low2 = low.reshape(low.shape[0], -1)
    high2 = high.reshape(high.shape[0], -1)
    low_norm = low2 / jnp.linalg.norm(low2, axis=1, keepdims=True)
    high_norm = high2 / jnp.linalg.norm(high2, axis=1, keepdims=True)
    omega = jnp.arccos(jnp.clip(jnp.sum(low_norm * high_norm, axis=1), -1.0, 1.0))
    so = jnp.sin(omega)
    # Guard the parallel-vector case (sin(omega)=0): fall back to lerp.  The
    # reference's torch slerp NaNs here; it is never hit with real embeddings.
    safe_so = jnp.where(jnp.abs(so) < 1e-7, 1.0, so)
    w_low = jnp.where(jnp.abs(so) < 1e-7, 1.0 - val, jnp.sin((1.0 - val) * omega) / safe_so)
    w_high = jnp.where(jnp.abs(so) < 1e-7, val, jnp.sin(val * omega) / safe_so)
    res = w_low[:, None] * low2 + w_high[:, None] * high2
    return res.reshape(low.shape)
