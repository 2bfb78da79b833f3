"""Unit tests for the diffusion schedule numerics (SURVEY.md §4 "Unit").

An independent NumPy oracle re-derives the closed forms from the reference
formulas (``inversion_utils.py``) and the Schedule implementation is checked
against it, including the off-by-one-sensitive branches:
- leading timestep spacing with steps_offset=1
- prev_timestep < 0 -> final_alpha_cumprod (set_alpha_to_one=False)
- the is_ddim_inversion direction/noise branches
- compute_full_coeff's omega zeroing
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hedit_tpu.core.schedule import Schedule, leading_timesteps, make_beta_schedule


def np_tables(T=1000, b0=0.00085, b1=0.012):
    # float64 oracle; the implementation runs float32 (torch parity), so
    # comparisons allow small relative error from the 1000-step cumprod.
    betas = np.linspace(b0**0.5, b1**0.5, T) ** 2
    alphas = 1 - betas
    return np.cumprod(alphas)


def test_leading_timesteps_50():
    ts = leading_timesteps(1000, 50, steps_offset=1)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_leading_timesteps_100():
    # matches the reference docstring example: t = 1, 11, ..., 991
    ts = leading_timesteps(1000, 100, steps_offset=1)
    assert ts[0] == 991 and ts[-1] == 1


def test_abar_tables_match_oracle():
    sched = Schedule.create(50)
    abar = np_tables()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), abar, rtol=5e-4)
    np.testing.assert_allclose(float(sched.final_alpha_cumprod), abar[0], rtol=1e-6)


def test_variance_oracle():
    sched = Schedule.create(50)
    abar = np_tables()
    for t in [981, 501, 21]:
        prev = t - 20
        ap, app = abar[t], abar[prev]
        expected = ((1 - app) / (1 - ap)) * (1 - ap / app)
        np.testing.assert_allclose(float(sched.variance(t)), expected, rtol=1e-5)
    # t=1 -> prev=-19 -> final_alpha_cumprod
    ap, app = abar[1], abar[0]
    expected = ((1 - app) / (1 - ap)) * (1 - ap / app)
    np.testing.assert_allclose(float(sched.variance(1)), expected, rtol=1e-5)


@pytest.mark.parametrize("is_ddim", [False, True])
def test_reverse_step_oracle(is_ddim):
    sched = Schedule.create(50)
    abar = np_tables()
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    eps = rng.randn(1, 4, 8, 8).astype(np.float32)
    z = rng.randn(1, 4, 8, 8).astype(np.float32)
    t, eta = 501, 1.0
    prev = t - 20
    ap, app = abar[t], abar[prev]
    var = ((1 - app) / (1 - ap)) * (1 - ap / app)
    x0 = (x - np.sqrt(1 - ap) * eps) / np.sqrt(ap)
    if is_ddim:
        mu = np.sqrt(app) * x0 + np.sqrt(1 - app) * eps
        expected = mu + eta * z
    else:
        mu = np.sqrt(app) * x0 + np.sqrt(1 - app - eta**2 * var) * eps
        expected = mu + eta * np.sqrt(var) * z

    got = sched.reverse_step(
        jnp.asarray(eps), t, jnp.asarray(x), eta=eta,
        variance_noise=jnp.asarray(z), is_ddim_inversion=is_ddim,
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=1e-5)

    # return_pred_x0 / return_mu options
    _, px0 = sched.reverse_step(
        jnp.asarray(eps), t, jnp.asarray(x), eta=eta,
        variance_noise=jnp.asarray(z), is_ddim_inversion=is_ddim, return_pred_x0=True,
    )
    np.testing.assert_allclose(np.asarray(px0), x0, rtol=2e-4, atol=1e-5)
    _, mu_got = sched.reverse_step(
        jnp.asarray(eps), t, jnp.asarray(x), eta=eta,
        variance_noise=jnp.asarray(z), is_ddim_inversion=is_ddim, return_mu=True,
    )
    np.testing.assert_allclose(np.asarray(mu_got), mu, rtol=2e-4, atol=1e-5)


def test_next_step_roundtrip():
    """next_step (DDIM forward) then reverse_step with eta=0 must invert.

    With a *constant* eps the DDIM maps are exact inverses of each other.
    """
    sched = Schedule.create(50)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    t = 501
    x_next = sched.next_step(eps, t, x)  # x_{t-20} -> x_t
    # reverse: x_t -> x_{t-20} with eta=0 DDPM branch: direction sqrt(1-app-0)
    x_back = sched.reverse_step(eps, t, x_next, eta=0.0)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-3, atol=1e-4)


def test_compute_full_coeff_oracle():
    sched = Schedule.create(50)
    abar = np_tables()
    t, tt, eta = 501, 481, 1.0
    sig_t, sig_tt = np.sqrt(1 - abar[t]), np.sqrt(1 - abar[tt])
    a_tt = np.sqrt(abar[tt])
    omega = eta * (sig_tt / (sig_t * a_tt)) * np.sqrt(abar[tt] - abar[t])
    expected = np.sqrt(1 - abar[tt] - omega**2)
    got = sched.compute_full_coeff(t, tt, eta)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)
    # is_ddim_inversion zeroes omega
    got_d = sched.compute_full_coeff(t, tt, eta, is_ddim_inversion=True)
    np.testing.assert_allclose(float(got_d), np.sqrt(1 - abar[tt]), rtol=1e-5)


def test_h_edit_coeff():
    sched = Schedule.create(50)
    abar = np_tables()
    t, tt, eta = 501, 481, 1.0
    full = float(sched.compute_full_coeff(t, tt, eta))
    ratio = np.sqrt(abar[tt]) / np.sqrt(abar[t])
    expected = full - np.sqrt(1 - abar[t]) * ratio
    np.testing.assert_allclose(float(sched.h_edit_coeff(t, tt, eta)), expected, rtol=1e-5)


def test_linear_beta_schedule_face_model():
    # face-swapping config: linear 1e-4 -> 2e-2 over 1000 (main_edit.py:130-134)
    betas = make_beta_schedule("linear", 1000, 1e-4, 2e-2)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 2e-2, rtol=1e-6)


def test_schedule_is_pytree():
    import jax

    sched = Schedule.create(50)
    leaves = jax.tree_util.tree_leaves(sched)
    assert len(leaves) == 4  # abar, alphas, final_abar, timesteps

    @jax.jit
    def f(s: Schedule):
        return s.h_edit_coeff(501, 481, 1.0)

    assert np.isfinite(float(f(sched)))


def test_slerp_matches_reference_formula_and_guards_parallel():
    """slerp parity with the reference's (itself-uncalled) utility
    (``inversion_utils.py:142-158``): endpoint exactness, the spherical
    formula on generic batches, and the parallel-vector case where the
    torch original divides by sin(0)=0 and NaNs — ours falls back to lerp.
    """
    from hedit_tpu.core.schedule import slerp

    rs = np.random.RandomState(3)
    low = rs.randn(4, 7, 5).astype(np.float32)
    high = rs.randn(4, 7, 5).astype(np.float32)

    # reference formula, straight numpy transliteration (f64 oracle)
    def ref_slerp(val, lo, hi):
        lo2 = lo.reshape(lo.shape[0], -1).astype(np.float64)
        hi2 = hi.reshape(hi.shape[0], -1).astype(np.float64)
        ln = lo2 / np.linalg.norm(lo2, axis=1, keepdims=True)
        hn = hi2 / np.linalg.norm(hi2, axis=1, keepdims=True)
        omega = np.arccos((ln * hn).sum(1))
        so = np.sin(omega)
        res = (np.sin((1.0 - val) * omega) / so)[:, None] * lo2 \
            + (np.sin(val * omega) / so)[:, None] * hi2
        return res.reshape(lo.shape)

    for val in (0.0, 0.3, 0.8, 1.0):
        got = np.asarray(slerp(val, jnp.asarray(low), jnp.asarray(high)))
        want = ref_slerp(val, low, high)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # endpoints are exact
    np.testing.assert_allclose(
        np.asarray(slerp(0.0, jnp.asarray(low), jnp.asarray(high))), low,
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(slerp(1.0, jnp.asarray(low), jnp.asarray(high))), high,
        rtol=1e-6, atol=1e-6)

    # parallel vectors: reference NaNs (sin(omega)=0); ours lerps
    par = slerp(0.25, jnp.asarray(low), jnp.asarray(low * 2.0))
    assert bool(jnp.isfinite(par).all())
    np.testing.assert_allclose(np.asarray(par), low * (0.75 + 0.25 * 2.0),
                               rtol=1e-5, atol=1e-5)
