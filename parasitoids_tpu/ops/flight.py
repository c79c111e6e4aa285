"""Take-off probability functions (L2), pure JAX.

Reimplements the analytic flight-probability model functions of the reference
(``g_wind_prob`` ParasitoidModel.py:231-240, ``f_time_prob`` :243-267,
``Dmat`` :269-280, ``h_flight_prob`` :282-309) as jit/vmap/grad-compatible
ops.  All are smooth, making the full forward model differentiable for
gradient-based MAP/NUTS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['g_wind_prob', 'f_time_prob', 'h_flight_prob', 'dmat']


def g_wind_prob(windr, aw, bw):
    """Probability of take-off given wind speed: decreasing logistic.

    aw: wind speed at which the probability is 0.5; bw: steepness.
    Computed as a stable sigmoid: the naive ``1/(1+exp(u))`` keeps a finite
    primal when ``exp`` overflows to inf but its autodiff is inf/inf = NaN
    — at f32, ``b*(a-t) > 88`` is reachable under the Bayes priors, and one
    NaN gradient coordinate poisons every NUTS trajectory.
    """
    return jax.nn.sigmoid(-bw * (windr - aw))


def f_time_prob(n, a1, b1, a2, b2):
    """Take-off probability mass function over ``n`` equally spaced times of
    day (hours): normalized positive part of a difference of two logistics
    (morning rise a1/b1, evening fall a2/b2); stable sigmoids (see
    ``g_wind_prob``)."""
    t_tild = jnp.linspace(0.0, 24.0 - 24.0 / n, n)
    likelihood = jnp.maximum(
        jax.nn.sigmoid(b1 * (t_tild - a1)) -
        jax.nn.sigmoid(b2 * (t_tild - a2)),
        0.0)
    # the positive part can underflow to identically zero (b1/b2 are
    # sampled in log space; a warmup overshoot to b ~ 1e-8 flattens both
    # sigmoids to exactly 0.5 in f32) — 0/0 here would poison the NUTS
    # gradient.  Guard with a where so the degenerate branch returns an
    # all-zero pmf with ZERO gradient (a bare 1/tiny floor would make the
    # gradient explode instead of NaN — no better)
    total = likelihood.sum()
    eps = jnp.asarray(1e-6, likelihood.dtype)
    return jnp.where(total > eps,
                     likelihood / jnp.maximum(total, eps), 0.0)


def h_flight_prob(day_windr, lam, aw, bw, a1, b1, a2, b2):
    """Per-time-period take-off probability for one day's wind trace.

    ``h = λ (f·g + integral_avg)`` where ``integral_avg`` redistributes
    probability from periods when wind prevented flight to later feasible
    periods via a cumulative-sum correction (ParasitoidModel.py:305-307,
    with ``alpha_pow = 1``).

    Args:
        day_windr: (n,) wind magnitudes for the day's periods.
    Returns:
        (n,) take-off probabilities.
    """
    n = day_windr.shape[0]
    alpha_pow = 1
    f_func = f_time_prob(n, a1, b1, a2, b2)
    g_func = g_wind_prob(day_windr, aw, bw)
    t_vec = jnp.linspace(1.0, n, n)
    eps = jnp.asarray(1e-12, f_func.dtype)
    integral_avg = (f_func * g_func / t_vec /
                    jnp.maximum(jnp.max(f_func), eps) *
                    jnp.cumsum((1.0 - jnp.cumsum(f_func) ** alpha_pow) *
                               (f_func - f_func * g_func)))
    return lam * (f_func * g_func + integral_avg)


def dmat(sig_x, sig_y, rho):
    """Diffusion covariance matrix from (σx, σy, ρ) (ref ``Dmat``)."""
    cov = rho * sig_x * sig_y
    return jnp.array([[sig_x ** 2, cov], [cov, sig_y ** 2]])
