"""Bivariate-normal cell integration (L2 core numeric).

Replaces the reference's adaptive-ring Fortran integrator
(``ParasitoidModel.get_mvn_cdf_values``, ParasitoidModel.py:311-380; Genz's
MVNDST via ``scipy.stats.mvn.mvnun``) with a *fixed-window*, fully
vectorizable closed-form scheme suited to XLA: every cell of a static
``(2K+1, 2K+1)`` window is integrated in one dense batch, so the op can be
``vmap``-ed over the 1,440 per-minute kernels of a day and fused by XLA.

Method — conditional decomposition with probability-space quadrature:

    mass(i, j) = ∫_{x in col_j} φ_{μx,σx}(x) ·
                 [Φ((y_hi(i) − m(x))/s) − Φ((y_lo(i) − m(x))/s)] dx

with conditional mean ``m(x) = μy + ρ σy (x − μx)/σx`` and conditional std
``s = σy sqrt(1 − ρ²)``.  Substituting ``u = Φ((x − μx)/σx)`` turns the outer
integral into ``∫ ΔΦ_y(x(u)) du`` over ``[Φ(a_j), Φ(b_j)]`` — the Gaussian
measure is absorbed into the variable change (the same trick Genz's algorithm
uses), so fixed-order Gauss–Legendre nodes adapt automatically to narrow
distributions.  The integrand is smooth in ``u``; accuracy degrades gracefully
only as |ρ| → 1 where it approaches a step (see tests for tolerances).

Unlike the reference, the window never grows at runtime: choose K so that the
window covers the adaptive stopping rule's 0.999 mass for all prior-plausible
σ (SURVEY.md section 7 "hard parts").  Row 0 is the +y edge and column 0 the
−x edge, matching the reference's matrix orientation
(ParasitoidModel.py:377-378).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtr, ndtri

__all__ = ['bvn_cell_masses', 'gauss_legendre']


@lru_cache(maxsize=None)
def gauss_legendre(n: int):
    """Gauss–Legendre nodes/weights on [-1, 1] (host-side, static)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x, w


@partial(jax.jit, static_argnames=('K', 'G'))
def bvn_cell_masses(mu, sig_x, sig_y, rho, cell, K, G=16):
    """Integrate N(mu, S) over every cell of a (2K+1)×(2K+1) grid window.

    Args:
        mu: (2,) distribution mean (x, y) in meters, relative to the center
            cell's center.
        sig_x, sig_y: standard deviations (m); rho: correlation.
        cell: cell side length (m).
        K: static window half-width in cells.
        G: Gauss–Legendre nodes per cell column.

    Returns:
        (2K+1, 2K+1) array of cell probabilities; row 0 is the top (+y) row,
        column 0 the left (−x) column, center cell at [K, K] — the same
        orientation as the reference's ``cdf_mat``.
    """
    dtype = jnp.result_type(float)
    mu = jnp.asarray(mu, dtype)
    sig_x = jnp.maximum(jnp.asarray(sig_x, dtype), 1e-8)
    sig_y = jnp.maximum(jnp.asarray(sig_y, dtype), 1e-8)
    rho = jnp.clip(jnp.asarray(rho, dtype), -1 + 1e-7, 1 - 1e-7)
    cell = jnp.asarray(cell, dtype)

    n = 2 * K + 1
    t_np, w_np = gauss_legendre(G)
    t = jnp.asarray(t_np, dtype)
    w = jnp.asarray(w_np, dtype)

    # x edges ascending with column index: col j spans [(j-K-.5)c, (j-K+.5)c]
    xe = (jnp.arange(n + 1, dtype=dtype) - K - 0.5) * cell
    u_edges = ndtr((xe - mu[0]) / sig_x)                      # (n+1,)
    lo, hi = u_edges[:-1], u_edges[1:]
    half = 0.5 * (hi - lo)                                    # (n,)
    mid = 0.5 * (hi + lo)

    # Saturated quadrature nodes (u at 0 or 1) are replaced by a harmless
    # midpoint before ndtri and patched with a large constant after: the
    # naive clip produces 0-gradient x inf-slope = NaN under autodiff
    # (ndtri' = 1/phi overflows f32 beyond |z| ~ 12).
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)
    uu0 = mid[:, None] + half[:, None] * t[None, :]           # (n, G)
    in_range = (uu0 > tiny) & (uu0 < 1.0 - jnp.finfo(dtype).eps)
    z_safe = ndtri(jnp.where(in_range, uu0, 0.5))
    z = jnp.where(in_range, z_safe,
                  jnp.where(uu0 <= tiny, -38.0, 38.0))        # standardized x

    m_cond = mu[1] + rho * sig_y * z                          # (n, G)
    s_cond = jnp.maximum(sig_y * jnp.sqrt(1.0 - rho * rho), 1e-12)

    # y edges descending with row index: row i spans [(K-i-.5)c, (K-i+.5)c]
    ye = (K + 0.5 - jnp.arange(n + 1, dtype=dtype)) * cell    # (n+1,)
    zz = (ye[None, None, :] - m_cond[:, :, None]) / s_cond    # (n, G, n+1)
    cdf = ndtr(zz)
    d_phi = cdf[..., :-1] - cdf[..., 1:]                      # (n, G, n) cols,G,rows

    # mass(i, j) = sum_g half_j * w_g * d_phi[j, g, i]
    # HIGHEST precision: JAX's default contraction precision truncates f32
    # inputs to bf16 on TPU (and mirrors that on CPU), costing ~1e-3
    # relative error; these contractions are tiny, so full f32 is free.
    return jnp.einsum('j,jgi,g->ij', half, d_phi, w,
                      precision=jax.lax.Precision.HIGHEST)
