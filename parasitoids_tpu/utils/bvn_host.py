"""Host-side double-precision bivariate normal probabilities.

A first-party, vectorized NumPy implementation of the Drezner–Wesolowsky /
Genz algorithm for the bivariate normal distribution — the role played in the
reference by Alan Genz's Fortran MVNDST reached through
``scipy.stats.mvn.mvnun`` (ParasitoidModel.py:22,340; removed from modern
SciPy).  Used as the high-precision oracle for the on-device integrator's
tests and by host tooling that needs exact cell masses.

The method follows the published algorithm (Drezner & Wesolowsky 1990;
Genz 1993/2004 "Numerical computation of rectangular bivariate and trivariate
normal and t probabilities"): Gauss–Legendre quadrature of the correlation
integral for |r| <= 0.925 and the complementary asymptotic-series form for
|r| > 0.925.  Absolute accuracy ~1e-14.
"""

from __future__ import annotations

import numpy as np
from scipy.special import ndtr

__all__ = ['bvn_upper', 'bvn_rect', 'bvn_cell_masses_host']

_X20, _W20 = np.polynomial.legendre.leggauss(20)

_SQRT_2PI = np.sqrt(2.0 * np.pi)
_TWO_PI = 2.0 * np.pi


def _bvn_upper_lowcorr(h, k, r):
    """Vectorized |r| < 0.925 branch (quadrature of the correlation
    integral)."""
    hk = h * k
    hs = 0.5 * (h * h + k * k)
    asr = np.arcsin(r)
    sn = np.sin(asr * 0.5 * (1.0 + _X20))                     # (G,)
    expo = ((sn * hk[..., None] - hs[..., None]) /
            (1.0 - sn ** 2))
    total = np.sum(_W20 * np.exp(expo), axis=-1)
    return total * asr / (2.0 * _TWO_PI) + ndtr(-h) * ndtr(-k)


def _bvn_upper_highcorr(h, k, r):
    """Vectorized |r| >= 0.925 branch (complementary series +
    quadrature)."""
    if r < 0.0:
        k = -k
    hk = h * k
    bvn = np.zeros_like(h)
    if abs(r) < 1.0:
        a_sq = (1.0 - r) * (1.0 + r)
        a = np.sqrt(a_sq)
        bs = (h - k) ** 2
        c = (4.0 - hk) / 8.0
        d = (12.0 - hk) / 16.0
        asr = -(bs / a_sq + hk) / 2.0
        bvn = np.where(asr > -100.0,
                       a * np.exp(asr) *
                       (1.0 - c * (bs - a_sq) * (1.0 - d * bs / 5.0) / 3.0 +
                        c * d * a_sq * a_sq / 5.0),
                       0.0)
        b = np.sqrt(bs)
        with np.errstate(over='ignore'):
            term = (np.exp(-hk / 2.0) * _SQRT_2PI * ndtr(-b / a) * b *
                    (1.0 - c * bs * (1.0 - d * bs / 5.0) / 3.0))
        bvn = bvn - np.where(-hk < 100.0, term, 0.0)
        a_half = a / 2.0
        xs = (a_half * (1.0 + _X20)) ** 2                      # (G,)
        rs = np.sqrt(1.0 - xs)
        asr1 = -(bs[..., None] / xs + hk[..., None]) / 2.0
        sp = 1.0 + c[..., None] * xs * (1.0 + d[..., None] * xs)
        ep = np.exp(-hk[..., None] * (1.0 - rs) / (2.0 * (1.0 + rs))) / rs
        with np.errstate(invalid='ignore'):
            contrib = np.where(asr1 > -100.0,
                               a_half * _W20 * np.exp(asr1) * (ep - sp), 0.0)
        bvn = bvn + np.sum(contrib, axis=-1)
        bvn = -bvn / _TWO_PI
    if r > 0.0:
        bvn = bvn + ndtr(-np.maximum(h, k))
    else:
        bvn = -bvn + np.where(k > h, ndtr(k) - ndtr(h), 0.0)
    return bvn


def bvn_upper(h, k, r):
    """Vectorized P(X > h, Y > k); broadcasts over h, k (r scalar)."""
    h_b, k_b = np.broadcast_arrays(np.asarray(h, float), np.asarray(k, float))
    h_b = np.array(h_b, float)
    k_b = np.array(k_b, float)
    r = float(r)
    if abs(r) < 0.925:
        if r == 0.0:
            out = ndtr(-h_b) * ndtr(-k_b)
        else:
            out = _bvn_upper_lowcorr(h_b, k_b, r)
    else:
        out = _bvn_upper_highcorr(h_b, k_b, r)
    # infinite-limit cleanup
    out = np.where(np.isposinf(h_b) | np.isposinf(k_b), 0.0, out)
    out = np.where(np.isneginf(h_b), ndtr(-k_b), out)
    out = np.where(np.isneginf(k_b) & ~np.isneginf(h_b), ndtr(-h_b), out)
    return out if out.shape else float(out)


def bvn_rect(low, upp, mu, sig_x, sig_y, rho):
    """P(low <= (X, Y) <= upp) for N(mu, S) — the ``mvnun`` equivalent.

    low/upp: length-2 sequences; mu: length-2 mean.
    """
    lx = (low[0] - mu[0]) / sig_x
    ux = (upp[0] - mu[0]) / sig_x
    ly = (low[1] - mu[1]) / sig_y
    uy = (upp[1] - mu[1]) / sig_y
    return (bvn_upper(lx, ly, rho) - bvn_upper(ux, ly, rho)
            - bvn_upper(lx, uy, rho) + bvn_upper(ux, uy, rho))


def bvn_cell_masses_host(mu, sig_x, sig_y, rho, cell, K):
    """(2K+1, 2K+1) grid-cell masses, same orientation as the device op
    (row 0 = +y, col 0 = -x)."""
    n = 2 * K + 1
    xe = ((np.arange(n + 1) - K - 0.5) * cell - mu[0]) / sig_x
    ye = (((K + 0.5 - np.arange(n + 1)) * cell) - mu[1]) / sig_y
    # upper-orthant values on the corner lattice
    U = bvn_upper(xe[:, None], ye[None, :], rho)      # [x_edge, y_edge]
    # cell (row i, col j): x in [xe[j], xe[j+1]], y in [ye[i+1], ye[i]]
    rect = (U[:-1, 1:] - U[1:, 1:]) - (U[:-1, :-1] - U[1:, :-1])
    return rect.T  # -> [row, col]
