"""Validation of the fixed-window BVN cell integrator against the
double-precision host Genz-algorithm implementation (itself validated against
scipy; replaces the reference's mvnun-based tests,
test_ParsitoidModel.py:247-296)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parasitoids_tpu.ops import bvn_cell_masses
from parasitoids_tpu.utils import bvn_cell_masses_host as oracle_cell_masses


CASES = [
    # mu, sig_x, sig_y, rho, cell, K  — spans reference regimes
    ((0.0, 0.0), 4.0, 4.0, 0.0, 2.0, 9),        # test-suite D_params
    ((0.7, -0.5), 4.0, 4.0, 0.0, 2.0, 9),       # sub-cell offset
    ((5.0, -8.0), 171.82, 144.58, 0.253, 50.0, 20),  # flight kernel defaults
    ((-10.0, 11.0), 7.096, 7.26, 0.0, 25.0, 5),  # local kernel defaults
    ((0.3, 0.1), 1.0, 1.0, 0.6, 2.0, 8),         # sigma < cell
    ((0.0, 0.0), 30.0, 5.0, -0.7, 10.0, 12),     # anisotropic, negative rho
]


@pytest.mark.parametrize('mu,sx,sy,rho,cell,K', CASES)
def test_matches_scipy_oracle(mu, sx, sy, rho, cell, K):
    got = np.asarray(bvn_cell_masses(jnp.array(mu), sx, sy, rho, cell, K))
    want = oracle_cell_masses(mu, sx, sy, rho, cell, K)
    tol = 2e-5 if jax.config.read('jax_enable_x64') else 5e-5
    np.testing.assert_allclose(got, want, atol=tol)


@pytest.mark.parametrize('rho', [0.9, -0.95, 0.99])
def test_high_correlation_degrades_gracefully(rho):
    mu = (0.5, -0.3)
    got = np.asarray(bvn_cell_masses(jnp.array(mu), 4.0, 4.0, rho, 2.0, 10,
                                     G=24))
    want = oracle_cell_masses(mu, 4.0, 4.0, rho, 2.0, 10)
    # per-cell error grows as the conditional becomes a step; total mass and
    # column marginals stay exact
    np.testing.assert_allclose(got.sum(), want.sum(), atol=1e-5)
    np.testing.assert_allclose(got.sum(axis=0), want.sum(axis=0), atol=1e-4)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_basic_properties():
    # mirrors test_ParsitoidModel.py:247-296: sums to ~1, nonnegative,
    # peak at center, correlation skews the right quadrants
    cdf = np.asarray(bvn_cell_masses(jnp.zeros(2), 4.0, 4.0, 0.0, 2.0, 9))
    assert cdf.min() >= 0.0
    assert 0.99 < cdf.sum() <= 1.0
    K = 9
    assert cdf[K, K] == cdf.max()
    # symmetric for rho=0, mu=0
    np.testing.assert_allclose(cdf, cdf.T, atol=1e-7)
    np.testing.assert_allclose(cdf, cdf[::-1, ::-1], atol=1e-7)

    # positive correlation: more mass in the (+x,+y) and (-x,-y) quadrants
    cdfr = np.asarray(bvn_cell_masses(jnp.zeros(2), 4.0, 4.0, 0.5, 2.0, 9))
    q_pp = cdfr[:K, K + 1:].sum()   # +y, +x
    q_pm = cdfr[:K, :K].sum()       # +y, -x
    assert q_pp > q_pm
    np.testing.assert_allclose(cdfr, cdfr[::-1, ::-1], atol=1e-7)


def test_mean_offset_moves_peak():
    # distribution centered 2 cells right, 1 cell up
    cell = 2.0
    cdf = np.asarray(bvn_cell_masses(jnp.array([2 * cell, 1 * cell]),
                                     1.0, 1.0, 0.0, cell, 6))
    r, c = np.unravel_index(cdf.argmax(), cdf.shape)
    assert (r, c) == (6 - 1, 6 + 2)  # +y decreases row index


def test_vmap_and_jit():
    f = jax.jit(jax.vmap(
        lambda mu: bvn_cell_masses(mu, 20.0, 15.0, 0.2, 25.0, 6)))
    mus = jnp.array([[0.0, 0.0], [5.0, -3.0], [-12.0, 12.0]])
    out = f(mus)
    assert out.shape == (3, 13, 13)
    assert np.all(np.asarray(out) >= 0)


def test_gradients_flow():
    def total_center(mu):
        return bvn_cell_masses(mu, 10.0, 10.0, 0.1, 5.0, 4)[4, 4]
    g = jax.grad(total_center)(jnp.array([1.0, -1.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.linalg.norm(np.asarray(g)) > 0
