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
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize('rho', [0.9, -0.95, 0.99])
def test_high_correlation_stays_accurate(rho):
    # the corner-CDF scheme is uniformly accurate in rho (the legacy
    # conditional-quadrature scheme degraded to ~5e-3 here)
    mu = (0.5, -0.3)
    got = np.asarray(bvn_cell_masses(jnp.array(mu), 4.0, 4.0, rho, 2.0, 10))
    want = oracle_cell_masses(mu, 4.0, 4.0, rho, 2.0, 10)
    np.testing.assert_allclose(got, want, atol=2e-6)
    np.testing.assert_allclose(got.sum(), want.sum(), atol=1e-6)


def test_extreme_anisotropy_high_corr():
    # the regime that broke the quadrature scheme (sigma_x << cell with
    # |rho| ~ 1): worst error was ~3e-3 there, corner CDFs hold ~1e-7
    mu = (7.3, -11.0)
    got = np.asarray(bvn_cell_masses(jnp.array(mu), 5.0, 80.0, -0.95,
                                     25.0, 24))
    want = oracle_cell_masses(mu, 5.0, 80.0, -0.95, 25.0, 24)
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize('rho', [0.0, 0.25, 0.6, 0.8, 0.95])
def test_quad_scheme_cross_check(rho):
    # the two independent schemes agree with each other (and the oracle)
    # away from the quadrature scheme's high-|rho| weakness
    from parasitoids_tpu.ops.bvn import bvn_cell_masses_quad
    mu = jnp.array([3.0, -4.0])
    a = np.asarray(bvn_cell_masses(mu, 30.0, 20.0, rho, 10.0, 12))
    b = np.asarray(bvn_cell_masses_quad(mu, 30.0, 20.0, rho, 10.0, 12, G=20))
    tol = 5e-5 if rho < 0.9 else 5e-3
    np.testing.assert_allclose(a, b, atol=tol)


def test_basic_properties():
    # mirrors test_ParsitoidModel.py:247-296: sums to ~1, nonnegative,
    # peak at center, correlation skews the right quadrants
    cdf = np.asarray(bvn_cell_masses(jnp.zeros(2), 4.0, 4.0, 0.0, 2.0, 9))
    assert cdf.min() >= 0.0
    assert 0.99 < cdf.sum() <= 1.0
    K = 9
    assert cdf[K, K] == cdf.max()
    # symmetric for rho=0, mu=0
    np.testing.assert_allclose(cdf, cdf.T, atol=3e-7)
    np.testing.assert_allclose(cdf, cdf[::-1, ::-1], atol=3e-7)

    # positive correlation: more mass in the (+x,+y) and (-x,-y) quadrants
    cdfr = np.asarray(bvn_cell_masses(jnp.zeros(2), 4.0, 4.0, 0.5, 2.0, 9))
    q_pp = cdfr[:K, K + 1:].sum()   # +y, +x
    q_pm = cdfr[:K, :K].sum()       # +y, -x
    assert q_pp > q_pm
    np.testing.assert_allclose(cdfr, cdfr[::-1, ::-1], atol=3e-7)


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


@pytest.mark.parametrize('rho0', [0.1, 0.5, 0.85, 0.97])
def test_gradients_wrt_all_params(rho0):
    # NUTS/MAP differentiate through (mu, sigma, rho) in every branch of
    # the corner scheme, including the |rho| > 0.925 series
    def center_mass(theta):
        mu, sx, sy, rho = theta[:2], theta[2], theta[3], theta[4]
        return bvn_cell_masses(mu, sx, sy, rho, 5.0, 4)[4, 4]

    theta = jnp.array([1.0, -1.0, 10.0, 8.0, rho0])
    g = np.asarray(jax.grad(center_mass)(theta))
    assert np.all(np.isfinite(g))
    assert np.linalg.norm(g) > 0
    # finite-difference check on the rho gradient
    eps = 1e-3
    tp = theta.at[4].add(eps)
    tm = theta.at[4].add(-eps)
    fd = (center_mass(tp) - center_mass(tm)) / (2 * eps)
    np.testing.assert_allclose(g[4], fd, rtol=0.05, atol=1e-4)


@pytest.mark.parametrize('case', [
    # (mu_x, mu_y, sig_x, sig_y, rho) spanning every node-count branch and
    # both signs of rho, incl. the |rho| > 0.925 asymptotic-series branch
    (3.0, -7.0, 21.0, 14.0, 0.25),
    (0.0, 0.0, 4.0, 40.0, -0.8),
    (10.0, 5.0, 30.0, 30.0, 0.95),
    (-2.0, 1.0, 12.0, 9.0, -0.97),
    (1.0, 2.0, 8.0, 8.0, 0.0),
])
def test_closed_form_gradient_matches_fd(case):
    """The corner scheme carries a custom JVP built from the closed-form
    BVN CDF derivatives (dL/dh = -phi(h) Phi(-(k - rho h)/sqrt(1-rho^2)),
    dL/drho = the bivariate density, Plackett's identity) instead of
    differentiating through the Gauss-Legendre quadrature.  Check every
    parameter's reverse-mode gradient against central differences of the
    primal, and that jvp == grad . tangent (the transpose is consistent)."""
    K = 6
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(2 * K + 1, 2 * K + 1)), jnp.float32)

    def f(theta):
        return jnp.sum(w * bvn_cell_masses(theta[:2], theta[2], theta[3],
                                           theta[4], theta[5], K))

    theta = jnp.asarray(list(case) + [25.0], jnp.float32)
    g = np.asarray(jax.grad(f)(theta), np.float64)
    for i in range(6):
        eps = 1e-2 * max(1.0, abs(float(theta[i])))
        fd = (float(f(theta.at[i].add(eps)))
              - float(f(theta.at[i].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=5e-5,
                                   err_msg=f'param {i} of case {case}')
    tangent = jnp.asarray(rng.normal(size=6), jnp.float32)
    _, jv = jax.jvp(f, (theta,), (tangent,))
    np.testing.assert_allclose(float(jv), float(g @ np.asarray(tangent)),
                               rtol=1e-3, atol=1e-5)


# ----------------------------------------------------------------------
# ensemble-batched variant (fixed-G two-branch select, VERDICT r4 item 4)
# ----------------------------------------------------------------------

@pytest.mark.parametrize('mu,sx,sy,rho,cell,K', CASES)
def test_batched_matches_oracle(mu, sx, sy, rho, cell, K):
    from parasitoids_tpu.ops.bvn import bvn_cell_masses_batched
    got = np.asarray(bvn_cell_masses_batched(jnp.array(mu), sx, sy, rho,
                                             cell, K))
    want = oracle_cell_masses(mu, sx, sy, rho, cell, K)
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize('rho', [0.0, -0.5, 0.9, 0.95, -0.99])
def test_batched_matches_scalar_scheme(rho):
    """The select scheme agrees with the switch scheme everywhere in rho
    (identical high-corr series; G=20 low-corr is a superset of the
    6/12/20 tiers)."""
    from parasitoids_tpu.ops.bvn import bvn_cell_masses_batched
    mu = jnp.array([0.4, -0.2])
    a = np.asarray(bvn_cell_masses(mu, 4.0, 3.0, rho, 2.0, 8))
    b = np.asarray(bvn_cell_masses_batched(mu, 4.0, 3.0, rho, 2.0, 8))
    np.testing.assert_allclose(a, b, atol=5e-7)


def test_batched_vmap_per_particle_rho():
    """The design target: a particle axis with per-particle rho spanning
    both branches vmaps correctly (each row matches its scalar call)."""
    from parasitoids_tpu.ops.bvn import bvn_cell_masses_batched
    rhos = jnp.array([0.0, 0.6, -0.93, 0.98])
    mu = jnp.array([0.4, -0.2])
    f = jax.vmap(lambda r: bvn_cell_masses_batched(mu, 4.0, 3.0, r, 2.0, 6))
    got = np.asarray(jax.jit(f)(rhos))
    for i, r in enumerate(np.asarray(rhos)):
        want = oracle_cell_masses((0.4, -0.2), 4.0, 3.0, float(r), 2.0, 6)
        np.testing.assert_allclose(got[i], want, atol=2e-6)


def test_batched_gradients_match_scalar():
    """Both variants share the closed-form tangent rule, so gradients are
    identical up to the (tiny) primal-clamp mask difference."""
    from parasitoids_tpu.ops.bvn import bvn_cell_masses_batched

    def loss(fn, rho):
        out = fn(jnp.array([0.3, 0.1]), 4.0, 3.0, rho, 2.0, 6)
        return jnp.sum(out * out)

    for rho in (0.2, 0.95):
        ga = jax.grad(lambda r: loss(bvn_cell_masses, r))(rho)
        gb = jax.grad(lambda r: loss(bvn_cell_masses_batched, r))(rho)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-8)
