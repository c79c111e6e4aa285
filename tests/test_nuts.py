"""Tests for the from-scratch NUTS sampler (bayes/nuts.py).

Statistical correctness is checked on analytic targets (the standard way to
validate a hand-rolled sampler); the parasitoid-model target is exercised
end to end under --runslow.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import random

from parasitoids_tpu.bayes.nuts import NUTSConfig, nuts_sample
from tests._fastslow import FAST, n as _n


def _corr_gauss_logpdf(z):
    """2-D correlated Gaussian: mean (1, -2), sd (1, 3), rho 0.7."""
    mu = jnp.array([1.0, -2.0])
    sd = jnp.array([1.0, 3.0])
    rho = 0.7
    x = (z - mu) / sd
    quad = (x[0] ** 2 - 2 * rho * x[0] * x[1] + x[1] ** 2) / (1 - rho ** 2)
    return -0.5 * quad


def test_nuts_correlated_gaussian_moments():
    cfg = NUTSConfig(num_warmup=300, num_samples=1500, max_depth=8,
                     init_step_size=0.5)
    out = nuts_sample(_corr_gauss_logpdf, jnp.zeros(2), random.PRNGKey(0),
                      cfg)
    s = np.asarray(out['samples'])
    assert int(out['n_divergent']) == 0
    assert 0.55 < float(out['accept_rate']) <= 1.0
    np.testing.assert_allclose(s.mean(axis=0), [1.0, -2.0], atol=0.25)
    np.testing.assert_allclose(s.std(axis=0), [1.0, 3.0], rtol=0.2)
    corr = np.corrcoef(s.T)[0, 1]
    assert 0.55 < corr < 0.85


def test_nuts_mass_matrix_adapts_to_scales():
    """Strongly anisotropic Gaussian: adaptation must find the scales."""
    sd = jnp.array([0.05, 5.0, 1.0])

    def logpdf(z):
        return -0.5 * jnp.sum((z / sd) ** 2)

    cfg = NUTSConfig(num_warmup=400, num_samples=800, max_depth=8,
                     init_step_size=0.1)
    out = nuts_sample(logpdf, jnp.zeros(3), random.PRNGKey(1), cfg)
    s = np.asarray(out['samples'])
    inv_mass = np.asarray(out['inv_mass'])
    # inv_mass approximates the marginal variances
    np.testing.assert_allclose(np.sqrt(inv_mass), np.asarray(sd), rtol=0.5)
    np.testing.assert_allclose(s.std(axis=0), np.asarray(sd), rtol=0.25)


def test_nuts_dense_mass_recovers_covariance():
    """--dense-mass: the warmup-estimated dense metric must capture the
    target's off-diagonal structure, and the samples its moments.  On a
    rho=0.9 Gaussian a diagonal metric cannot represent the geometry; the
    dense run should also take cheaper trees (larger steps along the
    correlated direction)."""
    rho, sds = 0.9, np.array([1.0, 2.0])
    cov = np.array([[sds[0] ** 2, rho * sds[0] * sds[1]],
                    [rho * sds[0] * sds[1], sds[1] ** 2]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logpdf(z):
        return -0.5 * z @ prec @ z

    cfg = NUTSConfig(num_warmup=400, num_samples=1500, max_depth=8,
                     init_step_size=0.5, dense_mass=True)
    out = nuts_sample(logpdf, jnp.zeros(2), random.PRNGKey(3), cfg)
    s = np.asarray(out['samples'])
    inv_mass = np.asarray(out['inv_mass'])
    assert inv_mass.shape == (2, 2)
    # the metric IS the posterior covariance estimate (up to shrinkage)
    np.testing.assert_allclose(inv_mass, cov, rtol=0.5)
    assert inv_mass[0, 1] > 0.5 * cov[0, 1]
    assert int(out['n_divergent']) == 0
    np.testing.assert_allclose(np.cov(s.T), cov, rtol=0.3, atol=0.15)

    # diagonal run on the same target for comparison: both must be correct;
    # the dense metric should not be slower-mixing (proxy: step size is at
    # least comparable)
    out_d = nuts_sample(logpdf, jnp.zeros(2), random.PRNGKey(3),
                        cfg._replace(dense_mass=False))
    np.testing.assert_allclose(np.cov(np.asarray(out_d['samples']).T), cov,
                               rtol=0.3, atol=0.2)
    assert float(out['step_size']) > 0.5 * float(out_d['step_size'])


def test_nuts_fixed_mass_warm_start():
    """fixed_mass + init_inv_mass: the metric must stay exactly at the
    supplied (Hessian-derived) value, sampling must stay correct, and the
    preconditioned chain must use shallower trees than an identity-metric
    one on an anisotropic target."""
    from parasitoids_tpu.bayes.nuts import inv_mass_from_hessian

    rho, sds = 0.9, np.array([0.2, 5.0])
    cov = np.array([[sds[0] ** 2, rho * sds[0] * sds[1]],
                    [rho * sds[0] * sds[1], sds[1] ** 2]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logpdf(z):
        return -0.5 * z @ prec @ z

    im = inv_mass_from_hessian(prec)
    np.testing.assert_allclose(np.asarray(im), cov, rtol=1e-3, atol=1e-3)

    cfg = NUTSConfig(num_warmup=100, num_samples=1500, max_depth=8,
                     dense_mass=True, fixed_mass=True)
    out = nuts_sample(logpdf, jnp.zeros(2), random.PRNGKey(5), cfg,
                      init_inv_mass=im)
    # the metric never moved
    np.testing.assert_array_equal(np.asarray(out['inv_mass']),
                                  np.asarray(im))
    assert int(out['n_divergent']) == 0
    s = np.asarray(out['samples'])
    np.testing.assert_allclose(np.cov(s.T), cov, rtol=0.3, atol=0.02)
    # perfectly preconditioned: step size near 1 in metric units, far
    # larger than what an identity metric admits on the sd=0.2 direction
    assert float(out['step_size']) > 0.3


def test_inv_mass_from_hessian_guards():
    """Saddles (negative eigenvalues), flat directions and frozen slots all
    map to a well-conditioned PSD metric; non-finite input -> identity."""
    from parasitoids_tpu.bayes.nuts import (inv_mass_from_hessian,
                                            psd_clip_covariance)

    H = jnp.asarray(np.diag([4.0, -4.0, 0.0, 1e12]), jnp.float32)
    im = np.asarray(inv_mass_from_hessian(H))
    assert np.allclose(np.diag(im), [0.25, 0.25, 100.0, 1e-12])
    ev = np.linalg.eigvalsh(im)
    assert (ev > 0).all()

    bad = jnp.asarray(np.full((3, 3), np.nan), jnp.float32)
    np.testing.assert_array_equal(np.asarray(inv_mass_from_hessian(bad)),
                                  np.eye(3, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(psd_clip_covariance(bad)),
                                  np.eye(3, dtype=np.float32))

    # covariance clip: a negative-eigenvalue "covariance" becomes PSD
    C = jnp.asarray(np.diag([1.0, -0.5, 1e9]), jnp.float32)
    pc = np.asarray(psd_clip_covariance(C))
    assert np.allclose(np.diag(pc), [1.0, 0.5, 100.0])


def test_nuts_fixed_mass_stepwise_matches_and_resumes(tmp_path):
    """Stepwise fixed-mass runs are bitwise-equal to the monolithic program
    and to an interrupted+resumed run (the cfg_sig now carries
    fixed_mass)."""
    from parasitoids_tpu.bayes.nuts import (inv_mass_from_hessian,
                                            nuts_sample_stepwise)

    prec = jnp.asarray(np.linalg.inv([[1.0, 0.6], [0.6, 2.0]]), jnp.float32)

    def logpdf(z):
        return -0.5 * z @ prec @ z

    im = inv_mass_from_hessian(prec)
    cfg = NUTSConfig(num_warmup=30, num_samples=60, max_depth=6,
                     dense_mass=True, fixed_mass=True)
    mono = nuts_sample(logpdf, jnp.zeros(2), random.PRNGKey(7), cfg,
                       init_inv_mass=im)
    ckpt = str(tmp_path / 'fm.ckpt.npz')
    step = nuts_sample_stepwise(logpdf, jnp.zeros((1, 2)),
                                random.PRNGKey(7)[None], cfg,
                                steps_per_call=13, checkpoint_path=ckpt,
                                checkpoint_every=20,
                                init_inv_mass=im[None])
    np.testing.assert_array_equal(step['samples'][0],
                                  np.asarray(mono['samples']))

    # interrupt after warmup+some draws, then resume from the checkpoint
    import os
    ckpt2 = str(tmp_path / 'fm2.ckpt.npz')

    class _Stop(Exception):
        pass

    def bomb(phase, i, total):
        if phase == 'sample' and i >= 26:
            raise _Stop()

    with pytest.raises(_Stop):
        nuts_sample_stepwise(logpdf, jnp.zeros((1, 2)),
                             random.PRNGKey(7)[None], cfg,
                             steps_per_call=13, checkpoint_path=ckpt2,
                             checkpoint_every=20, progress=bomb,
                             init_inv_mass=im[None])
    assert os.path.exists(ckpt2)
    # a non-fixed-mass resume against this checkpoint must be refused
    with pytest.raises(ValueError, match='fixed_mass'):
        nuts_sample_stepwise(
            logpdf, jnp.zeros((1, 2)), random.PRNGKey(7)[None],
            cfg._replace(fixed_mass=False), steps_per_call=13,
            checkpoint_path=ckpt2, resume=True)
    res = nuts_sample_stepwise(logpdf, jnp.zeros((1, 2)),
                               random.PRNGKey(7)[None], cfg,
                               steps_per_call=13, checkpoint_path=ckpt2,
                               resume=True)
    np.testing.assert_array_equal(res['samples'][0],
                                  np.asarray(mono['samples']))


def test_nuts_vmappable_chains():
    cfg = NUTSConfig(num_warmup=50, num_samples=50, max_depth=5)
    keys = random.split(random.PRNGKey(2), 3)
    z0s = jnp.zeros((3, 2))
    out = jax.vmap(lambda z, k: nuts_sample(_corr_gauss_logpdf, z, k,
                                            cfg))(z0s, keys)
    assert out['samples'].shape == (3, 50, 2)
    assert np.isfinite(np.asarray(out['logp'])).all()


def _tiny_setup():
    """Tiny-config BayesSetup: full 10 km extent (sentinel fields sit ~8 km
    out) at coarse resolution so forward evals stay cheap on CPU."""
    from parasitoids_tpu.bayes.model import BayesSetup
    from parasitoids_tpu.config import Params

    p = Params()
    p.cmd_line_chg(['--kalbar'])
    p.PLOT = False
    p.OUTPUT = False
    p.PROB_MODEL = False
    p.ndays = 3
    p.domain_info = (10000.0, 50)
    p.interp_num = 2
    p.kernel_rad = 6
    p.kernel_rad_local = 3
    p.quad_nodes = 8
    return BayesSetup(p)


@pytest.mark.slow
def test_nuts_on_parasitoid_model():
    """End-to-end NUTS over the real (tiny-config) posterior."""
    from parasitoids_tpu.bayes.nuts import make_transformed_logpdf

    setup = _tiny_setup()
    logpdf, constrain, z0 = make_transformed_logpdf(setup)
    lp0 = float(logpdf(z0))
    assert np.isfinite(lp0)

    cfg = NUTSConfig(num_warmup=3, num_samples=3, max_depth=2,
                     init_step_size=0.01)
    out = nuts_sample(logpdf, z0, random.PRNGKey(0), cfg)
    assert np.isfinite(np.asarray(out['logp'])).all()
    m_vec, o_vec, _ = constrain(jnp.asarray(out['samples'][-1]))
    assert np.isfinite(np.asarray(m_vec)).all()
    assert np.isfinite(np.asarray(o_vec)).all()


def test_backward_subtree_uturn_symmetric():
    """Regression: the checkpoint U-turn criterion must be orientation-
    corrected for backward-built subtrees (dz along increasing trajectory
    time).  Before the fix, every leftward doubling of >= 2 leaves on a
    straight trajectory spuriously read as turning, collapsing backward
    growth and breaking reversibility."""
    from parasitoids_tpu.bayes import nuts as N

    def logpdf(z):
        return -0.5 * jnp.sum(z * z)

    lpg = jax.value_and_grad(logpdf)
    inv_mass = jnp.ones(2)
    z0 = jnp.zeros(2)
    p0 = jnp.array([1.0, 0.2])
    lp0, g0 = lpg(z0)
    e0 = -lp0 + N._kinetic(inv_mass, p0)
    key = random.PRNGKey(0)
    for depth in (1, 2, 3, 4):
        tf, *_ = N._build_subtree(lpg, inv_mass, jnp.float32(0.05),
                                  jnp.int32(depth), z0, p0, g0, e0, key, 6)
        tb, *_ = N._build_subtree(lpg, inv_mass, jnp.float32(-0.05),
                                  jnp.int32(depth), z0, p0, g0, e0, key, 6)
        # short straight segments: neither direction is a U-turn
        assert not bool(tf.turning), depth
        assert not bool(tb.turning), depth
        assert int(tf.n_leaf) == int(tb.n_leaf) == 2 ** depth

    # and a genuine U-turn IS detected in both directions: integrate more
    # than a half period of the unit Gaussian oscillator (period 2*pi)
    tf, *_ = N._build_subtree(lpg, inv_mass, jnp.float32(0.5),
                              jnp.int32(4), z0, p0, g0, e0, key, 6)
    tb, *_ = N._build_subtree(lpg, inv_mass, jnp.float32(-0.5),
                              jnp.int32(4), z0, p0, g0, e0, key, 6)
    assert bool(tf.turning)
    assert bool(tb.turning)
    assert int(tf.n_leaf) == int(tb.n_leaf)


@pytest.mark.slow
def test_nuts_map_init_zpacking_compatible():
    """The NUTS driver initializes chains from a short MAP fit
    (bayes/run.py ``--init map``); that relies on ``map_fit(use_sprd=False)``
    and ``make_transformed_logpdf`` sharing one z-packing (both built on
    ``_make_objective``).  Pin the contract: shapes match and the MAP point
    has a finite transformed-space log density no worse than the prior
    start."""
    from parasitoids_tpu.bayes.map_fit import map_fit
    from parasitoids_tpu.bayes.nuts import make_transformed_logpdf

    setup = _tiny_setup()
    logpdf, constrain, z0 = make_transformed_logpdf(setup)
    fit = map_fit(setup, n_steps=5, use_sprd=False)
    z_map = jnp.asarray(fit['z'], jnp.float32)
    assert z_map.shape == z0.shape
    lp_map = float(logpdf(z_map))
    assert np.isfinite(lp_map)
    # 5 Adam steps from the same start must not have moved to a worse mode
    # by orders of magnitude (smoke check on objective consistency)
    lp0 = float(logpdf(z0))
    assert lp_map > lp0 - abs(lp0)
    # constrained point is finite and n_periods stays at the fixed value
    m_vec, o_vec, _ = constrain(z_map)
    assert np.isfinite(np.asarray(m_vec)).all()
    assert np.isfinite(np.asarray(o_vec)).all()
    assert float(m_vec[13]) == 30.0


@pytest.mark.parametrize('interrupt', ['warmup', 'draw'])
def test_stepwise_checkpoint_resume_exact(tmp_path, interrupt):
    """A run interrupted mid-warmup or mid-draw and resumed from its
    transition checkpoint must produce EXACTLY the draws of an
    uninterrupted run (the checkpoint holds the full sampler state
    including RNG keys), and a completed run deletes its checkpoint."""
    import os

    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    cfg = NUTSConfig(num_warmup=8, num_samples=10, max_depth=4)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(5), 2)
    ckpt = str(tmp_path / 'run.ckpt.npz')

    ref = nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg)

    class Stop(Exception):
        pass

    stop_at = ('warmup', 5) if interrupt == 'warmup' else ('sample', 4)

    def interrupter(phase, i, total):
        if (phase, i) == stop_at:
            raise Stop

    with pytest.raises(Stop):
        nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg,
                             progress=interrupter, checkpoint_path=ckpt,
                             checkpoint_every=2)
    assert os.path.exists(ckpt)

    out = nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg,
                               checkpoint_path=ckpt, checkpoint_every=2,
                               resume=True)
    np.testing.assert_array_equal(out['samples'], ref['samples'])
    np.testing.assert_array_equal(out['logp'], ref['logp'])
    np.testing.assert_allclose(out['step_size'], ref['step_size'])
    assert not os.path.exists(ckpt)   # completed run drops the checkpoint


@pytest.mark.parametrize('gibbs', [False, True])
def test_stepwise_chunked_matches_single_step(gibbs):
    """``steps_per_call`` batches transitions into one device program (an
    inner lax.scan) without changing the math or the RNG stream: draws are
    bitwise identical for every chunk size, including a remainder chunk
    (10 draws at 3/call = programs of 3, 3, 3, 1)."""
    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    cfg = NUTSConfig(num_warmup=8, num_samples=10, max_depth=4)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(5), 2)
    kw = (dict(gibbs_n=_gibbs_target, n0=5.0) if gibbs
          else dict())
    target = None if gibbs else _corr_gauss_logpdf

    ref = nuts_sample_stepwise(target, z0s, keys, cfg, **kw)
    out = nuts_sample_stepwise(target, z0s, keys, cfg, steps_per_call=3,
                               **kw)
    np.testing.assert_array_equal(out['samples'], ref['samples'])
    np.testing.assert_array_equal(out['logp'], ref['logp'])
    np.testing.assert_allclose(out['step_size'], ref['step_size'])
    if gibbs:
        np.testing.assert_array_equal(out['n_periods'], ref['n_periods'])


def test_stepwise_chunked_checkpoint_resumes_across_chunk_sizes(tmp_path):
    """Checkpoints land on exact transition indices, so a run interrupted
    under one ``steps_per_call`` resumes exactly under another."""
    import os

    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    cfg = NUTSConfig(num_warmup=8, num_samples=10, max_depth=4)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(5), 2)
    ckpt = str(tmp_path / 'chunk.ckpt.npz')

    ref = nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg)

    class Stop(Exception):
        pass

    def interrupter(phase, i, total):
        if (phase, i) == ('sample', 6):
            raise Stop

    with pytest.raises(Stop):
        nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg,
                             progress=interrupter, checkpoint_path=ckpt,
                             checkpoint_every=2, steps_per_call=3)
    assert os.path.exists(ckpt)
    out = nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg,
                               checkpoint_path=ckpt, checkpoint_every=2,
                               resume=True, steps_per_call=4)
    np.testing.assert_array_equal(out['samples'], ref['samples'])
    np.testing.assert_array_equal(out['logp'], ref['logp'])
    assert not os.path.exists(ckpt)


def test_stepwise_resume_rejects_mismatched_config(tmp_path):
    import os

    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    cfg = NUTSConfig(num_warmup=6, num_samples=4, max_depth=4)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(6), 2)
    ckpt = str(tmp_path / 'r.ckpt.npz')

    class Stop(Exception):
        pass

    def interrupter(phase, i, total):
        if (phase, i) == ('warmup', 4):
            raise Stop

    with pytest.raises(Stop):
        nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg,
                             progress=interrupter, checkpoint_path=ckpt,
                             checkpoint_every=2)
    assert os.path.exists(ckpt)
    with pytest.raises(ValueError, match='does not match'):
        nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys,
                             cfg._replace(max_depth=5),
                             checkpoint_path=ckpt, checkpoint_every=2,
                             resume=True)


def test_stepwise_mesh_sharded_chains():
    """NUTS chains shard over a device mesh exactly like
    parallel/chains.run_chains (shard_map over the chain axis, lax.map
    within a device).  Leapfrog trajectories are chaotic, so sharded and
    unsharded runs are not bitwise comparable — assert the sharded run is
    deterministic, healthy, and statistically correct on the analytic
    target."""
    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise
    from parasitoids_tpu.parallel.chains import chain_mesh

    n_dev = min(4, len(jax.devices()))
    if n_dev < 2:
        pytest.skip('needs >= 2 devices (virtual CPU mesh)')
    cfg = NUTSConfig(num_warmup=100, num_samples=200, max_depth=6,
                     init_step_size=0.5)
    z0s = jnp.zeros((n_dev, 2))
    keys = random.split(random.PRNGKey(9), n_dev)
    mesh = chain_mesh(n_devices=n_dev)

    out = nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg,
                               mesh=mesh)
    s_arr = np.asarray(out['samples'])
    assert s_arr.shape == (n_dev, 200, 2)
    assert np.isfinite(s_arr).all()
    assert int(out['n_divergent']) == 0
    flat = s_arr.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [1.0, -2.0], atol=0.4)
    np.testing.assert_allclose(flat.std(axis=0), [1.0, 3.0], rtol=0.3)

    # determinism: the sharded path reproduces itself bitwise
    out2 = nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg,
                                mesh=mesh)
    np.testing.assert_array_equal(out2['samples'], s_arr)


# ---------------------------------------------------------------------------
# Gibbs-within-NUTS (discrete n_periods)
# ---------------------------------------------------------------------------

def _gibbs_target(z, n, rate=5.0, slope=0.0):
    """z0 ~ N(slope*n, 1), z1 ~ N(0, 1), n ~ Poisson(rate) on n >= 1."""
    from jax.scipy.special import gammaln
    return (-0.5 * (z[0] - slope * n) ** 2 - 0.5 * z[1] ** 2
            + n * jnp.log(rate) - rate - gammaln(n + 1.0))


def test_gibbs_nuts_discrete_marginal():
    """With z independent of n, the discrete coordinate's marginal must be
    the (n>=1)-truncated Poisson(5) prior; the continuous block stays a
    unit Gaussian."""
    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    N = _n(600, 200)
    cfg = NUTSConfig(num_warmup=50, num_samples=N, max_depth=5, n_step=2)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(0), 2)
    out = nuts_sample_stepwise(None, z0s, keys, cfg,
                               gibbs_n=_gibbs_target, n0=5.0)
    ns = np.asarray(out['n_periods'])
    assert ns.shape == (2, N)
    assert (ns >= 1.0).all()
    assert np.allclose(ns, np.round(ns))     # stays on the integer lattice
    # truncated Poisson(5): mean 5.034, var 4.86 (1,200 correlated draws;
    # FAST runs a shorter window with proportionally looser bounds)
    assert abs(ns.mean() - 5.03) < _n(0.6, 1.1)
    assert (3.3 if not FAST else 2.2) < ns.var() < _n(7.0, 9.0)
    assert 0.1 < float(out['n_accept_rate']) < 1.0
    zs = np.asarray(out['samples'])
    assert abs(zs.mean()) < 0.15 and abs(zs.var() - 1.0) < 0.25


def test_gibbs_nuts_coupled_moments():
    """With z0 | n ~ N(0.2 n, 1) the two kernels must agree on the joint:
    E[z0] = 0.2 E[n] while n's marginal stays the truncated Poisson."""
    from functools import partial

    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    target = partial(_gibbs_target, slope=0.2)
    cfg = NUTSConfig(num_warmup=60, num_samples=_n(600, 200),
                     max_depth=5, n_step=2)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(1), 2)
    out = nuts_sample_stepwise(None, z0s, keys, cfg,
                               gibbs_n=target, n0=5.0)
    ns = np.asarray(out['n_periods'])
    zs = np.asarray(out['samples'])
    assert abs(ns.mean() - 5.03) < _n(0.6, 1.1)
    assert abs(zs[..., 0].mean() - 0.2 * ns.mean()) < _n(0.25, 0.45)
    assert abs(zs[..., 1].mean()) < _n(0.2, 0.4)


def test_gibbs_nuts_checkpoint_resume_exact(tmp_path):
    """Gibbs runs checkpoint/resume bitwise like plain NUTS runs, n state
    included; and a plain-NUTS checkpoint cannot resume as a Gibbs run."""
    import os

    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    cfg = NUTSConfig(num_warmup=8, num_samples=10, max_depth=4)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(5), 2)
    ckpt = str(tmp_path / 'g.ckpt.npz')

    ref = nuts_sample_stepwise(None, z0s, keys, cfg,
                               gibbs_n=_gibbs_target, n0=5.0)

    class Stop(Exception):
        pass

    def interrupter(phase, i, total):
        if (phase, i) == ('sample', 4):
            raise Stop

    with pytest.raises(Stop):
        nuts_sample_stepwise(None, z0s, keys, cfg, progress=interrupter,
                             checkpoint_path=ckpt, checkpoint_every=2,
                             gibbs_n=_gibbs_target, n0=5.0)
    assert os.path.exists(ckpt)
    out = nuts_sample_stepwise(None, z0s, keys, cfg, checkpoint_path=ckpt,
                               checkpoint_every=2, resume=True,
                               gibbs_n=_gibbs_target, n0=5.0)
    np.testing.assert_array_equal(out['samples'], ref['samples'])
    np.testing.assert_array_equal(out['n_periods'], ref['n_periods'])
    np.testing.assert_array_equal(out['logp'], ref['logp'])
    assert not os.path.exists(ckpt)

    # cross-kind resume is rejected by the signature (gibbs flag differs)
    with pytest.raises(Stop):
        nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfg,
                             progress=interrupter, checkpoint_path=ckpt,
                             checkpoint_every=2)
    with pytest.raises(ValueError, match='does not match'):
        nuts_sample_stepwise(None, z0s, keys, cfg, checkpoint_path=ckpt,
                             checkpoint_every=2, resume=True,
                             gibbs_n=_gibbs_target, n0=5.0)


@pytest.mark.slow
def test_gibbs_nuts_on_parasitoid_model():
    """free_n target: exact agreement with the fixed-n logpdf at n=30,
    finite gradients at neighboring n, and a short Gibbs run executes."""
    from parasitoids_tpu.bayes.nuts import (make_transformed_logpdf,
                                            nuts_sample_stepwise)

    setup = _tiny_setup()
    logpdf, constrain, z0 = make_transformed_logpdf(setup)
    logpdf_n, constrain_n, z0_n = make_transformed_logpdf(setup,
                                                          free_n=True)
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z0_n))
    lp_fixed = float(logpdf(z0))
    lp_free = float(logpdf_n(z0, jnp.float32(30.0)))
    np.testing.assert_allclose(lp_free, lp_fixed, rtol=1e-6)
    # constrain threads the traced n into model slot 13
    m_vec, _, _ = constrain_n(z0, jnp.float32(29.0))
    assert float(m_vec[13]) == 29.0
    for n in (29.0, 31.0):
        lp, g = jax.value_and_grad(logpdf_n)(z0, jnp.float32(n))
        assert np.isfinite(float(lp))
        assert np.isfinite(np.asarray(g)).all()

    cfg = NUTSConfig(num_warmup=2, num_samples=3, max_depth=2,
                     init_step_size=0.01, n_step=2)
    keys = random.split(random.PRNGKey(0), 1)
    out = nuts_sample_stepwise(None, z0[None], keys, cfg,
                               gibbs_n=logpdf_n, n0=30.0)
    assert np.isfinite(np.asarray(out['logp'])).all()
    ns = np.asarray(out['n_periods'])
    assert ns.shape == (1, 3) and (ns >= 1.0).all()


def test_gibbs_nuts_n_step_in_signature(tmp_path):
    """Changing the Gibbs n_periods proposal width across a resume is a
    different transition kernel — the checkpoint signature must reject it.
    Plain (non-gibbs) runs canonicalize n_step away, so it never forces a
    mismatch (or a recompile) there."""
    import os

    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    cfg3 = NUTSConfig(num_warmup=4, num_samples=6, max_depth=3, n_step=3)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(7), 2)
    ckpt = str(tmp_path / 'ns.ckpt.npz')

    class Stop(Exception):
        pass

    def interrupter(phase, i, total):
        if (phase, i) == ('sample', 2):
            raise Stop

    with pytest.raises(Stop):
        nuts_sample_stepwise(None, z0s, keys, cfg3, progress=interrupter,
                             checkpoint_path=ckpt, checkpoint_every=1,
                             gibbs_n=_gibbs_target, n0=5.0)
    with pytest.raises(ValueError, match='does not match'):
        nuts_sample_stepwise(None, z0s, keys, cfg3._replace(n_step=1),
                             checkpoint_path=ckpt, checkpoint_every=1,
                             resume=True, gibbs_n=_gibbs_target, n0=5.0)
    # same n_step resumes fine
    out = nuts_sample_stepwise(None, z0s, keys, cfg3, checkpoint_path=ckpt,
                               checkpoint_every=1, resume=True,
                               gibbs_n=_gibbs_target, n0=5.0)
    assert out['n_periods'].shape == (2, 6)
    assert not os.path.exists(ckpt)

    # a plain run's signature records the canonical n_step=1, so a stale
    # --n-step on the command line cannot poison non-gibbs resumes
    cfgp = NUTSConfig(num_warmup=4, num_samples=6, max_depth=3, n_step=5)
    with pytest.raises(Stop):
        nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys, cfgp,
                             progress=interrupter, checkpoint_path=ckpt,
                             checkpoint_every=1)
    out = nuts_sample_stepwise(_corr_gauss_logpdf, z0s, keys,
                               cfgp._replace(n_step=1),
                               checkpoint_path=ckpt, checkpoint_every=1,
                               resume=True)
    assert out['samples'].shape == (2, 6, 2)


@pytest.mark.slow
def test_nuts_traced_obs_matches_baked_and_shares_compile():
    """``nuts_sample(logpdf, ..., logpdf_args=(obs,))`` with a
    ``make_transformed_logpdf(traced_obs=True)`` target must (a) reuse ONE
    compiled program across datasets — what makes NUTS SBC replicates
    tractable — and (b) match the ``with_observations(y)`` baked-constant
    path numerically."""
    from parasitoids_tpu.bayes.nuts import make_transformed_logpdf
    from parasitoids_tpu.bayes.predictive import simulate_observations
    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)

    setup = _tiny_setup()
    m0 = np.asarray(initial_model_params())
    o0 = np.asarray(initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2))
    datasets = [simulate_observations(setup, m0, o0,
                                      np.random.default_rng(i))
                for i in range(2)]
    cfg = NUTSConfig(num_warmup=2, num_samples=3, max_depth=2,
                     init_step_size=0.01)
    logpdf, _, z0 = make_transformed_logpdf(setup, traced_obs=True)

    outs, sizes = [], []
    for y in datasets:
        obs = setup.obs_pytree(y)
        out = jax.block_until_ready(nuts_sample(
            logpdf, z0, random.PRNGKey(3), cfg, logpdf_args=(obs,)))
        outs.append(np.asarray(out['samples']))
        if hasattr(nuts_sample, '_cache_size'):
            sizes.append(nuts_sample._cache_size())
    if sizes:
        assert sizes[0] == sizes[-1], 'second dataset retraced nuts_sample'
    # different datasets must actually give different posteriors
    assert not np.allclose(outs[0], outs[1])

    baked = setup.with_observations(datasets[0])
    logpdf_b, _, _ = make_transformed_logpdf(baked)
    out_b = jax.block_until_ready(nuts_sample(
        logpdf_b, z0, random.PRNGKey(3), cfg))
    np.testing.assert_allclose(outs[0], np.asarray(out_b['samples']),
                               rtol=2e-4, atol=2e-4)


def _shifted_gauss_logpdf(z, mu):
    """Traced-args analytic target: standard normal shifted by ``mu``."""
    x = z - mu
    return -0.5 * jnp.sum(x * x)


def test_stepwise_logpdf_args_traced_operand():
    """``nuts_sample_stepwise(..., logpdf_args=(mu,))`` must equal the
    closure that bakes the same ``mu`` in, and varying ``mu`` across calls
    must reuse the per-transition compiled programs (the full-scale NUTS
    SBC path)."""
    from functools import partial

    from parasitoids_tpu.bayes import nuts as N
    from parasitoids_tpu.bayes.nuts import nuts_sample_stepwise

    cfg = NUTSConfig(num_warmup=5, num_samples=8, max_depth=3)
    z0s = jnp.zeros((2, 2))
    keys = random.split(random.PRNGKey(11), 2)
    mus = [jnp.array([1.5, -0.5]), jnp.array([-3.0, 2.0])]

    outs, sizes = [], []
    for mu in mus:
        out = nuts_sample_stepwise(_shifted_gauss_logpdf, z0s, keys, cfg,
                                   logpdf_args=(mu,))
        outs.append(out)
        if hasattr(N._draw_steps_mapped, '_cache_size'):
            sizes.append(N._draw_steps_mapped._cache_size())
    if sizes:
        assert sizes[0] == sizes[-1], 'second mu retraced the draw step'
    assert not np.allclose(outs[0]['samples'], outs[1]['samples'])

    baked = partial(_shifted_gauss_logpdf, mu=mus[0])
    ref = nuts_sample_stepwise(baked, z0s, keys, cfg)
    np.testing.assert_allclose(outs[0]['samples'], ref['samples'],
                               rtol=1e-5, atol=1e-6)

    # draws should center on mu, not the origin
    assert np.allclose(outs[1]['samples'].mean(axis=(0, 1)),
                       np.asarray(mus[1]), atol=2.0)

    with pytest.raises(ValueError):
        nuts_sample_stepwise(None, z0s, keys, cfg, gibbs_n=_gibbs_target,
                             n0=5.0, logpdf_args=(mus[0],))
