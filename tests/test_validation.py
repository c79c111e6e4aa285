"""Model-validation subsystem tests: synthetic-data generation,
prior-predictive, replicate construction (with_observations),
identifiability analysis, and simulation-based calibration.

These are beyond-reference capabilities (PARITY.md) built on the exact
prior samplers; the SBC harness closes the loop by testing the sampler
against its own generative model.
"""

import os

import numpy as np
import pytest
from jax import random

from parasitoids_tpu.config import Params


def _tiny_setup():
    from parasitoids_tpu.bayes.model import BayesSetup
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


@pytest.fixture(scope='module')
def setup():
    return _tiny_setup()


def test_simulate_observations(setup):
    from parasitoids_tpu.bayes.predictive import simulate_observations
    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)

    m0 = initial_model_params()
    o0 = initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2)
    y = simulate_observations(setup, m0, o0, np.random.default_rng(0))
    assert len(y['release']) == len(setup.obs_release)
    assert len(y['sentinel']) == len(setup.obs_sentinel)
    for a, b in zip(y['release'], setup.obs_release):
        assert a.shape == np.asarray(b).shape
    for a, b in zip(y['sentinel'], setup.obs_sentinel):
        assert a.shape == np.asarray(b).shape
    assert y['grid'].shape == np.asarray(setup.obs_grid).shape
    # Poisson draws: nonnegative integers
    for a in y['release'] + y['sentinel'] + [y['grid']]:
        assert (a >= 0).all()
        np.testing.assert_array_equal(a, np.round(a))
    # deterministic given the rng state
    y2 = simulate_observations(setup, m0, o0, np.random.default_rng(0))
    np.testing.assert_array_equal(y['grid'], y2['grid'])


def test_with_observations(setup):
    from parasitoids_tpu.bayes.predictive import simulate_observations
    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)
    from parasitoids_tpu.bayes.sampler import init_chain_state

    m0 = initial_model_params()
    o0 = initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2)
    y = simulate_observations(setup, m0, o0, np.random.default_rng(1))
    s2 = setup.with_observations(y)
    # shares the expensive precomputation, swaps only the data
    assert s2.setup is setup.setup
    assert s2.obs_ops is setup.obs_ops
    # likelihood at the same point differs under different data ...
    a = init_chain_state(setup, random.PRNGKey(0))
    b = init_chain_state(s2, random.PRNGKey(0))
    assert float(a.loglik) != float(b.loglik)
    # ... and the original setup is untouched
    a2 = init_chain_state(setup, random.PRNGKey(0))
    assert float(a.loglik) == float(a2.loglik)
    # shape validation
    bad = {k: ([np.zeros((2, 2))] if k != 'grid' else np.zeros((2, 2)))
           for k in ('release', 'sentinel', 'grid')}
    with pytest.raises(ValueError):
        setup.with_observations(bad)


@pytest.mark.slow
def test_prior_predictive(setup):
    from parasitoids_tpu.bayes.predictive import (plot_predictive,
                                                  prior_predictive)

    pred = prior_predictive(setup, n_draws=3, seed=0)
    assert pred['grid'].shape[0] == 3
    assert pred['grid'].shape[1:] == np.asarray(setup.obs_grid).shape
    assert np.isfinite(pred['grid_rate']).all()
    assert (pred['grid'] >= 0).all()
    assert len(pred['release']) == 3 and len(pred['sentinel']) == 3
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        out = plot_predictive(setup, pred, d + '/pp.png', label='prior')
        import os
        assert os.path.getsize(out) > 0

    # posterior-predictive p-values over the same draws
    from parasitoids_tpu.bayes.predictive import (predictive_pvalues,
                                                  pvalue_report)
    pv = predictive_pvalues(setup, pred)
    assert set(pv) == ({'grid'}
                       | {'release[{}]'.format(k)
                          for k in range(len(setup.obs_release))}
                       | {'sentinel[{}]'.format(k)
                          for k in range(len(setup.obs_sentinel))})
    for d_ in pv.values():
        for p in d_.values():
            assert 0.0 < p <= 1.0
    txt = pvalue_report(pv)
    assert 'grid' in txt and 'total' in txt and 'extreme' in txt


def test_pvalue_calibration_on_replicated_data():
    """If the observed data IS a draw from the predictive, p-values are
    uniform-ish — and a shifted observation is flagged extreme."""
    from parasitoids_tpu.bayes import predictive as P

    class FakeSetup:
        pass

    rng = np.random.default_rng(0)
    reps = rng.poisson(5.0, size=(400, 6, 4))
    fake = FakeSetup()
    fake.obs_grid = reps[0]
    fake.obs_release = []
    fake.obs_sentinel = []
    pv = P.predictive_pvalues(fake, {'grid': reps[1:], 'release': [],
                                     'sentinel': []})
    assert 0.05 < pv['grid']['total'] < 0.95

    fake.obs_grid = reps[0] + 12          # grossly inflated counts
    pv = P.predictive_pvalues(fake, {'grid': reps[1:], 'release': [],
                                     'sentinel': []})
    assert pv['grid']['total'] < 0.05
    assert pv['grid']['max'] < 0.05


def test_pvalues_skip_empty_channels():
    """Sites can lack whole observation channels (the real-Carnarvon
    record is sentinel-only): empty arrays must be skipped, not reduced
    (np.max of a zero-size array raises)."""
    from parasitoids_tpu.bayes import predictive as P

    class FakeSetup:
        pass

    rng = np.random.default_rng(3)
    fake = FakeSetup()
    fake.obs_grid = np.zeros((0, 0))
    fake.obs_release = [np.zeros(0)]
    fake.obs_sentinel = [rng.poisson(2.0, (3, 4))]
    pred = {'grid': np.zeros((50, 0, 0)),
            'release': [[np.zeros(0)] for _ in range(50)],
            'sentinel': [[rng.poisson(2.0, (3, 4))] for _ in range(50)]}
    pv = P.predictive_pvalues(fake, pred)
    assert set(pv) == {'sentinel[0]'}
    assert all(0.0 < p <= 1.0 for p in pv['sentinel[0]'].values())


@pytest.mark.slow
def test_identifiability_tiny(setup, tmp_path):
    from parasitoids_tpu.bayes.identify import (identifiability,
                                                identify_report)
    from parasitoids_tpu.bayes.map_fit import (laplace_approximation,
                                               map_fit)

    fit = map_fit(setup, n_steps=60, chunk_steps=30)
    lap = laplace_approximation(setup, fit)
    info = identifiability(setup, fit, lap, n_prior=500)
    n = len(info['names'])
    assert info['map'].shape == (n,)
    assert info['post_sd'].shape == (n,)
    assert info['prior_sd'].shape == (n,) and (info['prior_sd'] > 0).all()
    # fixed n_periods slot excluded from contraction and spectrum
    assert np.isnan(info['contraction'][13])
    assert not info['valid'][13]
    # wherever the curvature is positive the numbers are finite; where it
    # is not (short fits can sit near saddles) they are flagged nan
    valid = np.flatnonzero(info['valid'])
    assert valid.size > 0
    assert np.isfinite(info['post_sd'][valid]).all()
    assert np.isfinite(info['contraction'][valid]).all()
    assert np.isnan(info['post_sd'][~info['valid']]).all()
    # correlation matrix: unit diagonal and symmetry on valid slots
    corr = info['corr']
    np.testing.assert_allclose(np.diag(corr)[valid], 1.0, atol=1e-6)
    np.testing.assert_allclose(corr[np.ix_(valid, valid)],
                               corr[np.ix_(valid, valid)].T, atol=1e-12)
    # spectrum ascending, matching the z-name count
    assert (np.diff(info['eig_sd']) >= -1e-12).all()
    assert info['eig_vec'].shape[0] == len(info['z_names'])
    out = str(tmp_path / 'ident.txt')
    text = identify_report(info, out=out)
    assert 'contraction' in text and 'posterior spectrum' in text
    assert (tmp_path / 'ident.txt').exists()


def test_plot_identifiability_synthetic(tmp_path):
    """The figure writer works from a bare info dict (no MAP fit needed),
    including the nan-contraction and non-PSD annotation paths."""
    from parasitoids_tpu.bayes.identify import plot_identifiability

    n = 6
    info = {
        'eig_sd': np.array([1e-3, 1e-2, 0.0, 0.5, 1.0]),
        'contraction': np.array([0.9, 0.5, np.nan, 0.1, np.nan, 0.0]),
        'names': ['p{}'.format(i) for i in range(n)],
        'fixed': np.array([False, False, False, False, True, False]),
        'n_nonpsd': 1,
    }
    out = str(tmp_path / 'ident.png')
    assert plot_identifiability(info, out) == out
    assert (tmp_path / 'ident.png').stat().st_size > 0


@pytest.mark.slow
def test_sbc_mechanics(setup, tmp_path):
    from parasitoids_tpu.bayes.sbc import plot_sbc, run_sbc, sbc_uniformity

    out = run_sbc(setup, 2, random.PRNGKey(0), n_samples=20, burn=10,
                  thin=2, seed=3)
    dim = 15 + 4 + setup.n_sent
    assert out['ranks'].shape == (2, dim)
    assert out['L'] == 10
    assert (out['ranks'] >= 0).all() and (out['ranks'] <= out['L']).all()
    assert out['truths'].shape == (2, dim)
    # determinism
    out2 = run_sbc(setup, 2, random.PRNGKey(0), n_samples=20, burn=10,
                   thin=2, seed=3)
    np.testing.assert_array_equal(out['ranks'], out2['ranks'])
    p = plot_sbc(out, str(tmp_path / 'sbc.png'))
    import os
    assert os.path.getsize(p) > 0

    # pooled-chain replicates: L multiplies, ranks stay bounded, and the
    # first chain's draws are the chains=1 draws (same fold_in key path)
    out3 = run_sbc(setup, 2, random.PRNGKey(0), n_samples=20, burn=10,
                   thin=2, seed=3, chains=3)
    assert out3['L'] == 30
    assert (out3['ranks'] >= 0).all() and (out3['ranks'] <= 30).all()


@pytest.mark.slow
def test_sbc_checkpoint_resume_exact(setup, tmp_path):
    """A killed-and-resumed SBC arm must be bit-identical to an
    uninterrupted one (replicate RNG depends only on the index)."""
    from parasitoids_tpu.bayes.sbc import run_sbc

    kw = dict(n_samples=20, burn=10, thin=5, seed=3, sampler='am')
    full = run_sbc(setup, 3, random.PRNGKey(0), **kw)
    ck = str(tmp_path / 'sbc.ckpt.npz')
    run_sbc(setup, 2, random.PRNGKey(0), checkpoint_path=ck, **kw)
    resumed = run_sbc(setup, 3, random.PRNGKey(0), checkpoint_path=ck, **kw)
    assert resumed['resumed_at'] == 2
    np.testing.assert_array_equal(full['ranks'], resumed['ranks'])
    np.testing.assert_allclose(full['truths'], resumed['truths'])

    # the transient ckpt is gitignored and dies with the VM; its durable
    # twin (committed) must carry the same resume state when the ckpt
    # itself is gone
    ck2 = str(tmp_path / 'vm.ckpt.npz')
    run_sbc(setup, 2, random.PRNGKey(0), checkpoint_path=ck2, **kw)
    os.remove(ck2)                        # the VM recycle
    assert os.path.exists(str(tmp_path / 'vm_partial.npz'))
    resumed2 = run_sbc(setup, 3, random.PRNGKey(0), checkpoint_path=ck2,
                       **kw)
    assert resumed2['resumed_at'] == 2
    np.testing.assert_array_equal(full['ranks'], resumed2['ranks'])

    # a checkpoint from a different config must be ignored, not merged
    fresh = run_sbc(setup, 3, random.PRNGKey(0), n_samples=40, burn=10,
                    thin=5, seed=3, sampler='am', checkpoint_path=ck)
    assert fresh['resumed_at'] == 0


@pytest.mark.slow
def test_sbc_nuts_warm_start_mechanics(setup, tmp_path):
    """warm_start SBC: per-replicate Hessian metric runs end to end,
    deterministically, and its checkpoint is not interchangeable with a
    non-warm-start arm's."""
    from parasitoids_tpu.bayes.sbc import run_sbc

    kw = dict(n_samples=8, burn=4, thin=2, seed=3, sampler='nuts',
              max_depth=4, stepwise=True, steps_per_call=5,
              warm_start=True)
    out = run_sbc(setup, 1, random.PRNGKey(0), **kw)
    dim = 15 + 4 + setup.n_sent
    assert out['ranks'].shape == (1, dim)
    assert (out['ranks'] >= 0).all() and (out['ranks'] <= out['L']).all()
    out2 = run_sbc(setup, 1, random.PRNGKey(0), **kw)
    np.testing.assert_array_equal(out['ranks'], out2['ranks'])

    # a warm-start checkpoint must not resume a non-warm-start arm
    ck = str(tmp_path / 'sbc_nuts.ckpt.npz')
    run_sbc(setup, 1, random.PRNGKey(0), checkpoint_path=ck, **kw)
    cold = run_sbc(setup, 1, random.PRNGKey(0), checkpoint_path=ck,
                   **{**kw, 'warm_start': False})
    assert cold['resumed_at'] == 0


def test_sbc_ecdf_pvals_calibrated():
    """The randomized-PIT KS check is exact under H0 (uniform ranks) and
    flags a grossly skewed rank distribution."""
    from parasitoids_tpu.bayes.sbc import sbc_ecdf_pvals

    rng = np.random.default_rng(0)
    L = 80
    uniform = rng.integers(0, L + 1, size=(200, 3))
    skewed = rng.integers(0, L // 3, size=(200, 1))   # crushed low
    p_u = sbc_ecdf_pvals(uniform, L, seed=1)
    p_s = sbc_ecdf_pvals(skewed, L, seed=1)
    assert (p_u > 0.01).all()
    assert (p_s < 1e-6).all()


@pytest.mark.slow
def test_sbc_nuts_mechanics(setup):
    """NUTS-mode SBC: truths conditioned on n_periods=30, ranks over the
    constrained draws from the gradient sampler."""
    from parasitoids_tpu.bayes.sbc import run_sbc

    out = run_sbc(setup, 2, random.PRNGKey(1), n_samples=16, burn=8,
                  thin=2, seed=5, sampler='nuts', max_depth=4)
    dim = 15 + 4 + setup.n_sent
    assert out['ranks'].shape == (2, dim)
    assert (out['ranks'] >= 0).all() and (out['ranks'] <= out['L']).all()
    # truths carry the conditioning
    assert (out['truths'][:, 13] == 30.0).all()


def test_sbc_uniformity_statistic():
    from parasitoids_tpu.bayes.sbc import sbc_uniformity
    rng = np.random.default_rng(0)
    L = 20
    # uniform ranks: p-values should not be systematically tiny
    ranks = rng.integers(0, L + 1, size=(400, 6))
    p = sbc_uniformity(ranks, L)
    assert p.shape == (6,)
    assert ((p >= 0) & (p <= 1)).all()
    assert np.median(p) > 0.05
    # grossly miscalibrated (all ranks piled at 0): p ~ 0
    bad = np.zeros((400, 2), int)
    pb = sbc_uniformity(bad, L)
    assert (pb < 1e-6).all()


@pytest.mark.slow
def test_sbc_ridge_arm_mechanics(setup):
    """The ridge-whitened NUTS arm (VERDICT r4 item 3): per-replicate
    blend+whiten at the truth, Welford adaptation on, one shared compiled
    program.  Ranks must be valid and deterministic."""
    from parasitoids_tpu.bayes.sbc import run_sbc

    kw = dict(n_samples=12, burn=6, thin=2, seed=5, sampler='nuts',
              max_depth=3, ridge=True)
    out = run_sbc(setup, 2, random.PRNGKey(1), **kw)
    dim = 15 + 4 + setup.n_sent
    assert out['ranks'].shape == (2, dim)
    assert (out['ranks'] >= 0).all() and (out['ranks'] <= out['L']).all()
    assert np.isfinite(out['truths']).all()
    out2 = run_sbc(setup, 2, random.PRNGKey(1), **kw)
    np.testing.assert_array_equal(out['ranks'], out2['ranks'])
