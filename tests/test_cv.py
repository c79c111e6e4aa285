"""Exact refit cross-validation (bayes/cv.py) and the masked-likelihood
contract (BayesSetup.with_held_out)."""

import numpy as np
import pytest
import jax.numpy as jnp

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


@pytest.fixture(scope='module')
def point():
    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)
    from parasitoids_tpu.bayes.sampler import _as_model, _as_obs
    s = _tiny_setup()
    m = _as_model(jnp.asarray(initial_model_params(), jnp.float32))
    o0 = initial_obs_params(
        [s.locinfo.field_sizes[k] for k in s.locinfo.sent_ids],
        s.cell_res ** 2)
    o = _as_obs(jnp.asarray(o0, jnp.float32), s.n_sent)
    return m, o


def test_masked_likelihood_matches_pointwise_subset(setup, point):
    from parasitoids_tpu.bayes.loo import point_groups

    m, o = point
    proj = setup.forward_projections(m)
    pll = np.asarray(setup.pointwise_loglik(proj, o), np.float64)

    gids, labels = point_groups(setup, by='block')
    keep = gids != gids[-1]                     # hold out the grid block
    held = setup.with_held_out(keep)
    lp_masked = float(held.log_likelihood(proj, o))
    np.testing.assert_allclose(lp_masked, pll[keep].sum(), rtol=2e-6)

    # keep-everything mask is the identity
    all_kept = setup.with_held_out(np.ones_like(keep))
    np.testing.assert_allclose(float(all_kept.log_likelihood(proj, o)),
                               float(setup.log_likelihood(proj, o)),
                               rtol=2e-6)

    # the held-out copy must not perturb the original (shallow-copy guard)
    assert setup.obs_mask is None

    with pytest.raises(ValueError):
        setup.with_held_out(keep[:-3])


def test_traced_mask_equals_baked_mask(setup, point):
    """log_likelihood(proj, o, mask) — the traced operand every CV fold
    shares one compiled program through — must equal the with_held_out
    baked-constant path."""
    from parasitoids_tpu.bayes.loo import point_groups

    m, o = point
    proj = setup.forward_projections(m)
    gids, _ = point_groups(setup, by='block')
    for g in (0, int(gids.max())):
        keep = gids != g
        mask = setup.split_point_mask(keep)
        lp_traced = float(setup.log_likelihood(proj, o, mask))
        lp_baked = float(setup.with_held_out(keep).log_likelihood(proj, o))
        np.testing.assert_allclose(lp_traced, lp_baked, rtol=1e-6)


def test_masked_log_posterior_prior_unchanged(setup, point):
    """Masking only removes likelihood terms: the posterior difference
    between full and held-out setups equals the masked pointwise sum."""
    m, o = point
    from parasitoids_tpu.bayes.loo import point_groups
    gids, _ = point_groups(setup, by='block')
    keep = gids != 0
    held = setup.with_held_out(keep)
    proj = setup.forward_projections(m)
    pll = np.asarray(setup.pointwise_loglik(proj, o), np.float64)
    d = float(setup.log_posterior(m, o)) - float(held.log_posterior(m, o))
    np.testing.assert_allclose(d, pll[~keep].sum(), rtol=1e-5, atol=2e-3)


@pytest.mark.slow
def test_exact_logo_cv_runs(setup):
    from parasitoids_tpu.bayes.cv import exact_logo_cv
    from parasitoids_tpu.bayes.smc import SMCConfig

    # two folds through ONE compiled SMC program (traced mask operand)
    from tests._fastslow import FAST
    folds = [0] if FAST else [0, 1]
    res = exact_logo_cv(setup, by='block', folds=folds,
                        smc_config=SMCConfig(n_particles=16, n_moves=2,
                                             max_stages=30),
                        seed=0)
    assert len(res['elpd']) == len(folds)
    assert np.isfinite(res['elpd']).all()
    assert np.isfinite(res['logz']).all()
    assert res['labels'][0].startswith('release')
    assert res['elpd_total'] == pytest.approx(float(np.sum(res['elpd'])))
