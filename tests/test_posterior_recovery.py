"""Statistical validation of the full Bayes stack on synthetic data.

Generate observations from the model at known parameters, then check that
(a) gradient-based MAP moves a perturbed start back toward the truth, and
(b) the adaptive-Metropolis chain climbs to the truth's posterior level.
This is an end-to-end test of forward model + observation projections +
likelihood + samplers that the reference has no analogue of (its tests
stop at shape/parity checks).  Runs on a tiny config; marked slow.
"""

import numpy as np
import pytest

from tests._fastslow import FAST, n as _n
import jax
import jax.numpy as jnp
from jax import random

from parasitoids_tpu.config import Params
from parasitoids_tpu.bayes.model import BayesSetup
from parasitoids_tpu.bayes.priors import (ObsParams, initial_model_params,
                                          initial_obs_params)
from parasitoids_tpu.bayes.sampler import _as_model, _as_obs

pytestmark = pytest.mark.slow


def _synthetic_setup(seed=0):
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
    setup = BayesSetup(p)

    m_true = jnp.asarray(initial_model_params(), jnp.float32)
    o_np = initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2)
    # boost observation probabilities so the tiny config yields real counts
    o_np[1] = 0.3            # em_obs_prob
    o_np[2] = 0.02           # grid_obs_prob
    o_np[4:] = np.minimum(o_np[4:] * 20.0, 0.5)
    o_true = jnp.asarray(o_np, jnp.float32)

    m = _as_model(m_true)
    o = _as_obs(o_true, setup.n_sent)
    rel, sent, grid = setup.forward_projections(m)

    rng = np.random.default_rng(seed)

    def pois(rate):
        return jnp.asarray(rng.poisson(np.maximum(np.asarray(rate), 0.0)),
                           jnp.float32)

    setup.obs_release = [
        pois(o.xi * mdl * (eff * o.em_obs_prob)[:, None])
        for mdl, eff in zip(rel, setup.release_effort)]
    setup.obs_sentinel = [
        pois(o.xi * mdl * o.sent_obs_probs[:, None]) for mdl in sent]
    setup.obs_grid = pois(o.grid_obs_prob * setup.grid_samples * grid)

    total = (sum(float(x.sum()) for x in setup.obs_release)
             + sum(float(x.sum()) for x in setup.obs_sentinel)
             + float(setup.obs_grid.sum()))
    assert total > 20, 'synthetic data too sparse to test recovery'
    return setup, m_true, o_true


@pytest.fixture(scope='module')
def synth():
    return _synthetic_setup()


def test_map_moves_toward_truth(synth):
    from parasitoids_tpu.bayes.map_fit import map_fit
    setup, m_true, o_true = synth

    m0 = np.asarray(m_true, np.float64).copy()
    m0[6] *= 1.6      # sig_x off by 60%
    m0[14] *= 0.6     # mu_r off by 40%
    fit = map_fit(setup, n_steps=_n(250, 50), use_sprd=False, m0=m0,
                  o0=np.asarray(o_true))

    losses = fit['losses']
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 1.0, 'optimization did not descend'

    if FAST:
        return             # statistical closeness needs the full 250 steps
    sig_x_hat, mu_r_hat = fit['model'][6], fit['model'][14]
    sig_x_true, mu_r_true = float(m_true[6]), float(m_true[14])
    # strictly closer to truth than the perturbed start
    assert abs(sig_x_hat - sig_x_true) < abs(m0[6] - sig_x_true)
    assert abs(mu_r_hat - mu_r_true) < abs(m0[14] - mu_r_true)


def test_am_chain_climbs_to_truth_level(synth):
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)
    setup, m_true, o_true = synth

    lp_true = float(setup.log_posterior(_as_model(m_true),
                                        _as_obs(o_true, setup.n_sent)))
    assert np.isfinite(lp_true)

    m0 = np.asarray(m_true, np.float64).copy()
    m0[6] *= 1.5
    m0[7] *= 0.7
    state = init_chain_state(setup, random.PRNGKey(1), m0=m0,
                             o0=np.asarray(o_true))
    lp0 = float(state.loglik + state.prior_m + state.prior_o)
    state, traces = run_mcmc(setup, state,
                             MCMCConfig(n_samples=_n(400, 60)))
    lp_trace = np.asarray(traces[:, -1])

    assert np.isfinite(lp_trace).all()
    # the chain improves on its perturbed start and reaches the truth's
    # posterior neighborhood (within a generous slack for a short chain)
    assert lp_trace.max() > lp0
    if not FAST:           # reaching the truth level needs the full chain
        assert lp_trace.max() > lp_true - 25.0, (lp_trace.max(), lp_true)


def test_nuts_climbs_and_mixes(synth):
    """Gradient-based sampling on the same synthetic posterior: NUTS must
    reach at least the truth's posterior level and keep a healthy
    acceptance statistic (no analogue exists in the reference — PyMC 2.x
    cannot differentiate its Fortran-backed model)."""
    from parasitoids_tpu.bayes.map_fit import _make_objective
    from parasitoids_tpu.bayes.nuts import (NUTSConfig, nuts_sample,
                                            make_transformed_logpdf)
    setup, m_true, o_true = synth
    logpdf, constrain, _ = make_transformed_logpdf(setup)

    lp_true = float(setup.log_posterior(_as_model(m_true),
                                        _as_obs(o_true, setup.n_sent)))

    # start at the truth: the test checks NUTS *stays* in and explores the
    # typical set (a short chain from a prior start cannot be expected to
    # reach it; that transit is covered by the MAP test above)
    _, _, unconstrain = _make_objective(setup, use_sprd=False)
    z0 = unconstrain(m_true, o_true, jnp.float32(0.3))

    out = nuts_sample(logpdf, z0, random.PRNGKey(3),
                      NUTSConfig(num_warmup=_n(60, 10),
                                 num_samples=_n(60, 10), max_depth=5))
    logp = np.asarray(out['logp'])
    assert np.isfinite(logp).all()
    if not FAST:
        assert float(out['accept_rate']) > 0.4
    # the sampler must move (not be stuck at z0)...
    zs = np.asarray(out['samples'])
    assert np.abs(zs - zs[0]).max() > 1e-3
    # ...while staying in the truth's posterior neighborhood
    best = zs[int(logp.argmax())]
    m_vec, o_vec, _ = constrain(jnp.asarray(best))
    lp_best = float(setup.log_posterior(_as_model(m_vec),
                                        _as_obs(o_vec, setup.n_sent)))
    if not FAST:
        assert lp_best > lp_true - 30.0, (lp_best, lp_true)


def test_posterior_predictive(synth, tmp_path):
    """Predictive machinery on a short real trace: shapes, nonnegativity,
    artifact written."""
    from parasitoids_tpu.bayes.predictive import (posterior_predictive,
                                                  plot_predictive)
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)
    setup, m_true, o_true = synth
    state = init_chain_state(setup, random.PRNGKey(5),
                             o0=np.asarray(o_true))
    _, traces = run_mcmc(setup, state, MCMCConfig(n_samples=30))

    pred = posterior_predictive(setup, np.asarray(traces), n_draws=5)
    assert pred['grid'].shape[0] == 5
    assert pred['grid'].shape[1:] == np.asarray(setup.obs_grid).shape
    assert (pred['grid'] >= 0).all()
    assert len(pred['release']) == 5 and len(pred['sentinel']) == 5

    out = plot_predictive(setup, pred, str(tmp_path / 'pred.png'))
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0
