"""Observation-model variants (VERDICT r3 item 6): negative-binomial and
zero-inflated-Poisson likelihoods behind ``Params.obs_model``, with the
extra parameter (NB dispersion / ZIP inflation prob) threaded through
priors, transforms, packing, the AM sampler, and predictive sampling.

The round-3 100-draw PPC found the reference's thinned-Poisson model
under-predicting the peak grid count (p = 0.0099) and field zero-inflation
(runs/nuts_r3_ppc100.json); these variants are the candidate repairs,
compared via bayes/loo.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import random

from parasitoids_tpu.bayes.model import (negbin_logpmf, poisson_logpmf,
                                         zip_logpmf)


def test_negbin_logpmf_matches_scipy_and_poisson_limit():
    from scipy import stats
    obs = jnp.asarray([0.0, 1.0, 3.0, 10.0])
    mu = jnp.asarray([0.5, 2.0, 2.0, 7.0])
    r = jnp.asarray(5.0)
    ours = np.asarray(negbin_logpmf(obs, mu, r))
    # scipy nbinom(n, p) has mean n(1-p)/p: p = r/(r+mu)
    p = 5.0 / (5.0 + np.asarray(mu))
    ref = stats.nbinom.logpmf(np.asarray(obs, int), 5.0, p)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # large r approaches Poisson (r = 500 keeps the f32 gammaln
    # cancellation negligible; the Gamma(2, 0.1) prior concentrates r in
    # O(1..100) where f32 is plenty)
    big = np.asarray(negbin_logpmf(obs, mu, jnp.asarray(500.0)))
    poi = np.asarray(poisson_logpmf(obs, mu))
    np.testing.assert_allclose(big, poi, atol=0.35)
    small = np.asarray(negbin_logpmf(obs, mu, r))
    assert np.abs(big - poi).max() < np.abs(small - poi).max()
    # gradient-safe at rate 0 under a positive count (the poisson floor)
    g = jax.grad(lambda m: negbin_logpmf(jnp.asarray(2.0), m, r))(
        jnp.asarray(0.0))
    assert np.isfinite(float(g))


def test_zip_logpmf_matches_manual_and_poisson_limit():
    obs = jnp.asarray([0.0, 0.0, 2.0, 5.0])
    mu = jnp.asarray([0.5, 3.0, 2.0, 4.0])
    pi = 0.3
    ours = np.asarray(zip_logpmf(obs, mu, jnp.asarray(pi)))
    man0 = np.log(pi + (1 - pi) * np.exp(-np.asarray(mu)))
    mank = (np.log(1 - pi)
            + np.asarray(poisson_logpmf(obs, mu)))
    ref = np.where(np.asarray(obs) > 0, mank, man0)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    tiny = np.asarray(zip_logpmf(obs, mu, jnp.asarray(1e-7)))
    poi = np.asarray(poisson_logpmf(obs, mu))
    np.testing.assert_allclose(tiny, poi, atol=1e-5)


def test_sample_counts_moments():
    from parasitoids_tpu.bayes.predictive import _sample_counts
    rng = np.random.default_rng(0)
    rate = np.full(20000, 4.0)
    poi = _sample_counts(rng, rate)
    nb = _sample_counts(rng, rate, 'negbin', od=2.0)
    zp = _sample_counts(rng, rate, 'zip', od=0.4)
    assert abs(poi.mean() - 4.0) < 0.1
    assert abs(nb.mean() - 4.0) < 0.15
    # NB variance mu + mu^2/r = 4 + 8 = 12
    assert 10.0 < nb.var() < 14.5
    assert (zp == 0).mean() > (poi == 0).mean() + 0.3
    assert abs(zp.mean() - 0.6 * 4.0) < 0.15


def _variant_setup(obs_model):
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
    p.chg_param('obs_model', obs_model)
    return BayesSetup(p)


@pytest.mark.parametrize('obs_model', ['negbin', 'zip'])
def test_variant_packing_and_posterior(obs_model):
    """The extra slot flows through priors -> transforms -> z packing ->
    posterior: dims grow by one, the target is finite and differentiable,
    and the extra parameter has nonzero gradient (it is live)."""
    from parasitoids_tpu.bayes.nuts import make_transformed_logpdf
    from parasitoids_tpu.bayes.priors import obs_extra_names

    setup = _variant_setup(obs_model)
    assert setup.n_extra_obs == 1
    assert obs_extra_names(obs_model)[0] in ('nb_r', 'zip_pi')
    logpdf, constrain, z0 = make_transformed_logpdf(setup)
    assert z0.shape[0] == 15 + 4 + setup.n_sent + 1
    lp, g = jax.value_and_grad(logpdf)(z0)
    assert np.isfinite(float(lp))
    assert np.isfinite(np.asarray(g)).all()
    assert abs(float(g[15 + 4 + setup.n_sent])) > 0   # od slot is live
    m_vec, o_vec, _ = constrain(z0)
    assert o_vec.shape[0] == 4 + setup.n_sent + 1
    assert float(o_vec[-1]) > 0


def test_variant_am_sampler_moves_od():
    """The AM obs sweep covers the extra slot: a few steps at tiny config
    leave the od coordinate finite, inside prior support, and accepted
    moves exist somewhere in the block."""
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)

    setup = _variant_setup('negbin')
    state = init_chain_state(setup, random.PRNGKey(0))
    assert state.o.shape[0] == 4 + setup.n_sent + 1
    assert np.isfinite(float(state.prior_o))
    state2, trace = jax.block_until_ready(
        run_mcmc(setup, state, MCMCConfig(n_samples=6, obs_sweeps=2)))
    assert np.isfinite(np.asarray(trace)).all()
    od = float(state2.o[4 + setup.n_sent])
    assert np.isfinite(od) and od > 0
    # trace rows carry the extra column: 15 model + obs + logpost
    assert trace.shape[1] == 15 + 4 + setup.n_sent + 1 + 1


def test_variant_pointwise_matches_loglik():
    """pointwise_loglik().sum() == log_likelihood() under a variant (the
    WAIC/LOO identity bayes/loo.py relies on for model comparison)."""
    from parasitoids_tpu.bayes.sampler import _as_model, _as_obs
    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)

    setup = _variant_setup('zip')
    m0 = initial_model_params()
    o0 = initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2, 'zip')
    m = _as_model(jnp.asarray(m0, jnp.float32))
    o = _as_obs(jnp.asarray(o0, jnp.float32), setup.n_sent)
    assert float(o.od) == pytest.approx(0.1)
    proj = setup.forward_projections(m)
    total = float(setup.log_likelihood(proj, o))
    pw = np.asarray(setup.pointwise_loglik(proj, o))
    assert np.isfinite(total)
    np.testing.assert_allclose(pw.sum(), total, rtol=1e-5)


@pytest.mark.slow
def test_negbin_dispersion_moves_toward_overdispersed_truth():
    """Statistical smoke: on data simulated with heavy overdispersion
    (r* = 2), the negbin fit's dispersion posterior must move DOWN from
    its prior-mean start (20) toward the overdispersed regime, and the
    chain must remain healthy.  (Full recovery needs long chains; this
    pins the direction of information flow through the new likelihood.)"""
    from tests._fastslow import n as _n

    from parasitoids_tpu.bayes.predictive import simulate_observations
    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)

    setup = _variant_setup('negbin')
    m_true = initial_model_params()
    o_true = initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2, 'negbin')
    # boost observation probabilities so the tiny config yields counts
    o_true[1] = 0.3
    o_true[2] = 0.02
    o_true[4:4 + setup.n_sent] = np.minimum(
        o_true[4:4 + setup.n_sent] * 20.0, 0.5)
    o_true[-1] = 2.0          # heavy overdispersion in the generator
    rng = np.random.default_rng(7)
    y = simulate_observations(setup, m_true, o_true, rng)
    setup2 = setup.with_observations(y)

    # start the SAMPLER at the prior-ish dispersion, not the truth
    o_start = np.asarray(o_true).copy()
    o_start[-1] = 20.0
    state = init_chain_state(setup2, random.PRNGKey(0), m0=m_true,
                             o0=o_start)
    od_idx = 4 + setup.n_sent + 15   # trace column of the od slot
    _, trace = jax.block_until_ready(
        run_mcmc(setup2, state,
                 MCMCConfig(n_samples=_n(400, 120), obs_sweeps=4)))
    tr = np.asarray(trace)
    od = tr[:, od_idx]
    assert np.isfinite(tr).all()
    assert (od > 0).all()
    # information flows the right way: the posterior mass moves below the
    # start toward the overdispersed truth
    tail = od[len(od) // 2:]
    assert np.median(tail) < 15.0, np.median(tail)
