"""Integration tests for the adaptive-Metropolis sampler on the real
(tiny-config) posterior, plus store round-trip with exact resume."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
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


@pytest.mark.slow
def test_am_chain_moves_and_adapts(setup):
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)

    state = init_chain_state(setup, random.PRNGKey(0))
    assert np.isfinite(float(state.loglik))
    n = 150
    state, traces = run_mcmc(setup, state, MCMCConfig(n_samples=n))
    traces = np.asarray(traces)
    assert traces.shape[0] == n
    assert np.isfinite(traces).all()
    # the chain must actually move (model-block acceptances > 0)
    acc_m = float(state.accepts_m) / n
    assert 0.0 < acc_m < 0.95, acc_m
    # adaptation statistics accumulated
    assert float(state.count) > 0
    # log-posterior column is the last; it should not collapse to -inf
    assert np.isfinite(traces[:, -1]).all()


@pytest.mark.slow
def test_store_resume_exact(tmp_path, setup):
    """Saving and resuming reproduces the sampler state bit-exactly
    (the PyMC HDF5 dbmode='a' workflow, Bayes_Run.py:484-537)."""
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)
    from parasitoids_tpu.bayes.store import load_chain, save_chain

    state = init_chain_state(setup, random.PRNGKey(1))
    state, tr1 = run_mcmc(setup, state, MCMCConfig(n_samples=20))

    db = str(tmp_path / 'chain')
    save_chain(db, np.asarray(tr1)[None], state, meta={'n': 20})
    _, state2, meta = load_chain(db, setup)
    assert meta == {'n': 20}

    # continuing from the reloaded state matches continuing in-memory
    s_a, tr_a = run_mcmc(setup, state, MCMCConfig(n_samples=10))
    s_b, tr_b = run_mcmc(setup, state2, MCMCConfig(n_samples=10))
    np.testing.assert_allclose(np.asarray(tr_a), np.asarray(tr_b),
                               rtol=1e-6)


@pytest.mark.slow
def test_store_resume_stacked_chains(tmp_path, setup):
    """Multi-chain (stacked-state) resume rebuilds per-chain projections
    via sequential lax.map — the chain-batched vmap alternative pays every
    rho lax.switch branch (~33x/chain, parallel/chains.py)."""
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)
    from parasitoids_tpu.bayes.store import load_chain, save_chain

    s0 = init_chain_state(setup, random.PRNGKey(2))
    s1 = init_chain_state(setup, random.PRNGKey(3))
    s0, tr0 = run_mcmc(setup, s0, MCMCConfig(n_samples=5))
    s1, tr1 = run_mcmc(setup, s1, MCMCConfig(n_samples=5))
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), s0, s1)

    db = str(tmp_path / 'chains')
    save_chain(db, np.stack([np.asarray(tr0), np.asarray(tr1)]), stacked,
               meta={'chains': 2})
    traces, state2, meta = load_chain(db, setup)
    assert traces.shape[:2] == (2, 5)
    assert state2.m.shape[0] == 2
    # the rebuilt cached projections match the originals per chain
    for orig, re in ((s0, jax.tree.map(lambda x: x[0], state2)),
                     (s1, jax.tree.map(lambda x: x[1], state2))):
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6), orig.proj, re.proj)


@pytest.mark.slow
def test_traced_obs_matches_baked_and_shares_compile(setup):
    """``run_mcmc(..., obs=setup.obs_pytree(y))`` must (a) reuse ONE
    compiled program across datasets — the property that makes SBC
    replicates tractable — and (b) match the ``with_observations(y)``
    baked-constant path numerically."""
    from parasitoids_tpu.bayes.predictive import simulate_observations
    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)

    m0 = np.asarray(initial_model_params())
    o0 = np.asarray(initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2))
    cfg = MCMCConfig(n_samples=5)
    datasets = [simulate_observations(setup, m0, o0,
                                      np.random.default_rng(i))
                for i in range(2)]

    traces = []
    sizes = []
    for y in datasets:
        obs = setup.obs_pytree(y)
        st = init_chain_state(setup, random.PRNGKey(7), m0=m0, o0=o0,
                              obs=obs)
        _, tr = run_mcmc(setup, st, cfg, obs=obs)
        traces.append(np.asarray(jax.block_until_ready(tr)))
        if hasattr(run_mcmc, '_cache_size'):
            sizes.append(run_mcmc._cache_size())
    if sizes:
        assert sizes[0] == sizes[-1], 'second dataset retraced run_mcmc'
    # different datasets must actually give different posteriors
    assert not np.allclose(traces[0][:, -1], traces[1][:, -1])

    baked = setup.with_observations(datasets[0])
    sb = init_chain_state(baked, random.PRNGKey(7), m0=m0, o0=o0)
    _, tr_b = run_mcmc(baked, sb, cfg)
    np.testing.assert_allclose(traces[0], np.asarray(tr_b),
                               rtol=2e-5, atol=1e-5)
