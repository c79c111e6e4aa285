"""Replica-exchange (parallel tempering) sampler tests.

Covers: ladder construction, even-odd pairing, beta=1 equivalence with the
plain AM sampler, swap bookkeeping, and stacked-vs-mesh-sharded (ppermute)
numerical identity on the 8 virtual CPU devices from conftest.
"""

import jax
import jax.numpy as jnp
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


def test_geometric_ladder():
    from parasitoids_tpu.bayes.tempering import geometric_ladder
    b = geometric_ladder(5, beta_min=0.05)
    assert b.shape == (5,)
    assert b[0] == 1.0
    np.testing.assert_allclose(b[-1], 0.05, rtol=1e-6)
    assert (np.diff(b) < 0).all()
    # geometric: constant ratio
    r = b[1:] / b[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-5)
    assert geometric_ladder(1).tolist() == [1.0]


def test_power_ladder():
    from parasitoids_tpu.bayes.tempering import power_ladder
    b = power_ladder(6, power=5.0)
    assert b.shape == (6,)
    assert b[0] == 1.0 and b[-1] == 0.0
    assert (np.diff(b) < 0).all()
    # rungs crowd toward beta = 0 (spacing shrinks toward the prior end)
    gaps = -np.diff(b)
    assert (np.diff(gaps) < 0).all()
    with pytest.raises(ValueError):
        power_ladder(1)


def test_log_evidence_conjugate_normal():
    """TI and stepping-stone recover the exact evidence of a conjugate
    normal model: theta ~ N(0,1), y | theta ~ N(theta, s2).  The tempered
    posterior at beta is N(beta*y/s2 / tau, 1/tau), tau = 1 + beta/s2, and
    log Z = log N(y; 0, 1 + s2) exactly."""
    from parasitoids_tpu.bayes.tempering import log_evidence, power_ladder

    rng = np.random.default_rng(0)
    y, s2 = 1.7, 0.5
    exact = -0.5 * (np.log(2 * np.pi * (1 + s2)) + y ** 2 / (1 + s2))

    betas = power_ladder(32, power=3.0)
    n = 4000
    lls = np.empty((len(betas), n))
    for i, b in enumerate(betas):
        tau = 1.0 + b / s2
        th = rng.normal(b * y / s2 / tau, 1.0 / np.sqrt(tau), size=n)
        lls[i] = -0.5 * (np.log(2 * np.pi * s2) + (y - th) ** 2 / s2)
    ev = log_evidence(betas, lls, burn=0)
    assert ev['complete']
    assert ev['equilibrated']          # exact equilibrium draws
    np.testing.assert_allclose(ev['ss'], exact, atol=0.02)
    np.testing.assert_allclose(ev['ti'], exact, atol=0.05)
    # burn handling + shape checks
    ev2 = log_evidence(betas, lls, burn=100)
    assert abs(ev2['ss'] - exact) < 0.05
    with pytest.raises(ValueError):
        log_evidence(betas[:-1], lls)
    with pytest.raises(ValueError):
        log_evidence(betas, lls, burn=n)


def test_log_evidence_incomplete_ladder_flagged():
    from parasitoids_tpu.bayes.tempering import geometric_ladder, log_evidence
    betas = geometric_ladder(4, beta_min=0.2)
    lls = np.zeros((4, 10))
    ev = log_evidence(betas, lls)
    assert not ev['complete']
    # constant loglik: both estimators give (1 - beta_min) * c exactly
    np.testing.assert_allclose(ev['ti'], 0.0, atol=1e-12)
    np.testing.assert_allclose(ev['ss'], 0.0, atol=1e-12)


def test_log_evidence_equilibration_diagnostic():
    """A rung whose mean loglik drops below its colder neighbor (beyond MC
    noise) is a hard non-equilibration signal and must be flagged."""
    from parasitoids_tpu.bayes.tempering import log_evidence

    rng = np.random.default_rng(5)
    betas = np.array([1.0, 0.5, 0.0], np.float32)
    n = 2000
    # healthy: E_beta[ll] increasing in beta (-10 at prior, -2 at posterior)
    lls = np.stack([rng.normal(-2, 0.3, n), rng.normal(-5, 0.3, n),
                    rng.normal(-10, 0.3, n)])
    assert log_evidence(betas, lls)['equilibrated']
    # stuck cold chain: posterior rung far below an adjacent hotter rung
    lls_bad = np.stack([rng.normal(-50, 0.3, n), rng.normal(-5, 0.3, n),
                        rng.normal(-10, 0.3, n)])
    ev = log_evidence(betas, lls_bad)
    assert not ev['equilibrated']
    # offending pair index is in ascending-beta ordering
    assert 1 in np.asarray(ev['nonmonotone_at'])


def test_tune_ladder_unit():
    from parasitoids_tpu.bayes.tempering import (geometric_ladder,
                                                 power_ladder, tune_ladder)
    b0 = power_ladder(5)
    # uniform rates: fixed point, ladder unchanged
    np.testing.assert_allclose(tune_ladder(b0, np.full(4, 0.4)), b0,
                               rtol=1e-6)
    # top pair accepting far above average: its gap must widen
    b1 = tune_ladder(b0, np.array([0.9, 0.3, 0.3, 0.3]))
    assert b1[0] == 1.0 and b1[-1] == 0.0          # endpoints pinned
    assert (np.diff(b1) < 0).all()                 # still a ladder
    assert b1[1] < b0[1]                           # rung 1 pulled down
    # pinned geometric bottom is preserved exactly
    g0 = geometric_ladder(5, beta_min=0.05)
    g1 = tune_ladder(g0, np.array([0.8, 0.4, 0.2, 0.1]))
    np.testing.assert_allclose(g1[-1], 0.05, rtol=1e-5)
    assert g1[0] == 1.0 and (np.diff(g1) < 0).all()
    # T=2: nothing interior, identity
    np.testing.assert_array_equal(
        tune_ladder(np.array([1.0, 0.0]), np.array([0.5])), [1.0, 0.0])
    with pytest.raises(ValueError):
        tune_ladder(b0, np.zeros(2))


def test_tune_ladder_equalizes_toy_acceptance():
    """Iterating the tuner against a synthetic acceptance model drives the
    per-pair rates toward uniformity."""
    from parasitoids_tpu.bayes.tempering import power_ladder, tune_ladder

    def rates_of(b):
        # finite pairs: acceptance decays with the log-beta gap;
        # bottom (finite, 0) pair: improves as the last finite rung cools
        fin = b[:-1]
        gap_rates = np.exp(-1.2 * np.abs(np.diff(np.log(fin))))
        bottom = np.exp(-4.0 * fin[-1])
        return np.concatenate([gap_rates, [bottom]])

    b = power_ladder(6, power=5.0)
    spread0 = np.std(rates_of(b))
    for i in range(60):
        b = tune_ladder(b, rates_of(b), kappa=0.4 / (1 + 0.05 * i))
        assert b[0] == 1.0 and b[-1] == 0.0 and (np.diff(b) < 0).all()
    assert np.std(rates_of(b)) < 0.25 * spread0


def test_pairing_even_odd():
    from parasitoids_tpu.bayes.tempering import _pairing
    T = 5
    idx = jnp.arange(T)
    # parity 0: pairs (0,1), (2,3); 4 unpaired
    is_l, is_r, pid = _pairing(idx, 0, T)
    assert np.asarray(is_l).tolist() == [True, False, True, False, False]
    assert np.asarray(is_r).tolist() == [False, True, False, True, False]
    assert np.asarray(pid)[:4].tolist() == [0, 0, 2, 2]
    # parity 1: pairs (1,2), (3,4); 0 unpaired
    is_l, is_r, pid = _pairing(idx, 1, T)
    assert np.asarray(is_l).tolist() == [False, True, False, True, False]
    assert np.asarray(is_r).tolist() == [False, False, True, False, True]
    # every replica is in at most one pair and pairs are adjacent
    paired = np.asarray(is_l | is_r)
    assert paired.tolist() == [False, True, True, True, True]


def test_pt_single_temperature_matches_plain_am(setup):
    """T=1 PT is exactly the plain AM chain (beta=1 path untouched)."""
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)
    from parasitoids_tpu.bayes.tempering import (PTConfig, init_pt_states,
                                                 run_pt)

    states = init_pt_states(setup, random.PRNGKey(0), 1, jitter=0.0)
    cfg = PTConfig(n_rounds=2, swap_every=3)
    st_pt, tr_pt, stats = run_pt(setup, states, np.ones(1, np.float32),
                                 random.PRNGKey(99), cfg)

    s0 = jax.tree.map(lambda x: x[0], states)
    _, tr_am = run_mcmc(setup, s0, MCMCConfig(n_samples=6))
    np.testing.assert_array_equal(np.asarray(tr_pt[0]), np.asarray(tr_am))
    assert stats['swap_attempts'].shape == (0,)
    # loglik trace recorded per step; last entry matches the state cache
    ll = np.asarray(stats['loglik'])
    assert ll.shape == (1, 6)
    np.testing.assert_allclose(ll[0, -1], float(st_pt.loglik[0]), rtol=1e-6)


@pytest.mark.slow
def test_pt_stacked_runs_and_swaps(setup):
    """Multi-temperature PT: finite traces, chains move, swaps happen,
    bookkeeping counts even-odd pair attempts correctly."""
    from parasitoids_tpu.bayes.tempering import (PTConfig, geometric_ladder,
                                                 init_pt_states, run_pt)

    T = 4
    betas = geometric_ladder(T, beta_min=0.05)
    states = init_pt_states(setup, random.PRNGKey(1), T)
    cfg = PTConfig(n_rounds=8, swap_every=3)
    states, traces, stats = run_pt(setup, states, betas,
                                   random.PRNGKey(2), cfg)
    traces = np.asarray(traces)
    assert traces.shape == (T, 24, traces.shape[-1])
    assert np.isfinite(traces).all()
    # even-odd attempt schedule: pair 0 and 2 attempted on even rounds (4),
    # pair 1 on odd rounds (4)
    att = np.asarray(stats['swap_attempts'])
    np.testing.assert_array_equal(att, [4.0, 4.0, 4.0])
    acc = np.asarray(stats['swap_accepts'])
    assert (acc >= 0).all() and (acc <= att).all()
    # replicas at different temperatures are at different positions
    final_m = np.asarray(states.m)
    assert not np.allclose(final_m[0], final_m[-1])
    # the cached loglik is consistent with each replica's own position
    # (i.e. swaps moved the cache with the position)
    from parasitoids_tpu.bayes.sampler import _as_model, _as_obs
    for t in (0, T - 1):
        m = _as_model(jnp.asarray(states.m[t]))
        proj = setup.forward_projections(m)
        ll = setup.log_likelihood(proj, _as_obs(jnp.asarray(states.o[t]),
                                                setup.n_sent))
        np.testing.assert_allclose(float(ll), float(states.loglik[t]),
                                   rtol=1e-5)


@pytest.mark.slow
def test_pt_chunked_matches_monolithic(setup):
    """Two offset chunks reproduce one monolithic run bitwise (the CLI's
    checkpointed driving mode)."""
    from parasitoids_tpu.bayes.tempering import (PTConfig, geometric_ladder,
                                                 init_pt_states, run_pt)

    T = 3
    betas = geometric_ladder(T, beta_min=0.1)
    states0 = init_pt_states(setup, random.PRNGKey(7), T)
    key = random.PRNGKey(8)

    st_m, tr_m, stats_m = run_pt(setup, states0, betas, key,
                                 PTConfig(n_rounds=4, swap_every=2))

    cfg = PTConfig(n_rounds=2, swap_every=2)
    st_c, tr1, s1 = run_pt(setup, states0, betas, key, cfg, round_offset=0)
    st_c, tr2, s2 = run_pt(setup, st_c, betas, key, cfg, round_offset=2)
    np.testing.assert_array_equal(
        np.asarray(tr_m), np.concatenate([tr1, tr2], axis=1))
    np.testing.assert_array_equal(
        np.asarray(stats_m['loglik']),
        np.concatenate([s1['loglik'], s2['loglik']], axis=1))
    np.testing.assert_array_equal(
        np.asarray(stats_m['swap_attempts']),
        np.asarray(s1['swap_attempts'] + s2['swap_attempts']))
    np.testing.assert_array_equal(np.asarray(st_m.m), np.asarray(st_c.m))
    np.testing.assert_array_equal(np.asarray(st_m.key), np.asarray(st_c.key))


@pytest.mark.slow
def test_pt_sharded_matches_stacked(setup):
    """ppermute mesh path == gather stacked path, bit-for-bit traces."""
    from parasitoids_tpu.bayes.tempering import (PTConfig, geometric_ladder,
                                                 init_pt_states, run_pt,
                                                 run_pt_sharded)
    from parasitoids_tpu.parallel.chains import chain_mesh

    n_dev = len(jax.devices())
    assert n_dev == 8, 'conftest should provide 8 virtual devices'
    T = 8
    betas = geometric_ladder(T, beta_min=0.05)
    states = init_pt_states(setup, random.PRNGKey(3), T)
    cfg = PTConfig(n_rounds=4, swap_every=2)
    key = random.PRNGKey(4)

    st_a, tr_a, stats_a = run_pt(setup, states, betas, key, cfg)
    mesh = chain_mesh()
    st_b, tr_b, stats_b = run_pt_sharded(setup, states, betas, key, cfg,
                                         mesh)
    np.testing.assert_array_equal(np.asarray(tr_a), np.asarray(tr_b))
    np.testing.assert_array_equal(np.asarray(stats_a['swap_attempts']),
                                  np.asarray(stats_b['swap_attempts']))
    np.testing.assert_array_equal(np.asarray(stats_a['swap_accepts']),
                                  np.asarray(stats_b['swap_accepts']))
    np.testing.assert_array_equal(np.asarray(stats_a['loglik']),
                                  np.asarray(stats_b['loglik']))
    for fa, fb in zip(st_a.m, st_b.m):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    np.testing.assert_array_equal(np.asarray(st_a.loglik),
                                  np.asarray(st_b.loglik))


@pytest.mark.slow
def test_pt_cli_new_and_resume(tmp_path, capsys):
    """--sampler pt end to end: new run in checkpointed chunks, saved
    store with ladder + loglik extras, evidence report, exact resume."""
    from parasitoids_tpu.bayes import run as brun
    from parasitoids_tpu.bayes.store import load_extras

    db = str(tmp_path / 'pt_run')
    ov = ['ndays=3', 'domain_info=(10000.0,50)', 'interp_num=2',
          'kernel_rad=6', 'kernel_rad_local=3', 'quad_nodes=8']
    brun.main(['--new', '12', '4', db, '--sampler', 'pt', '--temps', '3',
               '--swap-every', '3', '--checkpoint-every', '6'] + ov)
    out = capsys.readouterr().out
    assert 'log evidence: TI' in out          # power ladder reaches beta=0
    assert 'swap acceptance by rung' in out

    with np.load(db + '.npz') as d:
        tr1 = d['traces']
        assert tr1.shape[0] == 1              # cold chain only
        # ceil(16/3) = 6 rounds x 3 = 18 steps, minus 4 burn: stored
        # 'traces' are post-burn posterior draws, same semantics as AM
        assert tr1.shape[1] == 14
    ex = load_extras(db)
    assert ex['betas'].shape == (3,) and ex['betas'][-1] == 0.0
    assert ex['loglik'].shape == (3, 18)      # loglik keeps full history
    assert np.isfinite(ex['loglik']).all()

    brun.main(['--resume', db, '6', '--sampler', 'pt'] + ov)
    with np.load(db + '.npz') as d:
        assert d['traces'].shape[1] == 20
        np.testing.assert_array_equal(d['traces'][:, :14], tr1)
    assert load_extras(db)['loglik'].shape == (3, 24)

    # 0-iteration resume = recompute the evidence report from the store
    capsys.readouterr()
    brun.main(['--resume', db, '0', '--sampler', 'pt'] + ov)
    out = capsys.readouterr().out
    assert 'log evidence: TI' in out

    # resuming a PT store through the AM path is rejected cleanly
    with pytest.raises(SystemExit, match='--sampler'):
        brun.main(['--resume', db, '6'] + ov)


def test_pt_cli_resume_from_burnin_only_checkpoint(tmp_path, capsys):
    """A PT store written before any post-burn draw (the (1, 0, 1)
    placeholder) must resume cleanly into the sampling phase (regression:
    the placeholder was concatenated against the first real cold-chain
    block and crashed append_traces)."""
    from parasitoids_tpu.bayes import run as brun

    db = str(tmp_path / 'pt_burn')
    ov = ['ndays=3', 'domain_info=(10000.0,50)', 'interp_num=2',
          'kernel_rad=6', 'kernel_rad_local=3', 'quad_nodes=8']
    brun.main(['--new', '0', '9', db, '--sampler', 'pt', '--temps', '3',
               '--swap-every', '3'] + ov)
    with np.load(db + '.npz') as d:
        assert d['traces'].shape[1] == 0      # burn-in only, no draws yet
    capsys.readouterr()
    brun.main(['--resume', db, '6', '--sampler', 'pt'] + ov)
    with np.load(db + '.npz') as d:
        assert d['traces'].shape[1] == 6      # post-burn draws appended


@pytest.mark.slow
def test_pt_cli_tune_ladder(tmp_path, capsys):
    """--tune-ladder adapts interior rungs during burn-in chunks and
    freezes the ladder for the sampling phase.  checkpoint-every == swap
    -every makes each chunk a single swap round, which attempts only one
    parity of adjacent pairs — tuning must accumulate stats across chunks
    (regression: it required every pair within one chunk and silently
    never tuned)."""
    from parasitoids_tpu.bayes import run as brun
    from parasitoids_tpu.bayes.store import load_extras
    from parasitoids_tpu.bayes.tempering import power_ladder

    db = str(tmp_path / 'pt_tuned')
    ov = ['ndays=3', 'domain_info=(10000.0,50)', 'interp_num=2',
          'kernel_rad=6', 'kernel_rad_local=3', 'quad_nodes=8']
    # burn 12 over chunks of ONE round (3 steps): four in-burn chunks,
    # alternating swap parity; all pairs covered only across chunks
    brun.main(['--new', '6', '12', db, '--sampler', 'pt', '--temps', '4',
               '--swap-every', '3', '--checkpoint-every', '3',
               '--tune-ladder'] + ov)
    out = capsys.readouterr().out
    assert 'ladder tuned' in out
    b = load_extras(db)['betas']
    b0 = power_ladder(4)
    assert b[0] == 1.0 and b[-1] == 0.0 and (np.diff(b) < 0).all()
    assert not np.allclose(b, b0)             # interior rungs moved


def test_pt_sharded_rejects_mismatched_ladder(setup):
    from parasitoids_tpu.bayes.tempering import (PTConfig, geometric_ladder,
                                                 init_pt_states,
                                                 run_pt_sharded)
    from parasitoids_tpu.parallel.chains import chain_mesh

    betas = geometric_ladder(3)
    states = init_pt_states(setup, random.PRNGKey(5), 3)
    with pytest.raises(ValueError):
        run_pt_sharded(setup, states, betas, random.PRNGKey(6),
                       PTConfig(n_rounds=1), chain_mesh())
