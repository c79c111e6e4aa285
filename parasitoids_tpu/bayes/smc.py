"""Adaptive tempered Sequential Monte Carlo (SMC) over the full posterior.

Beyond-reference capability (the reference's only sampler is a single PyMC
AdaptiveMetropolis chain, Bayes_Run.py:484-487): a particle population is
initialized from the exact joint prior (priors.py ``sample_prior_*`` — the
same distributions whose densities the reference evaluates), then annealed
to the posterior through a *data-driven* inverse-temperature path

    0 = beta_0 < beta_1 < ... < beta_S = 1,

where each increment is chosen on the fly so the effective sample size of
the incremental importance weights stays at a target fraction (Del Moral,
Doucet & Jasra 2012 adaptive SMC).  Each stage reweights, resamples
(systematic) when ESS drops below a threshold, and rejuvenates every
particle with ``n_moves`` adaptive-Metropolis transitions targeting the
current tempered posterior — the same ``mcmc_step`` kernel as the AM/PT
samplers, with its proposal covariance retuned each stage from the whole
particle population (the textbook SMC advantage: the population, not one
chain's history, tunes the kernel).

The stage products ``log sum_i W_i exp(delta_s * loglik_i)`` telescope to
the model evidence, giving a third, independent marginal-likelihood
estimator alongside parallel tempering's thermodynamic-integration and
stepping-stone estimates (tempering.py) — three estimators, three different
failure modes, one cross-check.

Execution: particles advance under ``lax.map`` (never ``vmap`` — a
particle-batched forward pass pays every rho ``lax.switch`` branch, see
parallel/chains.py) inside one jitted move program per stage; with a mesh
the particle axis is ``shard_map``-sharded one shard per device, and the
tiny between-stage logic (weights, resampling, covariance retune) runs on
host — numerically identical to the single-chip path (tested).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random
from jax.sharding import NamedSharding, PartitionSpec as P

from .model import BayesSetup
from .priors import (STEP_SCALES, sample_prior_model, sample_prior_obs)
from .sampler import ChainState, MCMCConfig, init_chain_state, mcmc_step

__all__ = ['SMCConfig', 'ess', 'next_beta', 'systematic_resample',
           'init_smc_particles', 'run_smc']

# frozen-kernel particle count: moves run with the Welford count pinned far
# past adapt_start, so within a stage the proposal stays the population
# covariance (per-step Robbins-Monro gain ~1/sqrt(_C0 - adapt_start) ~ 0.01)
_C0 = 10_000.0
_ADAPT_START = 500
# shrinkage of the population covariance toward the reference's seed
# diag(step_scales^2) (Bayes_Run.py:188-196): keeps the proposal full-rank
# when the population is small or momentarily degenerate
_SHRINK = 0.1


class SMCConfig(NamedTuple):
    n_particles: int
    n_moves: int = 5            # rejuvenation MCMC steps per move round
    ess_target: float = 0.5     # next beta solves ESS = target * N
    resample_ess: float = 0.5   # resample when ESS/N falls below this
    max_stages: int = 200       # hard cap on annealing stages
    obs_scale: float = 0.05     # as MCMCConfig
    obs_sweeps: int = 1         # as MCMCConfig (ridge-mixing knob)
    # adaptive rejuvenation: repeat ``n_moves``-step move rounds until the
    # average particle has accepted >= ``min_accepts`` jumps this stage
    # (or ``max_move_rounds`` is hit).  Resampling collapses the population
    # onto few genealogies; if the subsequent moves barely accept, the
    # weight-based ESS criterion goes blind to the position degeneracy and
    # the anneal takes giant, badly-supported temperature jumps (measured:
    # a fixed 5-move stage at 14% acceptance let beta jump 0.03 -> 1.0 and
    # biased log Z by ~150 nats on the full Kalbar posterior) — spending
    # extra moves exactly where mixing is poor is the standard cure.
    min_accepts: float = 2.0
    max_move_rounds: int = 10


# ----------------------------------------------------------------------
# host-side annealing machinery (pure NumPy; unit-tested standalone)
# ----------------------------------------------------------------------

# one host-side f64 logsumexp for the whole bayes package (defined in
# tempering.py; re-exported here for the module-local call sites)
from .tempering import logsumexp as _logsumexp  # noqa: E402


def ess(logw):
    """Kish effective sample size of (unnormalized) log weights."""
    return float(np.exp(2.0 * _logsumexp(logw) - _logsumexp(2.0 * np.asarray(
        logw, np.float64))))


def next_beta(beta, loglik, logw, target_ess, tol=1e-10):
    """Largest temperature increment ``delta`` such that the reweighted
    population keeps ``ESS(logw + delta*loglik) >= target_ess``, found by
    bisection (Del Moral et al. 2012 sec. 3.1); capped at ``1 - beta``.

    Returns ``delta`` (> 0).  If even the full remaining step keeps the ESS
    at or above target (e.g. a nearly flat likelihood), the cap is returned
    and the caller lands exactly on beta = 1.
    """
    ll = np.where(np.isfinite(loglik), np.asarray(loglik, np.float64),
                  -1e300)
    cap = 1.0 - beta
    if cap <= 0:
        raise ValueError('beta is already 1')
    if ess(logw + cap * ll) >= target_ess:
        return cap
    lo, hi = 0.0, cap
    while hi - lo > tol * max(1.0, cap):
        mid = 0.5 * (lo + hi)
        if ess(logw + mid * ll) >= target_ess:
            lo = mid
        else:
            hi = mid
    return max(lo, tol)


def systematic_resample(weights, rng):
    """Systematic (stratified single-uniform) resampling: indices ``i`` with
    ``E[count_i] = N * w_i`` and counts off by at most 1 from N*w_i."""
    w = np.asarray(weights, np.float64)
    n = w.shape[0]
    pos = (rng.random() + np.arange(n)) / n
    return np.searchsorted(np.cumsum(w / w.sum()), pos).clip(0, n - 1)


# ----------------------------------------------------------------------
# device programs (cached per setup/config/mesh)
# ----------------------------------------------------------------------

def _particle_axis_put(states, mesh):
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), states)


@lru_cache(maxsize=None)
def _init_prog(setup, mesh):
    """Evaluate the forward model at every prior particle — the expensive
    half of initialization — as one program.  ``obs_mask`` is a traced
    operand (replicated): every cross-validation fold reuses one compiled
    program (model.py ``split_point_mask``)."""
    def one(args, obs_mask):
        m0, o0, key = args
        return init_chain_state(setup, key, m0=m0, o0=o0,
                                obs_mask=obs_mask)

    def stacked(m0s, o0s, keys, obs_mask):
        return lax.map(lambda a: one(a, obs_mask), (m0s, o0s, keys))

    if mesh is None:
        return jax.jit(stacked)
    from jax import shard_map
    axis = mesh.axis_names[0]
    return jax.jit(shard_map(stacked, mesh=mesh,
                             in_specs=(P(axis), P(axis), P(axis), P()),
                             out_specs=P(axis), check_vma=False))


@lru_cache(maxsize=None)
def _move_prog(setup, n_moves, obs_scale, mesh, obs_sweeps=1,
               batched=False):
    """``n_moves`` AM transitions at inverse temperature ``beta`` on every
    particle; ``beta`` and ``obs_mask`` are traced operands so every stage
    (and every cross-validation fold) reuses one compiled program.

    ``batched=True`` advances the particles under ``vmap`` instead of
    ``lax.map`` — callers must pass a ``setup`` prepared with
    ``with_batched_bvn()`` (the fixed-G select BVN scheme) or the batched
    predicate ``lax.switch`` executes every ρ branch (the measured-33×
    trap, parallel/chains.py).  Measured head-to-head by
    scripts/measure_batched_ensemble.py; the CLI opt-in is
    ``PARA_SMC_BATCHED``."""
    mcfg = MCMCConfig(n_samples=n_moves, adapt_start=_ADAPT_START,
                      obs_scale=obs_scale, obs_sweeps=obs_sweeps)

    def particle_fn(s, beta, obs_mask):
        def step(st, _):
            st, _ = mcmc_step(setup, st, mcfg, beta=beta,
                              obs_mask=obs_mask)
            return st, None

        s, _ = lax.scan(step, s, None, length=n_moves)
        return s

    def stacked(states, beta, obs_mask):
        if batched:
            return jax.vmap(
                lambda s: particle_fn(s, beta, obs_mask))(states)
        return lax.map(lambda s: particle_fn(s, beta, obs_mask), states)

    if mesh is None:
        return jax.jit(stacked)
    from jax import shard_map
    axis = mesh.axis_names[0]
    return jax.jit(shard_map(stacked, mesh=mesh,
                             in_specs=(P(axis), P(), P()),
                             out_specs=P(axis), check_vma=False))


def init_smc_particles(setup: BayesSetup, key, n, mesh=None, obs_mask=None):
    """``n`` particles drawn from the exact joint prior, with the forward
    model evaluated at each (stacked ChainState)."""
    k_m, k_o, k_c = random.split(key, 3)
    m0s = jax.vmap(sample_prior_model)(random.split(k_m, n))
    o0s = jax.vmap(lambda k: sample_prior_obs(
        k, setup.field_areas, setup.min_field_area,
        getattr(setup, 'obs_model', 'poisson')))(random.split(k_o, n))
    keys = random.split(k_c, n)
    if mesh is not None:
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        m0s, o0s, keys = (jax.device_put(x, sh) for x in (m0s, o0s, keys))
    return _init_prog(setup, mesh)(m0s, o0s, keys, obs_mask)


def _retune(states, mu, cov, log_scale):
    """Pin every particle's proposal to the population covariance: the
    Welford moments are overwritten so ``_proposal_chol`` (sampler.py)
    reconstructs ``cov`` exactly, with the count far enough past
    ``adapt_start`` that within-stage adaptation is negligible."""
    n = states.m.shape[0]
    mu = jnp.broadcast_to(jnp.asarray(mu, jnp.float32), states.m.shape)
    m2 = jnp.broadcast_to(jnp.asarray(cov * (_C0 - 1.0), jnp.float32),
                          states.m2.shape)
    return states._replace(
        count=jnp.full((n,), _C0, jnp.float32), mean=mu, m2=m2,
        log_scale=jnp.full((n,), np.float32(log_scale)))


def _population_cov(m, logw):
    """Weighted mean/covariance of the model block, shrunk toward the
    reference's seed proposal diag(step_scales^2)."""
    w = np.exp(np.asarray(logw, np.float64)
               - _logsumexp(logw))
    m = np.asarray(m, np.float64)
    mu = w @ m
    d = m - mu
    cov = (d * w[:, None]).T @ d
    cov = (1.0 - _SHRINK) * cov + _SHRINK * np.diag(
        np.asarray(STEP_SCALES, np.float64) ** 2)
    return mu, cov


def run_smc(setup: BayesSetup, key, cfg: SMCConfig, mesh=None, seed=0,
            verbose=False, checkpoint=None, resume=None, obs_mask=None,
            batched=False):
    """Anneal a prior particle population to the posterior.

    ``seed`` drives the host-side resampling stream (stage-keyed, so a
    checkpointed run resumed mid-anneal is bitwise-identical to a
    monolithic one).  ``checkpoint(payload)``, if given, is called after
    every stage with the complete annealer state; ``resume`` is such a
    payload to continue from (``key`` is then unused).  ``obs_mask``
    (model.py ``split_point_mask``) targets a masked likelihood as a
    traced operand — bayes/cv.py's refit folds all share one compiled
    program this way.

    Returns a payload dict:

    * ``'states'`` — final stacked ChainState (posterior particles),
    * ``'logw'`` — (N,) final unnormalized log weights,
    * ``'beta'`` — final inverse temperature (1.0 on completion),
    * ``'logz'`` — SMC marginal-likelihood estimate
      (= log Z once beta = 1; cross-check against tempering.log_evidence),
    * ``'log_scale'``, ``'stage'`` — kernel-tuning / schedule state,
    * ``'history'`` — dict of per-stage arrays (betas, ess, acceptance,
      resampled flags, logz path).
    """
    N = cfg.n_particles
    if mesh is not None and N % mesh.devices.size != 0:
        raise ValueError('n_particles must divide evenly over the mesh '
                         '({} over {} devices)'.format(N, mesh.devices.size))
    # batched rejuvenation: vmap the move kernel over particles with the
    # select-BVN forward config (the anneal itself — weights, schedule,
    # resampling — is unchanged; rejuvenation is a valid MCMC kernel under
    # either execution scheme, so a mid-anneal switch preserves
    # correctness).  Opt-in after measurement: see
    # scripts/measure_batched_ensemble.py.
    move_setup = setup.with_batched_bvn() if batched else setup
    move = _move_prog(move_setup, cfg.n_moves, cfg.obs_scale, mesh,
                      cfg.obs_sweeps, batched)

    if resume is not None:
        states = resume['states']
        logw = np.asarray(resume['logw'], np.float64)
        beta = float(resume['beta'])
        logz = float(resume['logz'])
        log_scale = float(resume['log_scale'])
        stage = int(resume['stage'])
        hist = {k: list(np.atleast_1d(v))
                for k, v in resume['history'].items()}
    else:
        states = init_smc_particles(setup, key, N, mesh, obs_mask=obs_mask)
        logw = np.zeros(N)
        beta = 0.0
        logz = 0.0
        log_scale = 0.0
        stage = 0
        hist = {'betas': [0.0], 'ess': [float(N)], 'accept': [],
                'resampled': [], 'logz': [0.0]}
    if mesh is not None:
        states = _particle_axis_put(states, mesh)

    def payload():
        return {'states': states, 'logw': logw, 'beta': beta,
                'logz': logz, 'log_scale': log_scale, 'stage': stage,
                'history': {k: np.asarray(v) for k, v in hist.items()}}

    while beta < 1.0 and stage < cfg.max_stages:
        ll = np.asarray(states.loglik, np.float64)
        ll = np.where(np.isfinite(ll), ll, -1e300)
        # target relative to the CURRENT ESS: carried-over weights may
        # already sit at/below an absolute target, which would pin the
        # bisection at delta ~ 0 and spin stages without progress
        delta = next_beta(beta, ll, logw, cfg.ess_target * ess(logw))
        logw_n = logw - _logsumexp(logw)
        logz += float(_logsumexp(logw_n + delta * ll))
        logw = logw + delta * ll
        beta = 1.0 if delta >= 1.0 - beta else beta + delta

        ne = ess(logw)
        # <= so an exactly-hit target still resamples (the bisection lands
        # on the boundary by construction when ess_target == resample_ess)
        resampled = ne <= cfg.resample_ess * N
        if resampled:
            w = np.exp(logw - _logsumexp(logw))
            idx = systematic_resample(
                w, np.random.default_rng([seed, stage]))
            states = jax.tree.map(
                lambda x: jnp.take(x, jnp.asarray(idx), axis=0), states)
            # clones share their ancestor's RNG key; without a re-key their
            # rejuvenation moves would be bitwise identical forever, capping
            # population diversity at the unique-ancestor count.  fold_in by
            # particle index is deterministic, so chunked/resumed runs stay
            # bitwise-equal to monolithic ones.
            states = states._replace(key=jax.vmap(random.fold_in)(
                states.key, jnp.arange(N, dtype=jnp.uint32)))
            logw = np.zeros(N)

        mu, cov = _population_cov(states.m, logw)
        states = _retune(states, mu, cov, log_scale)
        if mesh is not None:
            states = _particle_axis_put(states, mesh)
        acc0 = float(np.asarray(states.accepts_m, np.float64).sum())
        rounds = 0
        while rounds < max(1, cfg.max_move_rounds):
            states = jax.block_until_ready(
                move(states, jnp.float32(beta), obs_mask))
            rounds += 1
            per_particle = (float(np.asarray(
                states.accepts_m, np.float64).sum()) - acc0) / N
            if per_particle >= cfg.min_accepts:
                break
        acc = per_particle / (cfg.n_moves * rounds)
        # between-stage Robbins-Monro on the global proposal scale toward
        # the 0.234 optimum (within-stage adaptation is frozen, see _retune)
        log_scale = float(np.clip(log_scale + 0.7 * (acc - 0.234),
                                  -5.0, 5.0))
        stage += 1
        hist['betas'].append(beta)
        hist['ess'].append(ne)
        hist['accept'].append(acc)
        hist['resampled'].append(bool(resampled))
        hist['logz'].append(logz)
        hist.setdefault('rounds', []).append(rounds)
        if verbose:
            print('  stage {:3d}: beta {:.5f}  ESS {:6.1f}/{}  acc {:.2f} '
                  'x{} rounds  logZ {:+.2f}{}'.format(
                      stage, beta, ne, N, acc, rounds, logz,
                      '  [resampled]' if resampled else ''), flush=True)
        if checkpoint is not None:
            checkpoint(payload())
    if beta < 1.0:
        raise RuntimeError('SMC hit max_stages={} at beta={:.5f}; raise '
                           'max_stages or ess_target'.format(
                               cfg.max_stages, beta))
    return payload()
