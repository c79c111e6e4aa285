"""Replica-exchange MCMC (parallel tempering) over a TPU mesh.

Beyond-reference capability: the reference's PyMC AdaptiveMetropolis runs a
single chain on the posterior (Bayes_Run.py:484-487) and can stall in a
basin of the 20-parameter landscape; here a ladder of inverse temperatures
``1 = beta_0 > beta_1 > ... > beta_{T-1}`` runs one adaptive-Metropolis
replica per temperature against ``prior + beta * loglik`` (likelihood-only
tempering — every replica keeps the exact prior support), with periodic
even–odd nearest-neighbor state swaps accepted at

    log alpha = (beta_i - beta_j) * (loglik_j - loglik_i),

so hot replicas explore and the cold chain (index 0) is the posterior.

Two execution paths, numerically identical (tested against each other):

* ``run_pt`` — one compiled program on a single chip: ``lax.map`` over the
  replica axis (never ``vmap``: a replica-batched forward pass batches the
  BVN integrator's rho ``lax.switch`` and pays every branch, see
  parallel/chains.py), swaps as gathers on the stacked axis.
* ``run_pt_sharded`` — one replica per device over a ``jax.sharding.Mesh``:
  each device advances its replica locally, and the swap phase exchanges
  (log-likelihoods, then accepted states) with ladder neighbors via
  ``lax.ppermute`` — nearest-neighbor ICI traffic only, no gathers.

Replica adaptation state (Haario moments, proposal scale) is *not*
swapped: each temperature keeps adapting to its own tempered target, which
preserves diminishing adaptation across exchanges.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random
from jax.sharding import NamedSharding, PartitionSpec as P

from .model import BayesSetup
from .sampler import ChainState, MCMCConfig, mcmc_step

__all__ = ['PTConfig', 'geometric_ladder', 'init_pt_states', 'run_pt',
           'run_pt_sharded']

# chain-state fields exchanged on an accepted swap (position + everything
# cached at that position); adaptation fields stay with the temperature
_SWAP_FIELDS = ('m', 'o', 'loglik', 'prior_m', 'prior_o', 'proj')


class PTConfig(NamedTuple):
    n_rounds: int             # swap rounds
    swap_every: int = 10      # AM steps between swap attempts
    adapt_start: int = 500    # as MCMCConfig
    obs_scale: float = 0.05


def geometric_ladder(n_temps, beta_min=0.1):
    """Geometric inverse-temperature ladder from 1.0 down to ``beta_min``."""
    if n_temps < 1:
        raise ValueError('need at least one temperature')
    if n_temps == 1:
        return np.ones(1, np.float32)
    expo = np.arange(n_temps) / (n_temps - 1)
    return np.asarray(beta_min ** expo, np.float32)


def init_pt_states(setup: BayesSetup, key, n_temps, jitter=0.05):
    """Stacked per-temperature chain states with jittered starts."""
    from ..parallel.chains import init_chains
    return init_chains(setup, key, n_temps, jitter=jitter)


def _advance(setup, state, beta, cfg: PTConfig):
    """``swap_every`` tempered AM steps on one replica."""
    mcfg = MCMCConfig(n_samples=cfg.swap_every, adapt_start=cfg.adapt_start,
                      obs_scale=cfg.obs_scale)

    def step(s, _):
        return mcmc_step(setup, s, mcfg, beta=beta)

    return lax.scan(step, state, None, length=cfg.swap_every)


def _pairing(rank, parity, T):
    """Even–odd pairing at a swap round: pairs are (p, p+1), (p+2, p+3)...

    Returns (is_left, is_right, pair_id) where ``pair_id`` is the index of
    the pair's *left* member (= the adjacent-pair index for diagnostics).
    """
    off = (rank - parity) % 2
    is_left = (off == 0) & (rank + 1 < T) & (rank >= parity)
    is_right = (off == 1) & (rank - 1 >= parity)
    pair_id = jnp.clip(jnp.where(is_left, rank, rank - 1), 0, max(T - 2, 0))
    return is_left, is_right, pair_id


def _swap_log_alpha(betas, ll_left, ll_right, pair_id, T):
    """Exchange log-acceptance — written once so the stacked and sharded
    paths multiply identical operands in the same order (bitwise-equal
    accept decisions on every member of a pair)."""
    b_l = betas[pair_id]
    b_r = betas[jnp.minimum(pair_id + 1, T - 1)]
    return (b_l - b_r) * (ll_right - ll_left)


def _swap_sweep_stacked(states, betas, key, parity):
    """One even–odd swap sweep on stacked (T, ...) states via gathers."""
    T = betas.shape[0]
    idx = jnp.arange(T)
    is_left, is_right, pair_id = _pairing(idx, parity, T)
    paired = is_left | is_right
    ll = states.loglik
    la = _swap_log_alpha(betas, ll[pair_id],
                         ll[jnp.minimum(pair_id + 1, T - 1)], pair_id, T)
    u = jax.vmap(lambda i: random.uniform(random.fold_in(key, i)))(pair_id)
    accept = paired & (jnp.log(u) < la)
    partner = jnp.clip(jnp.where(is_left, idx + 1, idx - 1), 0, T - 1)
    perm = jnp.where(accept, partner, idx)
    repl = {f: jax.tree.map(lambda x: jnp.take(x, perm, axis=0),
                            getattr(states, f)) for f in _SWAP_FIELDS}
    states = states._replace(**repl)
    acc = jnp.zeros(T - 1).at[pair_id].add(
        jnp.where(is_left & accept, 1.0, 0.0))
    att = jnp.zeros(T - 1).at[pair_id].add(jnp.where(is_left, 1.0, 0.0))
    return states, acc, att


@partial(jax.jit, static_argnames=('setup', 'cfg'))
def run_pt(setup: BayesSetup, states, betas, swap_key, cfg: PTConfig):
    """Parallel tempering as one compiled single-chip program.

    ``states``: stacked ChainState with leading temperature axis matching
    ``betas`` (index 0 must be beta = 1).  Returns
    ``(states, traces (T, n_rounds*swap_every, dim), swap_stats)`` where
    ``traces[0]`` is the posterior (cold) chain and ``swap_stats`` holds
    per-adjacent-pair attempt/accept counts.
    """
    betas = jnp.asarray(betas, jnp.float32)
    T = betas.shape[0]

    def one_round(carry, r):
        states, att, acc = carry
        states, traces = lax.map(
            lambda sb: _advance(setup, sb[0], sb[1], cfg), (states, betas))
        if T > 1:
            states, pa, pt_att = _swap_sweep_stacked(
                states, betas, random.fold_in(swap_key, r), r % 2)
            att, acc = att + pt_att, acc + pa
        return (states, att, acc), traces

    zero = jnp.zeros(max(T - 1, 0))
    (states, att, acc), traces = lax.scan(
        one_round, (states, zero, zero), jnp.arange(cfg.n_rounds))
    # (rounds, T, swap_every, dim) -> (T, rounds*swap_every, dim)
    traces = jnp.transpose(traces, (1, 0, 2, 3)).reshape(
        T, cfg.n_rounds * cfg.swap_every, -1)
    return states, traces, {'swap_attempts': att, 'swap_accepts': acc}


def _swap_step_collective(s, betas, key, parity, rank, T, axis):
    """One swap attempt for this device's replica, neighbors via ppermute."""
    perm_from_next = [(i, i - 1) for i in range(1, T)]
    perm_from_prev = [(i, i + 1) for i in range(T - 1)]
    ll_next = lax.ppermute(s.loglik, axis, perm_from_next)
    ll_prev = lax.ppermute(s.loglik, axis, perm_from_prev)
    is_left, is_right, pair_id = _pairing(rank, parity, T)
    ll_left = jnp.where(is_left, s.loglik, ll_prev)
    ll_right = jnp.where(is_left, ll_next, s.loglik)
    la = _swap_log_alpha(betas, ll_left, ll_right, pair_id, T)
    u = random.uniform(random.fold_in(key, pair_id))
    accept = (is_left | is_right) & (jnp.log(u) < la)

    swap_tree = {f: getattr(s, f) for f in _SWAP_FIELDS}
    from_next = jax.tree.map(
        lambda x: lax.ppermute(x, axis, perm_from_next), swap_tree)
    from_prev = jax.tree.map(
        lambda x: lax.ppermute(x, axis, perm_from_prev), swap_tree)
    take_next = accept & is_left
    take_prev = accept & is_right
    new = jax.tree.map(
        lambda own, nx, pv: jnp.where(take_next, nx,
                                      jnp.where(take_prev, pv, own)),
        swap_tree, from_next, from_prev)
    s = s._replace(**new)
    acc = jnp.where(is_left & accept, 1.0, 0.0)
    att = jnp.where(is_left, 1.0, 0.0)
    return s, acc, att


def run_pt_sharded(setup: BayesSetup, states, betas, swap_key,
                   cfg: PTConfig, mesh):
    """Parallel tempering with one replica per device over ``mesh``.

    Identical transition/swap randomness to ``run_pt`` (tested equal); the
    only cross-device traffic is the nearest-neighbor ``ppermute`` exchange
    of a scalar log-likelihood plus, on accepted swaps, the ~(20 + proj)
    floats of the replica position — ICI-friendly by construction.
    """
    from jax import shard_map

    betas = jnp.asarray(betas, jnp.float32)
    T = int(betas.shape[0])
    if mesh.devices.size != T:
        raise ValueError('run_pt_sharded wants one temperature per device '
                         '(got {} temps over {} devices)'.format(
                             T, mesh.devices.size))
    axis = mesh.axis_names[0]

    def device_fn(states1, betas_all, key):
        s = jax.tree.map(lambda x: x[0], states1)     # local shard size 1
        rank = lax.axis_index(axis)
        b = betas_all[rank]

        def one_round(carry, r):
            s, att, acc = carry
            s, traces = _advance(setup, s, b, cfg)
            s, pa, pt_att = _swap_step_collective(
                s, betas_all, random.fold_in(key, r), r % 2, rank, T, axis)
            return (s, att + pt_att, acc + pa), traces

        (s, att, acc), traces = lax.scan(
            one_round, (s, jnp.zeros(()), jnp.zeros(())),
            jnp.arange(cfg.n_rounds))
        traces = traces.reshape(cfg.n_rounds * cfg.swap_every, -1)
        out = jax.tree.map(lambda x: x[None], s)
        return out, traces[None], att[None], acc[None]

    f = shard_map(device_fn, mesh=mesh,
                  in_specs=(P(axis), P(), P()),
                  out_specs=(P(axis), P(axis), P(axis), P(axis)),
                  check_vma=False)
    sharding = NamedSharding(mesh, P(axis))
    states = jax.tree.map(lambda x: jax.device_put(x, sharding), states)
    states, traces, att, acc = jax.jit(f)(states, betas, swap_key)
    # per-device counters hold the pair whose LEFT member lives there;
    # device T-1 is never a left, so the first T-1 entries are the ladder
    return states, traces, {'swap_attempts': att[:T - 1],
                            'swap_accepts': acc[:T - 1]}
