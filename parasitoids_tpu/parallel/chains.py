"""Multi-chain / multi-chip MCMC execution.

The reference runs a single sequential PyMC chain per process; parallel
chains meant parallel *processes* (SURVEY.md section 2: multiprocessing is
the only parallelism).  Here chains are a batch axis: ``vmap`` over chain
states runs them in lockstep on one chip, and placing the chain axis on a
``jax.sharding.Mesh`` runs them data-parallel across chips — the XLA SPMD
partitioner splits every per-chain array, and no collectives are needed
until diagnostics gather the traces.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import random
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bayes.model import BayesSetup
from ..bayes.sampler import (ChainState, MCMCConfig, init_chain_state,
                             run_mcmc)

__all__ = ['chain_mesh', 'init_chains', 'shard_chain_states', 'run_chains']


def chain_mesh(n_devices=None, devices=None):
    """1-D mesh over a ``chains`` axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ('chains',))


def init_chains(setup: BayesSetup, key, n_chains, jitter=0.05):
    """Initialize ``n_chains`` states with jittered starting points.

    Over-dispersed starts make Gelman–Rubin meaningful; model parameters are
    jittered multiplicatively, observation parameters start identically.
    """
    keys = random.split(key, n_chains)
    from ..bayes.priors import initial_model_params
    m0 = initial_model_params()
    states = []
    for i in range(n_chains):
        k_init, k_chain = random.split(keys[i])
        scale = 1.0 + jitter * np.asarray(
            random.normal(k_init, (len(m0),)))
        m_i = m0 * scale
        m_i[13] = 30.0   # keep the discrete n_periods at its prior mode
        states.append(init_chain_state(setup, k_chain, m0=m_i))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def shard_chain_states(states, mesh):
    """Place chain-stacked states with the chain axis over the mesh."""
    sharding = NamedSharding(mesh, P('chains'))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, states)


# Per-device, chains advance through ``lax.map`` (sequential), NOT ``vmap``:
# a chain-batched forward pass batches the BVN integrator's rho-dependent
# ``lax.switch``, and a batched-predicate switch lowers to executing EVERY
# branch with a select — measured 33x slower per chain than the scalar-rho
# program.  Sequential chains per device cost exactly N x single-chain;
# cross-device parallelism comes from ``shard_map`` over the mesh (each
# device runs its local chains unbatched).


@partial(jax.jit, static_argnames=('setup', 'cfg'))
def _run_chains(setup, states, cfg):
    return jax.lax.map(lambda s: run_mcmc(setup, s, cfg), states)


def run_chains(setup: BayesSetup, states, cfg: MCMCConfig, mesh=None):
    """Advance all chains; returns (states, traces (n_chains, n, dim)).

    With a mesh, the chain axis is sharded over devices (data-parallel);
    within a device, local chains run sequentially (see note above).
    """
    if mesh is None:
        return _run_chains(setup, states, cfg)
    from jax import shard_map

    spec = P('chains')
    f = shard_map(
        lambda st: jax.lax.map(lambda s: run_mcmc(setup, s, cfg), st),
        mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    states = shard_chain_states(states, mesh)
    return jax.jit(f)(states)
