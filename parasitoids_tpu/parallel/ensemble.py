"""Sharded ensemble forward simulation (prior/posterior predictive).

The reference can only study parameter uncertainty by re-running `Run.py`
per parameter set (or one-at-a-time inside PyMC); here a whole batch of
parameter vectors runs data-parallel: ``vmap`` over the parameter axis on
one chip, and the same axis placed on a ``jax.sharding.Mesh`` spreads the
ensemble across chips with zero collectives (each member is an independent
forward simulation — the embarrassingly parallel axis the hardware wants).

Typical use: posterior-predictive projections from MCMC draws for
CompareToData-style figures, or prior-predictive coverage checks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..bayes.model import BayesSetup
from ..bayes.sampler import _as_model

__all__ = ['ensemble_projections', 'ensemble_fields']


# Ensemble members run through ``lax.map``, not ``vmap``: a batched theta
# axis batches the BVN integrator's rho ``lax.switch``, which then executes
# every branch (measured 33x/member slowdown; see parallel/chains.py).
# Cross-device parallelism comes from ``shard_map``; per-device members run
# sequentially at full single-stream speed.


@partial(jax.jit, static_argnames=('setup',))
def _proj_batch(setup, thetas):
    return jax.lax.map(
        lambda th: setup.forward_projections(_as_model(th)), thetas)


def _shard(x, mesh):
    if mesh is None:
        return x
    return jax.device_put(x, NamedSharding(mesh, P(mesh.axis_names[0])))


def _sharded_map(fn, thetas, mesh):
    """Map ``fn`` over the leading axis of ``thetas`` with the axis sharded
    over ``mesh``.  A batch that doesn't divide the device count is padded
    (repeating the last row) and the padding stripped from the result, so
    any draw count works on any mesh."""
    from jax import shard_map

    B = thetas.shape[0]
    n_dev = int(np.prod(list(mesh.shape.values())))
    pad = (-B) % n_dev
    if pad:
        thetas = jnp.concatenate(
            [thetas, jnp.broadcast_to(thetas[-1:],
                                      (pad,) + thetas.shape[1:])])
    spec = P(mesh.axis_names[0])
    f = shard_map(lambda th: jax.lax.map(fn, th), mesh=mesh,
                  in_specs=spec, out_specs=spec, check_vma=False)
    out = jax.jit(f)(_shard(thetas, mesh))
    if pad:
        out = jax.tree.map(lambda a: a[:B], out)
    return out


def ensemble_projections(setup: BayesSetup, thetas, mesh=None):
    """Observation projections for a batch of model-parameter vectors.

    Args:
        setup: BayesSetup (defines site, domain, data alignment).
        thetas: (B, 15) model-parameter blocks (e.g. posterior draws).
        mesh: optional 1-D device mesh; the batch axis is sharded over it
            (padded internally to a multiple of the device count).
    Returns:
        (release, sentinel, grid) projection batches, leading axis B.

    Limitation: members run without a pre-spread day (sprd_factor=None).
    Every sampler CLI fits with use_sprd=False (matching Bayes_Run, where
    sprd is disabled), so CLI-produced traces are exact; library users
    who fit VI/MAP with use_sprd=True should note their sprd column is
    not applied in these ensemble projections.
    """
    thetas = jnp.asarray(thetas)
    if mesh is not None:
        return _sharded_map(
            lambda th: setup.forward_projections(_as_model(th)),
            thetas, mesh)
    return _proj_batch(setup, thetas)


def _fields_one(setup):
    from ..models.solver import propagate_pop
    from ..ops.daily_kernel import build_daily_kernel
    from jax import lax

    s = setup.setup

    def one(theta):
        m = _as_model(theta)
        n_per = jnp.round(m.n_periods).astype(jnp.int32)

        def day(_, d):
            start = jnp.where(d == 0, jnp.int32(s.start_idx), 0)
            pmf, _ = build_daily_kernel(
                s.wind_flat, s.wind_cumsum, d, m.hparams(), m.Dparams(),
                m.Dlparams(), m.mu_r, n_per, s.rad_dist, start, s.kcfg)
            return None, pmf

        _, kernels = lax.scan(day, None,
                              jnp.arange(setup.ndays, dtype=jnp.int32))
        return propagate_pop(kernels, setup.r_dur, setup.r_number,
                             setup.dist_weights, s.scfg)

    return one


@partial(jax.jit, static_argnames=('setup',))
def _fields_batch(setup, thetas):
    return jax.lax.map(_fields_one(setup), thetas)


def ensemble_fields(setup: BayesSetup, thetas, mesh=None):
    """Full per-day population fields for a batch of parameter vectors —
    (B, ndays, D, D).  Memory scales with B·ndays·D²; prefer
    :func:`ensemble_projections` unless the fields themselves are needed."""
    thetas = jnp.asarray(thetas)
    if mesh is not None:
        return _sharded_map(_fields_one(setup), thetas, mesh)
    return _fields_batch(setup, thetas)
