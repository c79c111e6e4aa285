"""MCMC trace persistence with resume (L4 support).

The reference stores traces in a PyMC HDF5 database opened in append mode
and resumes chains from it (Bayes_Run.py:484-537).  We store traces plus
the complete sampler state (positions, cached moments, proposal adaptation,
RNG key) in an ``.npz``, so a resumed run continues *exactly* where the
previous one stopped — including the adaptive-proposal state, which the
reference also persists via PyMC's database.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from .sampler import ChainState

__all__ = ['save_chain', 'load_chain', 'load_extras', 'append_traces']

_STATE_FIELDS = ('m', 'o', 'loglik', 'prior_m', 'prior_o', 'key', 'count',
                 'mean', 'm2', 'accepts_m', 'accepts_o', 'log_scale')


def save_chain(path, traces, state: ChainState, meta=None, extra=None):
    """Write traces (n_chains, n_samples, dim) + sampler state.  Projections
    are not stored; they are recomputed on resume (one forward sim).

    ``extra``: optional dict of additional arrays stored alongside (prefixed
    ``x_`` in the npz; read back with ``load_extras``) — the tempering
    driver keeps its beta ladder and per-replica log-likelihood traces
    there so ``log_evidence`` can be recomputed from a saved run.
    """
    if path.endswith('.npz'):
        path = path[:-4]
    d = os.path.dirname(path)
    if d and not os.path.exists(d):
        os.makedirs(d)
    payload = {'traces': np.asarray(traces)}
    for f in _STATE_FIELDS:
        payload['state_' + f] = np.asarray(getattr(state, f))
    for k, v in (extra or {}).items():
        payload['x_' + k] = np.asarray(v)
    # write-temp-then-rename: a SIGTERM/timeout landing mid-write must never
    # truncate the store a resume loop depends on (os.replace is atomic on
    # POSIX); same for the meta sidecar the loop reads its beta from
    tmp = path + '.tmp.npz'
    np.savez(tmp, **payload)
    os.replace(tmp, path + '.npz')
    tmp_meta = path + '.meta.json.tmp'
    with open(tmp_meta, 'w') as fh:
        json.dump(meta or {}, fh)
    os.replace(tmp_meta, path + '.meta.json')


def load_extras(path):
    """Read back the ``extra`` arrays stored by ``save_chain``."""
    if not path.endswith('.npz'):
        path = path + '.npz'
    with np.load(path) as npz:
        return {k[2:]: npz[k] for k in npz.files if k.startswith('x_')}


def load_chain(path, setup):
    """Load traces and rebuild the chain state (re-evaluating the cached
    forward projections at the stored position)."""
    from .sampler import _as_model, _as_obs
    if not path.endswith('.npz'):
        path = path + '.npz'
    with np.load(path) as npz:
        traces = npz['traces']
        fields = {}
        for f in _STATE_FIELDS:
            if 'state_' + f in npz:
                fields[f] = jnp.asarray(npz['state_' + f])
            elif f == 'log_scale':   # stores written before scale adaptation
                fields[f] = jnp.zeros(np.asarray(npz['state_count']).shape,
                                      jnp.float32)
            else:
                raise KeyError('state_' + f)
    meta_path = path[:-4] + '.meta.json'
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)

    def rebuild(m, o, **kw):
        proj = setup.forward_projections(_as_model(m))
        return ChainState(m=m, o=o, proj=proj, **kw)

    rest = {f: fields[f] for f in _STATE_FIELDS if f not in ('m', 'o')}
    if fields['m'].ndim == 2:     # stacked chains
        # lax.map, not vmap: a chain-batched forward pass pays every rho
        # lax.switch branch via select (~33x/chain, parallel/chains.py);
        # sequential per-chain evaluation is what the samplers use too
        import jax
        state = jax.lax.map(lambda args: rebuild(args[0], args[1],
                                                 **args[2]),
                            (fields['m'], fields['o'], rest))
    else:
        state = rebuild(fields['m'], fields['o'], **rest)
    return traces, state, meta


def append_traces(old, new):
    return np.concatenate([np.asarray(old), np.asarray(new)], axis=-2)
