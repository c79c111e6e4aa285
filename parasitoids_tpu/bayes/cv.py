"""Exact leave-one-group-out cross-validation by refitting (L4 analysis).

PSIS-LOO (bayes/loo.py) estimates held-out predictive density from ONE
posterior sample by importance reweighting; when a group carries real
information the weights degenerate (``khat > 0.7``) and the estimate is
untrustworthy.  The honest fallback (Vehtari, Gelman & Gabry 2017, sec. 2.3)
is to actually refit without the group and score it directly:

    elpd_g = log E_{theta ~ p(theta | y_{-g})} [ p(y_g | theta) ]

Each fold's refit target is the masked likelihood
(``BayesSetup.split_point_mask`` passed as ``run_smc``'s traced
``obs_mask`` operand, so every fold shares ONE compiled program; priors
and forward model untouched), sampled with adaptive tempered SMC
(bayes/smc.py) — the right tool here because every fold is an independent
prior-to-posterior anneal with device-sharded particles and no warmup
tuning to hand-hold.  The held-out density is then a weighted average
over the final particle population, whose cached forward projections make
the extra evaluation free of any new simulation.

The reference has no cross-validation machinery of any kind.

CLI: ``python -m parasitoids_tpu.bayes.cv --group block [--folds 0,2] [k=v...]``
"""

from __future__ import annotations

import numpy as np

from .loo import point_groups
from .model import BayesSetup

__all__ = ['exact_logo_cv', 'held_out_elpd']


def held_out_elpd(setup: BayesSetup, payload, member_cols):
    """log E_post[p(y_g | theta)] from an SMC payload's weighted particles.

    Uses the particles' cached projections (ChainState.proj) — no new
    forward simulations."""
    import jax
    from scipy.special import logsumexp

    from .sampler import _as_obs

    states = payload['states']
    logw = np.asarray(payload['logw'], np.float64)

    def pointwise(proj, o_vec):
        return setup.pointwise_loglik(proj, _as_obs(o_vec, setup.n_sent))

    ll = np.asarray(jax.vmap(pointwise)(states.proj, states.o), np.float64)
    group_ll = ll[:, member_cols].sum(axis=1)
    logw = logw - logsumexp(logw)
    return float(logsumexp(logw + group_ll)), group_ll


def exact_logo_cv(setup: BayesSetup, by='block', folds=None, seed=0,
                  smc_config=None, mesh=None, verbose=False):
    """Refit-based leave-one-group-out elpd.

    Args:
        setup: full-data BayesSetup.
        by: 'date' or 'block' grouping (loo.point_groups).
        folds: iterable of group indices to hold out (default: all) — in
            practice, the groups PSIS-LOO flagged with high khat.
        smc_config: SMCConfig for each fold's refit (default: 128
            particles, 3 moves/stage).
        mesh: optional device mesh; particles shard over it per fold.
    Returns:
        dict with per-fold labels, exact elpd values, the refit logZ per
        fold, and the total over evaluated folds.
    """
    from jax import random

    from .smc import SMCConfig, run_smc

    gids, labels = point_groups(setup, by=by)
    if folds is None:
        folds = range(len(labels))
    folds = list(folds)
    bad = [g for g in folds if not 0 <= g < len(labels)]
    if bad:
        raise ValueError('fold indices {} out of range: {} groups ({})'
                         .format(bad, len(labels),
                                 ', '.join(labels[:8])))
    cfg = smc_config or SMCConfig(n_particles=128, n_moves=3)

    out = {'group': by, 'folds': folds, 'labels': [labels[g] for g in folds],
           'elpd': [], 'logz': []}
    for i, g in enumerate(folds):
        keep = gids != g
        # traced mask on the SHARED setup: every fold reuses one compiled
        # SMC program (a with_held_out copy per fold would recompile the
        # whole forward model each time — minutes per fold at full scale)
        mask = setup.split_point_mask(keep)
        if verbose:
            print('fold {}/{}: hold out {} ({} obs)...'.format(
                i + 1, len(folds), labels[g], int((~keep).sum())),
                flush=True)
        payload = run_smc(setup, random.PRNGKey(seed + 1000 * g), cfg,
                          mesh=mesh, seed=seed + g, verbose=verbose,
                          obs_mask=mask)
        elpd_g, _ = held_out_elpd(setup, payload, np.where(~keep)[0])
        out['elpd'].append(elpd_g)
        out['logz'].append(float(payload['logz']))
        if verbose:
            print('fold {}: elpd {:.3f} (refit logZ {:.2f})'.format(
                labels[g], elpd_g, payload['logz']), flush=True)
    out['elpd_total'] = float(np.sum(out['elpd']))
    return out


def main(argv=None):
    import argparse
    import json

    import jax

    from ..utils.cache import enable_compilation_cache
    from .run import build_setup
    from .smc import SMCConfig

    ap = argparse.ArgumentParser(
        prog='parasitoids_tpu.bayes.cv',
        description='exact leave-one-group-out CV by SMC refits')
    ap.add_argument('--group', choices=['date', 'block'], default='block')
    ap.add_argument('--folds', default=None,
                    help='comma-separated group indices (default: all)')
    ap.add_argument('--particles', type=int, default=128)
    ap.add_argument('--moves', type=int, default=3)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--out', default='logo_cv.json')
    ap.add_argument('overrides', nargs='*',
                    help='key=value Params overrides matching the run')
    args = ap.parse_args(argv)
    enable_compilation_cache()
    setup = build_setup(args.overrides)

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and args.particles % n_dev == 0:
        from ..parallel.chains import chain_mesh
        mesh = chain_mesh()

    folds = ([int(x) for x in args.folds.split(',')]
             if args.folds else None)
    res = exact_logo_cv(
        setup, by=args.group, folds=folds, seed=args.seed,
        smc_config=SMCConfig(n_particles=args.particles,
                             n_moves=args.moves),
        mesh=mesh, verbose=True)
    print('exact LOGO-CV elpd over {} folds: {:.3f}'.format(
        len(res['folds']), res['elpd_total']))
    with open(args.out, 'w') as fh:
        json.dump(res, fh)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
