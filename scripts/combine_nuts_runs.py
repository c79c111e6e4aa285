"""Pooled diagnostics over several independent NUTS runs of the SAME
posterior: concatenate their chains (constrained-space traces) and report
the combined split R-hat / pooled ESS per parameter.

Different runs may use different whitening maps, metrics, or seeds —
irrelevant here: the traces compared are constrained-space draws of one
posterior, which is exactly the setting multi-chain R-hat assumes
(independent starts, shared target).

Usage:
  python scripts/combine_nuts_runs.py run1.npz run2.npz [...] -o out.json
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('stores', nargs='+')
    ap.add_argument('-o', '--out', default='combined_summary.json')
    ap.add_argument('--targets', default='100,1.01')
    args = ap.parse_args()
    t_ess, t_rhat = (float(x) for x in args.targets.split(','))

    from parasitoids_tpu.bayes.diagnostics import (effective_sample_size,
                                                   gelman_rubin)
    from parasitoids_tpu.viz.bayes_plot import _param_names

    trs = []
    n_min = None
    for p in args.stores:
        with np.load(p) as d:
            t = d['traces']
        trs.append(t)
        n_min = t.shape[1] if n_min is None else min(n_min, t.shape[1])
    # align draw counts (R-hat needs equal-length chains)
    tr = np.concatenate([t[:, :n_min] for t in trs], axis=0)
    names = _param_names(tr.shape[-1])[:-1]
    dim = len(names)
    ess = np.array([sum(effective_sample_size(tr[c, :, j])
                        for c in range(tr.shape[0]))
                    for j in range(dim)])
    rhat = np.atleast_1d(gelman_rubin(tr[:, :, :dim]))
    order = np.argsort(ess)
    out = {
        'stores': args.stores,
        'chains': int(tr.shape[0]),
        'draws_per_chain': int(n_min),
        'min_ess': round(float(ess.min()), 1),
        'min_ess_param': names[int(order[0])],
        'median_ess': round(float(np.median(ess)), 1),
        'max_rhat': round(float(np.nanmax(rhat)), 4),
        'max_rhat_param': names[int(np.nanargmax(rhat))],
        'per_param': {n: {'ess': round(float(ess[j]), 1),
                          'rhat': round(float(rhat[j]), 4)}
                      for j, n in enumerate(names)},
        'targets': {
            'min_ess>={:.0f}'.format(t_ess): bool(ess.min() >= t_ess),
            'max_rhat<={:g}'.format(t_rhat):
                bool(np.nanmax(rhat) <= t_rhat),
        },
    }
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != 'per_param'},
                     indent=1))
    print('5 slowest-mixing parameters:')
    for j in order[:5]:
        print('  {:>18s}  ESS {:>8}  R-hat {:.4f}'.format(
            names[int(j)], round(float(ess[j]), 1), float(rhat[j])))
    print('wrote', args.out)


if __name__ == '__main__':
    main()
