"""Posterior-shift table: Poisson flagship vs negbin flagship (VERDICT r4
item 2).

The repo's own model comparison prefers the negative-binomial observation
model (+63.2 +/- 17.7 elpd, runs/northstar_am_loo.json); this script
quantifies what that change does to the PHYSICAL parameter posteriors so
the science conclusions can be restated under the preferred likelihood.

Inputs: the Poisson 801^2 ridge-NUTS chains (runs/nuts_r4.npz +
runs/nuts_r4b.npz, 4 chains x 1000 draws, n_periods pinned at 30) and the
negbin gibbs-n ridge-NUTS run (runs/nuts_r5_negbin.npz, 4 chains,
n_periods free).  Output: runs/negbin_shift_table.json + a printed
markdown table of mean +/- sd under each likelihood and the shift in
units of the Poisson posterior sd.

CPU-safe (no forward sims).
Usage: python scripts/make_negbin_shift_table.py [negbin_store]
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def pooled(stores):
    trs = []
    for p in stores:
        with np.load(p) as d:
            trs.append(np.asarray(d['traces']))
    n = min(t.shape[1] for t in trs)
    dim = min(t.shape[2] for t in trs)
    return np.concatenate([t[:, :n, :dim] for t in trs], axis=0)


def main():
    negbin_stores = sys.argv[1:] or ['runs/nuts_r5_negbin.npz',
                                     'runs/nuts_r5_negbinb.npz']
    negbin_stores = [p for p in negbin_stores if os.path.exists(p)]
    from parasitoids_tpu.bayes.priors import MODEL_PARAM_NAMES

    po = pooled(['runs/nuts_r4.npz', 'runs/nuts_r4b.npz'])
    nb = pooled(negbin_stores)
    names = list(MODEL_PARAM_NAMES)

    # physical (model-block) parameters; observation-layer params shift by
    # construction (negbin adds a dispersion channel) and are reported in
    # the PPC/LOO artifacts instead
    rows = {}
    print('| param | Poisson mean +/- sd | negbin mean +/- sd | shift '
          '(Poisson sd) |')
    print('|---|---|---|---|')
    for j, nm in enumerate(names):
        mp, sp = float(po[..., j].mean()), float(po[..., j].std())
        mn, sn = float(nb[..., j].mean()), float(nb[..., j].std())
        # a pinned Poisson-run parameter (sd 0: the fixed n_periods) has
        # no meaningful sd-normalized shift
        shift = (mn - mp) / sp if sp > 1e-9 else float('nan')
        note = ''
        if nm == 'n_periods':
            note = ' (pinned 30 vs gibbs-free)'
        rows[nm] = {'poisson': [round(mp, 4), round(sp, 4)],
                    'negbin': [round(mn, 4), round(sn, 4)],
                    'shift_in_poisson_sd': (round(shift, 2)
                                            if shift == shift else None)}
        print('| {}{} | {:.3f} +/- {:.3f} | {:.3f} +/- {:.3f} | '
              '{:+.2f} |'.format(nm, note, mp, sp, mn, sn, shift))

    big = {k: v['shift_in_poisson_sd'] for k, v in rows.items()
           if v['shift_in_poisson_sd'] is not None
           and abs(v['shift_in_poisson_sd']) >= 0.5 and k != 'n_periods'}
    out = {
        'poisson_stores': ['runs/nuts_r4.npz', 'runs/nuts_r4b.npz'],
        'negbin_stores': negbin_stores,
        'n_draws': {'poisson': int(po.shape[0] * po.shape[1]),
                    'negbin': int(nb.shape[0] * nb.shape[1])},
        'params': rows,
        'shifts_ge_half_sd': big,
    }
    path = 'runs/negbin_shift_table.json'
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('\nshifts >= 0.5 Poisson sd:', big or 'none')
    print('wrote', path)


if __name__ == '__main__':
    main()
