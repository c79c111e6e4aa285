"""n_periods posterior marginal cross-check (VERDICT r4 item 5).

The reference's flagship MCMC samples ``n_periods`` as a Poisson(30)
stochastic (Bayes_Run.py:130,186-196); this repo's flagship NUTS runs had
so far pinned n = 30.  The round-5 flagship frees it via Gibbs-within-NUTS
(``--gibbs-n``); this script cross-checks that marginal against the AM
sampler's independent discrete walk on the same posterior
(runs/kalbar_am_negbin.npz rounds the n slot in its block proposal).

Agreement metric: total-variation distance between the two integer
histograms, plus means/sds.  Writes runs/n_periods_marginal.json and a
histogram png.  CPU-safe.

Usage: python scripts/analyze_n_marginal.py [nuts_store] [am_store]
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

N_SLOT = 13


def marginal(store, burn_frac=0.0):
    with np.load(store) as d:
        tr = np.asarray(d['traces'])
    n = np.rint(tr[:, int(burn_frac * tr.shape[1]):, N_SLOT]).astype(int)
    return n.ravel()


def main():
    nuts_store = sys.argv[1] if len(sys.argv) > 1 else \
        'runs/nuts_r5_negbin.npz'
    am_store = sys.argv[2] if len(sys.argv) > 2 else \
        'runs/kalbar_am_negbin.npz'

    n_nuts = marginal(nuts_store)
    # the AM store's first draws predate covariance adaptation; drop 20%
    n_am = marginal(am_store, burn_frac=0.2)

    lo = int(min(n_nuts.min(), n_am.min()))
    hi = int(max(n_nuts.max(), n_am.max()))
    grid = np.arange(lo, hi + 1)
    p_nuts = np.array([(n_nuts == k).mean() for k in grid])
    p_am = np.array([(n_am == k).mean() for k in grid])
    tv = 0.5 * np.abs(p_nuts - p_am).sum()

    out = {
        'nuts_store': nuts_store, 'am_store': am_store,
        'nuts': {'mean': round(float(n_nuts.mean()), 3),
                 'sd': round(float(n_nuts.std()), 3),
                 'n_draws': int(n_nuts.size),
                 'range': [int(n_nuts.min()), int(n_nuts.max())]},
        'am': {'mean': round(float(n_am.mean()), 3),
               'sd': round(float(n_am.std()), 3),
               'n_draws': int(n_am.size),
               'range': [int(n_am.min()), int(n_am.max())]},
        'support': [lo, hi],
        'pmf_nuts': [round(float(p), 5) for p in p_nuts],
        'pmf_am': [round(float(p), 5) for p in p_am],
        'total_variation': round(float(tv), 4),
        'prior': 'Poisson(30) (Bayes_Run.py:130)',
    }
    path = 'runs/n_periods_marginal.json'
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('n_periods marginal: NUTS-gibbs {:.2f} +/- {:.2f} vs AM '
          '{:.2f} +/- {:.2f}; TV distance {:.3f}'.format(
              out['nuts']['mean'], out['nuts']['sd'],
              out['am']['mean'], out['am']['sd'], tv))
    print('wrote', path)

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.bar(grid - 0.2, p_nuts, width=0.4, label='NUTS (gibbs-n)')
        ax.bar(grid + 0.2, p_am, width=0.4, label='AM (discrete walk)')
        ax.set_xlabel('n_periods')
        ax.set_ylabel('posterior probability')
        ax.set_title('n_periods marginal, Kalbar 801$^2$ negbin '
                     '(TV = {:.3f})'.format(tv))
        ax.legend()
        fig.tight_layout()
        fig.savefig('runs/n_periods_marginal.png', dpi=120)
        print('wrote runs/n_periods_marginal.png')
    except Exception as e:                                   # noqa: BLE001
        print('plot skipped:', e)


if __name__ == '__main__':
    main()
