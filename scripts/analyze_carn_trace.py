"""Append truth-comparison diagnostics for a recorded Carnarvon trace to
``carn_study/summary.json`` (same statistics as scripts/run_carnarvon_fit.py
computes inline: R-hat, ESS, truth z-scores, posterior means).

Usage: python scripts/analyze_carn_trace.py <store.npz> <block_name>
e.g.   python scripts/analyze_carn_trace.py carn_study/pt.npz pt

Works on any store written by ``parasitoids_tpu.bayes.run`` against
``dataset=carnarvon`` (AM/PT/SMC traces all share the layout: model block
+ obs block + sentinel probs + logpost).  CPU is fine — no forward sims.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    store, block = sys.argv[1], sys.argv[2]
    from parasitoids_tpu.bayes.diagnostics import (effective_sample_size,
                                                   gelman_rubin)
    from parasitoids_tpu.bayes.priors import (MODEL_PARAM_NAMES,
                                              OBS_PARAM_NAMES)

    with open('data/carnarvon_truth.json') as f:
        truth = json.load(f)
    with np.load(store if store.endswith('.npz') else store + '.npz') as d:
        tr = d['traces']
    if tr.ndim == 2:
        tr = tr[None]

    summary_path = 'carn_study/summary.json'
    with open(summary_path) as f:
        summary = json.load(f)
    names = [n for n in summary['truth']]
    truth_vec = np.array([truth['model'][n] for n in MODEL_PARAM_NAMES]
                         + truth['obs'])
    assert len(names) == len(truth_vec)

    tr = tr[:, :, :len(names)]
    rhat = (np.atleast_1d(gelman_rubin(tr)) if tr.shape[0] > 1
            else np.full(len(names), np.nan))
    flat = tr.reshape(-1, tr.shape[-1])
    mean, sd = flat.mean(0), flat.std(0)
    z = np.abs(mean - truth_vec) / np.maximum(sd, 1e-12)
    ess = [float(effective_sample_size(flat[:, j]))
           for j in (names.index('sig_x'), names.index('g_aw'),
                     names.index('mu_r'))]
    summary[block] = {
        'draws': int(flat.shape[0]),
        'max_rhat': (round(float(np.nanmax(rhat)), 3)
                     if np.isfinite(rhat).any() else None),
        'ess_sig_x_g_aw_mu_r': [round(e, 1) for e in ess],
        'truth_z': {n: round(float(v), 2) for n, v in zip(names, z)},
        'frac_within_2sd': round(float(np.mean(z < 2)), 3),
        'posterior_mean': {n: round(float(v), 4)
                           for n, v in zip(names, mean)},
    }
    with open(summary_path, 'w') as f:
        json.dump(summary, f, indent=1)
    print('[{}] draws {}, max R-hat {}, {}/{} within 2 sd, '
          'ESS(sig_x,g_aw,mu_r) {}'.format(
              block, flat.shape[0], summary[block]['max_rhat'],
              int(np.sum(z < 2)), len(z), ess))
    print('updated', summary_path)


if __name__ == '__main__':
    main()
