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
    from parasitoids_tpu.bayes.diagnostics import truth_diagnostics
    from parasitoids_tpu.bayes.priors import MODEL_PARAM_NAMES

    with open('data/carnarvon_truth.json') as f:
        truth = json.load(f)
    with np.load(store if store.endswith('.npz') else store + '.npz') as d:
        tr = d['traces']

    summary_path = 'carn_study/summary.json'
    with open(summary_path) as f:
        summary = json.load(f)
    names = [n for n in summary['truth']]
    truth_vec = np.array([truth['model'][n] for n in MODEL_PARAM_NAMES]
                         + truth['obs'])
    assert len(names) == len(truth_vec)

    summary[block] = stats = truth_diagnostics(tr, names, truth_vec)
    with open(summary_path, 'w') as f:
        json.dump(summary, f, indent=1)
    print('[{}] draws {}, max R-hat {}, {}/{} within 2 sd, '
          'ESS(sig_x,g_aw,mu_r) {}'.format(
              block, stats['draws'], stats['max_rhat'],
              sum(v < 2 for v in stats['truth_z'].values()), len(names),
              stats['ess_sig_x_g_aw_mu_r']))
    print('updated', summary_path)


if __name__ == '__main__':
    main()
