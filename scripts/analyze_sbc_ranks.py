"""Root-cause analysis of SBC rank anomalies: artifact vs defect.

Discriminates the two explanations for non-uniform SBC ranks
(VERDICT r2 item 1) with statistics computed FROM the recorded ranks:

1. **Replicate co-occurrence.** If the sampler were biased in a
   parameter (a defect), that parameter's ranks would skew across ALL
   replicates independently of the others.  If instead a fraction of
   replicates mix too slowly for the chain window (the finite-chain
   artifact of Talts et al. 2018 §5.1), extreme ranks CO-OCCUR: a
   slow-mixing posterior pins the whole correlated block at extreme
   ranks simultaneously.  The per-replicate count of extreme-decile
   parameters is compared to its independence reference (Binomial);
   massive over-dispersion = replicate-level artifact.
2. **Directional mean shift.** A real bias moves the MEAN normalized
   rank of a parameter away from 1/2 by more than its standard error; a
   variance artifact (edge-piling, center-peaking) does not.
3. **Center-vs-edge mass.** Pooled-unconverged-chain draws are
   OVERdispersed -> center-peaked ranks (the multichain arm);
   single-excursion windows are UNDERdispersed -> edge-piled ranks
   (the long arm).  The tail-mass statistic labels each histogram.

Writes ``<outdir>/rank_analysis_<tag>.json`` quoted by docs/SBC.md.

Usage: python scripts/analyze_sbc_ranks.py sbc_study/sbc_am_ranks.npz am
"""

import json
import os
import sys

import numpy as np
from scipy import stats

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def analyze(ranks, L, names):
    R, dim = ranks.shape
    u = (ranks + 0.5) / (L + 1)               # normalized ranks in (0,1)

    # --- 1. co-occurrence of extreme ranks --------------------------------
    extreme = (u < 0.1) | (u > 0.9)           # both deciles
    per_rep = extreme.sum(axis=1)
    p0 = extreme.mean()
    # variance ratio vs Binomial(dim, p0); >> 1 = replicate-clustered
    var_ratio = float(per_rep.var() / max(dim * p0 * (1 - p0), 1e-12))
    worst = np.argsort(-per_rep)[:5]

    # --- 2. directional mean shift per parameter --------------------------
    # SE of the mean of Uniform(0,1) over R replicates = 1/sqrt(12 R)
    se = 1.0 / np.sqrt(12.0 * R)
    shift_z = (u.mean(axis=0) - 0.5) / se

    # --- 3. edge-vs-center mass per parameter ------------------------------
    # expected mass in the union of the two extreme deciles = 0.2
    edge = ((u < 0.1) | (u > 0.9)).mean(axis=0)
    edge_se = np.sqrt(0.2 * 0.8 / R)
    edge_z = (edge - 0.2) / edge_se           # >0 edge-piled, <0 center-peaked

    return {
        'replicates': int(R), 'dim': int(dim), 'L': int(L),
        'extreme_fraction': round(float(p0), 4),
        'co_occurrence_var_ratio': round(var_ratio, 2),
        'co_occurrence_note': 'ratio of Var(#extreme params per replicate) '
                              'to its independence (Binomial) value; >> 1 '
                              'means extremeness clusters BY REPLICATE '
                              '(slow-mixing artifact), ~1 means it is '
                              'parameter-level (candidate defect)',
        'worst_replicates': {int(r): int(per_rep[r]) for r in worst},
        'mean_rank_shift_z': {n: round(float(z), 2)
                              for n, z in zip(names, shift_z)},
        'max_abs_shift_z': round(float(np.abs(shift_z).max()), 2),
        'edge_mass_z': {n: round(float(z), 2)
                        for n, z in zip(names, edge_z)},
        'shape': {n: ('edge-piled' if z > 3 else
                      'center-peaked' if z < -3 else 'uniform-ish')
                  for n, z in zip(names, edge_z)},
    }


def main():
    path, tag = sys.argv[1], sys.argv[2]
    outdir = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(path)
    with np.load(path, allow_pickle=True) as d:
        ranks = np.asarray(d['ranks'])
        if 'done' in d.files:
            ranks = ranks[:int(d['done'])]
        L = int(d['L'])
        names = [str(n) for n in d['names']]
    res = analyze(ranks, L, names)
    res['source'] = path
    out = os.path.join(outdir, 'rank_analysis_{}.json'.format(tag))
    with open(out + '.tmp', 'w') as f:
        json.dump(res, f, indent=1)
    os.replace(out + '.tmp', out)
    print('[{}] R={} co-occurrence var ratio {:.1f}; max |mean-shift z| '
          '{:.2f}; shapes: {} edge-piled, {} center-peaked, {} uniform-ish'
          .format(tag, res['replicates'], res['co_occurrence_var_ratio'],
                  res['max_abs_shift_z'],
                  sum(v == 'edge-piled' for v in res['shape'].values()),
                  sum(v == 'center-peaked' for v in res['shape'].values()),
                  sum(v == 'uniform-ish' for v in res['shape'].values())))
    print('wrote', out)


if __name__ == '__main__':
    main()
