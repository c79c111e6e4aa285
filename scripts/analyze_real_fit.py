"""Diagnostics + predictive checks for the REAL-data Carnarvon fit.

Unlike the synthetic-truth Carnarvon study (scripts/analyze_carn_trace.py)
there is no truth vector here — the observations are the actual field
record (data/carnarvonearlemergence.txt via the dataset=carnreal site,
scripts/make_carnarvon_real_site.py).  This writes
``carn_study/real/summary.json`` with convergence diagnostics (R-hat,
per-parameter ESS, posterior mean/sd) and the >= 100-draw posterior-
predictive p-value table against the field counts, plus the predictive
overlay png.  Model-vs-data role of the reference's CompareToData.py,
applied to the one dataset the reference itself cannot fit
(Data_Import.py:491-492).

Usage: python scripts/analyze_real_fit.py carn_study/real/nuts.npz
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

DOMAIN = 'domain_info=(10000.0,200)'


def main():
    store = sys.argv[1]
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from parasitoids_tpu.bayes.diagnostics import (effective_sample_size,
                                                   gelman_rubin)
    from parasitoids_tpu.bayes.predictive import (plot_predictive,
                                                  posterior_predictive,
                                                  predictive_pvalues,
                                                  pvalue_report)
    from parasitoids_tpu.bayes.priors import (MODEL_PARAM_NAMES,
                                              OBS_PARAM_NAMES)
    from parasitoids_tpu.bayes.run import build_setup
    from parasitoids_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    path = store if store.endswith('.npz') else store + '.npz'
    with np.load(path) as d:
        tr = np.asarray(d['traces'], float)
    if tr.ndim == 2:
        tr = tr[None]

    setup = build_setup(['dataset=carnreal', DOMAIN])
    names = (list(MODEL_PARAM_NAMES) + list(OBS_PARAM_NAMES)
             + ['sent_obs_prob_{}'.format(k)
                for k in setup.locinfo.sent_ids])
    dim = len(names)
    tr = tr[:, :, :dim + 1]                        # + logpost column

    rhat = (gelman_rubin(tr[:, :, :dim]) if tr.shape[0] > 1 else None)
    flat = tr.reshape(-1, tr.shape[-1])
    ess = np.array([sum(effective_sample_size(tr[c, :, j])
                        for c in range(tr.shape[0]))
                    for j in range(dim)])
    mean, sd = flat.mean(0), flat.std(0)

    # The carnreal site has sentinel channels only; parameters whose data
    # channel is absent (em_obs_prob: release-field emergence,
    # grid_obs_prob: grid samples) get zero likelihood gradient, and the
    # dense Laplace metric built from the ill-conditioned MAP Hessian can
    # freeze them (within-chain sd at f32 epsilon).  R-hat on a frozen
    # coordinate measures metric pathology, not posterior disagreement —
    # report them separately so the convergence headline covers the
    # data-informed parameters.
    within_sd = tr[:, :, :dim].std(axis=1).mean(axis=0)
    scale = np.maximum(np.abs(mean[:dim]), 1e-12)
    # BOTH conditions (ADVICE r3): the relative test alone would silently
    # exclude a genuinely well-sampled but tight coordinate from the
    # *_informed headline; the absolute f32-epsilon floor pins 'frozen'
    # to the actual pathology (moves at float32 resolution).  With the
    # round-4 blended metric (map_fit.blend_prior_metric) this set should
    # be empty — its size is itself a diagnostic.
    frozen = (within_sd / scale < 1e-4) & (within_sd < 1e-5)
    informed = ~frozen

    pred = posterior_predictive(setup, tr[:, :, :dim], n_draws=draws,
                                seed=0)
    pv = predictive_pvalues(setup, pred)
    print(pvalue_report(pv))
    png = path[:-4] + '_predictive.png'
    plot_predictive(setup, pred, png)

    summary = {
        'data': 'REAL field record data/carnarvonearlemergence.txt '
                '(12 stations x 11 dates, 124 wasps) — exposure protocol',
        'geometry_assumption': 'station positions are NOT published in the '
                               'repo: S0 at the release point, others on a '
                               '500 m ring (make_carnarvon_real_site.py); '
                               'directional conclusions out of scope',
        'store': path,
        'date': time.strftime('%Y-%m-%d'),
        'chains': int(tr.shape[0]),
        'draws_per_chain': int(tr.shape[1]),
        'max_rhat': (round(float(np.nanmax(rhat)), 3)
                     if rhat is not None else None),
        'min_ess': round(float(ess.min()), 1),
        'median_ess': round(float(np.median(ess)), 1),
        'frozen_params': [n for n, fz in zip(names, frozen) if fz],
        'frozen_note': 'non-moving coordinates (excluded from *_informed '
                       'stats): n_periods is fixed at 30 under NUTS by '
                       'design (reference Bayes_MAP.py:144-147).  Any '
                       'OTHER entry here indicates a metric pathology — '
                       'round 3 froze em/grid_obs_prob this way; the '
                       'round-4 blended metric (map_fit.blend_prior_'
                       'metric) restores channel-less parameters to '
                       'prior-scale sampling, so the expected list is '
                       "['n_periods'] exactly.",
        'max_rhat_informed': (round(float(np.nanmax(rhat[informed])), 3)
                              if rhat is not None and informed.any()
                              else None),
        'min_ess_informed': (round(float(ess[informed].min()), 1)
                             if informed.any() else None),
        'median_ess_informed': (round(float(np.median(ess[informed])), 1)
                                if informed.any() else None),
        'ess': {n: round(float(e), 1) for n, e in zip(names, ess)},
        'posterior_mean': {n: round(float(m), 5)
                           for n, m in zip(names, mean)},
        'posterior_sd': {n: round(float(s), 5) for n, s in zip(names, sd)},
        'ppc_draws': draws,
        'ppc_pvalues': pv,
        'predictive_png': png,
    }
    out = os.path.join(os.path.dirname(path), 'summary.json')
    tmp = out + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(summary, f, indent=1)
    os.replace(tmp, out)
    print('max R-hat: {} (informed {})  min ESS: {:.1f} (informed {})  '
          'median ESS: {:.1f}'.format(
              summary['max_rhat'], summary['max_rhat_informed'],
              ess.min(), summary['min_ess_informed'], np.median(ess)))
    if summary['frozen_params']:
        print('frozen (no data channel):', summary['frozen_params'])
    print('wrote', out, 'and', png)


if __name__ == '__main__':
    main()
