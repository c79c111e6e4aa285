"""Mode decomposition of the SMC synthetic-Carnarvon posterior.

The nuts_r4 fit (carn_study/nuts_r4.npz) found two nearly-equal-log-
posterior regions of the take-off ridge (per-chain g_aw 1.29 +/- 0.43 vs
2.02 +/- 0.11) that a within-chain sampler cannot weigh against each
other.  The SMC population CAN: its final weighted particles carry each
mode's actual posterior mass.  This script reports

* the posterior weight of each g_aw mode — the weighted-particle estimate
  plus its resampled (quantization-noise) counterpart; the trace is drawn
  by resampling the same weighted particles, so the second number checks
  only resampling noise, NOT an independent systematic,
* per-mode posterior means/sds for every parameter,
* the per-mode agreement with the two NUTS chains (are the SMC modes the
  same two regions the chains found?),
* the SMC evidence estimate (log Z) and annealing-path health
  (stages, resampling count, final ESS).

Writes carn_study/smc_r4_modes.json.  CPU-safe: no forward sims.

Usage: python scripts/analyze_smc_modes.py carn_study/smc_r4.npz
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def logsumexp(x):
    x = np.asarray(x, np.float64)
    m = x.max()
    return m + np.log(np.exp(x - m).sum())


def main():
    store = sys.argv[1] if len(sys.argv) > 1 else 'carn_study/smc_r4.npz'
    from parasitoids_tpu.bayes.priors import MODEL_PARAM_NAMES

    with np.load(store) as d:
        traces = d['traces']          # (1, N, dim): m + o + logpost
        m = np.asarray(d['state_m'], np.float64)     # (N, 15) particles
        logw = np.asarray(d['x_logw'], np.float64)
        betas = np.asarray(d['x_betas'], np.float64)
        resampled = np.asarray(d['x_resampled'])
        ess_path = np.asarray(d['x_ess_path'], np.float64)
    with open(store.removesuffix('.npz') + '.meta.json') as f:
        meta = json.load(f)
    if meta.get('beta', 0.0) < 1.0:
        raise SystemExit('anneal incomplete (beta={}); nothing to '
                         'decompose'.format(meta.get('beta')))

    g_aw = m[:, 0]
    w = np.exp(logw - logsumexp(logw))

    # mode split: midpoint of the two NUTS chain means if available, else
    # the weighted-histogram valley
    thresh = 1.65
    nuts = 'carn_study/nuts_r4.npz'
    chains = None
    if os.path.exists(nuts):
        with np.load(nuts) as d:
            ctr = d['traces']        # (2, draws, dim)
        cm = ctr[..., 0].mean(axis=1)
        thresh = float(cm.mean())
        chains = ctr

    lo = g_aw < thresh
    w_lo = float(w[lo].sum())
    tr_g = traces[0, :, 0]
    frac_lo_trace = float((tr_g < thresh).mean())

    kish = float(np.exp(2 * logsumexp(logw) - logsumexp(2 * logw)))
    names = list(MODEL_PARAM_NAMES)
    out = {
        'threshold_g_aw': thresh,
        'logz': meta.get('logz'),
        'stages': meta.get('stage'),
        'resampled_stages': int(np.asarray(resampled).sum()),
        'final_ess': kish,
        'final_beta': meta.get('beta'),
        'n_particles': int(m.shape[0]),
        'mode_weight_low_g_aw': {'weighted_particles': w_lo,
                                 'resampled_trace': frac_lo_trace},
        'modes': {},
    }
    for label, mask in (('low_g_aw', lo), ('high_g_aw', ~lo)):
        if mask.sum() == 0:
            out['modes'][label] = {'n_particles': 0}
            continue
        wm = w[mask] / w[mask].sum()
        mom = {'n_particles': int(mask.sum()),
               'weight': float(w[mask].sum())}
        for j, nm in enumerate(names):
            mu = float(wm @ m[mask, j])
            sd = float(np.sqrt(wm @ (m[mask, j] - mu) ** 2))
            mom[nm] = [round(mu, 4), round(sd, 4)]
        out['modes'][label] = mom

    if chains is not None:
        agree = {}
        for c in range(chains.shape[0]):
            cmu = chains[c, :, 0].mean()
            label = 'low_g_aw' if cmu < thresh else 'high_g_aw'
            mode = out['modes'][label]
            if mode.get('n_particles', 0) == 0:
                # resampling extinguished this mode: no moments exist, and
                # NaN z-scores would make the JSON unparseable by strict
                # readers — report the absence instead
                agree['chain{}'.format(c)] = {
                    'matched_mode': label,
                    'g_aw_mean': round(float(cmu), 3),
                    'mode_absent': True}
                continue
            zs = {}
            for j, nm in enumerate(names):
                mu, sd = mode.get(nm, (np.nan, np.nan))
                csd = float(chains[c, :, j].std()) + 1e-12
                # float(): numpy scalars poison json.dump
                zs[nm] = round(float(abs(chains[c, :, j].mean() - mu))
                               / max(sd, csd, 1e-12), 2)
            agree['chain{}'.format(c)] = {
                'matched_mode': label, 'g_aw_mean': round(float(cmu), 3),
                'max_param_z': max(zs.values()), 'param_z': zs}
        out['nuts_chain_agreement'] = agree

    path = 'carn_study/smc_r4_modes.json'
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('SMC mode decomposition: P(g_aw < {:.2f}) = {:.3f} '
          '(weighted) / {:.3f} (trace); logZ {:.2f}; {} stages, '
          'final ESS {:.0f}/{}'.format(
              thresh, w_lo, frac_lo_trace, out['logz'] or np.nan,
              out['stages'], kish, m.shape[0]))
    if chains is not None:
        for c, a in out['nuts_chain_agreement'].items():
            if a.get('mode_absent'):
                print('  {} (g_aw {:.2f}) -> {} (mode absent from final '
                      'population)'.format(c, a['g_aw_mean'],
                                           a['matched_mode']))
            else:
                print('  {} (g_aw {:.2f}) -> {} (max param z {:.1f})'.format(
                    c, a['g_aw_mean'], a['matched_mode'], a['max_param_z']))
    print('wrote', path)


if __name__ == '__main__':
    main()
