"""Cross-check the marginal-likelihood estimators on real data (VERDICT
r4 item 6).

Each estimator was validated on analytic targets only; this table puts
all of them on ONE real posterior — the Kalbar MAP-domain config (401^2,
18 days, thinned-Poisson likelihood) — with uncertainties and an
agreement statement in nats:

* PT thermodynamic integration and stepping-stone (bayes/tempering
  .log_evidence over the stored per-rung log-likelihood traces; block-
  bootstrap SEs),
* SMC annealed-importance logZ (stage-product telescope, bayes/smc.py),
  with a second-seed spread when a twin store exists,
* VI ELBO (lower bound) and PSIS-smoothed IS logZ (bayes/vi.py).

The n_periods conditioning mismatch (bayes/vi.py docstring) is handled
EXPLICITLY: PT and SMC marginalize the discrete n over its Poisson(30)
prior (their AM kernel proposes rounded n moves), while the VI target
conditions on n = 30.  The exact bridge is

    log p(y) = log p(y | n=30) + log pi(30) - log P(n=30 | y),

so the table converts VI's conditional estimate to the marginal scale
using P(n=30 | y) from the PT cold chain (cross-checked against the SMC
particle weights) and the Poisson(30) pmf at 30.

Usage: python scripts/make_evidence_table.py [pt.npz smc.npz vi.npz
       [smc_twin.npz]]     (defaults: runs/{pt,smc,vi}_ev.npz)
Writes runs/evidence_table.json.  CPU-safe (reads stores only).
"""

import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

N_SLOT = 13


def _meta(path):
    with open(path.removesuffix('.npz') + '.meta.json') as f:
        return json.load(f)


def _extras(path):
    from parasitoids_tpu.bayes.store import load_extras
    return load_extras(path)


def pt_estimates(path, n_boot=200, block=20, seed=0):
    from parasitoids_tpu.bayes.tempering import log_evidence
    meta = _meta(path)
    ex = _extras(path)
    betas = np.asarray(ex['betas'], np.float64)
    lls = np.asarray(ex['loglik'], np.float64)
    burn = min(int(meta['burn']), lls.shape[1] - 1)
    ev = log_evidence(betas, lls, burn=burn)
    # block bootstrap over post-burn steps (shared blocks across rungs:
    # swap moves correlate rungs at equal times, so resampling time blocks
    # preserves that)
    post = lls[:, burn:]
    n = post.shape[1]
    nb = max(1, n // block)
    rng = np.random.default_rng(seed)
    tis, sss = [], []
    for _ in range(n_boot):
        picks = rng.integers(0, nb, nb)
        idx = np.concatenate([np.arange(p * block,
                                        min((p + 1) * block, n))
                              for p in picks])
        e = log_evidence(betas, post[:, idx], burn=0)
        tis.append(e['ti'])
        sss.append(e['ss'])
    return {
        'ti': round(float(ev['ti']), 2),
        'ti_se_boot': round(float(np.std(tis)), 2),
        'ss': round(float(ev['ss']), 2),
        'ss_se_boot': round(float(np.std(sss)), 2),
        'complete_to_prior': bool(ev['complete']),
        'equilibrated': bool(ev['equilibrated']),
        'rungs': int(betas.size),
        'post_burn_steps': int(n),
        'conditioning': 'marginal over n_periods (AM kernel samples n)',
    }


def pt_p_n30(path):
    """P(n_periods = 30 | y) from the PT cold chain's post-burn trace."""
    meta = _meta(path)
    with np.load(path) as d:
        tr = np.asarray(d['traces'])
    if tr.shape[1] == 0:
        return None, 0
    n = np.rint(tr[0, :, N_SLOT]).astype(int)
    return float((n == 30).mean()), int(n.size)


def smc_estimates(path, twin=None):
    meta = _meta(path)
    ex = _extras(path)
    out = {
        'logz': round(float(meta['logz']), 2),
        'stages': int(meta['stage']),
        'final_ess': round(float(np.exp(
            2.0 * _lse(ex['logw']) - _lse(2.0 * np.asarray(
                ex['logw'], np.float64)))), 1),
        'n_particles': int(np.asarray(ex['logw']).size),
        'conditioning': 'marginal over n_periods (AM kernel samples n)',
    }
    if twin and os.path.exists(twin):
        z2 = float(_meta(twin)['logz'])
        out['logz_seed_twin'] = round(z2, 2)
        out['seed_spread_nats'] = round(abs(out['logz'] - z2), 2)
    # n marginal from the weighted particles (cross-check for the bridge)
    with np.load(path) as d:
        if 'state_m' in d.files:
            n = np.rint(np.asarray(d['state_m'])[:, N_SLOT]).astype(int)
            w = np.exp(np.asarray(ex['logw'], np.float64)
                       - _lse(ex['logw']))
            out['p_n30_particles'] = round(float(w[n == 30].sum()), 4)
    return out


def _lse(x):
    x = np.asarray(x, np.float64)
    m = x.max()
    return m + math.log(np.exp(x - m).sum())


def vi_estimates(path):
    meta = _meta(path)
    return {
        'elbo': round(float(meta['elbo']), 2),
        'logz_is': round(float(meta['logz_is']), 2),
        'khat': round(float(meta['khat']), 3),
        'conditioning': 'conditional on n_periods = 30 (bayes/vi.py)',
    }


def main():
    argv = sys.argv[1:]
    pt = argv[0] if len(argv) > 0 else 'runs/pt_ev.npz'
    smc = argv[1] if len(argv) > 1 else 'runs/smc_ev.npz'
    vi = argv[2] if len(argv) > 2 else 'runs/vi_ev.npz'
    twin = argv[3] if len(argv) > 3 else 'runs/smc_ev_b.npz'

    out = {'config': 'kalbar 401^2 (MAP domain), 18 days, '
                     'thinned-Poisson obs model', 'estimators': {}}
    if os.path.exists(pt):
        out['estimators']['pt'] = pt_estimates(pt)
        p30, ndr = pt_p_n30(pt)
        out['p_n30_given_y_pt_cold_chain'] = (round(p30, 4)
                                              if p30 is not None else None)
        out['p_n30_draws'] = ndr
    if os.path.exists(smc):
        out['estimators']['smc'] = smc_estimates(smc, twin)
    if os.path.exists(vi):
        out['estimators']['vi'] = vi_estimates(vi)

    # n-conditioning bridge: log p(y) = log p(y|30) + log pi(30)
    #                                   - log P(30|y)
    from scipy.stats import poisson
    log_pi30 = float(poisson.logpmf(30, 30))
    p30 = out.get('p_n30_given_y_pt_cold_chain')
    if p30 is None and 'smc' in out['estimators']:
        p30 = out['estimators']['smc'].get('p_n30_particles')
    if 'vi' in out['estimators'] and p30:
        vi_marg = (out['estimators']['vi']['logz_is'] + log_pi30
                   - math.log(p30))
        out['estimators']['vi']['logz_is_marginalized'] = round(vi_marg, 2)
        out['bridge'] = {
            'formula': 'log p(y) = log p(y|n=30) + log pi(30) '
                       '- log P(n=30|y)',
            'log_pi30': round(log_pi30, 4),
            'p_n30_given_y': round(p30, 4),
        }

    # agreement statement over the marginal-scale point estimates
    vals = {}
    e = out['estimators']
    if 'pt' in e:
        vals['pt_ti'] = e['pt']['ti']
        vals['pt_ss'] = e['pt']['ss']
    if 'smc' in e:
        vals['smc'] = e['smc']['logz']
    if 'vi' in e and 'logz_is_marginalized' in e['vi']:
        vals['vi_is_marginalized'] = e['vi']['logz_is_marginalized']
    if len(vals) >= 2:
        vv = list(vals.values())
        spread = max(vv) - min(vv)
        out['agreement'] = {
            'marginal_scale_estimates': vals,
            'max_pairwise_spread_nats': round(spread, 2),
            'statement': ('estimators agree within {:.1f} nats across {} '
                          'independent constructions'.format(
                              spread, len(vals))),
        }
        print('evidence estimates (marginal scale):')
        for k, v in vals.items():
            print('  {:>22s}: {:+.2f}'.format(k, v))
        print('max pairwise spread: {:.2f} nats'.format(spread))

    path = 'runs/evidence_table.json'
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path)


if __name__ == '__main__':
    main()
