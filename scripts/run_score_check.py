"""Score-identity check: is the likelihood the density the simulator samples?

For any fixed parameter point theta the expected score vanishes,

    E_{y ~ p(. | theta)} [ d/dtheta  log p(y | theta) ]  =  0,

coordinate-wise.  A systematic simulator<->likelihood mismatch (an
off-by-one observation day, a dropped thinning factor, a rate clamped
differently on the two sides) shows up as a nonzero mean score in exactly
the coordinates the mismatch informs — the cheapest decisive discriminator
between "the SBC rank anomalies are finite-chain autocorrelation" and "the
inference stack is biased" (sbc_study/ analysis; VERDICT r2 item 1).  The
test needs no sampler at all: it replays ``predictive.simulate_observations``
(the SBC data generator) against ``jax.grad`` of ``BayesSetup``'s own
log-likelihood (model.py log_likelihood — the role of the reference's
Poisson observation containers, Bayes_Run.py:393-433), with every dataset
entering as a traced operand so all replicates share one compiled program.

Writes ``sbc_study/score_check.json``: per-coordinate mean score, standard
error, and z = mean/SE at several prior-drawn theta points; |z| > 4 on any
coordinate flags a real defect.  Runs in minutes at the SBC study config.

Usage:  python scripts/run_score_check.py [--datasets 400] [--thetas 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--datasets', type=int, default=400,
                    help='simulated datasets per theta point')
    ap.add_argument('--thetas', type=int, default=3,
                    help='prior-drawn theta points to test at')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--out', default='sbc_study/score_check.json')
    ap.add_argument('overrides', nargs='*')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import random

    from parasitoids_tpu.bayes.predictive import simulate_observations
    from parasitoids_tpu.bayes.priors import (MODEL_PARAM_NAMES,
                                              OBS_PARAM_NAMES,
                                              sample_prior_model,
                                              sample_prior_obs)
    from parasitoids_tpu.bayes.run import build_setup
    from parasitoids_tpu.bayes.sampler import _as_model, _as_obs
    from parasitoids_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # same config as the SBC study so the verdict transfers
    setup = build_setup(args.overrides or ['domain_info=(10000.0,100)'])
    names = (list(MODEL_PARAM_NAMES) + list(OBS_PARAM_NAMES)
             + ['sent_obs_prob_{}'.format(k)
                for k in setup.locinfo.sent_ids])
    n_m = len(MODEL_PARAM_NAMES)
    dim = n_m + len(OBS_PARAM_NAMES) + setup.n_sent

    @jax.jit
    def score(theta, obs):
        """d/dtheta log p(y | theta) in the constrained parameterization
        (no prior term, no transform Jacobian — the identity is about the
        likelihood alone)."""
        def loglik(th):
            m = _as_model(th[:n_m])
            o = _as_obs(th[n_m:], setup.n_sent)
            proj = setup.forward_projections(m)
            return setup.log_likelihood(proj, o, obs=obs)
        return jax.grad(loglik)(theta)

    key = random.PRNGKey(args.seed)
    report = {'config': 'kalbar, 201x201 @ 50 m, 18 days, full model'
              if not args.overrides else ' '.join(args.overrides),
              'datasets_per_theta': args.datasets,
              'date': time.strftime('%Y-%m-%d'), 'thetas': []}
    worst = 0.0
    for t in range(args.thetas):
        k_t = random.fold_in(key, t)
        k_m, k_o = random.split(k_t)
        m_star = np.asarray(sample_prior_model(k_m))
        o_star = np.asarray(sample_prior_obs(k_o, setup.field_areas,
                                             setup.min_field_area))
        theta = jnp.asarray(np.concatenate([m_star, o_star]), jnp.float32)
        rng = np.random.default_rng([args.seed, t])
        tic = time.time()
        scores = np.empty((args.datasets, dim), np.float64)
        for r in range(args.datasets):
            y = simulate_observations(setup, m_star, o_star, rng)
            scores[r] = np.asarray(score(theta, setup.obs_pytree(y)))
        dt = time.time() - tic
        mean = scores.mean(axis=0)
        se = scores.std(axis=0, ddof=1) / np.sqrt(args.datasets)
        # a coordinate the data never informs has score identically 0
        # (se = 0); its z is 0 by definition, not 0/0
        z = np.where(se > 0, mean / np.where(se > 0, se, 1.0), 0.0)
        worst = max(worst, float(np.abs(z).max()))
        report['thetas'].append({
            'theta': {n: round(float(v), 6) for n, v in zip(names, theta)},
            'wall_s': round(dt, 1),
            'mean_score': {n: float(v) for n, v in zip(names, mean)},
            'se': {n: float(v) for n, v in zip(names, se)},
            'z': {n: round(float(v), 3) for n, v in zip(names, z)},
            'max_abs_z': round(float(np.abs(z).max()), 3),
        })
        print('theta {}: {:.1f} s, max |z| = {:.2f}  ({})'.format(
            t, dt, np.abs(z).max(), names[int(np.abs(z).argmax())]),
            flush=True)
    report['max_abs_z'] = round(worst, 3)
    report['verdict'] = ('PASS: no coordinate shows a systematic mean '
                         'score (|z| <= 4)' if worst <= 4.0 else
                         'FAIL: simulator and likelihood disagree — see z')
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    tmp = args.out + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, args.out)
    print(report['verdict'])
    print('wrote', args.out)


if __name__ == '__main__':
    main()
