"""MCMC driver CLI (L4/L5).

Reference entry point: ``python Bayes_Run.py --new <iters> <burn> <db>`` /
``--resume <db> <iters>`` (Bayes_Run.py:31-36,475-537).  Ours:

    python -m parasitoids_tpu.bayes.run --new 1000 100 runs/kalbar
    python -m parasitoids_tpu.bayes.run --resume runs/kalbar 1000
    # options: --chains N, plus key=value Params overrides after the mode args

Differences by design: chains are vmapped (and sharded across chips when
more than one device is present) instead of one sequential PyMC chain; the
trace store is an npz with exact sampler-state resume instead of a PyMC
HDF5 database; Gelman–Rubin is printed automatically when >= 2 chains.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from ..config import Params
from ..utils.cache import enable_compilation_cache
from .diagnostics import effective_sample_size, gelman_rubin
from .model import BayesSetup
from .priors import MODEL_PARAM_NAMES
from .sampler import MCMCConfig
from .store import append_traces, load_chain, save_chain

def _positive_int(s):
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError('must be >= 1, got {}'.format(v))
    return v


parser = argparse.ArgumentParser(prog='parasitoids_tpu.bayes.run')
group = parser.add_mutually_exclusive_group(required=True)
group.add_argument('--new', nargs=3,
                   metavar=('iterations', 'burn-in', 'db_name'),
                   help='Start a new MCMC run.')
group.add_argument('--resume', nargs=2, metavar=('db_name', 'iterations'),
                   help='Resume sampling from a saved run.  AM: continue '
                        'the stored chain for <iterations> more samples.  '
                        'NUTS: continue an interrupted run from its '
                        '<db>.ckpt.npz transition checkpoint to the '
                        'originally requested totals (<iterations> '
                        'ignored).')
group.add_argument('--analyze', metavar='db_name',
                   help='Interactive analysis menu over a saved run '
                        '(the reference Bayes_Run menus, '
                        'Bayes_Run.py:540-702): posterior summary, '
                        'R-hat/ESS diagnostics, plot generation.')
parser.add_argument('--chains', type=int, default=1,
                    help='number of parallel chains (vmapped/sharded)')
parser.add_argument('--obs-sweeps', type=_positive_int, default=None,
                    help='AM/PT/SMC: Metropolis-within-Gibbs sweeps over '
                         'the observation block per model-block step '
                         '(default 1; an AM/PT/SMC --resume inherits the '
                         'stored run\'s value unless overridden).  Extra '
                         'sweeps '
                         'reuse the cached forward projections (~free) '
                         'and shorten the autocorrelation time along the '
                         'xi x obs-prob likelihood ridge')
parser.add_argument('--sampler', choices=['am', 'nuts', 'pt', 'smc', 'vi'],
                    default='am',
                    help='adaptive Metropolis (reference-equivalent), '
                         'gradient-based NUTS (n_periods fixed, as MAP), '
                         'replica-exchange parallel tempering (pt: '
                         'multimodal-robust AM + marginal-likelihood '
                         'estimates), adaptive tempered sequential '
                         'Monte Carlo (smc: prior-to-posterior particle '
                         'anneal + a third evidence estimator), or ADVI '
                         'variational inference (vi: seconds-scale '
                         'Gaussian posterior + ELBO/PSIS-IS evidence '
                         'estimates, n_periods fixed as MAP)')
parser.add_argument('--temps', type=int, default=8,
                    help='PT: number of temperature rungs (one replica '
                         'each; sharded one-per-device when the device '
                         'count matches)')
parser.add_argument('--beta-min', type=float, default=0.0,
                    help='PT: 0 (default) = power ladder reaching the '
                         'prior (beta=0), enabling log-evidence estimates; '
                         '> 0 = geometric ladder down to this beta '
                         '(sampling-only)')
parser.add_argument('--ladder-power', type=float, default=5.0,
                    help='PT: exponent of the power ladder')
parser.add_argument('--swap-every', type=int, default=10,
                    help='PT: AM steps between replica-exchange attempts')
parser.add_argument('--tune-ladder', action='store_true',
                    help='PT: adapt interior ladder rungs toward uniform '
                         'swap acceptance during burn-in (Vousden-style, '
                         'applied between checkpoints; endpoints pinned, '
                         'ladder frozen after burn-in so the evidence '
                         'integrand stays consistent)')
parser.add_argument('--particles', type=int, default=None,
                    help='SMC: particle count (default: the <iterations> '
                         'argument, or 64) — these become the posterior '
                         'draws')
parser.add_argument('--moves', type=int, default=None,
                    help='SMC: rejuvenation MCMC steps per anneal stage '
                         '(default 5; on --resume, overrides the stored '
                         'value when given — the end-game knob for '
                         'raising rejuvenation effort as beta -> 1)')
parser.add_argument('--ess-target', type=float, default=0.5,
                    help='SMC: each temperature increment keeps '
                         'ESS >= target * particles')
parser.add_argument('--min-accepts', type=float, default=None,
                    help='SMC: repeat move rounds until the average '
                         'particle has accepted this many jumps per stage '
                         '(default 2.0; on --resume, overrides the stored '
                         'value when given)')
parser.add_argument('--max-move-rounds', type=int, default=None,
                    help='SMC: cap on adaptive move rounds per stage '
                         '(default 10; on --resume, overrides the stored '
                         'value when given)')
parser.add_argument('--max-stages', type=int, default=200,
                    help='SMC: hard cap on anneal stages')
parser.add_argument('--max-depth', type=int, default=6,
                    help='NUTS maximum tree depth')
parser.add_argument('--dense-mass', action='store_true',
                    help='NUTS: estimate a dense (full-covariance) mass '
                         'matrix during warmup instead of the diagonal '
                         'one — better geometry for the correlated '
                         'sig_x/sig_y block')
parser.add_argument('--steps-per-call', type=int, default=1,
                    help='NUTS: transitions batched into each device '
                         'program (inner lax.scan).  Amortizes the '
                         'per-program host dispatch+sync round-trip of '
                         'the stepwise driver; size so one program stays '
                         'under the hosted-tunnel execution limit '
                         '(full-scale chains: ~2 s/chain-sweep, 5-10 is '
                         'safe).  Math/RNG identical for every value.')
parser.add_argument('--mass', choices=['adapt', 'laplace', 'ridge'],
                    default='adapt',
                    help="NUTS mass matrix: 'adapt' = Stan-style warmup "
                         "estimation (diagonal, or dense with "
                         "--dense-mass); 'laplace' = FIXED dense matrix "
                         "from the Laplace covariance at the MAP "
                         "(map_fit.laplace_approximation) — warmup then "
                         "only adapts the step size, so burn-in can drop "
                         "to ~50 transitions and the preconditioned "
                         "trajectories U-turn at much shallower depth; "
                         "'ridge' = ridge-aligned reparameterization "
                         "(nuts.whiten_transform): sample in the "
                         "eigenbasis of the prior-floor-regularized "
                         "Laplace covariance (the identified products of "
                         "bayes/identify.py become coordinate axes) with "
                         "dense Welford adaptation ON TOP — corrects the "
                         "Laplace sd under-estimates along the nonlinear "
                         "lambda-xi-obs-prob ridge that a fixed metric "
                         "cannot fix (round-3 801^2 bottleneck; implies "
                         "--init map).  The map is stored in a "
                         "<db>.whiten.npz sidecar a --resume reloads")
parser.add_argument('--max-program-steps', type=int, default=800,
                    help='PT: cap on total replica-steps (temps x steps) '
                         'dispatched as one device program — long '
                         'monolithic programs crash the hosted-TPU tunnel '
                         'worker (observed at ~4000 replica-steps / '
                         '~3 min on carnarvon 401^2); chunks checkpoint '
                         'and continue, mathematically a no-op')
parser.add_argument('--gibbs-n', action='store_true',
                    help='NUTS: sample the discrete n_periods by a '
                         'Metropolis move after each NUTS transition '
                         '(Gibbs-within-NUTS) instead of holding it fixed '
                         'at 30 — full parity with the AM sampler\'s '
                         'parameter set')
parser.add_argument('--n-step', type=_positive_int, default=1,
                    help='NUTS --gibbs-n: n_periods proposal is a '
                         'symmetric +/-U{1..n_step} walk.  5-6 measured '
                         '5.6-6.9x the n ESS/draw of the +/-1 default at '
                         'the 801^2 flagship, same cost/transition '
                         '(docs/PERF.md item 15, runs/nuts_r5_nstep6*)')
parser.add_argument('--vi-mc', type=int, default=4,
                    help='VI: Monte-Carlo draws per ELBO gradient step')
parser.add_argument('--vi-lr', type=float, default=0.02,
                    help='VI: Adam learning rate')
parser.add_argument('--vi-fullrank', action='store_true',
                    help='VI: full-rank Gaussian family (default '
                         'mean-field)')
parser.add_argument('--vi-is', type=int, default=256,
                    help='VI: draws for the PSIS importance-sampling '
                         'evidence check (k-hat + IS logZ)')
parser.add_argument('--init', default='map',
                    help="NUTS chain initialization: 'map' (default: short "
                         "MAP fit first — the far-from-data prior point "
                         "has near-zero predicted rates at observed cells, "
                         "where floor-rate log-likelihood terms are "
                         "f32-noise-dominated and warmup stalls), 'prior' "
                         "(reference initial values), or a saved trace "
                         ".npz (start from its final states)")
parser.add_argument('--init-map-steps', type=int, default=200,
                    help='Adam steps for --init map')
parser.add_argument('--seed', type=int, default=0)
parser.add_argument('--checkpoint-every', type=int, default=1000,
                    help='save the trace store every N samples (AM path); '
                         'an interrupted run resumes exactly from the last '
                         'checkpoint (ref PyMC mcmc.commit/db.close '
                         'behavior, Bayes_Run.py:500-503)')
parser.add_argument('--shard-forward', action='store_true',
                    help='shard each forward simulation over all devices '
                         '(minute-axis partial sums merged by psum, '
                         'parallel/domain.py) — latency scaling for '
                         'single-chain samplers; incompatible with the '
                         'population-sharded pt/smc samplers, and disables '
                         'chain-over-device sharding')
parser.add_argument('overrides', nargs='*',
                    help='Params key=value overrides (e.g. interp_num=30)')


def _commit_store(db, message):
    """Durable commit of a trace store's file set (utils/durable.py; no-op
    unless PARA_GIT_COMMIT=1) — the library-level commit-on-landing rule,
    VERDICT r3 item 7."""
    from ..utils.durable import commit_artifacts
    base = db.removesuffix('.npz')
    return commit_artifacts([base + '.npz', base + '.meta.json'], message)


def build_setup(overrides=()):
    params = Params()
    params.cmd_line_chg(['--kalbar'])
    params.PLOT = False
    params.OUTPUT = False
    params.PROB_MODEL = False
    params.domain_info = (10000.0, 400)   # ref Bayes_Run.py:91
    for ov in overrides:
        if '=' in ov:
            key, _, val = ov.partition('=')
            params.chg_param(key, val)
    # gradient-based samplers use the Pallas path on TPU like every other
    # driver: the backward is now a Pallas kernel built from the closed-form
    # BVN CDF derivatives (ops/pallas_kernel.py ``_day_bwd_kernel``), so the
    # log-density and its gradient come from the same on-chip computation;
    # use_pallas=False still forces the XLA path for validation
    return BayesSetup(params)


def _report(traces, setup):
    names = list(MODEL_PARAM_NAMES)
    print('posterior means (model block):')
    flat = traces.reshape(-1, traces.shape[-1])
    for i, n in enumerate(names):
        print('  {:>12s}: {:.5g}'.format(n, flat[:, i].mean()))
    print('mean log-posterior: {:.2f}'.format(flat[:, -1].mean()))
    if traces.shape[0] >= 2:
        rhat = gelman_rubin(traces[:, :, :len(names)])
        print('Gelman-Rubin R-hat (model block):')
        lines = []
        for n, r in zip(names, np.atleast_1d(rhat)):
            print('  {:>12s}: {:.4f}'.format(n, r))
            lines.append('{}\t{:.6f}'.format(n, r))
        # file output like the reference menu (Bayes_Run.py:685-692)
        import os
        os.makedirs('diagnostics', exist_ok=True)
        with open(os.path.join('diagnostics', 'gelman-rubin.txt'), 'w') as f:
            f.write('\n'.join(lines) + '\n')
    ess = effective_sample_size(flat[:, 0])
    print('ESS (g_aw, pooled): {:.1f}'.format(ess))


def _nuts_init_point(args, setup, z0_prior):
    """Pick the NUTS starting point in unconstrained space.

    The reference-equivalent prior point predicts ~zero density at most
    observed cells; there the Poisson log-likelihood is a sum of floor-rate
    terms whose f32 fluctuations dominate the local landscape, so warmup's
    dual averaging collapses the step size.  Starting from a short MAP fit
    (or a previous run's state) puts warmup inside the smooth typical set.
    """
    from .map_fit import _make_objective, map_fit

    mode = args.init
    if mode == 'prior':
        return z0_prior
    _, _, unconstrain = _make_objective(setup, use_sprd=False)
    if mode == 'map':
        print('NUTS init: MAP fit ({} steps)...'.format(
            args.init_map_steps), flush=True)
        fit = map_fit(setup, n_steps=args.init_map_steps, use_sprd=False)
        print('NUTS init: MAP logp = {:.2f}'.format(fit['logp']),
              flush=True)
        return jnp.asarray(fit['z'], jnp.float32)   # same z-packing
    # otherwise: a saved trace store — start from chain 0's final state
    st = np.load(mode if mode.endswith('.npz') else mode + '.npz')
    m = np.atleast_2d(st['state_m'])[0]
    o = np.atleast_2d(st['state_o'])[0]
    n_obs = 4 + setup.n_sent + getattr(setup, 'n_extra_obs', 0)
    if o.shape[0] != n_obs:
        raise SystemExit('--init trace has {} obs params, model needs {} '
                         '(different site/domain?)'.format(o.shape[0],
                                                           n_obs))
    print('NUTS init: from trace {}'.format(mode), flush=True)
    return unconstrain(jnp.asarray(m, jnp.float32),
                       jnp.asarray(o, jnp.float32),
                       jnp.asarray(0.3, jnp.float32))


def run_nuts(args, setup):
    """Gradient-based sampling path (``--sampler nuts``): vmapped chains,
    unconstrained space with log-Jacobians, warmup = burn-in argument."""
    from ..utils.durable import commit_artifacts
    from .nuts import (NUTSConfig, make_transformed_logpdf,
                       nuts_sample_stepwise, whiten_logpdf,
                       whiten_transform)

    to_z = None          # ridge mode: u-space -> z-space sample map
    resume = args.new is None
    if resume:
        # --resume <db> <iters>: continue an interrupted run from its
        # transition checkpoint to the originally requested totals (the
        # iters argument is ignored — warmup schedules are length-bound)
        db = args.resume[0]
        ckpt = db.removesuffix('.npz') + '.ckpt.npz'
        twin = db.removesuffix('.npz') + '.ckpt_durable.npz'
        if not os.path.exists(ckpt) and os.path.exists(twin):
            # the transient checkpoint is gitignored and dies with a VM
            # recycle; the committed durable twin is an identical payload
            import shutil
            shutil.copyfile(twin, ckpt)
            print('NUTS resume: transient checkpoint missing; restored '
                  'from durable twin {}'.format(twin))
        if not os.path.exists(ckpt):
            raise SystemExit('no NUTS checkpoint at {!r} (a completed run '
                             'deletes it; rerun with --new)'.format(ckpt))
        with np.load(ckpt) as d:
            sig = [int(v) for v in d['cfg_sig']]
        nw, ns, md, nch, _dim = sig[:5]
        dense = bool(sig[5]) if len(sig) > 5 else False
        gibbs = bool(sig[6]) if len(sig) > 6 else False
        n_step = sig[7] if len(sig) > 7 else 1
        fixed_mass = bool(sig[8]) if len(sig) > 8 else False
        n_samples = ns
        cfg = NUTSConfig(num_warmup=nw, num_samples=ns, max_depth=md,
                         dense_mass=dense, n_step=n_step,
                         fixed_mass=fixed_mass)
        args.chains = nch
        logpdf, constrain, z0 = make_transformed_logpdf(setup)
        init_inv_mass = None    # the checkpointed carry holds the metric
        wh_path = db.removesuffix('.npz') + '.whiten.npz'
        if os.path.exists(wh_path):
            # a --mass ridge run: the checkpointed states live in u-space;
            # rebuild the SAME whitening map from the sidecar
            with np.load(wh_path) as wz:
                L, center = wz['L'], wz['center']
                anchor = wz['anchor'] if 'anchor' in wz.files else None
            print('NUTS resume: ridge reparameterization from {}'.format(
                wh_path))
            logpdf = whiten_logpdf(logpdf, L, center, anchor=anchor)
            to_z = lambda u: (np.asarray(u, np.float64) @ L.T
                              + center).astype(np.float32)
    else:
        n_samples, burn, db = int(args.new[0]), int(args.new[1]), args.new[2]
        ckpt = db.removesuffix('.npz') + '.ckpt.npz'
        twin = db.removesuffix('.npz') + '.ckpt_durable.npz'
        gibbs = args.gibbs_n
        logpdf, constrain, z0 = make_transformed_logpdf(setup)
        if args.mass in ('laplace', 'ridge'):
            # warm start: MAP fit -> prior-floor-regularized Laplace
            # covariance (map_fit.regularize_cov_z)
            from .map_fit import laplace_warm_mass
            print('NUTS init: MAP fit ({} steps) + Laplace metric...'
                  .format(args.init_map_steps), flush=True)
            fit, inv0 = laplace_warm_mass(setup,
                                          n_steps=args.init_map_steps)
            print('NUTS init: MAP logp = {:.2f}'.format(fit['logp']),
                  flush=True)
            if args.init == 'map':
                z0 = jnp.asarray(fit['z'], jnp.float32)
            else:
                z0 = _nuts_init_point(args, setup, z0)
        if args.mass == 'ridge':
            # ridge-aligned reparameterization: z = center + L u with
            # L L^T the regularized Laplace covariance; NUTS runs in
            # u-space from an identity metric with dense Welford
            # adaptation on top (whiten_transform docstring)
            _to_z64, _to_u, L, anchor = whiten_transform(fit['cov_z_reg'],
                                                         fit['z'])
            center = np.asarray(fit['z'], np.float64)
            wh_path = db.removesuffix('.npz') + '.whiten.npz'
            os.makedirs(os.path.dirname(os.path.abspath(wh_path)),
                        exist_ok=True)
            np.savez(wh_path, L=L, center=center, anchor=anchor)
            # commit the sidecar NOW: a resume without it would silently
            # interpret the u-space checkpoint as z-space (the map cannot
            # be rebuilt — it derives from this run's MAP fit)
            commit_artifacts([wh_path],
                             'Record ridge whitening sidecar ({})'.format(
                                 os.path.basename(db)))
            logpdf = whiten_logpdf(logpdf, L, center, anchor=anchor)
            to_z = lambda u: _to_z64(u).astype(np.float32)
            z0 = jnp.zeros(z0.shape, jnp.float32)   # u(MAP) = 0
            init_inv_mass = None
        elif args.mass == 'laplace':
            init_inv_mass = np.broadcast_to(
                inv0, (args.chains,) + inv0.shape)
        else:
            z0 = _nuts_init_point(args, setup, z0)
            init_inv_mass = None
        cfg = NUTSConfig(num_warmup=max(burn, 10), num_samples=n_samples,
                         max_depth=args.max_depth,
                         dense_mass=(args.dense_mass
                                     or args.mass in ('laplace', 'ridge')),
                         n_step=args.n_step,
                         fixed_mass=args.mass == 'laplace')
    logpdf_n = (make_transformed_logpdf(setup, free_n=True)[0]
                if gibbs else None)
    if gibbs and to_z is not None:
        with np.load(db.removesuffix('.npz') + '.whiten.npz') as wz:
            logpdf_n = whiten_logpdf(
                logpdf_n, wz['L'], wz['center'], gibbs=True,
                anchor=(wz['anchor'] if 'anchor' in wz.files else None))
    keys = random.split(random.PRNGKey(args.seed), args.chains)
    # per-chain start jitter: in ridge mode u is posterior-whitened, so
    # 0.5 u-units ≈ half a posterior sd per coordinate — genuinely
    # overdispersed starts (R-hat actually tests mixing); in z-space the
    # coordinate scales are unknown, keep the conservative 0.01
    jit_sd = 0.5 if to_z is not None else 0.01
    z0s = (jnp.broadcast_to(z0, (args.chains,) + z0.shape) +
           jit_sd * random.normal(random.PRNGKey(args.seed + 1),
                                  (args.chains,) + z0.shape, z0.dtype))

    print('NUTS: {} chains, {} warmup + {} samples, max depth {}{}...'.format(
        args.chains, cfg.num_warmup, n_samples, cfg.max_depth,
        ' (resuming)' if resume else ''))
    tic = time.time()

    def progress(phase, i, total):
        if i % 25 == 0 or i == total:
            print('  {} {}/{} ({:.1f} s)'.format(phase, i, total,
                                                 time.time() - tic),
                  flush=True)

    # stepwise host dispatch (one bounded device program per transition —
    # monolithic multi-minute programs crash the hosted-TPU tunnel worker);
    # inside each step the chains run under lax.map, not vmap: a
    # chain-batched rho batches the BVN lax.switch, which then executes
    # every branch (see parallel/chains.py)
    mesh = None
    n_dev = len(jax.devices())
    if (n_dev > 1 and args.chains % n_dev == 0
            and getattr(setup, 'forward_mesh', None) is None):
        from ..parallel.chains import chain_mesh
        mesh = chain_mesh()
        print('  chains sharded over {} devices'.format(n_dev))
    # library-level durability (utils/durable.py): every checkpoint is
    # mirrored to a non-ignored durable twin and (when PARA_GIT_COMMIT=1)
    # committed, throttled to one commit per 10 min — a VM recycle can
    # never eat more than checkpoint_every transitions again
    _last_commit = [0.0]

    def on_ckpt(phase, i, path):
        import shutil
        shutil.copyfile(path, twin)
        now = time.time()
        if now - _last_commit[0] >= 600:
            if commit_artifacts([twin], 'NUTS durable checkpoint: {} {} '
                                '({})'.format(phase, i,
                                              os.path.basename(db))):
                _last_commit[0] = now

    out = nuts_sample_stepwise(
        logpdf, z0s, keys, cfg, progress=progress, checkpoint_path=ckpt,
        checkpoint_every=max(1, min(args.checkpoint_every, 25)),
        resume=resume, mesh=mesh, gibbs_n=logpdf_n,
        steps_per_call=args.steps_per_call, init_inv_mass=init_inv_mass,
        on_checkpoint=on_ckpt)
    samples = np.asarray(out['samples'])     # (chains, n, dim) u/z-space
    if to_z is not None:
        samples = to_z(samples)              # ridge mode: map back to z
    dt = time.time() - tic
    print('NUTS finished: {:.1f} s ({:.3f} s/sample/chain); accept {:.2f}, '
          '{} divergences'.format(
              dt, dt / max(1, n_samples), float(np.mean(out['accept_rate'])),
              int(np.sum(out['n_divergent']))))
    if gibbs:
        print('  n_periods Gibbs moves: accept {:.2f}'.format(
            float(out['n_accept_rate'])))

    # constrained-space traces for reporting/diagnostics (np.asarray of a
    # device array is a read-only zero-copy view; copy before writing)
    theta = np.array(jax.vmap(jax.vmap(
        lambda z: jnp.concatenate([constrain(z)[0], constrain(z)[1]])))(
            jnp.asarray(samples, jnp.float32)))
    if gibbs:
        # slot 13 of the model block is the Gibbs-sampled n_periods, not
        # the fixed 30 the 1-arg constrain pins there
        theta[:, :, 13] = np.asarray(out['n_periods'])
    logp = np.asarray(out['logp'])[..., None]
    traces = np.concatenate([theta, logp], axis=-1)
    np.savez(db if db.endswith('.npz') else db + '.npz',
             traces=traces, z_samples=samples,
             step_size=np.asarray(out['step_size']),
             inv_mass=np.asarray(out['inv_mass']),
             sampler='nuts')
    print('Saved to {}.npz'.format(db.removesuffix('.npz')))
    if os.path.exists(twin):
        os.remove(twin)   # superseded by the final committed trace
    final = [db.removesuffix('.npz') + '.npz']
    if to_z is not None:
        final.append(db.removesuffix('.npz') + '.whiten.npz')
    commit_artifacts(final, 'Record NUTS trace {}'.format(
        os.path.basename(db)))
    _report(traces, setup)


def run_pt_cli(args, setup):
    """Replica-exchange path (``--sampler pt``): a ladder of tempered AM
    replicas with periodic state swaps; the cold chain is the posterior
    sample and, when the ladder reaches beta = 0 (default), the per-replica
    log-likelihood traces yield marginal-likelihood estimates
    (thermodynamic integration + stepping-stone) — model-comparison
    machinery the reference lacks entirely (its only such number is the
    MAP AIC, Bayes_MAP.py:494-517)."""
    from .store import load_extras
    from .tempering import (PTConfig, geometric_ladder, init_pt_states,
                            log_evidence, power_ladder, run_pt,
                            run_pt_sharded, tune_ladder)

    resume = args.new is None
    if resume:
        db, n_more = args.resume[0], int(args.resume[1])
        print('Resuming PT from {}...'.format(db))
        kept, states, meta = load_chain(db, setup)
        if meta.get('sampler') != 'pt':
            raise SystemExit('{} was not written by --sampler pt'.format(db))
        if kept is not None and kept.shape[1] == 0:
            # burn-in checkpoint placeholder (1, 0, 1): no post-burn draws
            # yet — must be None so the first real cold-chain block isn't
            # concatenated against the 1-wide dummy
            kept = None
        ex = load_extras(db)
        betas = np.asarray(ex['betas'], np.float32)
        se = int(meta['swap_every'])
        burn = int(meta['burn'])
        rounds_done = int(meta['rounds_done'])
        seed = int(meta['seed'])
        lls = np.asarray(ex['loglik'])
        att = np.asarray(ex['swap_attempts'])
        acc = np.asarray(ex['swap_accepts'])
        n_tuned = int(meta.get('tuned', 0))
        obs_sweeps = (args.obs_sweeps if args.obs_sweeps is not None
                      else int(meta.get('obs_sweeps', 1)))
        # 0 extra iterations is the evidence-recompute path: skip straight
        # to the report from the stored loglik traces
        rounds = -(-n_more // se)
    else:
        n_samples, burn, db = int(args.new[0]), int(args.new[1]), args.new[2]
        se = args.swap_every
        seed = args.seed
        obs_sweeps = args.obs_sweeps or 1
        if args.temps < 2:
            raise SystemExit('--sampler pt needs --temps >= 2')
        if not 0.0 <= args.beta_min < 1.0:
            raise SystemExit('--beta-min must be in [0, 1)')
        if args.beta_min > 0:
            betas = geometric_ladder(args.temps, args.beta_min)
        else:
            betas = power_ladder(args.temps, args.ladder_power)
        rounds = -(-(burn + n_samples) // se)
        rounds_done = 0
        print('Initializing {} replicas (beta {:.3g} .. {:.3g})...'.format(
            args.temps, betas[0], betas[-1]))
        states = init_pt_states(setup, random.PRNGKey(seed), args.temps)
        kept = None          # post-burn cold-chain traces (AM 'traces' key)
        lls = None
        att = acc = np.zeros(args.temps - 1)
        n_tuned = 0
    T = betas.shape[0]
    swap_key = random.PRNGKey(seed + 2)
    # ladder-tuning swap stats accumulate across checkpoint chunks: swap
    # parity alternates by global round, so a short chunk may attempt only
    # even- or odd-parity pairs and tuning must wait until every adjacent
    # pair has data (not persisted — a mid-burn resume restarts the window)
    t_att = np.zeros(T - 1)
    t_acc = np.zeros(T - 1)

    n_dev = len(jax.devices())
    sharded = n_dev == T and T > 1
    if sharded:
        from ..parallel.chains import chain_mesh
        mesh = chain_mesh()
        print('  one replica per device over {} devices (ppermute swaps)'
              .format(n_dev))
    print('PT: {} rungs, {} swap rounds x {} steps{}...'.format(
        T, rounds, se, ' (resuming at round {})'.format(rounds_done)
        if rounds_done else ''))

    # two bounds on rounds per device program: the checkpoint cadence, and
    # the hosted-tunnel execution limit — one program runs T*se*rounds
    # sequential model steps (lax.map over replicas), and the worker was
    # observed crashing at ~4000 replica-steps (~3 min) on carnarvon 401^2
    chunk = (max(1, min(args.checkpoint_every // se,
                        args.max_program_steps // (se * T), rounds))
             if rounds else 1)
    tic = time.time()
    done = 0
    while done < rounds:
        n = min(chunk, rounds - done)
        cfg = PTConfig(n_rounds=n, swap_every=se, obs_sweeps=obs_sweeps)
        if sharded:
            states, tr, stats = run_pt_sharded(
                setup, states, betas, swap_key, cfg, mesh,
                round_offset=rounds_done + done)
        else:
            states, tr, stats = run_pt(
                setup, states, betas, swap_key, cfg,
                round_offset=rounds_done + done)
        # keep only the post-burn part of the cold chain, so the stored
        # 'traces' mean the same thing as an AM store (posterior draws);
        # the full-history loglik lives in the extras with meta['burn']
        steps_before = (rounds_done + done) * se
        cut = max(0, min(burn - steps_before, n * se))
        cold = np.asarray(tr[:1, cut:])
        ll_new = np.asarray(stats['loglik'])
        if cold.shape[1]:
            kept = cold if kept is None else append_traces(kept, cold)
        lls = ll_new if lls is None else np.concatenate([lls, ll_new],
                                                        axis=1)
        c_att = np.asarray(stats['swap_attempts'])
        c_acc = np.asarray(stats['swap_accepts'])
        in_burn = steps_before + n * se <= burn
        if args.tune_ladder and in_burn and T > 2:
            t_att = t_att + c_att
            t_acc = t_acc + c_acc
            if (t_att > 0).all():
                new_betas = tune_ladder(betas, t_acc / t_att,
                                        kappa=0.6 / (1.0 + 0.5 * n_tuned))
                n_tuned += 1
                print('  ladder tuned ({}): beta = [{}]'.format(
                    n_tuned, ' '.join('{:.3g}'.format(b)
                                      for b in new_betas)))
                betas = new_betas
                t_att = np.zeros(T - 1)
                t_acc = np.zeros(T - 1)
        else:
            # reported rates cover only the frozen-ladder phase
            att = att + c_att
            acc = acc + c_acc
        done += n
        save_chain(db, kept if kept is not None else np.zeros((1, 0, 1)),
                   states,
                   meta={'sampler': 'pt', 'swap_every': se, 'burn': burn,
                         'rounds_done': rounds_done + done, 'seed': seed,
                         'tuned': n_tuned, 'obs_sweeps': obs_sweeps,
                         'n_samples': 0 if kept is None else kept.shape[-2]},
                   extra={'betas': betas, 'loglik': lls,
                          'swap_attempts': att, 'swap_accepts': acc})
        _commit_store(db, 'PT checkpoint: {}/{} rounds'.format(done, rounds))
        if done < rounds:
            print('  checkpoint: {}/{} rounds done'.format(done, rounds))
    if rounds:
        dt = time.time() - tic
        print('PT finished: {:.1f} s ({:.3f} s/step across {} replicas)'
              .format(dt, dt / (rounds * se), T))
        print('Saved to {}.npz'.format(db.removesuffix('.npz')))

    with np.errstate(invalid='ignore'):
        rates = np.where(att > 0, acc / np.maximum(att, 1), np.nan)
    print('swap acceptance by rung (beta_hi->beta_lo): ' +
          ' '.join('{:.2f}'.format(r) for r in rates))
    ev = log_evidence(betas, lls, burn=min(burn, lls.shape[1] - 1))
    if not ev['equilibrated']:
        print('WARNING: TI integrand E_beta[loglik] decreases across rung '
              'pair(s) {} — some replica has not equilibrated; evidence '
              'estimates are untrustworthy (run longer / more rungs)'
              .format(np.asarray(ev['nonmonotone_at']).tolist()))
    if ev['complete']:
        print('log evidence: TI {:.2f}, stepping-stone {:.2f}'.format(
            ev['ti'], ev['ss']))
    else:
        print('log Z(1) - log Z(beta={:.3g}): TI {:.2f}, stepping-stone '
              '{:.2f} (ladder does not reach the prior; use --beta-min 0 '
              'for absolute evidence)'.format(betas.min(), ev['ti'],
                                              ev['ss']))
    if kept is not None and kept.shape[1]:
        _report(kept, setup)
    else:
        print('(no post-burn samples yet)')


def _smc_posterior_traces(payload, seed):
    """Unweighted posterior draws from the final weighted particles: one
    systematic resample (stage-independent stream), stored as (1, N, dim)
    so diagnostics/reporting treat them like a chain's samples."""
    from .smc import systematic_resample
    st = payload['states']
    logw = np.asarray(payload['logw'], np.float64)
    w = np.exp(logw - logw.max())
    idx = systematic_resample(w / w.sum(),
                             np.random.default_rng([seed, 10 ** 6]))
    m = np.asarray(st.m)[idx]
    o = np.asarray(st.o)[idx]
    lp = (np.asarray(st.prior_m) + np.asarray(st.prior_o)
          + np.asarray(st.loglik))[idx]
    return np.concatenate([m, o, lp[:, None]], axis=1)[None]


def _save_smc(db, payload, seed, cfg):
    """Persist the annealer state; posterior traces only once beta = 1."""
    h = payload['history']
    traces = (_smc_posterior_traces(payload, seed)
              if payload['beta'] >= 1.0 else np.zeros((1, 0, 1)))
    save_chain(db, traces, payload['states'],
               meta={'sampler': 'smc', 'seed': seed,
                     'n_moves': cfg.n_moves, 'ess_target': cfg.ess_target,
                     'obs_scale': cfg.obs_scale,
                     'obs_sweeps': cfg.obs_sweeps,
                     'min_accepts': cfg.min_accepts,
                     'max_move_rounds': cfg.max_move_rounds,
                     'beta': payload['beta'], 'logz': payload['logz'],
                     'log_scale': payload['log_scale'],
                     'stage': payload['stage'],
                     'n_samples': traces.shape[1]},
               extra={'logw': payload['logw'], 'betas': h['betas'],
                      'ess_path': h['ess'], 'accept_path': h['accept'],
                      'resampled': h['resampled'], 'logz_path': h['logz'],
                      'rounds_path': h.get('rounds', np.zeros(0))})
    _commit_store(db, 'SMC checkpoint: stage {} (beta {:.4f})'.format(
        payload['stage'], payload['beta']))
    return traces


def run_smc_cli(args, setup):
    """Adaptive tempered SMC path (``--sampler smc``): a particle
    population annealed from the exact prior to the posterior along a
    data-driven temperature schedule, rejuvenated by the same AM kernel as
    the reference-equivalent sampler; yields unweighted posterior draws
    plus the SMC marginal-likelihood estimate — the third independent
    evidence estimator next to PT's TI and stepping-stone
    (cross-checkable via --sampler pt on the same data)."""
    from .smc import SMCConfig, run_smc
    from .store import load_extras

    resume = args.new is None
    if resume:
        db = args.resume[0]
        print('Resuming SMC from {}...'.format(db))
        _, states, meta = load_chain(db, setup)
        if meta.get('sampler') != 'smc':
            raise SystemExit('{} was not written by --sampler smc; pass '
                             'the matching --sampler'.format(db))
        ex = load_extras(db)
        seed = int(meta['seed'])
        # move-effort knobs: stored value unless explicitly re-given — the
        # anneal end-game raises rejuvenation effort as beta -> 1 instead
        # of letting acceptance sag (resume is a fresh process, so a
        # changed n_moves simply compiles a new move program)
        cfg = SMCConfig(n_particles=int(states.m.shape[0]),
                        n_moves=(args.moves if args.moves is not None
                                 else int(meta['n_moves'])),
                        ess_target=float(meta['ess_target']),
                        obs_scale=float(meta.get('obs_scale', 0.05)),
                        obs_sweeps=(args.obs_sweeps
                                    if args.obs_sweeps is not None
                                    else int(meta.get('obs_sweeps', 1))),
                        max_stages=args.max_stages,
                        min_accepts=(args.min_accepts
                                     if args.min_accepts is not None
                                     else float(meta.get('min_accepts',
                                                         2.0))),
                        max_move_rounds=(
                            args.max_move_rounds
                            if args.max_move_rounds is not None
                            else int(meta.get('max_move_rounds', 10))))
        payload = {'states': states, 'logw': ex['logw'],
                   'beta': float(meta['beta']), 'logz': float(meta['logz']),
                   'log_scale': float(meta['log_scale']),
                   'stage': int(meta['stage']),
                   'history': {'betas': ex['betas'], 'ess': ex['ess_path'],
                               'accept': ex['accept_path'],
                               'resampled': ex['resampled'],
                               'logz': ex['logz_path'],
                               'rounds': ex.get('rounds_path',
                                                np.zeros(0))}}
    else:
        n_samples, _burn, db = (int(args.new[0]), int(args.new[1]),
                                args.new[2])
        n_part = args.particles or (n_samples if n_samples > 0 else 64)
        seed = args.seed
        cfg = SMCConfig(n_particles=n_part,
                        n_moves=(5 if args.moves is None else args.moves),
                        ess_target=args.ess_target,
                        max_stages=args.max_stages,
                        min_accepts=(2.0 if args.min_accepts is None
                                     else args.min_accepts),
                        max_move_rounds=(10 if args.max_move_rounds is None
                                         else args.max_move_rounds),
                        obs_sweeps=args.obs_sweeps or 1)
        payload = None

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and cfg.n_particles % n_dev == 0:
        from ..parallel.chains import chain_mesh
        mesh = chain_mesh()
        print('  particles sharded over {} devices'.format(n_dev))

    tic = time.time()
    if payload is None or payload['beta'] < 1.0:
        if payload is None:
            print('SMC: {} particles from the prior, {} moves/stage, '
                  'ESS target {:.0%}...'.format(
                      cfg.n_particles, cfg.n_moves, cfg.ess_target))
        else:
            print('SMC: continuing at beta={:.5f} (stage {})...'.format(
                payload['beta'], payload['stage']))
        # PARA_SMC_BATCHED=1: vmapped rejuvenation with the select-BVN
        # forward config (bayes/smc._move_prog batched mode) — opt-in
        # after on-chip measurement (scripts/measure_batched_ensemble.py);
        # the annealer state/checkpoints are execution-scheme-independent,
        # so a mid-anneal resume may flip this freely
        batched = bool(int(os.environ.get('PARA_SMC_BATCHED', '0') or 0))
        if batched:
            print('  batched (vmap) rejuvenation enabled')
        payload = run_smc(setup, random.PRNGKey(seed), cfg, mesh=mesh,
                          seed=seed, verbose=True, resume=payload,
                          checkpoint=lambda p: _save_smc(db, p, seed, cfg),
                          batched=batched)
        dt = time.time() - tic
        print('SMC finished: {:.1f} s, {} stages'.format(
            dt, payload['stage']))
    traces = _save_smc(db, payload, seed, cfg)
    print('Saved to {}.npz'.format(db.removesuffix('.npz')))
    from .smc import ess as _ess
    print('final ESS {:.1f}/{}; resampled {} of {} stages'.format(
        _ess(payload['logw']), cfg.n_particles,
        int(np.sum(payload['history']['resampled'])), payload['stage']))
    print('log evidence (SMC): {:.2f}  (cross-check: --sampler pt '
          'TI/stepping-stone)'.format(payload['logz']))
    _report(traces, setup)


def run_vi_cli(args, setup):
    """ADVI path (``--sampler vi``): fits a Gaussian q to the
    transformed-space posterior by stochastic ELBO ascent (bayes/vi.py),
    stores <iterations> posterior draws from q in the standard trace
    format, and reports the ELBO, the PSIS k-hat proposal diagnostic, and
    the importance-sampling logZ — a fourth evidence estimator next to PT
    TI/stepping-stone and SMC.  The <burn-in> CLI slot is the number of
    ELBO optimization steps (0 = default 600)."""
    from .map_fit import _make_objective
    from .sampler import init_chain_state
    from .store import load_extras
    from .vi import fit_advi, q_draws, vi_evidence

    resume = args.new is None
    if resume:
        db = args.resume[0]
        n_draws = int(args.resume[1])
        print('VI: drawing {} more samples from the stored q in {}...'
              .format(n_draws, db))
        old_traces, _states, meta = load_chain(db, setup)
        if meta.get('sampler') != 'vi':
            raise SystemExit('{} was not written by --sampler vi; pass '
                             'the matching --sampler'.format(db))
        ex = load_extras(db)
        res = {'mu': ex['mu'], 'log_diag': ex['log_diag'],
               'idx': ex['idx'], 'z0': ex['z0'],
               'fullrank': bool(meta.get('fullrank', False)),
               'elbo_trace': ex['elbo_trace'],
               'use_sprd': bool(meta.get('use_sprd', False))}
        if res['fullrank']:
            res['offdiag'] = ex['offdiag']
        seed = int(meta['seed']) + int(old_traces.shape[1]) + 1
        n_steps = int(meta['steps'])
    else:
        n_draws, n_steps, db = (int(args.new[0]), int(args.new[1]),
                                args.new[2])
        if n_steps <= 0:
            n_steps = 600
        seed = args.seed
        old_traces, meta, res = None, {}, None

    tic = time.time()
    if res is None:
        print('VI: {} ELBO steps ({} MC draws/step, {}, lr {})...'.format(
            n_steps, args.vi_mc,
            'full-rank' if args.vi_fullrank else 'mean-field', args.vi_lr))
        res = fit_advi(setup, random.PRNGKey(seed), n_steps=n_steps,
                       n_mc=args.vi_mc, learning_rate=args.vi_lr,
                       fullrank=args.vi_fullrank,
                       init='prior' if args.init == 'prior' else 'map',
                       init_map_steps=args.init_map_steps, verbose=True)
        print('VI fit: {:.1f} s'.format(time.time() - tic))

    # evidence diagnostics + posterior draws in one pass (each draw costs
    # one forward simulation)
    n_is = max(args.vi_is, n_draws)
    print('VI: evidence check on {} q-draws...'.format(n_is))
    ev = vi_evidence(setup, res, random.PRNGKey(seed + 1), n=n_is)

    # traces in the house format: (1, n_draws, m + o + logpost)
    _, constrain, _ = _make_objective(setup, res.get('use_sprd', False))
    zs = jnp.asarray(ev['zs'][:n_draws])
    m_all, o_all, _sprd = jax.vmap(constrain)(zs)   # bijections only
    traces = np.concatenate([np.asarray(m_all), np.asarray(o_all),
                             ev['logpost'][:n_draws, None]],
                            axis=1)[None].astype(np.float32)
    if old_traces is not None and old_traces.size:
        traces = append_traces(old_traces, traces)

    # sampler state at the best draw (lets AM/NUTS warm-start from a VI fit
    # via --init / load_chain)
    best = int(np.argmax(ev['logpost'][:n_draws]))
    state = init_chain_state(setup, random.PRNGKey(seed + 2),
                             m0=np.asarray(m_all)[best],
                             o0=np.asarray(o_all)[best])
    extra = {'mu': res['mu'], 'log_diag': res['log_diag'],
             'idx': res['idx'], 'z0': res['z0'],
             'elbo_trace': res['elbo_trace'], 'logw': ev['logw']}
    if res['fullrank']:
        extra['offdiag'] = res['offdiag']
    save_chain(db, traces, state,
               meta={'sampler': 'vi', 'seed': args.seed, 'steps': n_steps,
                     'fullrank': bool(res['fullrank']),
                     'use_sprd': bool(res.get('use_sprd', False)),
                     'n_mc': args.vi_mc, 'elbo': ev['elbo'],
                     'logz_is': ev['logz_is'], 'khat': ev['khat'],
                     'n_samples': int(traces.shape[1])},
               extra=extra)
    print('Saved to {}.npz ({:.1f} s total)'.format(
        db.removesuffix('.npz'), time.time() - tic))
    print('ELBO (evidence lower bound): {:.2f}'.format(ev['elbo']))
    print('IS log evidence:             {:.2f}'.format(ev['logz_is']))
    print('PSIS k-hat: {:.3f}  ({})'.format(
        ev['khat'],
        'q reliable as IS proposal' if ev['khat'] < 0.7 else
        'heavy-tailed weights - treat IS logZ as approximate; '
        'try --vi-fullrank / more steps'))
    print('note: n_periods fixed at 30 (as MAP/NUTS) - this estimates the '
          'conditional evidence; PT/SMC marginalize n_periods')
    _report(traces, setup)


def run_analyze(args):
    """Interactive analysis menu over a saved trace store — the
    reference's post-sampling menus (Bayes_Run.py:540-702: summary
    statistics, Gelman–Rubin written to diagnostics/, trace plots), minus
    'continue sampling' which is the ``--resume`` flag.  Needs no forward
    model: everything reads the stored arrays."""
    import json
    import os

    path = (args.analyze if args.analyze.endswith('.npz')
            else args.analyze + '.npz')
    with np.load(path) as npz:
        traces = npz['traces']
    meta = {}
    meta_path = path[:-4] + '.meta.json'
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    print('{}: {} chain(s) x {} samples x {} columns'.format(
        path, traces.shape[0], traces.shape[1], traces.shape[2]))
    if meta:
        print('meta: {}'.format(json.dumps(meta)))
    from .store import load_extras
    extras = load_extras(path)
    print('companion CLIs (each takes this trace + the run overrides): '
          'bayes.summary (full report), bayes.predictive (PPC), '
          'bayes.spread (posterior maps), bayes.loo (WAIC/PSIS-LOO), '
          'bayes.sensitivity (power-scaling prior/likelihood sensitivity)')
    has_ev = (('betas' in extras and 'loglik' in extras)
              or 'logz_path' in extras)
    menu = ('[s] posterior summary + R-hat/ESS   [p] diagnostic plots '
            '(./diagnostics/)   [t] trace window / per-variable plots   '
            '[g] write diagnostics/gelman-rubin.txt   '
            + ('[e] log-evidence   ' if has_ev else '')
            + '[r] resume hint   [q] quit')
    while True:
        print(menu)
        try:
            ans = input('> ').strip().lower()
        except EOFError:
            break
        if ans in ('q', 'quit', ''):
            break
        if ans == 's':
            _report(traces, None)
        elif ans == 'p':
            from ..viz.bayes_plot import main as bayes_plot_main
            bayes_plot_main([path])
        elif ans == 't':
            # trace-window / per-variable plotting (the reference's
            # start/stop + variable-selection menu, Bayes_Run.py:540-702
            # via Bayes_Plot.plot_traces)
            from ..viz.bayes_plot import _param_names, plot_traces
            names = _param_names(traces.shape[-1])
            print('parameters: {}'.format(' '.join(names)))
            try:
                sel = input('variables (space-separated, empty = all)'
                            '> ').split()
                win = input('window start [stop] (empty = full)> ').split()
            except EOFError:
                continue
            try:
                start = int(win[0]) if win else 0
                stop = int(win[1]) if len(win) > 1 else None
            except ValueError:
                print('window must be one or two integers, got: '
                      '{!r}'.format(' '.join(win)))
                continue
            try:
                written = plot_traces(traces, start=start, stop=stop,
                                      select=sel or None)
            except ValueError as e:
                print(e)
                continue
            print('wrote {} plot(s) to ./diagnostics/'.format(len(written)))
        elif ans == 'g':
            # gelman-rubin.txt export (ref Bayes_Run.py:685-692)
            if traces.shape[0] < 2:
                print('need >= 2 chains for Gelman-Rubin; this store has '
                      '{}'.format(traces.shape[0]))
                continue
            os.makedirs('diagnostics', exist_ok=True)
            from ..viz.bayes_plot import _param_names
            names = _param_names(traces.shape[-1])[:-1]
            rhat = np.atleast_1d(gelman_rubin(traces[:, :, :len(names)]))
            out_path = os.path.join('diagnostics', 'gelman-rubin.txt')
            with open(out_path, 'w') as f:
                for n, r in zip(names, rhat):
                    f.write('{}: {:.4f}\n'.format(n, r))
            print('wrote', out_path)
        elif ans == 'e' and has_ev:
            if extras.get('loglik') is not None \
                    and extras['loglik'].ndim == 2:   # PT store: (T, steps)
                from .tempering import log_evidence
                n_steps = extras['loglik'].shape[1]
                # a store checkpointed mid-burn-in has fewer steps than
                # meta['burn']; clamp like the PT CLI reporting path does
                burn = min(int(meta.get('burn', 0)), n_steps - 1)
                ev = log_evidence(extras['betas'], extras['loglik'],
                                  burn=max(burn, 0))
                post = n_steps - max(burn, 0)
                print('log Z (thermodynamic integration): {:.2f}'.format(
                    ev['ti']))
                print('log Z (stepping-stone):            {:.2f}'.format(
                    ev['ss']))
                if post < int(meta.get('n_samples', 0)):
                    print('  ({} post-burn draws so far — run '
                          'interrupted; estimates are preliminary)'
                          .format(post))
                if not ev.get('complete', True):
                    print('  (ladder does not reach beta=0: values are '
                          'relative to the hottest rung)')
                if not ev.get('equilibrated', True):
                    print('  WARNING: TI integrand not monotone — ladder '
                          'may not be equilibrated')
            elif 'logz_path' in extras:        # SMC store
                beta = float(meta.get('beta', 1.0))
                print('log Z (SMC): {:.2f}{}'.format(
                    float(np.asarray(extras['logz_path'])[-1]),
                    '' if beta >= 1.0 else
                    '  (PARTIAL: anneal stopped at beta = {:.3f})'
                    .format(beta)))
            else:
                print('no evidence data in this store')
        elif ans == 'r':
            print('continue this run with:\n  python -m '
                  'parasitoids_tpu.bayes.run --resume {} <iterations>'
                  .format(path[:-4]))
        else:
            print('unrecognized option {!r}'.format(ans))


def main(argv=None):
    args = parser.parse_args(argv)
    enable_compilation_cache()

    if args.analyze is not None:
        return run_analyze(args)

    if args.obs_sweeps is not None and args.sampler in ('nuts', 'vi'):
        # the obs block is inside the (gradient) target for these
        # samplers, so there is no Metropolis-within-Gibbs sweep to repeat
        parser.error('--obs-sweeps only applies to the am/pt/smc samplers'
                     ' (nuts/vi update the observation block jointly)')
    print('devices: {}'.format(jax.devices()))
    setup = build_setup(args.overrides)
    if args.shard_forward:
        if args.sampler in ('pt', 'smc'):
            parser.error('--shard-forward is incompatible with the '
                         'population-sharded pt/smc samplers')
        n_dev = len(jax.devices())
        if n_dev > 1:
            from ..parallel.domain import minute_mesh
            setup = setup.with_forward_mesh(minute_mesh())
            print('forward simulations minute-sharded over {} devices'
                  .format(n_dev))
    if args.sampler == 'nuts':
        return run_nuts(args, setup)
    if args.sampler == 'pt':
        return run_pt_cli(args, setup)
    if args.sampler == 'smc':
        return run_smc_cli(args, setup)
    if args.sampler == 'vi':
        return run_vi_cli(args, setup)
    from ..parallel.chains import chain_mesh, init_chains, run_chains

    n_dev = len(jax.devices())
    mesh = chain_mesh() if (args.chains > 1 and n_dev > 1 and
                            args.chains % n_dev == 0 and
                            getattr(setup, 'forward_mesh', None) is None
                            ) else None
    if mesh is None and args.chains > 1 and n_dev > 1 \
            and args.chains % n_dev:
        print('note: {} chains do not divide {} devices — running '
              'unsharded (pick a multiple for chain parallelism)'.format(
                  args.chains, n_dev))

    if args.new is not None:
        n_samples, burn, db = int(args.new[0]), int(args.new[1]), args.new[2]
        obs_sweeps = args.obs_sweeps or 1
        key = random.PRNGKey(args.seed)
        print('Initializing {} chain(s)...'.format(args.chains))
        states = init_chains(setup, key, args.chains)
        # burn-in and sampling share one chunk length so the whole run is a
        # single compiled program (a different scan length is a different
        # XLA program; compiles cost minutes at full config)
        total = burn + n_samples
        chunk = max(1, min(args.checkpoint_every, total))
        print('Burn-in {} + sampling {} steps (chunks of {})...'.format(
            burn, n_samples, chunk))
        tic = time.time()
        all_tr = None
        done = 0
        while done < total:
            n = min(chunk, total - done)
            states, tr = run_chains(
                setup, states,
                MCMCConfig(n, obs_sweeps=obs_sweeps), mesh)
            tr = np.asarray(tr)
            all_tr = tr if all_tr is None else append_traces(all_tr, tr)
            done += n
            kept = all_tr[..., burn:, :] if done > burn else all_tr[..., :0, :]
            save_chain(db, kept, states,
                       meta={'n_samples': max(done - burn, 0), 'burn': burn,
                             'chains': args.chains,
                             'obs_sweeps': obs_sweeps,
                             'obs_model': getattr(setup, 'obs_model',
                                                  'poisson')})
            _commit_store(db, 'AM checkpoint: {}/{} steps'.format(done,
                                                                  total))
            if done < total:
                print('  checkpoint: {}/{} steps done'.format(done, total))
        traces = all_tr[..., burn:, :]
        dt = time.time() - tic
        print('Sampling finished: {:.1f} s ({:.3f} s/step/chain, '
              '{:.0f} samples/hr total)'.format(
                  dt, dt / total, 3600.0 / dt * n_samples * args.chains))
        print('Saved to {}.npz'.format(db))
        _report(traces, setup)
    else:
        db, n_samples = args.resume[0], int(args.resume[1])
        print('Resuming from {}...'.format(db))
        old_traces, states, meta = load_chain(db, setup)
        if meta.get('sampler') not in (None, 'am'):
            raise SystemExit('{} was written by --sampler {}; pass the same '
                             '--sampler to resume it'.format(
                                 db, meta['sampler']))
        obs_sweeps = (args.obs_sweeps if args.obs_sweeps is not None
                      else int(meta.get('obs_sweeps', 1)))
        chunk = max(1, min(args.checkpoint_every, n_samples))
        print('Sampling {} more steps (chunks of {})...'.format(
            n_samples, chunk))
        tic = time.time()
        traces = old_traces
        done = 0
        while done < n_samples:
            n = min(chunk, n_samples - done)
            states, tr = run_chains(
                setup, states,
                MCMCConfig(n, obs_sweeps=obs_sweeps), mesh)
            traces = append_traces(traces, np.asarray(tr))
            done += n
            meta = dict(meta or {})
            meta['n_samples'] = int(traces.shape[-2])
            # record the kernel actually used: a later plain --resume must
            # inherit this run's obs_sweeps, not the pre-override value
            meta['obs_sweeps'] = obs_sweeps
            save_chain(db, traces, states, meta=meta)
            _commit_store(db, 'AM checkpoint (resume): {}/{} steps'.format(
                done, n_samples))
            if done < n_samples:
                print('  checkpoint: {}/{} steps done'.format(done,
                                                              n_samples))
        dt = time.time() - tic
        print('Sampling finished: {:.1f} s'.format(dt))
        print('Saved to {}.npz ({} total samples/chain)'.format(
            db, traces.shape[-2]))
        _report(traces, setup)


if __name__ == '__main__':
    main()
