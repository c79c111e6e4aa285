"""Round-4 metric machinery: prior-floor Laplace regularization
(map_fit.regularize_cov_z / nuts.inv_mass_from_hessian prior_var), the
ridge-aligned whitening reparameterization (nuts.whiten_transform), and
library-level durable checkpointing (utils/durable.py, nuts on_checkpoint).

These are the repairs for round 3's two evidence failures: the f32
frozen-direction metric pathology (real-Carnarvon fit, VERDICT r3 item 3)
and the lambda-xi-obs-prob ridge bottleneck (801^2 NUTS, item 2).
"""

import os
import subprocess

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import random

from parasitoids_tpu.bayes.nuts import (NUTSConfig, inv_mass_from_hessian,
                                        nuts_sample, nuts_sample_stepwise,
                                        whiten_logpdf, whiten_transform)


# ---------------------------------------------------------------------------
# regularize_cov_z / prior-floored inv_mass_from_hessian
# ---------------------------------------------------------------------------

def test_regularize_cov_z_safety_floor():
    """The spectral safety net: crushed directions come back at the (tiny)
    floor, informed directions above it are untouched, pinned slots
    (prior var 0) stay pinned."""
    from parasitoids_tpu.bayes.map_fit import regularize_cov_z

    # 4 coords: informed (var 1e-3), crushed prior-only (1e-12, true ~1),
    # healthy prior-only (0.9), pinned (1e-12, prior var 0)
    cov = np.diag([1e-3, 1e-12, 0.9, 1e-12])
    prior_var = np.array([1.0, 1.0, 1.0, 0.0])
    out = regularize_cov_z(cov, prior_var, floor_frac=1e-4)
    d = np.diag(out)
    assert abs(d[0] - 1e-3) < 1e-7          # informed: untouched
    assert d[1] >= 1e-4 - 1e-12             # crushed: restored to floor
    assert abs(d[2] - 0.9) < 1e-9           # healthy: untouched
    assert d[3] <= 1e-10                    # pinned: stays pinned
    # symmetric PSD
    lam = np.linalg.eigvalsh(out)
    assert (lam > 0).all()


def test_blend_prior_metric_restores_prior_only_directions():
    """The principled repair (VERDICT r3 item 3): a prior-only direction
    whose apparent likelihood curvature is pure f32 noise recovers its
    FULL prior variance; data-informed directions keep their genuine
    likelihood curvature; pinned slots stay pinned."""
    from parasitoids_tpu.bayes.map_fit import blend_prior_metric

    # coords: 0 informed (lik curvature 1e4), 1 prior-only whose raw
    # Hessian entry is f32 noise (+3.0 — would freeze it at var ~1/3 or,
    # noise-inflated, much worse), 2 prior-only with NEGATIVE noise
    # curvature, 3 pinned
    H_negprior = np.diag([1.0, 0.5, 0.8, 0.0])     # exact prior curvature
    H_prior_T = np.diag([1.1, 0.55, 0.85, 0.0])    # + jacobian terms
    H_lik_true = np.diag([1e4, 0.0, 0.0, 0.0])
    noise = np.zeros((4, 4))
    noise[1, 1] = 3.0
    noise[2, 2] = -2.0
    H_raw = H_lik_true + H_negprior + noise
    prior_var = np.array([1.0, 1 / 0.55, 1 / 0.85, 0.0])
    cov = blend_prior_metric(H_raw, H_negprior, H_prior_T, prior_var,
                             noise_rel=1e-3)
    d = np.diag(cov)
    assert abs(d[0] - 1 / (1e4 + 1.1)) < 1e-7   # informed: lik + prior
    # prior-only: noise (±3, < tau = 1e-3 * ~1e4 = 10) zeroed -> full
    # prior-scale variance 1/H_prior_T
    assert abs(d[1] - 1 / 0.55) < 1e-6
    assert abs(d[2] - 1 / 0.85) < 1e-6
    assert d[3] <= 1e-10                        # pinned
    lam = np.linalg.eigvalsh(cov)
    assert (lam > 0).all()


def test_blend_prior_metric_offdiagonal_noise():
    """Noise spread off-diagonally across a prior-only block is still
    thresholded away in the eigenbasis."""
    from parasitoids_tpu.bayes.map_fit import blend_prior_metric

    H_negprior = np.eye(3)
    H_prior_T = np.eye(3)
    H_lik_true = np.diag([1e4, 0.0, 0.0])
    noise = np.array([[0.0, 0.0, 0.0],
                      [0.0, 1.0, 2.0],
                      [0.0, 2.0, -1.0]])
    H_raw = H_lik_true + H_negprior + noise
    cov = blend_prior_metric(H_raw, H_negprior, H_prior_T,
                             np.ones(3), noise_rel=1e-3)
    # tau = 1e-3 * 1e4 = 10 > |noise eigs| (~2.24): block -> prior scale
    np.testing.assert_allclose(np.diag(cov)[1:], [1.0, 1.0], atol=1e-6)
    assert abs(cov[0, 0] - 1 / (1e4 + 1)) < 1e-7


def test_inv_mass_from_hessian_prior_floor():
    """Hessian route (SBC warm start): a direction whose curvature was
    noise-inflated to lam_ceil scale is floored back at floor_frac x prior
    variance; informed directions above the floor are untouched; without
    prior_var the old clipping behavior is unchanged."""
    H = np.diag([1e3, 1e12, 1.0])
    pv = np.array([1.0, 1.0, 1.0])
    im_old = np.asarray(inv_mass_from_hessian(jnp.asarray(H)))
    assert im_old[1, 1] <= 1e-10            # old behavior: frozen
    im = np.asarray(inv_mass_from_hessian(jnp.asarray(H), prior_var=pv,
                                          floor_frac=1e-4))
    assert im[1, 1] >= 1e-4 - 1e-8          # rescued to the safety floor
    assert abs(im[0, 0] - 1e-3) < 1e-6      # informed: untouched
    assert abs(im[2, 2] - 1.0) < 1e-5


def test_prior_var_z_pins_fixed_slot():
    """z-space prior variances: the fixed n_periods packing slot (13) must
    be exactly 0 (the property the spectral floor relies on), every other
    slot strictly positive."""
    from parasitoids_tpu.bayes.map_fit import prior_var_z
    from tests.test_nuts import _tiny_setup

    setup = _tiny_setup()
    pv = prior_var_z(setup, use_sprd=False, n=200, seed=0)
    assert pv.shape[0] == 15 + 4 + setup.n_sent
    assert pv[13] == 0.0
    mask = np.ones(pv.shape[0], bool)
    mask[13] = False
    assert (pv[mask] > 0).all()


# ---------------------------------------------------------------------------
# whitening reparameterization
# ---------------------------------------------------------------------------

def test_whiten_transform_roundtrip():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5))
    cov = A @ A.T + 0.1 * np.eye(5)
    center = rng.normal(size=5)
    to_z, to_u, L, anchor = whiten_transform(cov, center)
    np.testing.assert_allclose(L @ L.T, cov, atol=1e-10)
    z = rng.normal(size=(7, 5))
    np.testing.assert_allclose(to_z(to_u(z)), z, atol=1e-9)
    np.testing.assert_allclose(to_u(center[None]), np.zeros((1, 5)),
                               atol=1e-9)


def test_whitened_nuts_samples_correct_distribution():
    """NUTS on the whitened target of a correlated, badly-scaled Gaussian
    must recover the Gaussian's moments after mapping back — the exact
    mechanism of --mass ridge.  The identity-metric u-space chain mixes
    where a z-space identity-metric chain could not (sd ratio 1e3)."""
    sd = np.array([1e-3, 1.0])
    rho = 0.9
    cov = np.array([[sd[0] ** 2, rho * sd[0] * sd[1]],
                    [rho * sd[0] * sd[1], sd[1] ** 2]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    mu = np.array([0.5, -1.0])
    muj = jnp.asarray(mu, jnp.float32)

    def logpdf(z):
        d = z - muj
        return -0.5 * d @ prec @ d

    # whiten with a deliberately imperfect covariance estimate (what a
    # Laplace fit delivers); warmup's dense adaptation must absorb the
    # mismatch
    est = cov * np.array([[1.3, 0.9], [0.9, 0.8]])
    est = 0.5 * (est + est.T)
    to_z, _, L, _a = whiten_transform(est, mu + 0.3 * sd)
    lp_u = whiten_logpdf(logpdf, L, mu + 0.3 * sd)
    cfg = NUTSConfig(num_warmup=300, num_samples=1200, max_depth=8,
                     dense_mass=True, init_step_size=0.5)
    out = nuts_sample(lp_u, jnp.zeros(2), random.PRNGKey(3), cfg)
    zs = to_z(np.asarray(out['samples']))
    np.testing.assert_allclose(zs.mean(axis=0), mu,
                               atol=3 * 1.0 / np.sqrt(200))
    np.testing.assert_allclose(zs.std(axis=0), sd, rtol=0.25)
    corr = np.corrcoef(zs.T)[0, 1]
    assert 0.8 < corr < 0.97


def test_whiten_logpdf_value_matches_z_space():
    """whiten_logpdf omits the constant Jacobian: values equal the z-space
    target at z = center + L u (stored logp traces stay comparable)."""
    cov = np.array([[2.0, 0.3], [0.3, 0.5]])
    center = np.array([1.0, -1.0])
    to_z, _, L, _a = whiten_transform(cov, center)

    def logpdf(z):
        return -0.5 * jnp.sum(z ** 2) + 0.7

    lp_u = whiten_logpdf(logpdf, L, center)
    u = jnp.asarray([0.3, -0.8], jnp.float32)
    z = to_z(np.asarray(u)[None])[0]
    np.testing.assert_allclose(float(lp_u(u)),
                               float(logpdf(jnp.asarray(z, jnp.float32))),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# library-level durability
# ---------------------------------------------------------------------------

def _mk_git_repo(path):
    subprocess.run(['git', 'init', '-q'], cwd=path, check=True)
    subprocess.run(['git', 'config', 'user.email', 't@t'], cwd=path,
                   check=True)
    subprocess.run(['git', 'config', 'user.name', 't'], cwd=path, check=True)


def test_commit_artifacts_gated_and_commits(tmp_path, monkeypatch):
    from parasitoids_tpu.utils import durable

    _mk_git_repo(tmp_path)
    f = tmp_path / 'trace.npz'
    f.write_bytes(b'x')
    # gated off by default
    monkeypatch.delenv('PARA_GIT_COMMIT', raising=False)
    assert not durable.commit_artifacts([str(f)], 'm', cwd=str(tmp_path))
    # on: commits once, then no-ops while unchanged
    monkeypatch.setenv('PARA_GIT_COMMIT', '1')
    assert durable.commit_artifacts([str(f)], 'first', cwd=str(tmp_path))
    assert not durable.commit_artifacts([str(f)], 'again',
                                        cwd=str(tmp_path))
    f.write_bytes(b'xy')
    assert durable.commit_artifacts([str(f)], 'update', cwd=str(tmp_path))
    log = subprocess.run(['git', 'log', '--oneline'], cwd=tmp_path,
                         capture_output=True, text=True).stdout
    assert 'first' in log and 'update' in log and 'again' not in log
    # missing paths: quiet no-op, never raises
    assert not durable.commit_artifacts([str(tmp_path / 'nope')], 'm',
                                        cwd=str(tmp_path))


def test_nuts_durable_twin_restores_after_recycle(tmp_path):
    """Kill-and-resume at the library level (VERDICT r3 item 7): interrupt
    a stepwise NUTS run, simulate a VM recycle by DELETING the transient
    checkpoint, restore from the on_checkpoint durable twin, and finish —
    the draws must be bitwise identical to an uninterrupted run."""
    def logpdf(z):
        return -0.5 * jnp.sum(z ** 2)

    cfg = NUTSConfig(num_warmup=8, num_samples=12, max_depth=3)
    z0s = jnp.zeros((1, 2))
    keys = random.split(random.PRNGKey(0), 1)

    ref = nuts_sample_stepwise(logpdf, z0s, keys, cfg)

    ckpt = str(tmp_path / 'run.ckpt.npz')
    twin = str(tmp_path / 'run.ckpt_durable.npz')

    def on_ckpt(phase, i, path):
        import shutil
        shutil.copyfile(path, twin)

    class Interrupt(Exception):
        pass

    def progress(phase, i, total):
        if phase == 'sample' and i >= 6:
            raise Interrupt

    with pytest.raises(Interrupt):
        nuts_sample_stepwise(logpdf, z0s, keys, cfg, progress=progress,
                             checkpoint_path=ckpt, checkpoint_every=2,
                             on_checkpoint=on_ckpt)
    os.remove(ckpt)                     # the recycle eats gitignored state
    assert os.path.exists(twin)         # the committed twin survives
    import shutil
    shutil.copyfile(twin, ckpt)         # run.py's restore path
    out = nuts_sample_stepwise(logpdf, z0s, keys, cfg,
                               checkpoint_path=ckpt, resume=True)
    np.testing.assert_array_equal(np.asarray(out['samples']),
                                  np.asarray(ref['samples']))
    np.testing.assert_array_equal(np.asarray(out['logp']),
                                  np.asarray(ref['logp']))


def test_whiten_anchor_flags_pinned_direction():
    """A pinned direction (cov eigenvalue at the 1e-12 jitter) must be
    anchored: without the anchor the u-space target is flat along it and
    every NUTS tree runs to its depth cap."""
    cov = np.diag([1.0, 1e-12])
    to_z, to_u, L, anchor = whiten_transform(cov, np.zeros(2))
    assert anchor.sum() == 1.0

    def logpdf(z):
        return -0.5 * z[0] ** 2        # z[1] unconstrained (pinned slot)

    lp_u = whiten_logpdf(logpdf, L, np.zeros(2), anchor=anchor)
    cfg = NUTSConfig(num_warmup=50, num_samples=200, max_depth=6)
    out = nuts_sample(lp_u, jnp.zeros(2), random.PRNGKey(0), cfg)
    us = np.asarray(out['samples'])
    # the anchored coordinate behaves as a unit normal, not a random walk
    assert abs(us[:, list(anchor).index(1.0)].std() - 1.0) < 0.4
    zs = to_z(us)
    assert zs[:, 1].std() < 1e-5       # z stays pinned
    assert abs(zs[:, 0].std() - 1.0) < 0.3


@pytest.mark.slow
def test_ridge_cli_end_to_end(tmp_path):
    """--mass ridge through the real CLI at tiny config: MAP + blended
    metric + whitened sampling -> trace store with finite constrained
    draws, the committed-able whitening sidecar, and n_periods pinned."""
    import sys

    from tests._fastslow import FAST, n as _n

    if FAST:
        pytest.skip('PARA_FAST_SLOW: the CLI run is XLA:CPU-compile-bound '
                    '(~6 min even at minimal draws); the ridge mechanics '
                    'are covered by the fast-tier unit tests above')
    db = str(tmp_path / 'ridge_run')
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run(
        [sys.executable, '-m', 'parasitoids_tpu.bayes.run',
         '--new', str(_n(6, 3)), '8', db, '--sampler', 'nuts',
         '--chains', '2', '--mass', 'ridge', '--init-map-steps',
         str(_n(15, 6)), '--steps-per-call', '3', '--max-depth', '3',
         'domain_info=(10000.0,50)', 'interp_num=2', 'kernel_rad=6',
         'kernel_rad_local=3', 'quad_nodes=8', 'ndays=3'],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert os.path.exists(db + '.whiten.npz')
    with np.load(db + '.whiten.npz') as wz:
        assert wz['L'].shape[0] == wz['L'].shape[1]
        assert wz['anchor'].sum() >= 1.0          # pinned n_periods dir
    with np.load(db + '.npz') as d:
        tr = d['traces']
        assert str(d['sampler']) == 'nuts'
        assert tr.shape[0] == 2
        assert np.isfinite(tr).all()
        assert (tr[:, :, 13] == 30.0).all()       # n_periods pinned
        # z_samples are in z-space (mapped back from u): constraining
        # them must reproduce the stored constrained traces
        from parasitoids_tpu.bayes.nuts import make_transformed_logpdf
        from tests.test_nuts import _tiny_setup
        _, constrain, _ = make_transformed_logpdf(_tiny_setup())
        z = jnp.asarray(d['z_samples'][0, -1], jnp.float32)
        m, o, _ = constrain(z)
        got = np.concatenate([np.asarray(m), np.asarray(o)])
        np.testing.assert_allclose(got, tr[0, -1, :-1], rtol=2e-5,
                                   atol=1e-5)
