"""Tests for scripts/salvage_nuts_ckpt.py (draw recovery from a stepwise
NUTS checkpoint).

The real-Carnarvon fit's 400-draw plan blew its session budget when tree
depth grew mid-run; the salvage tool turned its checkpoint's 252
completed draws into the recorded trace that every analysis CLI accepts
(carn_study/real/).  These tests pin the tool's contract: a draw-phase
checkpoint becomes a loadable store with constrained-space traces, a
warmup-phase checkpoint is refused, and an existing store is never
clobbered.  Checkpoint/recovery role of the reference's
try/except -> db.close (Bayes_Run.py:500-503).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'scripts', 'salvage_nuts_ckpt.py')
OVERRIDES = ['domain_info=(4000.0,100)']


@pytest.fixture(scope='module')
def zdim():
    from parasitoids_tpu.bayes.nuts import make_transformed_logpdf
    from parasitoids_tpu.bayes.run import build_setup
    _, _, z0 = make_transformed_logpdf(build_setup(OVERRIDES))
    return int(z0.shape[0])


def _run(db):
    return subprocess.run(
        [sys.executable, SCRIPT, db, *OVERRIDES],
        capture_output=True, text=True, cwd=REPO)


def _write_ckpt(path, zdim, phase='draw', i=7, chains=2, cap=10):
    rng = np.random.default_rng(0)
    np.savez(path, phase=phase, i=i, cfg_sig=np.zeros(9),
             z=rng.normal(size=(chains, zdim)),
             lp=np.zeros(chains), grad=np.zeros((chains, zdim)),
             key=np.zeros((chains, 2), np.uint32),
             step_size=np.full(chains, 0.1),
             inv_mass=np.broadcast_to(np.eye(zdim), (chains, zdim, zdim)),
             samples=rng.normal(scale=0.3, size=(chains, cap, zdim)),
             logp=rng.normal(size=(chains, cap)),
             astat=np.ones((chains, cap)), div=np.zeros((chains, cap)))


def test_salvage_draw_phase(tmp_path, zdim):
    db = str(tmp_path / 'run')
    _write_ckpt(db + '.ckpt.npz', zdim, i=7)
    r = _run(db)
    assert r.returncode == 0, r.stderr
    with np.load(db + '.npz') as d:
        assert int(d['salvaged_draws']) == 7
        assert str(d['sampler']) == 'nuts'
        tr = d['traces']
        assert tr.shape[0] == 2 and tr.shape[1] == 7
        # constrained params + logpost column, all finite
        assert np.isfinite(tr).all()
        assert d['z_samples'].shape == (2, 7, zdim)
    # checkpoint left untouched for a later full resume
    assert os.path.exists(db + '.ckpt.npz')


def test_salvage_refuses_warmup_phase(tmp_path, zdim):
    db = str(tmp_path / 'warm')
    _write_ckpt(db + '.ckpt.npz', zdim, phase='warmup', i=3)
    r = _run(db)
    assert r.returncode == 1
    assert 'warmup' in r.stdout
    assert not os.path.exists(db + '.npz')


def test_salvage_never_clobbers_completed_store(tmp_path, zdim):
    db = str(tmp_path / 'done')
    _write_ckpt(db + '.ckpt.npz', zdim)
    np.savez(db + '.npz', traces=np.zeros((1, 1, 2)))
    before = os.path.getmtime(db + '.npz')
    r = _run(db)
    assert r.returncode == 0
    assert 'already exists' in r.stdout
    assert os.path.getmtime(db + '.npz') == before


def test_salvage_gibbs_restores_n_periods_column(tmp_path, zdim):
    """A --gibbs-n checkpoint records the sampled n_periods in 'ns';
    constrain() pins slot 13 at 30, so the salvage must rebuild the
    column (ADVICE r3: a silently wrong n_periods passed every CLI)."""
    db = str(tmp_path / 'gib')
    rng = np.random.default_rng(1)
    chains, cap, i = 2, 10, 6
    sig = np.zeros(9)
    sig[6] = 1                        # gibbs flag
    ns = rng.integers(25, 35, size=(chains, cap)).astype(np.float32)
    np.savez(db + '.ckpt.npz', phase='draw', i=i, cfg_sig=sig,
             z=rng.normal(size=(chains, zdim)),
             n=np.full(chains, 30.0),
             lp=np.zeros(chains), grad=np.zeros((chains, zdim)),
             key=np.zeros((chains, 2), np.uint32),
             step_size=np.full(chains, 0.1),
             inv_mass=np.broadcast_to(np.eye(zdim), (chains, zdim, zdim)),
             samples=rng.normal(scale=0.3, size=(chains, cap, zdim)),
             logp=rng.normal(size=(chains, cap)),
             astat=np.ones((chains, cap)), div=np.zeros((chains, cap)),
             ns=ns, nacc=np.ones((chains, cap), bool))
    r = _run(db)
    assert r.returncode == 0, r.stderr
    with np.load(db + '.npz') as d:
        tr = d['traces']
        np.testing.assert_array_equal(tr[:, :, 13], ns[:, :6])


def test_salvage_ridge_maps_u_space(tmp_path, zdim):
    """A --mass ridge checkpoint stores u-space draws; with the whitening
    sidecar present the salvage maps them to z before constraining (u
    treated as z would silently produce garbage traces)."""
    db = str(tmp_path / 'ridge')
    rng = np.random.default_rng(2)
    _write_ckpt(db + '.ckpt.npz', zdim, i=5)
    L = np.diag(np.full(zdim, 0.05))
    center = rng.normal(scale=0.2, size=zdim)
    np.savez(db + '.whiten.npz', L=L, center=center,
             anchor=np.zeros(zdim))
    r = _run(db)
    assert r.returncode == 0, r.stderr
    assert 'ridge run' in r.stdout
    with np.load(db + '.ckpt.npz') as c, np.load(db + '.npz') as d:
        u = c['samples'][:, :5]
        expect = (u.astype(np.float64) @ L.T + center).astype(np.float32)
        np.testing.assert_allclose(d['z_samples'], expect, atol=1e-6)
        assert np.isfinite(d['traces']).all()
