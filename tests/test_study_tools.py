"""Unattended-study tooling tests (VERDICT r2 item 5).

The round-2 chain runner half-landed three evidence items because its
support tools were fragile: ``summarize_sbc_ckpt.py`` crashed with
FileNotFoundError when a COMPLETED arm had (correctly) deleted its
checkpoint, and phase retries restarted from zero.  These tests pin the
repaired behavior: every (checkpoint, final-ranks) state maps to either a
recorded artifact or a loud, correct exit code — never an unhandled
traceback.  Resilience role of the reference's try/except -> db.close
blocks (Bayes_Run.py:500-503).
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'scripts', 'summarize_sbc_ckpt.py')


def _run(*argv):
    return subprocess.run([sys.executable, SCRIPT, *argv],
                          capture_output=True, text=True)


def _write_ckpt(path, done=12, dim=4, L=20, seed=0):
    rng = np.random.default_rng(seed)
    ranks = np.zeros((50, dim), np.int64)
    ranks[:done] = rng.integers(0, L + 1, (done, dim))
    np.savez(path, ranks=ranks, truths=np.zeros((50, dim)), done=done,
             L=L, seed=seed, sampler='am', warm=0,
             names=np.asarray(['p{}'.format(j) for j in range(dim)]))


def test_summarizer_writes_partial_block(tmp_path):
    ckpt = tmp_path / 'sbc_am.ckpt.npz'
    _write_ckpt(str(ckpt))
    r = _run(str(ckpt), 'am', str(tmp_path))
    assert r.returncode == 0, r.stderr
    with open(tmp_path / 'summary.json') as f:
        block = json.load(f)['samplers']['am']
    assert block['partial'] is True
    assert block['replicates'] == 12
    assert set(block['chi2_pvals']) == {'p0', 'p1', 'p2', 'p3'}


def test_summarizer_completed_and_cleaned_arm_is_success(tmp_path):
    """A completed arm deletes its checkpoint AFTER writing the final ranks
    npz — the summarizer must treat that as success (the exact state that
    crashed the round-2 chain, chain4_status.log FileNotFoundError)."""
    np.savez(tmp_path / 'sbc_am_ranks.npz', ranks=np.zeros((100, 4)),
             L=20, truths=np.zeros((100, 4)),
             names=np.asarray(['a', 'b', 'c', 'd']))
    r = _run(str(tmp_path / 'sbc_am.ckpt.npz'), 'am', str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert 'arm complete' in r.stdout


def test_summarizer_never_started_arm_fails_loudly(tmp_path):
    r = _run(str(tmp_path / 'sbc_am.ckpt.npz'), 'am', str(tmp_path))
    assert r.returncode == 1
    assert 'never started' in r.stdout


def test_summarizer_keeps_complete_block(tmp_path):
    """A partial summary must never clobber a COMPLETE block already
    recorded by run_sbc_study (e.g. a stale checkpoint from an older
    config lying around after the arm finished)."""
    with open(tmp_path / 'summary.json', 'w') as f:
        json.dump({'samplers': {'am': {'partial': False,
                                       'replicates': 100}}}, f)
    ckpt = tmp_path / 'sbc_am.ckpt.npz'
    _write_ckpt(str(ckpt), done=5)
    r = _run(str(ckpt), 'am', str(tmp_path))
    assert r.returncode == 0, r.stderr
    with open(tmp_path / 'summary.json') as f:
        block = json.load(f)['samplers']['am']
    assert block['replicates'] == 100      # untouched
