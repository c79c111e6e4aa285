"""The obs_sweeps knob must survive the store round trip: the meta always
records the kernel actually used, and a plain resume inherits it (review
findings, round 2 — PT lost the value entirely; an AM resume override was
honored but never written back, so the next resume reverted)."""

import json

import pytest

TINY = ['ndays=3', 'domain_info=(10000.0,50)', 'interp_num=2',
        'kernel_rad=6', 'kernel_rad_local=3', 'quad_nodes=8']


def _meta(db):
    with open(db + '.meta.json') as fh:
        return json.load(fh)


def test_am_resume_override_written_back(tmp_path):
    from parasitoids_tpu.bayes import run as brun

    db = str(tmp_path / 'am_run')
    brun.main(['--new', '4', '2', db, '--obs-sweeps', '2'] + TINY)
    assert _meta(db)['obs_sweeps'] == 2

    # override on resume is honored AND recorded
    brun.main(['--resume', db, '3', '--obs-sweeps', '5'] + TINY)
    assert _meta(db)['obs_sweeps'] == 5

    # plain resume inherits the recorded value (not the original)
    brun.main(['--resume', db, '2'] + TINY)
    assert _meta(db)['obs_sweeps'] == 5


def test_pt_meta_stores_and_inherits_obs_sweeps(tmp_path):
    from parasitoids_tpu.bayes import run as brun

    db = str(tmp_path / 'pt_run')
    brun.main(['--new', '6', '3', db, '--sampler', 'pt', '--temps', '2',
               '--swap-every', '3', '--obs-sweeps', '3'] + TINY)
    assert _meta(db)['obs_sweeps'] == 3

    brun.main(['--resume', db, '3', '--sampler', 'pt'] + TINY)
    assert _meta(db)['obs_sweeps'] == 3


def test_obs_sweeps_rejects_nonpositive():
    from parasitoids_tpu.bayes import run as brun
    with pytest.raises(SystemExit):
        brun.parser.parse_args(['--new', '1', '0', 'x', '--obs-sweeps', '0'])
    with pytest.raises(SystemExit):
        brun.parser.parse_args(['--new', '1', '0', 'x', '--obs-sweeps',
                                '-1'])
