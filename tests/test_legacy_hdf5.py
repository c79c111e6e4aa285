"""Legacy PyMC-2 HDF5 trace migration (io/legacy_hdf5.py).

The reference stores chains in a PyMC-2 HDF5 database
(Bayes_Run.py:484-487); these tests build a synthetic database with the
same layout (chainN groups, PyMCsamples compound table, deterministic
reparameterizations tallied instead of the underlying stochastics,
Bayes_Run.py:105-128) and check the migration recovers this build's
column order and inverts the reparameterizations exactly.
"""

import json

import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

from parasitoids_tpu.bayes.priors import (MODEL_PARAM_NAMES,
                                          OBS_PARAM_NAMES)
from parasitoids_tpu.io.legacy_hdf5 import (migrate_hdf5_trace,
                                            read_pymc_hdf5)

SENT = ['B', 'C']


def _make_db(path, n=40, n_chains=2, rng=None, drop=()):
    """Synthetic PyMC-2-layout database: tallied names follow
    Bayes_Run.py (deterministics f_b1/f_b2/corr/corr_l; underlying _p
    stochastics are trace=False and absent)."""
    rng = rng or np.random.default_rng(0)
    tallied = ['lam', 'f_a1', 'f_a2', 'f_b1', 'f_b2', 'g_aw', 'g_bw',
               'sig_x', 'sig_y', 'corr', 'sig_xl', 'sig_yl', 'corr_l',
               'mu_r', 'n_periods', 'xi', 'em_obs_prob', 'grid_obs_prob',
               'A_collected', 'deviance'] \
        + ['sent_obs_probs_{}'.format(k) for k in SENT]
    tallied = [t for t in tallied if t not in drop]
    data = {}
    for t in tallied:
        if t in ('corr', 'corr_l'):
            data[t] = rng.uniform(-1, 1, n)
        else:
            data[t] = rng.uniform(0.1, 5.0, n)
    dtype = np.dtype([(t, np.float64) for t in tallied])
    with h5py.File(path, 'w') as f:
        for c in range(n_chains):
            tab = np.zeros(n, dtype)
            for t in tallied:
                tab[t] = data[t] + c          # chain offset
            f.create_group('chain{}'.format(c)).create_dataset(
                'PyMCsamples', data=tab)
    return data


def test_read_pymc_hdf5(tmp_path):
    db = tmp_path / 'legacy.hdf5'
    data = _make_db(str(db))
    chains, names = read_pymc_hdf5(str(db))
    assert len(chains) == 2
    np.testing.assert_allclose(chains[0]['g_aw'], data['g_aw'])
    np.testing.assert_allclose(chains[1]['g_aw'], data['g_aw'] + 1)
    assert 'deviance' in names


def test_migrate_inverts_reparameterizations(tmp_path):
    db = tmp_path / 'legacy.hdf5'
    data = _make_db(str(db))
    out = migrate_hdf5_trace(str(db), str(tmp_path / 'mig'), SENT)
    with np.load(out) as npz:
        tr = npz['traces']
    names = (list(MODEL_PARAM_NAMES) + list(OBS_PARAM_NAMES)
             + ['sent_obs_probs_{}'.format(k) for k in SENT])
    assert tr.shape == (2, 40, len(names) + 1)
    j = {n: i for i, n in enumerate(names)}
    np.testing.assert_allclose(tr[0, :, j['g_aw']], data['g_aw'])
    # deterministics inverted back to the underlying stochastics
    np.testing.assert_allclose(tr[0, :, j['f_b1_p']], data['f_b1'] - 1.0)
    np.testing.assert_allclose(tr[0, :, j['corr_p']],
                               (data['corr'] + 1.0) / 2.0)
    np.testing.assert_allclose(tr[1, :, j['corr_l_p']],
                               (data['corr_l'] + 1.0 + 1.0) / 2.0)
    # trailing column is -deviance/2, and the meta sidecar says so
    np.testing.assert_allclose(tr[0, :, -1], -0.5 * data['deviance'])
    with open(out.removesuffix('.npz') + '.meta.json') as f:
        meta = json.load(f)
    assert meta['resumable'] is False
    assert meta['missing_columns'] == []


def test_migrate_partial_tally_warns_not_fails(tmp_path):
    db = tmp_path / 'legacy.hdf5'
    _make_db(str(db), drop=('xi', 'deviance'))
    with pytest.warns(RuntimeWarning, match='xi'):
        out = migrate_hdf5_trace(str(db), str(tmp_path / 'mig'), SENT)
    with np.load(out) as npz:
        tr = npz['traces']
    names = (list(MODEL_PARAM_NAMES) + list(OBS_PARAM_NAMES)
             + ['sent_obs_probs_{}'.format(k) for k in SENT])
    assert np.isnan(tr[:, :, names.index('xi')]).all()
    assert np.isnan(tr[:, :, -1]).all()       # no deviance either


def test_not_a_pymc_db_raises(tmp_path):
    db = tmp_path / 'other.hdf5'
    with h5py.File(str(db), 'w') as f:
        f.create_dataset('something', data=np.zeros(3))
    with pytest.raises(ValueError, match='chainN'):
        read_pymc_hdf5(str(db))
