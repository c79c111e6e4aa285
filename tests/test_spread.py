"""Posterior spread maps (bayes/spread.py) — shapes, quantile ordering,
and figure output on the tiny generic demo site."""

import numpy as np
import pytest

from parasitoids_tpu.bayes.model import BayesSetup
from parasitoids_tpu.bayes.priors import (MODEL_PARAM_NAMES,
                                          initial_model_params)
from parasitoids_tpu.bayes.spread import (plot_spread, posterior_spread,
                                          save_spread)
from parasitoids_tpu.config import Params


@pytest.fixture(scope='module')
def demo_setup():
    p = Params()
    p.cmd_line_chg(['dataset=demo', 'domain_info=(2000.0,25)'])
    p.PLOT = False
    p.OUTPUT = False
    p.PROB_MODEL = False
    p.interp_num = 2
    p.kernel_rad = 6
    p.kernel_rad_local = 3
    p.quad_nodes = 8
    return BayesSetup(p)


def _fake_trace(n_rows, seed=0):
    """Rows of jittered initial model parameters (the spread reducer only
    reads the model block)."""
    rng = np.random.default_rng(seed)
    m0 = np.asarray(initial_model_params(), np.float64)
    rows = np.tile(m0, (n_rows, 1))
    jit = 1.0 + 0.05 * rng.standard_normal(rows.shape)
    ix = {n: i for i, n in enumerate(MODEL_PARAM_NAMES)}
    for name in ('sig_x', 'sig_y', 'mu_r'):       # keep every row in-support
        rows[:, ix[name]] *= jit[:, ix[name]]
    return rows


def test_posterior_spread_shapes_and_order(demo_setup, tmp_path):
    tr = _fake_trace(6)
    spread = posterior_spread(demo_setup, tr, n_draws=4, days=[1, 3],
                              quantiles=(0.1, 0.5, 0.9), seed=1)
    D = demo_setup.setup.scfg.dom_len
    assert spread['maps'].shape == (3, 2, D, D)
    assert spread['mean'].shape == (2, D, D)
    assert np.isfinite(spread['maps']).all()
    # cell-wise quantiles are ordered
    assert (np.diff(spread['maps'], axis=0) >= -1e-6).all()
    # the mean map carries real mass and the median stays between extremes
    assert spread['mean'].sum() > 0
    assert (spread['maps'][0] <= spread['mean'] * len(tr)).all()
    assert list(spread['days']) == [1, 3]

    out = save_spread(spread, str(tmp_path / 's.npz'))
    with np.load(out) as d:
        np.testing.assert_array_equal(d['maps'], spread['maps'])

    figs = plot_spread(spread, demo_setup.params,
                       str(tmp_path / 'spread'),
                       locinfo=demo_setup.locinfo)
    import os
    assert [os.path.basename(f) for f in figs] == ['spread_d1.png',
                                                   'spread_d3.png']
    assert all(os.path.getsize(f) > 0 for f in figs)


def test_posterior_spread_rejects_bad_days(demo_setup):
    with pytest.raises(ValueError, match='outside the simulated range'):
        posterior_spread(demo_setup, _fake_trace(3), days=[0])
    with pytest.raises(ValueError, match='outside the simulated range'):
        posterior_spread(demo_setup, _fake_trace(3),
                         days=[demo_setup.ndays + 1])


def test_posterior_spread_default_day_is_last(demo_setup):
    spread = posterior_spread(demo_setup, _fake_trace(3), n_draws=2)
    assert list(spread['days']) == [demo_setup.ndays]
    assert spread['maps'].shape[1] == 1


def test_prior_spread(demo_setup):
    from parasitoids_tpu.bayes.spread import prior_spread

    spread = prior_spread(demo_setup, n_draws=3, days=[2], seed=4)
    D = demo_setup.setup.scfg.dom_len
    assert spread['maps'].shape == (3, 1, D, D)
    assert np.isfinite(spread['maps']).all()
    assert spread['mean'].sum() > 0
