"""Carnarvon: the second site through the inference stack (CI tier).

The reference cannot fit anything but Kalbar (Data_Import.py:491-492
raises NotImplementedError); this build's carnarvon site
(scripts/make_carnarvon_site.py — real wind + release protocol, synthetic
geometry, observations simulated from a documented truth) exercises the
r_dur=5 multi-day-release cohort likelihood under inference.  These tests
run a tiny config; the recorded full-scale MAP -> AM -> NUTS fit lives in
docs/CARNARVON.md.
"""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from parasitoids_tpu.config import Params

CARN_COORD = (-24.851614, 113.731267)


def _params(domain=(4000.0, 50)):
    p = Params()
    p.cmd_line_chg(['--carnarvon'])
    p.PLOT = False
    p.OUTPUT = False
    p.PROB_MODEL = False
    p.domain_info = domain
    p.interp_num = 2
    p.kernel_rad = 8
    p.kernel_rad_local = 3
    p.quad_nodes = 8
    return p


def test_carnarvon_site_locinfo():
    from parasitoids_tpu.io.locinfo import LocInfo

    li = LocInfo('carnarvon', CARN_COORD, (4000.0, 50))
    # the 11 sentinel fields carry the real emergence table's labels
    assert len(li.sent_ids) == 11
    assert li.releasefield_id == '00'
    assert set(li.sent_ids) == {'22', '25', '26', '27', '30', '35', '37',
                                '38', '39', '40', '41'}
    assert len(li.collection_datesPR) == 2
    assert [d.days for d in li.collection_datesPR] == [26, 30]
    # two collections of sentinel + release observations, 3 grid obs days
    assert len(li.sentinel_emerg) == 2
    assert li.sentinel_emerg[0].shape[0] == 11
    assert len(li.release_emerg) == 2
    assert li.grid_obs.shape == (25, 3)
    # the simulated dataset is non-degenerate
    assert sum(a.sum() for a in li.sentinel_emerg) > 0
    assert li.grid_obs.sum() > 0


def test_carnarvon_preset_is_five_day_release():
    p = _params()
    assert p.r_dur == 5
    assert p.r_number == 40000
    assert p.r_start == pytest.approx(0.354)


@pytest.mark.slow
def test_carnarvon_bayes_logpost_and_grad():
    """Finite log-posterior and gradients through the r_dur=5 cohort
    likelihood — the release-ramp path (propagate_pop with 5 cohorts,
    origin holdback) under autodiff, which Kalbar (r_dur=1) never
    exercises."""
    import jax

    from parasitoids_tpu.bayes.model import BayesSetup
    from parasitoids_tpu.bayes.priors import (ModelParams, ObsParams,
                                              initial_model_params,
                                              initial_obs_params)

    s = BayesSetup(_params())
    assert s.r_dur == 5
    m = ModelParams(*jnp.asarray(initial_model_params(), jnp.float32))
    o0 = initial_obs_params(
        [s.locinfo.field_sizes[k] for k in s.locinfo.sent_ids],
        s.cell_res ** 2)
    o = ObsParams(o0[0], o0[1], o0[2], o0[3], jnp.asarray(o0[4:]))
    lp = float(s.log_posterior(m, o))
    assert np.isfinite(lp)
    g = jax.grad(lambda mm: s.log_posterior(mm, o))(m)
    gflat = jnp.concatenate([jnp.ravel(v) for v in g])
    assert bool(jnp.isfinite(gflat).all())
    assert float(jnp.abs(gflat).max()) > 0


@pytest.mark.slow
def test_carnarvon_short_am_chain():
    """A short AM chain advances on the carnarvon posterior (finite trace,
    state updates) — the end-to-end sampler path on the second site."""
    import jax
    from jax import random

    from parasitoids_tpu.bayes.model import BayesSetup
    from parasitoids_tpu.bayes.sampler import (MCMCConfig, init_chain_state,
                                               run_mcmc)

    s = BayesSetup(_params())
    state = init_chain_state(s, random.PRNGKey(0))
    _, trace = jax.block_until_ready(
        run_mcmc(s, state, MCMCConfig(n_samples=8)))
    trace = np.asarray(trace)
    assert trace.shape[0] == 8
    assert np.isfinite(trace[:, -1]).all()


def test_carnarvon_truth_sidecar_matches_site():
    """data/carnarvon_truth.json documents the simulated dataset's truth
    and stays consistent with the site's field set."""
    with open(os.path.join('data', 'carnarvon_truth.json')) as f:
        truth = json.load(f)
    assert truth['model']['n_periods'] == 30.0
    assert len(truth['sent_ids']) == 11
    assert len(truth['obs']) == 4 + 11


# ----------------------------------------------------------------------
# dataset=carnreal — the REAL Carnarvon-early field record
# (scripts/make_carnarvon_real_site.py; VERDICT r2 item 6)
# ----------------------------------------------------------------------

def test_carnreal_site_matches_field_record():
    """The committed carnreal site must reproduce the reference emergence
    file exactly: every (station, day) count from
    data/carnarvonearlemergence.txt (ref ParasitoidModel.py:28-60), under
    the exposure protocol with no release/grid channels."""
    from parasitoids_tpu.io.locinfo import LocInfo

    # parse the reference-format record directly
    with open(os.path.join('data', 'carnarvonearlemergence.txt')) as f:
        ids = f.readline().split()[1:]
        rows = [(int(p[0]), [int(v) for v in p[1:]])
                for p in (line.split() for line in f) if p]

    li = LocInfo('carnreal', (-24.851614, 113.731267), (10000.0, 200))
    assert li.sent_protocols == ['exposure']
    assert li.release_DataFrames == []
    assert li.sent_ids == ['S' + i for i in ids]
    em = li.sentinel_emerg[0]                      # (stations, dates)
    assert em.shape == (len(ids), len(rows))
    for col, (_, counts) in enumerate(rows):
        np.testing.assert_array_equal(em[:, col], counts)
    # wind reuse: the preset points at the real carnarvonearl wind file
    from parasitoids_tpu.config import Params
    pr = Params()
    pr.cmd_line_chg(['dataset=carnreal'])
    assert pr.site_name == 'data/carnarvonearl'
    assert pr.r_dur == 5 and pr.r_number == 40000


def test_carnreal_observation_ops():
    """Exposure windows partition days 1..21 and the station gathers hit
    distinct cells (S0 at the release cell, others on the assumed ring)."""
    from parasitoids_tpu.io.locinfo import LocInfo
    from parasitoids_tpu.models.observe import ObservationOps

    li = LocInfo('carnreal', (-24.851614, 113.731267), (10000.0, 200))
    ndays = 30                                    # carnarvonearl wind days
    oo = ObservationOps(li, (10000.0, 200), ndays)
    W = np.asarray(oo.sentinel_W[0])
    assert W.shape == (ndays, 11)
    # the 11 windows cover exactly days 1..21, once each
    assert W[:21].sum() == 21.0
    assert (W[:21].sum(axis=1) == 1.0).all()
    assert (W[21:] == 0).all()
    # S0's cells include the release cell (center of the 401^2 grid)
    c = 200
    s0 = li.field_cells['S0']
    assert any((r == c and col == c) for r, col in s0)
