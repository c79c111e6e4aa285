"""Tests for the observation projections (L3→L4).

Direct numerical parity with the reference's Bayes_funcs on identical
inputs: the reference functions are pure numpy/scipy, so we feed them the
same synthetic population fields (as the CSR lists they expect) and our
LocInfo object (attribute-compatible with the reference's)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse

from parasitoids_tpu.io.locinfo import LocInfo
from parasitoids_tpu.models.observe import ObservationOps
from tests import _reference_oracle as ref_oracle

KALBAR_LATLONG = (-27.947131, 152.584171)
DOMAIN = (10000.0, 400)
NDAYS = 18


@pytest.fixture(scope='module')
def locinfo():
    return LocInfo('kalbar', KALBAR_LATLONG, DOMAIN)


@pytest.fixture(scope='module')
def fields():
    rng = np.random.default_rng(3)
    D = 2 * DOMAIN[1] + 1
    f = np.zeros((NDAYS, D, D), np.float32)
    # population concentrated near the center, like a real run
    c = DOMAIN[1]
    for d in range(NDAYS):
        r = 30 + 3 * d
        block = rng.uniform(0, 50, (2 * r + 1, 2 * r + 1))
        f[d, c - r:c + r + 1, c - r:c + r + 1] = block
    return f


@pytest.fixture(scope='module')
def obs_ops(locinfo):
    return ObservationOps(locinfo, DOMAIN, NDAYS)


def _load_ref_bayes_funcs():
    import sys
    if ref_oracle.load_reference() is None:
        return None
    sys.path.insert(0, ref_oracle.REF_PATH)
    try:
        import Bayes_funcs
    finally:
        sys.path.remove(ref_oracle.REF_PATH)
    return Bayes_funcs


def test_emergence_parity(locinfo, fields, obs_ops):
    bf = _load_ref_bayes_funcs()
    if bf is None:
        pytest.skip('reference tree unavailable')
    modelsol = [sparse.csr_matrix(f) for f in fields]
    want_rel, want_sent = bf.popdensity_to_emergence(modelsol, locinfo)

    got_rel, got_sent = obs_ops.project_emergence(fields)
    assert len(got_rel) == len(want_rel) == 1
    assert len(got_sent) == len(want_sent) == 1
    np.testing.assert_allclose(np.asarray(got_rel[0]), want_rel[0],
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_sent[0]), want_sent[0],
                               rtol=2e-4)


def test_grid_parity(locinfo, fields, obs_ops):
    bf = _load_ref_bayes_funcs()
    if bf is None:
        pytest.skip('reference tree unavailable')
    modelsol = [sparse.csr_matrix(f) for f in fields]
    want = bf.popdensity_grid(modelsol, locinfo)
    got = np.asarray(obs_ops.project_grid(fields))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_card_parity(locinfo, fields, obs_ops):
    bf = _load_ref_bayes_funcs()
    if bf is None:
        pytest.skip('reference tree unavailable')
    modelsol = [sparse.csr_matrix(f) for f in fields]
    want = bf.popdensity_card(modelsol, locinfo, DOMAIN)
    got = obs_ops.project_card(fields)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5)


def test_shapes_match_observations(locinfo, fields, obs_ops):
    """Model projections must align with observed-data arrays — the shape
    contract the Poisson likelihood depends on (ref test_Bayes.py:135-191)."""
    rel, sent = obs_ops.project_emergence(fields)
    for model, data in zip(rel, locinfo.release_emerg):
        assert model.shape == data.shape
    for model, data in zip(sent, locinfo.sentinel_emerg):
        assert model.shape == data.shape
    grid = obs_ops.project_grid(fields)
    assert grid.shape == locinfo.grid_obs.shape
    card = obs_ops.project_card(fields)
    for model, data in zip(card, locinfo.card_obs):
        assert model.shape == data.shape


def test_host_variants_match_jitted(fields, obs_ops):
    """The NumPy projections used by viz tooling must agree with the jitted
    ones (including the jnp out-of-bounds-gather clamp for short runs)."""
    rel_j, sent_j = obs_ops.project_emergence(fields)
    rel_n, sent_n = obs_ops.project_emergence_np(fields)
    for j, n in zip(rel_j, rel_n):
        np.testing.assert_allclose(np.asarray(j), n, rtol=1e-5)
    for j, n in zip(sent_j, sent_n):
        np.testing.assert_allclose(np.asarray(j), n, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(obs_ops.project_grid(fields)),
                               obs_ops.project_grid_np(fields), rtol=1e-5)
    for j, n in zip(obs_ops.project_card(fields),
                    obs_ops.project_card_np(fields)):
        np.testing.assert_allclose(np.asarray(j), n, rtol=1e-5)
    # short run exercising the clamp path
    short = np.asarray(fields)[:2]
    np.testing.assert_allclose(
        np.asarray(obs_ops.project_grid(jnp.asarray(short))),
        obs_ops.project_grid_np(short), rtol=1e-5)


def test_short_run_warns_and_clamps_consistently():
    """A simulation shorter than the observation schedule warns (instead
    of the reference's bare IndexError) and the jitted/host grid gathers
    agree on the clamped day."""
    import warnings

    from parasitoids_tpu.io.locinfo import LocInfo
    from parasitoids_tpu.models.observe import ObservationOps

    li = LocInfo('demo', (-27.0, 152.0), (2000.0, 25))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        oo = ObservationOps(li, (2000.0, 25), 2)   # obs run to day 5
    assert any('truncated' in str(x.message) for x in w)
    assert (oo.grid_days <= 1).all()
    fields = np.linspace(0, 1, 2 * 51 * 51).reshape(2, 51, 51)
    np.testing.assert_allclose(np.asarray(oo.project_grid(fields)),
                               oo.project_grid_np(fields), rtol=1e-6)
    # card day clamped the same way
    assert all(day <= 1 for day, _ in oo.card_gathers)


def test_release_day_observation_rejected():
    import pandas as pd
    import pytest

    from parasitoids_tpu.io.locinfo import LocInfo
    from parasitoids_tpu.models.observe import ObservationOps

    li = LocInfo('demo', (-27.0, 152.0), (2000.0, 25))
    li.grid_obs_datesPR = [pd.Timedelta(days=0)] + li.grid_obs_datesPR[1:]
    with pytest.raises(ValueError, match='release day'):
        ObservationOps(li, (2000.0, 25), 4)


def test_pop_model_requires_r_dur():
    import pytest

    from parasitoids_tpu.config import Params
    from parasitoids_tpu.models.forward import setup_forward

    p = Params()
    p.cmd_line_chg(['--kalbar', 'ndays=2', 'domain_info=(2000.0,25)'])
    p.PROB_MODEL = False
    p.r_dur = None
    with pytest.raises(ValueError, match='r_dur'):
        setup_forward(p)
