"""Tests for the daily dispersal-kernel builder (L2).

Ports the reference's behavioral tests (test_ParsitoidModel.py:300-408) and
adds a direct numerical parity test against the reference ``prob_mass``
running with our exact-BVN oracle substituted for the removed Fortran mvnun.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from parasitoids_tpu.io import get_wind_data, pack_wind
from parasitoids_tpu.ops.daily_kernel import (KernelConfig,
                                              build_daily_kernel,
                                              r_small_vals_dense)
from tests import _reference_oracle as ref_oracle

HPARAMS = (1.0, 1.8, 6.0, 7.0, 2.0, 19.0, 2.0)   # lam, g, f params (ref test fixtures)
DPARAMS = (150.0, 150.0, 0.25)
DLPARAMS = (2.0, 2.0, 0.0)
MU_R = 0.3
N_PERIODS = 6


def _setup(interp_num=2, rad_res=60, rad_dist=12000.0, K=10, Kl=4):
    wind_data, days = get_wind_data('data/kalbar', interp_num, '00:00')
    wf = pack_wind(wind_data, days)
    T = wf.shape[1]
    flat = jnp.asarray(wf.reshape(-1, 2))
    cs = jnp.concatenate([jnp.zeros((1, 2), flat.dtype),
                          jnp.cumsum(flat, axis=0)])
    cfg = KernelConfig(rad_res=rad_res, periods=T, K=K, K_local=Kl, G=12)
    return wind_data, days, flat, cs, cfg


def _build(flat, cs, cfg, day=0, hp=HPARAMS, Dp=DPARAMS, Dlp=DLPARAMS,
           mu_r=MU_R, n_per=N_PERIODS, rad_dist=12000.0, start_idx=0):
    pmf, loss = build_daily_kernel(flat, cs, jnp.int32(day), hp, Dp, Dlp,
                                   mu_r, jnp.int32(n_per), rad_dist,
                                   jnp.int32(start_idx), cfg)
    return np.asarray(pmf), float(loss)


def test_pmf_properties():
    _, _, flat, cs, cfg = _setup()
    pmf, loss = _build(flat, cs, cfg)
    assert pmf.min() >= 0.0
    # renormalized to a pmf (r_small_vals prob_model semantics)
    np.testing.assert_allclose(pmf.sum(), 1.0, atol=1e-5)
    # strong-wind minutes genuinely advect some mass beyond a 6 km domain
    assert -1e-6 <= loss < 0.05


def test_single_period_wind_direction():
    """Mass must land in the wind-direction quadrant (ref
    test_ParsitoidModel.py:300-354, the single-period trick): one 24 h wind
    sample pointing NE must put flown mass up-right of center.  As in the
    reference test, mu_r is scaled down to represent a 6-minute flight at
    full advection over the single 24 h period."""
    rad_res, rad_dist = 40, 4000.0
    cfg = KernelConfig(rad_res=rad_res, periods=1, K=8, K_local=4, G=12)
    # f params shifted so flight probability is nonzero at midnight
    hparams = (1.0, 1.8, 6.0, -4.0, 2.0, 19.0, 2.0)
    mu_r = 0.1 / 24
    flat = jnp.array([[1.2, 1.1]])   # m/s to the NE
    cs = jnp.concatenate([jnp.zeros((1, 2), flat.dtype),
                          jnp.cumsum(flat, axis=0)])
    pmf, _ = build_daily_kernel(flat, cs, jnp.int32(0), hparams,
                                (4.0, 4.0, 0.0),
                                DLPARAMS, mu_r, jnp.int32(1), rad_dist,
                                jnp.int32(0), cfg)
    pmf = np.asarray(pmf)
    c = rad_res
    # remove the local-diffusion remainder around the origin
    flown = pmf.copy()
    flown[c - 2:c + 3, c - 2:c + 3] = 0.0
    assert flown.sum() > 0
    upper_right = flown[:c, c + 1:].sum()
    assert upper_right / flown.sum() > 0.99


def test_start_time_leaves_more_mass_at_origin():
    """A mid-day release must skip morning flights, leaving more mass in the
    local-diffusion remainder (ref test_ParsitoidModel.py:392-408)."""
    _, _, flat, cs, cfg = _setup()
    full, _ = _build(flat, cs, cfg, start_idx=0)
    noon, _ = _build(flat, cs, cfg, start_idx=cfg.periods // 2)
    c = cfg.rad_res
    assert noon[c, c] > full[c, c]


def test_r_small_vals_dense():
    f = jnp.array([[0.5, 1e-10], [0.25, 0.2499999]])
    out = np.asarray(r_small_vals_dense(f, prob_model=True))
    assert out[0, 1] == 0.0
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-6)
    # plain mode: threshold only
    out2 = np.asarray(r_small_vals_dense(f, prob_model=False))
    assert out2[0, 1] == 0.0
    np.testing.assert_allclose(out2.sum(), float(f.sum()) - 1e-10, rtol=1e-6)


@pytest.mark.parametrize('day_offset,n_per', [(0, 6), (0, 1), (17, 6)])
def test_parity_with_reference(day_offset, n_per):
    """Field-level parity with the reference prob_mass (exact-BVN patched).

    day_offset=17 exercises the last-day wind extrapolation branch
    (ParasitoidModel.py:455-460); n_per=1 the no-averaging branch."""
    if ref_oracle.load_reference() is None:
        pytest.skip('reference tree unavailable')
    interp, rad_res, rad_dist = 2, 60, 12000.0
    wind_data, days, flat, cs, cfg = _setup(interp, rad_res, rad_dist)
    day = days[day_offset]
    want = ref_oracle.ref_prob_mass(day, wind_data, HPARAMS, DPARAMS,
                                    DLPARAMS, MU_R, n_per, rad_dist, rad_res)
    got, _ = _build(flat, cs, cfg, day=day_offset, n_per=n_per,
                    rad_dist=rad_dist)
    # our fixed window integrates slightly more tail mass than the
    # reference's 0.999-stopping adaptive rings; both renormalize, so
    # fields agree to ~1e-3 in total variation
    assert np.abs(got - want).max() < 3e-3
    assert np.abs(got - want).sum() < 1e-2


def test_ring_truncate_semantics():
    """``ring_truncate`` keeps exactly the smallest centered square with
    > 1 - cdf_eps mass (the reference's stopping rule) and keeps the full
    window when the threshold is never reached."""
    from parasitoids_tpu.ops.daily_kernel import ring_truncate

    K = 4
    n = 2 * K + 1
    # synthetic block: center 0.9, first ring 0.08 total, second 0.019,
    # rest tiny -> cumulative 0.9, 0.98, 0.999+ ... stops at h=2
    block = np.full((n, n), 1e-5, np.float32)
    block[K, K] = 0.9
    for (i, j) in [(K - 1, K), (K + 1, K), (K, K - 1), (K, K + 1)]:
        block[i, j] = 0.02
    block[K - 2, K] = 0.0191
    got = np.asarray(ring_truncate(jnp.asarray(block), K))
    i = np.arange(n)
    cheb = np.maximum(np.abs(i - K)[:, None], np.abs(i - K)[None, :])
    assert np.all(got[cheb > 2] == 0.0)
    np.testing.assert_array_equal(got[cheb <= 2], block[cheb <= 2])
    # threshold unreachable: everything kept
    small = jnp.asarray(block * 1e-3)
    np.testing.assert_array_equal(np.asarray(ring_truncate(small, K)),
                                  np.asarray(small))


def test_emulation_parity_with_reference():
    """With ``ref_trunc`` (the cdf_eps emulation mode) the per-day kernel
    matches the UNPATCHED reference stopping rule to near float precision —
    the closed-loop attribution of the ~1e-3 residual the fixed-window
    builder shows against the ring-truncating reference (VERDICT r1
    item 4)."""
    if ref_oracle.load_reference() is None:
        pytest.skip('reference tree unavailable')
    interp, rad_res, rad_dist = 2, 60, 12000.0
    wind_data, days, flat, cs, cfg = _setup(interp, rad_res, rad_dist)
    cfg = cfg._replace(ref_trunc=True)
    day = days[0]
    want = ref_oracle.ref_prob_mass(day, wind_data, HPARAMS, DPARAMS,
                                    DLPARAMS, MU_R, N_PERIODS, rad_dist,
                                    rad_res)
    got, _ = _build(flat, cs, cfg, day=0, rad_dist=rad_dist)
    # two orders tighter than the untruncated comparison above (3e-3):
    # the residual is now BVN quadrature + f32 accumulation only
    assert np.abs(got - want).max() < 4e-5
    assert np.abs(got - want).sum() < 4e-4


def test_parity_with_reference_start_time():
    if ref_oracle.load_reference() is None:
        pytest.skip('reference tree unavailable')
    interp, rad_res, rad_dist = 2, 60, 12000.0
    wind_data, days, flat, cs, cfg = _setup(interp, rad_res, rad_dist)
    start_frac = 0.354
    T = cfg.periods
    want = ref_oracle.ref_prob_mass(days[0], wind_data, HPARAMS, DPARAMS,
                                    DLPARAMS, MU_R, N_PERIODS, rad_dist,
                                    rad_res, start_time=start_frac)
    got, _ = _build(flat, cs, cfg, day=0, start_idx=int(start_frac * T))
    assert np.abs(got - want).max() < 3e-3


def test_f_time_prob_underflow_is_finite():
    """Both logistic slopes underflowing to a flat 0.5 must give an
    all-zero pmf with finite gradients, not 0/0 NaN (b1/b2 are sampled in
    log space; warmup overshoots reach this region)."""
    import jax

    from parasitoids_tpu.ops.flight import f_time_prob, h_flight_prob

    f = np.asarray(f_time_prob(48, 6.0, 1e-20, 20.0, 1e-20))
    assert np.isfinite(f).all() and f.sum() == 0.0

    def h_sum(b1):
        return jnp.sum(h_flight_prob(jnp.full(48, 0.5), 1.0, 1.8, 6.0,
                                     7.0, b1, 19.0, 1e-38))
    g = float(jax.grad(h_sum)(1e-38))
    assert np.isfinite(g)


def test_n_periods_zero_is_finite():
    """n_periods = 0 is in the Poisson prior's support and the AM proposal
    only rounds the discrete slot — the windowed wind average must floor
    the window at 1 instead of dividing by zero."""
    _, _, flat, cs, cfg = _setup()
    pmf, loss = _build(flat, cs, cfg, n_per=0)
    assert np.isfinite(pmf).all() and abs(pmf.sum() - 1.0) < 1e-4
    assert np.isfinite(loss)
    # floored window == n_periods 1
    pmf1, _ = _build(flat, cs, cfg, n_per=1)
    np.testing.assert_allclose(pmf, pmf1, atol=1e-7)


def test_r_small_vals_dense_degenerate_passthrough():
    from parasitoids_tpu.ops.daily_kernel import r_small_vals_dense

    tiny_field = jnp.full((5, 5), 1e-12)
    out = np.asarray(r_small_vals_dense(tiny_field, prob_model=True))
    np.testing.assert_array_equal(out, np.asarray(tiny_field))
