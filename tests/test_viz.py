"""Smoke + behavior tests for the visualization layer (L5).

The reference treats its plot scripts as visual QA (SURVEY.md section 4:
"Visual QA as tests") with no automated coverage; here every viz entry
point runs headless against synthetic or real-LocInfo inputs and the tests
assert the artifacts exist and the pure helpers behave correctly."""

import os

import numpy as np
import pytest

from parasitoids_tpu.io.locinfo import LocInfo
from parasitoids_tpu.viz import bayes_plot, compare, explore, info_plots
from parasitoids_tpu.viz import plot_result

KALBAR_LATLONG = (-27.947131, 152.584171)
DOMAIN = (10000.0, 400)
NDAYS = 18


@pytest.fixture(scope='module')
def locinfo():
    return LocInfo('kalbar', KALBAR_LATLONG, DOMAIN)


@pytest.fixture(scope='module')
def viz_params(request):
    from parasitoids_tpu.config import Params
    p = Params()
    p.cmd_line_chg(['--kalbar'])
    p.OUTPUT = False
    p.PLOT = False
    p.domain_info = DOMAIN
    p.maps_key = None          # no satellite fetch in tests
    return p


@pytest.fixture(scope='module')
def fields():
    rng = np.random.default_rng(7)
    D = 2 * DOMAIN[1] + 1
    f = np.zeros((NDAYS, D, D), np.float32)
    c = DOMAIN[1]
    for d in range(NDAYS):
        r = 30 + 3 * d
        f[d, c - r:c + r + 1, c - r:c + r + 1] = rng.uniform(
            0, 50, (2 * r + 1, 2 * r + 1))
    return f


def test_crop_to_support_centers_on_mass():
    field = np.zeros((101, 101))
    field[40:61, 45:56] = 1.0
    cropped, (r0, r1, c0, c1) = plot_result.crop_to_support(field, frame=5)
    assert (r0, r1, c0, c1) == (35, 66, 40, 61)
    assert cropped.shape == (r1 - r0, c1 - c0)
    # all significant mass is inside the window
    assert cropped.sum() == field.sum()


def test_crop_to_support_empty_field_is_identity():
    field = np.zeros((11, 11))
    cropped, window = plot_result.crop_to_support(field)
    assert cropped.shape == field.shape
    assert window == (0, 11, 0, 11)


def test_alpha_viridis_ramps_alpha():
    cmap = plot_result.alpha_viridis()
    cols = cmap(np.linspace(0, 1, 256))
    assert cols[0, -1] == 0.0          # transparent at zero
    assert cols[-1, -1] == 1.0         # opaque at max
    assert np.all(np.diff(cols[:, -1]) >= 0)


def test_get_satellite_without_key_returns_none():
    assert plot_result.get_satellite(None, KALBAR_LATLONG, 1000.0) is None


def test_plot_single_day(tmp_path, fields, viz_params):
    out = plot_result.plot(fields[3], 4, viz_params,
                           outfile=str(tmp_path / 'day4.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_plot_all_and_animation(tmp_path, fields, viz_params):
    outs = plot_result.plot_all(fields[:3], [1, 2, 3], viz_params,
                                outdir=str(tmp_path / 'all'))
    assert len(outs) == 3 and all(os.path.exists(o) for o in outs)
    gif = plot_result.create_animation(
        fields[:3], [1, 2, 3], viz_params,
        outfile=str(tmp_path / 'anim.gif'))
    assert os.path.exists(gif) and os.path.getsize(gif) > 0


def test_compare_emergence_and_fit(tmp_path, fields, viz_params, locinfo):
    out = compare.compare_emergence(fields, list(range(1, NDAYS + 1)),
                                    viz_params, locinfo,
                                    outfile=str(tmp_path / 'cmp.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0
    out = compare.assess_fit(fields, list(range(1, NDAYS + 1)),
                             viz_params, locinfo,
                             outfile=str(tmp_path / 'fit.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_compare_3d_figures(tmp_path, fields, viz_params, locinfo):
    """The reference's publication 3-D figure classes
    (CompareToData.py:124-132 paired emergence histograms, :363-443 fit
    surfaces with clipping + per-effort separation) render headless with
    3-D axes and nonzero content."""
    out = compare.compare_emergence_3d(
        fields, list(range(1, NDAYS + 1)), viz_params, locinfo,
        outfile=str(tmp_path / 'ce3.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 10000
    out = compare.assess_fit_3d(
        fields, list(range(1, NDAYS + 1)), viz_params, locinfo,
        outfile=str(tmp_path / 'af3.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 10000
    # bw variants exercise the grayscale styling branches
    out = compare.compare_emergence_3d(
        fields, list(range(1, NDAYS + 1)), viz_params, locinfo,
        outfile=str(tmp_path / 'ce3bw.png'), bw=True)
    assert os.path.exists(out)
    out = compare.assess_fit_3d(
        fields, list(range(1, NDAYS + 1)), viz_params, locinfo,
        outfile=str(tmp_path / 'af3bw.png'), bw=True)
    assert os.path.exists(out)


def test_banner(tmp_path, fields, viz_params, locinfo):
    out = compare.banner(fields, list(range(1, NDAYS + 1)), viz_params,
                         locinfo, outfile=str(tmp_path / 'banner.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_info_and_sample_location_plots(tmp_path, viz_params, locinfo):
    out = info_plots.info_plot(viz_params, locinfo,
                               outfile=str(tmp_path / 'info.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0
    out = info_plots.sample_locations(viz_params, locinfo,
                                      outfile=str(tmp_path / 'samples.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_bayes_plot_groups(tmp_path):
    """Histogram groups + trace/Geweke plots from a synthetic trace with the
    real parameter layout (model + obs + per-sentinel + logpost)."""
    from parasitoids_tpu.bayes.priors import (MODEL_PARAM_NAMES,
                                              OBS_PARAM_NAMES)
    n_sent = 4
    n_total = len(MODEL_PARAM_NAMES) + len(OBS_PARAM_NAMES) + n_sent + 1
    rng = np.random.default_rng(0)
    traces = rng.normal(size=(2, 60, n_total))

    outdir = str(tmp_path / 'diag')
    for fn in (bayes_plot.plot_f_g, bayes_plot.plot_sprd_vars,
               bayes_plot.plot_sent_obs_probs, bayes_plot.plot_other):
        out = fn(traces, outdir=outdir)
        assert os.path.exists(out) and os.path.getsize(out) > 0

    written = bayes_plot.plot_traces(traces[:, :30, :],
                                     outdir=str(tmp_path / 'tr'))
    # one figure per parameter plus the log-posterior column
    assert len(written) == n_total
    assert all(os.path.exists(w) for w in written)


def test_pt_ladder_plot(tmp_path):
    """PT ladder diagnostics render from synthetic ladder arrays."""
    from parasitoids_tpu.bayes.tempering import power_ladder
    T, steps = 5, 80
    betas = power_ladder(T)
    rng = np.random.default_rng(1)
    # hotter replicas sit at lower loglik, like a real tempered ladder
    lls = rng.normal(size=(T, steps)) - 100 * (1 - betas)[:, None]
    out = bayes_plot.plot_pt_ladder(
        betas, lls, swap_attempts=np.full(T - 1, 20.0),
        swap_accepts=rng.integers(0, 20, T - 1).astype(float),
        burn=30, outdir=str(tmp_path / 'ptd'))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_explore_plots(tmp_path):
    out = explore.plot_g_wind_prob(outfile=str(tmp_path / 'g.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0
    out = explore.plot_f_time_prob(outfile=str(tmp_path / 'f.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0
    out = explore.plot_h_flight_prob(outfile=str(tmp_path / 'h.png'))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_compare_bw_mode(tmp_path, fields, viz_params, locinfo):
    # the reference's --bw print styling (CompareToData.py:782-834)
    out = compare.compare_emergence(fields, list(range(1, NDAYS + 1)),
                                    viz_params, locinfo,
                                    outfile=str(tmp_path / 'cmp_bw.png'),
                                    bw=True)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    out = compare.banner(fields, list(range(1, NDAYS + 1)), viz_params,
                         locinfo, outfile=str(tmp_path / 'banner_bw.png'),
                         bw=True)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    out = compare.assess_fit(fields, list(range(1, NDAYS + 1)), viz_params,
                             locinfo, outfile=str(tmp_path / 'fit_bw.png'),
                             bw=True)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_grid_r_squared(fields, viz_params, locinfo):
    """The R² grid statistic the reference promised but never implemented
    (CompareToData.py:52-54): bounded above by 1, nan-free for the Kalbar
    grid days, and exactly 1 when the observations ARE the scaled model."""
    from parasitoids_tpu.viz import compare

    r2 = compare.grid_r_squared(fields, list(range(1, NDAYS + 1)),
                                viz_params, locinfo)
    assert set(r2) == {'per_day', 'pooled'}
    vals = list(r2['per_day'].values()) + [r2['pooled']]
    assert all(v <= 1.0 + 1e-9 for v in vals if np.isfinite(v))
    # self-consistency: scoring the model against itself gives R² = 1
    import copy
    li = copy.copy(locinfo)
    from parasitoids_tpu.models.observe import ObservationOps
    om = np.asarray(ObservationOps(
        locinfo, viz_params.domain_info, NDAYS).project_grid_np(fields))
    eff = np.asarray(locinfo.grid_samples, np.float64)
    exp = om * eff
    scale = np.where(exp.sum(0) > 0, 1.0, 1.0)
    li.grid_obs = exp * scale
    r2_self = compare.grid_r_squared(fields, list(range(1, NDAYS + 1)),
                                     viz_params, li)
    for v in list(r2_self['per_day'].values()) + [r2_self['pooled']]:
        assert v == pytest.approx(1.0, abs=1e-6) or np.isnan(v)


def test_satellite_zoom_resolution_windows():
    """Zoom-to-resolution search (ref Plot_Result.py:125-139): the chosen
    zoom must put the domain half-span in the service's pixel window —
    Google (320, 640], Bing (400, 800] — and the request covers the
    domain."""
    from parasitoids_tpu.viz.plot_result import _ground_res, satellite_zoom

    for dist in (1000.0, 8000.0, 10000.0):
        for service, lo, hi in (('Google', 320, 640), ('Bing', 400, 800)):
            zoom, pixel_len = satellite_zoom(-27.95, dist, service)
            res = _ground_res(-27.95, zoom)
            assert dist / lo < res <= dist / (lo // 2)
            assert lo < pixel_len <= hi + 1
            # the tile spans the domain at this resolution (the
            # reference's round() sizing is exact to within one pixel)
            assert pixel_len * res >= 2 * dist - res
