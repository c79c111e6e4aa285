"""Power-scaling sensitivity (bayes/sensitivity.py): CJS distance
machinery, analytic conjugate-normal diagnosis, and the full-model wiring."""

import numpy as np
import pytest
from scipy import stats

from parasitoids_tpu.bayes.sensitivity import (cjs_dist,
                                               powerscale_logweights,
                                               powerscale_sensitivity,
                                               report,
                                               sensitivity_from_trace)


def test_cjs_dist_properties():
    rng = np.random.default_rng(0)
    x = rng.normal(size=500)
    # uniform weights -> identical ECDFs -> zero distance
    assert cjs_dist(x, np.zeros(500)) == 0.0
    # constant shift of logw is weight-normalization-invariant
    logw = 0.3 * x
    assert cjs_dist(x, logw) == pytest.approx(cjs_dist(x, logw + 7.0))
    # distance grows with the tilt strength
    d = [cjs_dist(x, c * x) for c in (0.1, 0.3, 1.0)]
    assert 0 < d[0] < d[1] < d[2] <= 1.0
    # degenerate marginal (constant draws) -> 0, not NaN
    assert cjs_dist(np.full(100, 3.0), logw[:100]) == 0.0


def test_powerscale_logweights_alpha_one_is_uniform():
    rng = np.random.default_rng(1)
    dens = rng.normal(size=200)
    logw, _ = powerscale_logweights(dens, 1.0)
    np.testing.assert_allclose(logw, 0.0)


def _conjugate_case(rng, m0, s0, y, s, size=8000):
    """Exact posterior draws + per-draw log prior / log lik for
    theta ~ N(m0, s0^2), y | theta ~ N(theta, s^2)."""
    v = 1.0 / (1.0 / s0 ** 2 + 1.0 / s ** 2)
    m = v * (m0 / s0 ** 2 + y / s ** 2)
    th = rng.normal(m, np.sqrt(v), size)
    lp = stats.norm.logpdf(th, m0, s0)
    ll = stats.norm.logpdf(y, th, s)
    return th[:, None], lp, ll


def test_sensitivity_diagnoses_conjugate_regimes():
    """The three regimes of Kallioinen et al. (2023) on the conjugate
    normal model: data-dominated (no flag), prior-data conflict (both
    sensitivities high), prior-driven (prior high, likelihood ~0)."""
    rng = np.random.default_rng(0)
    t = 0.05

    # wide prior, precise data: posterior ignores the prior
    th, lp, ll = _conjugate_case(rng, 0.0, 10.0, 2.0, 0.1)
    r = powerscale_sensitivity(th, lp, ll, ['theta'])
    assert r['prior_sens'][0] < t
    assert r['diagnosis'][0] == ''

    # informative prior at 0 vs precise data at 5: they fight
    th, lp, ll = _conjugate_case(rng, 0.0, 1.0, 5.0, 0.5)
    r = powerscale_sensitivity(th, lp, ll, ['theta'])
    assert r['prior_sens'][0] >= t and r['lik_sens'][0] >= t
    assert r['diagnosis'][0] == 'prior-data conflict'

    # tight prior, nearly flat likelihood: prior-driven
    th, lp, ll = _conjugate_case(rng, 0.0, 0.1, 0.05, 10.0)
    r = powerscale_sensitivity(th, lp, ll, ['theta'])
    assert r['prior_sens'][0] >= t and r['lik_sens'][0] < t
    assert r['diagnosis'][0] == 'strong prior / weak likelihood'

    txt = report(r)
    assert 'strong prior' in txt and 'theta' in txt


def test_low_weight_ess_warning():
    """Huge log-likelihood spread across few draws (unconverged trace)
    concentrates the perturbed-posterior weights on one draw; the report
    must say the sensitivities are untrustworthy."""
    rng = np.random.default_rng(2)
    th = rng.normal(size=(12, 1))
    lp = np.zeros(12)
    ll = 1e4 * rng.normal(size=12)
    r = powerscale_sensitivity(th, lp, ll, ['theta'])
    assert min(r['ess_frac']['lik'].values()) < 0.1
    assert 'untrustworthy' in report(r)
    # well-behaved weights carry no such warning
    th, lp, ll = _conjugate_case(rng, 0.0, 1.0, 0.5, 1.0)
    r = powerscale_sensitivity(th, lp, ll, ['theta'])
    assert min(r['ess_frac']['lik'].values()) > 0.9
    assert 'untrustworthy' not in report(r)


def _tiny_setup():
    from parasitoids_tpu.bayes.model import BayesSetup
    from parasitoids_tpu.config import Params
    p = Params()
    p.cmd_line_chg(['--kalbar'])
    p.PLOT = False
    p.OUTPUT = False
    p.PROB_MODEL = False
    p.ndays = 3
    p.domain_info = (10000.0, 50)
    p.interp_num = 2
    p.kernel_rad = 6
    p.kernel_rad_local = 3
    p.quad_nodes = 8
    return BayesSetup(p)


@pytest.mark.slow
def test_sensitivity_from_trace_full_model(tmp_path):
    """End-to-end wiring on the real model: finite sensitivities for every
    sampled parameter, fixed n_periods column unflagged (degenerate
    marginal -> 0), and the saved-figure CLI path."""
    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)
    from parasitoids_tpu.bayes.sensitivity import plot_sensitivity

    setup = _tiny_setup()
    m0 = np.asarray(initial_model_params(), np.float32)
    o0 = np.asarray(initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2), np.float32)
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(8):
        m = m0 * (1.0 + 0.02 * rng.normal(size=m0.shape)).astype(np.float32)
        m[13] = 30.0                      # n_periods fixed, as in sampling
        o = o0 * (1.0 + 0.02 * rng.normal(size=o0.shape)).astype(np.float32)
        rows.append(np.concatenate([m, o, [0.0]]))
    traces = np.stack(rows)[None]

    res = sensitivity_from_trace(setup, traces, n_draws=6, seed=0)
    n_names = 15 + 4 + setup.n_sent
    assert len(res['names']) == n_names
    assert np.isfinite(res['prior_sens']).all()
    assert np.isfinite(res['lik_sens']).all()
    i_np = res['names'].index('n_periods')
    assert res['prior_sens'][i_np] == 0.0 and res['lik_sens'][i_np] == 0.0
    assert res['diagnosis'][i_np] == ''

    out = plot_sensitivity(res, str(tmp_path / 'sens.png'))
    import os
    assert os.path.getsize(out) > 0
