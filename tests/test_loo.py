"""WAIC / PSIS-LOO (bayes/loo.py): exact-conjugate validation plus the
pointwise decomposition contract against the real likelihood."""

import numpy as np
import pytest
from scipy import stats
from scipy.special import logsumexp

from parasitoids_tpu.bayes.loo import (group_loglik, loo_compare,
                                       point_groups, point_labels,
                                       pointwise_matrix, psis_loo, report,
                                       waic)


def _normal_ll_matrix(rng, y, s=4000, mu0=0.0, tau0=1.0):
    """Posterior draws + (S, N) log-lik matrix for the conjugate model
    mu ~ N(mu0, tau0^2), y_i ~ N(mu, 1)."""
    n = y.shape[0]
    v_n = 1.0 / (1.0 / tau0 ** 2 + n)
    m_n = v_n * (mu0 / tau0 ** 2 + y.sum())
    mu_s = rng.normal(m_n, np.sqrt(v_n), size=s)
    ll = stats.norm.logpdf(y[None, :], loc=mu_s[:, None], scale=1.0)
    return mu_s, ll


def _exact_loo(y, mu0=0.0, tau0=1.0):
    """Analytic leave-one-out predictive densities for the same model."""
    n = y.shape[0]
    out = np.empty(n)
    for i in range(n):
        rest = np.delete(y, i)
        v = 1.0 / (1.0 / tau0 ** 2 + n - 1)
        m = v * (mu0 / tau0 ** 2 + rest.sum())
        out[i] = stats.norm.logpdf(y[i], loc=m, scale=np.sqrt(v + 1.0))
    return out


def test_psis_loo_matches_exact_conjugate_loo():
    rng = np.random.default_rng(0)
    y = rng.normal(0.3, 1.0, size=20)
    _, ll = _normal_ll_matrix(rng, y)
    res = psis_loo(ll)
    exact = _exact_loo(y)
    # pointwise agreement of the IS estimate with the analytic LOO density
    np.testing.assert_allclose(res['elpd_pointwise'], exact, atol=0.05)
    assert abs(res['elpd_loo'] - exact.sum()) < 0.2
    assert res['n_bad_khat'] == 0
    assert res['khat_max'] < 0.7
    # effective parameter count of a 1-parameter model ~ 1
    assert 0.5 < res['p_loo'] < 1.5


def test_waic_agrees_with_loo_when_well_behaved():
    rng = np.random.default_rng(1)
    y = rng.normal(-0.5, 1.0, size=30)
    _, ll = _normal_ll_matrix(rng, y)
    w = waic(ll)
    l = psis_loo(ll)
    assert abs(w['elpd_waic'] - l['elpd_loo']) < 0.2
    assert 0.5 < w['p_waic'] < 1.5
    assert w['n_high_p'] == 0
    # lppd >= elpd (the penalty is positive)
    assert w['lppd'] > w['elpd_waic']
    # report + diagnostic figure render
    txt = report(w, l, labels=['y[{}]'.format(i) for i in range(30)])
    assert 'WAIC' in txt and 'PSIS-LOO' in txt and 'y[' in txt
    import os
    import tempfile

    from parasitoids_tpu.bayes.loo import plot_loo
    with tempfile.TemporaryDirectory() as d:
        out = plot_loo(l, ['y[{}]'.format(i) for i in range(30)],
                       d + '/loo.png')
        assert os.path.getsize(out) > 0


def test_loo_compare_prefers_true_model():
    rng = np.random.default_rng(2)
    y = rng.normal(0.0, 1.0, size=40)
    _, ll_good = _normal_ll_matrix(rng, y)
    # misspecified alternative: fixed mu = 2 (no posterior uncertainty)
    ll_bad = np.repeat(stats.norm.logpdf(y, loc=2.0)[None, :], 64, axis=0)
    ll_bad += rng.normal(0.0, 1e-6, size=ll_bad.shape)  # non-degenerate var
    a = psis_loo(ll_good)
    b = psis_loo(ll_bad)
    cmp = loo_compare(a, b)
    assert cmp['elpd_diff'] > 0
    assert cmp['elpd_diff'] > 2 * cmp['se_diff']
    with pytest.raises(ValueError):
        loo_compare(a, {'elpd_pointwise': np.zeros(3)})


def test_khat_flags_heavy_tailed_weights():
    """A grossly mismatched proposal (posterior far from the LOO target)
    must surface as a large khat, not silently pass."""
    rng = np.random.default_rng(3)
    # one extreme outlier dominates its own leave-one-out weight tail
    y = np.concatenate([rng.normal(0.0, 1.0, size=29), [8.0]])
    _, ll = _normal_ll_matrix(rng, y)
    res = psis_loo(ll)
    assert res['khat'][-1] > 0.35         # the outlier's tail stands out
    assert res['khat'][:-1].max() < res['khat'][-1]


def test_grouped_loo_matches_exact_leave_pair_out():
    """Summing pointwise columns into pairs and running PSIS-LOO must
    estimate the exact leave-PAIR-out predictive density (conjugate
    normal-normal: the held-out pair is bivariate normal with shared
    posterior-mean uncertainty)."""
    rng = np.random.default_rng(4)
    n = 24
    y = rng.normal(0.1, 1.0, size=n)
    _, ll = _normal_ll_matrix(rng, y)
    gids = np.repeat(np.arange(n // 2), 2)        # consecutive pairs
    gll = group_loglik(ll, gids)
    assert gll.shape == (ll.shape[0], n // 2)
    np.testing.assert_allclose(gll.sum(axis=1), ll.sum(axis=1), rtol=1e-12)
    res = psis_loo(gll)

    exact = np.empty(n // 2)
    for g in range(n // 2):
        pair = y[2 * g:2 * g + 2]
        rest = np.delete(y, [2 * g, 2 * g + 1])
        v = 1.0 / (1.0 + rest.shape[0])
        m = v * rest.sum()
        cov = np.eye(2) + v                       # shared mu uncertainty
        exact[g] = stats.multivariate_normal.logpdf(pair, mean=[m, m],
                                                    cov=cov)
    np.testing.assert_allclose(res['elpd_pointwise'], exact, atol=0.07)


def test_point_groups_partition_the_columns():
    setup = _tiny_setup()
    n_cols = len(point_labels(setup))
    for by in ('date', 'block'):
        gids, labels = point_groups(setup, by=by)
        assert gids.shape == (n_cols,)
        assert set(gids) == set(range(len(labels)))
    g_block, l_block = point_groups(setup, by='block')
    assert len(l_block) == (len(setup.obs_release)
                            + len(setup.obs_sentinel) + 1)
    # grouped sums conserve the total log-likelihood
    ll = np.arange(2 * n_cols, dtype=np.float64).reshape(2, n_cols)
    np.testing.assert_allclose(group_loglik(ll, g_block).sum(axis=1),
                               ll.sum(axis=1))


# ----------------------------------------------------------------------
# integration against the real model (tiny config)
# ----------------------------------------------------------------------

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


def test_pointwise_decomposition_matches_loglik():
    import jax.numpy as jnp

    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)
    from parasitoids_tpu.bayes.sampler import _as_model, _as_obs

    setup = _tiny_setup()
    m = _as_model(jnp.asarray(initial_model_params(), jnp.float32))
    o0 = initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2)
    o = _as_obs(jnp.asarray(o0, jnp.float32), setup.n_sent)
    proj = setup.forward_projections(m)
    pll = np.asarray(setup.pointwise_loglik(proj, o), np.float64)
    total = float(setup.log_likelihood(proj, o))
    assert np.isfinite(pll).all()
    np.testing.assert_allclose(pll.sum(), total, rtol=2e-6)
    assert pll.shape[0] == len(point_labels(setup))


@pytest.mark.slow
def test_pointwise_matrix_from_trace():
    import jax.numpy as jnp

    from parasitoids_tpu.bayes.priors import (initial_model_params,
                                              initial_obs_params)

    setup = _tiny_setup()
    m0 = np.asarray(initial_model_params(), np.float32)
    o0 = np.asarray(initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2), np.float32)
    # fake 6-row trace: jittered initial point + dummy logpost column
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(6):
        m = m0 * (1.0 + 0.01 * rng.normal(size=m0.shape)).astype(np.float32)
        rows.append(np.concatenate([m, o0, [0.0]]))
    traces = np.stack(rows)[None]

    ll, take = pointwise_matrix(setup, traces, n_draws=4, seed=0)
    assert ll.shape == (4, len(point_labels(setup)))
    assert np.isfinite(ll).all()

    # each row must equal the likelihood evaluated at that draw
    from parasitoids_tpu.bayes.sampler import _as_model, _as_obs
    flat = traces.reshape(-1, traces.shape[-1])
    r0 = flat[take[0]]
    m = _as_model(jnp.asarray(r0[:15], jnp.float32))
    o = _as_obs(jnp.asarray(r0[15:15 + 4 + setup.n_sent], jnp.float32),
                setup.n_sent)
    proj = setup.forward_projections(m)
    np.testing.assert_allclose(
        ll[0].sum(), float(setup.log_likelihood(proj, o)), rtol=2e-6)

    w = waic(ll)
    l = psis_loo(ll)
    assert np.isfinite(w['elpd_waic'])
    assert np.isfinite(l['elpd_loo'])
