"""ADVI + PSIS tests (bayes/vi.py).

Covers: the generic ADVI optimizer against an analytic correlated-Gaussian
target with known normalizer (full-rank recovers mean/covariance and the
evidence; mean-field ELBO is a strict lower bound under correlation), the
Zhang-Stephens generalized-Pareto fit on synthetic GPD data, PSIS k-hat
behavior for good/bad proposals, and (slow tier) fit_advi + vi_evidence +
the ``--sampler vi`` CLI on the real tiny model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from parasitoids_tpu.bayes.vi import (advi, gpd_fit, psis, q_draws,
                                      q_logpdf, vi_evidence)


def _mvn_target(offset):
    """Unnormalized 2-D correlated Gaussian: logZ_true = offset."""
    mu = jnp.asarray([1.5, -0.5])
    cov = jnp.asarray([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)
    _, logdet = jnp.linalg.slogdet(cov)
    lognorm = -0.5 * (2 * jnp.log(2 * jnp.pi) + logdet)

    def logpdf(z):
        d = z - mu
        return offset + lognorm - 0.5 * d @ prec @ d

    return logpdf, np.asarray(mu), np.asarray(cov)


def test_advi_fullrank_recovers_gaussian_and_evidence():
    import optax
    offset = -12.34
    logpdf, mu, cov = _mvn_target(offset)
    # learning_rate may be an optax schedule (Robbins-Monro style decay)
    res = advi(logpdf, jnp.zeros(2), random.PRNGKey(0), n_steps=3000,
               n_mc=8, learning_rate=optax.cosine_decay_schedule(0.1, 3000),
               fullrank=True)
    assert np.allclose(res['mu'], mu, atol=0.08)
    # implied covariance L L^T matches the target
    L = np.zeros((2, 2))
    L[np.tril_indices(2, -1)] = res['offdiag']
    L += np.diag(np.exp(res['log_diag']))
    assert np.allclose(L @ L.T, cov, atol=0.15)
    # for a Gaussian target the optimal full-rank ELBO equals logZ
    zs = q_draws(res, random.PRNGKey(1), 4000)
    logw = (np.asarray(jax.vmap(logpdf)(zs), np.float64)
            - np.asarray(jax.vmap(lambda z: q_logpdf(res, z))(zs),
                         np.float64))
    assert abs(logw.mean() - offset) < 0.05          # ELBO ~= logZ
    logz_is = (np.log(np.mean(np.exp(logw - logw.max()))) + logw.max())
    assert abs(logz_is - offset) < 0.05              # IS is consistent
    _, khat = psis(logw)
    assert khat < 0.5                                # excellent proposal


def test_advi_meanfield_elbo_is_strict_lower_bound():
    import optax
    offset = 3.0
    logpdf, mu, cov = _mvn_target(offset)
    res = advi(logpdf, jnp.zeros(2), random.PRNGKey(0), n_steps=3000,
               n_mc=8, learning_rate=optax.cosine_decay_schedule(0.1, 3000),
               fullrank=False)
    assert np.allclose(res['mu'], mu, atol=0.1)
    zs = q_draws(res, random.PRNGKey(1), 4000)
    logw = (np.asarray(jax.vmap(logpdf)(zs), np.float64)
            - np.asarray(jax.vmap(lambda z: q_logpdf(res, z))(zs),
                         np.float64))
    # KL(q || p) for the optimal mean-field fit of this target is
    # -0.5 log det(corr) - ... > 0.2; the ELBO must sit below logZ by it
    assert logw.mean() < offset - 0.1
    assert logw.mean() > offset - 2.0


def test_advi_active_mask_pins_inactive_coordinate():
    logpdf2, _, _ = _mvn_target(0.0)

    def logpdf(z):
        return logpdf2(z[:2])      # coordinate 2 is ignored by the model

    active = np.array([True, True, False])
    z0 = jnp.asarray([0.0, 0.0, 7.0])
    res = advi(logpdf, z0, random.PRNGKey(0), active=active, n_steps=200,
               n_mc=4, learning_rate=0.05)
    zs = np.asarray(q_draws(res, random.PRNGKey(1), 16))
    assert (zs[:, 2] == 7.0).all()
    assert res['mu'].shape == (2,)


def test_gpd_fit_recovers_shape():
    rng = np.random.default_rng(0)
    for k_true in (0.1, 0.5):
        u = rng.uniform(size=20000)
        x = np.sort((u ** (-k_true) - 1.0) / k_true)   # sigma = 1
        k, sigma = gpd_fit(x)
        assert abs(k - k_true) < 0.06
        assert abs(sigma - 1.0) < 0.1


def test_psis_khat_separates_good_and_bad_proposals():
    rng = np.random.default_rng(1)
    n = 4000
    # good: target N(0,1), proposal N(0, 1.3^2) -> light-tailed weights
    z = rng.normal(size=n) * 1.3
    logw_good = (-0.5 * z ** 2) - (-0.5 * (z / 1.3) ** 2 - np.log(1.3))
    _, k_good = psis(logw_good)
    assert k_good < 0.5
    # bad: proposal much narrower than target -> heavy-tailed weights
    z = rng.normal(size=n) * 0.4
    logw_bad = (-0.5 * z ** 2) - (-0.5 * (z / 0.4) ** 2 - np.log(0.4))
    _, k_bad = psis(logw_bad)
    assert k_bad > 0.7
    # smoothing never raises the max weight and preserves finiteness
    s, _ = psis(logw_bad)
    assert s.max() <= logw_bad.max() + 1e-12
    assert np.isfinite(s).all()


# ----------------------------------------------------------------------
# real (tiny) model
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


@pytest.fixture(scope='module')
def setup():
    return _tiny_setup()


@pytest.mark.slow
def test_fit_advi_tiny(setup):
    from parasitoids_tpu.bayes.vi import fit_advi
    res = fit_advi(setup, random.PRNGKey(0), n_steps=40, n_mc=2,
                   init='map', init_map_steps=40)
    assert np.isfinite(res['elbo_trace']).all()
    # the fixed n_periods slot is excluded from the variational family
    assert 13 not in set(res['idx'].tolist())
    ev = vi_evidence(setup, res, random.PRNGKey(1), n=24)
    assert np.isfinite(ev['elbo'])
    assert np.isfinite(ev['logz_is'])
    assert ev['zs'].shape[0] == 24
    assert np.isfinite(ev['logpost']).all()
    # ELBO <= IS logZ in expectation (Jensen); allow MC slack
    assert ev['elbo'] <= ev['logz_is'] + 5.0


@pytest.mark.slow
def test_vi_cli_smoke(tmp_path, monkeypatch):
    from parasitoids_tpu.bayes import run as bayes_run
    db = str(tmp_path / 'vi_smoke')
    monkeypatch.setattr(
        bayes_run, 'build_setup',
        lambda overrides=(): _tiny_setup())
    bayes_run.main(['--new', '8', '30', db, '--sampler', 'vi',
                    '--vi-mc', '2', '--init-map-steps', '30'])
    import json
    z = np.load(db + '.npz')
    assert z['traces'].shape[0] == 1
    assert z['traces'].shape[1] == 8
    meta = json.load(open(db + '.meta.json'))
    assert meta['sampler'] == 'vi'
    assert np.isfinite(meta['elbo'])
    assert np.isfinite(meta['logz_is'])
