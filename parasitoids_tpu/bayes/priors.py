"""Prior distributions for the Bayesian model (L4).

Reproduces the reference's PyMC-2 prior system (Bayes_Run.py:102-196)
as jit-compatible log-density functions over the *underlying* sampled
parameters (the reference block-updates the underlying stochastics —
``corr_p``, ``f_b1_p``, … — and exposes deterministic reparameterizations;
we do the same: ``corr = 2*corr_p - 1``, ``f_b1 = f_b1_p + 1``).

PyMC-2 parameterization notes: ``Gamma(alpha, beta)`` uses rate beta;
``Normal(mu, tau)`` and ``TruncatedNormal(mu, tau, a, b)`` use precision
tau; ``Poisson(mu)`` is the discrete prior over the flight-duration
``n_periods``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, xlogy
from jax.scipy.stats import norm

__all__ = ['ModelParams', 'ObsParams', 'log_prior_model', 'log_prior_obs',
           'MODEL_PARAM_NAMES', 'OBS_PARAM_NAMES', 'initial_model_params',
           'initial_obs_params', 'STEP_SCALES', 'sent_obs_prior_alpha',
           'sample_prior_model', 'sample_prior_obs', 'OBS_EXTRA_NAME',
           'obs_extra_names']

# sampled model-parameter order = the reference's AM block
# (Bayes_Run.py:186-187)
MODEL_PARAM_NAMES = ('g_aw', 'g_bw', 'f_a1', 'f_b1_p', 'f_a2', 'f_b2_p',
                     'sig_x', 'sig_y', 'corr_p', 'sig_xl', 'sig_yl',
                     'corr_l_p', 'lam', 'n_periods', 'mu_r')

# observation-model parameters get individual Metropolis updates in the
# reference (PyMC default step methods); sent_obs_probs appended at runtime
OBS_PARAM_NAMES = ('xi', 'em_obs_prob', 'grid_obs_prob', 'A_collected')

# AM block starting proposal scales (Bayes_Run.py:188-196)
STEP_SCALES = np.array([0.04, 0.08, 0.25, 0.05, 0.25, 0.05, 2.0, 2.0,
                        0.0005, 2.0, 2.0, 0.0005, 0.0005, 1.0, 0.005])

# initial values (the `value=` kwargs, Bayes_Run.py:102-132)
_INIT_MODEL = np.array([1.0, 3.8, 6.0, 1.5, 20.0, 1.5, 180.0, 150.0, 0.5,
                        10.0, 10.0, 0.5, 0.95, 30.0, 1.0])


class ModelParams(NamedTuple):
    """The 15-dimensional AM block, in reference order."""
    g_aw: jnp.ndarray
    g_bw: jnp.ndarray
    f_a1: jnp.ndarray
    f_b1_p: jnp.ndarray
    f_a2: jnp.ndarray
    f_b2_p: jnp.ndarray
    sig_x: jnp.ndarray
    sig_y: jnp.ndarray
    corr_p: jnp.ndarray
    sig_xl: jnp.ndarray
    sig_yl: jnp.ndarray
    corr_l_p: jnp.ndarray
    lam: jnp.ndarray
    n_periods: jnp.ndarray
    mu_r: jnp.ndarray

    @property
    def corr(self):
        return 2.0 * self.corr_p - 1.0

    @property
    def corr_l(self):
        return 2.0 * self.corr_l_p - 1.0

    @property
    def f_b1(self):
        return self.f_b1_p + 1.0

    @property
    def f_b2(self):
        return self.f_b2_p + 1.0

    def hparams(self):
        return (self.lam, self.g_aw, self.g_bw, self.f_a1, self.f_b1,
                self.f_a2, self.f_b2)

    def Dparams(self):
        return (self.sig_x, self.sig_y, self.corr)

    def Dlparams(self):
        return (self.sig_xl, self.sig_yl, self.corr_l)


class ObsParams(NamedTuple):
    xi: jnp.ndarray
    em_obs_prob: jnp.ndarray
    grid_obs_prob: jnp.ndarray
    A_collected: jnp.ndarray
    sent_obs_probs: jnp.ndarray   # (n_sentinel_fields,)
    # optional observation-model extra parameter (beyond-reference, VERDICT
    # r3 item 6 — the thinned-Poisson PPC found under-dispersion): the
    # negative-binomial dispersion r (obs_model='negbin': var = mu+mu²/r,
    # r -> inf recovers Poisson) or the zero-inflation probability pi
    # (obs_model='zip').  0.0 = unused (plain Poisson).
    od: jnp.ndarray = 0.0


# observation-model variants: name and prior of the extra parameter.
# negbin r ~ Gamma(2, 0.1) (mean 20: mild overdispersion a priori, broad
# enough to reach r ~ 1 heavy tails); zip pi ~ Beta(1, 3) (mean 0.25,
# mass near 0 so the Poisson limit is easily reached)
OBS_EXTRA_NAME = {'poisson': None, 'negbin': 'nb_r', 'zip': 'zip_pi'}


def obs_extra_names(obs_model='poisson'):
    """Names of extra obs-parameter slots for the given variant (appended
    AFTER the sentinel probabilities in every packed obs vector)."""
    n = OBS_EXTRA_NAME[obs_model]
    return (n,) if n else ()


def initial_model_params():
    return _INIT_MODEL.copy()


def initial_obs_params(field_sizes_cells, cell_area, obs_model='poisson'):
    """Initial obs-parameter vector (Bayes_Run.py:132-164): sentinel
    observation probabilities start at 0.1*3600/field_area; variant
    extras start mildly non-Poisson (negbin r=10, zip pi=0.1)."""
    sent0 = 0.1 * 3600.0 / (np.asarray(field_sizes_cells) * cell_area)
    parts = [[0.75, 0.05, 0.005, 2500.0], sent0]
    if obs_model == 'negbin':
        parts.append([10.0])
    elif obs_model == 'zip':
        parts.append([0.1])
    return np.concatenate(parts)


# ----------------------------------------------------------------------
# log densities
# ----------------------------------------------------------------------

def _beta_logpdf(x, a, b):
    inside = (x > 0) & (x < 1)
    xs = jnp.clip(x, 1e-12, 1 - 1e-12)
    lp = (xlogy(a - 1, xs) + xlogy(b - 1, 1 - xs)
          + gammaln(a + b) - gammaln(a) - gammaln(b))
    return jnp.where(inside, lp, -jnp.inf)


def _gamma_logpdf(x, alpha, beta):
    """PyMC-2 Gamma(alpha, beta) with beta = rate."""
    lp = (xlogy(alpha - 1, x) - beta * x + alpha * jnp.log(beta)
          - gammaln(alpha))
    return jnp.where(x > 0, lp, -jnp.inf)


def _truncnorm_logpdf(x, mu, tau, a, b):
    """PyMC-2 TruncatedNormal(mu, tau, a, b); tau is precision."""
    sd = 1.0 / jnp.sqrt(tau)
    z = norm.logpdf(x, mu, sd)
    norm_const = jnp.log(norm.cdf((b - mu) / sd) - norm.cdf((a - mu) / sd))
    return jnp.where((x >= a) & (x <= b), z - norm_const, -jnp.inf)


def _normal_logpdf(x, mu, tau):
    return norm.logpdf(x, mu, 1.0 / jnp.sqrt(tau))


def _poisson_logpmf(k, mu):
    lp = xlogy(k, mu) - mu - gammaln(k + 1.0)
    return jnp.where(k >= 0, lp, -jnp.inf)


def log_prior_model(p: ModelParams):
    """Joint log prior over the AM block (Bayes_Run.py:102-131)."""
    lp = _beta_logpdf(p.lam, 5.0, 1.0)
    lp += _truncnorm_logpdf(p.f_a1, 6.0, 0.3, 0.0, 9.0)
    lp += _truncnorm_logpdf(p.f_a2, 20.0, 0.3, 15.0, 24.0)
    lp += _gamma_logpdf(p.f_b1_p, 2.0, 1.0)
    lp += _gamma_logpdf(p.f_b2_p, 2.0, 1.0)
    lp += _gamma_logpdf(p.g_aw, 2.2, 1.0)
    lp += _gamma_logpdf(p.g_bw, 5.0, 1.0)
    lp += _gamma_logpdf(p.sig_x, 26.0, 0.15)
    lp += _gamma_logpdf(p.sig_y, 15.0, 0.15)
    lp += _beta_logpdf(p.corr_p, 5.0, 5.0)
    lp += _gamma_logpdf(p.sig_xl, 2.0, 0.08)
    lp += _gamma_logpdf(p.sig_yl, 2.0, 0.14)
    lp += _beta_logpdf(p.corr_l_p, 5.0, 5.0)
    lp += _normal_logpdf(p.mu_r, 1.0, 1.0)
    lp += _poisson_logpmf(p.n_periods, 30.0)
    return lp


def sent_obs_prior_alpha(A_collected, field_areas, sent_beta=40.0):
    """Per-field Beta alpha for sentinel observation probabilities: the Beta
    mean is A_collected/field_area with fixed beta=40
    (Bayes_Run.py:155-166)."""
    mean = A_collected / field_areas
    return mean * sent_beta / (1.0 - mean)


# ----------------------------------------------------------------------
# prior samplers (jit-compatible) — the reference never samples its priors
# (PyMC 2 only evaluates them, Bayes_Run.py:102-196); these exist for the
# SMC sampler's prior-particle initialization (bayes/smc.py) and for
# prior-predictive checks.  Each sampler is the exact distribution whose
# log-density the corresponding ``log_prior_*`` evaluates.
# ----------------------------------------------------------------------

def _sample_gamma(key, alpha, rate):
    """PyMC-2 Gamma(alpha, beta=rate)."""
    from jax import random
    return random.gamma(key, alpha) / rate


def _sample_truncnorm(key, mu, tau, a, b):
    """PyMC-2 TruncatedNormal(mu, tau=precision, a, b)."""
    from jax import random
    sd = 1.0 / jnp.sqrt(jnp.asarray(tau, jnp.float32))
    lo = (a - mu) / sd
    hi = (b - mu) / sd
    return mu + sd * random.truncated_normal(key, lo, hi)


def sample_prior_model(key):
    """One draw of the 15-dim model block from the joint prior
    (the distributions of Bayes_Run.py:102-131, in MODEL_PARAM_NAMES
    order).  ``log_prior_model`` is finite at every draw."""
    from jax import random
    ks = random.split(key, 15)
    g_aw = _sample_gamma(ks[0], 2.2, 1.0)
    g_bw = _sample_gamma(ks[1], 5.0, 1.0)
    f_a1 = _sample_truncnorm(ks[2], 6.0, 0.3, 0.0, 9.0)
    f_b1_p = _sample_gamma(ks[3], 2.0, 1.0)
    f_a2 = _sample_truncnorm(ks[4], 20.0, 0.3, 15.0, 24.0)
    f_b2_p = _sample_gamma(ks[5], 2.0, 1.0)
    sig_x = _sample_gamma(ks[6], 26.0, 0.15)
    sig_y = _sample_gamma(ks[7], 15.0, 0.15)
    corr_p = random.beta(ks[8], 5.0, 5.0)
    sig_xl = _sample_gamma(ks[9], 2.0, 0.08)
    sig_yl = _sample_gamma(ks[10], 2.0, 0.14)
    corr_l_p = random.beta(ks[11], 5.0, 5.0)
    lam = random.beta(ks[12], 5.0, 1.0)
    n_periods = random.poisson(ks[13], 30.0).astype(jnp.float32)
    mu_r = 1.0 + random.normal(ks[14])
    return jnp.stack([g_aw, g_bw, f_a1, f_b1_p, f_a2, f_b2_p, sig_x, sig_y,
                      corr_p, sig_xl, sig_yl, corr_l_p, lam, n_periods,
                      mu_r])


def sample_prior_obs(key, field_areas, min_field_area,
                     obs_model='poisson'):
    """One draw of the observation-parameter vector from its joint prior
    (Bayes_Run.py:132-166), including the hierarchical sentinel
    observation probabilities Beta(alpha(A_collected), 40) and, for
    observation-model variants, the extra slot (see ``OBS_EXTRA_NAME``)."""
    from jax import random
    k_xi, k_em, k_gr, k_a, k_s, k_od = random.split(key, 6)
    xi = _sample_gamma(k_xi, 1.0, 1.0)
    em = random.uniform(k_em)
    gr = random.uniform(k_gr)
    a_coll = _sample_truncnorm(k_a, 2500.0, 1.0 / 2500.0, 0.0,
                               min_field_area)
    alpha = sent_obs_prior_alpha(a_coll, jnp.asarray(field_areas))
    sent = random.beta(k_s, alpha, 40.0)
    parts = [jnp.stack([xi, em, gr, a_coll]), sent]
    if obs_model == 'negbin':
        parts.append(jnp.stack([_sample_gamma(k_od, 2.0, 0.1)]))
    elif obs_model == 'zip':
        parts.append(jnp.stack([random.beta(k_od, 1.0, 3.0)]))
    return jnp.concatenate(parts)


def log_prior_obs(o: ObsParams, field_areas, min_field_area,
                  obs_model='poisson'):
    """Joint log prior over observation parameters (Bayes_Run.py:132-166).

    ``field_areas``: sentinel field areas in m² (cells × cell area);
    ``min_field_area``: truncation upper bound for A_collected.
    ``obs_model``: adds the variant extra-parameter prior (negbin
    r ~ Gamma(2, 0.1); zip pi ~ Beta(1, 3)) over ``o.od``.
    """
    lp = _gamma_logpdf(o.xi, 1.0, 1.0)
    lp += _beta_logpdf(o.em_obs_prob, 1.0, 1.0)
    lp += _beta_logpdf(o.grid_obs_prob, 1.0, 1.0)
    lp += _truncnorm_logpdf(o.A_collected, 2500.0, 1.0 / 2500.0, 0.0,
                            min_field_area)
    alpha = sent_obs_prior_alpha(o.A_collected, field_areas)
    # hierarchical: invalid whenever A_collected >= a field's area
    valid = jnp.all(alpha > 0)
    lp += jnp.where(valid,
                    jnp.sum(_beta_logpdf(o.sent_obs_probs, alpha, 40.0)),
                    -jnp.inf)
    if obs_model == 'negbin':
        lp += _gamma_logpdf(o.od, 2.0, 0.1)
    elif obs_model == 'zip':
        lp += _beta_logpdf(o.od, 1.0, 3.0)
    return lp
