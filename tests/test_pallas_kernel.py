"""Parity tests for the fused Pallas day-accumulate kernel.

Off-TPU the kernel runs in Pallas interpret mode; results must match the
XLA scatter path bit-for-tolerance.  (On TPU the same comparison runs
compiled; set PARA_TPU_TEST_PLATFORM=tpu.)
"""

import numpy as np
import pytest
import jax.numpy as jnp

from parasitoids_tpu.io import get_wind_data, pack_wind
from parasitoids_tpu.ops.daily_kernel import KernelConfig, build_daily_kernel

_DAY = {}


def _wind_setup(interp=2):
    if interp not in _DAY:
        wind_data, days = get_wind_data('data/kalbar', interp, '00:00')
        packed = pack_wind(wind_data, days, ndays=len(days))
        T = packed.shape[1]
        flat = jnp.asarray(packed.reshape(-1, 2), jnp.float32)
        cumsum = jnp.concatenate(
            [jnp.zeros((1, 2), flat.dtype), jnp.cumsum(flat, axis=0)])
        _DAY[interp] = (flat, cumsum, T)
    return _DAY[interp]


@pytest.mark.parametrize('day_idx,start', [(0, 0), (3, 0), (0, 37)])
def test_pallas_matches_xla_path(day_idx, start):
    flat, cumsum, T = _wind_setup()
    import jax
    interpret = jax.default_backend() != 'tpu'
    base = dict(rad_res=60, periods=T, K=10, K_local=4, G=8)
    cfg_x = KernelConfig(**base)
    cfg_p = KernelConfig(**base, pallas=True, interpret=interpret)

    hparams = tuple(np.float32(v)
                    for v in (1.0, 1.8, 6.0, 7.0, 2.0, 19.0, 2.0))
    args = (flat, cumsum, jnp.int32(day_idx), hparams,
            (21.1, 10.6, 0.3), (5.8, 5.0, 0.1), jnp.float32(1.1),
            jnp.int32(10), jnp.float32(1500.0), jnp.int32(start))

    pmf_x, loss_x = build_daily_kernel(*args, cfg_x)
    pmf_p, loss_p = build_daily_kernel(*args, cfg_p)

    np.testing.assert_allclose(np.asarray(pmf_p), np.asarray(pmf_x),
                               atol=2e-6)
    np.testing.assert_allclose(float(loss_p), float(loss_x), atol=2e-6)
    np.testing.assert_allclose(float(pmf_p.sum()), 1.0, atol=1e-4)

def test_pallas_gradient_matches_xla_path():
    """The Pallas op's custom VJP recomputes through the XLA path — gradient
    users (MAP autodiff, NUTS) must get identical derivatives from both
    KernelConfig variants."""
    import jax

    flat, cumsum, T = _wind_setup()
    # shrink the wind so advection stays on-domain (off-domain blocks have
    # zero gradient and would make this test vacuous)
    flat = flat * 1e-3
    cumsum = cumsum * 1e-3
    interpret = jax.default_backend() != 'tpu'
    base = dict(rad_res=30, periods=T, K=6, K_local=3, G=8)
    cfg_x = KernelConfig(**base)
    cfg_p = KernelConfig(**base, pallas=True, interpret=interpret)

    hparams = tuple(np.float32(v)
                    for v in (1.0, 1.8, 6.0, 7.0, 2.0, 19.0, 2.0))
    weights = jnp.arange(61.0)[None, :] ** 2

    def objective(mu_r, sig_x, cfg):
        pmf, loss = build_daily_kernel(
            flat, cumsum, jnp.int32(1), hparams, (sig_x, 10.6, 0.3),
            (5.8, 5.0, 0.1), mu_r, jnp.int32(10), jnp.float32(500.0),
            jnp.int32(0), cfg)
        return (pmf * weights).sum() + loss

    g_p = jax.grad(objective, argnums=(0, 1))(
        jnp.float32(1.1), jnp.float32(21.1), cfg_p)
    g_x = jax.grad(objective, argnums=(0, 1))(
        jnp.float32(1.1), jnp.float32(21.1), cfg_x)
    for a, b in zip(g_p, g_x):
        assert float(b) != 0.0
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


@pytest.mark.parametrize('rho', [0.93, -0.93, 0.99, -0.99])
def test_pallas_high_rho_matches_xla_path(rho):
    """|ρ| ≥ 0.925 routes the Pallas day-accumulate through the Genz
    high-corr kernel variant (asymptotic series + tail quadrature); values
    must match the XLA path's ``_upper_highcorr`` branch (VERDICT r1
    item 3: the fused kernel previously pinned the 20-node low-corr
    quadrature everywhere, with an unmeasured degradation beyond 0.925)."""
    import jax

    flat, cumsum, T = _wind_setup()
    interpret = jax.default_backend() != 'tpu'
    base = dict(rad_res=60, periods=T, K=10, K_local=4, G=8)
    cfg_x = KernelConfig(**base)
    cfg_p = KernelConfig(**base, pallas=True, interpret=interpret)

    hparams = tuple(np.float32(v)
                    for v in (1.0, 1.8, 6.0, 7.0, 2.0, 19.0, 2.0))
    args = (flat, cumsum, jnp.int32(1), hparams,
            (21.1, 10.6, rho), (5.8, 5.0, 0.1), jnp.float32(1.1),
            jnp.int32(10), jnp.float32(1500.0), jnp.int32(0))

    pmf_x, loss_x = build_daily_kernel(*args, cfg_x)
    pmf_p, loss_p = build_daily_kernel(*args, cfg_p)

    np.testing.assert_allclose(np.asarray(pmf_p), np.asarray(pmf_x),
                               atol=3e-6)
    np.testing.assert_allclose(float(loss_p), float(loss_x), atol=3e-6)
    np.testing.assert_allclose(float(pmf_p.sum()), 1.0, atol=1e-4)


@pytest.mark.parametrize('rho', [0.93, 0.99])
def test_pallas_high_rho_gradient_matches_xla_path(rho):
    """Gradient parity of the high-|ρ| Pallas branch: its backward kernel
    rebuilds the primal block with the Genz form but contracts the SAME
    closed-form BVN CDF derivative lattices (exact for any ρ), so
    autodiff users see matching derivatives — including d/dρ across the
    branch itself."""
    import jax

    flat, cumsum, T = _wind_setup()
    flat = flat * 1e-3
    cumsum = cumsum * 1e-3
    interpret = jax.default_backend() != 'tpu'
    base = dict(rad_res=30, periods=T, K=6, K_local=3, G=8)
    cfg_x = KernelConfig(**base)
    cfg_p = KernelConfig(**base, pallas=True, interpret=interpret)

    hparams = tuple(np.float32(v)
                    for v in (1.0, 1.8, 6.0, 7.0, 2.0, 19.0, 2.0))
    weights = jnp.arange(61.0)[None, :] ** 2

    def objective(mu_r, sig_x, rho_, cfg):
        pmf, loss = build_daily_kernel(
            flat, cumsum, jnp.int32(1), hparams, (sig_x, 10.6, rho_),
            (5.8, 5.0, 0.1), mu_r, jnp.int32(10), jnp.float32(500.0),
            jnp.int32(0), cfg)
        return (pmf * weights).sum() + loss

    g_p = jax.grad(objective, argnums=(0, 1, 2))(
        jnp.float32(1.1), jnp.float32(21.1), jnp.float32(rho), cfg_p)
    g_x = jax.grad(objective, argnums=(0, 1, 2))(
        jnp.float32(1.1), jnp.float32(21.1), jnp.float32(rho), cfg_x)
    for a, b in zip(g_p, g_x):
        assert float(b) != 0.0
        # atol floor: near-zero components accumulate f32 cancellation
        # noise through the asymptotic series (~4e-6 observed)
        np.testing.assert_allclose(float(a), float(b), rtol=2e-4,
                                   atol=1e-5)


def test_pallas_backward_kernel_all_inputs():
    """Direct VJP parity of ``pallas_accumulate_day`` (whose backward is
    the Pallas ``_day_bwd_kernel`` with closed-form BVN derivatives)
    against autodiff through ``xla_accumulate_day`` — for every
    differentiable input (h_scat, cdf_mu, Dparams, cell) and with a
    nonzero cotangent on BOTH outputs (buffer and clipped-block loss)."""
    import jax
    from parasitoids_tpu.ops.daily_kernel import xla_accumulate_day
    from parasitoids_tpu.ops.pallas_kernel import pallas_accumulate_day

    interpret = jax.default_backend() != 'tpu'
    rng = np.random.default_rng(7)
    T, K, buf_len = 24, 5, 64
    n = 2 * K + 1
    h = jnp.asarray(rng.uniform(0.0, 1e-3, T), jnp.float32)
    mu = jnp.asarray(rng.uniform(-12.0, 12.0, (T, 2)), jnp.float32)
    # some interior blocks, some at the clip boundary (idx extremes)
    idx = jnp.asarray(rng.integers(0, buf_len - n + 1, (T, 2)), jnp.int32)
    clipped = jnp.asarray(rng.integers(0, 2, T), jnp.float32)
    w = jnp.asarray(rng.normal(size=(buf_len, buf_len)), jnp.float32)

    def obj(theta, path):
        Dp = (theta[0], theta[1], theta[2])
        hh = h * theta[3]
        mm = mu + theta[4]
        cl = clipped * theta[5]
        if path == 'pallas':
            buf, loss = pallas_accumulate_day(hh, mm, idx, cl, Dp,
                                              theta[6], K, 8, buf_len,
                                              interpret)
        else:
            buf, loss = xla_accumulate_day(hh, mm, idx, cl, Dp, theta[6],
                                           K, 8, buf_len)
        return (w * buf).sum() + 3.0 * loss

    theta = jnp.asarray([21.1, 10.6, 0.35, 1.0, 0.0, 1.0, 25.0],
                        jnp.float32)
    g_p = np.asarray(jax.grad(lambda t: obj(t, 'pallas'))(theta))
    g_x = np.asarray(jax.grad(lambda t: obj(t, 'xla'))(theta))
    assert np.all(np.isfinite(g_p))
    assert np.linalg.norm(g_x) > 0
    np.testing.assert_allclose(g_p, g_x, rtol=2e-4, atol=1e-7)
