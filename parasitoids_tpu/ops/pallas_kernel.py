"""Pallas TPU kernel: fused per-minute BVN build + accumulate (L2 hot path).

The daily dispersal kernel is a sum of ~1,440 wind-advected bivariate-normal
blocks (one per flight minute) scattered into a padded domain buffer
(ParasitoidModel.py:435-558 is the reference's Python/Fortran loop; the XLA
path in ops/daily_kernel.py is a chunked ``vmap`` + ``lax.scatter_add``).

This kernel fuses the whole day on-chip — per-minute blocks are built and
accumulated without leaving VMEM.  Note: since the XLA path switched to the
corner-CDF integrator (ops/bvn.py ``bvn_cell_masses``), its per-minute
intermediates are only ``(2K+2)²`` corner grids and it is typically the
faster path; this kernel still computes blocks with the conditional
-quadrature form (``bvn_cell_masses_quad``) and serves as the fused
alternative — benchmark both on the target chip before enabling
``use_pallas``.  Design:

* grid = (minutes,), executed sequentially on one TensorCore,
* the ``(D + 4K)²`` accumulation buffer lives in VMEM for the entire day
  (4 MB at D=801, K=50) and is written to HBM once,
* each minute computes its ``(2K+1)²`` block entirely in registers/VMEM —
  probability-space Gauss–Legendre quadrature of the conditional BVN
  decomposition (same math as ops/bvn.py: u-substitution through the x
  marginal, ``ndtr`` differences through the y conditional) — and
  accumulates it at its advection offset with a dynamic-slice add,
* per-minute bookkeeping for the reference's loss accounting
  (ParasitoidModel.py:546-558) — the window-truncation shortfall of
  boundary-straddling blocks — is accumulated in SMEM.

HBM traffic per day drops from ~2 GB (XLA path) to ~15 KB of per-minute
scalars + one 4 MB buffer writeback: the op becomes compute-bound on the
VPU's transcendentals (~240M ``ndtr`` evaluations/day).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .bvn import gauss_legendre

__all__ = ['pallas_accumulate_day', 'pallas_available']

_SQRT2 = float(np.sqrt(2.0))


def pallas_available() -> bool:
    """True when running on a TPU backend (Mosaic path); the kernel also
    runs anywhere under ``interpret=True`` (used by tests)."""
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:
        return False


def _ndtr(x):
    return 0.5 * lax.erf(x / _SQRT2) + 0.5


def _ndtri_from_u(u):
    """Inverse standard normal CDF via erf_inv (u in (0,1))."""
    return _SQRT2 * lax.erf_inv(2.0 * u - 1.0)


def _day_kernel(params_ref, h_ref, mu_ref, idx_ref, clip_ref, gl_ref,
                buf_ref, loss_ref, *, K, G, dtype):
    """One grid step = one flight minute."""
    import jax.experimental.pallas as pl

    t = pl.program_id(0)
    n = 2 * K + 1

    @pl.when(t == 0)
    def _():
        buf_ref[:] = jnp.zeros_like(buf_ref)
        loss_ref[0, 0] = jnp.asarray(0.0, dtype)

    sig_x = params_ref[0]
    sig_y = params_ref[1]
    rho = params_ref[2]
    cell = params_ref[3]
    mux = mu_ref[t, 0]
    muy = mu_ref[t, 1]
    h_t = h_ref[t]
    clip_t = clip_ref[t]

    tg = gl_ref[0, :]                                    # (G,) GL nodes
    wg = gl_ref[1, :]                                    # (G,) GL weights

    # x-column edges ascending with column index (ops/bvn.py orientation)
    col = lax.broadcasted_iota(jnp.int32, (n + 1, 1), 0).astype(dtype)
    xe = (col - (K + 0.5)) * cell                        # (n+1, 1)
    ue = _ndtr((xe - mux) / sig_x)                       # (n+1, 1)
    lo = ue[:-1, 0:1]                                    # (n, 1)
    hi = ue[1:, 0:1]
    half = 0.5 * (hi - lo)                               # (n, 1)
    mid = 0.5 * (hi + lo)

    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    eps1 = jnp.asarray(1.0 - np.finfo(np.float32).eps, dtype)
    uu = jnp.clip(mid + half * tg[None, :], tiny, eps1)  # (n, G)
    z = _ndtri_from_u(uu)                                # (n, G)

    m_cond = muy + rho * sig_y * z                       # (n, G)
    s_cond = jnp.maximum(sig_y * jnp.sqrt(1.0 - rho * rho), 1e-12)

    # y-row edges descending with row index; flatten (col, node) pairs
    row = lax.broadcasted_iota(jnp.int32, (1, n + 1), 1).astype(dtype)
    ye = ((K + 0.5) - row) * cell                        # (1, n+1)
    zz = (ye - m_cond.reshape(n * G, 1)) / s_cond        # (n*G, n+1)
    cdf = _ndtr(zz)
    d_phi = cdf[:, :-1] - cdf[:, 1:]                     # (n*G, n) rows

    coeff = (half * wg[None, :]).reshape(n * G, 1)       # (n*G, 1)
    weighted = (d_phi * coeff).reshape(n, G, n)
    block_t = jnp.sum(weighted, axis=1)                  # (n, n) [col, row]
    block = block_t.T                                    # (n, n) [row, col]

    bsum = jnp.sum(block)
    loss_ref[0, 0] += clip_t * h_t * (1.0 - bsum)

    r0 = idx_ref[t, 0]
    c0 = idx_ref[t, 1]
    cur = buf_ref[pl.ds(r0, n), pl.ds(c0, n)]
    buf_ref[pl.ds(r0, n), pl.ds(c0, n)] = cur + h_t * block


@partial(jax.jit,
         static_argnames=('K', 'G', 'buf_len', 'interpret'))
def pallas_accumulate_day(h_scat, cdf_mu, idx, clipped, Dparams, cell,
                          K: int, G: int, buf_len: int,
                          interpret: bool = False):
    """Accumulate all per-minute BVN blocks of one day into a padded buffer.

    Args:
        h_scat: (T,) per-minute take-off probability (0 for fully-off-domain
            blocks, matching the XLA path's ``h_scat``).
        cdf_mu: (T, 2) sub-cell mean offsets (meters).
        idx: (T, 2) int32 scatter start (row, col) in the padded buffer;
            must satisfy 0 <= idx <= buf_len - (2K+1) (the XLA path's CLIP
            guarantee holds by construction, ops/daily_kernel.py:150-158).
        clipped: (T,) 1.0 where the block straddles the domain boundary.
        Dparams: (sig_x, sig_y, rho) flight diffusion.
        cell: cell side (m).
        K, G: window half-width / quadrature nodes (static).
        buf_len: padded buffer side, D + 4K (static).
        interpret: run in Pallas interpret mode (tests off-TPU).

    Returns:
        (buf, loss_corr): (buf_len, buf_len) accumulated buffer and the
        scalar clipped-block truncation loss  sum_t clip_t h_t (1 - bsum_t).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = h_scat.dtype
    T = h_scat.shape[0]
    sig_x, sig_y, rho = Dparams
    params = jnp.stack([jnp.asarray(sig_x, dtype), jnp.asarray(sig_y, dtype),
                        jnp.asarray(rho, dtype), jnp.asarray(cell, dtype)])

    t_np, w_np = gauss_legendre(G)
    gl = jnp.stack([jnp.asarray(t_np, dtype), jnp.asarray(w_np, dtype)])

    kernel = partial(_day_kernel, K=K, G=G, dtype=dtype)
    buf, loss = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # params (4,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # h (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # mu (T,2)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # idx (T,2)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # clipped (T,)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # GL nodes/wts (2,G)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),       # buf, VMEM-resident
            pl.BlockSpec(memory_space=pltpu.SMEM),       # loss (1,1)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((buf_len, buf_len), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ),
        interpret=interpret,
    )(params, h_scat, cdf_mu, idx, clipped, gl)
    return buf, loss[0, 0]
