"""Pallas TPU kernel: fused per-minute BVN build + accumulate (L2 hot path).

The daily dispersal kernel is a sum of ~1,440 wind-advected bivariate-normal
blocks (one per flight minute) scattered into a padded domain buffer
(ParasitoidModel.py:435-558 is the reference's Python/Fortran loop; the XLA
path in ops/daily_kernel.py is a chunked ``vmap`` + ``lax.scatter_add``).
This kernel fuses the whole day on-chip:

* grid = (minutes,), executed sequentially on one TensorCore,
* the ``(D + 4K)²`` accumulation buffer lives in VMEM for the entire day
  (4 MB at D=801) and is written to HBM once,
* each minute computes its ``(2K+1)²`` block entirely in VMEM with the
  **same corner-CDF math as the default XLA path** (ops/bvn.py
  ``bvn_cell_masses``): Drezner–Wesolowsky upper-orthant probabilities on
  the shared ``(2K+2)²`` corner lattice, differenced.  The ρ-dependent
  quadrature constants (``sin θ_g`` nodes and weights of the correlation
  integral) are precomputed outside the kernel, so the inner loop is G
  ``exp`` sweeps over the corner grid plus two 1-D ``erf`` edge vectors,
* per-minute loss bookkeeping (the window-truncation shortfall of
  boundary-straddling blocks, ParasitoidModel.py:546-558) accumulates in
  SMEM.

One deliberate difference from the XLA path: the node count is fixed at
G=20 (the XLA path selects 6/12/20 from |ρ| via ``lax.switch`` — at
prior-typical |ρ| the extra nodes are pure margin).  The |ρ| ≥ 0.925
region gets its own kernel variant implementing Genz's asymptotic-series +
tail-quadrature form (``_corner_upper_high``, the same math as
ops/bvn.py ``_upper_highcorr``), selected by a ``lax.cond`` on the traced
ρ — value and gradient parity with the XLA path is tested at
ρ ∈ {0.93, 0.99} (tests/test_pallas_kernel.py), closing the accuracy gap
the 20-node low-corr quadrature would have beyond 0.925.  This path is
the **default on TPU** (validated on v5e: matches the
XLA path to ≤2e-7 per cell at the headline config, ~8× faster);
``use_pallas=True/False`` forces it either way.  Gradient-based drivers
(autodiff MAP, NUTS) use it too: the custom VJP's backward pass is a second
Pallas kernel (``_day_bwd_kernel``) built from the closed-form BVN CDF
derivatives (the same formulas as ops/bvn.py ``_cell_masses_jvp``), so the
log-density and its gradient come from the same on-chip computation.
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
_TWO_PI = 2.0 * np.pi
_G_NODES = 20
_SQRT_2PI_F = float(np.sqrt(2.0 * np.pi))


def pallas_available() -> bool:
    """True when running on a TPU backend (Mosaic path); the kernel also
    runs anywhere under ``interpret=True`` (used by tests)."""
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:
        return False


def _erf(x):
    """Polynomial erf (Abramowitz-Stegun 7.1.26, |abs err| <= 1.5e-7 — at
    f32 resolution).  Mosaic has no erf primitive, so the kernel carries its
    own; exp/mul/select all lower."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0, -y, y)


def _ndtr(x):
    return 0.5 * _erf(x / _SQRT2) + 0.5


def _corner_upper_low(xe, ye, quad_ref, G):
    """Upper-orthant probabilities on the corner lattice for |ρ| < 0.925:
    Drezner–Wesolowsky correlation-integral quadrature (the same math as
    ops/bvn.py ``_upper_lowcorr``).  quad rows = (sn_g, wfac_g, inv_g);
    the exponent is ≤ 0 for every node (|sn| ≤ |ρ| < 1)."""
    hk = xe * ye                                            # (n+1, n+1)
    hs = 0.5 * (xe * xe + ye * ye)
    U = jnp.zeros(hk.shape, hk.dtype)
    for g in range(G):
        U = U + quad_ref[1, g] * jnp.exp(
            (quad_ref[0, g] * hk - hs) * quad_ref[2, g])
    return U + _ndtr(-xe) * _ndtr(-ye)


def _corner_upper_high(xe, ye, quad_ref, sgn, a, inv_a, inv_a_sq, a_sq,
                       asq2_5, G):
    """|ρ| ≥ 0.925: Genz 2004 BVND complementary asymptotic series + tail
    quadrature, mirroring ops/bvn.py ``_upper_highcorr`` term for term.
    quad rows = (xs_g, inv_xs_g, ehk_g, inv_rs_g, aw_g) with
    xs_g = (a(1+x_g)/2)², ehk_g = (1−rs_g)/(2(1+rs_g)), aw_g = a·w_g/2 —
    all ρ-only, precomputed on the XLA side.  Overflowing lattice entries
    are always under a discarding ``where`` (same guards as the XLA path)."""
    h = xe                                                  # (1, n+1)
    k = ye * sgn                                            # (n+1, 1)
    hk = h * k                                              # (n+1, n+1)
    diff = h - k
    bs = diff * diff
    c = (4.0 - hk) * 0.125
    d = (12.0 - hk) * 0.0625
    asr = -(bs * inv_a_sq + hk) * 0.5
    bvn = jnp.where(asr > -80.0,
                    a * jnp.exp(jnp.clip(asr, -80.0, 0.0)) *
                    (1.0 - c * (bs - a_sq) * (1.0 - d * bs * 0.2) / 3.0 +
                     c * d * asq2_5), 0.0)
    b = jnp.sqrt(jnp.maximum(bs, 1e-30))
    term = (jnp.exp(jnp.clip(-hk * 0.5, -80.0, 80.0)) * _SQRT_2PI_F *
            _ndtr(-b * inv_a) * b *
            (1.0 - c * bs * (1.0 - d * bs * 0.2) / 3.0))
    bvn = bvn - jnp.where(-hk < 80.0, term, 0.0)
    for g in range(G):
        xs = quad_ref[0, g]
        inv_xs = quad_ref[1, g]
        ehk = quad_ref[2, g]
        inv_rs = quad_ref[3, g]
        aw = quad_ref[4, g]
        asr1 = -(bs * inv_xs + hk) * 0.5
        sp = 1.0 + c * xs * (1.0 + d * xs)
        ep = jnp.exp(-hk * ehk) * inv_rs
        bvn = bvn + jnp.where(asr1 > -80.0,
                              aw * jnp.exp(jnp.clip(asr1, -80.0, 0.0)) *
                              (ep - sp), 0.0)
    bvn = -bvn / _TWO_PI
    pos = bvn + _ndtr(-jnp.maximum(h, k))
    neg = -bvn + jnp.where(k > h, _ndtr(k) - _ndtr(h), 0.0)
    return jnp.where(sgn > 0, pos, neg)


def _hi_quad_params(rho, x, w, dtype):
    """ρ-only quadrature constants + scalar pack for the high-|ρ| branch
    (computed once per day on the XLA side)."""
    a_sq = jnp.maximum((1.0 - rho) * (1.0 + rho), 1e-30)
    a = jnp.sqrt(a_sq)
    a_half = a * 0.5
    xs = (a_half * (1.0 + x)) ** 2
    rs = jnp.sqrt(1.0 - xs)
    quad = jnp.stack([xs, 1.0 / xs, (1.0 - rs) / (2.0 * (1.0 + rs)),
                      1.0 / rs, a_half * w])
    scalars = (jnp.sign(rho).astype(dtype), a, 1.0 / a, 1.0 / a_sq, a_sq,
               a_sq * a_sq * 0.2)
    return quad, scalars


def _day_kernel(params_ref, quad_ref, h_ref, mux_ref, muy_ref, idxr_ref,
                idxc_ref, clip_ref, buf_ref, loss_ref, *, K, G, H, W, dtype,
                hi=False):
    """One grid step = one flight minute (corner-CDF block build).

    Mosaic only allows dynamic VMEM stores at tile-aligned starts (multiples
    of 8 sublanes x 128 lanes for f32), so the scatter start (r0, c0) is
    split into an aligned tile origin plus an in-tile offset (dr, dc); the
    block is built on the compact (2K+2)^2 corner lattice, zero-padded to an
    (H, W) tile, dynamically rotated into place with ``pltpu.roll`` (H and W
    are sized so neither rotate wraps), and added at the aligned origin."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    n = 2 * K + 1

    @pl.when(t == 0)
    def _():
        buf_ref[:] = jnp.zeros_like(buf_ref)
        loss_ref[0, 0] = jnp.asarray(0.0, dtype)

    sig_x = params_ref[0]
    sig_y = params_ref[1]
    cell = params_ref[2]
    mux = mux_ref[t]
    muy = muy_ref[t]
    h_t = h_ref[t]
    clip_t = clip_ref[t]

    r0 = idxr_ref[t]
    c0 = idxc_ref[t]
    r0a = pl.multiple_of((r0 // 8) * 8, 8)
    c0a = pl.multiple_of((c0 // 128) * 128, 128)
    dr = r0 - r0a                                           # in [0, 8)
    dc = c0 - c0a                                           # in [0, 128)

    # standardized corner coordinates (x ascending with column index,
    # y descending with row index — ops/bvn.py orientation)
    col = lax.broadcasted_iota(jnp.int32, (1, n + 1), 1).astype(dtype)
    row = lax.broadcasted_iota(jnp.int32, (n + 1, 1), 0).astype(dtype)
    xe = ((col - (K + 0.5)) * cell - mux) / sig_x           # (1, n+1)
    ye = (((K + 0.5) - row) * cell - muy) / sig_y           # (n+1, 1)

    if hi:
        U = _corner_upper_high(xe, ye, quad_ref, params_ref[3],
                               params_ref[4], params_ref[5], params_ref[6],
                               params_ref[7], params_ref[8], G)
    else:
        U = _corner_upper_low(xe, ye, quad_ref, G)

    # four-corner differences -> cell masses [row, col]
    # (y descends with row index, so the low-y corner is at row+1)
    rect = ((U[1:, :-1] - U[1:, 1:]) - (U[:-1, :-1] - U[:-1, 1:]))
    block = jnp.maximum(rect, 0.0)                          # (n, n)

    bsum = jnp.sum(block)
    loss_ref[0, 0] += clip_t * h_t * (1.0 - bsum)

    # place at the in-tile offset: static zero-pad to (H, W), then two
    # dynamic rotates (no wrap: n + 7 <= H, n + 127 <= W by construction)
    padded = lax.pad(h_t * block, jnp.asarray(0.0, dtype),
                     ((0, H - n, 0), (0, W - n, 0)))        # (H, W)
    placed = pltpu.roll(pltpu.roll(padded, dc, 1), dr, 0)

    cur = buf_ref[pl.ds(r0a, H), pl.ds(c0a, W)]
    buf_ref[pl.ds(r0a, H), pl.ds(c0a, W)] = cur + placed


@partial(jax.jit,
         static_argnames=('K', 'G', 'buf_len', 'interpret', 'hi'))
def _accumulate_impl(h_scat, cdf_mu, idx, clipped, Dparams, cell,
                     K: int, G: int, buf_len: int,
                     interpret: bool = False, hi: bool = False):
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
        K: window half-width (static).  G: accepted for interface parity
            with the XLA path; the corner quadrature always uses 20 nodes.
        buf_len: padded buffer side, D + 4K (static).
        interpret: run in Pallas interpret mode (tests off-TPU).

    Returns:
        (buf, loss_corr): the (buf_len, buf_len) accumulated buffer and the
        scalar clipped-block truncation loss  sum_t clip_t h_t (1 - bsum_t).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = h_scat.dtype
    T = h_scat.shape[0]
    n = 2 * K + 1
    # in-tile block placement (see _day_kernel): tile height covers n plus a
    # sublane offset < 8; width covers n plus a lane offset < 128
    H = -(-(n + 7) // 8) * 8
    W = -(-(n + 127) // 128) * 128
    # buffer large enough that every aligned tile start fits: max scatter
    # start is buf_len - n (CLIP guarantee), aligned down, plus the tile
    max_start = buf_len - n
    buf_rows = (max_start // 8) * 8 + H
    buf_cols = (max_start // 128) * 128 + W
    buf_rows = max(buf_rows, buf_len)
    buf_cols = max(buf_cols, buf_len)
    sig_x, sig_y, rho = Dparams
    sig_x = jnp.maximum(jnp.asarray(sig_x, dtype), 1e-8)
    sig_y = jnp.maximum(jnp.asarray(sig_y, dtype), 1e-8)
    rho = jnp.clip(jnp.asarray(rho, dtype), -1 + 1e-6, 1 - 1e-6)

    # rho-dependent quadrature constants, computed once per day on the
    # XLA side.  Low-|rho| branch: sn_g = sin(asr*(1+x_g)/2),
    # wfac_g = w_g*asr/(4*pi), inv_g = 1/(1 - sn_g^2).  High-|rho| branch
    # (hi=True): Genz-BVND constants from _hi_quad_params.
    Gq = _G_NODES
    x_np, w_np = gauss_legendre(Gq)
    x = jnp.asarray(x_np, dtype)
    w = jnp.asarray(w_np, dtype)
    if hi:
        quad, scal = _hi_quad_params(rho, x, w, dtype)
        params = jnp.stack([sig_x, sig_y, jnp.asarray(cell, dtype), *scal])
    else:
        asr = jnp.arcsin(rho)
        sn = jnp.sin(asr * 0.5 * (1.0 + x))
        wfac = w * asr / (2.0 * _TWO_PI)
        inv = 1.0 / (1.0 - sn * sn)
        quad = jnp.stack([sn, wfac, inv])                   # (3, Gq)
        params = jnp.stack([sig_x, sig_y, jnp.asarray(cell, dtype)])

    kernel = partial(_day_kernel, K=K, G=Gq, H=H, W=W, dtype=dtype, hi=hi)
    buf, loss = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            # 1-D SMEM arrays only: a 2-D (T, 2) SMEM window is padded
            # per-row to ~512 B and blows the 1 MB SMEM budget
            pl.BlockSpec(memory_space=pltpu.SMEM),       # params (3,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # quad (3, Gq)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # h (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # mu_x (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # mu_y (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # idx_r (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # idx_c (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # clipped (T,)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),       # buf, VMEM-resident
            pl.BlockSpec(memory_space=pltpu.SMEM),       # loss (1,1)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((buf_rows, buf_cols), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ),
        interpret=interpret,
    )(params, quad, h_scat, cdf_mu[:, 0], cdf_mu[:, 1],
      idx[:, 0], idx[:, 1], clipped)
    # the tile-alignment apron is provably zero (every block start satisfies
    # idx <= buf_len - (2K+1)); slice it off so the contract — and the
    # XLA-path backward rule — sees the same (buf_len, buf_len) shape
    return buf[:buf_len, :buf_len], loss[0, 0]


def _day_bwd_kernel(params_ref, quad_ref, h_ref, mux_ref, muy_ref, idxr_ref,
                    idxc_ref, clip_ref, ct_ref, dh_ref, dmux_ref, dmuy_ref,
                    dcl_ref, dscal_ref, *, K, G, H, W, dtype, hi=False):
    """Backward of one flight minute: gather the cotangent window, rebuild
    the primal block, and contract against the **closed-form** BVN CDF
    derivative lattices (ops/bvn.py ``_cell_masses_jvp``):

        ∂L/∂h = −φ(h) Φ(−(k − ρh)/√(1−ρ²))
        ∂L/∂k = −φ(k) Φ(−(h − ρk)/√(1−ρ²))
        ∂L/∂ρ = φ₂(h, k; ρ)          (Plackett's identity)

    so the backward costs ~the forward's quadrature rebuild plus three
    coefficient lattices — no per-node differentiation.  Per-minute
    gradients (dh, dμx, dμy, dclip) write to SMEM vectors; the shared
    scalars (dσx, dσy, dρ, dcell) accumulate in one SMEM row."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    n = 2 * K + 1

    @pl.when(t == 0)
    def _():
        dscal_ref[0, 0] = jnp.asarray(0.0, dtype)
        dscal_ref[0, 1] = jnp.asarray(0.0, dtype)
        dscal_ref[0, 2] = jnp.asarray(0.0, dtype)
        dscal_ref[0, 3] = jnp.asarray(0.0, dtype)

    sig_x = params_ref[0]
    sig_y = params_ref[1]
    rho = params_ref[2]
    cell = params_ref[3]
    inv_s = params_ref[4]                          # 1/√(1−ρ²)
    inv_s2 = params_ref[5]                         # 1/(1−ρ²)
    ct_loss = params_ref[6]
    mux = mux_ref[t]
    muy = muy_ref[t]
    h_t = h_ref[t]
    clip_t = clip_ref[t]

    r0 = idxr_ref[t]
    c0 = idxc_ref[t]
    r0a = pl.multiple_of((r0 // 8) * 8, 8)
    c0a = pl.multiple_of((c0 // 128) * 128, 128)
    dr = r0 - r0a
    dc = c0 - c0a

    # cotangent window: aligned tile, rotated back (cyclic, so a shift of
    # H−dr ≡ −dr; no wrap reaches [:n, :n] since dr + n <= H, dc + n <= W;
    # the where keeps the shift in [0, size) for Mosaic's dynamic roll)
    tile = ct_ref[pl.ds(r0a, H), pl.ds(c0a, W)]
    sr = jnp.where(dr == 0, 0, H - dr)
    sc = jnp.where(dc == 0, 0, W - dc)
    win = pltpu.roll(pltpu.roll(tile, sc, 1), sr, 0)
    ct_win = win[:n, :n]

    # --- primal rebuild (same math as _day_kernel) ---------------------
    col = lax.broadcasted_iota(jnp.int32, (1, n + 1), 1).astype(dtype)
    row = lax.broadcasted_iota(jnp.int32, (n + 1, 1), 0).astype(dtype)
    xe = ((col - (K + 0.5)) * cell - mux) / sig_x           # (1, n+1)
    ye = (((K + 0.5) - row) * cell - muy) / sig_y           # (n+1, 1)

    hk = xe * ye
    if hi:
        U = _corner_upper_high(xe, ye, quad_ref, params_ref[7],
                               params_ref[8], params_ref[9], params_ref[10],
                               params_ref[11], params_ref[12], G)
    else:
        U = _corner_upper_low(xe, ye, quad_ref, G)
    rect = ((U[1:, :-1] - U[1:, 1:]) - (U[:-1, :-1] - U[:-1, 1:]))
    block = jnp.maximum(rect, 0.0)
    bsum = jnp.sum(block)

    # --- direct gradients ----------------------------------------------
    dh_ref[t] = jnp.sum(ct_win * block) + ct_loss * clip_t * (1.0 - bsum)
    dcl_ref[t] = ct_loss * h_t * (1.0 - bsum)

    # cotangent on the block (buffer contribution h·block plus the loss
    # term −ct_loss·clip·h·bsum), masked by the max(rect, 0) clamp
    ctb = jnp.where(rect > 0, h_t * ct_win - ct_loss * clip_t * h_t, 0.0)

    # adjoint of the four-corner difference: ct_U[i,j] = ctb[i−1,j]
    # − ctb[i−1,j−1] − ctb[i,j] + ctb[i,j−1]  (out-of-range ctb = 0)
    zero = jnp.asarray(0.0, dtype)
    t1 = lax.pad(ctb, zero, ((1, 0, 0), (0, 1, 0)))
    t2 = lax.pad(ctb, zero, ((1, 0, 0), (1, 0, 0)))
    t3 = lax.pad(ctb, zero, ((0, 1, 0), (0, 1, 0)))
    t4 = lax.pad(ctb, zero, ((0, 1, 0), (1, 0, 0)))
    ctU = t1 - t2 - t3 + t4                                 # (n+1, n+1)

    # closed-form derivative lattices
    inv_sqrt2pi = jnp.asarray(1.0 / _SQRT_2PI_F, dtype)
    pdf_x = jnp.exp(-0.5 * xe * xe) * inv_sqrt2pi           # φ(xe), (1,n+1)
    pdf_y = jnp.exp(-0.5 * ye * ye) * inv_sqrt2pi           # φ(ye), (n+1,1)
    Lx = -pdf_x * _ndtr(-(ye - rho * xe) * inv_s)           # ∂U/∂xe_j
    Ly = -pdf_y * _ndtr(-(xe - rho * ye) * inv_s)           # ∂U/∂ye_i
    Q = (xe * xe - 2.0 * rho * hk + ye * ye) * inv_s2
    Lrho = jnp.exp(-0.5 * Q) * (inv_s / _TWO_PI)            # φ₂(xe, ye; ρ)

    dxe = jnp.sum(ctU * Lx, axis=0, keepdims=True)          # (1, n+1)
    dye = jnp.sum(ctU * Ly, axis=1, keepdims=True)          # (n+1, 1)

    # chain through the standardization
    dmux_ref[t] = -jnp.sum(dxe) / sig_x
    dmuy_ref[t] = -jnp.sum(dye) / sig_y
    dscal_ref[0, 0] += -jnp.sum(dxe * xe) / sig_x           # dσx
    dscal_ref[0, 1] += -jnp.sum(dye * ye) / sig_y           # dσy
    dscal_ref[0, 2] += jnp.sum(ctU * Lrho)                  # dρ
    dscal_ref[0, 3] += (jnp.sum(dxe * (col - (K + 0.5))) / sig_x
                        + jnp.sum(dye * ((K + 0.5) - row)) / sig_y)  # dcell


@partial(jax.jit, static_argnames=('K', 'G', 'buf_len', 'interpret', 'hi'))
def _accumulate_bwd_impl(ct_buf, ct_loss, h_scat, cdf_mu, idx, clipped,
                         Dparams, cell, K: int, G: int, buf_len: int,
                         interpret: bool = False, hi: bool = False):
    """Pallas backward of ``_accumulate_impl``: one sequential grid pass
    over the day's minutes against the (padded) buffer cotangent."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = h_scat.dtype
    T = h_scat.shape[0]
    n = 2 * K + 1
    H = -(-(n + 7) // 8) * 8
    W = -(-(n + 127) // 128) * 128
    max_start = buf_len - n
    buf_rows = max((max_start // 8) * 8 + H, buf_len)
    buf_cols = max((max_start // 128) * 128 + W, buf_len)

    sig_x_r, sig_y_r, rho_r = Dparams
    sig_x = jnp.maximum(jnp.asarray(sig_x_r, dtype), 1e-8)
    sig_y = jnp.maximum(jnp.asarray(sig_y_r, dtype), 1e-8)
    rho = jnp.clip(jnp.asarray(rho_r, dtype), -1 + 1e-6, 1 - 1e-6)
    s2 = jnp.maximum(1.0 - rho * rho, jnp.asarray(1e-12, dtype))
    s = jnp.sqrt(s2)
    base = [sig_x, sig_y, rho, jnp.asarray(cell, dtype),
            1.0 / s, 1.0 / s2, jnp.asarray(ct_loss, dtype)]

    Gq = _G_NODES
    x_np, w_np = gauss_legendre(Gq)
    x = jnp.asarray(x_np, dtype)
    w = jnp.asarray(w_np, dtype)
    if hi:
        quad, scal = _hi_quad_params(rho, x, w, dtype)
        params = jnp.stack(base + list(scal))
    else:
        asr = jnp.arcsin(rho)
        sn = jnp.sin(asr * 0.5 * (1.0 + x))
        wfac = w * asr / (2.0 * _TWO_PI)
        inv = 1.0 / (1.0 - sn * sn)
        quad = jnp.stack([sn, wfac, inv])
        params = jnp.stack(base)

    ct_pad = jnp.pad(jnp.asarray(ct_buf, dtype),
                     ((0, buf_rows - buf_len), (0, buf_cols - buf_len)))

    kernel = partial(_day_bwd_kernel, K=K, G=Gq, H=H, W=W, dtype=dtype,
                     hi=hi)
    dh, dmux, dmuy, dcl, dscal = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # params (7,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # quad (3, Gq)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # h (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # mu_x (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # mu_y (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # idx_r (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # idx_c (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # clipped (T,)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # ct buffer
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),       # dh (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # dmux (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # dmuy (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # dcl (T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # dscal (1, 4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T,), dtype),
            jax.ShapeDtypeStruct((T,), dtype),
            jax.ShapeDtypeStruct((T,), dtype),
            jax.ShapeDtypeStruct((T,), dtype),
            jax.ShapeDtypeStruct((1, 4), dtype),
        ),
        interpret=interpret,
    )(params, quad, h_scat, cdf_mu[:, 0], cdf_mu[:, 1],
      idx[:, 0], idx[:, 1], clipped, ct_pad)

    # clamp/clip VJPs of the sanitization above (flat outside the active
    # region, exactly like the XLA path's maximum/clip rules)
    dsig_x = jnp.where(jnp.asarray(sig_x_r, dtype) > 1e-8,
                       dscal[0, 0], 0.0)
    dsig_y = jnp.where(jnp.asarray(sig_y_r, dtype) > 1e-8,
                       dscal[0, 1], 0.0)
    drho = jnp.where(jnp.abs(jnp.asarray(rho_r, dtype)) < 1.0 - 1e-6,
                     dscal[0, 2], 0.0)
    dmu = jnp.stack([dmux, dmuy], axis=1)
    return dh, dmu, dcl, (dsig_x, dsig_y, drho), dscal[0, 3]



def _is_hi(Dparams, dtype):
    """Traced branch predicate: |ρ| ≥ 0.925 selects the Genz high-corr
    kernel variant (the same threshold as the XLA path's ``lax.switch``,
    ops/bvn.py ``bvn_upper_grid``)."""
    return jnp.abs(jnp.asarray(Dparams[2], dtype)) >= 0.925


def _accumulate_dispatch(h_scat, cdf_mu, idx, clipped, Dparams, cell,
                         K, G, buf_len, interpret):
    ops = (h_scat, cdf_mu, idx, clipped, Dparams, cell)
    return lax.cond(
        _is_hi(Dparams, h_scat.dtype),
        lambda o: _accumulate_impl(*o, K=K, G=G, buf_len=buf_len,
                                   interpret=interpret, hi=True),
        lambda o: _accumulate_impl(*o, K=K, G=G, buf_len=buf_len,
                                   interpret=interpret, hi=False),
        ops)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def pallas_accumulate_day(h_scat, cdf_mu, idx, clipped, Dparams, cell,
                          K: int, G: int, buf_len: int,
                          interpret: bool = False):
    """Fused Pallas day accumulation (see ``_accumulate_impl``) with a
    custom VJP: Mosaic kernels have no autodiff, so the backward pass is a
    second Pallas kernel (``_day_bwd_kernel``) built from the closed-form
    BVN CDF derivatives — gradient users (MAP, NUTS) keep both the fast
    Pallas primal *and* a device-rate backward.

    ρ is a traced scalar: a ``lax.cond`` on |ρ| ≥ 0.925 selects between the
    Drezner–Wesolowsky low-corr kernel and the Genz high-corr variant
    (asymptotic series + tail quadrature) — only the taken branch executes,
    so prior-typical proposals pay nothing for the high-|ρ| coverage."""
    return _accumulate_dispatch(h_scat, cdf_mu, idx, clipped, Dparams, cell,
                                K, G, buf_len, interpret)


def _accumulate_fwd(h_scat, cdf_mu, idx, clipped, Dparams, cell,
                    K, G, buf_len, interpret):
    out = _accumulate_dispatch(h_scat, cdf_mu, idx, clipped, Dparams, cell,
                               K, G, buf_len, interpret)
    return out, (h_scat, cdf_mu, idx, clipped, Dparams, cell)


def _accumulate_bwd(K, G, buf_len, interpret, res, ct):
    h_scat, cdf_mu, idx, clipped, Dparams, cell = res
    ct_buf, ct_loss = ct
    ops = (ct_buf, ct_loss, h_scat, cdf_mu, idx, clipped, Dparams, cell)
    dh, dmu, dcl, dD, dc = lax.cond(
        _is_hi(Dparams, h_scat.dtype),
        lambda o: _accumulate_bwd_impl(*o, K=K, G=G, buf_len=buf_len,
                                       interpret=interpret, hi=True),
        lambda o: _accumulate_bwd_impl(*o, K=K, G=G, buf_len=buf_len,
                                       interpret=interpret, hi=False),
        ops)
    didx = np.zeros(idx.shape, jax.dtypes.float0)   # integer arg
    dc = jnp.asarray(dc, jnp.result_type(cell))
    return dh, dmu, didx, dcl, dD, dc


pallas_accumulate_day.defvjp(_accumulate_fwd, _accumulate_bwd)
