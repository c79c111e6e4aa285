"""ctypes bindings for the native host library (native/bvnlib).

The reference reaches compiled BVN code through ``scipy.stats.mvn.mvnun``
(Fortran MVNDST, ParasitoidModel.py:22,340).  Our device path integrates
on-chip (ops/bvn.py); for *host* work — test oracles, reference-oracle
parity shims, kernel previews — this module loads the first-party C++
implementation (``native/bvnlib/bvn.cpp``), building it on first use with
``make`` if the shared object is missing.  Falls back to ``None`` when no
toolchain is available; callers then use the pure-NumPy path in
``utils/bvn_host.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ['load_bvnlib', 'bvn_upper_native', 'bvn_rect_native',
           'bvn_cell_masses_native']

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIBDIR = os.path.join(_REPO, 'native', 'bvnlib')
_SO = os.path.join(_LIBDIR, 'libbvn.so')

_cache = {}


def load_bvnlib():
    """Load (building if needed) the native BVN library, or None."""
    if 'lib' in _cache:
        return _cache['lib']
    lib = None
    try:
        if not os.path.exists(_SO):
            subprocess.run(['make', '-C', _LIBDIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.pt_bvn_upper.restype = ctypes.c_double
        lib.pt_bvn_upper.argtypes = [ctypes.c_double] * 3
        lib.pt_bvn_rect.restype = ctypes.c_double
        lib.pt_bvn_rect.argtypes = [ctypes.c_double] * 9
        lib.pt_bvn_cell_masses.restype = None
        lib.pt_bvn_cell_masses.argtypes = (
            [ctypes.c_double] * 6 + [ctypes.c_int32,
                                     ctypes.POINTER(ctypes.c_double)])
    except (OSError, subprocess.CalledProcessError):
        lib = None
    _cache['lib'] = lib
    return lib


def bvn_upper_native(h, k, r):
    """P(X > h, Y > k); scalar. Raises if the library is unavailable."""
    lib = load_bvnlib()
    if lib is None:
        raise RuntimeError('native bvnlib unavailable')
    return lib.pt_bvn_upper(float(h), float(k), float(r))


def bvn_rect_native(low, upp, mu, sig_x, sig_y, rho):
    """P(low <= (X, Y) <= upp) for N(mu, S) — native mvnun equivalent."""
    lib = load_bvnlib()
    if lib is None:
        raise RuntimeError('native bvnlib unavailable')
    return lib.pt_bvn_rect(float(low[0]), float(low[1]), float(upp[0]),
                           float(upp[1]), float(mu[0]), float(mu[1]),
                           float(sig_x), float(sig_y), float(rho))


def bvn_cell_masses_native(mu, sig_x, sig_y, rho, cell, K):
    """(2K+1, 2K+1) cell masses, same layout as the device op and the
    NumPy oracle (row 0 = +y, col 0 = -x)."""
    lib = load_bvnlib()
    if lib is None:
        raise RuntimeError('native bvnlib unavailable')
    n = 2 * K + 1
    out = np.empty((n, n), dtype=np.float64)
    lib.pt_bvn_cell_masses(
        float(mu[0]), float(mu[1]), float(sig_x), float(sig_y), float(rho),
        float(cell), np.int32(K),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
