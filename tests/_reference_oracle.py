"""Test-only loader for the reference implementation at /root/reference.

Used purely as a *numerical oracle* for parity tests: we import the
reference's modules (never copying their code) and run them on small configs
to compare fields.  Modern SciPy removed ``scipy.stats.mvn`` which the
reference requires, so we substitute our own double-precision Genz BVN
(`parasitoids_tpu.utils.bvn_host`, validated against scipy to ~1e-15) as a
drop-in ``mvnun``.

If the reference tree is unavailable the loader reports None and parity
tests skip.
"""

import contextlib
import io
import math
import os
import sys
import types

import numpy as np

REF_PATH = '/root/reference'


def _fake_mvn_module():
    from parasitoids_tpu.utils import bvn_rect
    from parasitoids_tpu.utils.native import load_bvnlib

    rect = bvn_rect
    if load_bvnlib() is not None:          # prefer the native C++ library
        from parasitoids_tpu.utils.native import bvn_rect_native
        rect = bvn_rect_native

    def mvnun(low, upp, mu, S, **kwargs):
        sx = math.sqrt(S[0][0])
        sy = math.sqrt(S[1][1])
        rho = S[0][1] / (sx * sy)
        val = rect((low[0], low[1]), (upp[0], upp[1]),
                   (mu[0], mu[1]), sx, sy, rho)
        return float(val), 0

    mod = types.ModuleType('scipy.stats.mvn')
    mod.mvnun = mvnun
    return mod


_cache = {}


def load_reference():
    """Import and return the reference's ParasitoidModel + CalcSol modules
    (or None if unavailable)."""
    if 'mods' in _cache:
        return _cache['mods']
    if not os.path.isdir(REF_PATH):
        _cache['mods'] = None
        return None
    import scipy.stats
    fake = _fake_mvn_module()
    sys.modules['scipy.stats.mvn'] = fake
    scipy.stats.mvn = fake
    sys.path.insert(0, REF_PATH)
    try:
        import ParasitoidModel as ref_pm  # noqa
        import CalcSol as ref_cs  # noqa
    finally:
        sys.path.remove(REF_PATH)
    _cache['mods'] = (ref_pm, ref_cs)
    return _cache['mods']


@contextlib.contextmanager
def quiet():
    """Silence the reference's per-minute progress prints."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        yield


def ref_prob_mass(day, wind_data, hparams, Dparams, Dlparams, mu_r,
                  n_periods, rad_dist, rad_res, start_time=None):
    """Run the reference ``prob_mass`` and return the *recentered dense*
    daily kernel on the full (2*rad_res+1)^2 domain."""
    mods = load_reference()
    if mods is None:
        return None
    ref_pm, _ = mods
    with quiet():
        if start_time is None:
            coo = ref_pm.prob_mass(day, wind_data, hparams, Dparams,
                                   Dlparams, mu_r, n_periods, rad_dist,
                                   rad_res)
        else:
            coo = ref_pm.prob_mass(day, wind_data, hparams, Dparams,
                                   Dlparams, mu_r, n_periods, rad_dist,
                                   rad_res, start_time)
    dom_len = 2 * rad_res + 1
    offset = rad_res - coo.shape[0] // 2
    dense = np.zeros((dom_len, dom_len))
    dense[offset:offset + coo.shape[0], offset:offset + coo.shape[1]] = \
        coo.toarray()
    return dense
