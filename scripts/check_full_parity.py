"""Full-config parity check: our daily kernel vs the reference prob_mass.

Runs both implementations on the headline Kalbar config (domain
(10000, 400) -> 801x801 @ 25 m, interp 30 -> 1,440 minutes) for selected
days and reports the max absolute difference of the recentered dense pmfs
— validating the static K-window + closed-form BVN + dense scatter design
against the reference's adaptive rings + Fortran integrator at full scale.

Usage: python scripts/check_full_parity.py [day_index ...]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    day_idxs = [int(a) for a in sys.argv[1:]] or [0]

    import jax.numpy as jnp
    from parasitoids_tpu.config import Params
    from parasitoids_tpu.models.forward import setup_forward
    from parasitoids_tpu.ops.daily_kernel import build_daily_kernel
    from parasitoids_tpu.utils.cache import enable_compilation_cache
    from tests._reference_oracle import load_reference, quiet

    enable_compilation_cache()
    mods = load_reference()
    if mods is None:
        print('reference unavailable')
        return 1
    ref_pm, _ = mods

    p = Params()
    p.cmd_line_chg(['--kalbar'])
    p.PLOT = False
    p.OUTPUT = False
    s = setup_forward(p)
    hparams = tuple(np.float32(v)
                    for v in (p.lam, *p.g_params, *p.f_params))
    rad_res = int(p.domain_info[1])
    D = 2 * rad_res + 1

    from parasitoids_tpu.io import get_wind_data
    ref_wind, ref_days = get_wind_data(*p.get_wind_params())

    # warm-up: compile outside the per-day timing so the printed
    # ours-vs-reference comparison is steady-state, not trace+compile
    build_daily_kernel(
        s.wind_flat, s.wind_cumsum, jnp.int32(day_idxs[0]), hparams,
        p.Dparams, p.Dlparams, jnp.float32(p.mu_r), jnp.int32(p.n_periods),
        s.rad_dist, jnp.int32(0), s.kcfg)[0].block_until_ready()

    worst = 0.0
    for di in day_idxs:
        day = list(s.days)[di]
        t0 = time.time()
        ours, loss = build_daily_kernel(
            s.wind_flat, s.wind_cumsum, jnp.int32(di), hparams, p.Dparams,
            p.Dlparams, jnp.float32(p.mu_r), jnp.int32(p.n_periods),
            s.rad_dist, jnp.int32(0), s.kcfg)
        ours = np.asarray(ours)
        t_ours = time.time() - t0

        ref_hparams = (p.lam,) + tuple(p.g_params) + tuple(p.f_params)
        t0 = time.time()
        with quiet():
            ref = ref_pm.prob_mass(day, ref_wind, ref_hparams, p.Dparams,
                                   p.Dlparams, p.mu_r, p.n_periods,
                                   *p.domain_info)
        t_ref = time.time() - t0

        dense = np.zeros((D, D))
        r = np.asarray(ref.todense())
        off = rad_res - r.shape[0] // 2
        dense[off:off + r.shape[0], off:off + r.shape[1]] = r

        diff = np.abs(ours - dense)
        print('day {} (idx {}): ref shape {}, ours sum {:.6f}, ref sum '
              '{:.6f}, loss {:.3g}'.format(day, di, r.shape, ours.sum(),
                                           dense.sum(), float(loss)))
        print('  max|diff| = {:.3e} at {} (ref {:.3e} ours {:.3e}); '
              'ours {:.1f}s ref {:.1f}s'.format(
                  diff.max(), np.unravel_index(diff.argmax(), diff.shape),
                  dense.flat[diff.argmax()], ours.flat[diff.argmax()],
                  t_ours, t_ref))
        worst = max(worst, diff.max())
    print('WORST max|diff| across days: {:.3e}'.format(worst))
    return 0


if __name__ == '__main__':
    sys.exit(main())
