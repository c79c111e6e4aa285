"""Full-scale END-TO-END parity: our fused forward simulation vs the
complete reference pipeline (prob_mass per day -> recenter -> CalcSol
population/probability propagation) on the headline Kalbar config
(801x801 @ 25 m, interp 30 -> 1,440 minutes/day).

This extends scripts/check_full_parity.py (per-day kernels only) to the
whole program: release handling (start_time on day 1), FFT convolution
chaining, thresholding, and population scaling (r_number 130k), mirroring
the reference driver assembly at Run.py:400-481.

The reference CPU path costs ~25 s per simulated day for kernels alone, so
default ndays is 4; pass a different count as argv[1].

With ``--f64`` our side runs in float64 validation mode (use_f64): the
remaining difference vs the reference then isolates algorithmic deviation
from float32 accumulation.

``--carnarvon`` switches to the 5-day-release dataset, exercising the
release-cohort back-solve path at full scale on both sides (note the
reference's back_solve re-FFT crashes on Fourier-boundary events,
CalcSol.py:105 — a latent reference bug; keep ndays small enough that no
event triggers there).

With ``--emulate`` our kernel builder truncates every per-minute block at
the reference's own cdf_eps=0.001 ring-stopping rule (KernelConfig
.ref_trunc): the remaining residual is then pure algorithm/precision,
closing the attribution loop — without emulation the ~3e-3 rel-to-peak
difference is the reference's truncation, not ours.

Usage: python scripts/check_e2e_parity.py [ndays] [--prob] [--f64]
       [--carnarvon] [--emulate]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('-')]
    prob_model = '--prob' in sys.argv
    ndays = int(args[0]) if args else 4

    from scipy import sparse

    from parasitoids_tpu.config import Params
    from parasitoids_tpu.io import get_wind_data
    from parasitoids_tpu.models.forward import setup_forward, simulate
    from parasitoids_tpu.utils.cache import enable_compilation_cache
    from tests import _reference_oracle as ref_oracle

    enable_compilation_cache()
    mods = ref_oracle.load_reference()
    if mods is None:
        print('reference unavailable')
        return 1
    ref_pm, ref_cs = mods
    import globalvars
    globalvars.cuda = False

    p = Params()
    p.cmd_line_chg(['--carnarvon' if '--carnarvon' in sys.argv
                    else '--kalbar'])
    p.PLOT = False
    p.OUTPUT = False
    p.PROB_MODEL = prob_model
    if not prob_model and ndays < p.r_dur:
        # the population back-solve needs one kernel per release day
        # (carnarvon releases over 5 days)
        print('ndays {} < r_dur {}; raising to {}'.format(
            ndays, p.r_dur, p.r_dur))
        ndays = int(p.r_dur)
    p.ndays = ndays
    if '--f64' in sys.argv:
        p.use_f64 = True
    if '--emulate' in sys.argv:
        p.ref_trunc = True

    # ---- ours: one fused device program --------------------------------
    setup = setup_forward(p)
    ours, day_labels = simulate(p, setup)       # compile + first run
    t0 = time.time()
    ours, _ = simulate(p, setup)                # steady-state timing
    ours = np.asarray(ours)
    t_ours = time.time() - t0
    print('ours: {} days in {:.2f}s (compiled)'.format(ndays, t_ours))

    # ---- reference: per-day prob_mass -> recenter -> CalcSol ------------
    # (serial driver assembly, Run.py:430-481)
    wind_data, days = get_wind_data(*p.get_wind_params())
    mp = p.get_model_params()
    rad_res = int(p.domain_info[1])
    dom_len = 2 * rad_res + 1
    pmf_list = []
    max_shape = np.array([0, 0])
    t0 = time.time()
    for n, day in enumerate(days[:ndays]):
        with ref_oracle.quiet():
            if (not prob_model) and n == 0:
                pmf = ref_pm.prob_mass(day, wind_data, *mp,
                                       start_time=p.r_start)
            else:
                pmf = ref_pm.prob_mass(day, wind_data, *mp)
        pmf_list.append(pmf)
        max_shape = np.maximum(max_shape, pmf.shape)
        print('  ref day {} kernel {} ({:.1f}s)'.format(
            day, pmf.shape, time.time() - t0))

    def recenter(coo):
        off = rad_res - coo.shape[0] // 2
        return sparse.coo_matrix(
            (coo.data, (coo.row + off, coo.col + off)),
            shape=(dom_len, dom_len))

    with ref_oracle.quiet():
        if prob_model:
            modelsol = [recenter(pmf_list[0])]
            ref_cs.get_solutions(modelsol, pmf_list, days, ndays, dom_len,
                                 max_shape)
        else:
            r_spread = [recenter(pmf_list[ii]).tocsr()
                        for ii in range(p.r_dur)]
            modelsol = ref_cs.get_populations(
                r_spread, pmf_list, days, ndays, dom_len, max_shape,
                p.r_dur, p.r_number, p.r_mthd())
    t_ref = time.time() - t0
    print('reference: {} days in {:.1f}s'.format(ndays, t_ref))

    # ---- compare --------------------------------------------------------
    worst_abs = worst_rel = 0.0
    for d in range(ndays):
        want = np.asarray(modelsol[d].todense())
        got = ours[d]
        adiff = np.abs(got - want).max()
        peak = want.max()
        rdiff = adiff / peak if peak > 0 else 0.0
        worst_abs = max(worst_abs, float(adiff))
        worst_rel = max(worst_rel, float(rdiff))
        print('day {}: sum ours {:.6g} ref {:.6g}; max|diff| {:.3e} '
              '(rel-to-peak {:.3e})'.format(
                  day_labels[d], got.sum(), want.sum(), adiff, rdiff))
    print('WORST: abs {:.3e}, rel-to-peak {:.3e}  '
          '(ours {:.2f}s vs reference {:.1f}s single-stream)'.format(
              worst_abs, worst_rel, t_ours, t_ref))
    return 0


if __name__ == '__main__':
    sys.exit(main())
