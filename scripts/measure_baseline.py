"""Measure the reference CPU path to populate BASELINE_MEASURED.json.

The reference (mountaindust/Parasitoids) publishes no performance numbers
(BASELINE.md), so the baseline must be measured: we import the reference
modules at /root/reference (numerical oracle only — no code is copied) and
time the two phases of its forward simulation on the headline Kalbar config
(Run.py defaults: domain_info=(10000.0, 400) -> 801x801 @ 25 m, interp 30
-> 1440 minute-kernels/day):

  * per_day_prob_mass_s — one full prob_mass(day) call
    (ParasitoidModel.py:384, the Fortran-mvnun hot loop)
  * conv_per_day_s      — one fftconv2+ifft2+r_small_vals propagation step
    (CalcSol.py:188-201 CPU branch)

bench.py multiplies (per_day_prob_mass_s + conv_per_day_s) * ndays to get
the single-stream reference wall time for one full forward simulation and
reports our speedup as ``vs_baseline``.

Usage: python scripts/measure_baseline.py [--days N] [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from tests._reference_oracle import load_reference  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--days', type=int, default=3,
                    help='number of sim days to average over')
    ap.add_argument('--quick', action='store_true',
                    help='measure 1 day only')
    args = ap.parse_args()
    if args.quick:
        args.days = 1

    mods = load_reference()
    if mods is None:
        print('reference unavailable', file=sys.stderr)
        return 1
    ref_pm, ref_cs = mods
    import scipy.sparse as sparse

    # Headline Kalbar config with the reference's true defaults
    # (Run.py:57-91; the kalbar preset :126-138 changes release fields only)
    from parasitoids_tpu.config import Params
    p = Params()
    p.cmd_line_chg(['--kalbar'])
    site = p.site_name
    interp = p.interp_num
    domain_info = (10000.0, 400)
    dom_len = domain_info[1] * 2 + 1

    g_params = tuple(p.g_params)
    f_params = tuple(p.f_params)
    Dparams = tuple(p.Dparams)
    Dlparams = tuple(p.Dlparams)
    lam = float(p.lam)
    mu_r = float(p.mu_r)
    n_periods = int(p.n_periods)

    wind_data, days = ref_pm.get_wind_data(site, interp, p.start_time)
    hparams = (lam,) + g_params + f_params

    day_times = []
    pmfs = []
    for d in days[:args.days]:
        t0 = time.time()
        pmf = ref_pm.prob_mass(d, wind_data, hparams, Dparams, Dlparams,
                               mu_r, n_periods, *domain_info)
        day_times.append(time.time() - t0)
        pmfs.append(pmf)
        print('prob_mass day {}: {:.2f} s (shape {})'.format(
            d, day_times[-1], pmf.shape))

    # Convolution phase: replicate CalcSol.get_solutions CPU inner loop
    # (CalcSol.py:188-201) for one day-step at the max observed kernel shape.
    max_shape = np.array([0, 0])
    for pm in pmfs:
        max_shape = np.maximum(max_shape, pm.shape)
    # recenter day-1 pmf into full domain the way Run.py:453-458 does
    offset = domain_info[1] - pmfs[0].shape[0] // 2
    dom0 = np.zeros((dom_len, dom_len))
    r = pmfs[0].toarray()
    dom0[offset:offset + r.shape[0], offset:offset + r.shape[1]] = r

    conv_times = []
    cursol_hat = ref_cs.fft2(sparse.coo_matrix(dom0), max_shape)
    for i in range(min(3, len(pmfs) - 1) or 1):
        B = sparse.csr_matrix(pmfs[min(i + 1, len(pmfs) - 1)])
        t0 = time.time()
        ref_cs.fftconv2(cursol_hat, B)
        cursol, bflag = ref_cs.ifft2(cursol_hat, (dom_len, dom_len))
        ref_cs.r_small_vals(cursol, prob_model=True)
        conv_times.append(time.time() - t0)
        print('conv step {}: {:.2f} s'.format(i, conv_times[-1]))

    out = {
        'machine': os.uname().machine,
        'config': 'kalbar prob model, domain (10000.0,400) -> 801x801, '
                  'interp 30 -> 1440 min-kernels/day',
        'per_day_prob_mass_s': float(np.mean(day_times)),
        'conv_per_day_s': float(np.mean(conv_times)),
        'ndays': int(len(days)),
        'days_measured': int(args.days),
        'note': 'single-stream reference CPU path via tests._reference_oracle'
                ' (scipy fftpack + mvnun); multiprocessing would divide the'
                ' pmf phase by ncores but reference conv phase is serial.',
    }
    path = os.path.join(REPO, 'BASELINE_MEASURED.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == '__main__':
    sys.exit(main())
