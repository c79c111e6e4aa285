"""Generate the 'carnarvon' inference site (data/carnarvon*).

VERDICT r1 item 5: the Bayes likelihood had only ever fit Kalbar, leaving
the r_dur=5 multi-day-release cohort likelihood unexercised under
inference (the reference cannot fit Carnarvon at all —
Data_Import.py:491-492 raises NotImplementedError for any site but
Kalbar).  This script builds a Carnarvon site spec through the generic
site on-ramp (io/site.py):

* REAL inputs: the Carnarvon early-season wind record
  (data/carnarvonearlwind.txt, 30 days x 48 readings, start 00:30) and
  the real release protocol (40,000 wasps over 5 days from 8:30 am,
  Run.py:108-124 in the reference).
* SYNTHESIZED geometry: the reference ships no Carnarvon field polygons
  or sampling grid.  Sentinel fields are placed at the field labels of
  the real emergence table (data/carnarvonearlemergence.txt header:
  fields '22'..'41'), interpreted as increasing distance from the
  release point, on deterministic spread azimuths; the release field is
  a 240 m square at the origin with a 5x5 sampling grid.
* SIMULATED observations: counts are drawn from the model's own
  thinned-Poisson observation process at a DOCUMENTED truth parameter
  vector (printed below, stored in data/carnarvon_truth.json), so
  MAP -> MCMC -> diagnostics on this site have a recoverable target —
  the strongest check a second-site fit can provide.

Deterministic (fixed seeds).  Rerun after changing the layout.
Run on CPU: JAX_PLATFORMS=cpu python scripts/make_carnarvon_site.py
"""

import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

EARTH_RADIUS_M = 6378100.0
CENTER = (-24.851614, 113.731267)     # Carnarvon release point (config.py)
OUT = os.path.join(REPO, 'data')

# domain used to SIMULATE the observations (data are counts at physical
# points/fields; fits may use any domain)
SIM_DOMAIN = (10000.0, 200)

# sentinel field labels from the real emergence table's header
FIELD_LABELS = ['22', '25', '26', '27', '30', '35', '37', '38', '39',
                '40', '41']

# documented truth used to simulate the observations, in the model
# block's REPARAMETERIZED coordinates (priors.MODEL_PARAM_NAMES: f_b*_p
# is f_b - 1, corr*_p is (corr + 1)/2).  Values sit at prior-typical
# locations near but not at the sampler's init (_INIT_MODEL).
TRUTH_MODEL = {
    'g_aw': 2.2, 'g_bw': 5.0,
    'f_a1': 6.0, 'f_b1_p': 2.2, 'f_a2': 18.0, 'f_b2_p': 2.2,
    'sig_x': 85.0, 'sig_y': 52.0, 'corr_p': 0.625,
    'sig_xl': 8.0, 'sig_yl': 6.0, 'corr_l_p': 0.5,
    'lam': 0.45, 'n_periods': 30.0, 'mu_r': 1.1,
}


def xy_to_latlong(x, y):
    """Inverse of io.locinfo.latlong_to_xy about CENTER (equirectangular)."""
    o_lat = math.radians(CENTER[0])
    lat = o_lat + y / EARTH_RADIUS_M
    long = math.radians(CENTER[1]) + x / (
        EARTH_RADIUS_M * math.cos((o_lat + lat) / 2))
    return math.degrees(lat), math.degrees(long)


def field_centers():
    """(label -> (x, y)) — distance grows with the label (300..3150 m),
    azimuths on a deterministic golden-angle spread."""
    out = {}
    for n, lab in enumerate(FIELD_LABELS):
        dist = (int(lab) - 20) * 150.0
        ang = 0.4 + n * 2.399963           # golden angle, radians
        out[lab] = (dist * math.cos(ang), dist * math.sin(ang))
    return out


def write_fields(path):
    centers = field_centers()
    half = {lab: 90.0 + 15.0 * (n % 3)     # 180-240 m squares
            for n, lab in enumerate(FIELD_LABELS)}
    with open(path, 'w') as f:
        f.write('# carnarvon sentinel field polygons (synthetic geometry;'
                ' see scripts/make_carnarvon_site.py)\n\n')
        # release field: 240 m square at the origin
        f.write('00\n')
        for x, y in ((-120, -120), (120, -120), (120, 120), (-120, 120)):
            lat, lng = xy_to_latlong(x, y)
            f.write('{:.8f},{:.8f}\n'.format(lat, lng))
        f.write('\n')
        for lab in FIELD_LABELS:
            cx, cy = centers[lab]
            h = half[lab]
            f.write(lab + '\n')
            for x, y in ((cx - h, cy - h), (cx + h, cy - h),
                         (cx + h, cy + h), (cx - h, cy + h)):
                lat, lng = xy_to_latlong(x, y)
                f.write('{:.8f},{:.8f}\n'.format(lat, lng))
            f.write('\n')


GRID = [(x, y) for y in (80.0, 40.0, 0.0, -40.0, -80.0)
        for x in (-80.0, -40.0, 0.0, 40.0, 80.0)]


def write_releasegrid(path):
    with open(path, 'w') as f:
        f.write('# carnarvon release-field sampling grid (synthetic)\n')
        f.write('# xcoord,ycoord,area,samples,collection\n')
        for n, (x, y) in enumerate(GRID):
            f.write('{:.1f},{:.1f},25.0,{},1.0\n'.format(x, y, 1 + n % 3))


# collections: plants collected on days 26 and 30 PR; emergences counted
# on dates covering the 19-25 day incubation window of early ovipositions
COLLECTIONS = [
    {'collection_date': 26, 'sent_dates': [26, 28, 30],
     'rel_dates': [26, 28, 30]},
    {'collection_date': 30, 'sent_dates': [31, 33, 36],
     'rel_dates': [31, 33, 36]},
]
GRID_DATES = [4, 9, 14]

SPEC = {
    'site_name': 'data/carnarvonearl',
    'start_time': '00:30',
    'coord': list(CENTER),
    'r_dur': 5,
    'r_dist': 'uniform',
    'r_start': 0.354,
    'r_number': 40000,
    'release_date': '2005-01-10',
    'releasefield_id': '00',
    'grid_rotation_deg': 0.0,
    'collections': [
        {'collection_date': c['collection_date'],
         'sentinel_csv': 'carnarvon_sentinel_{}.csv'.format(k),
         'release_csv': 'carnarvon_release_{}.csv'.format(k)}
        for k, c in enumerate(COLLECTIONS)],
    'grid_obs_csv': 'carnarvon_grid.csv',
}


def write_placeholder_csvs():
    """Zero-count CSVs fixing the observation layout (ids/points/dates);
    simulated counts overwrite them below."""
    ids = ['00'] + FIELD_LABELS
    for k, c in enumerate(COLLECTIONS):
        with open(os.path.join(OUT,
                               'carnarvon_sentinel_{}.csv'.format(k)),
                  'w') as f:
            f.write('id,date,count\n')
            for date in c['sent_dates']:
                for fid in ids:
                    if fid != '00':
                        f.write('{},{},0\n'.format(fid, date))
        with open(os.path.join(OUT,
                               'carnarvon_release_{}.csv'.format(k)),
                  'w') as f:
            f.write('x,y,date,count\n')
            for date in c['rel_dates']:
                for x, y in GRID:
                    f.write('{:.1f},{:.1f},{},0\n'.format(x, y, date))
    with open(os.path.join(OUT, 'carnarvon_grid.csv'), 'w') as f:
        f.write('x,y,date,count\n')
        for date in GRID_DATES:
            for x, y in GRID:
                f.write('{:.1f},{:.1f},{},0\n'.format(x, y, date))


def simulate_and_rewrite():
    """Draw y ~ p(y | truth) through the model's own observation process
    and rewrite the CSVs with the simulated counts."""
    from parasitoids_tpu.bayes.model import BayesSetup
    from parasitoids_tpu.bayes.predictive import simulate_observations
    from parasitoids_tpu.bayes.priors import (MODEL_PARAM_NAMES,
                                              initial_obs_params)
    from parasitoids_tpu.config import Params

    p = Params()
    p.cmd_line_chg(['--carnarvon'])
    p.PLOT = False
    p.OUTPUT = False
    p.PROB_MODEL = False
    p.domain_info = SIM_DOMAIN
    setup = BayesSetup(p)

    m_vec = np.array([TRUTH_MODEL[n] for n in MODEL_PARAM_NAMES],
                     np.float32)
    o_vec = np.asarray(initial_obs_params(
        [setup.locinfo.field_sizes[k] for k in setup.locinfo.sent_ids],
        setup.cell_res ** 2), np.float32)
    rng = np.random.default_rng(20260819)
    y = simulate_observations(setup, m_vec, o_vec, rng)

    ids = setup.locinfo.sent_ids
    for k, c in enumerate(COLLECTIONS):
        sent = np.asarray(y['sentinel'][k])        # (n_fields, n_dates)
        with open(os.path.join(OUT,
                               'carnarvon_sentinel_{}.csv'.format(k)),
                  'w') as f:
            f.write('id,date,count\n')
            for j, date in enumerate(sorted(c['sent_dates'])):
                for i, fid in enumerate(ids):
                    f.write('{},{},{}\n'.format(fid, date,
                                                int(sent[i, j])))
        rel = np.asarray(y['release'][k])          # (n_points, n_dates)
        pts = sorted(set(GRID))                    # loader sorts points
        with open(os.path.join(OUT,
                               'carnarvon_release_{}.csv'.format(k)),
                  'w') as f:
            f.write('x,y,date,count\n')
            for j, date in enumerate(sorted(c['rel_dates'])):
                for i, (x, y_) in enumerate(pts):
                    f.write('{:.1f},{:.1f},{},{}\n'.format(
                        x, y_, date, int(rel[i, j])))
    grid = np.asarray(y['grid'])                   # (n_grid, n_dates)
    with open(os.path.join(OUT, 'carnarvon_grid.csv'), 'w') as f:
        f.write('x,y,date,count\n')
        for j, date in enumerate(sorted(GRID_DATES)):
            for i, (x, y_) in enumerate(GRID):
                f.write('{:.1f},{:.1f},{},{}\n'.format(
                    x, y_, date, int(grid[i, j])))

    truth = {'model': {n: float(v) for n, v in
                       zip(MODEL_PARAM_NAMES, m_vec)},
             'obs': [float(v) for v in o_vec],
             'obs_order': '(xi, em_obs_prob, grid_obs_prob, A_collected, '
                          'sent_obs_probs per sent_ids)',
             'sent_ids': list(ids),
             'sim_domain': list(SIM_DOMAIN),
             'seed': 20260819}
    with open(os.path.join(OUT, 'carnarvon_truth.json'), 'w') as f:
        json.dump(truth, f, indent=1)
    tot = (sum(int(np.asarray(a).sum()) for a in y['sentinel'])
           + sum(int(np.asarray(a).sum()) for a in y['release'])
           + int(np.asarray(y['grid']).sum()))
    print('simulated observations: {} total counts'.format(tot))


def main():
    write_fields(os.path.join(OUT, 'carnarvonfields.txt'))
    write_releasegrid(os.path.join(OUT, 'carnarvonreleasegrid.txt'))
    write_placeholder_csvs()
    with open(os.path.join(OUT, 'carnarvonsite.json'), 'w') as f:
        json.dump(SPEC, f, indent=1)
    simulate_and_rewrite()
    print('carnarvon site written to', os.path.abspath(OUT))


if __name__ == '__main__':
    main()
