"""Build the REAL-data Carnarvon site: the field emergence record enters
the Bayes layer (VERDICT r2 item 6).

The reference ships the Carnarvon-early trial's actual sentinel emergence
counts (data/carnarvonearlemergence.txt, read by ParasitoidModel.py:28-60
and the dataset preset Run.py:108-124) but can fit only Kalbar
(Data_Import.py:491-492 raises for any other site).  This script converts
that record into the generic-site format (io/site.py) so the whole
inference stack — MAP, AM, NUTS, diagnostics, predictive checks — runs on
the one piece of real second-site data in the repo:

* **Protocol.** The record's counts land on days 1..21 post-release —
  impossible under the Kalbar lab protocol's 19-25-day oviposition-to-
  emergence incubation (models/observe.py INCUBATION_TIME), so these are
  rotating sentinel plants: each sampling date's count is the eventual
  emergence from plants EXPOSED since the previous date, i.e. a census of
  that window's oviposition.  The site spec uses the ``exposure`` protocol
  (LocInfo._generic_sentinel), which attributes each count column to its
  exposure window with no incubation offset.

* **Assumed geometry (documented limitation).** Station coordinates are
  not in the repository (the reference never uses them; the emergence file
  carries only station ids).  Station '0' — by far the largest counts,
  decaying with the 5-day release ramp — is placed AT the release point;
  the remaining stations are placed on a ring of radius ``--ring-m``
  (default 500 m) at equally spaced bearings.  Radial distance is the only
  spatial quantity the isotropic-ring layout feeds the likelihood, so the
  fit informs dispersal scale and the temporal flight parameters while
  directional conclusions are explicitly OUT of scope.  docs/CARNARVON.md
  records this assumption next to the results.

Writes data/carnreal*: site spec, sentinel CSV, station polygons, and a
wind symlink-copy reference to the existing carnarvonearl wind file.

Usage:  python scripts/make_carnarvon_real_site.py [--ring-m 500]
Then:   python -m parasitoids_tpu.bayes.run --new ... dataset=carnreal ...
"""

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from parasitoids_tpu.io.locinfo import EARTH_RADIUS_M  # noqa: E402

# release point of the Carnarvon-early trial (ref Run.py:114)
COORD = (-24.851614, 113.731267)


def xy_to_latlong(x, y):
    """Inverse of locinfo.latlong_to_xy for small offsets around COORD."""
    lat0 = math.radians(COORD[0])
    dlat = math.degrees(y / EARTH_RADIUS_M)
    dlong = math.degrees(x / (EARTH_RADIUS_M * math.cos(lat0)))
    return COORD[0] + dlat, COORD[1] + dlong


def read_emergence(path):
    """Parse the reference's emergence format (ParasitoidModel.py:28-60):
    header '#date <id> <id> ...', rows '<dayPR> <count> ...'."""
    with open(path) as f:
        header = f.readline().split()
        ids = header[1:]
        rows = []
        for line in f:
            parts = line.split()
            if not parts:
                continue
            rows.append((int(parts[0]), [int(v) for v in parts[1:]]))
    return ids, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ring-m', type=float, default=500.0,
                    help='assumed station-ring radius (station positions '
                         'are not published in the repo)')
    ap.add_argument('--station-half-m', type=float, default=60.0,
                    help='half-side of each square station footprint')
    args = ap.parse_args()

    ids, rows = read_emergence('data/carnarvonearlemergence.txt')
    days = [d for d, _ in rows]
    assert days == sorted(days) and days[0] >= 1

    # --- station polygons ------------------------------------------------
    # '0' at the release point; others on the assumed ring
    others = [i for i in ids if i != '0']
    positions = {'0': (0.0, 0.0)}
    for k, sid in enumerate(others):
        th = 2 * math.pi * k / len(others)
        positions[sid] = (args.ring_m * math.cos(th),
                          args.ring_m * math.sin(th))
    h = args.station_half_m
    with open('data/carnrealfields.txt', 'w') as f:
        f.write('# REAL Carnarvon-early sentinel stations with ASSUMED '
                'geometry:\n'
                '# station coordinates are not published in this repo — '
                "station '0' is\n"
                '# placed at the release point, the rest on a {:.0f} m '
                'ring (see\n'
                '# scripts/make_carnarvon_real_site.py). Counts are the '
                'real field record\n'
                '# (data/carnarvonearlemergence.txt); positions are an '
                'assumption.\n'.format(args.ring_m))
        for sid in ids:
            x, y = positions[sid]
            f.write('S{}\n'.format(sid))
            for dx, dy in ((-h, -h), (-h, h), (h, h), (h, -h)):
                lat, lon = xy_to_latlong(x + dx, y + dy)
                f.write('{:.7f},{:.7f}\n'.format(lat, lon))
            f.write('\n')

    # --- sentinel CSV (exposure protocol: one collection, all dates) -----
    with open('data/carnreal_sentinel.csv', 'w') as f:
        f.write('id,date,count\n')
        for d, counts in rows:
            for sid, c in zip(ids, counts):
                f.write('S{},{},{}\n'.format(sid, d, c))

    # --- wind: reuse the real carnarvonearl wind readings -----------------
    # (site_name prefix points at the existing file; no copy needed)

    # --- release grid: structurally required by LocInfo (it anchors the
    # grid boundary/rotation machinery) even though this site has no
    # release-channel observations — a minimal 3x3 placeholder around the
    # release point
    with open('data/carnrealreleasegrid.txt', 'w') as f:
        f.write('# placeholder sampling grid (no release-channel '
                'observations exist\n# for this site)\n'
                '# xcoord,ycoord,area,samples,collection\n')
        for gy in (50.0, 0.0, -50.0):
            for gx in (-50.0, 0.0, 50.0):
                f.write('{},{},25.0,1,1.0\n'.format(gx, gy))

    spec = {
        '_provenance': 'REAL field data: data/carnarvonearlemergence.txt '
                       '(ref ParasitoidModel.py:28-60, preset '
                       'Run.py:108-124). Station geometry ASSUMED — see '
                       'scripts/make_carnarvon_real_site.py.',
        'site_name': 'data/carnarvonearl',   # reuse the real wind file
        'start_time': '00:30',               # ref Run.py:112
        'coord': list(COORD),
        'r_dur': 5,                          # ref Run.py:118
        'r_dist': 'uniform',
        'r_start': 0.354,                    # ref Run.py:122 (8:30 am)
        'r_number': 40000,                   # ref Run.py:124
        # arbitrary calendar anchor: every date in this site is an integer
        # day post-release
        'release_date': '2005-01-01',
        'releasefield_id': 'S0',
        'grid_rotation_deg': 0.0,
        'collections': [
            {'collection_date': days[-1],
             'sentinel_csv': 'carnreal_sentinel.csv',
             'protocol': 'exposure'}],
    }
    with open('data/carnrealsite.json', 'w') as f:
        json.dump(spec, f, indent=1)
        f.write('\n')

    total = sum(sum(c) for _, c in rows)
    print('wrote data/carnrealsite.json, data/carnrealfields.txt, '
          'data/carnreal_sentinel.csv')
    print('{} stations x {} sampling dates (days {}..{} PR), {} wasps '
          'counted'.format(len(ids), len(rows), days[0], days[-1], total))
    print("NOTE: station positions are an assumption (ring {:.0f} m); "
          'directional conclusions are out of scope'.format(args.ring_m))


if __name__ == '__main__':
    main()
