"""Generate the checked-in 'demo' example site (data/demo*).

The demo site is the documentation artifact for the generic-site on-ramp
(io/site.py): a complete synthetic site — wind, field polygons, release
grid, site spec, and CSV observation tables — small enough to run the full
stack in seconds:

    python -m parasitoids_tpu --no_plot dataset=demo domain_info="(2000.0,25)"
    python -m parasitoids_tpu.bayes.run --new 20 10 runs/demo \
        dataset=demo domain_info="(2000.0,25)"

Deterministic (fixed seed); rerun after changing the layout below.
"""

import math
import os

import numpy as np

EARTH_RADIUS_M = 6378100.0
CENTER = (-27.0, 152.0)          # release point (lat, long)
OUT = os.path.join(os.path.dirname(__file__), '..', 'data')


def xy_to_latlong(x, y):
    """Inverse of io.locinfo.latlong_to_xy about CENTER (equirectangular)."""
    o_lat = math.radians(CENTER[0])
    lat = o_lat + y / EARTH_RADIUS_M
    long = math.radians(CENTER[1]) + x / (
        EARTH_RADIUS_M * math.cos((o_lat + lat) / 2))
    return math.degrees(lat), math.degrees(long)


def write_wind(path, ndays=5, readings=48, seed=0):
    """<day windx windy> per 30-min reading, m/s (format of kalbarwind.txt)."""
    rng = np.random.default_rng(seed)
    with open(path, 'w') as f:
        for day in range(1, ndays + 1):
            # a slowly turning breeze, calm at night
            phase = rng.uniform(0, 2 * np.pi)
            for k in range(readings):
                t = k / readings                      # fraction of day
                daylight = max(0.0, math.sin(math.pi * (t - 0.25) / 0.5)) \
                    if 0.25 <= t <= 0.75 else 0.0
                # gentle: daily advection ~ speed*1800 m (n_periods=30)
                # must stay well inside the 2 km demo domain
                speed = 0.06 + 0.22 * daylight
                ang = phase + 0.5 * np.pi * t + 0.15 * rng.standard_normal()
                f.write('{}\t{:.15f}\t{:.15f}\n'.format(
                    day, speed * math.cos(ang), speed * math.sin(ang)))


def write_fields(path):
    """Two square sentinel fields (F1 NE, F2 W), lat/long vertex lists."""
    squares = {'F1': (480.0, 480.0, 720.0, 720.0),
               'F2': (-640.0, 160.0, -400.0, 400.0)}
    with open(path, 'w') as f:
        f.write('# demo site sentinel field polygons (id, then lat,long '
                'vertices; blank line between fields)\n\n')
        for fid, (x0, y0, x1, y1) in squares.items():
            f.write(fid + '\n')
            for x, y in ((x0, y0), (x1, y0), (x1, y1), (x0, y1)):
                lat, long = xy_to_latlong(x, y)
                f.write('{:.8f},{:.8f}\n'.format(lat, long))
            f.write('\n')


GRID = [(x, y) for y in (100.0, 0.0, -100.0) for x in (-100.0, 0.0, 100.0)]


def write_releasegrid(path):
    """xcoord,ycoord,area,samples,collection rows (kalbarreleasegrid.txt
    layout)."""
    with open(path, 'w') as f:
        f.write('# demo release-field sampling grid\n')
        f.write('# xcoord,ycoord,area,samples,collection\n')
        for n, (x, y) in enumerate(GRID):
            f.write('{:.1f},{:.1f},25.0,{},1.0\n'.format(x, y, 1 + n % 3))


def write_observations():
    # sentinel emergence: id,date,count (dates = days post-release).
    # Dates must land inside the oviposition-to-emergence window
    # (INCUBATION_TIME spans 19..25 days, models/observe.py) measured from
    # the simulated oviposition days, or every emergence weight is zero and
    # the observations are structurally uninformative: with collection on
    # day 5, dates 22 and 26 give full-weight coverage.
    with open(os.path.join(OUT, 'demo_sentinel.csv'), 'w') as f:
        f.write('id,date,count\n')
        for date, counts in ((22, {'F1': 11, 'F2': 3}),
                             (26, {'F1': 5, 'F2': 1})):
            for fid, c in counts.items():
                f.write('{},{},{}\n'.format(fid, date, c))
    # release-field emergence: x,y,date,count on release-grid points;
    # (100,0) has no day-26 row on purpose (the loader zero-fills)
    with open(os.path.join(OUT, 'demo_release.csv'), 'w') as f:
        f.write('x,y,date,count\n')
        f.write('0.0,100.0,22,6\n100.0,0.0,22,4\n-100.0,0.0,22,2\n')
        f.write('0.0,100.0,26,3\n-100.0,0.0,26,1\n')
    # adult grid counts: x,y,date,count
    with open(os.path.join(OUT, 'demo_grid.csv'), 'w') as f:
        f.write('x,y,date,count\n')
        for date in (2, 4):
            for n, (x, y) in enumerate(GRID[:6]):
                f.write('{:.1f},{:.1f},{},{}\n'.format(
                    x, y, date, (3 * n + date) % 5))
    # cardinal transects: direction,distance,count — distances are the
    # real sample positions (one, two, three cells out at 80 m resolution)
    with open(os.path.join(OUT, 'demo_card.csv'), 'w') as f:
        f.write('direction,distance,count\n')
        for d in ('north', 'south', 'east', 'west'):
            for dist, c in ((80, 3), (160, 1), (240, 0)):
                f.write('{},{},{}\n'.format(d, dist, c))


SPEC = '''{
  "site_name": "data/demo",
  "start_time": "00:00",
  "coord": [-27.0, 152.0],
  "r_dur": 1,
  "r_dist": "uniform",
  "r_start": null,
  "r_number": 10000,
  "release_date": "2005-03-13",
  "releasefield_id": "F1",
  "grid_rotation_deg": 0.0,
  "collections": [
    {"collection_date": 5,
     "sentinel_csv": "demo_sentinel.csv",
     "release_csv": "demo_release.csv"}
  ],
  "grid_obs_csv": "demo_grid.csv",
  "cardinal": [
    {"date": 3, "step_size": 1, "csv": "demo_card.csv"}
  ]
}
'''


def main():
    write_wind(os.path.join(OUT, 'demowind.txt'))
    write_fields(os.path.join(OUT, 'demofields.txt'))
    write_releasegrid(os.path.join(OUT, 'demoreleasegrid.txt'))
    write_observations()
    with open(os.path.join(OUT, 'demosite.json'), 'w') as f:
        f.write(SPEC)
    print('demo site written to', os.path.abspath(OUT))


if __name__ == '__main__':
    main()
