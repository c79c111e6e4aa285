"""Generic site-specification loader.

The reference supports exactly one site's observation data, with the parsing
hard-coded to its xlsx workbooks (Data_Import.py:491-492 raises
``NotImplementedError`` for anything else).  This build keeps the Kalbar
parsers for parity but adds a documented on-ramp for new sites: drop a
``<name>site.json`` spec next to the site's data files and plain-CSV
observation tables, and the whole stack — forward CLI, Bayesian inference,
plotting — runs on ``dataset=<name>`` with no code changes.

Spec file ``{data_dir}/{name}site.json``::

    {
      "site_name": "data/demo",        // file prefix for wind/fields/grid
      "start_time": "00:00",           // first wind reading: 00:00 or 00:30
      "coord": [-27.0, 152.0],         // release point (lat, long)
      "r_dur": 1,                      // release duration, days
      "r_dist": "uniform",             // or explicit weights [0.2, 0.5, 0.3]
      "r_start": null,                 // release time as day fraction
      "r_number": 10000,               // wasps released
      "release_date": "2005-03-13",    // calendar anchor for CSV dates
      "sprd_factor": false,            // fit a pre-wind local-spread day (MAP)
      "releasefield_id": "A",          // field id of the release field
      "grid_rotation_deg": 0.0,        // sampling-grid/road rotation
      "collections": [                 // one entry per collection event
        {"collection_date": 5,
         "sentinel_csv": "demo_sentinel.csv",
         "release_csv": "demo_release.csv"}
      ],
      "grid_obs_csv": "demo_grid.csv", // optional adult grid counts
      "cardinal": [                    // optional transect counts
        {"date": 2, "step_size": 1, "csv": "demo_card.csv"}
      ]
    }

Every date field (``collection_date``, the ``date`` columns of the CSVs,
cardinal ``date``) accepts either an ISO date string (``"2005-03-18"``) or an
integer meaning days post-release.  CSV schemas are documented on the loader
methods in ``io/locinfo.py`` (``LocInfo._generic_*``).
"""

from __future__ import annotations

import json
import os

__all__ = ['load_site_spec', 'site_spec_path']


def site_spec_path(data_dir, location):
    return os.path.join(data_dir, '{}site.json'.format(location))


def load_site_spec(data_dir, location):
    """Return the parsed ``<location>site.json`` dict, or None if absent."""
    path = site_spec_path(data_dir, location)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
