# %% [markdown]
# # Field data import
#
# Executable counterpart of the reference's `Pandas_xlsx_data.ipynb`: what
# the Kalbar xlsx workbooks contain and how `LocInfo` turns them into the
# inference arrays (io/locinfo.py; reference Data_Import.py:12-651).
# The xlsx files are parsed by the first-party reader (io/xlsx.py) — no
# openpyxl dependency.
#
# Run: `JAX_PLATFORMS=cpu python docs/notebooks/xlsx_data.py`

# %%
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'out')
os.makedirs(OUT, exist_ok=True)

from parasitoids_tpu.io.locinfo import LocInfo

# %% [markdown]
# ## Loading the site
#
# `LocInfo` reads field polygons (`kalbarfields.txt`), the release-field
# sampling grid (`kalbarreleasegrid.txt`), and the observation workbooks
# (`sampling_details.xlsx`, `adult_counts_kalbar.xlsx`); the sampling grid
# is rotated −33° to align with the farm road (Data_Import.py:99-105).

# %%
li = LocInfo('kalbar', (-27.947131, 152.584171), (10000.0, 400))
print('sentinel fields:', li.sent_ids)
print('field sizes (cells):', li.field_sizes)
print('release field:', li.releasefield_id)
print('grid points:', li.grid_data.shape[0],
      ' columns:', list(li.grid_data.columns))
print('collections at daysPR:', [d.days for d in li.collection_datesPR])

# %% [markdown]
# ## The inference arrays
#
# Emergence observations become per-collection matrices; grid counts a
# (points × dates) matrix with per-point sampling effort; cardinal
# transects a (4, distances) block per date.

# %%
for k, (rel, sent) in enumerate(zip(li.release_emerg, li.sentinel_emerg)):
    print('collection {}: release_emerg {}, sentinel_emerg {}'.format(
        k, rel.shape, sent.shape))
print('grid_obs:', li.grid_obs.shape, ' total counts:',
      int(li.grid_obs.sum()))
print('grid obs dates PR:', [d.days for d in li.grid_obs_datesPR])
for k, card in enumerate(li.card_obs):
    print('cardinal {}: shape {}, date {} PR'.format(
        k, card.shape, li.card_obs_datesPR[k].days))

# %% [markdown]
# ## Visual QA
#
# The reference treats `Plot_SampleLocations.py` as the real check of the
# import (README.md:229-234); the same figure here:

# %%
from parasitoids_tpu.config import Params
from parasitoids_tpu.viz.info_plots import sample_locations

p = Params()
p.cmd_line_chg(['--kalbar'])
p.maps_key = None
path = sample_locations(p, li, outfile=os.path.join(
    OUT, 'sample_locations.png'))
print('wrote', path)
