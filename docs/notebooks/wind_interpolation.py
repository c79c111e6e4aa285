# %% [markdown]
# # Wind interpolation
#
# Executable counterpart of the reference's `Wind interpolation.ipynb`
# (`/root/reference/docs`): how 30-minute wind readings become the
# 1-minute advection timeline the kernel builder consumes.
#
# Run: `JAX_PLATFORMS=cpu python docs/notebooks/wind_interpolation.py`
# (figures land in `docs/notebooks/out/`).  The file is in jupytext
# "percent" format — open it as a notebook with any percent-aware tool.

# %%
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'out')
os.makedirs(OUT, exist_ok=True)

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

from parasitoids_tpu.io import get_wind_data
from parasitoids_tpu.io.wind import read_wind_file

# %% [markdown]
# ## Raw readings
#
# `kalbarwind.txt` holds 48 half-hour readings per day (x, y components in
# m/s).  Values below 1e-4 are denoised to zero, matching the reference
# reader (ParasitoidModel.py:64-126).

# %%
raw, days = read_wind_file('data/kalbar')
day = days[0]
print('days:', days[:5], '... total', len(days))
print('readings/day:', raw[day].shape[0], 'columns: windx, windy, windr')

# %% [markdown]
# ## Interpolation and the start-time conventions
#
# `get_wind_data(site, interp_num, start_time)` linearly interpolates each
# reading into `interp_num` points (default 30 → 1,440 per day).  The
# `00:00` vs `00:30` conventions shift which half-hour the first reading
# describes; crossing midnight interpolates against the NEXT day's first
# reading (the fencepost cases of ParasitoidModel.py:136-227).

# %%
wind_00, _ = get_wind_data('data/kalbar', 30, '00:00')
wind_30, _ = get_wind_data('data/kalbar', 30, '00:30')

fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
t_raw = np.arange(48) * 30            # minutes
t_int = np.arange(1440)
for ax, comp, label in zip(axes, (0, 1), ('windx', 'windy')):
    ax.plot(t_raw, raw[day][:, comp], 'o', ms=3, label='raw 30-min')
    ax.plot(t_int, wind_00[day][:, comp], lw=0.8,
            label='interpolated (00:00)')
    ax.plot(t_int, wind_30[day][:, comp], lw=0.8, ls='--',
            label='interpolated (00:30)')
    ax.set_ylabel('{} (m/s)'.format(label))
    ax.legend(loc='upper right', fontsize=8)
axes[1].set_xlabel('minute of day')
fig.suptitle('Kalbar day {}: raw readings vs 1-minute interpolation'
             .format(day))
fig.tight_layout()
fig.savefig(os.path.join(OUT, 'wind_interpolation.png'), dpi=120)
print('wrote', os.path.join(OUT, 'wind_interpolation.png'))

# %% [markdown]
# ## Magnitude is recomputed AFTER interpolation
#
# Interpolating the magnitude directly would overestimate speed when the
# direction swings (|interp(v)| ≤ interp(|v|)); the reference recomputes
# windr from the interpolated components (ParasitoidModel.py:180,191) and
# so does this build.

# %%
w = wind_00[day]
recomputed = np.hypot(w[:, 0], w[:, 1])
assert np.allclose(w[:, 2], recomputed, atol=1e-6)
print('max |windr - hypot(windx, windy)| =',
      float(np.abs(w[:, 2] - recomputed).max()))
