# %% [markdown]
# # Flight probability functions
#
# Executable counterpart of the reference's
# `Flight_probability_functions.ipynb`: the analytic take-off model —
# `g` (wind gate), `f` (time-of-day pmf), and the combined per-minute
# take-off probability `h = λ·(f·g + integral correction)`
# (ops/flight.py; reference ParasitoidModel.py:231-309).
#
# Run: `JAX_PLATFORMS=cpu python docs/notebooks/flight_functions.py`

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
import jax.numpy as jnp

from parasitoids_tpu.ops.flight import f_time_prob, g_wind_prob, \
    h_flight_prob

# %% [markdown]
# ## g: probability of flying given wind speed
#
# A decreasing logistic: calm air lets wasps fly, strong wind grounds
# them.  `aw` shifts the cutoff; `bw` sharpens it.

# %%
w = np.linspace(0, 4, 200)
fig, ax = plt.subplots(figsize=(7, 4))
for aw, bw in [(1.8, 6.0), (1.0, 6.0), (1.8, 2.0)]:
    ax.plot(w, np.asarray(g_wind_prob(jnp.asarray(w), aw, bw)),
            label='aw={}, bw={}'.format(aw, bw))
ax.set_xlabel('wind speed (m/s)')
ax.set_ylabel('g (take-off allowed)')
ax.legend()
fig.tight_layout()
fig.savefig(os.path.join(OUT, 'g_wind_prob.png'), dpi=120)
print('wrote', os.path.join(OUT, 'g_wind_prob.png'))

# %% [markdown]
# ## f: time-of-day take-off pmf
#
# The difference of two logistics, normalized over the day: wasps fly
# between ~a1 and ~a2 o'clock, with b1/b2 controlling how sharply
# activity starts and stops.

# %%
n = 1440
hours = np.arange(1, n + 1) * 24.0 / n
fig, ax = plt.subplots(figsize=(7, 4))
for a1, b1, a2, b2 in [(7.0, 2.0, 19.0, 2.0), (9.0, 4.0, 17.0, 4.0)]:
    f_vals = np.asarray(f_time_prob(n, a1, b1, a2, b2))
    ax.plot(hours, f_vals, label='a1={}, b1={}, a2={}, b2={}'.format(
        a1, b1, a2, b2))
ax.set_xlabel('hour of day')
ax.set_ylabel('f (take-off pmf over minutes)')
ax.legend(fontsize=8)
fig.tight_layout()
fig.savefig(os.path.join(OUT, 'f_time_prob.png'), dpi=120)
print('wrote', os.path.join(OUT, 'f_time_prob.png'))
print('sum of f over the day:', float(f_vals.sum()))

# %% [markdown]
# ## h: the realized per-minute take-off probability
#
# `h = λ (f·g + correction)` where the correction redistributes take-off
# probability blocked by wind into later calm minutes (the cumulative-sum
# term of ParasitoidModel.py:305-307).  With real Kalbar wind, h dips
# wherever gusts close the wind gate.

# %%
from parasitoids_tpu.io import get_wind_data

wind, days = get_wind_data('data/kalbar', 30, '00:00')
day = days[0]
windr = np.hypot(wind[day][:, 0], wind[day][:, 1])
h = np.asarray(h_flight_prob(jnp.asarray(windr), 1.0, 1.8, 6.0,
                             7.0, 2.0, 19.0, 2.0))
fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 6), sharex=True)
ax1.plot(hours, windr, lw=0.7)
ax1.set_ylabel('wind speed (m/s)')
ax2.plot(hours, h, lw=0.7)
ax2.set_ylabel('h (take-off probability)')
ax2.set_xlabel('hour of day')
fig.suptitle('Kalbar day {}: wind gusts gate take-off'.format(day))
fig.tight_layout()
fig.savefig(os.path.join(OUT, 'h_flight_prob.png'), dpi=120)
print('wrote', os.path.join(OUT, 'h_flight_prob.png'))
print('total flight probability for the day:', float(h.sum()))
