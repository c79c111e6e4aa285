from .bvn import bvn_cell_masses, gauss_legendre  # noqa: F401
from .flight import g_wind_prob, f_time_prob, h_flight_prob, dmat  # noqa: F401
