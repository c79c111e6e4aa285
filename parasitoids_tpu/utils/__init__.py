from .bvn_host import bvn_upper, bvn_rect, bvn_cell_masses_host  # noqa: F401
