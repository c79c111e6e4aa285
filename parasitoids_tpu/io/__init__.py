from .wind import read_wind_file, get_wind_data, pack_wind  # noqa: F401
from .emergence import emergence_data  # noqa: F401
