"""Tests for location-data import (L1) — ports the reference's LocInfo
schema/invariant tests (test_Bayes.py:39-131) and adds polygon-rasterization
parity against matplotlib.path (the reference's engine)."""

import numpy as np
import pandas as pd
import pytest

from parasitoids_tpu.io.locinfo import (LocInfo, latlong_to_xy,
                                        points_in_polygon)
from parasitoids_tpu.io.xlsx import read_sheet, sheet_names

KALBAR_LATLONG = (-27.947131, 152.584171)
DOMAIN = (10000.0, 400)


@pytest.fixture(scope='module')
def locinfo():
    return LocInfo('kalbar', KALBAR_LATLONG, DOMAIN)


def test_xlsx_reader_matches_expected_schema():
    names = sheet_names('data/sampling_details.xlsx')
    assert 'Kal-sentinels-raw' in names and 'Kal-releasefield-raw' in names
    df = read_sheet('data/sampling_details.xlsx', 'Kal-sentinels-raw')
    for col in ('Field descrip', 'Field ID (jpgs)', 'date emerged',
                'Efemales', 'Emales'):
        assert col in df.columns
    assert pd.api.types.is_datetime64_any_dtype(df['date emerged'])
    # spot value: serial 38445 == 2005-04-03
    assert df['date emerged'].min() == pd.Timestamp('2005-04-03')


def test_points_in_polygon_matches_matplotlib():
    from matplotlib.path import Path
    rng = np.random.default_rng(7)
    verts = rng.normal(0, 100, (9, 2))
    pts = rng.normal(0, 120, (4000, 2))
    ours = points_in_polygon(pts, verts)
    theirs = Path(verts).contains_points(pts)
    # interior/exterior must agree except possibly exactly on edges
    disagree = np.flatnonzero(ours != theirs)
    assert disagree.size <= 2


def test_field_structure(locinfo):
    # ref test_Bayes.py:39-70
    assert isinstance(locinfo.field_polys, dict)
    assert isinstance(locinfo.field_cells, dict)
    assert set(locinfo.field_polys) == set('ABCDEFG')
    for key, cells in locinfo.field_cells.items():
        assert cells.ndim == 2 and cells.shape[1] == 2
        assert cells.min() >= 0 and cells.max() <= 2 * DOMAIN[1]
        assert locinfo.field_sizes[key] == max(cells.shape)
    # release field A is the biggest of the bunch
    assert locinfo.field_sizes['A'] == max(locinfo.field_sizes.values())


def test_release_grid(locinfo):
    # ref test_Bayes.py:72-99
    assert set(locinfo.grid_data.columns) >= {
        'xcoord', 'ycoord', 'area', 'samples', 'collection'}
    assert locinfo.grid_cells.shape == (locinfo.grid_data.shape[0], 2)
    # all grid cells near the domain center (release field)
    assert np.all(np.abs(locinfo.grid_cells - DOMAIN[1]) < 40)


def test_sentinel_emergence(locinfo):
    # ref test_Bayes.py:101-131
    assert isinstance(locinfo.release_date, pd.Timestamp)
    for dframe in locinfo.sent_DataFrames:
        for col in ('id', 'datePR', 'E_total', 'All_total'):
            assert col in dframe.columns
        assert (dframe['E_total'] <= dframe['All_total']).all()
        assert (dframe['datePR'] > pd.Timedelta(0)).all()
    assert locinfo.sent_ids == ['B', 'C', 'D', 'E', 'F', 'G']
    # arrays: rows = fields, cols = observation dates
    for E in locinfo.sentinel_emerg:
        assert E.shape[0] == len(locinfo.sent_ids)
        assert (E >= 0).all()


def test_release_emergence(locinfo):
    assert locinfo.releasefield_id == 'A'
    for dframe, grid, E, coll in zip(
            locinfo.release_DataFrames, locinfo.emerg_grids,
            locinfo.release_emerg, locinfo.release_collection):
        assert {'row', 'column', 'datePR', 'E_total'} <= set(dframe.columns)
        assert E.shape[0] == len(grid) == coll.shape[0]
        assert coll.max() == 1.0 and coll.min() > 0
        # all emergence grid points lie inside release field A's cells
        cells = {tuple(rc) for rc in locinfo.field_cells['A'].tolist()}
        inside = sum(1 for rc in grid if rc in cells)
        assert inside >= len(grid) - 2   # rasterization edge tolerance


def test_grid_observations(locinfo):
    n_grid = locinfo.grid_data.shape[0]
    assert locinfo.grid_obs.shape == (n_grid, len(locinfo.grid_obs_datesPR))
    assert locinfo.grid_samples.shape == locinfo.grid_obs.shape
    assert locinfo.grid_samples.max() == 1.0
    assert (locinfo.grid_obs >= 0).all()
    assert locinfo.grid_obs.sum() > 0   # some wasps were seen


def test_card_observations(locinfo):
    assert len(locinfo.card_obs) == len(locinfo.card_obs_datesPR) == 2
    assert locinfo.step_size == [2, 2]
    for card in locinfo.card_obs:
        assert card.shape[0] == 4
        assert (card >= 0).all()


def test_unknown_sites_fail_loudly():
    # The reference raises NotImplementedError for anything but Kalbar
    # (Data_Import.py:491-492).  Here Carnarvon is a real site
    # (data/carnarvonsite.json, tests/test_carnarvon.py); a site with no
    # spec and no data must still fail loudly, not silently load nothing.
    with pytest.raises((NotImplementedError, FileNotFoundError)):
        LocInfo('no_such_site', (-24.851614, 113.731267), DOMAIN)


def test_latlong_to_xy():
    x, y = latlong_to_xy(KALBAR_LATLONG, *KALBAR_LATLONG)
    assert (x, y) == (0.0, 0.0)
    # one degree of latitude ~ 111 km
    _, y1 = latlong_to_xy(KALBAR_LATLONG, KALBAR_LATLONG[0] + 1,
                          KALBAR_LATLONG[1])
    assert 110000 < y1 < 112500
