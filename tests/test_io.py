"""Tests for wind/emergence ingestion (L1).

Ports the structural/property tests of the reference suite
(test_ParsitoidModel.py:96-145) against our implementations.
"""

import numpy as np
import pytest

from parasitoids_tpu.io import (emergence_data, get_wind_data, pack_wind,
                                read_wind_file)

SITES = [('data/carnarvonearl', '00:30'), ('data/kalbar', '00:00')]


@pytest.mark.parametrize('site_name,start_time', SITES)
def test_emerg_data(site_name, start_time):
    em = emergence_data(site_name)
    assert isinstance(em, dict)
    assert len(em) > 0
    for field, by_day in em.items():
        for date, count in by_day.items():
            assert isinstance(date, int)
            assert isinstance(count, int)


@pytest.mark.parametrize('site_name,start_time', SITES)
def test_read_wind_file(site_name, start_time):
    wind_data, days = read_wind_file(site_name)
    assert sorted(days) == days
    assert len(set(days)) == len(days)
    for day in days:
        assert day in wind_data
        assert wind_data[day].shape == (48, 3)  # 30-min readings
        # magnitude consistent with components
        w = wind_data[day]
        np.testing.assert_allclose(w[:, 2], np.hypot(w[:, 0], w[:, 1]),
                                   atol=1e-4)


@pytest.mark.parametrize('site_name,start_time', SITES)
@pytest.mark.parametrize('interp_num', [1, 6, 30])
def test_get_wind_data(site_name, start_time, interp_num):
    raw, days_raw = read_wind_file(site_name)
    wind_data, days = get_wind_data(site_name, interp_num, start_time)
    assert days == days_raw
    time_pts = raw[days[0]].shape[0]
    for day in days:
        assert wind_data[day].shape == (time_pts * interp_num, 3)
        w = wind_data[day]
        # magnitude recomputed after interpolation (ParasitoidModel.py:180)
        np.testing.assert_allclose(w[:, 2], np.hypot(w[:, 0], w[:, 1]),
                                   rtol=1e-12, atol=1e-12)

    if start_time == '00:00':
        # each raw reading appears at the start of its interp block
        for day in days:
            np.testing.assert_allclose(
                wind_data[day][::interp_num, :2], raw[day][:, :2], atol=1e-12)
    else:
        # data offset by one block: raw reading k lands at block k+1
        for day in days:
            np.testing.assert_allclose(
                wind_data[day][interp_num::interp_num, :2],
                raw[day][:-1, :2], atol=1e-12)
        # first block of first day repeats the first reading
        np.testing.assert_allclose(
            wind_data[days[0]][:interp_num, :2],
            np.tile(raw[days[0]][0, :2], (interp_num, 1)), atol=1e-12)

    # interpolation is linear: midpoint of a block is the average of its
    # endpoints (components only; magnitude is nonlinear)
    if interp_num == 6:
        day = days[0] if start_time == '00:00' else days[1]
        w = wind_data[day]
        for blk in range(2, 40):
            a = w[blk * interp_num, :2]
            b = w[(blk + 1) * interp_num, :2]
            mid = w[blk * interp_num + 3, :2]
            np.testing.assert_allclose(mid, 0.5 * (a + b), atol=1e-10)


def test_pack_wind():
    wind_data, days = get_wind_data('data/kalbar', 5, '00:00')
    packed = pack_wind(wind_data, days)
    assert packed.shape == (len(days), 48 * 5, 2)
    np.testing.assert_allclose(packed[0], wind_data[days[0]][:, :2])
    packed2 = pack_wind(wind_data, days, ndays=3)
    assert packed2.shape == (3, 48 * 5, 2)


def test_wind_reader_names_bad_line(tmp_path):
    """New-site onboarding: a malformed wind row fails with file:line and
    the expected format, not a bare int()/IndexError traceback."""
    import pytest

    from parasitoids_tpu.io.wind import read_wind_file

    p = tmp_path / 'badwind.txt'
    p.write_text('1\t0.1\t0.2\n1\t0.3\n')
    with pytest.raises(ValueError, match=r'badwind\.txt:2'):
        read_wind_file(str(tmp_path / 'bad'))

    (tmp_path / 'emptywind.txt').write_text('\n\n')
    with pytest.raises(ValueError, match='no wind readings'):
        read_wind_file(str(tmp_path / 'empty'))


def test_wind_reader_accepts_comments(tmp_path):
    """'#' comments (as written by the site scaffolder's stub) are
    stripped, matching the fields/releasegrid parsers."""
    from parasitoids_tpu.io.wind import read_wind_file

    (tmp_path / 'cwind.txt').write_text(
        '# one row per 30-min reading: day windx windy (m/s)\n'
        '1\t0.5\t0.5  # midday gust\n1\t0.2\t0.1\n')
    wind, days = read_wind_file(str(tmp_path / 'c'))
    assert days == [1] and wind[1].shape == (2, 3)


def test_wind_day_gap_interpolates_next_key(tmp_path):
    """'00:00' interpolation must follow the sorted day list, not day+1 —
    a logger outage can leave a gap in day numbers."""
    import numpy as np

    from parasitoids_tpu.io.wind import get_wind_data

    lines = []
    for day in (1, 2, 4):                     # gap at day 3
        for k in range(4):
            lines.append('{}\t{}\t0.0\n'.format(day, 0.1 * day + 0.01 * k))
    (tmp_path / 'gapwind.txt').write_text(''.join(lines))
    wind, days = get_wind_data(str(tmp_path / 'gap'), 2, '00:00')
    assert days == [1, 2, 4]
    # day 2's last block ramps toward day 4's first reading
    assert np.isclose(wind[2][-1, 0], (0.23 + 0.4) / 2, atol=1e-12)


def test_wind_unequal_day_lengths_rejected(tmp_path):
    import pytest

    from parasitoids_tpu.io.wind import get_wind_data

    (tmp_path / 'ragwind.txt').write_text(
        '1\t0.1\t0.0\n1\t0.2\t0.0\n2\t0.1\t0.0\n')
    with pytest.raises(ValueError, match='same reading count'):
        get_wind_data(str(tmp_path / 'rag'), 2, '00:00')
