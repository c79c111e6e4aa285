"""Generic-site ingestion tests (io/site.py + LocInfo generic CSV loaders).

The reference supports exactly one site's observations, hard-coded
(Data_Import.py:491-492 raises NotImplementedError otherwise).  These tests
cover this build's generic on-ramp: the checked-in 'demo' example site
(scripts/make_demo_site.py), spec-driven Params, optional observation
blocks, the spec-less error message, and a Kalbar round-trip (xlsx parsers
-> CSV export -> generic loader) proving the generic path reconstructs
bit-identical inference arrays.
"""

import json
import os
import shutil

import numpy as np
import pytest

from parasitoids_tpu.config import Params
from parasitoids_tpu.io.locinfo import LocInfo

DEMO_COORD = (-27.0, 152.0)
DEMO_DOMAIN = (2000.0, 25)
KAL_COORD = (-27.947131, 152.584171)


def test_demo_site_locinfo():
    li = LocInfo('demo', DEMO_COORD, DEMO_DOMAIN)
    assert li.sent_ids == ['F1', 'F2']
    assert li.grid_rotation_deg == 0.0
    assert li.release_date.year == 2005
    # sentinel: 2 fields x 2 emergence dates
    assert len(li.sentinel_emerg) == 1
    np.testing.assert_allclose(li.sentinel_emerg[0],
                               [[11.0, 5.0], [3.0, 1.0]])
    assert li.collection_datesPR[0].days == 5
    # release grid: 3 observed points x 2 dates, with the missing
    # (100, 0) day-12 row zero-filled by the loader
    assert li.release_emerg[0].shape == (3, 2)
    assert (li.release_emerg[0] == 0.0).sum() == 1
    assert li.release_emerg[0].sum() == 16.0
    assert len(li.emerg_grids[0]) == 3
    # grid counts land on release-grid points (exact coordinate match)
    assert li.grid_obs.shape == (9, 2)
    assert li.grid_obs.sum() == 26.0
    assert li.grid_samples.max() == 1.0
    # cardinal transects: 4 directions x 3 distances
    assert len(li.card_obs) == 1 and li.card_obs[0].shape == (4, 3)
    assert li.step_size == [1]
    assert li.card_obs_datesPR[0].days == 3


def test_demo_site_emergence_is_informative():
    """The shipped demo observations must actually inform the likelihood:
    emergence dates have to land inside the 19-25 day incubation window
    measured from the simulated oviposition days, and the wind file has to
    cover the collection date.  (The original demo had dates 8/12 — every
    emergence weight was identically zero, so the demo fit a
    parameter-independent constant likelihood block.)"""
    import warnings

    from parasitoids_tpu.io.wind import read_wind_file
    from parasitoids_tpu.models.observe import ObservationOps

    li = LocInfo('demo', DEMO_COORD, DEMO_DOMAIN)
    _, wind_days = read_wind_file(os.path.join('data', 'demo'))
    assert len(wind_days) >= li.collection_datesPR[0].days
    with warnings.catch_warnings():
        warnings.simplefilter('error')            # truncation warns -> fail
        oo = ObservationOps(li, DEMO_DOMAIN, len(wind_days))
    for W in oo.sentinel_W:
        assert (np.asarray(W) != 0).any()
    for proj in oo.release_proj:
        assert (np.asarray(proj[1]) != 0).any()


def test_demo_site_params():
    p = Params()
    p.cmd_line_chg(['dataset=demo'])
    assert p.site_name == 'data/demo'
    assert p.start_time == '00:00'
    assert p.coord == DEMO_COORD
    assert p.r_dur == 1 and p.r_number == 10000 and p.r_start is None
    assert p.r_dist == 'uniform'
    # the release-distribution method still works through the spec path
    assert p.r_mthd()(1) == 1.0


def test_speccless_site_raises_with_pointer(tmp_path):
    """A site with data files but no spec must fail with a message that
    says where to put the spec (not a bare NotImplementedError)."""
    for src, dst in [('demofields.txt', 'nowherefields.txt'),
                     ('demoreleasegrid.txt', 'nowherereleasegrid.txt')]:
        shutil.copy(os.path.join('data', src), tmp_path / dst)
    with pytest.raises(NotImplementedError, match='nowheresite.json'):
        LocInfo('nowhere', DEMO_COORD, DEMO_DOMAIN, data_dir=str(tmp_path))


def test_optional_obs_blocks(tmp_path):
    """grid_obs_csv and cardinal are optional: a site without them loads
    with empty grid/card structures (and the grid_samples normalization
    must not divide by an empty max)."""
    for name in ('demofields.txt', 'demoreleasegrid.txt',
                 'demo_sentinel.csv', 'demo_release.csv'):
        shutil.copy(os.path.join('data', name), tmp_path / name)
    with open(os.path.join('data', 'demosite.json')) as f:
        spec = json.load(f)
    del spec['grid_obs_csv']
    del spec['cardinal']
    with open(tmp_path / 'demosite.json', 'w') as f:
        json.dump(spec, f)
    li = LocInfo('demo', DEMO_COORD, DEMO_DOMAIN, data_dir=str(tmp_path))
    assert li.grid_obs.shape == (9, 0)
    assert li.grid_samples.shape == (9, 0)
    assert li.card_obs == [] and li.step_size == []
    assert li.sentinel_emerg[0].shape == (2, 2)


def _export_kalbar_csvs(tmp_path, name):
    """Export the Kalbar observations (parsed by the site-specific xlsx
    loaders, pre-rotation) as generic CSVs + spec under ``tmp_path``."""
    raw = LocInfo.__new__(LocInfo)
    raw.data_dir = './data'
    raw._spec = None
    raw.get_sentinel_emergence('kalbar')
    raw.get_releasefield_emergence('kalbar')
    raw.get_grid_observations('kalbar')
    raw.get_card_observations('kalbar')

    for src, dst in [('kalbarfields.txt', name + 'fields.txt'),
                     ('kalbarreleasegrid.txt', name + 'releasegrid.txt')]:
        shutil.copy(os.path.join('data', src), tmp_path / dst)

    with open(tmp_path / (name + '_sentinel.csv'), 'w') as f:
        f.write('id,date,count\n')
        for _, r in raw.sent_DataFrames[0].iterrows():
            f.write('{},{},{}\n'.format(r['id'], r['datePR'].days,
                                        r['E_total']))
    with open(tmp_path / (name + '_release.csv'), 'w') as f:
        f.write('x,y,date,count\n')
        for _, r in raw.release_DataFrames[0].iterrows():
            f.write('{!r},{!r},{},{}\n'.format(
                float(r['xcoord']), float(r['ycoord']), r['datePR'].days,
                r['E_total']))
    with open(tmp_path / (name + '_grid.csv'), 'w') as f:
        f.write('x,y,date,count\n')
        for _, r in raw.grid_obs_DataFrame.iterrows():
            f.write('{!r},{!r},{},{}\n'.format(
                float(r['xcoord']), float(r['ycoord']), r['datePR'].days,
                r['obs_count']))
    cards = []
    for k, df in enumerate(raw.card_obs_DataFrames):
        csv = '{}_card{}.csv'.format(name, k)
        with open(tmp_path / csv, 'w') as f:
            f.write('direction,distance,count\n')
            for _, r in df.iterrows():
                f.write('{},{},{}\n'.format(r['direction'], r['distance'],
                                            r['obs_count']))
        cards.append({'date': int(raw.card_obs_datesPR[k].days),
                      'step_size': int(raw.step_size[k]), 'csv': csv})
    spec = {
        'release_date': str(raw.release_date.date()),
        'releasefield_id': raw.releasefield_id,
        'grid_rotation_deg': -33.0,
        'collections': [
            {'collection_date': int(raw.collection_datesPR[0].days),
             'sentinel_csv': name + '_sentinel.csv',
             'release_csv': name + '_release.csv'}],
        'grid_obs_csv': name + '_grid.csv',
        'cardinal': cards,
    }
    with open(tmp_path / (name + 'site.json'), 'w') as f:
        json.dump(spec, f)


def test_kalbar_csv_roundtrip(tmp_path):
    """Export Kalbar's observations to generic CSVs and reload them through
    the generic path: every inference-ready array must be identical to the
    site-specific xlsx parser's output — the strongest possible check that
    the generic loaders implement the same semantics.

    Runs at the reference's 25 m MCMC resolution: coarser grids collapse
    neighboring release-grid points into one cell, and the reference aligns
    such ties positionally (raw xlsx row order) while the generic loader
    aligns by point identity — same cells, permuted rows."""
    domain = (10000.0, 400)
    _export_kalbar_csvs(tmp_path, 'kalcsv')
    ref = LocInfo('kalbar', KAL_COORD, domain)
    gen = LocInfo('kalcsv', KAL_COORD, domain, data_dir=str(tmp_path))

    assert gen.sent_ids == ref.sent_ids
    assert gen.grid_rotation_deg == -33.0
    assert gen.collection_datesPR == ref.collection_datesPR
    for a, b in zip(gen.sentinel_emerg, ref.sentinel_emerg):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(gen.release_emerg, ref.release_emerg):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(gen.release_collection, ref.release_collection):
        np.testing.assert_array_equal(a, b)
    assert gen.emerg_grids == ref.emerg_grids
    np.testing.assert_array_equal(gen.grid_obs, ref.grid_obs)
    np.testing.assert_array_equal(gen.grid_samples, ref.grid_samples)
    assert gen.grid_obs_datesPR == ref.grid_obs_datesPR
    assert gen.card_obs_datesPR == ref.card_obs_datesPR
    assert gen.step_size == ref.step_size
    for a, b in zip(gen.card_obs, ref.card_obs):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_demo_site_bayes_logpost():
    """The full Bayes stack runs on a generic site: finite log-posterior
    and finite gradients at the prior initial point."""
    import jax
    import jax.numpy as jnp

    from parasitoids_tpu.bayes.model import BayesSetup
    from parasitoids_tpu.bayes.priors import (ModelParams, ObsParams,
                                              initial_model_params,
                                              initial_obs_params)

    p = Params()
    p.cmd_line_chg(['dataset=demo', 'domain_info=(2000.0,25)'])
    p.PLOT = False
    p.OUTPUT = False
    p.PROB_MODEL = False
    p.interp_num = 2
    p.kernel_rad = 6
    p.kernel_rad_local = 3
    p.quad_nodes = 8
    s = BayesSetup(p)
    m = ModelParams(*jnp.asarray(initial_model_params(), jnp.float32))
    o0 = initial_obs_params(
        [s.locinfo.field_sizes[k] for k in s.locinfo.sent_ids],
        s.cell_res ** 2)
    o = ObsParams(o0[0], o0[1], o0[2], o0[3], jnp.asarray(o0[4:]))
    lp = float(s.log_posterior(m, o))
    assert np.isfinite(lp)
    g = jax.grad(lambda mm: s.log_posterior(mm, o))(m)
    gflat = jnp.concatenate([jnp.ravel(v) for v in g])
    assert bool(jnp.isfinite(gflat).all())


def test_unknown_dataset_raises():
    """A typo'd dataset must fail loudly, not silently keep the previous
    preset's site/release parameters under the requested label."""
    p = Params()
    with pytest.raises(ValueError, match='demmosite.json'):
        p.cmd_line_chg(['dataset=demmo'])


def test_generic_card_distances_honored():
    """Generic sites record true transect sample positions; the projection
    gathers at those distances instead of the reference's hard-coded
    5 + step_size*(1..n) formula (which only describes its one site)."""
    from parasitoids_tpu.models.observe import ObservationOps

    li = LocInfo('demo', DEMO_COORD, DEMO_DOMAIN)
    assert li.card_dists is not None
    np.testing.assert_allclose(li.card_dists[0],
                               np.tile([80.0, 160.0, 240.0], (4, 1)))
    oo = ObservationOps(li, DEMO_DOMAIN, 4)
    day, idx = oo.card_gathers[0]
    assert day == 2
    D, center = 51, 25
    res = DEMO_DOMAIN[0] / DEMO_DOMAIN[1]
    deltas = (np.array([80.0, 160.0, 240.0]) // res).astype(int)  # 1,2,3
    np.testing.assert_array_equal(
        idx[0], (center - deltas) * D + center)          # north: rows up
    np.testing.assert_array_equal(
        idx[2], center * D + (center + deltas))          # east: cols right
    # kalbar keeps the reference formula (card_dists is None)
    ref = LocInfo('kalbar', KAL_COORD, (10000.0, 100))
    assert ref.card_dists is None


def test_release_csv_point_off_grid_names_the_point(tmp_path):
    for name in ('demofields.txt', 'demoreleasegrid.txt',
                 'demo_sentinel.csv', 'demosite.json'):
        shutil.copy(os.path.join('data', name), tmp_path / name)
    with open(tmp_path / 'demo_release.csv', 'w') as f:
        f.write('x,y,date,count\n0.0,100.0,8,6\n100.1,0.0,8,4\n')
    with open(os.path.join('data', 'demosite.json')) as f:
        spec = json.load(f)
    del spec['grid_obs_csv']
    del spec['cardinal']
    with open(tmp_path / 'demosite.json', 'w') as f:
        json.dump(spec, f)
    with pytest.raises(ValueError, match=r'100\.1'):
        LocInfo('demo', DEMO_COORD, DEMO_DOMAIN, data_dir=str(tmp_path))


def test_spec_sprd_factor_opt_in(tmp_path):
    """Generic sites can opt into the pre-wind local-spread day the MAP
    layer fits for Kalbar (ref Bayes_MAP.py:200-205)."""
    from parasitoids_tpu.bayes.map_fit import default_use_sprd

    p = Params()
    p.cmd_line_chg(['dataset=demo'])
    assert p.use_sprd_factor is False
    assert default_use_sprd(p) is False

    with open(os.path.join('data', 'demosite.json')) as f:
        spec = json.load(f)
    spec['sprd_factor'] = True
    site_dir = tmp_path / 'data'
    site_dir.mkdir()
    with open(site_dir / 'demo2site.json', 'w') as f:
        json.dump(spec, f)
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        q = Params()
        q.cmd_line_chg(['dataset=demo2'])
        assert q.use_sprd_factor is True
        assert default_use_sprd(q) is True
        # preset re-application re-reads the spec, so the flag survives
        q.cmd_line_chg(['--pop'])
        assert q.use_sprd_factor is True
    finally:
        os.chdir(cwd)
    # on preset datasets the flag has no spec to come back from after a
    # preset change; the CLI/sidecar key restores it
    c = Params()
    c.cmd_line_chg(['--carnarvon', 'sprd_factor=True'])
    assert c.use_sprd_factor is True
    c.cmd_line_chg(['--pop'])
    assert c.use_sprd_factor is False
    c.cmd_line_chg(['sprd_factor=True'])
    assert c.use_sprd_factor is True and default_use_sprd(c) is True
    # kalbar keeps the reference's implied behavior
    k = Params()
    k.cmd_line_chg(['--kalbar'])
    assert default_use_sprd(k) is True


def test_scaffold_site(tmp_path):
    """The scaffolder writes a loadable spec + headed CSVs and refuses to
    overwrite; the scaffolded spec parses through Params (with the
    placeholder values) without touching existing sites."""
    from parasitoids_tpu.io.site import load_site_spec, scaffold_site

    written = scaffold_site('mysite', data_dir=str(tmp_path))
    assert len(written) == 8
    spec = load_site_spec(str(tmp_path), 'mysite')
    assert spec['r_number'] == 10000
    assert spec['collections'][0]['sentinel_csv'] == 'mysite_sentinel.csv'
    with open(tmp_path / 'mysite_release.csv') as f:
        assert f.readline().strip() == 'x,y,date,count'
    with pytest.raises(FileExistsError, match='mysitesite.json'):
        scaffold_site('mysite', data_dir=str(tmp_path))

    # the scaffolded spec flows through Params' generic-dataset branch
    scaffold_site('mysite', data_dir=str(tmp_path / 'data'))
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        p = Params()
        p.cmd_line_chg(['dataset=mysite'])
        assert p.r_number == 10000
        assert p.coord == (-27.0, 152.0)
        assert p.site_name.endswith('/mysite')
    finally:
        os.chdir(cwd)


def test_empty_releasegrid_names_the_problem(tmp_path):
    """A scaffolded (comment-only) releasegrid file fails with 'no grid
    rows found', not a misleading 'incomplete line' assert."""
    from parasitoids_tpu.io.site import scaffold_site

    scaffold_site('stub', data_dir=str(tmp_path))
    with pytest.raises(ValueError, match='no grid rows found'):
        LocInfo.get_release_grid(str(tmp_path / 'stubreleasegrid.txt'))


def test_two_collection_site(tmp_path):
    """A site with TWO collection events: every per-collection list path
    (sentinel/release frames, emergence weights, likelihood terms) has
    otherwise only ever run with length-1 lists (Kalbar has one
    collection)."""
    import jax.numpy as jnp

    from parasitoids_tpu.bayes.model import BayesSetup
    from parasitoids_tpu.bayes.priors import (ModelParams, ObsParams,
                                              initial_model_params,
                                              initial_obs_params)
    from parasitoids_tpu.models.observe import ObservationOps

    for name in ('demofields.txt', 'demoreleasegrid.txt', 'demowind.txt',
                 'demo_sentinel.csv', 'demo_release.csv', 'demo_grid.csv',
                 'demo_card.csv'):
        shutil.copy(os.path.join('data', name), tmp_path / name)
    # second collection: same channels, later dates
    with open(tmp_path / 'demo_sentinel2.csv', 'w') as f:
        f.write('id,date,count\nF1,14,4\nF2,14,2\nF1,16,1\n')
    with open(tmp_path / 'demo_release2.csv', 'w') as f:
        f.write('x,y,date,count\n0.0,100.0,14,2\n-100.0,0.0,16,1\n')
    with open(os.path.join('data', 'demosite.json')) as f:
        spec = json.load(f)
    spec['collections'].append(
        {'collection_date': 9, 'sentinel_csv': 'demo_sentinel2.csv',
         'release_csv': 'demo_release2.csv'})
    with open(tmp_path / 'demosite.json', 'w') as f:
        json.dump(spec, f)

    li = LocInfo('demo', DEMO_COORD, DEMO_DOMAIN, data_dir=str(tmp_path))
    assert len(li.sentinel_emerg) == 2
    assert len(li.release_emerg) == 2
    assert [d.days for d in li.collection_datesPR] == [5, 9]
    assert li.sentinel_emerg[1].shape == (2, 2)    # ids x dates(14, 16)
    assert li.release_emerg[1].shape == (2, 2)     # 2 points x 2 dates
    assert len(li.emerg_grids) == 2 and len(li.emerg_grids[1]) == 2

    oo = ObservationOps(li, DEMO_DOMAIN, 4)
    assert len(oo.release_proj) == 2 and len(oo.sentinel_W) == 2

    # full likelihood over both collections — needs the site files under
    # ./data for BayesSetup, so run from tmp_path with a data/ symlink
    cwd = os.getcwd()
    try:
        (tmp_path / 'data').mkdir()
        for f_ in os.listdir(tmp_path):
            if f_ != 'data' and not (tmp_path / 'data' / f_).exists():
                if (tmp_path / f_).is_file():
                    shutil.copy(tmp_path / f_, tmp_path / 'data' / f_)
        os.chdir(tmp_path)
        p = Params()
        p.cmd_line_chg(['dataset=demo', 'domain_info=(2000.0,25)'])
        p.PLOT = False
        p.OUTPUT = False
        p.PROB_MODEL = False
        p.interp_num = 2
        p.kernel_rad = 6
        p.kernel_rad_local = 3
        p.quad_nodes = 8
        s = BayesSetup(p)
        assert len(s.obs_sentinel) == 2 and len(s.obs_release) == 2
        m = ModelParams(*jnp.asarray(initial_model_params(), jnp.float32))
        o0 = initial_obs_params(
            [s.locinfo.field_sizes[k] for k in s.locinfo.sent_ids],
            s.cell_res ** 2)
        o = ObsParams(o0[0], o0[1], o0[2], o0[3], jnp.asarray(o0[4:]))
        assert np.isfinite(float(s.log_posterior(m, o)))
    finally:
        os.chdir(cwd)


def _demo_variant(tmp_path, mutate):
    """Copy the demo site into tmp_path, apply ``mutate(tmp_path)``, and
    build LocInfo from it."""
    for name in ('demofields.txt', 'demoreleasegrid.txt', 'demowind.txt',
                 'demosite.json', 'demo_sentinel.csv', 'demo_release.csv',
                 'demo_grid.csv', 'demo_card.csv'):
        shutil.copy(os.path.join('data', name), tmp_path / name)
    mutate(tmp_path)
    return LocInfo('demo', DEMO_COORD, DEMO_DOMAIN, data_dir=str(tmp_path))


def test_generic_grid_obs_off_grid_point_raises(tmp_path):
    def mutate(d):
        with open(d / 'demo_grid.csv', 'a') as f:
            f.write('33.3,0.0,2,1\n')
    with pytest.raises(ValueError, match=r'33\.3'):
        _demo_variant(tmp_path, mutate)


def test_all_zero_effort_columns_raise(tmp_path):
    def zero_samples(d):
        rows = ['# x,y,area,samples,collection\n']
        for y in (100.0, 0.0, -100.0):
            for x in (-100.0, 0.0, 100.0):
                rows.append('{},{},25.0,0,1.0\n'.format(x, y))
        (d / 'demoreleasegrid.txt').write_text(''.join(rows))
    with pytest.raises(ValueError, match='samples'):
        _demo_variant(tmp_path, zero_samples)

    def zero_collection(d):
        rows = ['# x,y,area,samples,collection\n']
        for y in (100.0, 0.0, -100.0):
            for x in (-100.0, 0.0, 100.0):
                rows.append('{},{},25.0,1,0.0\n'.format(x, y))
        (d / 'demoreleasegrid.txt').write_text(''.join(rows))
    with pytest.raises(ValueError, match='collection'):
        _demo_variant(tmp_path, zero_collection)


def test_card_direction_validation(tmp_path):
    def mutate(d):
        (d / 'demo_card.csv').write_text(
            'direction,distance,count\nNorth,80,3\nNE,160,1\n')
    with pytest.raises(ValueError, match="'ne'"):
        _demo_variant(tmp_path, mutate)

    # case/whitespace are normalized, not rejected
    ok = tmp_path / 'ok'
    ok.mkdir()

    def mutate_ok(d):
        (d / 'demo_card.csv').write_text(
            'direction,distance,count\n'
            'North,80,3\n south ,80,2\nEAST,80,1\nwest,80,0\n')
    li = _demo_variant(ok, mutate_ok)
    assert li.card_obs[0].shape == (4, 1)
    np.testing.assert_array_equal(li.card_obs[0][:, 0], [3, 2, 1, 0])


# ----------------------------------------------------------------------
# rotating-sentinel ('exposure') protocol + sentinel-only collections —
# the ingestion path for the real data/carnarvonearlemergence.txt record
# (ref ParasitoidModel.py:28-60), whose day-1..21 counts are impossible
# under the Kalbar lab protocol's 19-25-day incubation offset
# ----------------------------------------------------------------------

def test_exposure_weights_unit():
    from parasitoids_tpu.models.observe import _exposure_weights
    W = _exposure_weights([2, 5, 9], 7)
    # col 0 <- days 1..2 (idx 0..1); col 1 <- days 3..5 (idx 2..4);
    # col 2 <- days 6..9 truncated to the 7-day horizon (idx 5..6)
    expect = np.zeros((7, 3))
    expect[0:2, 0] = 1.0
    expect[2:5, 1] = 1.0
    expect[5:7, 2] = 1.0
    np.testing.assert_array_equal(W, expect)
    # windows partition the covered days: no day feeds two columns
    assert (W.sum(axis=1) <= 1.0).all()
    with pytest.raises(ValueError, match='strictly increasing'):
        _exposure_weights([2, 2, 5], 7)
    with pytest.raises(ValueError, match='strictly increasing'):
        _exposure_weights([0, 3], 7)


def test_exposure_protocol_sentinel_only(tmp_path):
    """A collection may declare protocol='exposure' and omit release_csv:
    LocInfo records the protocol and keeps no release frame, and
    ObservationOps builds the sentinel weights from the exposure windows
    (no incubation convolution)."""
    from parasitoids_tpu.models.observe import (ObservationOps,
                                                _exposure_weights)

    def mutate(d):
        with open(d / 'demosite.json') as f:
            spec = json.load(f)
        spec['collections'] = [{'collection_date': 9,
                                'sentinel_csv': 'demo_sentinel.csv',
                                'protocol': 'exposure'}]
        del spec['grid_obs_csv']
        del spec['cardinal']
        (d / 'demo_sentinel.csv').write_text(
            'id,date,count\nF1,3,4\nF2,3,1\nF1,6,2\nF2,6,0\nF1,9,1\n')
        with open(d / 'demosite.json', 'w') as f:
            json.dump(spec, f)

    li = _demo_variant(tmp_path, mutate)
    assert li.sent_protocols == ['exposure']
    assert li.release_DataFrames == [] and li.release_coll_idx == []
    assert li.sentinel_emerg[0].shape == (2, 3)        # F2 day-9 zero-filled
    np.testing.assert_allclose(li.sentinel_emerg[0],
                               [[4.0, 2.0, 1.0], [1.0, 0.0, 0.0]])
    ndays = 10
    oo = ObservationOps(li, DEMO_DOMAIN, ndays)
    assert oo.release_proj == []
    np.testing.assert_array_equal(oo.sentinel_W[0],
                                  _exposure_weights([3, 6, 9], ndays))


def test_mixed_protocols_pair_release_with_its_collection(tmp_path):
    """Two collections — a lab one with a release CSV and a later
    sentinel-only exposure one: release_coll_idx must map the single kept
    release frame back to collection 0, so its emergence weights use
    collection 0's date (not the exposure collection's)."""
    from parasitoids_tpu.models.observe import (ObservationOps,
                                                _emergence_weights)

    def mutate(d):
        with open(d / 'demosite.json') as f:
            spec = json.load(f)
        spec['collections'] = [
            {'collection_date': 5, 'sentinel_csv': 'demo_sentinel.csv',
             'release_csv': 'demo_release.csv'},
            {'collection_date': 9, 'sentinel_csv': 'exp_sentinel.csv',
             'protocol': 'exposure'},
        ]
        (d / 'exp_sentinel.csv').write_text(
            'id,date,count\nF1,3,4\nF2,3,1\nF1,9,2\nF2,9,0\n')
        with open(d / 'demosite.json', 'w') as f:
            json.dump(spec, f)

    li = _demo_variant(tmp_path, mutate)
    assert li.sent_protocols == ['lab', 'exposure']
    assert len(li.release_DataFrames) == 1 and li.release_coll_idx == [0]
    ndays = 28
    oo = ObservationOps(li, DEMO_DOMAIN, ndays)
    assert len(oo.release_proj) == 1
    np.testing.assert_array_equal(
        oo.release_proj[0].weights,
        np.asarray(_emergence_weights(5, [22, 26], ndays), np.float32))
    # lab sentinel weights untouched; exposure frame uses window weights
    assert (np.asarray(oo.sentinel_W[0]) != 0).any()
    np.testing.assert_array_equal(
        oo.sentinel_W[1][:, 0], np.asarray([1.0] * 3 + [0.0] * 25,
                                           np.float32))


def test_unknown_protocol_raises(tmp_path):
    def mutate(d):
        with open(d / 'demosite.json') as f:
            spec = json.load(f)
        spec['collections'][0]['protocol'] = 'overnight'
        with open(d / 'demosite.json', 'w') as f:
            json.dump(spec, f)
    with pytest.raises(ValueError, match='overnight'):
        _demo_variant(tmp_path, mutate)
