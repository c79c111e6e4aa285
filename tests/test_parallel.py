"""Multi-device sharding tests (8 virtual CPU devices, see conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from parasitoids_tpu.config import Params


def _tiny_setup():
    from parasitoids_tpu.bayes.model import BayesSetup
    p = Params()
    p.cmd_line_chg(['--kalbar'])
    p.PLOT = False
    p.OUTPUT = False
    p.PROB_MODEL = False
    p.ndays = 3
    p.domain_info = (10000.0, 50)
    p.interp_num = 2
    p.kernel_rad = 6
    p.kernel_rad_local = 3
    p.quad_nodes = 8
    return BayesSetup(p)


@pytest.fixture(scope='module')
def setup():
    return _tiny_setup()


def test_ensemble_projections_sharded(setup):
    from parasitoids_tpu.parallel.chains import chain_mesh
    from parasitoids_tpu.parallel.ensemble import ensemble_projections
    from parasitoids_tpu.bayes.priors import initial_model_params

    n_dev = len(jax.devices())
    assert n_dev == 8, 'conftest should provide 8 virtual devices'
    mesh = chain_mesh()
    m0 = initial_model_params()
    B = 8
    rng = np.random.default_rng(0)
    thetas = np.tile(m0, (B, 1)) * (1 + 0.02 * rng.standard_normal((B, 15)))
    thetas[:, 13] = 30.0

    rel, sent, grid = ensemble_projections(setup, thetas, mesh=mesh)
    assert grid.shape[0] == B
    assert np.isfinite(np.asarray(grid)).all()
    # sharded result matches unsharded
    rel2, sent2, grid2 = ensemble_projections(setup, thetas, mesh=None)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(grid2),
                               rtol=1e-5)
    # distinct parameters produce distinct projections
    assert not np.allclose(np.asarray(grid)[0], np.asarray(grid)[1])


def test_ensemble_fields_shape(setup):
    from parasitoids_tpu.parallel.ensemble import ensemble_fields
    from parasitoids_tpu.bayes.priors import initial_model_params

    thetas = np.tile(initial_model_params(), (2, 1))
    fields = ensemble_fields(setup, thetas)
    D = 2 * 50 + 1
    assert fields.shape == (2, setup.ndays, D, D)
    sums = np.asarray(fields.sum(axis=(2, 3)))
    # release day conserves; later days only lose mass (off-domain
    # advection is physical at this coarse test config), never gain
    np.testing.assert_allclose(sums[:, 0], setup.r_number, rtol=1e-3)
    assert (sums[:, 1:] <= sums[:, :-1] * (1 + 1e-5)).all()
    assert (sums >= 0.8 * setup.r_number).all()


def test_nuts_chains_over_mesh(setup):
    """NUTS chains shard over the device mesh like AM chains."""
    from parasitoids_tpu.bayes.nuts import (NUTSConfig, nuts_sample)
    from parasitoids_tpu.parallel.chains import chain_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    def logpdf(z):
        return -0.5 * jnp.sum(z ** 2)

    mesh = chain_mesh()
    cfg = NUTSConfig(num_warmup=10, num_samples=10, max_depth=4)
    keys = random.split(random.PRNGKey(0), 8)
    z0s = jnp.zeros((8, 3))
    sharding = NamedSharding(mesh, P('chains'))
    keys = jax.device_put(keys, sharding)
    z0s = jax.device_put(z0s, sharding)
    out = jax.vmap(lambda z, k: nuts_sample(logpdf, z, k, cfg))(z0s, keys)
    assert out['samples'].shape == (8, 10, 3)
    assert np.isfinite(np.asarray(out['samples'])).all()


def test_ensemble_sharded_batch_not_divisible(setup):
    """A draw count that doesn't divide the device count is padded inside
    _sharded_map and the padding stripped — the spread/predictive CLIs'
    default --draws must work on any mesh."""
    from parasitoids_tpu.parallel.chains import chain_mesh
    from parasitoids_tpu.parallel.ensemble import ensemble_projections
    from parasitoids_tpu.bayes.priors import initial_model_params

    mesh = chain_mesh()
    rng = np.random.default_rng(1)
    B = 3    # 8 devices, B=3: needs padding
    thetas = np.tile(initial_model_params(), (B, 1)) \
        * (1 + 0.02 * rng.standard_normal((B, 15)))
    thetas[:, 13] = 30.0
    rel, sent, grid = ensemble_projections(setup, thetas, mesh=mesh)
    assert grid.shape[0] == B
    rel2, sent2, grid2 = ensemble_projections(setup, thetas, mesh=None)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(grid2),
                               rtol=1e-5)


def test_init_chains_always_in_prior_support(setup):
    """Jittered starts live in unconstrained space, so every chain begins
    with a finite prior — a multiplicative jitter on constrained values
    pushed lam (init 0.95, Beta support (0,1)) out of support with ~15%
    probability per chain, silently freezing it for the whole run."""
    from parasitoids_tpu.parallel.chains import init_chains

    states = init_chains(setup, random.PRNGKey(0), 16, jitter=0.05)
    pm = np.asarray(states.prior_m)
    assert pm.shape == (16,)
    assert np.isfinite(pm).all()
    lam = np.asarray(states.m)[:, 12]
    assert ((lam > 0) & (lam < 1)).all()
    # starts are actually over-dispersed (not collapsed to the init point)
    assert np.asarray(states.m)[:, 0].std() > 0


def test_run_chains_rejects_indivisible_mesh(setup):
    from parasitoids_tpu.bayes.sampler import MCMCConfig
    from parasitoids_tpu.parallel.chains import (chain_mesh, init_chains,
                                                 run_chains)

    states = init_chains(setup, random.PRNGKey(1), 3)
    with pytest.raises(ValueError, match='divisible'):
        run_chains(setup, states, MCMCConfig(n_samples=2),
                   mesh=chain_mesh())
