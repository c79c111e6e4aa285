"""Pytest configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (mirrors the reference's config-driven
CUDA-on/off test gating, test_CalcSol.py:15-33, replaced here by a platform
pin).  Set PARA_TPU_TEST_PLATFORM=tpu to run the suite on a real chip.
"""

import os
import sys

# Must happen before jax is imported anywhere.  Force (not setdefault): the
# hosted-TPU driver shell exports JAX_PLATFORMS=axon, and pin_platform_from_env
# (called by every driver entry point) re-applies the env value — so the env
# var itself must name the test platform.
os.environ['JAX_PLATFORMS'] = os.environ.get('PARA_TPU_TEST_PLATFORM', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
os.chdir(REPO_ROOT)  # data files are addressed repo-relative, as in reference

import pytest  # noqa: E402

# The hosted-TPU environment's site hook force-registers its PJRT plugin and
# sets jax_platforms to include it, overriding JAX_PLATFORMS; pin the config
# itself so the suite runs on CPU even when the device tunnel is unreachable.
import jax  # noqa: E402

jax.config.update('jax_platforms',
                  os.environ.get('PARA_TPU_TEST_PLATFORM', 'cpu'))

from parasitoids_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_addoption(parser):
    parser.addoption('--runslow', action='store_true', help='run slow tests')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--runslow'):
        return
    skip_slow = pytest.mark.skip(reason='need --runslow option to run')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip_slow)


def pytest_configure(config):
    config.addinivalue_line('markers', 'slow: mark test as slow to run')


@pytest.fixture(scope='session')
def params():
    from parasitoids_tpu.config import Params
    p = Params()
    p.OUTPUT = False
    p.PLOT = False
    return p


@pytest.fixture(scope='session')
def domain_info():
    # (dist from center to side in m, cells from center to side)
    return (8000.0, 320)
