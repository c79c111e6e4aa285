"""Tests for the native C++ BVN host library (native/bvnlib).

The library fills the role of Genz's Fortran MVNDST in the reference
(``scipy.stats.mvn.mvnun``, ParasitoidModel.py:22,340) for host-side work;
it must agree with the first-party NumPy implementation (utils/bvn_host.py),
which itself is validated against the device integrator.
"""

import numpy as np
import pytest

from parasitoids_tpu.utils.bvn_host import (bvn_cell_masses_host, bvn_rect,
                                            bvn_upper)
from parasitoids_tpu.utils.native import (bvn_cell_masses_native,
                                          bvn_rect_native, bvn_upper_native,
                                          load_bvnlib)

pytestmark = pytest.mark.skipif(load_bvnlib() is None,
                                reason='native toolchain unavailable')


def test_upper_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    for _ in range(300):
        h, k = rng.uniform(-5, 5, 2)
        r = rng.uniform(-0.999, 0.999)
        got = bvn_upper_native(h, k, r)
        want = float(bvn_upper(h, k, r))
        assert abs(got - want) < 1e-13, (h, k, r)


def test_upper_symmetries():
    # P(X>h, Y>k) symmetric in (h, k); complement identities
    for (h, k, r) in [(0.3, -1.2, 0.6), (2.0, 2.0, -0.8), (0.0, 0.0, 0.5)]:
        assert abs(bvn_upper_native(h, k, r) -
                   bvn_upper_native(k, h, r)) < 1e-14
        # marginalization: P(X>h, Y>-inf) = Phi(-h)
        from scipy.special import ndtr
        assert abs(bvn_upper_native(h, -30.0, r) - ndtr(-h)) < 1e-12


def test_rect_matches_and_sums():
    for rho in (-0.95, -0.3, 0.0, 0.5, 0.925, 0.99):
        got = bvn_rect_native((-1., -2.), (2., 1.), (0.1, -0.2),
                              1.3, 0.7, rho)
        want = float(bvn_rect((-1., -2.), (2., 1.), (0.1, -0.2),
                              1.3, 0.7, rho))
        assert abs(got - want) < 1e-13
        assert 0.0 <= got <= 1.0


def test_cell_masses_grid():
    M = bvn_cell_masses_native((3.0, -5.0), 21.1, 10.6, 0.5, 25.0, 8)
    W = bvn_cell_masses_host((3.0, -5.0), 21.1, 10.6, 0.5, 25.0, 8)
    np.testing.assert_allclose(M, W, atol=1e-13)
    assert abs(M.sum() - 1.0) < 1e-6          # window covers the mass
    assert M.min() >= -1e-15
    # orientation: mean at (+x, -y) -> peak right of center, below center
    i, j = np.unravel_index(M.argmax(), M.shape)
    assert j >= 8 and i >= 8
