"""Tests for the runtime numerical sanitizers (utils/checks.py)."""

import numpy as np
import pytest

from parasitoids_tpu.config import Params
from parasitoids_tpu.utils.checks import (NumericalCheckError,
                                          validate_fields, warn_on_loss)


def _params():
    p = Params()
    p.cmd_line_chg(['--kalbar'])
    return p


def test_validate_prob_ok_and_bad():
    p = _params()
    good = np.full((3, 5, 5), 1 / 25.0, np.float32)
    sums = validate_fields(good, p, prob_model=True)
    np.testing.assert_allclose(sums, 1.0, atol=1e-6)

    bad = good.copy()
    bad[1] *= 0.9
    with pytest.raises(NumericalCheckError, match='pmf sums'):
        validate_fields(bad, p, prob_model=True)

    nanf = good.copy()
    nanf[0, 0, 0] = np.nan
    with pytest.raises(NumericalCheckError, match='non-finite'):
        validate_fields(nanf, p, prob_model=True)

    neg = good.copy()
    neg[2, 3, 3] = -1e-3
    with pytest.raises(NumericalCheckError, match='negative density'):
        validate_fields(neg, p, prob_model=True)


def test_validate_pop_monotone():
    p = _params()
    r = float(p.r_number)
    good = np.stack([np.full((4, 4), r / 16),
                     np.full((4, 4), 0.9 * r / 16)]).astype(np.float32)
    validate_fields(good, p, prob_model=False)

    grow = good[::-1].copy()   # population increases -> violation
    with pytest.raises(NumericalCheckError, match='increased'):
        validate_fields(grow, p, prob_model=False)

    over = good.copy()
    over[0] *= 1.5             # exceeds release total
    with pytest.raises(NumericalCheckError, match='exceeds release'):
        validate_fields(over, p, prob_model=False)


def test_warn_on_loss():
    with pytest.warns(RuntimeWarning, match='advected beyond'):
        lost = warn_on_loss([0.0, 0.02, 0.3], [1, 2, 3])
    assert lost == [(2, 0.02), (3, 0.3)]
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        assert warn_on_loss([0.0, 1e-9], [1, 2]) == []
