"""Native host-library parity tests: the C++ routines must agree with the
pure-NumPy/Python fallbacks exactly."""

import numpy as np
import pytest

from blasted_tpu import native
from blasted_tpu.precond.ilu_pattern import compute_ilu_positions
from helpers import random_csr

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _py_levels_lower(rowptr, colind):
    n = rowptr.shape[0] - 1
    level = np.zeros(n, dtype=np.int32)
    for i in range(n):
        cols = colind[rowptr[i]:rowptr[i + 1]]
        deps = cols[cols < i]
        if deps.size:
            level[i] = level[deps].max() + 1
    return level


def _py_levels_upper(rowptr, colind):
    n = rowptr.shape[0] - 1
    level = np.zeros(n, dtype=np.int32)
    for i in range(n - 1, -1, -1):
        cols = colind[rowptr[i]:rowptr[i + 1]]
        deps = cols[cols > i]
        if deps.size:
            level[i] = level[deps].max() + 1
    return level


def test_levels_parity():
    A = random_csr(120, density=0.06, seed=0)
    rowptr = np.asarray(A.rowptr)
    colind = np.asarray(A.colind)
    np.testing.assert_array_equal(native.levels_lower(rowptr, colind),
                                  _py_levels_lower(rowptr, colind))
    np.testing.assert_array_equal(native.levels_upper(rowptr, colind),
                                  _py_levels_upper(rowptr, colind))


def test_diagind_parity():
    A = random_csr(100, density=0.08, seed=1)
    got = native.diagind(np.asarray(A.rowptr), np.asarray(A.colind))
    np.testing.assert_array_equal(got, np.asarray(A.diagind))


def test_ilu_positions_parity():
    A = random_csr(90, density=0.1, seed=2)
    rowptr = np.asarray(A.rowptr)
    colind = np.asarray(A.colind)
    diag = np.asarray(A.diagind)
    posptr, lowerp, upperp = native.ilu_positions(rowptr, colind, diag)
    ref = compute_ilu_positions(rowptr, colind, diag)
    np.testing.assert_array_equal(posptr, ref.posptr)
    np.testing.assert_array_equal(lowerp, ref.lowerp)
    np.testing.assert_array_equal(upperp, ref.upperp)
