"""Rounding semantics: the reference mixes two different ``round(x, 2)``
behaviors —

* ``np.float64.__round__`` (scaled rint) for purities/qualities/diffs:
  containers are np.int64, so those divisions give np.float64;
* CPython ``double_round`` (correctly rounded decimal) for the input
  occupancy: Counter counts are Python ints.

``np_round2`` / ``py_round2`` must each match their counterpart over the
entire reachable domain.
"""

import numpy as np
import jax
import jax.numpy as jnp

from marl_sortingenv_tpu.core.dynamics import np_round2, py_round2, py_round_int

Z = np.uint64(0)


def test_np_round2_purity_domain_exhaustive():
    pairs = []
    for total in range(1, 701):
        for true in range(0, total + 1):
            pairs.append((true, total))
    pairs = np.array(pairs, np.int64)
    x = pairs[:, 0].astype(np.float64) / pairs[:, 1].astype(np.float64)
    got = np.asarray(jax.jit(np_round2)(jnp.asarray(x), Z))
    expected = np.array([round(np.float64(v), 2) for v in x])
    mism = got != expected
    assert not mism.any(), (pairs[mism][:5], got[mism][:5], expected[mism][:5])


def test_np_round2_mean_purity_and_diffs():
    xs = []
    for total in range(1, 401):
        for true in range(0, total + 1):
            xs.append(1.0 - (total - true) / total)
    for k in range(0, 101):
        xs.append(k / 100 - 0.9)
    x = np.array(xs, np.float64)
    got = np.asarray(jax.jit(np_round2)(jnp.asarray(x), Z))
    expected = np.array([round(np.float64(v), 2) for v in x])
    assert (got == expected).all()


def test_py_round2_occupancy_domain():
    # occupancy: sum(counts)/100 on pure Python ints -> CPython round
    x = np.array([k / 100 for k in range(0, 401)], np.float64)
    got = np.asarray(jax.jit(py_round2)(jnp.asarray(x), Z))
    expected = np.array([round(float(v), 2) for v in x])
    np.testing.assert_array_equal(got, expected)


def test_py_round2_edge_values():
    x = np.array([0.0, 0.005, 0.015, 0.025, 0.125, 1.0, -0.04999999999999993,
                  -0.125, 0.9999999999999999, 5e-324, 1e-300, 200.0])
    got = np.asarray(jax.jit(py_round2)(jnp.asarray(x), Z))
    expected = np.array([round(float(v), 2) for v in x])
    np.testing.assert_array_equal(got, expected)


def test_round_int_bankers():
    vals = np.array([0.5, 1.5, 2.5, 3.5, 4.5, 0.4999999999999999, 74.5, 75.5])
    got = np.asarray(jax.jit(py_round_int)(jnp.asarray(vals)))
    expected = np.array([round(float(v)) for v in vals])
    np.testing.assert_array_equal(got, expected)


def test_semantics_actually_differ():
    # the canonical witness: 370/400
    x = np.float64(370) / np.float64(400)
    assert round(x, 2) == 0.92          # numpy semantics
    assert round(float(x), 2) == 0.93   # CPython semantics
    assert float(jax.jit(np_round2)(x, Z)) == 0.92
    assert float(jax.jit(py_round2)(x, Z)) == 0.93
