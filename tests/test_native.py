"""Native C++ eval runtime must be bit-identical to the NumPy/Python paths."""

import numpy as np
import pytest

native = pytest.importorskip("vidsum_tpu.native")

from vidsum_tpu.ops.knapsack import knapsack
from vidsum_tpu.ops.kts import calc_scatters, cpd_nonlin
from tests.oracles import knapsack_oracle


def test_knapsack_native_bitwise():
    rng = np.random.default_rng(40)
    for _ in range(300):
        n = int(rng.integers(1, 40))
        wt = rng.integers(1, 20, size=n).tolist()
        val = [float(np.float32(v).item()) for v in rng.random(n)]
        W = int(rng.integers(0, 60))
        assert native.knapsack_native(W, np.array(wt), np.array(val)) == \
            knapsack_oracle(W, wt, val)


def test_knapsack_wrapper_uses_native():
    # the ops.knapsack entry point dispatches to native when available
    got = knapsack(7, [2, 2, 1, 1, 1, 2], [4.0, 4.0, 2.0, 2.0, 2.0, 4.0])
    assert got == [0, 1, 2, 3, 4]


def test_scatters_native_bitwise():
    rng = np.random.default_rng(41)
    for n in (1, 3, 17, 50):
        feats = rng.normal(size=(n, 8))
        K = feats @ feats.T
        got = native.calc_scatters_native(K)
        want = calc_scatters(K, use_native=False)
        np.testing.assert_array_equal(got, want)


def test_cpd_dp_native_bitwise():
    rng = np.random.default_rng(42)
    for n, m in ((12, 2), (30, 4), (45, 7)):
        feats = rng.normal(size=(n, 8))
        K = feats @ feats.T
        J = calc_scatters(K, use_native=False)
        cps_n, scores_n = native.cpd_dp_native(J, m)
        cps_p, scores_p = cpd_nonlin(K, m, scatters=J)
        np.testing.assert_array_equal(cps_n, cps_p)
        np.testing.assert_array_equal(scores_n, scores_p)


def test_cpd_dp_native_with_bounds():
    rng = np.random.default_rng(43)
    K = rng.normal(size=(30, 8)) @ rng.normal(size=(30, 8)).T
    # symmetric gram
    feats = rng.normal(size=(30, 8))
    K = feats @ feats.T
    J = calc_scatters(K, use_native=False)
    cps_n, scores_n = native.cpd_dp_native(J, 3, lmin=3, lmax=15)
    cps_p, scores_p = cpd_nonlin(K, 3, lmin=3, lmax=15, scatters=J)
    np.testing.assert_array_equal(cps_n, cps_p)
    np.testing.assert_array_equal(scores_n, scores_p)
