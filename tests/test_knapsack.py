import numpy as np
import pytest

from vidsum_tpu.ops.knapsack import knapsack, knapsack_jax
from tests.oracles import knapsack_oracle


def random_instance(rng, max_n=30, max_w=40):
    n = rng.integers(1, max_n)
    wt = rng.integers(1, 15, size=n).tolist()
    val = [float(np.float32(v).item()) for v in rng.random(n)]
    W = int(rng.integers(0, max_w))
    return W, wt, val


def test_textbook_example():
    # classic instance with a known optimum
    assert knapsack(7, [2, 2, 1, 1, 1, 2], [4.0, 4.0, 2.0, 2.0, 2.0, 4.0]) \
        == [0, 1, 2, 3, 4]


def test_zero_capacity():
    assert knapsack(0, [1, 2], [1.0, 2.0]) == []


def test_matches_oracle_bitwise():
    rng = np.random.default_rng(0)
    for _ in range(200):
        W, wt, val = random_instance(rng)
        assert knapsack(W, wt, val) == knapsack_oracle(W, wt, val)


def test_ties_resolved_like_reference():
    # equal values/weights: the backtrack must pick the same subset
    W, wt, val = 4, [2, 2, 2], [1.0, 1.0, 1.0]
    assert knapsack(W, wt, val) == knapsack_oracle(W, wt, val)


def test_jax_path_matches_numpy():
    rng = np.random.default_rng(1)
    for _ in range(5):  # each distinct (n, W) shape compiles a fresh program
        W, wt, val = random_instance(rng, max_n=12, max_w=25)
        mask = np.asarray(knapsack_jax(W, np.array(wt), np.array(val)))
        assert sorted(np.nonzero(mask)[0].tolist()) == knapsack(W, wt, val)


def test_input_validation():
    with pytest.raises(ValueError):
        knapsack(-1, [1], [1.0])
    with pytest.raises(ValueError):
        knapsack(3, [1, 2], [1.0])
