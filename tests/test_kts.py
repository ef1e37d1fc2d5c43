import numpy as np
import pytest

from vidsum_tpu.ops.kts import (
    calc_scatters, calc_scatters_jax, change_points_from_cps, cpd_nonlin,
    cpd_nonlin_jax, kts_segmentation,
)
from vidsum_tpu.ops.segmentation import (
    get_segment_fn, starts_to_bounds, uniform_segmentation,
)
from tests.oracles import cpd_oracle, scatters_oracle


def gram(features):
    return features @ features.T


def planted_features(rng, seg_lens, dim=16):
    """Features with piecewise-constant means → obvious change points."""
    chunks = []
    for L in seg_lens:
        center = rng.normal(size=dim) * 5
        chunks.append(center + 0.1 * rng.normal(size=(L, dim)))
    return np.concatenate(chunks, axis=0)


def test_scatters_bitwise_vs_oracle():
    rng = np.random.default_rng(7)
    for n in (1, 2, 5, 17, 40):
        K = gram(rng.normal(size=(n, 8)))
        np.testing.assert_array_equal(calc_scatters(K), scatters_oracle(K))


def test_cpd_bitwise_vs_oracle():
    rng = np.random.default_rng(8)
    for n, m in ((10, 2), (25, 4), (40, 6)):
        K = gram(rng.normal(size=(n, 8)))
        cps, scores = cpd_nonlin(K, m)
        cps_o, scores_o = cpd_oracle(K, m)
        np.testing.assert_array_equal(cps, cps_o)
        np.testing.assert_array_equal(scores, scores_o)


def test_cpd_with_length_bounds_vs_oracle():
    rng = np.random.default_rng(9)
    K = gram(rng.normal(size=(30, 8)))
    cps, scores = cpd_nonlin(K, 3, lmin=3, lmax=15)
    cps_o, scores_o = cpd_oracle(K, 3, lmin=3, lmax=15)
    np.testing.assert_array_equal(cps, cps_o)
    np.testing.assert_array_equal(scores, scores_o)


def test_cpd_recovers_planted_change_points():
    rng = np.random.default_rng(10)
    feats = planted_features(rng, [20, 20, 20])
    cps, _ = cpd_nonlin(gram(feats), 2)
    assert abs(cps[0] - 20) <= 1 and abs(cps[1] - 40) <= 1


def test_kts_segmentation_auto_ncp():
    rng = np.random.default_rng(11)
    feats = planted_features(rng, [15, 15, 15, 15])
    K = gram(feats)
    cps, costs = kts_segmentation(K, 8, vmax=1.0)
    assert len(costs) == 9
    # should find about 3 change points near 15/30/45
    assert 1 <= len(cps) <= 8


def test_cpd_zero_change_points():
    rng = np.random.default_rng(12)
    K = gram(rng.normal(size=(10, 4)))
    cps, scores = cpd_nonlin(K, 0)
    assert cps.size == 0 and scores.shape == (1,)


def test_jax_scatters_match_numpy():
    import jax
    rng = np.random.default_rng(13)
    K = gram(rng.normal(size=(20, 8)).astype(np.float32))
    got = np.asarray(calc_scatters_jax(K.astype(np.float32)))
    want = calc_scatters(K.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_jax_cpd_matches_numpy():
    rng = np.random.default_rng(14)
    K = gram(rng.normal(size=(24, 8))).astype(np.float32)
    # float32 vs float64 can differ on near-ties; use well-separated segments
    feats = planted_features(rng, [8, 8, 8])
    K = gram(feats).astype(np.float32)
    cps, _ = cpd_nonlin_jax(K, 2)
    cps_np, _ = cpd_nonlin(K.astype(np.float64), 2)
    np.testing.assert_array_equal(np.asarray(cps), cps_np)


def test_change_points_layout():
    cp = change_points_from_cps(np.array([10, 25]), 40)
    np.testing.assert_array_equal(cp, [[0, 9], [10, 24], [25, 39]])


def test_uniform_segmentation():
    np.testing.assert_array_equal(uniform_segmentation(10, sec_per_seg=2, fps=2),
                                  [0, 4, 8])
    bounds = starts_to_bounds(uniform_segmentation(10), 10)
    np.testing.assert_array_equal(bounds, [[0, 3], [4, 7], [8, 9]])


def test_segment_dispatch():
    assert get_segment_fn("uniform") is uniform_segmentation
    with pytest.raises(NotImplementedError):
        get_segment_fn("nope")


def test_kts_segmentation_jax_matches_host_auto_selection():
    """The fully on-device auto-KTS (one program: DP scan + penalized count
    selection + masked backtrack) must agree with the float64 host path on
    well-separated segments (f32-vs-f64 near-ties are the only legitimate
    divergence)."""
    from vidsum_tpu.ops.kts import kts_segmentation_jax

    rng = np.random.default_rng(21)
    feats = planted_features(rng, [30, 25, 40, 20, 35])
    K64 = gram(feats)
    cps_host, costs_host = kts_segmentation(K64, 12, vmax=1.0)

    cps_pad, m_best, costs_dev = kts_segmentation_jax(
        K64.astype(np.float32), 12, vmax=1.0)
    m_best = int(m_best)
    assert m_best == len(cps_host)
    np.testing.assert_array_equal(np.asarray(cps_pad)[:m_best], cps_host)
    # selection is the contract (exact above); the f32 cost values
    # themselves carry scatter-matrix rounding at this magnitude
    finite = np.isfinite(costs_host)
    np.testing.assert_allclose(np.asarray(costs_dev)[finite],
                               costs_host[finite], rtol=5e-2, atol=2e-3)
