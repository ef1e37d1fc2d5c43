import numpy as np

from vidsum_tpu.ops.summary import generate_summary, shot_scores, upsample
from tests.oracles import knapsack_oracle, upsample_oracle


def make_video(rng, n_picks=40, step=15):
    positions = np.arange(0, n_picks * step, step)
    n_frames = int(positions[-1] + rng.integers(1, step + 1))
    scores = rng.random(n_picks).astype(np.float32)
    # contiguous inclusive shot bounds over the full frame range
    cuts = np.sort(rng.choice(np.arange(1, n_frames), size=5, replace=False))
    bounds = np.concatenate([[0], cuts, [n_frames]])
    shot_bound = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
    return scores, n_frames, positions, shot_bound


def test_upsample_matches_oracle():
    rng = np.random.default_rng(2)
    for _ in range(50):
        scores, n_frames, positions, _ = make_video(rng)
        got = upsample(scores, n_frames, positions)
        want = upsample_oracle(scores, n_frames, positions)
        np.testing.assert_array_equal(got, want)


def test_upsample_appends_final_boundary():
    scores = np.array([1.0, 2.0], dtype=np.float32)
    positions = np.array([0, 3])
    out = upsample(scores, 7, positions)
    np.testing.assert_array_equal(out, [1, 1, 1, 2, 2, 2, 2])


def test_upsample_zero_fills_past_scores():
    # positions already end at n_frames but scores are short by one segment
    scores = np.array([5.0], dtype=np.float32)
    positions = np.array([0, 2, 4])
    out = upsample(scores, 4, positions)
    np.testing.assert_array_equal(out, [5, 5, 0, 0])


def test_generate_summary_bitwise_parity():
    """Selected shots must match the naive reference-semantics pipeline
    exactly (the BASELINE.json bit-for-bit north star)."""
    rng = np.random.default_rng(3)
    for _ in range(30):
        scores, n_frames, positions, shot_bound = make_video(rng)
        [summary] = generate_summary([shot_bound], [scores], [n_frames],
                                     [positions])
        # naive pipeline
        frame_scores = upsample_oracle(scores, n_frames, positions)
        lengths = [int(e - s + 1) for s, e in shot_bound]
        values = [frame_scores[s:e + 1].mean().item() for s, e in shot_bound]
        budget = int((shot_bound[-1][1] + 1) * 0.15)
        chosen = knapsack_oracle(budget, lengths, values)
        want = np.zeros(int(shot_bound[-1][1]) + 1, dtype=np.int8)
        for c in chosen:
            want[shot_bound[c][0]:shot_bound[c][1] + 1] = 1
        np.testing.assert_array_equal(summary, want)


def test_summary_respects_budget():
    rng = np.random.default_rng(4)
    scores, n_frames, positions, shot_bound = make_video(rng)
    [summary] = generate_summary([shot_bound], [scores], [n_frames],
                                 [positions])
    assert summary.sum() <= int((shot_bound[-1][1] + 1) * 0.15)
    assert set(np.unique(summary)).issubset({0, 1})


def test_shot_scores_inclusive_bounds():
    frame_scores = np.arange(10, dtype=np.float32)
    bounds = np.array([[0, 4], [5, 9]])
    lengths, values = shot_scores(frame_scores, bounds)
    assert lengths == [5, 5]
    assert values == [2.0, 7.0]
