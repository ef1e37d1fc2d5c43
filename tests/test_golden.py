"""Golden bit-parity regression: the summary pipeline's selected frames on a
fixed-seed fixture must never change (SURVEY.md §4 "golden/parity" and the
BASELINE.json bit-for-bit north star). The golden files are verified to be
REFERENCE-derived: ``tests/test_reference_differential.py::
test_golden_files_are_reference_derived`` re-runs the reference's own
pipeline (/root/reference/src/evaluation) on the same fixtures and asserts
the checked-in goldens equal its output — so a diff here means drift from
the reference's semantics, not just from our own past behavior."""

import json
import os

import numpy as np

from vidsum_tpu.ops.summary import generate_summary

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_selected_frames.json")


def make_fixture():
    rng = np.random.default_rng(123)
    videos = []
    for _ in range(8):
        n_picks = int(rng.integers(40, 150))
        step = int(rng.integers(10, 20))
        picks = np.arange(n_picks) * step
        n_frames = int(picks[-1] + rng.integers(1, step + 1))
        scores = rng.random(n_picks).astype(np.float32)
        n_shots = int(rng.integers(5, 15))
        cuts = np.sort(rng.choice(np.arange(1, n_frames), n_shots - 1,
                                  replace=False))
        bounds = np.concatenate([[0], cuts, [n_frames]])
        cp = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
        videos.append((picks, n_frames, scores, cp))
    return videos


def test_selected_frames_bit_identical_to_golden():
    videos = make_fixture()
    summaries = generate_summary([v[3] for v in videos],
                                 [v[2] for v in videos],
                                 [v[1] for v in videos],
                                 [v[0] for v in videos])
    got = {f"video_{i}": np.nonzero(s)[0].tolist()
           for i, s in enumerate(summaries)}
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want


def test_golden_stable_under_native_toggle():
    """NumPy and native knapsack paths must produce the same golden."""
    import importlib

    # the package re-exports the function under the same name, shadowing the
    # submodule attribute — resolve the module explicitly
    kn = importlib.import_module("vidsum_tpu.ops.knapsack")
    videos = make_fixture()
    native = kn._knapsack_native
    try:
        kn._knapsack_native = None  # force the NumPy DP
        summaries = generate_summary([v[3] for v in videos],
                                     [v[2] for v in videos],
                                     [v[1] for v in videos],
                                     [v[0] for v in videos])
    finally:
        kn._knapsack_native = native
    got = {f"video_{i}": np.nonzero(s)[0].tolist()
           for i, s in enumerate(summaries)}
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want


def test_eval_metrics_golden():
    """Full metric stack (upsample → KTS shots → knapsack → F/τ/ρ) pinned on
    a fixed fixture; any drift in any stage shows up here."""
    import json as _json

    from vidsum_tpu.ops.metrics import eval_metrics

    class U:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    rng = np.random.default_rng(321)
    score_dict, user_dict = {}, {}
    for vi in range(5):
        n_frames = int(rng.integers(200, 500))
        picks = np.arange(0, n_frames, 15)
        cuts = np.sort(rng.choice(np.arange(1, n_frames), 6, replace=False))
        bounds = np.concatenate([[0], cuts, [n_frames]])
        cp = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
        name = f"video_{vi}"
        score_dict[name] = rng.random(len(picks)).astype(np.float32)
        user_dict[name] = U(
            user_summary=rng.integers(0, 2, (5, n_frames)),
            user_scores=rng.random((5, n_frames)).astype(np.float32),
            change_points=cp, n_frames=n_frames, picks=picks)
    f, k, s = eval_metrics(score_dict, user_dict)
    with open(os.path.join(os.path.dirname(__file__), "data",
                           "golden_metrics.json")) as fh:
        want = _json.load(fh)
    assert abs(f - want["fscore"]) < 1e-9
    assert abs(k - want["kendall_tau"]) < 1e-12
    assert abs(s - want["spearman_rho"]) < 1e-12
