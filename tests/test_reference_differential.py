"""Differential tests against the REFERENCE'S OWN CODE (VERDICT r1 #1).

Every other parity test in this suite routes through builder-written
artifacts (``tests/oracles.py`` transcriptions, ``tests/torch_mirrors.py``).
These tests close that loophole: they import the actual modules under
``/root/reference/src`` and fuzz-assert bit-identical behavior, so a shared
misreading of the reference is impossible.

Covered here (eval pipeline + KTS):
- ``src/evaluation/knapsack_implementation.py`` — tie-heavy float knapsack
- ``src/evaluation/generate_summary.py`` — selected frames, bit-for-bit
- ``src/evaluation/compute_metrics.py`` (upsample + eval_metrics end-to-end)
- ``src/evaluation/evaluation_metrics.py`` / ``compute_correlation.py``
- ``segmentations/kts/{cpd_auto,cpd_nonlin}.py`` — scatters, DP, auto-ncp
- the checked-in golden files are re-derived from the reference pipeline

Model-side lockstep against the actual torch classes lives in
``tests/test_reference_model_differential.py``.

All tests skip when the reference tree is absent (e.g. public CI). Fuzz
volume scales with ``VIDSUM_REF_FUZZ`` (default sized for the suite; see
``scripts/fuzz_reference_parity.py`` for the 10k-video soak record).
"""

import json
import os
import sys

import numpy as np
import pytest

from vidsum_tpu.data.datasets import UserSummaries
from vidsum_tpu.ops import kts as our_kts
from vidsum_tpu.ops.knapsack import knapsack as our_knapsack
from vidsum_tpu.ops.metrics import eval_metrics as our_eval_metrics
from vidsum_tpu.ops.metrics import evaluate_scores as our_evaluate_scores
from vidsum_tpu.ops.metrics import evaluate_summary as our_evaluate_summary
from vidsum_tpu.ops.summary import generate_summary as our_generate_summary
from vidsum_tpu.ops.summary import upsample as our_upsample

REF_ROOT = "/root/reference"
_ref_present = os.path.isdir(os.path.join(REF_ROOT, "src", "evaluation"))
pytestmark = pytest.mark.skipif(not _ref_present,
                                reason="reference repo not present")

if _ref_present:
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from src.evaluation.compute_correlation import (
        evaluate_scores as ref_evaluate_scores,
    )
    from src.evaluation.compute_metrics import eval_metrics as ref_eval_metrics
    from src.evaluation.compute_metrics import upsample as ref_upsample
    from src.evaluation.evaluation_metrics import (
        evaluate_summary as ref_evaluate_summary,
    )
    from src.evaluation.generate_summary import (
        generate_summary as ref_generate_summary,
    )
    from src.evaluation.knapsack_implementation import knapSack as ref_knapsack
    from src.data.preprocess.segmentations.kts.cpd_auto import (
        kts_segmentation as ref_kts_segmentation,
    )
    from src.data.preprocess.segmentations.kts.cpd_nonlin import (
        calc_scatters as ref_calc_scatters,
    )
    from src.data.preprocess.segmentations.kts.cpd_nonlin import (
        cpd_nonlin as ref_cpd_nonlin,
    )

FUZZ = int(os.environ.get("VIDSUM_REF_FUZZ", "800"))


# ---------------------------------------------------------------------------
# randomized video generator (edge-case aware)

def _random_video(rng: np.random.Generator, flavor: str):
    """One synthetic video's eval inputs.

    Flavors stress the parity-critical paths: ``ties`` quantizes scores so
    the knapsack DP hits exact float equality (the reference's backtrack
    keys on ``K[i][w] != K[i-1][w]``); ``tiny_shots`` gives many 1-3-frame
    shots; ``nonmono`` shuffles picks (the upsample fill loop's order
    matters then); ``short_scores`` exercises the ``i == len(scores)``
    zero-fill branch of ``generate_summary.py:25-35``.
    """
    n_picks = int(rng.integers(8, 140))
    step = int(rng.integers(1, 20))
    picks = np.arange(n_picks) * step
    n_frames = int(picks[-1] + rng.integers(1, step + 1))

    if flavor == "exact_end":
        n_frames = int(picks[-1]) if picks[-1] > 0 else 1
    elif flavor == "overhang":
        # picks beyond n_frames: slices clamp identically in both impls
        n_frames = max(1, int(picks[-1] - rng.integers(0, step + 1)))
    elif flavor == "nonmono":
        picks = picks.copy()
        rng.shuffle(picks[:-1])

    scores = rng.random(n_picks).astype(np.float32)
    if flavor == "ties":
        scores = (rng.integers(0, 4, size=n_picks) / 4.0).astype(np.float32)
    elif flavor == "short_scores":
        scores = scores[: max(1, n_picks - 1)]

    if flavor == "tiny_shots":
        seg = rng.integers(1, 4)
        bounds = np.arange(0, n_frames, seg)
        bounds = np.concatenate([bounds, [n_frames]])
    else:
        n_shots = int(rng.integers(1, 16))
        n_cuts = min(n_shots - 1, max(0, n_frames - 1))
        cuts = np.sort(rng.choice(np.arange(1, n_frames), n_cuts,
                                  replace=False)) if n_cuts else np.array([], int)
        bounds = np.concatenate([[0], cuts, [n_frames]])
    cp = np.stack([bounds[:-1], bounds[1:] - 1], axis=1).astype(np.int64)

    if flavor == "int32_picks":
        picks = picks.astype(np.int32)
    elif flavor == "float_picks":
        picks = picks.astype(np.float64)
    return picks, n_frames, scores, cp


_FLAVORS = ("plain", "ties", "tiny_shots", "exact_end", "overhang",
            "nonmono", "short_scores", "int32_picks", "float_picks")


def _fixture(seed: int, n: int):
    rng = np.random.default_rng(seed)
    return [_random_video(rng, _FLAVORS[i % len(_FLAVORS)])
            for i in range(n)]


# ---------------------------------------------------------------------------
# knapsack

def test_knapsack_bit_identical_fuzz():
    """Selected-shot lists equal the reference's for tie-heavy float values
    (the DP's max() first-argument tie-break and the backtrack's float
    equality test are the bit-parity-critical parts)."""
    rng = np.random.default_rng(0)
    for case in range(FUZZ):
        n = int(rng.integers(1, 25))
        wt = rng.integers(1, 30, size=n).tolist()
        if case % 3 == 0:   # tie-heavy: few distinct values, few weights
            val = (rng.integers(0, 4, size=n) / 4.0).tolist()
            wt = rng.integers(1, 5, size=n).tolist()
        else:
            val = rng.random(n).astype(np.float32).astype(float).tolist()
        W = int(rng.integers(0, int(np.sum(wt)) + 2))
        assert our_knapsack(W, wt, val) == ref_knapsack(W, wt, val, n), \
            f"case {case}: W={W} wt={wt} val={val}"


# ---------------------------------------------------------------------------
# upsample + generate_summary

def test_upsample_bit_identical_fuzz():
    for i, (picks, n_frames, scores, _) in enumerate(_fixture(1, FUZZ)):
        ours = our_upsample(scores, n_frames, picks)
        ref = ref_upsample(scores, n_frames, np.asarray(picks))
        np.testing.assert_array_equal(ours, ref, err_msg=f"video {i}")
        assert ours.dtype == ref.dtype


def test_generate_summary_bit_identical_fuzz():
    videos = _fixture(2, FUZZ)
    ours = our_generate_summary([v[3] for v in videos],
                                [v[2] for v in videos],
                                [v[1] for v in videos],
                                [v[0] for v in videos])
    ref = ref_generate_summary([v[3] for v in videos],
                               [v[2] for v in videos],
                               [v[1] for v in videos],
                               [np.asarray(v[0]) for v in videos])
    for i, (a, b) in enumerate(zip(ours, ref)):
        np.testing.assert_array_equal(a, b, err_msg=f"video {i}")
        assert a.dtype == b.dtype == np.int8


# ---------------------------------------------------------------------------
# evaluate_summary / evaluate_scores / eval_metrics end-to-end

def _user_package(rng, n_frames, n_users=5):
    user_summary = (rng.random((n_users, n_frames)) < 0.2).astype(np.int64)
    user_scores = rng.integers(1, 6, size=(n_users, n_frames)).astype(
        np.float64)
    return user_summary, user_scores


def test_evaluate_summary_bit_identical_fuzz():
    rng = np.random.default_rng(3)
    for i in range(FUZZ // 2):
        n = int(rng.integers(5, 400))
        pred = (rng.random(n) < 0.25).astype(np.int8)
        if pred.sum() == 0:
            pred[int(rng.integers(0, n))] = 1  # reference ZeroDivides else
        us, _ = _user_package(rng, n + int(rng.integers(0, 10)))
        for method in ("avg", "max"):
            np.testing.assert_equal(  # nan-aware: an all-zero user row
                our_evaluate_summary(pred, us, method),  # nans both sides
                ref_evaluate_summary(pred, us, method),
                err_msg=f"case {i} {method}")


def test_evaluate_scores_identical_fuzz():
    rng = np.random.default_rng(4)
    for i in range(FUZZ // 4):
        n = int(rng.integers(5, 300))
        pred = rng.random(n).astype(np.float32)
        if i % 5 == 0:
            pred[:] = 0.5          # constant scores → nan τ/ρ on both sides
        _, uscores = _user_package(rng, n)
        np.testing.assert_equal(
            np.asarray(our_evaluate_scores(pred, uscores)),
            np.asarray(ref_evaluate_scores(pred, uscores)),
            err_msg=f"case {i}")


def test_eval_metrics_end_to_end_identical():
    """The full per-epoch eval quantity — mean F/τ/ρ over a video dict —
    equals the reference's to the last bit, across several random val sets."""
    rng = np.random.default_rng(5)
    for batch in range(6):
        score_dict, user_dict = {}, {}
        for v in range(8):
            picks, n_frames, scores, cp = _random_video(rng, "plain")
            # non-empty machine summary: the reference's evaluate_summary
            # ZeroDivides on empty (our fix returns 0 — documented PARITY.md)
            summary = our_generate_summary([cp], [scores], [n_frames],
                                           [picks])[0]
            if summary.sum() == 0:
                continue
            us, uscores = _user_package(rng, n_frames)
            name = f"video_{batch}_{v}"
            score_dict[name] = scores
            user_dict[name] = UserSummaries(us, uscores, cp, n_frames,
                                            picks, name)
        if not score_dict:
            continue
        ours = our_eval_metrics(score_dict, user_dict)
        ref = ref_eval_metrics(score_dict, user_dict)
        np.testing.assert_equal(np.asarray(ours, dtype=np.float64),
                                np.asarray(ref, dtype=np.float64),
                                err_msg=f"batch {batch}")


# ---------------------------------------------------------------------------
# KTS (calc_scatters / cpd_nonlin DP / auto-ncp selection)

def _random_gram(rng, n):
    d = int(rng.integers(4, 24))
    x = rng.normal(size=(n, d))
    return x @ x.T   # float64, symmetric PSD — the kts_seg construction


def test_calc_scatters_bit_identical_fuzz():
    rng = np.random.default_rng(6)
    for i in range(max(8, FUZZ // 16)):
        K = _random_gram(rng, int(rng.integers(5, 90)))
        np.testing.assert_array_equal(our_kts.calc_scatters(K),
                                      ref_calc_scatters(K),
                                      err_msg=f"case {i}")


def test_cpd_nonlin_bit_identical_fuzz():
    rng = np.random.default_rng(7)
    for i in range(max(8, FUZZ // 16)):
        n = int(rng.integers(8, 80))
        K = _random_gram(rng, n)
        m = int(rng.integers(0, min(10, n - 1) + 1))
        cps_o, sc_o = our_kts.cpd_nonlin(K, m)
        cps_r, sc_r = ref_cpd_nonlin(K, m, verbose=False)
        np.testing.assert_array_equal(cps_o, cps_r, err_msg=f"case {i}")
        np.testing.assert_array_equal(sc_o, sc_r, err_msg=f"case {i}")


def test_cpd_nonlin_lmin_lmax_bit_identical():
    rng = np.random.default_rng(8)
    for i in range(12):
        n = int(rng.integers(20, 70))
        K = _random_gram(rng, n)
        lmin = int(rng.integers(1, 4))
        lmax = int(rng.integers(max(lmin, n // 6), n))
        m_hi = n // lmin - 1
        m_lo = max(0, (n + lmax - 1) // lmax - 1)
        if m_lo > min(m_hi, 8):
            continue
        m = int(rng.integers(m_lo, min(m_hi, 8) + 1))
        cps_o, sc_o = our_kts.cpd_nonlin(K, m, lmin=lmin, lmax=lmax)
        cps_r, sc_r = ref_cpd_nonlin(K, m, lmin=lmin, lmax=lmax,
                                     verbose=False)
        np.testing.assert_array_equal(cps_o, cps_r, err_msg=f"case {i}")
        np.testing.assert_array_equal(sc_o, sc_r, err_msg=f"case {i}")


def test_kts_segmentation_bit_identical_fuzz():
    rng = np.random.default_rng(9)
    for i in range(max(8, FUZZ // 16)):
        n = int(rng.integers(10, 70))
        K = _random_gram(rng, n)
        ncp = int(rng.integers(1, min(12, n - 1) + 1))
        vmax = float(np.trace(K) / n) + 1e-6
        cps_o, costs_o = our_kts.kts_segmentation(K, ncp, vmax)
        cps_r, costs_r = ref_kts_segmentation(K, ncp, vmax, verbose=False)
        np.testing.assert_array_equal(cps_o, cps_r, err_msg=f"case {i}")
        np.testing.assert_array_equal(costs_o, costs_r, err_msg=f"case {i}")


# ---------------------------------------------------------------------------
# goldens: the checked-in files must equal the REFERENCE pipeline's output

def test_golden_files_are_reference_derived():
    """Re-derive ``tests/data/golden_*.json`` from the reference's own
    pipeline on the same fixed-seed fixture; the checked-in goldens (which
    our implementation is regression-pinned to by ``tests/test_golden.py``)
    must match — making the reference, not this repo, the golden source."""
    from tests.test_golden import GOLDEN, make_fixture

    videos = make_fixture()
    summaries = ref_generate_summary([v[3] for v in videos],
                                     [v[2] for v in videos],
                                     [v[1] for v in videos],
                                     [v[0] for v in videos])
    derived = {f"video_{i}": np.nonzero(s)[0].tolist()
               for i, s in enumerate(summaries)}
    with open(GOLDEN) as f:
        assert json.load(f) == derived

    # metrics golden: reference eval_metrics on the exact fixture of
    # tests/test_golden.py::test_metrics_golden (seed 321 construction)
    golden_metrics = os.path.join(os.path.dirname(GOLDEN),
                                  "golden_metrics.json")
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
        user_dict[name] = UserSummaries(
            rng.integers(0, 2, (5, n_frames)),
            rng.random((5, n_frames)).astype(np.float32),
            cp, n_frames, picks, name)
    f, k, s = ref_eval_metrics(score_dict, user_dict)
    with open(golden_metrics) as fh:
        want = json.load(fh)
    np.testing.assert_equal(
        np.asarray([f, k, s], dtype=np.float64),
        np.asarray([want["fscore"], want["kendall_tau"],
                    want["spearman_rho"]], dtype=np.float64))


# ---------------------------------------------------------------------------
# legacy h5-direct f1_score + the export layer's duplicate gather logic


def test_legacy_f1_score_matches_reference(tmp_path):
    """``compute_fscores.f1_score`` (the commented-out legacy path) vs
    ``ops/legacy_eval.f1_score`` on the same eccv16-named h5."""
    from types import SimpleNamespace

    from src.evaluation.compute_fscores import f1_score as ref_f1
    from vidsum_tpu.data.synthetic import make_synthetic_h5
    from vidsum_tpu.ops.legacy_eval import f1_score as our_f1

    root = str(tmp_path)
    make_synthetic_h5(os.path.join(
        root, "eccv16_dataset_tvsum_google_pool5.h5"), n_videos=5, seed=3)

    import h5py
    rng = np.random.default_rng(1)
    score_dict = {}
    with h5py.File(os.path.join(
            root, "eccv16_dataset_tvsum_google_pool5.h5")) as f:
        for name in f:
            n = f[name]["features"].shape[0]
            score_dict[name] = rng.random(n).astype(np.float32)

    for method in ("avg", "max"):
        ours = our_f1(score_dict, root, "tvsum", eval_method=method)
        ref = ref_f1(score_dict, SimpleNamespace(data=root, dataset="tvsum",
                                                 eval=method))
        np.testing.assert_equal(np.float64(ours), np.float64(ref),
                                err_msg=method)


def test_export_gather_matches_reference_duplicate_path():
    """``generate_summary_image.generate_summary`` — the reference's
    duplicated dict-driven gather (``:91-120``) — must produce the same
    binary summaries as our export path's generate_summary for the same
    score/user dicts."""
    src_path = os.path.join(REF_ROOT, "src")
    if src_path not in sys.path:
        sys.path.append(src_path)  # module uses absolute sibling imports
    try:
        from generate_summary_image import generate_summary as ref_export_gm
    except ImportError as e:
        pytest.skip(f"reference export module unimportable: {e}")

    rng = np.random.default_rng(8)
    score_dict, user_dict = {}, {}
    for v in range(6):
        picks, n_frames, scores, cp = _random_video(rng, "plain")
        us, uscores = _user_package(rng, n_frames)
        name = f"video_{v}"
        score_dict[name] = scores
        user_dict[name] = UserSummaries(us, uscores, cp, n_frames, picks,
                                        name)
    ref_summaries = ref_export_gm(score_dict, user_dict)
    users = [user_dict[k] for k in score_dict]
    ours = our_generate_summary([u.change_points for u in users],
                                list(score_dict.values()),
                                [u.n_frames for u in users],
                                [u.picks for u in users])
    for i, (a, b) in enumerate(zip(ours, ref_summaries)):
        np.testing.assert_array_equal(a, b, err_msg=f"video {i}")


def test_scheduler_realized_lr_sequence_matches_reference():
    """Drive the reference's CosineSchedularLinearWarmup exactly as
    pretrain.py:66-70 does (scheduler.update() AFTER each optimizer step)
    against a fake param-group optimizer, and compare the REALIZED lr used
    at each step with our optax schedule's value — including the
    off-by-one (first step at raw base lr, second at 0)."""
    from src.schedular import CosineSchedularLinearWarmup
    from vidsum_tpu.train.schedule import reference_pretrain_schedule

    class FakeOpt:
        def __init__(self, lr):
            self.param_groups = [{"lr": lr}]

    base_lr, spe, warm_e, epochs = 1e-3, 50, 5, 20
    opt = FakeOpt(base_lr)
    sched = CosineSchedularLinearWarmup(opt, spe, warm_e, epochs, base_lr)
    ours = reference_pretrain_schedule(base_lr, spe, warm_e, epochs)

    realized_ref, realized_ours = [], []
    for step in range(spe * epochs):
        # reference: the optimizer consumes param_groups[0]['lr'] DURING
        # the step, then update() mutates it for the next one
        realized_ref.append(opt.param_groups[0]["lr"])
        sched.update()
        realized_ours.append(float(ours(step)))
    # the off-by-one head must match: raw base lr (f32-rounded on our
    # side), then exactly 0
    assert realized_ref[0] == base_lr
    assert realized_ours[0] == np.float32(base_lr)
    assert realized_ref[1] == 0.0 and realized_ours[1] == 0.0
    # our schedule evaluates in f32 on device; the reference computes in
    # python float64 — worst observed rel diff 4.4e-4 (pure rounding)
    np.testing.assert_allclose(realized_ours, realized_ref, rtol=1e-3,
                               atol=1e-12)
