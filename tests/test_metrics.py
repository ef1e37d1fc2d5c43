import numpy as np
from scipy import stats

from vidsum_tpu.ops.metrics import eval_metrics, evaluate_scores, evaluate_summary


def test_fscore_perfect_overlap():
    pred = np.array([1, 1, 0, 0])
    users = np.array([[1, 1, 0, 0]])
    assert evaluate_summary(pred, users, "avg") == 100.0


def test_fscore_no_overlap():
    pred = np.array([1, 0, 0, 0])
    users = np.array([[0, 1, 1, 0]])
    assert evaluate_summary(pred, users, "avg") == 0.0


def test_fscore_hand_computed():
    pred = np.array([1, 1, 0, 0])
    users = np.array([[1, 0, 1, 0]])
    # precision = 1/2, recall = 1/2 → F = 50
    assert abs(evaluate_summary(pred, users, "avg") - 50.0) < 1e-12


def test_fscore_avg_vs_max_reduction():
    pred = np.array([1, 1, 0, 0])
    users = np.array([[1, 1, 0, 0], [0, 0, 1, 1]])
    assert evaluate_summary(pred, users, "max") == 100.0
    assert abs(evaluate_summary(pred, users, "avg") - 50.0) < 1e-12


def test_fscore_length_mismatch_pads_with_zeros():
    pred = np.array([1, 1])                       # shorter than user summary
    users = np.array([[1, 1, 1, 1]])
    # precision 1, recall 1/2 → F = 2*(1*0.5)/(1.5)*100
    want = 2 * 1 * 0.5 * 100 / 1.5
    assert abs(evaluate_summary(pred, users, "avg") - want) < 1e-12


def test_correlations_match_scipy():
    rng = np.random.default_rng(5)
    pred = rng.random(50)
    users = rng.random((3, 50))
    ktau, rho = evaluate_scores(pred, users)
    want_k = np.mean([stats.kendalltau(stats.rankdata(-pred),
                                       stats.rankdata(-u))[0] for u in users])
    want_s = np.mean([stats.spearmanr(stats.rankdata(-pred),
                                      stats.rankdata(-u))[0] for u in users])
    assert abs(ktau - want_k) < 1e-12
    assert abs(rho - want_s) < 1e-12


def test_correlations_perfect_and_inverted():
    pred = np.arange(10, dtype=float)
    ktau, rho = evaluate_scores(pred, pred[None, :])
    assert abs(ktau - 1.0) < 1e-12 and abs(rho - 1.0) < 1e-12
    ktau, rho = evaluate_scores(pred, -pred[None, :])
    assert abs(ktau + 1.0) < 1e-12 and abs(rho + 1.0) < 1e-12


class _User:
    def __init__(self, user_summary, user_scores, change_points, n_frames, picks):
        self.user_summary = user_summary
        self.user_scores = user_scores
        self.change_points = change_points
        self.n_frames = n_frames
        self.picks = picks


def test_eval_metrics_end_to_end():
    rng = np.random.default_rng(6)
    score_dict, user_dict = {}, {}
    for vi in range(3):
        n_frames = 300
        picks = np.arange(0, n_frames, 15)
        cuts = np.sort(rng.choice(np.arange(1, n_frames), 4, replace=False))
        bounds = np.concatenate([[0], cuts, [n_frames]])
        cp = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
        name = f"video_{vi}"
        score_dict[name] = rng.random(len(picks)).astype(np.float32)
        user_dict[name] = _User(
            user_summary=rng.integers(0, 2, (5, n_frames)),
            user_scores=rng.random((5, n_frames)),
            change_points=cp, n_frames=n_frames, picks=picks)
    f, k, s = eval_metrics(score_dict, user_dict)
    assert 0.0 <= f <= 100.0
    assert -1.0 <= k <= 1.0 and -1.0 <= s <= 1.0


def test_eval_metrics_max_method():
    """eval_method='max' (the literature's SumMe reduction) flows through."""
    rng = np.random.default_rng(60)
    n_frames = 200
    picks = np.arange(0, n_frames, 10)
    cuts = np.arange(20, n_frames, 20)   # 20-frame shots fit the 15% budget
    bounds = np.concatenate([[0], cuts, [n_frames]])
    cp = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
    user = _User(user_summary=rng.integers(0, 2, (3, n_frames)),
                 user_scores=rng.random((3, n_frames)),
                 change_points=cp, n_frames=n_frames, picks=picks)
    scores = {"v": rng.random(len(picks)).astype(np.float32)}
    f_avg, _, _ = eval_metrics(scores, {"v": user}, eval_method="avg")
    f_max, _, _ = eval_metrics(scores, {"v": user}, eval_method="max")
    assert f_max >= f_avg


def test_empty_summary_scores_zero():
    """Every shot over budget → empty summary → F=0 (the reference raises
    ZeroDivisionError here)."""
    pred = np.zeros(10, dtype=int)
    users = np.ones((2, 10), dtype=int)
    assert evaluate_summary(pred, users, "avg") == 0.0
