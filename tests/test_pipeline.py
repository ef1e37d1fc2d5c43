"""Raw-video → summary pipeline (single XLA program for the compute path)."""

import os

import numpy as np
import pytest

import jax

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models import init_simnet
from vidsum_tpu.pipeline import summarize_video
from vidsum_tpu.preprocess.googlenet import init_googlenet

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (96, 64))
    if not w.isOpened():
        pytest.skip("cv2.VideoWriter unavailable")
    rng = np.random.default_rng(0)
    for _ in range(3):
        base = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        for _ in range(40):
            noise = rng.integers(-8, 8, base.shape)
            w.write(np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8))
    w.release()
    return path


def test_summarize_video_end_to_end(video_path):
    cfg = ModelConfig(d_model=32, num_heads=4, num_layers=1, dropout=0.0,
                      max_len=256)
    scorer = init_simnet(jax.random.PRNGKey(0), cfg)
    google = init_googlenet(jax.random.PRNGKey(1))
    out = summarize_video(video_path, scorer, cfg, google, fps=2, size=64)
    assert out.n_frames == 120
    assert out.summary.shape == (120,)
    assert set(np.unique(out.summary)).issubset({0, 1})
    assert out.summary.sum() <= int(120 * 0.15)
    assert out.scores.shape == out.picks.shape
    assert np.isfinite(out.scores).all()
    assert out.change_points[0, 0] == 0
    assert out.change_points[-1, 1] == 119


def test_iter_reduced_frames_matches_reduce_fps(video_path):
    """The lazy decode stream must be bit-identical to the eager reduce_fps
    (same grab/retrieve cadence — the reference's reduce_fps.py:7-56
    contract) frame by frame, with matching picks/n_frames metadata."""
    from vidsum_tpu.preprocess.reduce_fps import iter_reduced_frames, reduce_fps

    frames, picks, n_frames = reduce_fps(video_path, fps=2)
    rs = iter_reduced_frames(video_path, fps=2)
    streamed = list(rs.frames)
    assert rs.n_frames == n_frames
    assert len(streamed) == frames.shape[0] == rs.final_count
    assert np.array_equal(np.stack(streamed), frames)
    assert np.array_equal(rs.picks(len(streamed)), picks)
    assert (rs.height, rs.width) == frames.shape[1:3]


def test_summarize_video_chunk_invariance(video_path):
    """Chunked streaming (device transfer overlapping decode) must not
    change the result: padded frames are masked in the scorer, so any
    chunking AND any padded length yields the same scores and the same
    selected frames. The two configs produce different T_pad (8 via two
    4-frame chunks vs 64 via one tail-padded chunk) so the masking
    property is actually exercised, not just byte-identical inputs."""
    cfg = ModelConfig(d_model=32, num_heads=4, num_layers=1, dropout=0.0,
                      max_len=256)
    scorer = init_simnet(jax.random.PRNGKey(0), cfg)
    google = init_googlenet(jax.random.PRNGKey(1))
    outs = [summarize_video(video_path, scorer, cfg, google, fps=2, size=64,
                            pad_multiple=pm, stream_chunk=c, budget_ratio=0.5)
            for pm, c in ((4, 4), (64, 512))]
    np.testing.assert_allclose(outs[0].scores, outs[1].scores,
                               rtol=1e-5, atol=1e-6)
    assert outs[0].summary.sum() > 0  # budget 0.5 fits a shot: non-trivial
    assert np.array_equal(outs[0].summary, outs[1].summary)
    assert np.array_equal(outs[0].change_points, outs[1].change_points)


def test_summarize_directory(video_path, tmp_path):
    """Two-deep pipelined batch (video i+1 decodes while video i drains on
    device) must equal sequential per-video summarize_video calls."""
    import json
    import shutil
    vdir = str(tmp_path / "vids")
    os.makedirs(vdir)
    shutil.copy(video_path, os.path.join(vdir, "a.mp4"))
    shutil.copy(video_path, os.path.join(vdir, "b.mp4"))
    cfg = ModelConfig(d_model=32, num_heads=4, num_layers=1, dropout=0.0,
                      max_len=256)
    scorer = init_simnet(jax.random.PRNGKey(0), cfg)
    google = init_googlenet(jax.random.PRNGKey(1))
    from vidsum_tpu.pipeline import summarize_directory
    out_json = str(tmp_path / "summary.json")
    # budget 0.5 so shots actually fit (at 0.15 the ~60-frame shots of this
    # 8-sample fixture all exceed the budget and the equality is trivially
    # empty-vs-empty)
    res = summarize_directory(vdir, scorer, cfg, google, out_json=out_json,
                              fps=2, size=64, budget_ratio=0.5)
    assert set(res) == {"video_0", "video_1"}
    with open(out_json) as f:
        assert json.load(f) == {k: list(v) for k, v in res.items()}
    seq = summarize_video(video_path, scorer, cfg, google, fps=2, size=64,
                          budget_ratio=0.5)
    expect = np.nonzero(seq.summary)[0].tolist()
    assert len(expect) > 0
    assert res["video_0"] == expect and res["video_1"] == expect


def test_cli_summarize_smoke(video_path, tmp_path, monkeypatch):
    import json
    from vidsum_tpu.cli.summarize import main
    out = str(tmp_path / "s.json")
    main(["--video", video_path, "--d_model", "32", "--num_heads", "4",
          "--num_layers", "1", "--fps", "2", "--size", "64", "--out", out])
    with open(out) as f:
        rec = json.load(f)
    assert rec["n_frames"] == 120
    assert all(isinstance(i, int) for i in rec["selected_frames"])


def test_cli_summarize_seq_sharded_device_kts(video_path, tmp_path):
    """--seq_shards / --kts_impl device drive the long-video path from the
    CLI; selected frames must match the default host run (ring attention is
    exact; the device KTS matches host auto-selection on this fixture)."""
    import json
    from vidsum_tpu.cli.summarize import main
    out_a = str(tmp_path / "a.json")
    out_b = str(tmp_path / "b.json")
    args = ["--video", video_path, "--d_model", "32", "--num_heads", "4",
            "--num_layers", "1", "--fps", "2", "--size", "64"]
    main(args + ["--out", out_a])
    main(args + ["--out", out_b, "--seq_shards", "2",
                 "--kts_impl", "device"])
    with open(out_a) as f:
        a = json.load(f)
    with open(out_b) as f:
        b = json.load(f)
    assert a["n_frames"] == b["n_frames"] == 120
    assert a["selected_frames"] == b["selected_frames"]


def test_summarize_long_video_seq_sharded(monkeypatch):
    """>2,500 sampled frames through the full raw-video path with the
    sequence axis sharded over the 8-device mesh and on-device auto-KTS:
    decode -> features -> ring-attention scoring -> KTS -> knapsack, no
    dense N x N attention anywhere (VERDICT r1 item 8). Scores must match
    the dense single-device path (exact ring attention)."""
    import jax
    from jax.sharding import Mesh

    import vidsum_tpu.pipeline as pl

    N_REAL, STEP = 2560, 15
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (N_REAL, 32, 32, 3), dtype=np.uint8)
    picks = np.arange(N_REAL) * STEP
    n_frames = N_REAL * STEP

    # the package re-exports the function under the module's name; resolve
    # the actual module (summarize_video imports from it at call time)
    import importlib
    import sys

    importlib.import_module("vidsum_tpu.preprocess.reduce_fps")
    rf = sys.modules["vidsum_tpu.preprocess.reduce_fps"]

    def fake_iter(path, fps=2):
        return rf.ReducedStream(frames=iter(frames), n_frames=n_frames,
                                step=STEP, final_count=N_REAL,
                                height=32, width=32)

    monkeypatch.setattr(rf, "iter_reduced_frames", fake_iter)

    cfg = ModelConfig(d_model=32, num_heads=4, num_layers=1, dropout=0.0,
                      max_len=2000)  # N_REAL > max_len: PE table must grow
    scorer = init_simnet(jax.random.PRNGKey(0), cfg)
    google = init_googlenet(jax.random.PRNGKey(1))

    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("data", "seq"))
    out = summarize_video("ignored.mp4", scorer, cfg, google, fps=2,
                          size=32, mesh=mesh, kts_impl="device")
    assert out.n_frames == n_frames
    assert out.summary.shape == (n_frames,)
    assert out.summary.sum() <= int(n_frames * 0.15)
    assert np.isfinite(out.scores).all()
    assert out.scores.shape == (N_REAL,)
    assert out.change_points[0, 0] == 0
    assert out.change_points[-1, 1] == n_frames - 1
    assert len(out.change_points) > 10  # auto-KTS found real structure

    # ring attention is exact: dense single-device scores must agree
    dense = summarize_video("ignored.mp4", scorer, cfg, google, fps=2,
                            size=32)
    np.testing.assert_allclose(out.scores, dense.scores, rtol=2e-4,
                               atol=2e-5)
