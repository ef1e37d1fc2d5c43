"""HDF5 feature datasets.

Behavior contract (reference: ``src/data/dataset.py``):
- :class:`TSDataset` — finetune data over the DSNet h5 layout. A ``val``
  split loads ``features, gtscore, user_summary, user_scores, change_points,
  n_frames, picks`` per video, wrapping eval metadata in
  :class:`UserSummaries` (dataset.py:85-103). A ``train`` split concatenates
  all ``"+"``-joined datasets, restricting only the experiment dataset to the
  fold's keys, and drops videos with ≤ ``min_frames`` frames
  (dataset.py:105-119).
- :class:`PreTrainDataset` — ``<root>/frames/*.npy`` frame features paired
  with ``<root>/video/<name>.npy`` R3D-18 video embeddings, loaded eagerly
  (dataset.py:40-60).
- :class:`PreTrainDatasetReady` — frame features from the h5 files + video
  reps from ``<root>/video/<dataset>/<key>.npy`` (dataset.py:15-37).

Everything is plain NumPy on the host; device placement happens at the jitted
step boundary (the TPU-native replacement for DataLoader workers — features
for a whole dataset fit in RAM, so eager loading matches the reference).
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import List, Optional, Sequence

import h5py
import numpy as np

from vidsum_tpu.data.paths import h5_name
from vidsum_tpu.data.splits import split_keys_to_names


@dataclasses.dataclass
class UserSummaries:
    """Per-video eval metadata (reference: dataset.py:146-154).

    ``user_scores`` is None for the eccv16-layout archives, which do not
    carry per-annotator scores (only the ``summarizer_dataset_*`` files do
    — the reference's two divergent PATH maps); τ/ρ are then reported nan.
    """
    user_summary: np.ndarray    # (U, F) binary (int or float 0/1 on disk)
    user_scores: Optional[np.ndarray]  # (U, F) or None (eccv16 files)
    change_points: np.ndarray   # (S, 2) inclusive bounds
    n_frames: int
    picks: np.ndarray           # (n_steps,) original-frame indices
    name: str


class TSDataset:
    """Finetune dataset over DSNet h5 files."""

    def __init__(self, root: str, ex_dataset: str, datasets: str,
                 keys: Optional[Sequence[str]] = None, split: str = "train",
                 min_frames: int = 50, path_scheme: str = "summarizer"):
        self.root = root
        self.split = split
        self.ex_dataset = ex_dataset
        self.datasets = datasets.split("+")

        self.features: List[np.ndarray] = []
        self.targets: List[np.ndarray] = []
        self.user_summaries: List[UserSummaries] = []

        wanted = split_keys_to_names(list(keys)) if keys else None

        if split == "val":
            path = os.path.join(root, h5_name(ex_dataset, path_scheme))
            with h5py.File(path, "r") as f:
                names = wanted if wanted else list(f.keys())
                for name in names:
                    g = f[name]
                    self.features.append(g["features"][...].astype(np.float32))
                    self.targets.append(g["gtscore"][...].astype(np.float32))
                    self.user_summaries.append(UserSummaries(
                        user_summary=np.asarray(g["user_summary"]),
                        # eccv16 files carry no user_scores (τ/ρ → nan)
                        user_scores=(np.asarray(g["user_scores"])
                                     if "user_scores" in g else None),
                        change_points=np.asarray(g["change_points"]),
                        n_frames=int(np.asarray(g["n_frames"]).reshape(())),
                        # real eccv16 files store picks (n_steps, 1)
                        # (reference compute_metrics.py:24) — a shape the
                        # reference's own upsample crashes on; normalize
                        picks=np.asarray(g["picks"]).reshape(-1),
                        name=name))
        else:
            for dataset in self.datasets:
                path = os.path.join(root, h5_name(dataset, path_scheme))
                with h5py.File(path, "r") as f:
                    if wanted and dataset == ex_dataset:
                        names = wanted
                    else:
                        names = list(f.keys())
                    for name in names:
                        g = f[name]
                        feats = g["features"][...].astype(np.float32)
                        if feats.shape[0] > min_frames:
                            self.features.append(feats)
                            self.targets.append(
                                g["gtscore"][...].astype(np.float32))

    def __len__(self) -> int:
        return len(self.features)

    def __getitem__(self, idx: int):
        if self.split == "train":
            return self.features[idx], self.targets[idx]
        return self.features[idx], self.targets[idx], self.user_summaries[idx]


class PreTrainDataset:
    """Frame-features + video-embedding pairs from ``.npy`` trees."""

    def __init__(self, root: str):
        self.items = []
        for frame_path in sorted(glob.glob(os.path.join(root, "frames", "*"))):
            video_name = os.path.basename(frame_path).split(".")[0]
            feats = np.load(frame_path).astype(np.float32)
            rep = np.load(os.path.join(root, "video", f"{video_name}.npy"))
            self.items.append((feats, rep.astype(np.float32)))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int):
        return self.items[idx]


class PreTrainDatasetReady:
    """Frame features straight from the DSNet h5 files + per-key video reps."""

    def __init__(self, root: str, datasets: str,
                 path_scheme: str = "summarizer"):
        self.items = []
        for dataset in datasets.split("+"):
            rep_dir = os.path.join(root, "video", dataset)
            with h5py.File(os.path.join(root, h5_name(dataset, path_scheme)),
                           "r") as f:
                for key in f.keys():
                    feats = f[key]["features"][...].astype(np.float32)
                    rep = np.load(os.path.join(rep_dir, f"{key}.npy"))
                    self.items.append((feats, rep.astype(np.float32)))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int):
        return self.items[idx]
