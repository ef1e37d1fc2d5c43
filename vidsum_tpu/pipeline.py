"""End-to-end raw-video summarization: one XLA program from pixels to scores.

The BASELINE.json stretch config: decode on host (OpenCV), then a SINGLE
jitted program runs normalization → GoogLeNet pool5 over all sampled frames →
SimNet frame scores → sigmoid on the accelerator; KTS + knapsack shot
selection then runs in the native host runtime. The reference needs three
separate offline stages with h5 files in between (``src/data/preprocess`` →
h5 → ``src/train.py`` val pass → ``src/evaluation``); here
:func:`summarize_video` is the whole path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict


import numpy as np

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.ops.kts import change_points_from_cps, kts_segmentation
from vidsum_tpu.ops.summary import generate_summary


@functools.partial(
    __import__("jax").jit, static_argnames=("cfg", "n_real"))
def _score_program(google_params, scorer_params, cfg: ModelConfig,
                   frames, n_real: int):
    """frames (T_pad, H, W, 3) normalized → (sigmoid scores (T_pad,),
    features (T_pad, 1024)); one XLA program."""
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.models.simnet import simnet_apply
    from vidsum_tpu.preprocess.googlenet import googlenet_apply

    feats = googlenet_apply(google_params, frames.astype(cfg.compute_dtype))
    pad_mask = (jnp.arange(frames.shape[0]) >= n_real)[None]
    scores, _ = simnet_apply(scorer_params, cfg, feats.astype(jnp.float32)[None],
                             pad_mask, deterministic=True)
    return jax.nn.sigmoid(scores[0, :, 0]), feats


@dataclasses.dataclass
class VideoSummary:
    summary: np.ndarray        # (n_frames,) binary frame selection
    scores: np.ndarray         # (n_picks,) sigmoid frame importance
    change_points: np.ndarray  # (S, 2) inclusive shot bounds (orig frames)
    picks: np.ndarray          # (n_picks,) original-frame indices
    n_frames: int


def summarize_video(video_path: str, scorer_params, cfg: ModelConfig,
                    google_params, fps: int = 2, size: int = 224,
                    budget_ratio: float = 0.15,
                    pad_multiple: int = 64) -> VideoSummary:
    """Raw video file → binary summary."""
    from vidsum_tpu.preprocess.reduce_fps import reduce_fps
    from vidsum_tpu.preprocess.transforms import prepare_video

    frames, picks, n_frames = reduce_fps(video_path, fps=fps)
    if frames.shape[0] == 0:
        raise ValueError(f"no frames decoded from {video_path}")
    x = prepare_video(frames, size, "google")
    n_real = x.shape[0]
    pad = (-n_real) % pad_multiple
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])

    scores, feats = _score_program(google_params, scorer_params, cfg,
                                   x, n_real)
    scores = np.asarray(scores[:n_real], dtype=np.float32)
    feats = np.asarray(feats[:n_real], dtype=np.float64)

    gram = feats @ feats.T
    ncp = max(n_real // 25, 1)
    cps, _ = kts_segmentation(gram, ncp, vmax=1.0)
    bounds = change_points_from_cps(cps, n_real)
    ratio = n_frames / n_real
    starts = np.round(bounds[:, 0] * ratio).astype(np.int64)
    ends = np.concatenate([starts[1:] - 1, [n_frames - 1]])
    change_points = np.stack([starts, ends], axis=1)

    [summary] = generate_summary([change_points], [scores], [n_frames],
                                 [picks], budget_ratio=budget_ratio)
    return VideoSummary(summary=summary, scores=scores,
                        change_points=change_points, picks=picks,
                        n_frames=n_frames)


def summarize_directory(video_dir: str, scorer_params, cfg: ModelConfig,
                        google_params, out_json: str = "summary.json",
                        fps: int = 2, size: int = 224,
                        budget_ratio: float = 0.15) -> Dict[str, list]:
    """Batch the raw-video pipeline over every video in a directory and write
    a ``summary.json`` keyed by ``video_<i>`` (the reference export layout,
    ``src/generate_summary_image.py:39-48``)."""
    import glob
    import json
    import os

    results: Dict[str, list] = {}
    paths = sorted(p for p in glob.glob(os.path.join(video_dir, "*"))
                   if p.rsplit(".", 1)[-1].lower() in
                   ("mp4", "mkv", "mpeg", "avi", "webm"))
    for i, path in enumerate(paths):
        out = summarize_video(path, scorer_params, cfg, google_params,
                              fps=fps, size=size, budget_ratio=budget_ratio)
        results[f"video_{i}"] = np.nonzero(out.summary)[0].tolist()
    with open(out_json, "w") as f:
        json.dump(results, f, indent=8)
    return results
