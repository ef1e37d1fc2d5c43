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
    """frames (T_pad, H, W, 3) resized uint8 → (sigmoid scores (T_pad,),
    features (T_pad, 1024)); one XLA program. Frames cross the wire as
    uint8 and normalize on device — 4× less host→device traffic than
    shipping f32, which dominates this path's wall time (PERF.md
    'Raw-video path')."""
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.models.simnet import simnet_apply
    from vidsum_tpu.preprocess.googlenet import googlenet_apply
    from vidsum_tpu.preprocess.transforms import device_normalize

    x = device_normalize(frames, "google").astype(cfg.compute_dtype)
    feats = googlenet_apply(google_params, x)
    pad_mask = (jnp.arange(frames.shape[0]) >= n_real)[None]
    scores, _ = simnet_apply(scorer_params, cfg, feats.astype(jnp.float32)[None],
                             pad_mask, deterministic=True)
    return jax.nn.sigmoid(scores[0, :, 0]), feats


@functools.partial(
    __import__("jax").jit, static_argnames=("cfg",))
def _features_program(google_params, cfg: ModelConfig, frames):
    """frames (T_pad, H, W, 3) resized uint8 → pool5 features (T_pad, 1024);
    uint8 wire + on-device normalize, as in :func:`_score_program`."""
    from vidsum_tpu.preprocess.googlenet import googlenet_apply
    from vidsum_tpu.preprocess.transforms import device_normalize

    return googlenet_apply(
        google_params, device_normalize(frames, "google").astype(cfg.compute_dtype))


_SEQ_FWD_CACHE: Dict = {}


def _score_seq_sharded(google_params, scorer_params, cfg: ModelConfig,
                       frames, n_real: int, mesh):
    """Long-context scoring: pool5 features, then the sequence-parallel
    ring-attention scorer over the (data, seq) mesh — no N×N tensor ever
    materializes, so frame counts far beyond the dense envelope run."""
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.parallel.seq_forward import make_seq_sharded_forward

    feats = _features_program(google_params, cfg, frames)
    key = (cfg, mesh)
    if key not in _SEQ_FWD_CACHE:
        _SEQ_FWD_CACHE[key] = make_seq_sharded_forward(cfg, mesh)
    fwd = _SEQ_FWD_CACHE[key]
    pad_mask = jnp.arange(frames.shape[0])[None] >= n_real
    scores, _ = fwd(scorer_params,
                    jnp.asarray(feats, jnp.float32)[None], pad_mask)
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
                    pad_multiple: int = 64, mesh=None,
                    kts_impl: str = "host") -> VideoSummary:
    """Raw video file → binary summary.

    :param mesh: optional ``jax.sharding.Mesh`` with (data, seq) axes — the
        scorer then runs sequence-parallel with exact ring attention
        (``parallel/seq_forward.py``), so videos far beyond the dense
        O(N²) envelope (>2,500 frames) score without any N×N tensor; frame
        features are computed per position and the sequence padding rounds
        up to ``seq_axis × pad_multiple``.
    :param kts_impl: ``"host"`` (float64 NumPy/C++ auto-KTS, the parity
        oracle) or ``"device"`` (one jitted program:
        :func:`vidsum_tpu.ops.kts.kts_segmentation_jax`).
    """
    from vidsum_tpu.preprocess.reduce_fps import reduce_fps
    from vidsum_tpu.preprocess.transforms import resize_video

    frames, picks, n_frames = reduce_fps(video_path, fps=fps)
    if frames.shape[0] == 0:
        raise ValueError(f"no frames decoded from {video_path}")
    x = resize_video(frames, size)  # uint8 on the wire; normalize on device
    n_real = x.shape[0]
    if mesh is not None:
        pad_multiple *= mesh.shape["seq"]
    pad = (-n_real) % pad_multiple
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])

    if mesh is None:
        scores, feats = _score_program(google_params, scorer_params, cfg,
                                       x, n_real)
    else:
        scores, feats = _score_seq_sharded(google_params, scorer_params, cfg,
                                           x, n_real, mesh)
    scores = np.asarray(scores[:n_real], dtype=np.float32)
    feats = np.asarray(feats[:n_real], dtype=np.float64)

    ncp = max(n_real // 25, 1)
    if kts_impl == "device":
        import jax.numpy as jnp

        from vidsum_tpu.ops.kts import kts_segmentation_jax

        gram32 = jnp.asarray(feats, jnp.float32)
        cps_pad, m_best, _ = kts_segmentation_jax(gram32 @ gram32.T, ncp,
                                                  vmax=1.0)
        cps = np.asarray(cps_pad)[: int(m_best)]
    else:
        gram = feats @ feats.T
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
