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
    __import__("jax").jit, static_argnames=("cfg",))
def _score_program(google_params, scorer_params, cfg: ModelConfig,
                   chunks, n_real):
    """chunks: tuple of (C, H, W, 3) resized-uint8 device arrays (full
    chunks share one shape; the tail chunk is right-sized to the pad
    multiple so ≤63 zero frames ever cross the wire) → (sigmoid scores
    (T_pad,), features (T_pad, 1024)); one XLA program. Frames cross the
    wire as uint8 in chunks shipped while later frames still decode — 4×
    less host→device traffic than f32 AND the transfer overlaps decode,
    both of which dominate this path's wall time (PERF.md 'Raw-video
    path'). ``n_real`` is a traced scalar so videos sharing a
    (chunk-count, tail-size) bucket share one compiled program."""
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.models.simnet import simnet_apply
    from vidsum_tpu.preprocess.googlenet import googlenet_apply
    from vidsum_tpu.preprocess.transforms import device_normalize

    frames = jnp.concatenate(chunks, axis=0)
    x = device_normalize(frames, "google").astype(cfg.compute_dtype)
    feats = googlenet_apply(google_params, x)
    pad_mask = (jnp.arange(frames.shape[0]) >= n_real)[None]
    # fused block kernels on TPU; simnet_apply demotes to the flash
    # kernels past their VMEM envelope, so any N is safe here
    impl = "pallas_block" if jax.default_backend() == "tpu" else "xla"
    scores, _ = simnet_apply(scorer_params, cfg, feats.astype(jnp.float32)[None],
                             pad_mask, deterministic=True, attn_impl=impl)
    return jax.nn.sigmoid(scores[0, :, 0]), feats


@functools.partial(
    __import__("jax").jit, static_argnames=("cfg",))
def _features_program(google_params, cfg: ModelConfig, chunks):
    """chunks of (C, H, W, 3) resized uint8 → pool5 features (T_pad, 1024);
    uint8 chunk wire + on-device normalize, as in :func:`_score_program`."""
    import jax.numpy as jnp

    from vidsum_tpu.preprocess.googlenet import googlenet_apply
    from vidsum_tpu.preprocess.transforms import device_normalize

    frames = jnp.concatenate(chunks, axis=0)
    return googlenet_apply(
        google_params, device_normalize(frames, "google").astype(cfg.compute_dtype))


_SEQ_FWD_CACHE: Dict = {}

# default sequence-padding granularity, shared by summarize_video and
# summarize_directory so the batched path stays program-identical to
# sequential calls
_PAD_MULTIPLE = 64


def _score_seq_sharded(google_params, scorer_params, cfg: ModelConfig,
                       chunks, n_real: int, mesh):
    """Long-context scoring: pool5 features, then the sequence-parallel
    ring-attention scorer over the (data, seq) mesh — no N×N tensor ever
    materializes, so frame counts far beyond the dense envelope run."""
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.parallel.seq_forward import make_seq_sharded_forward

    feats = _features_program(google_params, cfg, chunks)
    key = (cfg, mesh)
    if key not in _SEQ_FWD_CACHE:
        _SEQ_FWD_CACHE[key] = make_seq_sharded_forward(cfg, mesh)
    fwd = _SEQ_FWD_CACHE[key]
    pad_mask = jnp.arange(feats.shape[0])[None] >= n_real
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


@dataclasses.dataclass
class _PendingVideo:
    """A video whose score program is dispatched but not yet fetched —
    the device (and the relay's in-flight chunk transfers) keep working
    while the host moves on to decoding the next video."""

    scores: object  # (T_pad,) device array, dispatch in flight
    feats: object   # (T_pad, d_feat) device array
    n_real: int
    n_frames: int
    picks: np.ndarray


def _begin_video(video_path: str, scorer_params, cfg: ModelConfig,
                 google_params, fps: int, size: int, pad_multiple: int,
                 mesh, stream_chunk: int) -> _PendingVideo:
    """Decode → resize → chunked async ship → dispatch the score program.
    Returns immediately after dispatch; nothing is fetched."""
    import importlib

    import jax

    from vidsum_tpu.preprocess.transforms import resize_shorter_side

    # the package re-exports the reduce_fps *function* under the module's
    # name; resolve the module itself (keeps the monkeypatch seam the tests
    # use, and call-time lookup of iter_reduced_frames)
    _rf = importlib.import_module("vidsum_tpu.preprocess.reduce_fps")
    rs = _rf.iter_reduced_frames(video_path, fps=fps)
    if mesh is not None:
        pad_multiple *= mesh.shape["seq"]
    # full chunks stay shape-identical (one compiled program per chunk-count
    # bucket); a short video becomes a single right-sized chunk
    chunk = -(-max(stream_chunk, 1) // pad_multiple) * pad_multiple
    if rs.final_count:
        chunk = min(chunk, -(-rs.final_count // pad_multiple) * pad_multiple)
    dev_chunks = []
    buf: list = []

    def ship(arr):
        # async: returns immediately, the relay moves bytes in background
        dev_chunks.append(jax.device_put(arr))

    n_real = 0
    try:
        for f in rs.frames:
            buf.append(resize_shorter_side(f, size))
            n_real += 1
            if len(buf) == chunk:
                ship(np.stack(buf))
                buf = []
    finally:
        rs.close()  # release the decoder even if a resize/stack raises
    if buf:
        arr = np.stack(buf)
        # the tail chunk is right-sized to pad_multiple, not to the full
        # chunk: padding crosses the wire too, and up to chunk-1 zero
        # frames (~68 MB at the 224 default) would cost seconds of relay
        tail = (-arr.shape[0]) % pad_multiple
        if tail:
            arr = np.concatenate(
                [arr, np.zeros((tail,) + arr.shape[1:], arr.dtype)])
        ship(arr)
    if n_real == 0:
        raise ValueError(f"no frames decoded from {video_path}")
    picks = rs.picks(n_real)
    x = tuple(dev_chunks)

    if mesh is None:
        scores, feats = _score_program(google_params, scorer_params, cfg,
                                       x, n_real)
    else:
        scores, feats = _score_seq_sharded(google_params, scorer_params, cfg,
                                           x, n_real, mesh)
    return _PendingVideo(scores=scores, feats=feats, n_real=n_real,
                         n_frames=rs.n_frames, picks=picks)


def _finish_video(p: _PendingVideo, budget_ratio: float,
                  kts_impl: str) -> VideoSummary:
    """Fetch the pending device results and run shot selection (KTS +
    knapsack) to a binary summary."""
    n_real = p.n_real
    scores = np.asarray(p.scores[:n_real], dtype=np.float32)
    feats = np.asarray(p.feats[:n_real], dtype=np.float64)

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
    ratio = p.n_frames / n_real
    starts = np.round(bounds[:, 0] * ratio).astype(np.int64)
    ends = np.concatenate([starts[1:] - 1, [p.n_frames - 1]])
    change_points = np.stack([starts, ends], axis=1)

    [summary] = generate_summary([change_points], [scores], [p.n_frames],
                                 [p.picks], budget_ratio=budget_ratio)
    return VideoSummary(summary=summary, scores=scores,
                        change_points=change_points, picks=p.picks,
                        n_frames=p.n_frames)


def summarize_video(video_path: str, scorer_params, cfg: ModelConfig,
                    google_params, fps: int = 2, size: int = 224,
                    budget_ratio: float = 0.15,
                    pad_multiple: int = _PAD_MULTIPLE, mesh=None,
                    kts_impl: str = "host",
                    stream_chunk: int = 256) -> VideoSummary:
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
    :param stream_chunk: frames per host→device chunk (rounded up to
        ``pad_multiple``). Each chunk ships as soon as its frames are
        decoded+resized, so the wire transfer runs under the remaining
        decode — on relay-attached hosts the transfer is this path's
        largest term (PERF.md 'Raw-video path'). Scores are invariant to
        the chunking (padded frames are masked throughout).
    """
    pending = _begin_video(video_path, scorer_params, cfg, google_params,
                           fps, size, pad_multiple, mesh, stream_chunk)
    return _finish_video(pending, budget_ratio, kts_impl)


def summarize_directory(video_dir: str, scorer_params, cfg: ModelConfig,
                        google_params, out_json: str = "summary.json",
                        fps: int = 2, size: int = 224,
                        budget_ratio: float = 0.15,
                        stream_chunk: int = 256) -> Dict[str, list]:
    """Batch the raw-video pipeline over every video in a directory and write
    a ``summary.json`` keyed by ``video_<i>`` (the reference export layout,
    ``src/generate_summary_image.py:39-48``).

    Videos are pipelined two-deep: video i's score program is dispatched
    (and its chunk transfers drain through the relay) while video i+1
    decodes on the host, then i is fetched and shot-selected. The
    un-overlapped wire tail + device compute of each video therefore hides
    under the next video's decode — per-video results are identical to
    sequential :func:`summarize_video` calls (same programs, same fetch
    order per video)."""
    import glob
    import json
    import os

    results: Dict[str, list] = {}
    paths = sorted(p for p in glob.glob(os.path.join(video_dir, "*"))
                   if p.rsplit(".", 1)[-1].lower() in
                   ("mp4", "mkv", "mpeg", "avi", "webm"))
    pending = None  # (index, _PendingVideo)

    def finish(entry):
        j, p = entry
        out = _finish_video(p, budget_ratio, "host")
        results[f"video_{j}"] = np.nonzero(out.summary)[0].tolist()

    for i, path in enumerate(paths):
        nxt = _begin_video(path, scorer_params, cfg, google_params,
                           fps, size, _PAD_MULTIPLE, None, stream_chunk)
        if pending is not None:
            finish(pending)
        pending = (i, nxt)
    if pending is not None:
        finish(pending)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=8)
    return results
