"""Image transforms matching the reference's torchvision pipeline
(``src/data/preprocess/feature_extraction.py:96-114``): Resize(shorter side)
→ ToTensor (uint8/255) → per-channel Normalize.

The resize runs on host via PIL (bit-compatible with torchvision's
``transforms.Resize`` on PIL images — same antialiased bilinear); the
normalize + CNN forward run on device.
"""

from __future__ import annotations

import numpy as np

# https://pytorch.org/hub/pytorch_vision_googlenet (feature_extraction.py:86)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# https://pytorch.org/vision video classification (feature_extraction.py:85)
VIDEO_MEAN = np.array([0.43216, 0.394666, 0.37645], np.float32)
VIDEO_STD = np.array([0.22803, 0.22145, 0.216989], np.float32)


def resize_shorter_side(frame: np.ndarray, size: int) -> np.ndarray:
    """Resize (H, W, 3) uint8 so the shorter side equals ``size`` (aspect
    preserved), PIL bilinear — torchvision ``Resize(int)`` semantics."""
    from PIL import Image

    h, w = frame.shape[:2]
    if h <= w:
        new_h, new_w = size, max(round(w * size / h), 1)
    else:
        new_h, new_w = max(round(h * size / w), 1), size
    img = Image.fromarray(frame).resize((new_w, new_h), Image.BILINEAR)
    return np.asarray(img)


def _normalize(frames: np.ndarray, mean: np.ndarray,
               std: np.ndarray) -> np.ndarray:
    """uint8 (…, 3) → float32 normalized (ToTensor + Normalize)."""
    return (frames.astype(np.float32) / 255.0 - mean) / std


def imagenet_normalize(frames: np.ndarray) -> np.ndarray:
    return _normalize(frames, IMAGENET_MEAN, IMAGENET_STD)


def video_normalize(frames: np.ndarray) -> np.ndarray:
    return _normalize(frames, VIDEO_MEAN, VIDEO_STD)


def prepare_video(video: np.ndarray, size: int,
                  kind: str) -> np.ndarray:
    """(T, H, W, 3) uint8 → (T, h, w, 3) float32 ready for the extractor."""
    resized = resize_video(video, size)
    if kind == "google":
        return imagenet_normalize(resized)
    if kind == "r3d18":
        return video_normalize(resized)
    raise ValueError(kind)


def resize_video(video: np.ndarray, size: int) -> np.ndarray:
    """(T, H, W, 3) uint8 → resized uint8, still on host.

    Keeping the wire format uint8 and normalizing on device moves 4× less
    data through the host→device link than shipping normalized float32 —
    the link, not compute, dominates raw-video feature extraction (a
    10-minute video's frames are 181 MB as uint8 vs 722 MB as f32)."""
    return np.stack([resize_shorter_side(f, size) for f in video])


def device_normalize(x, kind: str):
    """uint8 device array (…, 3) → normalized float32, on device.

    Same float32 formula as the host :func:`imagenet_normalize` /
    :func:`video_normalize` (ToTensor + Normalize), but XLA
    strength-reduces the divides to multiply-by-reciprocal (measured: ≤2
    f32 ULP vs the host path on the CPU backend, tests/test_preprocess.py)
    — many orders of magnitude inside both the backbone-fidelity tolerance
    (1e-3) and the bf16 ULP the extractor casts to next."""
    import jax.numpy as jnp

    mean, std = ((IMAGENET_MEAN, IMAGENET_STD) if kind == "google"
                 else (VIDEO_MEAN, VIDEO_STD))
    return ((x.astype(jnp.float32) / 255.0 - jnp.asarray(mean))
            / jnp.asarray(std))
