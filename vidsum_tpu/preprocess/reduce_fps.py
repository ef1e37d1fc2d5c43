"""Video fps reduction via OpenCV.

Behavior contract (reference: ``src/data/preprocess/reduce_fps.py:7-56``):
decode with ``cv2.VideoCapture``, keep every ``orig_fps // fps``-th frame up
to ``n_frames * fps // orig_fps`` frames total, swap BGR→RGB, and return
``(frames (T, H, W, 3) uint8, picked original indices, original n_frames)``
— the ``picks`` / ``n_frames`` metadata the eval pipeline consumes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def reduce_fps(video_path: str, fps: int = 2
               ) -> Tuple[np.ndarray, np.ndarray, int]:
    import cv2 as cv

    cap = cv.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    n_frames = int(cap.get(cv.CAP_PROP_FRAME_COUNT))
    orig_fps = int(cap.get(cv.CAP_PROP_FPS))
    if orig_fps < fps:
        raise ValueError(f"video fps {orig_fps} below target {fps}")
    height = int(cap.get(cv.CAP_PROP_FRAME_HEIGHT))
    width = int(cap.get(cv.CAP_PROP_FRAME_WIDTH))

    final_count = n_frames * fps // orig_fps
    step = orig_fps // fps

    frames = np.zeros((final_count, height, width, 3), dtype=np.uint8)
    picks = []
    idx = 0
    kept = 0
    ok = True
    while ok and kept != final_count:
        cap.grab()
        if idx % step == 0:
            ok, bgr = cap.retrieve()
            if not ok:
                break
            frames[kept] = bgr[:, :, ::-1]
            picks.append(idx)
            kept += 1
        idx += 1
    cap.release()
    return frames[:kept], np.asarray(picks), n_frames
