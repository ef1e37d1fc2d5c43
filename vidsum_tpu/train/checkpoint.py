"""Pytree checkpoints.

The reference saves whole torch state dicts to fixed CWD filenames every epoch
(``model_mae.pth`` at ``src/train.py:95``, encoder-only ``pretrain.pth`` at
``src/pretrain.py:46``) with weight-only warm starts and no optimizer/step
state. Here checkpoints are msgpack-serialized param pytrees (via
flax.serialization) plus an optional metadata dict; the pretrain→finetune
handoff stays weight-only like the reference, and the reference's
*unconditional* ``model_mae.pth`` load (``train.py:76``, fatal when the file
is absent) is gated behind ``TrainConfig.warm_start_from_save``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(path: str, params: Any,
                    meta: Optional[Dict] = None) -> None:
    """Serialize a param pytree (+ JSON metadata sidecar) atomically."""
    params = jax.device_get(params)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(params))
    os.replace(tmp, path)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, Optional[Dict]]:
    """Restore a pytree saved by :func:`save_checkpoint` into the structure of
    ``like`` (strict: shapes/structure must match, like the reference's
    ``load_state_dict(strict=True)`` at train.py:43)."""
    with open(path, "rb") as f:
        params = serialization.from_bytes(like, f.read())
    meta = None
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, meta
