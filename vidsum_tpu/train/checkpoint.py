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
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(path: str, params: Any,
                    meta: Optional[Dict] = None) -> None:
    """Serialize a param pytree (+ JSON metadata sidecar) atomically."""
    params = jax.device_get(params)
    _write(path, params, meta)


def _write(path: str, host_tree: Any, meta: Optional[Dict]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_tree))
    os.replace(tmp, path)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def start_host_copy(tree: Any) -> None:
    """Kick off async device→host copies for every array in ``tree`` so a
    later ``jax.device_get`` finds the data already on host — the ~15 MB/s
    relay transfer then overlaps whatever runs in between (val pass, loss
    sync). Best-effort: backends without ``copy_to_host_async`` fall
    through to the synchronous fetch."""
    for leaf in jax.tree_util.tree_leaves(tree):
        fn = getattr(leaf, "copy_to_host_async", None)
        if fn is not None:
            try:
                fn()
            except Exception:
                return


class AsyncCheckpointer:
    """Overlap checkpoint serialization + disk writes with training.

    The device→host fetch stays on the caller thread (it is the sync point
    and must see the current step's values); the msgpack encode and file
    write — pure host work, ~half the per-epoch checkpoint cost at flagship
    size — run on a single background thread. Writes to the same path are
    serialized in submission order, and the tmp→``os.replace`` dance keeps
    every on-disk file atomic, so a crash mid-write never corrupts the
    previous checkpoint. Call :meth:`flush` before reading any file back
    (and at end of training); worker exceptions re-raise there.
    """

    def __init__(self) -> None:
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="ckpt")
        self._pending = []

    def save(self, path: str, host_tree: Any,
             meta: Optional[Dict] = None) -> None:
        """Queue an already-fetched (host-side) pytree for writing."""
        self._pending.append(self._pool.submit(_write, path, host_tree, meta))

    def flush(self) -> None:
        """Block until ALL queued writes finish, then re-raise the first
        failure (awaiting everything first means a second flush() after a
        caught error cannot return while a write is still in flight)."""
        pending, self._pending = self._pending, []
        first_err = None
        for fut in pending:
            try:
                fut.result()
            except Exception as e:  # noqa: BLE001 - re-raised below
                if first_err is None:
                    first_err = e
        if first_err is not None:
            raise first_err


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
