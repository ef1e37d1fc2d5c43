"""Attention-map export.

Behavior contract (reference: ``src/train.py:155-165``): run the model over a
dataset and save per-video attention maps to disk. The reference pays for
this on *every* forward (each attention layer detaches+copies its weights to
host, ``src/model/simnet.py:164``); here maps are materialized only inside
this export path, in one device→host transfer per video, and saved as an
``.npz`` of (L, H, N, N) arrays instead of a torch pickle.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from vidsum_tpu.config import Config
from vidsum_tpu.data.collate import pad_batch
from vidsum_tpu.models.simnet import simnet_apply


def collect_attention_weights(params, val_set, cfg: Config
                              ) -> Dict[str, np.ndarray]:
    """Per-video stacked attention maps (num_layers, H, N, N), unpadded."""
    out: Dict[str, np.ndarray] = {}
    for i in range(len(val_set)):
        feats, target, user = val_set[i]
        n = feats.shape[0]
        x, _, mask = pad_batch([feats], [target], pad_value=cfg.data.pad_value,
                               bucket=cfg.data.length_bucket)
        _, _, maps = simnet_apply(params, cfg.model, jnp.asarray(x),
                                  jnp.asarray(mask), return_attn=True)
        stacked = np.stack([np.asarray(m)[0, :, :n, :n] for m in maps])
        out[user.name] = stacked
    return out


def save_attention_weights(params, val_set, cfg: Config,
                           path: str = "weights.npz") -> None:
    np.savez_compressed(path, **collect_attention_weights(params, val_set,
                                                          cfg))
