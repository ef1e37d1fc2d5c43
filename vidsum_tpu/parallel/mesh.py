"""Device meshes.

The reference is single-process single-GPU (SURVEY.md §2.6 — no
torch.distributed anywhere); scaling here is greenfield TPU design:
a 2-D ``jax.sharding.Mesh`` with a ``data`` axis (batch parallelism; gradient
psum rides ICI) and a ``model`` axis (tensor parallelism over attention heads
and MLP hidden units). XLA GSPMD inserts the collectives; nothing in the
framework issues explicit NCCL-style calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from vidsum_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over all (or the given) devices.

    ``cfg.data == -1`` uses every device not claimed by the model axis.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(cfg.model, 1)
    if n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, cfg.axis_names)
