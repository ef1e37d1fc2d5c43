"""Multi-host (multi-process) runtime: ICI within a slice, DCN across.

The reference is a single-process CUDA script (``src/train.py:22`` — no
``torch.distributed`` anywhere); SURVEY.md §2.6/§5 scopes the TPU build's
communication backend as "XLA collectives over ICI within a pod slice and
DCN across slices". Within one process that is just a ``jax.sharding.Mesh``
(``parallel/mesh.py``). This module adds the *multi-controller* layer: each
host runs one process, ``jax.distributed.initialize`` wires the processes
into one runtime (coordination service + Gloo/DCN transport), and the same
``Mesh``-over-``jax.devices()`` code then spans every host's chips — XLA
emits cross-host collectives exactly like intra-host ones.

Multi-controller discipline (used by ``train/finetune.py`` /
``train/pretraining.py``):

- every process executes the SAME driver loop on the SAME data order (the
  shuffle RNG is seeded identically, so no order broadcast is needed);
- batches enter the mesh via :func:`make_global_array` — each process
  materializes device buffers only for its *addressable* shards (the
  per-process data sharding), so a host never copies rows it doesn't own;
- file writes (checkpoints, metrics JSONL, summary exports, final JSON) are
  coordinator-only (:func:`is_coordinator`); reads at resume assume a
  shared filesystem;
- host-side metric math (eval) runs redundantly on every process from the
  replicated params — cheap, deterministic, and avoids a broadcast.

Restart discipline (failure recovery, SURVEY §5): the coordinator's
``train_state.ckpt`` writes are atomic (tmp + ``os.replace``) and carry the
full state — params, optimizer moments, epoch cursor, per-fold history —
so after ANY process dies, the recovery procedure is simply: kill the
remaining processes, relaunch ALL of them with ``resume=True`` (same
process count; the checkpoint is topology-independent host data), and the
run replays bit-identically from the last durable epoch (per-(split,
epoch) RNG streams — ``train/finetune.py``). Every process reads the same
checkpoint at resume, which is where the shared-filesystem assumption
bites: the checkpoint directory must be visible to all hosts.

Validated by ``tests/test_distributed.py``: a 2-process × 4-virtual-CPU-
device harness (local TCP coordinator) must produce the same losses, eval
metrics, and final params as the single-process 8-device run — and a
coordinator hard-crash (``os._exit`` mid-protocol) followed by a 2-process
``resume=True`` restart must be bit-identical to the uninterrupted
2-process run (``test_two_process_kill_and_resume_is_exact``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np

from vidsum_tpu.config import MeshConfig
from vidsum_tpu.parallel.mesh import make_mesh


@dataclasses.dataclass(frozen=True)
class DistributedConfig:
    """Multi-process wiring. ``num_processes <= 1`` means single-controller
    (no-op). Fields default from the standard JAX env vars so launchers can
    configure via environment alone."""

    coordinator_address: Optional[str] = None   # "host:port" of process 0
    num_processes: int = 1
    process_id: int = 0
    # devices this process owns (None = backend default; the CPU test
    # harness sets it via XLA_FLAGS before jax imports instead)
    local_device_ids: Optional[tuple] = None

    @staticmethod
    def from_env() -> "DistributedConfig":
        return DistributedConfig(
            coordinator_address=os.environ.get("VIDSUM_COORDINATOR"),
            num_processes=int(os.environ.get("VIDSUM_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("VIDSUM_PROCESS_ID", "0")),
        )


def init_distributed(cfg: Optional[DistributedConfig] = None) -> None:
    """Join the multi-controller runtime. Call once, before any other jax
    use in the process. No-op for single-process configs, so drivers can
    call it unconditionally."""
    cfg = cfg or DistributedConfig.from_env()
    if cfg.num_processes <= 1:
        return
    if cfg.coordinator_address is None:
        raise ValueError("multi-process run needs coordinator_address "
                         "(process 0's host:port)")
    jax.distributed.initialize(
        coordinator_address=cfg.coordinator_address,
        num_processes=cfg.num_processes,
        process_id=cfg.process_id,
        local_device_ids=cfg.local_device_ids)


def is_coordinator() -> bool:
    """True on the process that owns file writes (checkpoints, metrics,
    exports). Single-process runs are trivially the coordinator."""
    return jax.process_index() == 0


def global_mesh(cfg: Optional[MeshConfig] = None):
    """A mesh over ALL devices in the runtime — after
    :func:`init_distributed`, ``jax.devices()`` spans every process, so the
    ordinary mesh constructor already builds the multi-host mesh (data axis
    laid out process-major: cross-host traffic rides DCN, intra-host ICI)."""
    return make_mesh(cfg)


def make_global_array(sharding, host_value: np.ndarray) -> jax.Array:
    """A global array from a host value every process holds identically.

    Each process's callback is invoked only for its addressable shards, so
    device memory is filled per-process (the per-process data feed) while
    the semantics stay "one global batch". Works unchanged in
    single-process runs.
    """
    host_value = np.asarray(host_value)
    return jax.make_array_from_callback(host_value.shape, sharding,
                                        lambda idx: host_value[idx])


def put_batch(mesh, *arrays, batch_axis: str = "data"):
    """Place host batch arrays onto the mesh, sharded over ``batch_axis``
    along dim 0 (replicated on any other mesh axes). Returns one array or a
    tuple. ``None`` entries pass through (optional item weights)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        sh = NamedSharding(mesh, P(batch_axis))
        out.append(make_global_array(sh, a))
    return out[0] if len(out) == 1 else tuple(out)
