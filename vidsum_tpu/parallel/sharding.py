"""Sharding rules for SimNet parameter pytrees.

Tensor-parallel layout (Megatron-style column→row pairing, expressed purely
as ``jax.sharding`` annotations — XLA GSPMD inserts the all-reduces):

- attention q/k/v: weights column-sharded over ``model`` (the out dim is
  ``H*Dh``, so shards align with whole heads when ``model`` divides H);
  biases sharded the same way.
- attention output projection: row-sharded (its input dim is the sharded
  head dim) → the matmul produces partial sums that GSPMD psums over
  ``model``; bias replicated.
- MLP fc1 column-sharded / fc2 row-sharded, same pairing.
- embed, head, layernorms, CLS, video_transform: replicated (tiny).

Batch arrays shard over ``data`` on axis 0. The attention einsum then runs
with batch split over ``data`` and heads split over ``model`` with zero
communication until the row-parallel matmuls.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL = {"w": P(None, "model"), "b": P("model")}
ROW = {"w": P("model", None), "b": P(None)}
REP2 = {"w": P(None, None), "b": P(None)}


def _simnet_specs(params: dict) -> dict:
    """PartitionSpec pytree matching an ``init_simnet`` param dict."""
    specs: dict = {
        "embed": dict(REP2),
        "head": dict(REP2),
        "blocks": [
            {
                "attn": {"q": dict(COL), "k": dict(COL), "v": dict(COL),
                         "proj": dict(ROW)},
                "mlp": {"fc1": dict(COL), "fc2": dict(ROW)},
                "ln1": {"scale": P(None), "bias": P(None)},
                "ln2": {"scale": P(None), "bias": P(None)},
            }
            for _ in params["blocks"]
        ],
    }
    if "cls" in params:
        specs["cls"] = P(None, None, None)
    return specs


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for SimNet or PretrainModel params."""
    if "encoder" in params:  # PretrainModel wrapper
        specs = {"encoder": _simnet_specs(params["encoder"]),
                 "video_transform": dict(REP2)}
    else:
        specs = _simnet_specs(params)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over ``data``; everything else replicated."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh with the TP layout."""
    return jax.device_put(params, param_shardings(params, mesh))
