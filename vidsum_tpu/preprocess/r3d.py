"""R3D-18 (3-D ResNet-18) video feature extractor in JAX.

The reference wraps torchvision's pretrained ``video.r3d_18`` with the final
fc stripped, leaving the 512-d global-average-pool clip embedding
(``src/data/preprocess/models.py:40-66``) used as the distillation target in
pretraining (``src/model/simnet_pretrain.py:33``). Layout here is NDHWC; the
whole clip embeds in one XLA program. Weights convert 1:1 from a torchvision
state dict via :func:`r3d18_from_torch_state`.

Architecture (torchvision VideoResNet with Conv3DSimple blocks):
- stem: 3×7×7 conv stride (1,2,2) pad (1,3,3), BN(eps 1e-5), ReLU;
- 4 stages of 2 BasicBlocks (64/128/256/512), stages 2-4 downsample by
  stride (2,2,2) with a 1×1×1 conv+BN shortcut;
- global average pool over (T, H, W).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vidsum_tpu.preprocess.nn import (
    batchnorm, conv3d, conv_w_from_torch, bn_from_torch, global_avg_pool,
    init_conv_bn,
)

BN_EPS = 1e-5
STAGES = (("layer1", 64, 1), ("layer2", 128, 2), ("layer3", 256, 2),
          ("layer4", 512, 2))

Params = Dict[str, Any]


def _conv_bn(p: Params, x, stride=(1, 1, 1), padding=(1, 1, 1)):
    out = conv3d(x, p["conv"]["w"], stride, padding)
    if "bn" in p:
        return batchnorm(out, p["bn"], BN_EPS)
    return out + p["conv"]["b"]  # BN folded at load (fold_r3d18)


def _basic_block(p: Params, x):
    # stride is a static architecture fact, not a parameter: exactly the
    # blocks with a downsample shortcut stride by 2 in r3d_18 (keeping an
    # int leaf in the pytree would turn it into a tracer under jit)
    stride = (2, 2, 2) if "downsample" in p else (1, 1, 1)
    out = jax.nn.relu(_conv_bn(p["conv1"], x, stride=stride))
    out = _conv_bn(p["conv2"], out)
    shortcut = x
    if "downsample" in p:
        shortcut = _conv_bn(p["downsample"], x, stride=stride,
                            padding=(0, 0, 0))
    return jax.nn.relu(out + shortcut)


def r3d18_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, W, 3) normalized clip → (B, 512) embedding."""
    x = jax.nn.relu(_conv_bn(params["stem"], x, stride=(1, 2, 2),
                             padding=(1, 3, 3)))
    for name, _, _ in STAGES:
        for block in params[name]:
            x = _basic_block(block, x)
    return global_avg_pool(x, (1, 2, 3))


def init_r3d18(key) -> Params:
    keys = iter(jax.random.split(key, 64))
    params: Params = {"stem": init_conv_bn(next(keys), (3, 7, 7, 3, 64))}
    cin = 64
    for name, cout, stride in STAGES:
        blocks = []
        for bi in range(2):
            s = stride if bi == 0 else 1
            b: Params = {
                "conv1": init_conv_bn(next(keys), (3, 3, 3, cin, cout)),
                "conv2": init_conv_bn(next(keys), (3, 3, 3, cout, cout)),
            }
            if s != 1 or cin != cout:
                b["downsample"] = init_conv_bn(next(keys),
                                               (1, 1, 1, cin, cout))
            blocks.append(b)
            cin = cout
        params[name] = blocks
    return params


def fold_r3d18(params: Params) -> Params:
    """BN-folded copy of an R3D-18 param pytree (exact inference
    transform; see :func:`vidsum_tpu.preprocess.nn.fold_batchnorm`)."""
    from vidsum_tpu.preprocess.nn import fold_batchnorm

    return fold_batchnorm(params, BN_EPS)


def _conv_bn_from_torch(state: Dict[str, np.ndarray], conv_key: str,
                        bn_prefix: str) -> Params:
    return {"conv": {"w": jnp.asarray(conv_w_from_torch(state[conv_key]))},
            "bn": bn_from_torch(state, bn_prefix)}


def r3d18_from_torch_state(state: Dict[str, np.ndarray],
                           strict: bool = True) -> Params:
    """Convert a torchvision ``video.r3d_18`` state dict (tensor → numpy).
    Keys: ``stem.0.weight``, ``layer1.0.conv1.0.weight``,
    ``layer2.0.downsample.0.weight``, …

    ``strict`` (default) asserts every key was consumed except the stripped
    ``fc`` head (``src/data/preprocess/models.py:50``) and BN bookkeeping.
    """
    from vidsum_tpu.preprocess.nn import TrackingState, check_state_coverage

    state = TrackingState(state)
    params: Params = {
        "stem": _conv_bn_from_torch(state, "stem.0.weight", "stem.1")}
    cin = 64
    for name, cout, stride in STAGES:
        blocks = []
        for bi in range(2):
            s = stride if bi == 0 else 1
            pfx = f"{name}.{bi}"
            b: Params = {
                "conv1": _conv_bn_from_torch(
                    state, f"{pfx}.conv1.0.weight", f"{pfx}.conv1.1"),
                "conv2": _conv_bn_from_torch(
                    state, f"{pfx}.conv2.0.weight", f"{pfx}.conv2.1"),
            }
            if s != 1 or cin != cout:
                b["downsample"] = _conv_bn_from_torch(
                    state, f"{pfx}.downsample.0.weight", f"{pfx}.downsample.1")
            blocks.append(b)
            cin = cout
        params[name] = blocks
    if strict:
        check_state_coverage(state, ignore_prefixes=("fc.",))
    return params
