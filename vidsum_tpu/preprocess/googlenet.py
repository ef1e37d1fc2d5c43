"""GoogLeNet (Inception v1, BN variant) pool5 feature extractor in JAX.

The reference wraps torchvision's pretrained ``googlenet`` with the final
dropout+fc stripped, leaving the 1024-d global-average-pool ("pool5") output
(``src/data/preprocess/models.py:10-37``). Here the same architecture runs as
one XLA program over a whole batch of frames (NHWC, MXU-tiled convs) — the
north star's "CNN feature extractor compiles to XLA for batched frame
embedding" — with weights convertible 1:1 from a torchvision state dict via
:func:`googlenet_from_torch_state`.

Architecture notes (must match torchvision for weight parity):
- every conv is conv→BN(eps=1e-3)→ReLU (``BasicConv2d``), convs bias-free;
- inception branch 3 uses a 3×3 kernel (torchvision's known deviation from
  the paper's 5×5) with padding 1;
- max pools use ceil_mode;
- torchvision's ``transform_input`` re-normalization is NOT applied: the
  reference rebuilds the net as ``nn.Sequential(*children)``, and
  ``_transform_input`` lives in ``GoogLeNet.forward``, not in a child module,
  so it silently drops out there too. Inputs here get plain ImageNet
  normalization (``feature_extraction.py:83-88``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vidsum_tpu.preprocess.nn import (
    batchnorm, conv2d, conv_w_from_torch, bn_from_torch, global_avg_pool,
    init_conv_bn, maxpool2d_ceil,
)

BN_EPS = 1e-3  # torchvision BasicConv2d

# (ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj) per block
INCEPTION_CFG = {
    "inception3a": (64, 96, 128, 16, 32, 32),
    "inception3b": (128, 128, 192, 32, 96, 64),
    "inception4a": (192, 96, 208, 16, 48, 64),
    "inception4b": (160, 112, 224, 24, 64, 64),
    "inception4c": (128, 128, 256, 24, 64, 64),
    "inception4d": (112, 144, 288, 32, 64, 64),
    "inception4e": (256, 160, 320, 32, 128, 128),
    "inception5a": (256, 160, 320, 32, 128, 128),
    "inception5b": (384, 192, 384, 48, 128, 128),
}
INCEPTION_IN = {
    "inception3a": 192, "inception3b": 256, "inception4a": 480,
    "inception4b": 512, "inception4c": 512, "inception4d": 512,
    "inception4e": 528, "inception5a": 832, "inception5b": 832,
}

Params = Dict[str, Any]


def _basic_conv(p: Params, x, stride=1, padding=0):
    x = conv2d(x, p["conv"]["w"], stride=stride, padding=padding)
    if "bn" in p:
        x = batchnorm(x, p["bn"], BN_EPS)
    else:  # BN folded into the conv at load (fold_googlenet)
        x = x + p["conv"]["b"]
    return jax.nn.relu(x)


def _inception(p: Params, x):
    b1 = _basic_conv(p["branch1"], x)
    b2 = _basic_conv(p["branch2_1"], _basic_conv(p["branch2_0"], x),
                     padding=1)
    b3 = _basic_conv(p["branch3_1"], _basic_conv(p["branch3_0"], x),
                     padding=1)
    b4 = _basic_conv(p["branch4"], maxpool2d_ceil(x, 3, 1, padding=1))
    return jnp.concatenate([b1, b2, b3, b4], axis=-1)


def googlenet_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, 3) normalized images → (B, 1024) pool5 features."""
    x = _basic_conv(params["conv1"], x, stride=2, padding=3)
    x = maxpool2d_ceil(x, 3, 2)
    x = _basic_conv(params["conv2"], x)
    x = _basic_conv(params["conv3"], x, padding=1)
    x = maxpool2d_ceil(x, 3, 2)
    x = _inception(params["inception3a"], x)
    x = _inception(params["inception3b"], x)
    x = maxpool2d_ceil(x, 3, 2)
    x = _inception(params["inception4a"], x)
    x = _inception(params["inception4b"], x)
    x = _inception(params["inception4c"], x)
    x = _inception(params["inception4d"], x)
    x = _inception(params["inception4e"], x)
    x = maxpool2d_ceil(x, 2, 2)
    x = _inception(params["inception5a"], x)
    x = _inception(params["inception5b"], x)
    return global_avg_pool(x, (1, 2))


def init_googlenet(key) -> Params:
    """Random-weight GoogLeNet (tests/plumbing; real use loads torchvision
    weights)."""
    keys = iter(jax.random.split(key, 64))
    params: Params = {
        "conv1": init_conv_bn(next(keys), (7, 7, 3, 64)),
        "conv2": init_conv_bn(next(keys), (1, 1, 64, 64)),
        "conv3": init_conv_bn(next(keys), (3, 3, 64, 192)),
    }
    for name, (c1, c3r, c3, c5r, c5, pp) in INCEPTION_CFG.items():
        cin = INCEPTION_IN[name]
        params[name] = {
            "branch1": init_conv_bn(next(keys), (1, 1, cin, c1)),
            "branch2_0": init_conv_bn(next(keys), (1, 1, cin, c3r)),
            "branch2_1": init_conv_bn(next(keys), (3, 3, c3r, c3)),
            "branch3_0": init_conv_bn(next(keys), (1, 1, cin, c5r)),
            "branch3_1": init_conv_bn(next(keys), (3, 3, c5r, c5)),
            "branch4": init_conv_bn(next(keys), (1, 1, cin, pp)),
        }
    return params


def fold_googlenet(params: Params) -> Params:
    """BN-folded copy of a GoogLeNet param pytree (exact inference
    transform; see :func:`vidsum_tpu.preprocess.nn.fold_batchnorm`)."""
    from vidsum_tpu.preprocess.nn import fold_batchnorm

    return fold_batchnorm(params, BN_EPS)


def _conv_bn_from_torch(state: Dict[str, np.ndarray], prefix: str) -> Params:
    return {
        "conv": {"w": jnp.asarray(conv_w_from_torch(
            state[f"{prefix}.conv.weight"]))},
        "bn": bn_from_torch(state, f"{prefix}.bn"),
    }


def googlenet_from_torch_state(state: Dict[str, np.ndarray],
                               strict: bool = True) -> Params:
    """Convert a torchvision ``googlenet`` state dict (tensor → numpy) into
    this module's param pytree. Key names follow torchvision's layout
    (``conv1.conv.weight``, ``inception3a.branch2.0.conv.weight``, …).

    ``strict`` (default) asserts every key was consumed — except the heads
    the reference strips (aux classifiers, dropout, fc;
    ``src/data/preprocess/models.py:20``) and BN bookkeeping — so a renamed
    torchvision layout fails loudly instead of silently dropping weights.
    """
    from vidsum_tpu.preprocess.nn import TrackingState, check_state_coverage

    state = TrackingState(state)
    params: Params = {
        "conv1": _conv_bn_from_torch(state, "conv1"),
        "conv2": _conv_bn_from_torch(state, "conv2"),
        "conv3": _conv_bn_from_torch(state, "conv3"),
    }
    for name in INCEPTION_CFG:
        params[name] = {
            "branch1": _conv_bn_from_torch(state, f"{name}.branch1"),
            "branch2_0": _conv_bn_from_torch(state, f"{name}.branch2.0"),
            "branch2_1": _conv_bn_from_torch(state, f"{name}.branch2.1"),
            "branch3_0": _conv_bn_from_torch(state, f"{name}.branch3.0"),
            "branch3_1": _conv_bn_from_torch(state, f"{name}.branch3.1"),
            "branch4": _conv_bn_from_torch(state, f"{name}.branch4.1"),
        }
    if strict:
        check_state_coverage(state, ignore_prefixes=("aux1.", "aux2.",
                                                     "dropout.", "fc."))
    return params
