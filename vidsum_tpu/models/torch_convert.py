"""Torch-checkpoint interop for SimNet.

Converts a reference-trained state dict (``pretrain.pth`` /
``model_mae.pth`` — torch Linears/LayerNorms keyed
``embedding_layer.feature_transform.*``, ``encoder.module_list.N.*``,
``final_layer.*``, see ``src/model/simnet.py``) into this framework's param
pytree, so users migrating from the reference keep their trained weights.
Linear weights transpose (out,in) → (in,out); the positional-encoding buffer
is dropped (recomputed in closed form); the empty ``module_score`` list (the
reference's dead branch) has no parameters to map.

``pretrain_model_from_torch_state`` additionally maps the pretrain wrapper's
``video_transform`` (``src/model/simnet_pretrain.py:33``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _linear(state: Dict[str, np.ndarray], prefix: str) -> Params:
    return {"w": jnp.asarray(np.asarray(state[f"{prefix}.weight"]).T),
            "b": jnp.asarray(np.asarray(state[f"{prefix}.bias"]))}


def _layernorm(state: Dict[str, np.ndarray], prefix: str) -> Params:
    return {"scale": jnp.asarray(np.asarray(state[f"{prefix}.weight"])),
            "bias": jnp.asarray(np.asarray(state[f"{prefix}.bias"]))}


def simnet_from_torch_state(state: Dict[str, np.ndarray]) -> Params:
    """Reference SimNet state dict (numpy values) → param pytree."""
    n_layers = 1 + max(
        int(k.split(".")[2]) for k in state if k.startswith("encoder.module_list."))
    params: Params = {
        "embed": _linear(state, "embedding_layer.feature_transform"),
        "blocks": [],
        "head": _linear(state, "final_layer"),
    }
    for i in range(n_layers):
        pfx = f"encoder.module_list.{i}"
        params["blocks"].append({
            "attn": {
                "q": _linear(state, f"{pfx}.sa.q"),
                "k": _linear(state, f"{pfx}.sa.k"),
                "v": _linear(state, f"{pfx}.sa.v"),
                "proj": _linear(state, f"{pfx}.sa.feature_projection"),
            },
            "mlp": {
                "fc1": _linear(state, f"{pfx}.mlp.fc1"),
                "fc2": _linear(state, f"{pfx}.mlp.fc2"),
            },
            "ln1": _layernorm(state, f"{pfx}.norm1"),
            "ln2": _layernorm(state, f"{pfx}.norm2"),
        })
    if "embedding_layer.cls_token" in state:
        params["cls"] = jnp.asarray(np.asarray(
            state["embedding_layer.cls_token"]))
    return params


def pretrain_model_from_torch_state(state: Dict[str, np.ndarray]) -> Params:
    """Reference PretrainModel state dict → param pytree."""
    encoder_state = {k[len("encoder."):]: v for k, v in state.items()
                     if k.startswith("encoder.")}
    return {
        "encoder": simnet_from_torch_state(encoder_state),
        "video_transform": _linear(state, "video_transform"),
    }


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` into numpy (torch CPU only needed at load time)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in state.items()}


def simnet_to_torch_state(params: Params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`simnet_from_torch_state`: export a param pytree as a
    reference-keyed state dict (numpy values; pass through ``torch.save`` for
    a ``.pth`` the reference's ``load_state_dict`` accepts), so models
    trained here can flow back to reference tooling."""
    out: Dict[str, np.ndarray] = {}

    def put_linear(prefix: str, p: Params) -> None:
        out[f"{prefix}.weight"] = np.asarray(p["w"]).T
        out[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_ln(prefix: str, p: Params) -> None:
        out[f"{prefix}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}.bias"] = np.asarray(p["bias"])

    put_linear("embedding_layer.feature_transform", params["embed"])
    put_linear("final_layer", params["head"])
    for i, block in enumerate(params["blocks"]):
        pfx = f"encoder.module_list.{i}"
        put_linear(f"{pfx}.sa.q", block["attn"]["q"])
        put_linear(f"{pfx}.sa.k", block["attn"]["k"])
        put_linear(f"{pfx}.sa.v", block["attn"]["v"])
        put_linear(f"{pfx}.sa.feature_projection", block["attn"]["proj"])
        put_linear(f"{pfx}.mlp.fc1", block["mlp"]["fc1"])
        put_linear(f"{pfx}.mlp.fc2", block["mlp"]["fc2"])
        put_ln(f"{pfx}.norm1", block["ln1"])
        put_ln(f"{pfx}.norm2", block["ln2"])
    if "cls" in params:
        out["embedding_layer.cls_token"] = np.asarray(params["cls"])
    return out
