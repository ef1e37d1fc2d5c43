"""One-command backbone weight conversion + validation (VERDICT r1 #8).

The preprocessing pipeline's fidelity rests on GoogLeNet-pool5 / R3D-18
features matching torchvision's pretrained models (reference
``src/data/preprocess/models.py:10-66``). This sandbox has no torchvision
and no egress, so the real weights can't be fetched here — this script is
the verified one-command path for the day a weights file exists:

    python scripts/convert_backbones.py --googlenet googlenet.pth \
        --r3d r3d_18.pth --out converted/

Per model it (a) loads the torchvision-layout state dict (``.pth`` or
``.npz``), (b) converts it to our pytree
(``preprocess/{googlenet,r3d}.py`` converters, strict key coverage),
(c) cross-validates: the same state dict is loaded into the torch mirror
(``tests/torch_mirrors.py`` — torchvision-identical layout) and a
fixed-seed batch at the reference's real input shapes is run through both
frameworks; max|Δ| must clear f32 tolerance, (d) prints sha256 checksums
of the source file and of the converted leaves (deterministic traversal),
and (e) writes ``<out>/{googlenet,r3d18}.msgpack`` readable by
``FeatureExtractor(weights=...)``.

Self-test without real weights (validates the command end-to-end with
random-init torchvision-layout state): ``--selftest`` fabricates state
dicts from the mirrors and runs the full convert+validate+save path —
this is what ``tests/test_preprocess.py::test_convert_backbones_selftest``
runs in CI.
"""

import argparse
import hashlib
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _sha256_tree(params) -> str:
    import jax

    h = hashlib.sha256()
    leaves, treedef = jax.tree_util.tree_flatten(params)
    h.update(str(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(arr.dtype.str.encode())
        h.update(np.asarray(arr.shape, np.int64).tobytes())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def _validate(kind: str, state: dict, params, rtol: float, atol: float):
    """Run the torch mirror and our jitted forward on a fixed batch at the
    reference's real input shapes; return the max abs diff."""
    import jax
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.torch_mirrors import GoogLeNetMirror, R3D18Mirror

    rng = np.random.default_rng(1234)
    tstate = {k: torch.tensor(np.ascontiguousarray(v))
              for k, v in state.items()}
    if kind == "google":
        from vidsum_tpu.preprocess.googlenet import googlenet_apply

        mirror = GoogLeNetMirror().eval()
        allowed_unexpected = ("aux1.", "aux2.", "dropout.", "fc.")
        x = rng.normal(size=(4, 3, 224, 224)).astype(np.float32)
        fwd = jax.jit(googlenet_apply)
        torch_in = torch.tensor(x)
        x = x.transpose(0, 2, 3, 1)          # NCHW → our NHWC
    else:
        from vidsum_tpu.preprocess.r3d import r3d18_apply

        mirror = R3D18Mirror().eval()
        allowed_unexpected = ("fc.",)
        x = rng.normal(size=(2, 3, 16, 112, 112)).astype(np.float32)
        fwd = jax.jit(r3d18_apply)
        torch_in = torch.tensor(x)
        x = x.transpose(0, 2, 3, 4, 1)       # NCTHW → our NTHWC

    missing, unexpected = mirror.load_state_dict(tstate, strict=False)
    bad = [k for k in unexpected
           if not k.startswith(allowed_unexpected)
           and not k.endswith("num_batches_tracked")]
    assert not missing, f"{kind}: mirror missing keys {missing[:5]}..."
    assert not bad, f"{kind}: unexpected keys {bad[:5]}..."

    with torch.no_grad():
        want = mirror(torch_in).numpy()
    got = np.asarray(fwd(params, x))
    max_abs = float(np.abs(got - want).max())
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                               err_msg=f"{kind} forward mismatch")
    return max_abs


def convert_one(kind: str, src: str, out_dir: str,
                rtol: float = 1e-3, atol: float = 1e-4) -> dict:
    """Convert + validate + checksum + save one backbone. Returns a report
    dict (also printed as JSON by main)."""
    from vidsum_tpu.preprocess.extract import load_state_dict
    from vidsum_tpu.train.checkpoint import save_checkpoint

    state = load_state_dict(src)
    if kind == "google":
        from vidsum_tpu.preprocess.googlenet import googlenet_from_torch_state

        params = googlenet_from_torch_state(state)
        out_name = "googlenet.msgpack"
    else:
        from vidsum_tpu.preprocess.r3d import r3d18_from_torch_state

        params = r3d18_from_torch_state(state)
        out_name = "r3d18.msgpack"

    max_abs = _validate(kind, state, params, rtol, atol)

    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, out_name)
    save_checkpoint(out_path, params, meta={
        "source": os.path.basename(src),
        "source_sha256": _sha256_file(src),
        "params_sha256": _sha256_tree(params),
        "validated_max_abs_diff": max_abs,
    })
    return {"kind": kind, "out": out_path,
            "source_sha256": _sha256_file(src),
            "params_sha256": _sha256_tree(params),
            "validated_max_abs_diff": max_abs}


def _selftest(out_dir: str) -> int:
    """Fabricate torchvision-layout state dicts from the mirrors (random
    init + randomized BN stats) and run the full convert path on them."""
    import torch

    from tests.torch_mirrors import (
        GoogLeNetMirror, R3D18Mirror, randomize_bn_stats,
    )

    reports = []
    with tempfile.TemporaryDirectory() as tmp:
        torch.manual_seed(7)
        g = GoogLeNetMirror()
        randomize_bn_stats(g, 17)
        g_path = os.path.join(tmp, "googlenet.pth")
        torch.save(g.state_dict(), g_path)
        reports.append(convert_one("google", g_path, out_dir))

        torch.manual_seed(9)
        r = R3D18Mirror()
        randomize_bn_stats(r, 19)
        r_path = os.path.join(tmp, "r3d_18.pth")
        torch.save(r.state_dict(), r_path)
        reports.append(convert_one("r3d", r_path, out_dir))
    print(json.dumps({"selftest": True, "reports": reports}, indent=1))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser("convert + validate backbone weights")
    ap.add_argument("--googlenet", help="torchvision googlenet state dict")
    ap.add_argument("--r3d", help="torchvision video.r3d_18 state dict")
    ap.add_argument("--out", default="converted")
    ap.add_argument("--selftest", action="store_true",
                    help="run the full path on fabricated random-weight "
                         "state dicts (no real weights needed)")
    args = ap.parse_args()

    if args.selftest:
        return _selftest(args.out)
    if not (args.googlenet or args.r3d):
        ap.error("give --googlenet and/or --r3d (or --selftest)")
    reports = []
    if args.googlenet:
        reports.append(convert_one("google", args.googlenet, args.out))
    if args.r3d:
        reports.append(convert_one("r3d", args.r3d, args.out))
    print(json.dumps({"reports": reports}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
