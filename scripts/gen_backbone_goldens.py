"""Generate the committed backbone golden features
(tests/data/backbone_goldens.npz).

Deterministic recipe: torch mirrors (tests/torch_mirrors.py) with
manual_seed'ed weights + randomized BN stats, run in float64 on fixed
synthetic inputs; pool5 / R3D-18 embeddings stored at float64. The tests
then (a) re-run the torch mirror and check it still reproduces the goldens
(~1e-10 — catches a mirror/torch drift) and (b) run the JAX converter +
forward against them at f32 tolerance (catches converter/forward drift).
Regenerate ONLY if the recipe itself changes: python scripts/gen_backbone_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from tests.torch_mirrors import GoogLeNetMirror, R3D18Mirror, randomize_bn_stats

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "backbone_goldens.npz")


def main() -> None:
    torch.manual_seed(0)
    gnet = GoogLeNetMirror().double().eval()
    randomize_bn_stats(gnet, 1)

    rng = np.random.default_rng(42)
    g_in = rng.normal(size=(4, 3, 64, 64)).astype(np.float64)
    with torch.no_grad():
        g_out = gnet(torch.tensor(g_in)).numpy()

    torch.manual_seed(2)
    r3d = R3D18Mirror().double().eval()
    randomize_bn_stats(r3d, 3)
    r_in = rng.normal(size=(2, 3, 8, 32, 32)).astype(np.float64)
    with torch.no_grad():
        r_out = r3d(torch.tensor(r_in)).numpy()

    np.savez(OUT, google_in=g_in, google_pool5=g_out,
             r3d_in=r_in, r3d_embed=r_out)
    print(f"wrote {OUT}: pool5 {g_out.shape}, r3d {r_out.shape}")


if __name__ == "__main__":
    main()
