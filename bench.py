"""Benchmark: frame-scoring throughput on the flagship SimNet scorer.

Measures frames scored per second per chip (the BASELINE.json north-star
metric; target >=5000 frames/sec/chip on TPU) for the ``run_finetune.sh``
model (d_model 256, 4 heads, 4 layers) in bfloat16 over realistic padded
video batches (B=32 videos x N=512 frame bucket).

Methodology: K forwards chained through a ``lax.scan`` carry (each iteration's
input depends on the previous output), executed as ONE device program and
synced by a single host fetch. This defeats two artifacts of the experimental
axon runtime observed here: ``block_until_ready`` returning before execution
finishes (pipelined "throughput" above chip peak FLOPs) and a fixed ~30-40ms
host-fetch RPC (measured separately on a trivial program and subtracted).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever backend JAX selects (the real TPU under the driver; do not
override JAX_PLATFORMS here).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_FRAMES_PER_SEC = 5000.0  # BASELINE.json north star, per chip
B, N, K = 32, 512, 100


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply

    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    params = init_simnet(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, N, 1024)), jnp.float32)
    pad_mask = jnp.zeros((B, N), bool)

    def fwd(params, x):
        s, _ = simnet_apply(params, cfg, x, pad_mask, deterministic=True,
                            attn_impl="pallas_block")
        return jax.nn.sigmoid(s[..., 0])

    @jax.jit
    def chained(params, x0):
        def body(carry, _):
            return fwd(params, x0 + carry[..., None] * 1e-6), ()
        out, _ = lax.scan(body, jnp.zeros((B, N), jnp.float32), None, length=K)
        return out

    @jax.jit
    def trivial(x):
        return x + 1.0

    # warmup/compile both programs; the first host fetch through the tunnel
    # occasionally hits a multi-minute cold path — retry once after a pause
    for attempt in range(2):
        try:
            np.asarray(chained(params, x0))
            np.asarray(trivial(jnp.zeros((4,))))
            break
        except Exception:
            if attempt:
                raise
            time.sleep(60)

    t0 = time.perf_counter()
    np.asarray(trivial(jnp.zeros((4,))))
    rpc = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(params, x0))
        best = min(best, time.perf_counter() - t0)

    per_fwd = max((best - rpc) / K, 1e-9)
    frames_per_sec = B * N / per_fwd
    n_chips = max(len(jax.devices()), 1)
    per_chip = frames_per_sec / n_chips
    print(json.dumps({
        "metric": "scoring_throughput",
        "value": round(per_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(per_chip / TARGET_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
