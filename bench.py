"""Benchmark: frame-scoring + training throughput on the flagship scorer.

Primary metric (BASELINE.json north star, target >=5000 frames/sec/chip on
TPU): inference frames scored per second per chip for the ``run_finetune.sh``
model (d_model 256, 4 heads, 4 layers) in bfloat16 over B=32 x N=512 padded
batches. Extra fields in the same JSON line (VERDICT r1 item 7):

- ``ragged_frames_per_sec``: REAL (non-padded) frames/sec over a realistic
  SumMe/TVSum length mix spread across the production 128-multiple length
  buckets — what a real val epoch sees, padding waste included.
- ``train_frames_per_sec`` / ``train_ms_per_step``: the full fused-kernel
  train step (fwd + bwd + coupled-wd Adam, dropout 0.3, rbg RNG) at
  B=32 x N=512.
- ``scoring_mfu`` / ``train_mfu``: model-FLOPs utilization against the chip's
  bf16 peak (v5e: 197 TFLOP/s; override with VIDSUM_TPU_PEAK_TFLOPS).

Methodology: K iterations linked by a data dependency inside one jitted
program, dispatched m times back-to-back with ONE host fetch at the end;
per-iteration time is the rank-paired difference between m=1 and m=3
samples (see ``vidsum_tpu/utils/chain_timing.py``). This defeats the
experimental axon runtime's artifacts: ``block_until_ready`` returns
before execution finishes, and every fetch pays a relay RPC with ~±10 ms
jitter that a subtract-one-estimate scheme cannot remove — all constant
overhead cancels in the difference instead.

Prints ONE JSON line. Runs on whatever backend JAX selects (the real TPU
under the driver; do not override JAX_PLATFORMS here).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

TARGET_FRAMES_PER_SEC = 5000.0  # BASELINE.json north star, per chip
B, N, K = 32, 512, 100
K_RAGGED = 400  # small buckets are ~0.05-0.2 ms/fwd through the grouped
                # kernel; the chain must dwarf the ~30 ms fetch RPC noise
K_TRAIN = 20  # unrolled inside one program; compile cost grows with K,
              # but residual per-chain RPC jitter amortizes as 1/K
PEAK_FLOPS = float(os.environ.get("VIDSUM_TPU_PEAK_TFLOPS", "197")) * 1e12

# Realistic 2-fps video-length mix (SumMe 1-6.5 min, TVSum 2-10 min),
# grouped into the production 128-multiple buckets: (bucket, real lengths).
RAGGED_GROUPS = [
    (128, [83, 97, 104, 112, 120, 126, 90, 118]),
    (256, [147, 165, 193, 208, 226, 240, 252, 172]),
    (384, [262, 289, 316, 340, 355, 371, 300, 330]),
    (512, [395, 430, 455, 470, 490, 505, 412, 448]),
]


def _model_flops(cfg, b, n, train: bool) -> float:
    """Dense-equivalent matmul FLOPs for one forward (x3 for a train step)."""
    d, L = cfg.d_model, cfg.num_layers
    per_layer = 8 * b * n * d * d + 16 * b * n * d * d + 4 * b * n * n * d
    fwd = L * per_layer + 2 * b * n * cfg.in_features * d + 2 * b * n * d
    return 3.0 * fwd if train else fwd


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply
    from vidsum_tpu.ops.losses import mse_with_mask_loss
    from vidsum_tpu.train.steps import make_optimizer

    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    params = init_simnet(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, N, 1024)), jnp.float32)
    pad_mask = jnp.zeros((B, N), bool)

    def fwd(params, x, mask):
        s, _ = simnet_apply(params, cfg, x, mask, deterministic=True,
                            attn_impl="pallas_block")
        return jax.nn.sigmoid(s[..., 0])

    def chained_fwd(mask, k):
        @jax.jit
        def run(params, x0):
            def body(carry, _):
                return fwd(params, x0 + carry[..., None] * 1e-6, mask), ()
            out, _ = lax.scan(body, jnp.zeros(x0.shape[:2], jnp.float32),
                              None, length=k)
            return out
        return run

    @jax.jit
    def trivial(x):
        return x + 1.0

    # --- build the ragged-bucket programs
    ragged_progs = []
    ragged_real_frames = 0
    for bucket, lens in RAGGED_GROUPS:
        bb = len(lens)
        xb = jnp.asarray(rng.normal(size=(bb, bucket, 1024)), jnp.float32)
        mb = jnp.asarray(np.arange(bucket)[None, :]
                         >= np.asarray(lens)[:, None])
        ragged_progs.append((chained_fwd(mb, K_RAGGED), xb))
        ragged_real_frames += sum(lens)

    # --- the fused-kernel train step, K_TRAIN steps UNROLLED inside one
    # jitted program. Chaining through lax.scan OOMs the scoped VMEM for the
    # Pallas backward custom call inside a while body (17.4M > 16M limit,
    # observed on v5e); a Python loop of separate dispatches pays the axon
    # tunnel's per-dispatch RPC (~1.5 ms/step measured — a relay artifact,
    # not device time). The unrolled single program measures the true
    # device step: 3.90 ms vs 5.40 ms through the per-step dispatch loop at
    # flagship shape.
    optimizer = make_optimizer(1e-3, 1e-4)
    target = jnp.asarray(rng.random((B, N)), jnp.float32)
    base_key = jax.random.key(1234, impl="rbg")

    def loss_fn(params, x, rng_key):
        scores, _ = simnet_apply(params, cfg, x, pad_mask, rng=rng_key,
                                 deterministic=False,
                                 attn_impl="pallas_block")
        return mse_with_mask_loss(scores, target, pad_mask)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_unrolled(params, opt_state, x):
        # donation keeps params/opt state in place in HBM through the whole
        # unrolled body — same in-place update the production step uses
        loss = None
        for i in range(K_TRAIN):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x, jax.random.fold_in(base_key, i))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    train_params = jax.tree_util.tree_map(jnp.array, params)
    train_state = [train_params, optimizer.init(train_params)]

    def run_train_chain():
        p, o, loss = train_unrolled(train_state[0], train_state[1], x0)
        train_state[0], train_state[1] = p, o
        return np.asarray(loss)

    main_prog = chained_fwd(pad_mask, K)

    # warmup/compile everything; the first host fetch through the tunnel
    # occasionally hits a multi-minute cold path — retry once after a pause
    for attempt in range(2):
        try:
            np.asarray(main_prog(params, x0))
            for prog, xb in ragged_progs:
                np.asarray(prog(params, xb))
            run_train_chain()
            np.asarray(trivial(jnp.zeros((4,))))
            break
        except Exception:
            if attempt:
                raise
            time.sleep(60)

    def diff_samples(dispatch, n=5, m2=3):
        """Per-chain seconds by m-call differencing: ``dispatch()`` enqueues
        one chain and returns a (small) device handle; a sample times m
        back-to-back dispatches synced by ONE fetch of the last handle.
        The rank-paired (m=3 - m=1)/2 differences cancel dispatch + fetch
        RPC + relay jitter bias (VERDICT r1 #2: best/median/spread, and no
        fragile RPC estimate)."""
        def sample(m):
            out = []
            for _ in range(n):
                t0 = time.perf_counter()
                h = None
                for _ in range(m):
                    h = dispatch()
                np.asarray(h)
                out.append(time.perf_counter() - t0)
            return sorted(out)

        for attempt in range(3):
            t1, tm = sample(1), sample(m2)
            diffs = sorted((b - a) / (m2 - 1) for a, b in zip(t1, tm))
            med = float(np.median(diffs))
            if med > 0:
                break
            time.sleep(20)  # relay noise spike; settle and retry
        else:
            raise RuntimeError("tunnel too noisy: nonpositive median diff")
        if diffs[0] <= 0:  # a noise spike in the m=1 samples; spread_pct
            diffs[0] = med  # will still expose the unstable run
        return diffs

    def spread_pct(ts):
        return 100.0 * (ts[-1] - ts[0]) / np.median(ts)

    # 1) dense scoring (the recorded north-star metric)
    ts_dense = diff_samples(lambda: main_prog(params, x0))
    per_fwd = ts_dense[0] / K
    frames_per_sec = B * N / per_fwd
    scoring_mfu = _model_flops(cfg, B, N, False) / per_fwd / PEAK_FLOPS

    # 2) ragged buckets: one dispatch = all four bucket programs
    def ragged_dispatch():
        h = None
        for prog, xb in ragged_progs:
            h = prog(params, xb)
        return h

    t_ragged = diff_samples(ragged_dispatch, n=3)[0]
    ragged_fps = ragged_real_frames * K_RAGGED / t_ragged

    # 3) train step (donated params thread the data dependency across
    # dispatches; fetch only the final loss handle)
    def train_dispatch():
        p, o, loss = train_unrolled(train_state[0], train_state[1], x0)
        train_state[0], train_state[1] = p, o
        return loss

    ts_train = diff_samples(train_dispatch, n=6)
    per_step = ts_train[0] / K_TRAIN
    per_step_med = float(np.median(ts_train)) / K_TRAIN
    train_fps = B * N / per_step
    train_mfu = _model_flops(cfg, B, N, True) / per_step / PEAK_FLOPS

    # 4) GoogLeNet-pool5 frame embedding (the preprocess north star's
    # batched backbone; bf16 weights+activations, B=64 224x224 frames)
    from vidsum_tpu.preprocess.googlenet import (
        fold_googlenet, googlenet_apply, init_googlenet)

    # fold BN in f32 first (exact), then cast — the production load path
    g_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        fold_googlenet(init_googlenet(jax.random.PRNGKey(1))))
    # B=128 is the measured batch-size sweet spot for the conv stack
    # (scripts/sweep_googlenet_batch.py, length-differenced; folded A/B
    # in scripts/bench_bn_fold.py). Weights close over the program as XLA
    # constants — the production extractor convention (preprocess/
    # extract.py): constant weights are 15-19% faster than weights-as-
    # arguments at this shape, and the BN fold only wins under it.
    GB, K_G = 128, 20
    gx = jnp.asarray(rng.normal(size=(GB, 224, 224, 3)), jnp.bfloat16)

    @jax.jit
    def google_chain(x):
        def body(carry, _):
            out = googlenet_apply(g_params, x + carry)
            return out.mean().astype(x.dtype) * 1e-12, ()
        c, _ = lax.scan(body, jnp.zeros((), x.dtype), None, length=K_G)
        return c

    np.asarray(google_chain(gx))  # compile
    ts_g = diff_samples(lambda: google_chain(gx), n=3)
    google_fps = GB * K_G / ts_g[0]

    # conv-path MFU from XLA's own cost model (exact conv FLOPs beat any
    # hand constant); unavailable on some remote backends → null
    google_mfu = None
    try:
        cost = jax.jit(googlenet_apply).lower(g_params, gx).compile(
        ).cost_analysis()
        if cost and cost.get("flops"):
            google_mfu = round(
                float(cost["flops"]) * google_fps / GB / PEAK_FLOPS, 4)
    except Exception:
        pass

    # relay-health probe (ADVICE/VERDICT r2: make a slow relay window
    # machine-visible next to the recorded numbers): median round-trip of a
    # trivial dispatch+fetch. Steady windows measure ~35 ms; a degraded
    # window (observed up to ~450 ms) means only same-process A/B deltas in
    # this record are defensible.
    probe = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial(jnp.zeros((4,))))
        probe.append(time.perf_counter() - t0)
    relay_probe_ms = float(np.median(probe)) * 1e3

    n_chips = max(len(jax.devices()), 1)
    per_chip = frames_per_sec / n_chips
    print(json.dumps({
        "metric": "scoring_throughput",
        "value": round(per_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(per_chip / TARGET_FRAMES_PER_SEC, 3),
        "ragged_frames_per_sec": round(ragged_fps / n_chips, 1),
        "train_frames_per_sec": round(train_fps / n_chips, 1),
        "train_ms_per_step": round(per_step * 1e3, 3),
        "train_ms_per_step_median": round(per_step_med * 1e3, 3),
        "train_spread_pct": round(spread_pct(ts_train), 1),
        "scoring_mfu": round(scoring_mfu, 4),
        "scoring_spread_pct": round(spread_pct(ts_dense), 1),
        "train_mfu": round(train_mfu, 4),
        "googlenet_fps": round(google_fps / n_chips, 1),
        "googlenet_mfu": google_mfu,
        "relay_probe_ms": round(relay_probe_ms, 1),
    }))


if __name__ == "__main__":
    main()
