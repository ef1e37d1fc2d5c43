"""Train-step anatomy: ablation ladder on the real chip (VERDICT r3 #4).

Attributes the flagship train step's time (B=32 x N=512, bf16, fused block
kernels, dropout 0.3, coupled-wd Adam) to named costs by measuring a ladder
of step variants with bench.py's methodology (K steps unrolled in ONE
jitted program with donation, m-call-differenced chain timing — the only
defensible timing through the axon relay, CLAUDE.md):

- full        : fwd + bwd + Adam, dropout 0.3      (the production step)
- no_dropout  : fwd + bwd + Adam, dropout 0.0      -> dropout-family cost
- sgd         : fwd + bwd + plain SGD apply        -> Adam cost (moments HBM)
- fwd_loss    : loss value only, dropout 0.3       -> backward cost (sgd -)
- eval_fwd    : deterministic scoring forward      -> loss/masking overhead

Derived rows printed at the end: dropout family, Adam, backward(+recompute),
forward, and the MXU-ideal floor at 3x/4x FLOP accounting. Prints one JSON
line; PERF.md "Train-step anatomy" records the table.

Run on the real TPU (no JAX_PLATFORMS override); single-client tunnel —
nothing else may use the chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, K = 32, 512, 20
PEAK_FLOPS = float(os.environ.get("VIDSUM_TPU_PEAK_TFLOPS", "197")) * 1e12


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply
    from vidsum_tpu.ops.losses import mse_with_mask_loss
    from vidsum_tpu.train.steps import make_optimizer
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    cfg0 = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.0,
                       compute_dtype="bfloat16")
    params0 = init_simnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, N, 1024)), jnp.float32)
    pad_mask = jnp.zeros((B, N), bool)
    target0 = jnp.asarray(rng.random((B, N)), jnp.float32)
    base_key = jax.random.key(1234, impl="rbg")
    optimizer = make_optimizer(1e-3, 1e-4)

    def loss_fn(c):
        def f(params, x, target, key):
            scores, _ = simnet_apply(params, c, x, pad_mask, rng=key,
                                     deterministic=False,
                                     attn_impl="pallas_block")
            return mse_with_mask_loss(scores, target, pad_mask)
        return f

    def make_train(c, opt: str):
        lf = loss_fn(c)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(params, opt_state, x):
            loss = None
            for i in range(K):
                loss, grads = jax.value_and_grad(lf)(
                    params, x, target0, jax.random.fold_in(base_key, i))
                if opt == "adam":
                    updates, opt_state = optimizer.update(grads, opt_state,
                                                          params)
                    params = optax.apply_updates(params, updates)
                else:  # plain SGD apply: isolates Adam's moment traffic
                    params = jax.tree_util.tree_map(
                        lambda p, g: p - 1e-3 * g, params, grads)
            return params, opt_state, loss
        return run

    lf_full = loss_fn(cfg)

    @jax.jit
    def fwd_loss_unrolled(params, target):
        # value only, no grad; the (B, N) target carries the cross-step
        # data dependency (adding to x would cost a 134 MB HBM round-trip)
        loss = jnp.float32(0)
        for i in range(K):
            loss = lf_full(params, x0, target, jax.random.fold_in(base_key, i))
            target = target + loss * 1e-12
        return target, loss

    @jax.jit
    def eval_unrolled(params, target):
        loss = jnp.float32(0)
        for i in range(K):
            s, _ = simnet_apply(params, cfg, x0 + target[..., None] * 0,
                                pad_mask, deterministic=True,
                                attn_impl="pallas_block")
            loss = s[..., 0].mean()
            target = target + loss * 1e-12
        return target, loss

    @jax.jit
    def trivial(x):
        return x + 1.0

    def diff_samples(dispatch, n=5, m2=3):
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

        for _ in range(3):
            t1, tm = sample(1), sample(m2)
            diffs = sorted((b - a) / (m2 - 1) for a, b in zip(t1, tm))
            med = float(np.median(diffs))
            if med > 0:
                return diffs
            time.sleep(20)
        raise RuntimeError("tunnel too noisy: nonpositive median diff")

    variants = {}

    def measure_train(name, c, opt):
        run = make_train(c, opt)
        p = jax.tree_util.tree_map(jnp.array, params0)
        state = [p, optimizer.init(p)]

        def dispatch():
            p, o, loss = run(state[0], state[1], x0)
            state[0], state[1] = p, o
            return loss

        np.asarray(dispatch())  # compile
        ts = diff_samples(dispatch, n=6)
        variants[name] = [round(t / K * 1e3, 3) for t in
                          (ts[0], float(np.median(ts)), ts[-1])]
        print(f"  {name}: best {variants[name][0]} ms/step "
              f"(median {variants[name][1]})", flush=True)

    def measure_carry(name, run):
        state = [jnp.array(target0)]

        def dispatch():
            t, loss = run(params0, state[0])
            state[0] = t
            return loss

        np.asarray(dispatch())
        ts = diff_samples(dispatch, n=6)
        variants[name] = [round(t / K * 1e3, 3) for t in
                          (ts[0], float(np.median(ts)), ts[-1])]
        print(f"  {name}: best {variants[name][0]} ms/step "
              f"(median {variants[name][1]})", flush=True)

    # warm the relay with one trivial fetch (cold first fetch can be minutes)
    np.asarray(trivial(jnp.zeros((4,))))
    print("measuring...", flush=True)
    measure_train("full", cfg, "adam")
    measure_train("no_dropout", cfg0, "adam")
    measure_train("sgd", cfg, "sgd")
    measure_carry("fwd_loss", fwd_loss_unrolled)
    measure_carry("eval_fwd", eval_unrolled)

    probe = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial(jnp.zeros((4,))))
        probe.append(time.perf_counter() - t0)

    d, L = cfg.d_model, cfg.num_layers
    per_layer = 8 * B * N * d * d + 16 * B * N * d * d + 4 * B * N * N * d
    fwd_flops = L * per_layer + 2 * B * N * cfg.in_features * d + 2 * B * N * d
    ideal3 = 3 * fwd_flops / PEAK_FLOPS * 1e3
    ideal4 = 4 * fwd_flops / PEAK_FLOPS * 1e3

    full = variants["full"][0]
    anatomy = {
        "dropout_family_ms": round(full - variants["no_dropout"][0], 3),
        "adam_ms": round(full - variants["sgd"][0], 3),
        "backward_ms": round(variants["sgd"][0] - variants["fwd_loss"][0], 3),
        "forward_loss_ms": variants["fwd_loss"][0],
        "eval_fwd_ms": variants["eval_fwd"][0],
        "mxu_ideal_3x_ms": round(ideal3, 3),
        "mxu_ideal_4x_ms": round(ideal4, 3),
    }
    print(json.dumps({
        "metric": "train_step_anatomy",
        "shape": f"B={B} N={N} bf16 pallas_block",
        "variants_ms_per_step": variants,   # [best, median, worst]
        "anatomy": anatomy,
        "train_mfu_3x": round(3 * fwd_flops / (full / 1e3) / PEAK_FLOPS, 4),
        "relay_probe_ms": round(float(np.median(probe)) * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
