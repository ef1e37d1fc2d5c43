"""On-chip kernel validation battery.

The pytest suite runs on the CPU harness (Pallas in interpret mode); this
script re-validates every kernel against its dense reference on the real
chip, where Mosaic compilation, vector layouts, and fp32-accumulation
behavior can differ. Run serially (the tunnel is single-client):

    python scripts/validate_on_tpu.py

Checks: fused attention fwd, fused encoder block fwd (both tiles), trainable
dropout-attention fwd + exact grads vs the hash-masked dense reference, and
one optimization step sanity.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, ok, detail=""):
    print(f"[{'OK' if ok else 'FAIL'}] {name} {detail}")
    if not ok:
        raise SystemExit(f"validation failed: {name}")


def main() -> None:
    assert jax.default_backend() == "tpu", "run on the TPU host"
    rng = np.random.default_rng(0)

    from vidsum_tpu.ops.attention import _xla_attention, flash_attention

    B, H, N, Dh = 4, 4, 256, 64
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.arange(N)[None, :] >= 200) * jnp.ones((B, 1), bool)
    got = np.asarray(flash_attention(q, k, v, mask, 0.0625))
    want = np.asarray(_xla_attention(q, k, v, mask, 0.0625))
    diff = np.abs(got - want).max()
    # TPU fp32 matmuls run multi-pass bf16 on the MXU: ~1e-4-scale rounding
    check("flash_attention fwd", diff < 1e-3, f"max diff {diff:.2e}")

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply

    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=2, dropout=0.0,
                      max_len=512)
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 256, 1024)), jnp.float32)
    bm = jnp.asarray(np.arange(256)[None, :] >= 230) * jnp.ones((2, 1), bool)
    s_ref, _ = simnet_apply(params, cfg, x, bm, attn_impl="xla")
    for impl in ("pallas", "pallas_block"):
        s, _ = simnet_apply(params, cfg, x, bm, attn_impl=impl)
        diff = float(jnp.abs(s - s_ref).max())
        check(f"model forward {impl}", diff < 1e-3, f"max diff {diff:.2e}")

    from vidsum_tpu.ops.attention_train import (
        dropout_attention_reference, flash_attention_dropout,
        reference_keep_mask,
    )

    B, H, N, Dh = 2, 2, 128, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    bmask = np.zeros((B, N), bool)
    bmask[:, 100:] = True
    mask8 = jnp.asarray(bmask.astype(np.int8))[:, None, :]
    seed = jnp.asarray([[1234]], jnp.int32)
    rate = 0.25
    keep = reference_keep_mask(1234, B, H, N, rate)
    co = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))

    got = flash_attention_dropout(q, k, v, mask8, seed, rate, 0.1)
    want = dropout_attention_reference(q, k, v, jnp.asarray(bmask), keep,
                                       rate, 0.1)
    diff = float(jnp.abs(got - want).max())
    check("dropout-attention fwd", diff < 1e-3, f"max diff {diff:.2e}")

    def f_fused(q, k, v):
        return jnp.sum(flash_attention_dropout(q, k, v, mask8, seed, rate,
                                               0.1) * co)

    def f_ref(q, k, v):
        return jnp.sum(dropout_attention_reference(
            q, k, v, jnp.asarray(bmask), keep, rate, 0.1) * co)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for name, ga, gb in zip("qkv", g_fused, g_ref):
        rel = float(jnp.abs(ga - gb).max() / jnp.abs(gb).max())
        check(f"dropout-attention d{name}", rel < 1e-2,
              f"max rel err {rel:.2e}")

    from vidsum_tpu.train.steps import make_finetune_step, make_optimizer

    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    opt = make_optimizer(1e-3, 1e-4)
    step = make_finetune_step(cfg, opt, attn_impl="pallas")
    p = init_simnet(jax.random.PRNGKey(0), cfg)
    st = opt.init(p)
    xb = jnp.asarray(rng.normal(size=(8, 256, 1024)), jnp.float32)
    tb = jnp.asarray(rng.random((8, 256)), jnp.float32)
    mb = jnp.zeros((8, 256), bool)
    key = jax.random.key(1, impl="rbg")
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        p, st, loss = step(p, st, xb, tb, mb, sub)
        losses.append(float(loss))
    check("pallas train step optimizes", losses[-1] < losses[0]
          and all(np.isfinite(losses)), f"{losses[0]:.4f}→{losses[-1]:.4f}")

    # fused block train kernel at bf16 compute (one-pass MXU matmuls) vs the
    # dense reference with the identical dtype contract + hash masks
    from vidsum_tpu.models.simnet import _init_block
    from vidsum_tpu.ops.block_train import (
        block_reference_with_masks, fused_block_train,
    )

    bcfg = ModelConfig(d_model=256, num_heads=4, num_layers=1)
    block = _init_block(jax.random.PRNGKey(5), bcfg)
    xtr = jnp.asarray(rng.normal(size=(4, 256, 256)), jnp.bfloat16)
    bm2 = np.zeros((4, 256), bool)
    bm2[2, 200:] = True
    mask8b = jnp.asarray(bm2.astype(np.int8))[:, None, :]
    seed_b = jnp.asarray([[77]], jnp.int32)
    got = fused_block_train(xtr, block, mask8b, seed_b, 4, bcfg.attn_scale,
                            0.3).astype(jnp.float32)
    want = block_reference_with_masks(xtr, block, jnp.asarray(bm2), 77, 4,
                                      bcfg.attn_scale, 0.3).astype(jnp.float32)
    diff = float(jnp.abs(got - want).max())
    check("fused block train bf16 fwd", diff < 0.15, f"max diff {diff:.2e}")

    # random cotangent: sum() alone is degenerate through the final LN
    # (it removes the mean, so d(sum)/dx ~ 0 and the comparison is noise)
    co_b = jnp.asarray(rng.normal(size=(4, 256, 256)), jnp.float32)

    def fb_fused(x, blk):
        return jnp.sum(fused_block_train(x, blk, mask8b, seed_b, 4,
                                         bcfg.attn_scale,
                                         0.3).astype(jnp.float32) * co_b)

    def fb_ref(x, blk):
        return jnp.sum(block_reference_with_masks(
            x, blk, jnp.asarray(bm2), 77, 4, bcfg.attn_scale,
            0.3).astype(jnp.float32) * co_b)

    gx, gw = jax.grad(fb_fused, argnums=(0, 1))(xtr, block)
    rx, rw = jax.grad(fb_ref, argnums=(0, 1))(xtr, block)
    relx = float(jnp.abs(gx.astype(jnp.float32) - rx.astype(jnp.float32)).max()
                 / jnp.abs(rx.astype(jnp.float32)).max())
    check("fused block train bf16 dx", relx < 5e-2, f"max rel err {relx:.2e}")
    # magnitude floor: db_k is structurally ~0 (softmax ds rows sum to 0),
    # so its "relative" error is cancellation noise — floor each leaf's
    # denominator at 1e-4 of the global grad scale
    g_scale = max(float(jnp.abs(b).max())
                  for b in jax.tree_util.tree_leaves(rw))
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(gw),
                    jax.tree_util.tree_leaves(rw)):
        denom = max(float(jnp.abs(b).max()), 1e-4 * g_scale)
        worst = max(worst, float(jnp.abs(a - b).max()) / denom)
    check("fused block train bf16 dw", worst < 5e-2,
          f"worst rel err {worst:.2e}")

    # grouped kernels (N<512 routes G=1024//N elements per grid cell):
    # grouped and per-element paths must agree on chip, not just in
    # interpret mode (vector layouts differ between the row-batched and
    # tiled lowerings)
    import vidsum_tpu.ops.block_kernel as _bk
    import vidsum_tpu.ops.block_train as _bt

    xg8 = jnp.asarray(rng.normal(size=(8, 128, 256)), jnp.bfloat16)
    bm8 = np.zeros((8, 128), bool)
    bm8[1, 100:] = True
    mask8g = jnp.asarray(bm8.astype(np.int8))[:, None, :]
    seed_g = jnp.asarray([[31]], jnp.int32)
    assert _bt._pick_train_group(8, 128) == 8
    got_g = fused_block_train(xg8, block, mask8g, seed_g, 4, bcfg.attn_scale,
                              0.3).astype(jnp.float32)
    co_g = jnp.asarray(rng.normal(size=(8, 128, 256)), jnp.float32)
    gx_g, gw_g = jax.grad(
        lambda x_, blk: jnp.sum(fused_block_train(
            x_, blk, mask8g, seed_g, 4, bcfg.attn_scale,
            0.3).astype(jnp.float32) * co_g), argnums=(0, 1))(xg8, block)
    _orig_pick = _bt._pick_train_group
    _bt._pick_train_group = lambda B_, N_: 1
    _bt._forward.clear_cache()
    _bt._backward.clear_cache()
    try:
        got_e = fused_block_train(xg8, block, mask8g, seed_g, 4,
                                  bcfg.attn_scale, 0.3).astype(jnp.float32)
        gx_e, gw_e = jax.grad(
            lambda x_, blk: jnp.sum(fused_block_train(
                x_, blk, mask8g, seed_g, 4, bcfg.attn_scale,
                0.3).astype(jnp.float32) * co_g), argnums=(0, 1))(xg8, block)
    finally:
        _bt._pick_train_group = _orig_pick
        _bt._forward.clear_cache()
        _bt._backward.clear_cache()
    dfg = float(jnp.abs(got_g - got_e).max())
    check("grouped train kernel fwd == per-element on chip", dfg < 0.1,
          f"max diff {dfg:.2e}")
    relg = float(jnp.abs(gx_g.astype(jnp.float32)
                         - gx_e.astype(jnp.float32)).max()
                 / jnp.abs(gx_e.astype(jnp.float32)).max())
    check("grouped train kernel dx == per-element on chip", relg < 5e-2,
          f"max rel err {relg:.2e}")
    gws = max(float(jnp.abs(b).max())
              for b in jax.tree_util.tree_leaves(gw_e))
    worst_g = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(gw_g),
                    jax.tree_util.tree_leaves(gw_e)):
        denom = max(float(jnp.abs(b).max()), 1e-4 * gws)
        worst_g = max(worst_g, float(jnp.abs(a - b).max()) / denom)
    check("grouped train kernel dw == per-element on chip", worst_g < 5e-2,
          f"worst rel err {worst_g:.2e}")

    # int8 fused block (W8A8, ops/block_kernel_int8.py): the Mosaic int8
    # lowering on chip vs the dense int8 reference (same quantizer; bounds
    # are the quantization noise floor — see tests/test_quant.py on why
    # bit-equality across separately-compiled programs is not pinnable),
    # and the whole quantized scorer's closeness to the f32 scorer.
    from vidsum_tpu.models.simnet import simnet_apply as _apply_i8

    icfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.0,
                       compute_dtype="bfloat16")
    ip = init_simnet(jax.random.PRNGKey(11), icfg)
    for bi, ni in ((8, 128), (4, 512)):  # grouped + per-element kernels
        xi = jnp.asarray(rng.normal(size=(bi, ni, 1024)), jnp.float32)
        li = rng.integers(ni // 2, ni + 1, size=bi)
        mi = jnp.asarray(np.arange(ni)[None] >= li[:, None])
        s_d, _ = _apply_i8(ip, icfg, xi, mi, deterministic=True,
                           attn_impl="int8_xla")
        s_k, _ = _apply_i8(ip, icfg, xi, mi, deterministic=True,
                           attn_impl="int8_block")
        s_f, _ = _apply_i8(ip, icfg, xi, mi, deterministic=True,
                           attn_impl="xla")
        dk = np.abs(np.asarray(s_k - s_d, np.float32))
        check(f"int8 kernel == dense int8 ref on chip (B={bi},N={ni})",
              float(np.median(dk)) < 5e-3 and float(dk.max()) < 5e-2,
              f"median {float(np.median(dk)):.2e} max {float(dk.max()):.2e}")
        d8 = np.abs(np.asarray(
            jax.nn.sigmoid(s_k[..., 0]) - jax.nn.sigmoid(s_f[..., 0]),
            np.float32))[~np.asarray(mi)]
        check(f"int8 scorer close to f32 on chip (B={bi},N={ni})",
              float(np.median(d8)) < 2e-2 and float(d8.max()) < 1.5e-1,
              f"median {float(np.median(d8)):.2e} max {float(d8.max()):.2e}")

    # on-device eval (eval_impl='device'): golden parity + measured latency
    import time as _time

    from vidsum_tpu.ops.device_eval import device_generate_summary
    from vidsum_tpu.ops.summary import generate_summary

    rng2 = np.random.default_rng(123)
    videos = []
    for _ in range(8):
        n_picks = int(rng2.integers(40, 150))
        stp = int(rng2.integers(10, 20))
        picks = np.arange(n_picks) * stp
        n_frames = int(picks[-1] + rng2.integers(1, stp + 1))
        scores = rng2.random(n_picks).astype(np.float32)
        n_shots = int(rng2.integers(5, 15))
        cuts = np.sort(rng2.choice(np.arange(1, n_frames), n_shots - 1,
                                   replace=False))
        bounds = np.concatenate([[0], cuts, [n_frames]])
        cp = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
        videos.append((picks, n_frames, scores, cp))
    args = ([v[3] for v in videos], [v[2] for v in videos],
            [v[1] for v in videos], [v[0] for v in videos])
    host = generate_summary(*args)
    dev = device_generate_summary(*args)  # compiles
    same = all(np.array_equal(h, d) for h, d in zip(host, dev))
    check("device eval == host eval (8 videos)", same)
    t0 = _time.perf_counter()
    device_generate_summary(*args)
    t_dev = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    generate_summary(*args)
    t_host = _time.perf_counter() - t0
    print(f"[smoke-timing] device eval {t_dev*1e3:.1f} ms vs host C++ "
          f"{t_host*1e3:.1f} ms for 8 videos — wall clock incl. tunnel "
          f"RPC, NOT a benchmark (device path trades latency for on-chip "
          f"residency; host stays the oracle)")

    # production-path selection equality (ADVICE r2 #1): the TPU scoring
    # pipeline runs the bf16 fused block kernel while the 40k-video parity
    # fuzz covers the CPU XLA impl — verify on-chip that pallas_block
    # scores feed the knapsack into the SAME shot selections as xla scores
    # for the same videos (score deltas ~1e-3 vs typical shot-score gaps
    # ~1e-2; a selection flip here would mean the deployed path diverges
    # from the fuzz-validated one on real inputs)
    from vidsum_tpu.train.steps import make_eval_forward

    cfg_sel = ModelConfig(d_model=256, num_heads=4, num_layers=4,
                          dropout=0.0, compute_dtype="bfloat16")
    p_sel = init_simnet(jax.random.PRNGKey(8), cfg_sel)
    rng3 = np.random.default_rng(99)
    sel_diff = 0
    summaries = {}
    for impl in ("xla", "pallas_block"):
        fwd_sel = make_eval_forward(cfg_sel, attn_impl=impl)
        sb_l, sc_l, nf_l, pk_l = [], [], [], []
        for vi in range(8):
            rv = np.random.default_rng(1000 + vi)
            n = 256
            feats = jnp.asarray(rv.normal(size=(1, n, 1024)), jnp.float32)
            msk = jnp.zeros((1, n), bool)
            sc = np.asarray(fwd_sel(p_sel, feats, msk))[0]
            picks = np.arange(n) * 15
            nf = int(picks[-1] + 8)
            cuts = np.sort(rv.choice(np.arange(1, nf), 12, replace=False))
            bounds = np.concatenate([[0], cuts, [nf]])
            cp = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
            sb_l.append(cp); sc_l.append(sc); nf_l.append(nf)
            pk_l.append(picks)
        summaries[impl] = generate_summary(sb_l, sc_l, nf_l, pk_l)
    sel_diff = sum(not np.array_equal(a, b) for a, b in
                   zip(summaries["xla"], summaries["pallas_block"]))
    check("bf16 fused-path selections == xla-path selections (8 videos)",
          sel_diff == 0, f"{sel_diff} differing summaries")

    # backbone golden features on the real chip (converter + XLA convs must
    # reproduce the committed fp64 torch-mirror goldens at f32 tolerance)
    goldens = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "backbone_goldens.npz")
    if os.path.exists(goldens):
        import torch

        from tests.torch_mirrors import GoogLeNetMirror, randomize_bn_stats
        from vidsum_tpu.preprocess.googlenet import (
            googlenet_apply, googlenet_from_torch_state,
        )

        g = np.load(goldens)
        torch.manual_seed(0)
        mirror = GoogLeNetMirror().eval()
        randomize_bn_stats(mirror, 1)
        gp = googlenet_from_torch_state(
            {k2: v2.numpy() for k2, v2 in mirror.state_dict().items()})
        xg = np.transpose(g["google_in"], (0, 2, 3, 1)).astype(np.float32)
        feats = np.asarray(googlenet_apply(gp, jnp.asarray(xg)))
        gdiff = np.abs(feats - g["google_pool5"]).max()
        check("googlenet pool5 golden on chip", gdiff < 5e-3,
              f"max diff {gdiff:.2e}")
        # BN-folded production path: same golden, same tolerance
        from vidsum_tpu.preprocess.googlenet import fold_googlenet

        feats_f = np.asarray(googlenet_apply(fold_googlenet(gp),
                                             jnp.asarray(xg)))
        fdiff = np.abs(feats_f - g["google_pool5"]).max()
        check("googlenet pool5 golden FOLDED on chip", fdiff < 5e-3,
              f"max diff {fdiff:.2e}")

    # sequence-parallel TRAIN step on the real chip (ring of 1 on a single
    # device: the jax.checkpoint + scan + ppermute + hash-dropout machinery
    # must compile and execute on the TPU runtime; the loss must match a
    # dense step injecting the same hash masks, as in tests/test_seq_train)
    from jax.sharding import Mesh
    from vidsum_tpu.config import ModelConfig as _MC
    from vidsum_tpu.models.simnet import init_simnet as _init
    from vidsum_tpu.parallel.seq_forward import make_seq_sharded_finetune_step
    from vidsum_tpu.train.steps import make_optimizer as _mo

    cfg_s = _MC(d_model=64, num_heads=4, num_layers=2, dropout=0.3,
                max_len=128)
    mesh_s = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                  ("data", "seq"))
    opt_s = _mo(1e-3, 1e-4)
    ps = _init(jax.random.PRNGKey(0), cfg_s)
    rng_s = np.random.default_rng(7)
    xs = jnp.asarray(rng_s.normal(size=(2, 64, 1024)), jnp.float32)
    ts = jnp.asarray(rng_s.random((2, 64)), jnp.float32)
    ms = jnp.zeros((2, 64), bool)
    step_s = make_seq_sharded_finetune_step(cfg_s, opt_s, mesh_s)
    _, _, loss_s = step_s(ps, opt_s.init(_init(jax.random.PRNGKey(0), cfg_s)),
                          xs, ts, ms, jax.random.PRNGKey(1))
    loss_s = float(loss_s)
    check("seq-parallel train step runs on chip", np.isfinite(loss_s),
          f"loss {loss_s:.5f}")

    # fused ring-step kernel vs the flash kernel at stretch length
    from vidsum_tpu.parallel.ring_attention import make_ring_forward

    rng_r = np.random.default_rng(11)
    Nr = 2560
    qr, kr, vr = (jnp.asarray(rng_r.normal(size=(2, 4, Nr, 64)), jnp.float32)
                  for _ in range(3))
    mr = jnp.asarray((np.arange(Nr)[None, :] >= 2400)
                     * np.ones((2, 1), bool))
    ring_p = make_ring_forward(mesh_s, 0.125, block_impl="pallas")
    out_p = np.asarray(ring_p(qr, kr, vr, mr))
    out_f = np.asarray(flash_attention(qr, kr, vr, mr, scale=0.125))
    rdiff = np.abs(out_p - out_f).max()
    check("pallas ring-step kernel == flash on chip", rdiff < 5e-3,
          f"max diff {rdiff:.2e} at N={Nr}")

    # bf16 k/v through the fused ring step (ADVICE r1: the in-kernel
    # f32 upcast was only exercised at f32 on real Mosaic) — must stay
    # within bf16 rounding of the all-f32 ring. On chip the diff is
    # exactly 0: the default-precision MXU rounds f32 matmul operands to
    # bf16 anyway, so pre-rounded k/v produce the identical program
    # output (the CPU harness, with true-f32 matmuls, shows ~3.4e-3);
    # the check's value here is that the bf16-input Mosaic compile and
    # execution path works at all
    out_b = np.asarray(ring_p(qr, kr.astype(jnp.bfloat16),
                              vr.astype(jnp.bfloat16), mr))
    bdiff = np.abs(out_b - out_p).max()
    check("pallas ring-step bf16 k/v on chip", bdiff < 5e-2,
          f"max diff vs f32 ring {bdiff:.2e}")

    # fused TRAIN ring (custom VJP, VERDICT r1 #3) vs the XLA ring at
    # stretch length on real Mosaic: forward, dq/dk/dv, and step timing.
    from vidsum_tpu.parallel.ring_attention import ring_attention_train
    from jax.sharding import PartitionSpec as _P

    def ring_train(impl, rate):
        def local(q, k, v, pm):
            return ring_attention_train(q, k, v, pm, 0.125, "seq",
                                        jnp.int32(1234), rate, b0=0,
                                        block_impl=impl)
        return jax.jit(jax.shard_map(
            local, mesh=mesh_s,
            in_specs=(_P(None, None, "seq", None),) * 3 + (_P(None, "seq"),),
            out_specs=_P(None, None, "seq", None), check_vma=False))

    wr = jnp.asarray(rng_r.normal(size=qr.shape), jnp.float32)
    for rate in (0.0, 0.3):
        def lossf(impl):
            f = ring_train(impl, rate)
            return lambda q, k, v: jnp.sum(f(q, k, v, mr) * wr)
        ox = np.asarray(ring_train("xla", rate)(qr, kr, vr, mr))
        op = np.asarray(ring_train("pallas", rate)(qr, kr, vr, mr))
        fdiff = np.abs(op - ox).max()
        check(f"fused train ring fwd rate={rate}", fdiff < 5e-3,
              f"max diff {fdiff:.2e} at N={Nr}")
        gx = jax.grad(lossf("xla"), argnums=(0, 1, 2))(qr, kr, vr)
        gp = jax.grad(lossf("pallas"), argnums=(0, 1, 2))(qr, kr, vr)
        worst = 0.0
        for a, b in zip(gp, gx):
            scale_ref = float(jnp.abs(b).max())
            worst = max(worst, float(jnp.abs(a - b).max()) / max(scale_ref,
                                                                 1e-6))
        # the XLA comparison path itself rounds through the MXU's
        # multi-pass-bf16 f32 matmuls; observed worst 3.9e-3 (rate 0) /
        # 6.4e-3 (rate 0.3, the 1/(1-rate) scale amplifies) — same class
        # as the fused-block bf16 grad tolerances above
        check(f"fused train ring grads rate={rate}", worst < 2e-2,
              f"worst rel {worst:.2e}")

    # timing: grad of sum(out*w) through each ring impl at N=2560
    import time as _t
    for impl in ("xla", "pallas"):
        f = jax.jit(jax.grad(
            (lambda fn: lambda q, k, v: jnp.sum(fn(q, k, v, mr) * wr))(
                ring_train(impl, 0.3)), argnums=(0, 1, 2)))
        jax.block_until_ready(f(qr, kr, vr))  # compile
        reps = 5
        t0 = _t.perf_counter()
        for _ in range(reps):
            out = f(qr, kr, vr)
        np.asarray(out[0])
        dt = (_t.perf_counter() - t0) / reps
        print(f"[smoke-timing] ring-train fwd+bwd {impl}: {dt*1e3:.1f} ms "
              f"(B=2 H=4 N={Nr}, rate 0.3) — wall clock incl. dispatch + "
              f"fetch RPC; the chain-differenced PERF.md ring table is the "
              f"benchmark")

    print("ALL ON-CHIP VALIDATIONS PASSED")


def check_serving() -> None:
    """Serving-path equality on chip (ADVICE r2 #1 treatment extended to
    the serving transport): the ScoringService — bf16 wire, device-stack
    batching, fused block kernels — must produce the same scores and select
    the same shots as the offline eval scorer fed the same videos."""
    assert jax.default_backend() == "tpu", "run on the TPU host"
    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.data.collate import bucket_length
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.ops.summary import generate_summary
    from vidsum_tpu.serve import ScoringService
    from vidsum_tpu.train.steps import make_eval_forward

    rng = np.random.default_rng(11)
    cfg = ModelConfig(compute_dtype="bfloat16")
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    lengths = [100, 250, 320, 450, 512, 512, 700, 90]
    videos = [rng.normal(size=(n, cfg.in_features)).astype(np.float32)
              for n in lengths]

    fwd = make_eval_forward(cfg, attn_impl="pallas_block")

    def offline(v):
        n = v.shape[0]
        nb = bucket_length(n, 128)
        x = np.full((1, nb, cfg.in_features), 1000.0, np.float32)
        m = np.ones((1, nb), bool)
        x[0, :n] = v
        m[0, :n] = False
        return np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(m)),
                          np.float32)[0, :n]

    with ScoringService(params, cfg, max_batch=8, max_delay_ms=300.0) as svc:
        futs = [svc.submit(v, want_summary=False) for v in videos]
        served = [f.result(timeout=600).scores for f in futs]
        st = svc.stats()
    assert st.batches < len(videos), "window did not batch — check not valid"
    worst = 0.0
    n_sel_eq = 0
    for v, s in zip(videos, served):
        o = offline(v)
        n = v.shape[0]
        worst = max(worst, float(np.abs(s - o).max()))
        # ~12 shots of uneven length so the knapsack has real choices
        edges = np.unique(np.linspace(0, n, 13).astype(np.int64))
        cps = np.stack([edges[:-1], edges[1:] - 1], axis=1)
        picks = np.arange(n)
        [sum_s] = generate_summary([cps], [s], [n], [picks])
        [sum_o] = generate_summary([cps], [o], [n], [picks])
        n_sel_eq += int(np.array_equal(sum_s, sum_o))
    # served bf16-wire rows equal the offline path's in-model bf16 cast
    # (round-to-nearest both ways); kernels are row-independent, so scores
    # should be bit-close — tolerance covers grouped-kernel tiling variants
    check("serving scores vs offline pallas_block", worst < 2e-3,
          f"max |diff| {worst:.2e} over {len(videos)} videos "
          f"({st.batches} batches)")
    check("serving shot selection vs offline",
          n_sel_eq == len(videos), f"{n_sel_eq}/{len(videos)} equal")


if __name__ == "__main__":
    if "--serve-only" in sys.argv:
        check_serving()
    else:
        main()
        check_serving()
