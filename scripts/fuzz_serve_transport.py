"""Serve-transport differential fuzz (VERDICT r3 #5b): thousands of videos
through ``ScoringService.submit()`` on the CPU harness — mixed lengths,
random burst composition, non-mesh AND mesh (replica + ring) services —
asserting the served outputs equal the host oracle:

- short/replica routes: served scores BIT-equal the offline solo scorer
  (``make_eval_forward`` on the bucket-padded video — batching must be
  invisible), and the served summary bit-equals ``generate_summary``
  composed on those scores (the bit-parity host pipeline);
- ring route (mesh, past long_threshold): scores match the solo scorer to
  2e-4 (the ring's reduction order differs from dense attention — same
  tolerance as tests/test_serve.py), and the summary bit-equals the host
  composition of the SERVED scores (selection arithmetic is exact);
- int8 wires (single-chip AND mesh-replica): scores within the measured
  input-quantization tolerance (2e-2) of the lossless solo scorer;
  ring-routed longs on the mesh_int8 service stay lossless (2e-4);
- overload interleave (VERDICT r4 #7): one service with a tight
  max_queue_depth and a wide batching window takes bursts past the bound —
  when a burst lands inside the window (nothing completed mid-burst),
  admitted must be ≤ the depth bound and the overflow rejected; admitted
  requests complete with full parity and no admission slot leaks.

Usage:
    python scripts/fuzz_serve_transport.py [--n 3000] [--seed 0]

Prints one JSON line (PARITY.md record format). CPU-only by design: it
forces the CPU backend with 8 virtual devices for the mesh service.
"""

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           " --xla_cpu_collective_call_terminate_timeout_"
                           "seconds=900").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from vidsum_tpu.config import ModelConfig  # noqa: E402
from vidsum_tpu.data.collate import bucket_length  # noqa: E402
from vidsum_tpu.models import init_simnet  # noqa: E402
from vidsum_tpu.ops.summary import generate_summary  # noqa: E402
from vidsum_tpu.serve import ScoringService  # noqa: E402
from vidsum_tpu.train.steps import make_eval_forward  # noqa: E402

CFG = ModelConfig(in_features=32, d_model=64, num_heads=4, num_layers=2,
                  dropout=0.0, max_len=4096)
LONG_THRESHOLD = 256
RING_GRANULE = 128 * 8
OVERLOAD_DEPTH = 8


def _random_request(rng):
    """One video: features + the eval-input quirk surface of the reference
    (tests/test_reference_differential._random_video, feature-ized)."""
    kind = int(rng.integers(0, 10))
    if kind == 0:        # ring-route length (mesh service only)
        n = int(rng.integers(LONG_THRESHOLD + 1, 1200))
    else:
        n = int(rng.integers(4, 400))
    feats = rng.normal(size=(n, CFG.in_features)).astype(np.float32)
    step = int(rng.integers(1, 20))
    picks = np.arange(n, dtype=np.int64) * step
    n_frames = int(picks[-1] + rng.integers(1, step + 1))
    if kind == 1:        # exact_end
        n_frames = max(1, int(picks[-1]))
    elif kind == 2:      # overhang: picks beyond n_frames
        n_frames = max(1, int(picks[-1] - rng.integers(0, step + 1)))
    want_summary = kind != 3
    budget = float(rng.choice([0.15, 0.15, 0.05, 0.3]))
    cps = None
    if want_summary and (kind != 4 or n > 100):
        # explicit shot bounds (the DSNet layout); kind==4 & small n leaves
        # cps=None to exercise the auto-KTS path end-to-end
        n_shots = int(rng.integers(1, 16))
        n_cuts = min(n_shots - 1, max(0, n_frames - 1))
        cuts = (np.sort(rng.choice(np.arange(1, n_frames), n_cuts,
                                   replace=False))
                if n_cuts else np.array([], np.int64))
        bounds = np.concatenate([[0], cuts, [n_frames]])
        cps = np.stack([bounds[:-1], bounds[1:] - 1], axis=1).astype(np.int64)
    return dict(feats=feats, picks=picks, n_frames=n_frames, cps=cps,
                want_summary=want_summary, budget=budget)


class _Oracle:
    """The offline solo scorer: one bucket-padded video at a time."""

    def __init__(self, params, granule):
        self._fwd = make_eval_forward(CFG, attn_impl="xla")
        self._params = params
        self._granule = granule

    def scores(self, feats):
        n = feats.shape[0]
        nb = bucket_length(n, self._granule(n))
        x = np.full((1, nb, CFG.in_features), 1000.0, np.float32)
        mask = np.ones((1, nb), bool)
        x[0, :n] = feats
        mask[0, :n] = False
        return np.asarray(self._fwd(self._params, jnp.asarray(x),
                                    jnp.asarray(mask)))[0, :n]


def _check(req, res, oracle, mism, ring: bool, lossy: bool = False):
    want_scores = oracle.scores(req["feats"])
    if ring:
        # ring-routed requests ride the LOSSLESS wire on every flavor
        # (int8 is a short-request optimization), so the ring tolerance
        # applies unchanged even on the mesh_int8 service
        if not np.allclose(res.scores, want_scores, rtol=2e-4, atol=2e-4):
            mism["ring_scores"] += 1
    elif lossy:
        # int8 wire: input quantization error only (PERF.md "int8 wire")
        if np.max(np.abs(res.scores - want_scores)) >= 2e-2:
            mism["int8_scores"] += 1
    elif not np.array_equal(res.scores, want_scores):
        mism["scores"] += 1
    if req["want_summary"]:
        # host-pipeline composition on the SERVED scores must be bit-equal
        cps = req["cps"] if req["cps"] is not None else res.change_points
        [want] = generate_summary([cps], [res.scores], [req["n_frames"]],
                                  [req["picks"]], budget_ratio=req["budget"])
        if not np.array_equal(res.summary, want):
            mism["summary"] += 1
        if req["cps"] is not None and not np.array_equal(
                res.change_points, req["cps"]):
            mism["summary"] += 1
    elif res.summary is not None:
        mism["summary"] += 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    params = init_simnet(jax.random.PRNGKey(7), CFG)

    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("a", "b"))
    services = {
        "plain": ScoringService(params, CFG, max_batch=8, max_delay_ms=2.0),
        "tight": ScoringService(params, CFG, max_batch=2, max_delay_ms=0.0,
                                selection_workers=1),
        "mesh": ScoringService(params, CFG, mesh=mesh, max_batch=16,
                               max_delay_ms=2.0,
                               long_threshold=LONG_THRESHOLD),
        # round-4 transports: coalesced is bit-parity (same programs as
        # rows mode); int8 is lossy-by-design (tolerance check)
        "coalesced": ScoringService(params, CFG, max_batch=8,
                                    max_delay_ms=2.0,
                                    wire_mode="coalesced"),
        "int8": ScoringService(params, CFG, max_batch=8, max_delay_ms=2.0,
                               wire_dtype="int8"),
        # round-5: int8 wire composed with mesh replica mode (per-replica
        # on-device dequant; ring-routed longs stay lossless)
        "mesh_int8": ScoringService(params, CFG, mesh=mesh, max_batch=16,
                                    max_delay_ms=2.0,
                                    long_threshold=LONG_THRESHOLD,
                                    wire_dtype="int8"),
        # round-5 overload interleave: a tight admission bound with a wide
        # batching window, so bursts past the bound deterministically
        # reject while admitted requests still complete with parity
        "overload": ScoringService(params, CFG, max_batch=32,
                                   max_delay_ms=250.0,
                                   max_queue_depth=OVERLOAD_DEPTH),
    }
    # short routes bucket at 128; the mesh ring buckets at 128*8
    oracle_short = _Oracle(params, lambda n: 128)
    oracle_ring = _Oracle(params, lambda n: RING_GRANULE)

    from vidsum_tpu.serve import ServiceOverloaded

    mism = {"scores": 0, "ring_scores": 0, "int8_scores": 0, "summary": 0,
            "errors": 0, "overload_leaks": 0}
    checked = {"plain": 0, "tight": 0, "mesh": 0, "ring": 0,
               "coalesced": 0, "int8": 0, "mesh_int8": 0, "overload": 0}
    rejected_total = 0
    overload_bursts_verified = 0

    done = 0
    names = ("plain", "tight", "mesh", "coalesced", "int8", "mesh_int8",
             "overload")
    while done < args.n:
        burst = int(rng.integers(1, 33))
        burst = min(burst, args.n - done)
        name = names[int(rng.integers(0, len(names)))]
        svc = services[name]
        mesh_like = name in ("mesh", "mesh_int8")
        reqs, futs = [], []
        t_burst0 = time.monotonic()
        for _ in range(burst):
            r = _random_request(rng)
            if not mesh_like and r["feats"].shape[0] > LONG_THRESHOLD:
                r["feats"] = r["feats"][:LONG_THRESHOLD]
                r["picks"] = r["picks"][:LONG_THRESHOLD]
            reqs.append(r)
            try:
                futs.append(svc.submit(
                    r["feats"], picks=r["picks"], n_frames=r["n_frames"],
                    change_points=r["cps"], want_summary=r["want_summary"],
                    budget_ratio=r["budget"]))
            except ServiceOverloaded:
                if name != "overload":
                    raise   # only the bounded service may reject
                rejected_total += 1
                futs.append(None)
        t_burst = time.monotonic() - t_burst0
        n_rej = sum(f is None for f in futs)
        if name == "overload" and t_burst < 0.2:
            # the whole burst landed inside the 250 ms batching window, so
            # nothing completed mid-burst: admissions are bounded by the
            # depth and the overflow MUST have been rejected
            if burst - n_rej > OVERLOAD_DEPTH:
                mism["overload_leaks"] += 1
            overload_bursts_verified += 1
        for r, f in zip(reqs, futs):
            if f is None:
                continue
            try:
                res = f.result(timeout=900)
            except Exception as e:  # noqa: BLE001 — a fuzz failure is data
                print(f"request failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                mism["errors"] += 1
                continue
            ring = (mesh_like and r["feats"].shape[0] > LONG_THRESHOLD)
            _check(r, res, oracle_ring if ring else oracle_short, mism,
                   ring, lossy=(name in ("int8", "mesh_int8") and not ring))
            checked[name] += 1
            checked["ring"] += int(ring)
        if name == "overload" and svc._inflight != 0:
            mism["overload_leaks"] += 1   # admission slot leaked
        done += burst
        if done % 500 < burst:
            print(f"... {done}/{args.n} ({time.time() - t0:.0f}s)",
                  file=sys.stderr)

    for svc in services.values():
        svc.close()
    print(json.dumps({"checked": checked, "mismatches": mism,
                      "rejected": rejected_total,
                      "overload_bursts_verified": overload_bursts_verified,
                      "seconds": round(time.time() - t0, 1),
                      "seed": args.seed}))
    return 1 if any(mism.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
