"""Serving engine: micro-batched scoring must be indistinguishable from the
offline pipeline (same scores, same selected shots), batching must actually
batch, and the HTTP front-end must round-trip the protocol."""

import io
import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.data.collate import bucket_length
from vidsum_tpu.models import init_simnet
from vidsum_tpu.ops.kts import change_points_from_cps, kts_segmentation
from vidsum_tpu.ops.summary import generate_summary
from vidsum_tpu.serve import ScoringService
from vidsum_tpu.train.steps import make_eval_forward

CFG = ModelConfig(in_features=32, d_model=64, num_heads=4, num_layers=2,
                  dropout=0.0, max_len=512)


@pytest.fixture(scope="module")
def params():
    return init_simnet(jax.random.PRNGKey(0), CFG)


def _video(rng, n):
    return rng.normal(size=(n, CFG.in_features)).astype(np.float32)


def _solo_scores(params, feats):
    """Reference path: the offline batched val scorer on a batch of one."""
    n = feats.shape[0]
    nb = bucket_length(n, 128)
    x = np.full((1, nb, CFG.in_features), 1000.0, np.float32)
    mask = np.ones((1, nb), bool)
    x[0, :n] = feats
    mask[0, :n] = False
    fwd = make_eval_forward(CFG, attn_impl="xla")
    return np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(mask)))[0, :n]


def test_batched_scores_match_solo_eval_path(params):
    rng = np.random.default_rng(0)
    lengths = [37, 100, 128, 250, 256, 300]
    videos = [_video(rng, n) for n in lengths]
    with ScoringService(params, CFG, max_batch=8, max_delay_ms=200.0) as svc:
        futs = [svc.submit(v, want_summary=False) for v in videos]
        results = [f.result(timeout=120) for f in futs]
        st = svc.stats()
    for v, r in zip(videos, results):
        assert r.scores.shape == (v.shape[0],)
        assert r.summary is None
        # bit-exact: no op in the scorer mixes batch rows, so batch
        # composition (including the repeated pad rows) cannot perturb a
        # video's scores
        np.testing.assert_array_equal(r.scores, _solo_scores(params, v))
    assert st.completed == len(videos) and st.failed == 0
    # masked/repeated pad rows never leak: scores are probabilities
    for r in results:
        assert np.all((r.scores > 0) & (r.scores < 1))


def test_int8_scorer_serves(params):
    """attn_impl='int8_xla' plumbs through the service: scores match the
    solo int8 forward (tolerance, not array_equal: the B=1 and batched
    programs compile separately, and XLA fusion differences can flip a
    quantization code — tests/test_quant.py explains the noise floor)."""
    rng = np.random.default_rng(5)
    lengths = [37, 128, 250]
    videos = [_video(rng, n) for n in lengths]
    fwd8 = make_eval_forward(CFG, attn_impl="int8_xla")
    with ScoringService(params, CFG, attn_impl="int8_xla", max_batch=4,
                        max_delay_ms=200.0) as svc:
        futs = [svc.submit(v, want_summary=False) for v in videos]
        results = [f.result(timeout=120) for f in futs]
        assert svc.stats().failed == 0
    for v, r in zip(videos, results):
        n = v.shape[0]
        nb = bucket_length(n, 128)
        x = np.full((1, nb, CFG.in_features), 1000.0, np.float32)
        mask = np.ones((1, nb), bool)
        x[0, :n] = v
        mask[0, :n] = False
        solo = np.asarray(fwd8(params, jnp.asarray(x),
                               jnp.asarray(mask)))[0, :n]
        d = np.abs(r.scores - solo)
        assert float(np.median(d)) < 5e-3 and float(d.max()) < 5e-2


def test_window_actually_batches_same_bucket(params):
    rng = np.random.default_rng(1)
    videos = [_video(rng, 64 + i) for i in range(8)]  # all bucket-128
    with ScoringService(params, CFG, max_batch=8, max_delay_ms=500.0) as svc:
        futs = [svc.submit(v, want_summary=False) for v in videos]
        for f in futs:
            f.result(timeout=120)
        st = svc.stats()
    # the 500 ms window must have grouped them: far fewer batches than
    # requests, and at least one real multi-request batch
    assert st.batches < len(videos)
    assert max(st.batch_hist) >= 2
    assert st.rows_scored == len(videos)


def test_summary_matches_offline_composition(params):
    rng = np.random.default_rng(2)
    n, n_frames = 80, 400
    feats = _video(rng, n)
    picks = np.arange(n, dtype=np.int64) * 5
    cps = np.asarray([[0, 99], [100, 249], [250, 399]], np.int64)
    with ScoringService(params, CFG, max_delay_ms=0.0) as svc:
        res = svc.summarize(feats, picks=picks, n_frames=n_frames,
                            change_points=cps)
    [want] = generate_summary([cps], [res.scores], [n_frames], [picks],
                              budget_ratio=0.15)
    np.testing.assert_array_equal(res.summary, want)
    assert res.n_frames == n_frames
    np.testing.assert_array_equal(res.change_points, cps)


def test_auto_kts_matches_pipeline_finish(params):
    """No change_points given -> the service segments exactly like
    pipeline._finish_video (float64 gram, ncp=n//25, scaled bounds)."""
    rng = np.random.default_rng(3)
    n, n_frames = 60, 181
    feats = _video(rng, n)
    picks = np.round(np.arange(n) * n_frames / n).astype(np.int64)
    with ScoringService(params, CFG, max_delay_ms=0.0) as svc:
        res = svc.summarize(feats, picks=picks, n_frames=n_frames)
    g = feats.astype(np.float64)
    cps, _ = kts_segmentation(g @ g.T, max(n // 25, 1), vmax=1.0)
    bounds = change_points_from_cps(cps, n)
    ratio = n_frames / n
    starts = np.round(bounds[:, 0] * ratio).astype(np.int64)
    ends = np.concatenate([starts[1:] - 1, [n_frames - 1]])
    want_cps = np.stack([starts, ends], axis=1)
    np.testing.assert_array_equal(res.change_points, want_cps)
    [want] = generate_summary([want_cps], [res.scores], [n_frames], [picks],
                              budget_ratio=0.15)
    np.testing.assert_array_equal(res.summary, want)


def test_submit_validation(params):
    with ScoringService(params, CFG, max_delay_ms=0.0) as svc:
        with pytest.raises(ValueError, match="features must be"):
            svc.submit(np.zeros((4, CFG.in_features + 1), np.float32))
        with pytest.raises(ValueError, match="empty"):
            svc.submit(np.zeros((0, CFG.in_features), np.float32))
        with pytest.raises(ValueError, match="picks is required"):
            svc.submit(np.zeros((4, CFG.in_features), np.float32),
                       n_frames=100)
        with pytest.raises(ValueError, match="one entry per"):
            svc.submit(np.zeros((4, CFG.in_features), np.float32),
                       picks=np.arange(3))
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(np.zeros((4, CFG.in_features), np.float32))


def test_close_drains_pending(params):
    rng = np.random.default_rng(4)
    svc = ScoringService(params, CFG, max_batch=4, max_delay_ms=50.0)
    futs = [svc.submit(_video(rng, 50), want_summary=False)
            for _ in range(6)]
    svc.close()
    for f in futs:
        assert f.result(timeout=60).scores.shape == (50,)


def test_warmup_resets_stats(params):
    with ScoringService(params, CFG, max_batch=4, max_delay_ms=0.0) as svc:
        svc.warmup(lengths=(128,), batch_sizes=(1, 2))
        st = svc.stats()
        assert st.requests == 0 and st.batches == 0
        assert st.latency_p50_s == 0.0


def test_warmup_respects_admission_bound(params):
    """warmup() must not trip the service's own max_queue_depth: it caps
    the concurrent warm submits at the depth bound (a batch wider than the
    bound can never assemble in production anyway) instead of raising
    ServiceOverloaded at itself."""
    with ScoringService(params, CFG, max_batch=8, max_delay_ms=0.0,
                        max_queue_depth=2) as svc:
        warmed = svc.warmup(lengths=(128,), batch_sizes=(1, 8))
        assert [(n, b) for n, b, _ in warmed] == [(128, 1), (128, 2)]
        st = svc.stats()
        assert st.rejected == 0
        # the service still serves normally afterwards
        rng = np.random.default_rng(23)
        v = _video(rng, 50)
        np.testing.assert_array_equal(
            svc.summarize(v, want_summary=False).scores,
            _solo_scores(params, v))


def test_http_roundtrip(params):
    from vidsum_tpu.serve_http import make_server, run_in_thread

    rng = np.random.default_rng(5)
    feats = _video(rng, 70)
    with ScoringService(params, CFG, max_delay_ms=0.0) as svc:
        server = make_server(svc, port=0)
        run_in_thread(server)
        host, port = server.server_address
        try:
            buf = io.BytesIO()
            np.savez(buf, features=feats)
            req = urllib.request.Request(
                f"http://{host}:{port}/summarize", data=buf.getvalue(),
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                out = json.loads(resp.read())
            want = svc.summarize(feats)
            np.testing.assert_allclose(out["scores"], want.scores,
                                       rtol=0, atol=1e-6)
            assert out["summary_frames"] == np.nonzero(want.summary)[0].tolist()
            assert out["n_frames"] == 70

            with urllib.request.urlopen(
                    f"http://{host}:{port}/healthz", timeout=30) as resp:
                assert json.loads(resp.read()) == {"ok": True}
            with urllib.request.urlopen(
                    f"http://{host}:{port}/stats", timeout=30) as resp:
                st = json.loads(resp.read())
            assert st["completed"] >= 2 and st["failed"] == 0

            # malformed payload -> 400, not a dead server
            bad = urllib.request.Request(
                f"http://{host}:{port}/summarize", data=b"not npz",
                method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 400
        finally:
            server.shutdown()


def test_http_no_summary_flag(params):
    from vidsum_tpu.serve_http import make_server, run_in_thread

    rng = np.random.default_rng(6)
    feats = _video(rng, 40)
    with ScoringService(params, CFG, max_delay_ms=0.0) as svc:
        server = make_server(svc, port=0)
        run_in_thread(server)
        host, port = server.server_address
        try:
            buf = io.BytesIO()
            np.savez(buf, features=feats)
            req = urllib.request.Request(
                f"http://{host}:{port}/summarize?summary=0",
                data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                out = json.loads(resp.read())
            assert "summary_frames" not in out
            assert len(out["scores"]) == 40
        finally:
            server.shutdown()


# ---------------------------------------------------------------- mesh mode

def _mesh8():
    from jax.sharding import Mesh

    # axis names are deliberately arbitrary: the service uses the device
    # SET (flattened) — short requests replica-parallel over all 8, long
    # requests sequence-parallel over all 8
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "seq"))


def test_mesh_replica_scores_match_solo(params):
    """Replica-parallel batches (shard_map over 8 devices, rows committed
    round-robin at submit) score each video identically to the offline
    single-device scorer."""
    rng = np.random.default_rng(10)
    lengths = [37, 100, 128, 250, 256, 300, 64, 90, 128, 200, 47, 130, 77]
    videos = [_video(rng, n) for n in lengths]
    with ScoringService(params, CFG, mesh=_mesh8(), max_batch=16,
                        max_delay_ms=200.0) as svc:
        futs = [svc.submit(v, want_summary=False) for v in videos]
        results = [f.result(timeout=300) for f in futs]
        st = svc.stats()
    for v, r in zip(videos, results):
        assert r.scores.shape == (v.shape[0],)
        np.testing.assert_allclose(r.scores, _solo_scores(params, v),
                                   rtol=1e-6, atol=1e-7)
    assert st.completed == len(videos) and st.failed == 0
    assert st.long_requests == 0
    # every batch is padded to a multiple of the replica count (8)
    assert st.rows_scored + st.rows_padded >= st.batches * 8


def test_mesh_rebalance_accounting(params):
    """Submitting one bucket-128 video between bucket-256 videos skews the
    round-robin assignment within each bucket group; the dispatcher must
    still form balanced shards (rebalanced rows show up in rows_moved, and
    every video's scores stay correct)."""
    rng = np.random.default_rng(11)
    videos = [_video(rng, 64), _video(rng, 200), _video(rng, 70),
              _video(rng, 220), _video(rng, 90)]
    with ScoringService(params, CFG, mesh=_mesh8(), max_batch=16,
                        max_delay_ms=200.0) as svc:
        futs = [svc.submit(v, want_summary=False) for v in videos]
        results = [f.result(timeout=300) for f in futs]
        st = svc.stats()
    for v, r in zip(videos, results):
        np.testing.assert_allclose(r.scores, _solo_scores(params, v),
                                   rtol=1e-6, atol=1e-7)
    assert st.failed == 0 and st.completed == len(videos)


def test_mesh_long_request_routes_to_ring(params):
    """A request past long_threshold takes the sequence-parallel ring over
    all 8 devices and matches the dense single-device forward; short
    requests in the same window still batch normally."""
    cfg = ModelConfig(in_features=32, d_model=64, num_heads=4, num_layers=2,
                      dropout=0.0, max_len=2048)
    prm = init_simnet(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(12)
    long_feats = rng.normal(size=(700, 32)).astype(np.float32)
    short_feats = rng.normal(size=(90, 32)).astype(np.float32)
    with ScoringService(prm, cfg, mesh=_mesh8(), long_threshold=256,
                        max_delay_ms=100.0) as svc:
        f_long = svc.submit(long_feats, want_summary=False)
        f_short = svc.submit(short_feats, want_summary=False)
        r_long = f_long.result(timeout=600)
        r_short = f_short.result(timeout=600)
        st = svc.stats()
    assert st.long_requests == 1 and st.failed == 0
    # dense single-device reference on the ring's padded length (8 shards
    # of 128): granule = 128 * 8
    nb = 1024
    x = np.full((1, nb, 32), 1000.0, np.float32)
    mask = np.ones((1, nb), bool)
    x[0, :700] = long_feats
    mask[0, :700] = False
    from vidsum_tpu.models import simnet_apply
    scores, _ = simnet_apply(prm, cfg, jnp.asarray(x), jnp.asarray(mask))
    want = np.asarray(jax.nn.sigmoid(scores[0, :700, 0]), np.float32)
    np.testing.assert_allclose(r_long.scores, want, rtol=2e-4, atol=2e-4)
    assert r_short.scores.shape == (90,)
    assert np.all((r_short.scores > 0) & (r_short.scores < 1))


def test_mesh_long_summary_composition(params):
    """Long route end-to-end with shot selection: the summary equals the
    offline composition of the served scores."""
    cfg = ModelConfig(in_features=32, d_model=64, num_heads=4, num_layers=1,
                      dropout=0.0, max_len=2048)
    prm = init_simnet(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(13)
    n, n_frames = 600, 3000
    feats = rng.normal(size=(n, 32)).astype(np.float32)
    picks = np.arange(n, dtype=np.int64) * 5
    cps = np.asarray([[0, 999], [1000, 1999], [2000, 2999]], np.int64)
    with ScoringService(prm, cfg, mesh=_mesh8(), long_threshold=256,
                        max_delay_ms=0.0) as svc:
        res = svc.summarize(feats, picks=picks, n_frames=n_frames,
                            change_points=cps)
    [want] = generate_summary([cps], [res.scores], [n_frames], [picks],
                              budget_ratio=0.15)
    np.testing.assert_array_equal(res.summary, want)


def test_default_long_threshold_is_single_chip_envelope():
    """With no explicit threshold the routing boundary is the key-folded
    kernel's envelope at the model's head dim and compute dtype."""
    from vidsum_tpu.ops.attention import flash_forward_supported
    from vidsum_tpu.serve import _single_chip_max_len

    # Dh=64 at the flagship's bf16 compute dtype
    cfg = ModelConfig(d_model=256, num_heads=4, compute_dtype="bfloat16")
    n = _single_chip_max_len(cfg, 128)
    assert n % 128 == 0
    # every bucketed length up to the threshold is inside the envelope;
    # the next bucket is the FIRST unsupported one (the envelope is jagged
    # in N because the folded key block must divide N, so the threshold is
    # conservatively the first gap)
    for m in range(128, n + 1, 128 * 64):
        assert flash_forward_supported(m, 64, 2)
    assert flash_forward_supported(n, 64, 2)
    assert not flash_forward_supported(n + 128, 64, 2)
    # the measured single-chip scoring ladder carries 40,960 (PERF.md) —
    # the default threshold must not route those to the ring
    assert n >= 40960


def test_r3d_feature_serving():
    """R3D-18 clip features (512-d, preprocess/r3d.py) serve through the
    same service — only cfg.in_features differs."""
    cfg = ModelConfig(in_features=512, d_model=64, num_heads=4, num_layers=1,
                      dropout=0.0, max_len=256)
    prm = init_simnet(jax.random.PRNGKey(9), cfg)
    rng = np.random.default_rng(14)
    feats = rng.normal(size=(150, 512)).astype(np.float32)
    with ScoringService(prm, cfg, max_delay_ms=0.0) as svc:
        res = svc.submit(feats, want_summary=False).result(timeout=120)
    n = 150
    nb = bucket_length(n, 128)
    x = np.full((1, nb, 512), 1000.0, np.float32)
    mask = np.ones((1, nb), bool)
    x[0, :n] = feats
    mask[0, :n] = False
    fwd = make_eval_forward(cfg, attn_impl="xla")
    want = np.asarray(fwd(prm, jnp.asarray(x), jnp.asarray(mask)))[0, :n]
    np.testing.assert_array_equal(res.scores, want)


# ------------------------------------------------------ admission control
# (VERDICT r3 #1 / ADVICE r3: bounded queue, deadlines, submit-time length
# rejection, cancelled-future and close-timeout robustness)

def _stalled_service(params, max_queue_depth, **kw):
    """A service whose dispatcher is parked filling a huge batching window:
    admitted requests accumulate unresolved (deterministically) until
    close() posts the sentinel, which flushes the window."""
    return ScoringService(params, CFG, max_batch=64, max_delay_ms=60_000.0,
                          max_queue_depth=max_queue_depth, **kw)


def test_overload_rejects_before_device_work(params):
    from vidsum_tpu.serve import ServiceOverloaded

    rng = np.random.default_rng(20)
    videos = [_video(rng, 50) for _ in range(4)]
    svc = _stalled_service(params, max_queue_depth=4)
    try:
        futs = [svc.submit(v, want_summary=False) for v in videos]
        # depth reached: the 5th submit must be refused up front
        with pytest.raises(ServiceOverloaded, match="max_queue_depth=4"):
            svc.submit(videos[0], want_summary=False)
        with pytest.raises(ServiceOverloaded):
            svc.summarize(videos[0])
    finally:
        svc.close()  # sentinel flushes the stalled window
    # every admitted request still completes; the rejected ones were never
    # admitted (no future, no device row, not in `requests`)
    for v, f in zip(videos, futs):
        np.testing.assert_array_equal(f.result(timeout=120).scores,
                                      _solo_scores(params, v))
    st = svc.stats()
    assert st.rejected == 2 and st.requests == 4 and st.completed == 4
    assert st.failed == 0
    assert svc._inflight == 0  # every admission slot released


def test_service_recovers_after_overload(params):
    """Rejection is not sticky: once the backlog drains, submits succeed."""
    from vidsum_tpu.serve import ServiceOverloaded

    rng = np.random.default_rng(21)
    v = _video(rng, 40)
    with ScoringService(params, CFG, max_batch=4, max_delay_ms=0.0,
                        max_queue_depth=64) as svc:
        # saturate-and-drain a few rounds: never deadlocks, never leaks slots
        for _ in range(3):
            futs = [svc.submit(v, want_summary=False) for _ in range(8)]
            for f in futs:
                f.result(timeout=120)
        assert svc._inflight == 0
        assert svc.stats().completed == 24


def test_deadline_expires_undispatched_request(params):
    from vidsum_tpu.serve import DeadlineExceeded

    rng = np.random.default_rng(22)
    ok_video, late_video = _video(rng, 50), _video(rng, 60)
    svc = _stalled_service(params, max_queue_depth=16)
    try:
        f_ok = svc.submit(ok_video, want_summary=False)
        # a deadline already in the past: the dispatcher must drop it at
        # dispatch time without sending it to the accelerator
        f_late = svc.submit(late_video, want_summary=False, deadline_s=-1.0)
    finally:
        svc.close()
    np.testing.assert_array_equal(f_ok.result(timeout=120).scores,
                                  _solo_scores(params, ok_video))
    with pytest.raises(DeadlineExceeded):
        f_late.result(timeout=120)
    st = svc.stats()
    assert st.expired == 1 and st.completed == 1 and st.failed == 0
    assert svc._inflight == 0


def test_max_request_len_rejects_at_submit(params):
    from vidsum_tpu.serve import RequestTooLong

    rng = np.random.default_rng(23)
    with ScoringService(params, CFG, max_delay_ms=0.0,
                        max_request_len=256) as svc:
        with pytest.raises(RequestTooLong, match="max_request_len=256"):
            svc.submit(_video(rng, 300), want_summary=False)
        # at the cap is fine
        r = svc.submit(_video(rng, 256), want_summary=False).result(timeout=120)
        assert r.scores.shape == (256,)
        st = svc.stats()
    assert st.rejected == 1 and st.completed == 1


def test_kernel_envelope_rejects_at_submit(params):
    """On a kernel-impl service (no mesh, no ring route) a request past the
    single-chip envelope is refused at submit() with the route named —
    instead of reaching flash_attention's ValueError inside a batch and
    failing every rider (VERDICT r3 weak #2a)."""
    from vidsum_tpu.serve import RequestTooLong, _single_chip_max_len

    with ScoringService(params, CFG, attn_impl="pallas",
                        max_delay_ms=0.0) as svc:
        cap = svc._short_cap
        assert cap == _single_chip_max_len(CFG, 128) and cap is not None
        too_long = np.zeros((cap + 1, CFG.in_features), np.float32)
        with pytest.raises(RequestTooLong, match="single-chip kernel ladder"):
            svc.submit(too_long, want_summary=False)
    assert svc.stats().rejected == 1


def test_use_cls_mesh_warns_and_rejects_long(params):
    """cfg.use_cls disables the ring route: mesh construction warns, an
    explicit long_threshold raises, and over-cap requests are rejected at
    submit instead of opaquely failing a replica batch (ADVICE r3 #5)."""
    from vidsum_tpu.serve import RequestTooLong

    cfg = ModelConfig(in_features=32, d_model=64, num_heads=4, num_layers=1,
                      dropout=0.0, max_len=512, use_cls=True)
    prm = init_simnet(jax.random.PRNGKey(30), cfg)
    rng = np.random.default_rng(24)
    with pytest.raises(ValueError, match="use_cls"):
        ScoringService(prm, cfg, mesh=_mesh8(), long_threshold=256)
    with pytest.warns(UserWarning, match="no sequence-parallel long route"):
        svc = ScoringService(prm, cfg, mesh=_mesh8(), max_delay_ms=0.0,
                             max_request_len=256)
    with svc:
        assert svc._long_fwd is None
        with pytest.raises(RequestTooLong):
            svc.submit(rng.normal(size=(300, 32)).astype(np.float32),
                       want_summary=False)
        r = svc.submit(rng.normal(size=(100, 32)).astype(np.float32),
                       want_summary=False).result(timeout=300)
        assert r.scores.shape == (100,)


def test_cancelled_future_does_not_strand_batch(params):
    """A caller-cancelled future must not abort resolution for the other
    riders in its batch (ADVICE r3 #3: set_exception/set_result raise
    InvalidStateError on a cancelled future)."""
    rng = np.random.default_rng(25)
    v1, v2, v3 = (_video(rng, 50) for _ in range(3))
    svc = _stalled_service(params, max_queue_depth=16)
    try:
        f1 = svc.submit(v1, want_summary=False)
        f2 = svc.submit(v2, want_summary=False)
        f3 = svc.submit(v3, want_summary=False)
        assert f2.cancel()  # pending (dispatcher stalled) -> cancellable
    finally:
        svc.close()
    np.testing.assert_array_equal(f1.result(timeout=120).scores,
                                  _solo_scores(params, v1))
    np.testing.assert_array_equal(f3.result(timeout=120).scores,
                                  _solo_scores(params, v3))
    assert f2.cancelled()
    assert svc._inflight == 0  # the cancelled rider's slot was released


def test_close_timeout_leaves_pool_for_second_close(params):
    """close(timeout) that fires while the dispatcher is mid-window must
    not shut the worker pool down under it (ADVICE r3 #4); a second close
    finishes cleanly and the future still resolves."""
    rng = np.random.default_rng(26)
    v = _video(rng, 50)
    svc = ScoringService(params, CFG, max_batch=64, max_delay_ms=2_000.0)
    f = svc.submit(v, want_summary=False)
    svc.close(timeout=0.0)   # dispatcher almost certainly still batching
    svc.close()              # idempotent; waits for the real shutdown
    assert not svc._dispatcher.is_alive()
    np.testing.assert_array_equal(f.result(timeout=120).scores,
                                  _solo_scores(params, v))


def test_http_admission_statuses(params):
    """HTTP mapping: 503 on overload (with Retry-After), 413 on too-long
    and on oversized bodies, 504 on expired deadline, 500 JSON (not a
    dropped connection) on a closed service."""
    import urllib.error

    from vidsum_tpu.serve_http import make_server, run_in_thread

    rng = np.random.default_rng(27)
    feats = _video(rng, 60)
    svc = ScoringService(params, CFG, max_batch=64, max_delay_ms=60_000.0,
                         max_queue_depth=1, max_request_len=256)
    server = make_server(svc, port=0, max_body_bytes=200_000)
    run_in_thread(server)
    host, port = server.server_address

    def post(path, body):
        req = urllib.request.Request(f"http://{host}:{port}{path}",
                                     data=body, method="POST")
        return urllib.request.urlopen(req, timeout=60)

    def npz(arr):
        buf = io.BytesIO()
        np.savez(buf, features=arr)
        return buf.getvalue()

    try:
        f_held = svc.submit(feats, want_summary=False)  # fills the depth
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/summarize", npz(feats))
        assert ei.value.code == 503
        assert ei.value.headers["Retry-After"] is not None
        assert "error" in json.loads(ei.value.read())

        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/summarize", npz(_video(rng, 300)))   # > max_request_len
        assert ei.value.code == 413

        big = np.zeros((2000, CFG.in_features), np.float32)  # > body cap
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/summarize", npz(big))
        assert ei.value.code == 413
    finally:
        svc.close()   # flushes the stalled window
    f_held.result(timeout=120)

    # expired deadline -> 504 (fresh fast service, same server object)
    with ScoringService(params, CFG, max_delay_ms=0.0) as svc2:
        server.service = svc2
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/summarize?deadline=-1", npz(feats))
        assert ei.value.code == 504
    # closed service -> 500 JSON, never a dropped connection (ADVICE r3 #2)
    with pytest.raises(urllib.error.HTTPError) as ei:
        post("/summarize", npz(feats))
    assert ei.value.code == 500
    assert "error" in json.loads(ei.value.read())
    server.shutdown()


def test_long_route_never_head_of_line_blocks(params):
    """Pins _run_long's docstring claim (VERDICT r3 weak #3): the
    dispatcher only LAUNCHES the ring program; the multi-second host fetch
    runs on the worker pool, so short requests behind a long one complete
    while the long is still in flight.

    The slow part is made deterministic: the long forward's result is
    wrapped in a proxy whose host fetch (``__array__``) sleeps 2 s — the
    CPU-harness stand-in for the relay's multi-second ring fetch. If the
    dispatcher fetched inline (the anti-pattern this guards), every short
    would serialize behind the sleep and complete after the long."""
    import time as _time

    cfg = ModelConfig(in_features=32, d_model=64, num_heads=4, num_layers=1,
                      dropout=0.0, max_len=4096)
    prm = init_simnet(jax.random.PRNGKey(40), cfg)
    rng = np.random.default_rng(41)
    long_feats = rng.normal(size=(1500, 32)).astype(np.float32)
    shorts = [rng.normal(size=(60 + i, 32)).astype(np.float32)
              for i in range(6)]

    with ScoringService(prm, cfg, mesh=_mesh8(), long_threshold=256,
                        max_delay_ms=5.0) as svc:
        # warm both programs so compile time doesn't pollute the ordering
        svc.submit(long_feats, want_summary=False).result(timeout=900)
        svc.submit(shorts[0], want_summary=False).result(timeout=900)
        svc.reset_stats()

        real_long_fwd = svc._long_fwd
        FETCH_SLEEP = 2.0

        class _SlowFetch:
            def __init__(self, dev):
                self._dev = dev

            def __array__(self, dtype=None, copy=None):
                _time.sleep(FETCH_SLEEP)  # the "relay" fetch
                a = np.asarray(self._dev)
                return a.astype(dtype) if dtype is not None else a

        svc._long_fwd = lambda *a: _SlowFetch(real_long_fwd(*a))

        done_at = {}
        t0 = _time.monotonic()
        f_long = svc.submit(long_feats, want_summary=False)
        f_long.add_done_callback(
            lambda f: done_at.__setitem__("long", _time.monotonic()))
        futs = []
        for i, s in enumerate(shorts):
            f = svc.submit(s, want_summary=False)
            f.add_done_callback(
                lambda f, i=i: done_at.__setitem__(i, _time.monotonic()))
            futs.append(f)
        for f in futs:
            f.result(timeout=900)
        # liveness: every short finished while the long was still in flight
        assert not f_long.done(), \
            "long request completed before the shorts — dispatcher blocked?"
        r_long = f_long.result(timeout=900)
        st = svc.stats()

    last_short = max(done_at[i] for i in range(len(shorts)))
    assert last_short - t0 < FETCH_SLEEP, (
        f"shorts took {last_short - t0:.2f}s — they serialized behind the "
        f"long fetch")
    assert done_at["long"] > last_short
    assert st.long_requests == 1 and st.failed == 0
    assert st.completed == len(shorts) + 1  # the timed long + the shorts
    # and the slow-fetched long still scored correctly
    assert r_long.scores.shape == (1500,)
    assert np.all((r_long.scores > 0) & (r_long.scores < 1))


def test_int8_wire_scores_close_and_ranking_stable(params):
    """Opt-in lossy wire: per-frame int8 quantization of the input features
    must perturb scores only at the input-quantization-error scale and keep
    the score ranking (what selection consumes) essentially intact."""
    rng = np.random.default_rng(3)
    videos = [_video(rng, n) for n in (37, 128, 250, 300)]
    with ScoringService(params, CFG, max_batch=8, max_delay_ms=200.0,
                        wire_dtype="int8") as svc:
        assert svc._wire_dtype == np.dtype(np.int8)
        futs = [svc.submit(v, want_summary=False) for v in videos]
        res = [f.result(timeout=120) for f in futs]
        st = svc.stats()
    assert st.completed == len(videos) and st.failed == 0
    for v, r in zip(videos, res):
        exact = _solo_scores(params, v)
        delta = np.max(np.abs(r.scores - exact))
        assert delta < 2e-2, delta
        # ranking stability: top-25% frame sets overlap
        k = max(1, v.shape[0] // 4)
        top_q = set(np.argsort(r.scores)[-k:].tolist())
        top_e = set(np.argsort(exact)[-k:].tolist())
        assert len(top_q & top_e) / k >= 0.9


def test_int8_wire_summary_roundtrip(params):
    """End-to-end summary on the int8 wire: the composition (KTS +
    knapsack + selection) must run and return a valid binary summary of
    the right length and budget."""
    rng = np.random.default_rng(4)
    feats = _video(rng, 200)
    with ScoringService(params, CFG, max_batch=4, max_delay_ms=50.0,
                        wire_dtype="int8") as svc:
        r = svc.submit(feats, budget_ratio=0.15).result(timeout=300)
    assert r.summary is not None and r.summary.shape == (200,)
    assert set(np.unique(r.summary)).issubset({0, 1})
    assert 0 < r.summary.sum() <= int(0.15 * 200) + 1


def test_int8_wire_mesh_matches_single_chip_int8(params):
    """The int8 wire composes with mesh replica mode (VERDICT r4 #5): rows
    commit quantized to their replica and dequantize per-replica on device.
    The replica shard_map runs the identical local scorer, so mesh-int8
    scores must BIT-match the host-dequantized solo forward (the transport
    adds no error beyond the quantizer itself) and sit within the wire's
    measured tolerance of the lossless scorer."""
    from vidsum_tpu.serve.transport import quantize_frames

    rng = np.random.default_rng(30)
    lengths = [37, 100, 128, 250, 256, 300, 64, 90, 200]
    videos = [_video(rng, n) for n in lengths]
    fwd = make_eval_forward(CFG, attn_impl="xla")
    with ScoringService(params, CFG, mesh=_mesh8(), max_batch=16,
                        max_delay_ms=200.0, wire_dtype="int8") as svc:
        assert svc._wire_dtype == np.dtype(np.int8)
        futs = [svc.submit(v, want_summary=False) for v in videos]
        results = [f.result(timeout=300) for f in futs]
        st = svc.stats()
    assert st.completed == len(videos) and st.failed == 0
    for v, r in zip(videos, results):
        n = v.shape[0]
        nb = bucket_length(n, 128)
        row = np.full((nb, CFG.in_features), 1000.0, np.float32)
        row[:n] = v
        q, scale = quantize_frames(row)
        deq = q.astype(np.float32) * scale[:, None]
        mask = np.ones((1, nb), bool)
        mask[0, :n] = False
        want = np.asarray(fwd(params, jnp.asarray(deq[None]),
                              jnp.asarray(mask)))[0, :n]
        np.testing.assert_allclose(r.scores, want, rtol=1e-6, atol=1e-7)
        # and within the int8 wire's tolerance of the lossless scorer
        exact = _solo_scores(params, v)
        assert float(np.max(np.abs(r.scores - exact))) < 2e-2


def test_int8_wire_mesh_rebalance_and_long_route(params):
    """Mesh-int8 edge paths: a skewed burst exercises the (q, scale)
    straggler re-commit, and an over-threshold request still takes the
    ring on the LOSSLESS wire (int8 is a short-request optimization)."""
    cfg = ModelConfig(in_features=32, d_model=64, num_heads=4, num_layers=2,
                      dropout=0.0, max_len=2048)
    prm = init_simnet(jax.random.PRNGKey(31), cfg)
    rng = np.random.default_rng(32)
    shorts = [_v for _v in (rng.normal(size=(n, 32)).astype(np.float32)
                            for n in (64, 200, 70, 220, 90))]
    long_feats = rng.normal(size=(700, 32)).astype(np.float32)
    with ScoringService(prm, cfg, mesh=_mesh8(), max_batch=16,
                        max_delay_ms=200.0, wire_dtype="int8",
                        long_threshold=256) as svc:
        futs = [svc.submit(v, want_summary=False) for v in shorts]
        f_long = svc.submit(long_feats, want_summary=False)
        results = [f.result(timeout=300) for f in futs]
        r_long = f_long.result(timeout=600)
        st = svc.stats()
    assert st.failed == 0 and st.long_requests == 1
    fwd = make_eval_forward(cfg, attn_impl="xla")
    for v, r in zip(shorts, results):
        n = v.shape[0]
        nb = bucket_length(n, 128)
        x = np.full((1, nb, 32), 1000.0, np.float32)
        mask = np.ones((1, nb), bool)
        x[0, :n] = v
        mask[0, :n] = False
        solo = np.asarray(fwd(prm, jnp.asarray(x), jnp.asarray(mask)))[0, :n]
        assert float(np.max(np.abs(r.scores - solo))) < 2e-2
    # the ring rode the lossless wire: 2e-4 ring tolerance, not 1e-2 int8
    nb = 1024
    x = np.full((1, nb, 32), 1000.0, np.float32)
    mask = np.ones((1, nb), bool)
    x[0, :700] = long_feats
    mask[0, :700] = False
    from vidsum_tpu.models import simnet_apply
    scores, _ = simnet_apply(prm, cfg, jnp.asarray(x), jnp.asarray(mask))
    want = np.asarray(jax.nn.sigmoid(scores[0, :700, 0]), np.float32)
    np.testing.assert_allclose(r_long.scores, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dtype", ["auto", "int8"])
def test_coalesced_wire_matches_rows_bitwise(params, dtype):
    """The coalesced transport feeds the same compiled programs as the
    rows transport, so scores must be bit-identical across modes (for
    both the lossless and the int8 wire)."""
    rng = np.random.default_rng(5)
    videos = [_video(rng, n) for n in (37, 100, 250, 300)]
    res = {}
    for mode in ("rows", "coalesced"):
        with ScoringService(params, CFG, max_batch=8, max_delay_ms=200.0,
                            wire_dtype=dtype, wire_mode=mode) as svc:
            futs = [svc.submit(v, want_summary=False) for v in videos]
            res[mode] = [f.result(timeout=300).scores for f in futs]
            assert svc.stats().failed == 0
    for a, b in zip(res["rows"], res["coalesced"]):
        np.testing.assert_array_equal(a, b)


def test_coalesced_rejects_mesh(params):
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >1 device")
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(devs[:2]), ("data",))
    with pytest.raises(ValueError, match="coalesced.*single-chip"):
        ScoringService(params, CFG, mesh=mesh, wire_mode="coalesced")
