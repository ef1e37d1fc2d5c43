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
