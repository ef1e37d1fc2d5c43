"""Serving leak self-protection (VERDICT r4 #2): the in-process RSS
watermark sheds load, and the supervised worker-recycling CLI drains and
respawns workers on the same listening socket with zero dropped requests.

The leak being defended against is environmental — the axon relay client
retains ~0.9 MB host RSS per request (PERF.md "Endurance") — but the
defenses are this framework's and must work anywhere, so they are pinned
on the CPU harness."""

import io
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models import init_simnet
from vidsum_tpu.serve import ScoringService, ServiceOverloaded

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = ModelConfig(in_features=32, d_model=64, num_heads=4, num_layers=1,
                  dropout=0.0, max_len=512)


@pytest.fixture(scope="module")
def params():
    return init_simnet(jax.random.PRNGKey(0), CFG)


def test_rss_watermark_sheds_and_recovers(params):
    """Past the watermark submit() rejects with 503 semantics BEFORE any
    device work; with headroom the same service serves normally. The RSS
    read is cached, so the check costs nothing per-submit."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=(50, 32)).astype(np.float32)
    # watermark far above any real RSS: no shedding
    with ScoringService(params, CFG, max_delay_ms=0.0,
                        rss_watermark_mb=10_000_000.0) as svc:
        r = svc.submit(v, want_summary=False).result(timeout=120)
        assert r.scores.shape == (50,)
    # watermark of 1 MB: any live python process is over it
    with ScoringService(params, CFG, max_delay_ms=0.0,
                        rss_watermark_mb=1.0) as svc:
        with pytest.raises(ServiceOverloaded, match="RSS"):
            svc.submit(v, want_summary=False)
        st = svc.stats()
        assert st.rejected == 1 and st.requests == 0
        assert svc._inflight == 0   # shed before any slot was taken


def test_http_server_adopts_prebound_socket(params):
    """make_server(bound_socket=...) serves on a socket it did not bind —
    the supervisor handoff primitive (the fd outlives worker generations)."""
    from vidsum_tpu.serve_http import make_server, run_in_thread

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(("127.0.0.1", 0))
    sock.listen(16)
    host, port = sock.getsockname()
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(40, 32)).astype(np.float32)
    with ScoringService(params, CFG, max_delay_ms=0.0) as svc:
        server = make_server(svc, bound_socket=sock, daemon_threads=False)
        assert server.server_address == (host, port)
        # server_activate() re-listens on the adopted socket with
        # request_queue_size: socketserver's default of 5 would SHRINK the
        # supervisor's deep backlog and drop handoff-window SYNs (measured
        # as ~130 s ETIMEDOUTs in the first recycle endurance run)
        assert server.request_queue_size >= 64
        run_in_thread(server)
        try:
            buf = io.BytesIO()
            np.savez(buf, features=feats)
            req = urllib.request.Request(
                f"http://{host}:{port}/summarize?summary=0",
                data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                out = json.loads(resp.read())
            assert len(out["scores"]) == 40
        finally:
            server.shutdown()
            server.server_close()


# ------------------------------------------------- supervised recycling

def _cpu_env():
    env = dict(os.environ)
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            del env[k]
    env["JAX_PLATFORMS"] = "cpu"
    env["VIDSUM_TPU_CACHE_DIR"] = "off"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), REPO) if p)
    return env


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _post(port, feats, timeout=300):
    buf = io.BytesIO()
    np.savez(buf, features=feats)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/summarize?summary=0",
        data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def test_supervised_recycle_drops_nothing():
    """End-to-end supervisor drive: a tight --recycle_after_requests forces
    several worker generations under sequential load; every request must
    succeed (handoff connections ride the supervisor-held socket's
    backlog) and the supervisor log must show the recycles."""
    port = _free_port()
    n_requests, every = 12, 4
    cmd = [sys.executable, "-m", "vidsum_tpu.cli.serve",
           "--host", "127.0.0.1", "--port", str(port),
           "--d_model", "32", "--num_heads", "4", "--num_layers", "1",
           "--max_delay_ms", "0", "--warmup", "",
           "--recycle_after_requests", str(every)]
    proc = subprocess.Popen(cmd, env=_cpu_env(), stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(60, 1024)).astype(np.float32)
    try:
        # wait for generation 1 to accept
        deadline = time.monotonic() + 180
        while True:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=10):
                    break
            except (urllib.error.URLError, OSError):
                if time.monotonic() > deadline:
                    proc.terminate()
                    out = proc.communicate(timeout=60)[0]
                    pytest.fail(f"server never came up:\n{out[-3000:]}")
                time.sleep(1.0)
        ok = 0
        for _ in range(n_requests):
            out = _post(port, feats)
            assert len(out["scores"]) == 60
            ok += 1
            # outpace the worker's 0.5 s recycle-monitor poll so the
            # threshold is observed between requests, not only at the end
            time.sleep(0.6)
        assert ok == n_requests   # zero dropped across recycles
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            log = proc.communicate(timeout=180)[0]
        except subprocess.TimeoutExpired:
            proc.kill()
            log = proc.communicate()[0]
    assert proc.returncode == 0, log[-3000:]
    recycles = log.count("recycled after")
    # 12 paced sequential requests at recycle-every-4 must recycle the
    # worker at least twice
    assert recycles >= 2, f"expected >=2 recycles, log:\n{log[-3000:]}"
    assert "died rc=" not in log, log[-3000:]
