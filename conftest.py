"""Repo-root pytest config: force JAX onto CPU with 8 virtual devices so
multi-chip sharding tests run anywhere (the standard JAX fake-multi-device
harness; real-TPU benchmarking happens in bench.py, not tests).

Gotcha: the installed `jaxtyping` pytest plugin imports jax at plugin-load
time — *before* this conftest — which locks in the environment's
JAX_PLATFORMS=axon (the TPU tunnel; per-op RPC latency turns the suite into
minutes of idle waiting). pytest.ini disables that plugin, and as a belt and
suspenders we update jax.config directly if jax is already imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# keep tests hermetic: the CLIs enable the persistent XLA compile cache in
# ~/.cache by default (utils/compile_cache.py); tests must not write there
os.environ.setdefault("VIDSUM_TPU_CACHE_DIR", "off")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Deflake: XLA CPU aborts a collective if the 8 virtual devices don't all
# reach the rendezvous within 40 s. GIL-serialized interpret-mode Pallas
# under shard_map staggers arrivals by the full per-device interpret time,
# which can exceed that on this one-core box (observed in dryrun[c]).
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = _flags

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
