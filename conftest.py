"""Repo-root pytest config: force JAX onto CPU with 8 virtual devices so
multi-chip sharding tests run anywhere (the standard JAX fake-multi-device
harness; real-TPU benchmarking happens in bench.py, not tests)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
