"""Cross-process persistent XLA compilation cache.

Remote compiles through the axon tunnel cost ~10-20 s per forward program
shape and ~40 s per train-step shape (PERF.md 'Compile / runtime
overheads'), and the reference workflow is CLI-per-invocation — every
``cli.summarize`` / ``cli.train`` process would otherwise recompile the
same programs. JAX's persistent cache keys on (serialized computation,
jaxlib version, backend version, XLA flags) — all process-independent —
and was verified to HIT on the axon TPU backend across processes
(``jax._src.compiler: Persistent compilation cache hit`` observed for
cached entries, 2026-08-17).

Enabled by every CLI entry point; set ``VIDSUM_TPU_CACHE_DIR=off`` to
disable, or point it at a shared location for fleet-wide reuse.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_persistent_cache(path: Optional[str] = None,
                            min_compile_secs: float = 1.0,
                            allow_cpu: bool = False) -> Optional[str]:
    """Route every XLA compile through an on-disk cache; returns the cache
    dir, or None when disabled (``VIDSUM_TPU_CACHE_DIR=off``/``0``).

    Skipped on the CPU backend unless ``allow_cpu``: CPU compiles are
    seconds (nothing to save), and XLA:CPU's AOT loader prints a wall of
    machine-feature-mismatch warnings per cache load (observed: the cached
    result still executes and matches bit-for-bit, but the noise isn't
    worth it on the dev/test harness)."""
    env = os.environ.get("VIDSUM_TPU_CACHE_DIR", "")
    if env.lower() in ("off", "0", "none"):
        return None
    import jax

    if not allow_cpu and jax.default_backend() == "cpu":
        return None
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "vidsum_tpu", "xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
