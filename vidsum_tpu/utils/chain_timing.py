"""Chain-length-differenced device timing for the axon TPU runtime.

The runtime breaks both standard timing tools: ``block_until_ready``
returns before execution finishes (naive timing reports above chip peak),
and every host fetch pays a relay RPC whose cost has a ~30-90 ms floor
PLUS a bulk-bandwidth term (~20-100 MB/s) that a trivial-program probe
does not model — fetching a 5 MB array adds ~100+ ms. Subtracting a
single RPC estimate from a single chain is therefore fragile: fast
programs land below the estimate's own jitter.

The robust method: build the SAME chained program at two lengths K1 < K2
(iterations linked by a data dependency inside one jit, reduced to a
scalar on device) and report ``(t(K2) - t(K1)) / (K2 - K1)``. All
constant overhead — dispatch, fetch RPC, relay jitter bias — cancels in
the difference; only per-iteration device time remains. Pairing the two
samples by rank makes the best/median diffs robust to tunnel noise.

Pick K2 so the K2-chain runs ≥100 ms of device time (diff resolution is
RPC-jitter / (K2-K1) per iteration).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple

import numpy as np

__all__ = ["time_per_iter", "chain_scan"]


def chain_scan(fn: Callable, length: int):
    """Wrap ``fn(carry, *args) -> carry`` into a jitted K-length chain that
    returns ``carry.mean()`` (scalar fetch). ``fn`` must thread a data
    dependency through ``carry`` so XLA cannot parallelize iterations."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(carry0, *args):
        def body(c, _):
            return fn(c, *args), ()
        c, _ = lax.scan(body, carry0, None, length=length)
        return jnp.mean(c).astype(jnp.float32)

    return run


def time_per_iter(make_chain: Callable[[int], Callable],
                  args: Sequence, k1: int = 64, k2: int = 256,
                  samples: int = 5) -> Tuple[float, float]:
    """Seconds per iteration by chain-length differencing.

    :param make_chain: ``make_chain(K) -> callable(*args)`` returning a
        device value whose ``np.asarray`` forces execution (scalar
        preferred; the fetch cost cancels in the diff regardless).
    :returns: ``(best, median)`` of the per-iteration differences, with
        the two chains' sorted sample lists paired by rank.
    """
    r1, r2 = make_chain(k1), make_chain(k2)
    np.asarray(r1(*args)), np.asarray(r2(*args))  # compile both

    def sample(run):
        out = []
        for _ in range(samples):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            out.append(time.perf_counter() - t0)
        return sorted(out)

    t1, t2 = sample(r1), sample(r2)
    diffs = sorted((b - a) / (k2 - k1) for a, b in zip(t1, t2))
    return diffs[0], float(np.median(diffs))
