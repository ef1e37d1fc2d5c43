"""Unit tests for the chain-differenced timing helper (CPU)."""

import time

import jax.numpy as jnp
import numpy as np

from vidsum_tpu.utils.chain_timing import chain_scan, time_per_iter


def test_time_per_iter_recovers_linear_cost():
    """A synthetic 'chain' of K * dt sleep plus constant overhead: the
    differenced estimate must recover dt and reject the constant."""
    dt, overhead = 0.004, 0.05

    def make_chain(k):
        def run():
            time.sleep(overhead + k * dt)
            return np.zeros(())
        return run

    best, med = time_per_iter(make_chain, (), k1=4, k2=16, samples=3)
    assert abs(med - dt) < dt * 0.5, (best, med)
    # the constant overhead (12x dt) must not leak into the estimate
    assert med < overhead / 2


def test_chain_scan_threads_dependency():
    """chain_scan composes fn K times through the carry and reduces to a
    scalar; K applications of +1 starting from 0 must yield K."""
    def step(c, delta):
        return c + delta

    run = chain_scan(step, 7)
    out = np.asarray(run(jnp.zeros(()), jnp.ones(())))
    assert out.shape == ()
    assert out == 7.0
