"""Learning-rate schedules.

Behavior contract (reference: ``src/schedular.py:4-25``): linear warmup over
``warmup_epochs * steps_per_epoch`` steps, then cosine decay to 0 over the
remaining steps, as a multiplier on the base LR.

Reference quirks reproduced faithfully (each documented at the site):
- ``steps_per_epoch`` is computed from a hardcoded 13000-sample numerator, not
  the dataset length (``src/pretrain.py:37``) — callers pass it in.
- The scheduler's ``update()`` runs *after* the optimizer step
  (``src/pretrain.py:70``) and applies ``scale(step)`` before incrementing, so
  the realized LR sequence is ``[base, base*scale(0)=0, base*scale(1), …]`` —
  the first step uses the raw base LR and the second uses 0.
  :func:`reference_pretrain_schedule` reproduces exactly that sequence for
  optax (whose schedules are evaluated at update ``k`` = steps taken so far).
"""

from __future__ import annotations

import math


def cosine_warmup_scale(step: int, warmup_steps: int, total_steps: int) -> float:
    """The reference's ``get_scale`` (schedular.py:13-18)."""
    if warmup_steps > step:
        return step / warmup_steps
    decay_steps = total_steps - warmup_steps
    ratio = (step - warmup_steps) / decay_steps
    return 0.5 * (1 + math.cos(ratio * math.pi))


def reference_pretrain_schedule(base_lr: float, steps_per_epoch: int,
                                warmup_epochs: int, epochs: int):
    """Optax-compatible schedule reproducing the reference's realized LR
    sequence, including its off-by-one (see module docstring)."""
    total = steps_per_epoch * epochs
    warmup = warmup_epochs * steps_per_epoch

    def schedule(count):
        import jax.numpy as jnp
        count = jnp.asarray(count)
        prev = jnp.maximum(count - 1, 0)
        # scale(prev): linear warmup then cosine decay
        warm = prev / warmup if warmup > 0 else 1.0
        decay_steps = max(total - warmup, 1)
        ratio = (prev - warmup) / decay_steps
        cos = 0.5 * (1 + jnp.cos(ratio * jnp.pi))
        scale = jnp.where(prev < warmup, warm, cos)
        return jnp.where(count == 0, base_lr, base_lr * scale)

    return schedule
