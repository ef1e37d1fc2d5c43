import math

import numpy as np

from vidsum_tpu.train.schedule import (
    cosine_warmup_scale, reference_pretrain_schedule,
)


def test_warmup_is_linear():
    assert cosine_warmup_scale(0, 10, 100) == 0.0
    assert cosine_warmup_scale(5, 10, 100) == 0.5
    assert abs(cosine_warmup_scale(9, 10, 100) - 0.9) < 1e-12


def test_cosine_decay_endpoints():
    # at the warmup boundary the cosine term is 1
    assert cosine_warmup_scale(10, 10, 100) == 1.0
    # at total steps it reaches 0
    assert abs(cosine_warmup_scale(100, 10, 100)) < 1e-12
    # halfway through decay it is 0.5
    assert abs(cosine_warmup_scale(55, 10, 100) - 0.5) < 1e-12


def test_reference_schedule_off_by_one_sequence():
    """The realized LR sequence is [base, 0, base*scale(1), …] because the
    reference updates the LR after the optimizer step (pretrain.py:70)."""
    base, spe, warm, epochs = 1e-3, 50, 2, 10
    sched = reference_pretrain_schedule(base, spe, warm, epochs)
    total, warmup = spe * epochs, warm * spe
    assert abs(float(sched(0)) - base) < 1e-9  # float32 representation
    assert float(sched(1)) == 0.0
    for k in (2, 5, 120, 400):
        want = base * cosine_warmup_scale(k - 1, warmup, total)
        assert abs(float(sched(k)) - want) < 1e-8  # float32 eval
