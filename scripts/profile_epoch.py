"""Where does a finetune epoch's wall time go on the real chip?

Runs one fold of the flagship recipe on a synthetic SumMe/TVSum-scale
dataset and wall-times each phase of the epoch loop separately:

- train dispatch (step_fn calls, losses left on device)
- train loss fetch (one stacked fetch per epoch)
- val forward (bucketed batched dispatch + fetch)
- eval_metrics host pipeline (KTS shots come from the h5; upsample +
  shot-mean + knapsack + F/tau/rho)
- checkpoint saves (device_get + msgpack write, both files)

Usage: python scripts/profile_epoch.py  (JAX_PLATFORMS as preset — real chip)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from vidsum_tpu.config import Config
    from vidsum_tpu.data.collate import make_batches, pad_batch
    from vidsum_tpu.data.datasets import TSDataset
    from vidsum_tpu.data.synthetic import make_synthetic_h5
    from vidsum_tpu.models.simnet import init_simnet
    from vidsum_tpu.ops.metrics import eval_metrics
    from vidsum_tpu.train.checkpoint import AsyncCheckpointer
    from vidsum_tpu.train.steps import (
        make_eval_forward, make_finetune_step, make_optimizer,
    )

    import dataclasses
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4))
    tmp = tempfile.mkdtemp()
    make_synthetic_h5(
        os.path.join(tmp, "summarizer_dataset_tvsum_google_pool5.h5"),
        n_videos=50, seed=0)
    keys = [f"tvsum/video_{i}" for i in range(50)]
    train_set = TSDataset(tmp, "tvsum", "tvsum", keys[:40], split="train",
                          min_frames=cfg.data.min_train_frames)
    val_set = TSDataset(tmp, "tvsum", "tvsum", keys[40:], split="val")

    optimizer = make_optimizer(cfg.train.lr, cfg.train.weight_decay)
    attn_impl = "pallas_block" if jax.default_backend() == "tpu" else "xla"
    step_fn = make_finetune_step(cfg.model, optimizer, attn_impl=attn_impl)
    fwd = make_eval_forward(cfg.model, attn_impl=attn_impl)

    _, init_key = jax.random.split(jax.random.PRNGKey(cfg.train.seed))
    params = init_simnet(init_key, cfg.model)
    opt_state = optimizer.init(params)
    rng_base = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)

    workdir = tempfile.mkdtemp()
    save_path = os.path.join(workdir, "model.ckpt")
    state_path = os.path.join(workdir, "state.ckpt")
    ckpt = AsyncCheckpointer()

    n_epochs = 6
    for epoch in range(n_epochs):
        rng_np = np.random.default_rng((cfg.train.seed, 0, epoch))
        rng_jax = jax.random.fold_in(rng_base, epoch)
        t0 = time.perf_counter()
        # --- train dispatch
        step_losses = []
        n_steps = 0
        t_host_prep = 0.0
        for batch_idx in make_batches(len(train_set), cfg.train.batch_size,
                                      shuffle=True, rng=rng_np):
            th0 = time.perf_counter()
            feats, tgts = zip(*[train_set[i] for i in batch_idx])
            x, t, mask = pad_batch(feats, tgts, pad_value=cfg.data.pad_value,
                                   bucket=cfg.data.length_bucket)
            xa, ta, ma = jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask)
            t_host_prep += time.perf_counter() - th0
            rng_jax, sub = jax.random.split(rng_jax)
            params, opt_state, loss = step_fn(params, opt_state, xa, ta, ma,
                                              sub)
            step_losses.append(loss)
            n_steps += 1
        t1 = time.perf_counter()
        # --- loss fetch (syncs the whole train phase)
        losses = np.asarray(jnp.stack(step_losses))
        t2 = time.perf_counter()
        # start checkpoint host copies under the val pass (as the driver)
        from vidsum_tpu.train.checkpoint import start_host_copy
        start_host_copy(params)
        start_host_copy(opt_state)
        # --- val forward
        from collections import defaultdict

        from vidsum_tpu.data.collate import bucket_length
        groups = defaultdict(list)
        for i in range(len(val_set)):
            groups[bucket_length(val_set[i][0].shape[0],
                                 cfg.data.length_bucket)].append(i)
        score_dict, user_dict = {}, {}
        for bucket in sorted(groups):
            idxs = groups[bucket]
            for start in range(0, len(idxs), 8):
                chunk = idxs[start:start + 8]
                items = [val_set[i] for i in chunk]
                x, _, mask = pad_batch([it[0] for it in items],
                                       [it[1] for it in items],
                                       pad_value=cfg.data.pad_value,
                                       bucket=cfg.data.length_bucket)
                preds = np.asarray(fwd(params, jnp.asarray(x),
                                       jnp.asarray(mask)))
                for row, (feats, tgt, user) in zip(preds, items):
                    score_dict[user.name] = row[: feats.shape[0]]
                    user_dict[user.name] = user
        t3 = time.perf_counter()
        # --- host eval pipeline
        f, k, s = eval_metrics(score_dict, user_dict)
        t4 = time.perf_counter()
        # --- checkpoints (as the driver does: one fetch, async writes)
        host_params = jax.device_get(params)
        host_state = {"params": host_params,
                      "opt_state": jax.device_get(opt_state)}
        t4b = time.perf_counter()
        ckpt.save(save_path, host_params, meta={"epoch": epoch})
        ckpt.save(state_path, host_state, meta={"epoch": epoch})
        t5 = time.perf_counter()
        print(f"epoch {epoch}: total {t5 - t0:6.3f}s | "
              f"train-dispatch {t1 - t0:6.3f}s ({n_steps} steps, "
              f"host-prep {t_host_prep:5.3f}s) | "
              f"loss-fetch {t2 - t1:6.3f}s | val-fwd {t3 - t2:6.3f}s | "
              f"host-eval {t4 - t3:6.3f}s | ckpt-fetch {t4b - t4:6.3f}s "
              f"ckpt-queue {t5 - t4b:6.3f}s | "
              f"loss {losses.mean():.4f} F {f:.2f}")
    ckpt.flush()


if __name__ == "__main__":
    main()
