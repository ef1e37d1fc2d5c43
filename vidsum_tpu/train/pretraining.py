"""Self-supervised pretraining driver — the reference's ``src/pretrain.py``
protocol around jitted steps.

Protocol (reference: ``src/pretrain.py:14-87``): eager-loaded feature/video
pairs, shuffled drop-last batches, PretrainModel with the 3-loss objective
(weights from config; reference hardcodes ``main + 0.5*center + 1*repel`` at
pretrain.py:63), Adam over encoder params only, cosine-warmup schedule with
the 13000-sample numerator quirk, encoder checkpoint each epoch.
"""

from __future__ import annotations

import logging
import os
import jax
import jax.numpy as jnp
import numpy as np

from vidsum_tpu.config import Config
from vidsum_tpu.data.collate import make_batches, pad_batch_pretrain
from vidsum_tpu.models.pretrain import init_pretrain_model
from vidsum_tpu.models.simnet import count_params
from vidsum_tpu.train.checkpoint import AsyncCheckpointer, start_host_copy
from vidsum_tpu.train.schedule import reference_pretrain_schedule
from vidsum_tpu.train.steps import make_optimizer, make_pretrain_step
from vidsum_tpu.utils.meters import AverageMeter

logger = logging.getLogger(__name__)


def pretrain(cfg: Config, dataset, workdir: str = ".",
             log_every: int = 4, mesh=None, resume: bool = False,
             batch_order=None) -> dict:
    """Run pretraining over ``dataset`` (any indexable of
    ``(frame_features, video_rep)`` pairs). Returns the final param pytree;
    the encoder subtree is checkpointed each epoch like pretrain.py:46.
    With ``mesh``, the step runs dp×tp over it.

    ``resume=True`` restarts from ``pretrain_state.ckpt`` (full state:
    params + optimizer moments + epoch + loss history — the reference can
    only warm-start weights, pretrain.py:46). Shuffle and dropout streams
    are derived per epoch by folding the epoch into the seed, so a resumed
    run replays the exact bits of an uninterrupted one (same design as
    train/finetune.py).

    ``batch_order(epoch) -> [[i, ...], ...]`` (optional) supplies the exact
    per-epoch batch order — torch-shuffle-compat mode for racing the
    reference's ``pretrain.py:42-88`` driver loop one-to-one (the caller is
    responsible for already having applied the reference's ``drop_last``)."""
    from vidsum_tpu.parallel.distributed import is_coordinator

    # multi-controller discipline (parallel/distributed.py): identical loop
    # on every process; coordinator-only file writes; per-process batch
    # shards onto the mesh
    coord = is_coordinator()
    if coord and workdir:
        os.makedirs(workdir, exist_ok=True)
    put = None
    if mesh is not None and jax.process_count() > 1:
        from vidsum_tpu.parallel.distributed import put_batch as _put_batch
        put = lambda *arrays: _put_batch(mesh, *arrays)  # noqa: E731

    pcfg = cfg.pretrain
    steps_per_epoch = max(pcfg.scheduler_samples // pcfg.batch_size, 1)
    schedule = reference_pretrain_schedule(pcfg.lr, steps_per_epoch,
                                           pcfg.warmup_epochs, pcfg.epochs)
    optimizer = make_optimizer(schedule, pcfg.weight_decay)
    sharded_init = None
    if mesh is not None:
        if pcfg.batch_size % mesh.shape["data"]:
            raise ValueError(f"batch_size {pcfg.batch_size} not divisible "
                             f"by the data axis ({mesh.shape['data']})")
        from vidsum_tpu.parallel.train_parallel import (
            make_sharded_pretrain_step,
        )
        sharded_init, step_fn = make_sharded_pretrain_step(cfg.model, pcfg,
                                                           optimizer, mesh)
    else:
        attn_impl = ("pallas_block" if jax.default_backend() == "tpu"
                     else "xla")
        step_fn = make_pretrain_step(cfg.model, pcfg, optimizer,
                                     attn_impl=attn_impl)

    # init on the default PRNG (stable across rng_impl); dropout stream on
    # the configured implementation (rbg is ~1.7x faster on TPU)
    _, init_key = jax.random.split(jax.random.PRNGKey(pcfg.seed))
    rng_base = jax.random.key(pcfg.seed, impl=pcfg.rng_impl)
    params = init_pretrain_model(init_key, cfg.model)
    if sharded_init is not None:
        params, opt_state = sharded_init(params)
    else:
        opt_state = optimizer.init(params)
    logger.info("number of videos: %d", len(dataset))
    logger.info("number of model parameters: %d", count_params(params))

    ckpt_path = os.path.join(workdir, cfg.train.pretrain_ckpt)
    state_path = os.path.join(workdir, "pretrain_state.ckpt")
    ckpt = AsyncCheckpointer()
    history = []
    start_epoch = 0
    if resume and os.path.exists(state_path + ".meta.json"):
        import json

        from vidsum_tpu.train.checkpoint import load_checkpoint

        state = {"params": params, "opt_state": opt_state}
        state, meta = load_checkpoint(state_path, state)
        params, opt_state = state["params"], state["opt_state"]
        history = list(meta["history"])
        start_epoch = meta["epoch"] + 1
        logger.info("resuming pretrain from epoch %d", start_epoch)
    for epoch in range(start_epoch, pcfg.epochs):
        epoch_loss = AverageMeter()
        step_records = []
        # per-epoch streams → exact replay under resume
        rng_np = np.random.default_rng((pcfg.seed, epoch))
        rng_jax = jax.random.fold_in(rng_base, epoch)
        batches = (batch_order(epoch) if batch_order is not None else
                   make_batches(len(dataset), pcfg.batch_size, shuffle=True,
                                rng=rng_np, drop_last=True))
        for i, batch_idx in enumerate(batches):
            feats, reps = zip(*[dataset[j] for j in batch_idx])
            x, v, mask = pad_batch_pretrain(
                feats, reps, pad_value=cfg.data.pad_value,
                bucket=cfg.data.length_bucket)
            rng_jax, sub = jax.random.split(rng_jax)
            if put is not None:
                x, v, mask = put(x, v, mask)
            else:
                x, v, mask = jnp.asarray(x), jnp.asarray(v), jnp.asarray(mask)
            params, opt_state, losses = step_fn(params, opt_state, x, v,
                                                mask, sub)
            # losses stay on device between log boundaries — per-step
            # float() fetches would serialize the dispatch pipeline
            # through the relay (one blocking sync per step)
            step_records.append(jnp.stack(losses))
            if (i + 1) % log_every == 0:
                total, main, center, repel = (float(l) for l in losses)
                logger.info("Epoch %3d step %d: loss %.5f (main %.5f "
                            "center %.5f repel %.5f)", epoch, i + 1, total,
                            main, center, repel)
        save_now = coord and ((epoch + 1) % max(pcfg.save_every, 1) == 0
                              or epoch == pcfg.epochs - 1)
        if save_now:
            # start the device->host copies now: the relay transfer streams
            # while the loss fetch below waits for the epoch's steps
            start_host_copy(params)
            start_host_copy(opt_state)
        if step_records:
            for total in np.asarray(jnp.stack(step_records))[:, 0]:
                epoch_loss.update(float(total), 1)
            history.append(epoch_loss.avg())
            logger.info("Total Loss %f", epoch_loss.avg())
        if save_now:
            # weight-only encoder checkpoint for the finetune warm start;
            # fetch on this thread (the sync point), write on the ckpt thread
            host_params = jax.device_get(params)
            ckpt.save(ckpt_path, host_params["encoder"],
                      meta={"epoch": epoch})
            # full-state resume checkpoint (snapshot history: the writer
            # runs on the background thread)
            ckpt.save(state_path,
                      {"params": host_params,
                       "opt_state": jax.device_get(opt_state)},
                      meta={"epoch": epoch, "history": list(history)})
    ckpt.flush()
    return {"params": params, "history": history}
