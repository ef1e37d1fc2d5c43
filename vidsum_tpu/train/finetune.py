"""Supervised finetuning driver — the reference's ``src/train.py`` protocol,
restructured around jitted steps and static-shape batches.

Protocol (reference: ``src/train.py:21-108``): per DSNet fold — fixed seed,
fresh model, Adam(+coupled wd), optional pretrained warm start, epoch loop of
masked-MSE train steps and a val pass (sigmoid scores → KTS/knapsack summary →
F/τ/ρ), per-fold **max over epochs** of each metric, then the mean across
folds. A summary JSON export runs once per fold like ``train.py:77``.

TPU-native deltas (each deliberate; SURVEY.md §7):
- batches are padded to static length buckets so XLA compiles a handful of
  programs instead of one per batch shape;
- no AMP GradScaler (bf16 path has fp32 exponent range);
- checkpoints are msgpack pytrees; the reference's *unconditional* crash-prone
  ``model_mae.pth`` load (train.py:76) is opt-in via
  ``TrainConfig.warm_start_from_save``.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vidsum_tpu.config import Config
from vidsum_tpu.data.collate import item_weights, make_batches, pad_batch
from vidsum_tpu.data.datasets import TSDataset
from vidsum_tpu.models.simnet import count_params, init_simnet
from vidsum_tpu.ops.metrics import eval_metrics
from vidsum_tpu.train.checkpoint import (
    AsyncCheckpointer, load_checkpoint, start_host_copy,
)
from vidsum_tpu.train.steps import (
    make_eval_forward, make_finetune_step, make_optimizer,
)
from vidsum_tpu.utils.meters import AverageMeter

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class FinetuneResult:
    fscore: float
    kendall_tau: float
    spearman_rho: float
    per_split: List[Dict[str, float]]


def _train_epoch(step_fn, params, opt_state, dataset, cfg, rng_np, rng_jax,
                 pad_to_batch: bool = False, epoch_batches=None,
                 put_batch=None):
    """One epoch. ``rng_np``/``rng_jax`` are per-epoch streams derived by
    folding (split, epoch) into the seed — a resumed run therefore replays
    the exact shuffle and dropout bits of an uninterrupted one.

    ``epoch_batches`` (optional) — an explicit list of index batches that
    REPLACES the shuffled order, e.g. the realized permutation of the
    reference's torch ``DataLoader(shuffle=True)`` (train.py:58-64) for
    driver-level lockstep comparison (tests/test_reference_protocol_differential.py).

    ``put_batch`` (optional) — device-placement hook; multi-process runs
    pass ``parallel.distributed.put_batch`` so each host materializes only
    its addressable batch shards.
    """
    loss_avg = AverageMeter()
    step_losses = []
    batches = (epoch_batches if epoch_batches is not None else
               make_batches(len(dataset), cfg.train.batch_size,
                            shuffle=True, rng=rng_np,
                            pad_to_batch=pad_to_batch))
    put = put_batch or (lambda *arrays: tuple(
        jnp.asarray(a) if a is not None else None for a in arrays))
    for batch_idx in batches:
        feats, tgts = zip(*[dataset[i] for i in batch_idx])
        x, t, mask = pad_batch(feats, tgts, pad_value=cfg.data.pad_value,
                               bucket=cfg.data.length_bucket)
        rng_jax, sub = jax.random.split(rng_jax)
        # Under pad_to_batch the final chunk cycles its own indices to the
        # static batch size; weights are always passed (all-ones on full
        # batches) so every step runs the same compiled program, and the
        # zero-weighted repeats make the padded batch's loss and grads
        # exactly the reference's smaller-final-batch semantics.
        w = item_weights(batch_idx) if pad_to_batch else None
        x, t, mask, w = put(x, t, mask, w)
        params, opt_state, loss = step_fn(params, opt_state, x, t, mask,
                                          sub, w)
        # keep the loss on device: a float() here would force a blocking
        # host fetch per step (the axon relay charges ~ms per sync) and
        # serialize the dispatch pipeline. One stacked fetch per epoch.
        step_losses.append(loss)
    for l in (np.asarray(jnp.stack(step_losses)) if step_losses else ()):
        loss_avg.update(float(l), 1)
    return params, opt_state, loss_avg.avg(), rng_jax


def _val_epoch(fwd, params, dataset, cfg, val_batch: int = 8):
    """Sigmoid scores per video → eval_metrics (reference train.py:134-152).

    Videos are grouped by padded length bucket and scored in batches — one
    device dispatch per group instead of one per video (mask invariance
    guarantees per-video results are unchanged; tests/test_model.py).
    """
    from collections import defaultdict

    from vidsum_tpu.data.collate import bucket_length

    groups = defaultdict(list)
    for i in range(len(dataset)):
        n = dataset[i][0].shape[0]
        groups[bucket_length(n, cfg.data.length_bucket)].append(i)

    score_dict, user_dict = {}, {}
    loss_avg = AverageMeter()
    for bucket in sorted(groups):
        idxs = groups[bucket]
        for start in range(0, len(idxs), val_batch):
            chunk = idxs[start:start + val_batch]
            items = [dataset[i] for i in chunk]
            x, _, mask = pad_batch([it[0] for it in items],
                                   [it[1] for it in items],
                                   pad_value=cfg.data.pad_value,
                                   bucket=cfg.data.length_bucket)
            preds = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(mask)))
            for row, (feats, target, user) in zip(preds, items):
                pred = row[: feats.shape[0]]
                loss_avg.update(float(np.mean((pred - target) ** 2)), 1)
                score_dict[user.name] = pred
                user_dict[user.name] = user
    f, k, s = eval_metrics(score_dict, user_dict,
                           eval_method=cfg.eval.eval_method,
                           budget_ratio=cfg.eval.budget_ratio,
                           impl=cfg.eval.impl)
    return loss_avg.avg(), f, k, s


def finetune(cfg: Config, splits: Sequence[Dict[str, List[str]]],
             workdir: str = ".",
             export_summary: bool = True,
             profile_dir: Optional[str] = None,
             resume: bool = False,
             metrics_path: Optional[str] = None,
             mesh=None, batch_order=None) -> FinetuneResult:
    """Run the full 5-fold finetune + eval protocol. Returns fold-averaged
    max-over-epoch metrics (reference train.py:98-108).

    - ``profile_dir``: trace the first epoch of the first fold (jax.profiler).
    - ``resume``: restart from ``train_state.ckpt`` (full state: params,
      optimizer, epoch, per-fold metric history — unlike the reference's
      weight-only ``model_mae.pth``, which cannot resume, train.py:76,95).
    - ``metrics_path``: append one JSON line per epoch.
    - ``mesh``: a ``jax.sharding.Mesh`` with (data, model) axes — the train
      step then runs dp×tp over it (the north star's data-parallel training
      loop; the batch is padded to a multiple of the data axis).
    - ``batch_order``: torch-shuffle-compat mode —
      ``batch_order(split_idx, epoch) -> [[i, ...], ...]`` supplies the
      exact per-epoch train batch order (e.g. captured from the reference
      DataLoader's realized permutation) instead of our np shuffle, so the
      composed protocol can be raced one-to-one against the reference's
      ``train.py:21-108`` driver loop.
    """
    from vidsum_tpu.parallel.distributed import is_coordinator
    from vidsum_tpu.utils.metrics_log import MetricsLogger
    from vidsum_tpu.utils.profiling import trace

    # multi-controller discipline (parallel/distributed.py): every process
    # runs this same loop on the same data order; only the coordinator
    # writes files, and batches enter the mesh via per-process shards
    coord = is_coordinator()
    if coord and workdir:
        os.makedirs(workdir, exist_ok=True)
    put = None
    if mesh is not None and jax.process_count() > 1:
        from vidsum_tpu.parallel.distributed import put_batch as _put_batch
        put = lambda *arrays: _put_batch(mesh, *arrays)  # noqa: E731

    metrics = MetricsLogger(metrics_path if coord else None)
    ckpt = AsyncCheckpointer()
    state_path = os.path.join(workdir, "train_state.ckpt")
    resume_meta = None
    if resume and os.path.exists(state_path + ".meta.json"):
        import json
        with open(state_path + ".meta.json") as f:
            resume_meta = json.load(f)
        logger.info("resuming from split %d epoch %d", resume_meta["split"],
                    resume_meta["epoch"] + 1)

    avg_f, avg_k, avg_s = AverageMeter(), AverageMeter(), AverageMeter()
    per_split = list(resume_meta["per_split"]) if resume_meta else []
    for sb in per_split:
        avg_f.update(sb["fscore"], 1)
        if not np.isnan(sb["kendall_tau"]):
            avg_k.update(sb["kendall_tau"], 1)
            avg_s.update(sb["spearman_rho"], 1)

    optimizer = make_optimizer(cfg.train.lr, cfg.train.weight_decay)
    if mesh is not None:
        if cfg.train.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} not divisible by the "
                f"data axis ({mesh.shape['data']})")
        if mesh.shape.get("model", 1) == 1 and jax.default_backend() == "tpu":
            # pure dp on real chips: the shard_map step keeps the fused
            # Pallas kernels (GSPMD cannot partition pallas_call)
            from vidsum_tpu.parallel.dp_shardmap import (
                make_dp_shardmap_finetune_step,
            )
            sharded_init = None
            step_fn = make_dp_shardmap_finetune_step(cfg.model, optimizer,
                                                     mesh)
        else:
            from vidsum_tpu.parallel.train_parallel import (
                make_sharded_finetune_step,
            )
            sharded_init, step_fn = make_sharded_finetune_step(
                cfg.model, optimizer, mesh)
    else:
        sharded_init = None
        attn_impl = cfg.train.attn_impl
        if attn_impl == "auto":
            attn_impl = ("pallas_block" if jax.default_backend() == "tpu"
                         else "xla")
        step_fn = make_finetune_step(cfg.model, optimizer,
                                     attn_impl=attn_impl)
    eval_impl = ("pallas_block" if jax.default_backend() == "tpu" else "xla")
    fwd = make_eval_forward(cfg.model, attn_impl=eval_impl)

    start_split = resume_meta["split"] if resume_meta else 0
    for split_idx, split in enumerate(splits):
        if split_idx < start_split:
            continue
        logger.info("Split %d", split_idx + 1)
        ckpt.flush()  # checkpoint files may be read back below
        # init stays on the default PRNG (stable param values across rng_impl
        # choices); the dropout stream uses the configured implementation
        _, init_key = jax.random.split(jax.random.PRNGKey(cfg.train.seed))
        rng_base = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)
        params = init_simnet(init_key, cfg.model)

        pretrain_path = os.path.join(workdir, cfg.train.pretrain_ckpt)
        if cfg.train.use_pretrained and os.path.exists(pretrain_path):
            params, _ = load_checkpoint(pretrain_path, params)
            logger.info("loaded pretrained encoder from %s", pretrain_path)
        save_path = os.path.join(workdir, cfg.train.save_ckpt)
        if cfg.train.warm_start_from_save and os.path.exists(save_path):
            params, _ = load_checkpoint(save_path, params)

        if sharded_init is not None:
            params, opt_state = sharded_init(params)
        else:
            opt_state = optimizer.init(params)

        logger.info("model has %d parameters", count_params(params))

        train_set = TSDataset(cfg.data.root, cfg.data.ex_dataset,
                              cfg.data.datasets, split["train_keys"],
                              split="train",
                              min_frames=cfg.data.min_train_frames,
                              path_scheme=cfg.data.path_scheme)
        val_set = TSDataset(cfg.data.root, cfg.data.ex_dataset,
                            cfg.data.datasets, split["test_keys"], split="val",
                            path_scheme=cfg.data.path_scheme)

        if export_summary and coord:
            from vidsum_tpu.export.summary_json import write_summary_json
            write_summary_json(fwd, params, val_set, cfg,
                               os.path.join(workdir, "summary.json"))

        fs, ks, ss = [], [], []
        start_epoch = 0
        if resume_meta and split_idx == resume_meta["split"]:
            state = {"params": params, "opt_state": opt_state}
            state, _ = load_checkpoint(state_path, state)
            params, opt_state = state["params"], state["opt_state"]
            fs = list(resume_meta["fs"])
            ks = list(resume_meta["ks"])
            ss = list(resume_meta["ss"])
            start_epoch = resume_meta["epoch"] + 1
            resume_meta = None
        for epoch in range(start_epoch, cfg.train.max_epoch):
            t0 = time.time()
            # per-(split, epoch) streams → exact replay under resume
            rng_np = np.random.default_rng(
                (cfg.train.seed, split_idx, epoch))
            rng_epoch = jax.random.fold_in(
                jax.random.fold_in(rng_base, split_idx), epoch)
            with trace(profile_dir if split_idx == 0 and epoch == 0 else None):
                params, opt_state, train_loss, _ = _train_epoch(
                    step_fn, params, opt_state, train_set, cfg, rng_np,
                    rng_epoch, pad_to_batch=mesh is not None,
                    epoch_batches=(batch_order(split_idx, epoch)
                                   if batch_order is not None else None),
                    put_batch=put)
            last_epoch = epoch == cfg.train.max_epoch - 1
            save_state = coord and ((epoch + 1) % max(
                cfg.train.state_save_every, 1) == 0 or last_epoch)
            save_model = coord and ((epoch + 1) % max(
                cfg.train.model_save_every, 1) == 0 or last_epoch)
            # start the device→host checkpoint copies before the val pass so
            # the ~15 MB/s relay transfer overlaps the val dispatches
            if save_model or save_state:
                start_host_copy(params)
            if save_state:
                start_host_copy(opt_state)
            val_loss, f, k, s = _val_epoch(fwd, params, val_set, cfg)
            fs.append(f)
            if not (np.isnan(k) or np.isnan(s)):
                ks.append(k)
                ss.append(s)
            logger.info("Epoch %d: train %.4f val %.4f F %.2f τ %.4f ρ %.4f "
                        "(%.1fs)", epoch, train_loss, val_loss, f, k, s,
                        time.time() - t0)
            metrics.log({"split": split_idx, "epoch": epoch,
                         "train_loss": train_loss, "val_loss": val_loss,
                         "fscore": f, "kendall_tau": k, "spearman_rho": s})
            # one device→host fetch for both files (params would otherwise
            # be pulled twice through the relay); encode+write overlap the
            # next epoch on the checkpointer thread
            host_params = (jax.device_get(params)
                           if save_model or save_state else None)
            if save_model:
                ckpt.save(save_path, host_params,
                          meta={"epoch": epoch, "split": split_idx})
            if save_state:
                ckpt.save(
                    state_path,
                    {"params": host_params,
                     "opt_state": jax.device_get(opt_state)},
                    meta={"epoch": epoch, "split": split_idx,
                          # snapshot: the checkpointer json-serializes meta
                          # on its background thread while this loop keeps
                          # appending; live references would let a lagging
                          # writer record lists inconsistent with 'epoch'
                          "per_split": list(per_split), "fs": list(fs),
                          "ks": list(ks), "ss": list(ss)})

        split_best = {"fscore": max(fs), "kendall_tau": max(ks) if ks else float("nan"),
                      "spearman_rho": max(ss) if ss else float("nan")}
        per_split.append(split_best)
        avg_f.update(split_best["fscore"], 1)
        if ks:
            avg_k.update(split_best["kendall_tau"], 1)
            avg_s.update(split_best["spearman_rho"], 1)

    ckpt.flush()
    result = FinetuneResult(avg_f.avg(),
                            avg_k.avg() if avg_k.num else float("nan"),
                            avg_s.avg() if avg_s.num else float("nan"),
                            per_split)
    logger.info("Total fscore: %.4f  τ: %.4f  ρ: %.4f", result.fscore,
                result.kendall_tau, result.spearman_rho)
    metrics.log({"final_fscore": result.fscore,
                 "final_kendall_tau": result.kendall_tau,
                 "final_spearman_rho": result.spearman_rho})
    metrics.close()
    return result
