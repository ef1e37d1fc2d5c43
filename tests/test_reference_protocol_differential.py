"""Protocol-level differential: race the reference's OWN driver loops
end-to-end against ours (VERDICT r2 #1).

Rounds 1-2 proved that every *function* (eval/KTS/scheduler) and every
*step* (30/50 Adam steps, the 3-loss pretrain objective) matches the
reference — but the composed driver loops never ran head-to-head. Here the
actual ``/root/reference/src/train.py`` ``main()`` (per-fold seed → warm
start from ``model_mae.pth`` → epoch loop → per-epoch save → max-over-epochs
→ fold mean, train.py:21-108) and ``src/pretrain.py`` ``main()``
(pretrain.py:14-87) are EXECUTED on CPU against a tiny synthetic h5/npy
fixture, and ``vidsum_tpu.train.finetune``/``pretrain`` are raced one-to-one
under torch-shuffle-compat mode: the realized permutation of the reference's
``DataLoader(shuffle=True)`` is captured per epoch and replayed as our batch
order, so any divergence is a *protocol* bug (fold bookkeeping, chained
``model_mae`` warm starts, epoch ordering, loss accumulation, metric
aggregation), not a data-order artifact.

Harness shims (none touch semantics):
- ``wandb`` is stubbed (not installed here; reference only calls
  ``wandb.finish()``, train.py:104);
- ``Module.cuda``/``Tensor.cuda`` are no-opped (CPU box; the reference's
  ``device`` falls back to cpu everywhere else, train.py:22);
- ``DataLoader`` is rebuilt with ``num_workers=0`` and an index-recording
  dataset wrapper — the sampler (and therefore the realized order) lives in
  the parent process either way;
- ``model_mae.pth`` is fabricated from OUR initial params (the reference
  loads it unconditionally at train.py:76 and would crash without it), so
  both drivers start every fold chain from identical weights.

Skips when the reference tree is absent.
"""

import json
import logging
import os
import re
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
REF_SRC = os.path.join(REF_ROOT, "src")
_ref_present = os.path.isfile(os.path.join(REF_SRC, "train.py"))
pytestmark = pytest.mark.skipif(not _ref_present,
                                reason="reference repo not present")

import jax
import torch

from vidsum_tpu.config import (
    Config, DataConfig, EvalConfig, ModelConfig, PretrainConfig, TrainConfig,
)
from vidsum_tpu.data import PATH
from vidsum_tpu.data.datasets import PreTrainDataset
from vidsum_tpu.data.synthetic import (
    make_synthetic_h5, make_synthetic_pretrain_tree,
)
from vidsum_tpu.models import init_simnet
from vidsum_tpu.models.pretrain import init_pretrain_model
from vidsum_tpu.models.torch_convert import simnet_to_torch_state
from vidsum_tpu.train import finetune, pretrain, save_checkpoint

# small-but-real architecture: 2 layers keeps the race fast while still
# exercising the full encoder stack; dropout 0 removes the only
# uncontrollable RNG difference between frameworks
CFG_M = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.0,
                    max_len=2000)
LR, WD, BS, EPOCHS = 1e-3, 1e-2, 4, 3


def _import_reference_module(name):
    """Import a reference driver module (absolute sibling imports → REF_SRC
    on sys.path; module-level parse_args → argv patched; wandb stubbed)."""
    if REF_SRC not in sys.path:
        sys.path.append(REF_SRC)
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.SimpleNamespace(
            finish=lambda *a, **k: None, init=lambda *a, **k: None)
    argv = sys.argv
    # module-level parse_args; pretrain.py marks --data required
    sys.argv = [f"{name}.py", "--data", "unused"]
    try:
        import importlib
        return importlib.import_module(name)
    finally:
        sys.argv = argv


class _RecordingDataset(torch.utils.data.Dataset):
    """Passthrough that logs every fetched index (the realized order)."""

    def __init__(self, ds, log):
        self.ds, self.log = ds, log

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        self.log.append(i)
        return self.ds[i]


def _patch_cuda(monkeypatch):
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)


def _ref_simnet(params):
    """The actual reference SimNet carrying our converted params (same
    pattern as tests/test_reference_model_differential.py)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from src.model.simnet import SimNet as RefSimNet
    torch.manual_seed(0)
    model = RefSimNet(num_heads=CFG_M.num_heads, d_model=CFG_M.d_model,
                      num_layers=CFG_M.num_layers, sparsity=0.0,
                      use_cls=False, dropout=CFG_M.dropout, num_classes=1,
                      use_pos=True)
    state = {k: torch.tensor(np.ascontiguousarray(v))
             for k, v in simnet_to_torch_state(params).items()}
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected
    assert missing == ["embedding_layer.positional_encoding.pos_embedding"]
    return model


@pytest.fixture(scope="module")
def protocol_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("protodata")
    make_synthetic_h5(str(root / PATH["tvsum"]), n_videos=8, seed=99,
                      min_picks=60, max_picks=120)
    return str(root)


SPLITS = [
    {"train_keys": [f"h.h5/video_{i}" for i in (0, 1, 2, 3, 4, 5)],
     "test_keys": ["h.h5/video_6", "h.h5/video_7"]},
    {"train_keys": [f"h.h5/video_{i}" for i in (2, 3, 4, 5, 6, 7)],
     "test_keys": ["h.h5/video_0", "h.h5/video_1"]},
]


def test_finetune_protocol_races_reference_main(protocol_root, tmp_path,
                                                monkeypatch, caplog):
    """The composed finetune protocol — 2 folds × 3 epochs with the
    reference's *chained* ``model_mae`` warm starts — must track the
    reference ``main()`` on per-epoch train/val losses, the per-epoch
    F/τ/ρ sequences, and the final fold-averaged metrics."""
    _patch_cuda(monkeypatch)
    ref_train = _import_reference_module("train")

    ref_cwd = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_cwd.mkdir()
    our_dir.mkdir()

    # identical starting weights on both sides: the reference main() loads
    # model_mae.pth unconditionally (train.py:76), our driver loads
    # model_mae.ckpt under warm_start_from_save — fabricate both from one
    # init (the .pth via a reference model instance so it carries the PE
    # buffer the strict load requires)
    params0 = init_simnet(jax.random.PRNGKey(42), CFG_M)
    torch.save(_ref_simnet(params0).state_dict(), ref_cwd / "model_mae.pth")
    save_checkpoint(str(our_dir / "model_mae.ckpt"), params0)

    # ---- reference run (recorded) ----
    fold_orders = []       # one flat index log per fold
    ref_train_losses = []  # per epoch, across folds
    ref_val = []           # (val_loss, f, ktau, spr) per epoch

    def loader_factory(dataset=None, shuffle=False, num_workers=0,
                       collate_fn=None, batch_size=1, **kw):
        ref_data = sys.modules["data"]
        if collate_fn is ref_data.collate_fn_train:
            fold_orders.append([])
            dataset = _RecordingDataset(dataset, fold_orders[-1])
        return torch.utils.data.DataLoader(
            dataset=dataset, shuffle=shuffle, num_workers=0,
            collate_fn=collate_fn, batch_size=batch_size, **kw)

    orig_train_step = ref_train.train_step
    orig_val_step = ref_train.val_step

    def rec_train_step(*a, **k):
        loss = orig_train_step(*a, **k)
        ref_train_losses.append(loss)
        return loss

    def rec_val_step(*a, **k):
        out = orig_val_step(*a, **k)
        ref_val.append(out)
        return out

    monkeypatch.setattr(ref_train, "DataLoader", loader_factory)
    monkeypatch.setattr(ref_train, "train_step", rec_train_step)
    monkeypatch.setattr(ref_train, "val_step", rec_val_step)
    monkeypatch.chdir(ref_cwd)

    args = types.SimpleNamespace(
        num_heads=CFG_M.num_heads, d_model=CFG_M.d_model,
        num_layers=CFG_M.num_layers, dropout=CFG_M.dropout,
        lr=LR, weight_decay=WD, data=protocol_root, ex_dataset="tvsum",
        datasets="tvsum", batch_size=BS, max_epoch=EPOCHS, use_model=False)
    with caplog.at_level(logging.INFO):
        ref_train.main(args, SPLITS)
    monkeypatch.chdir(tmp_path)

    def logged(prefix):
        for rec in caplog.records:
            m = re.match(rf"{prefix}\s*([-0-9.e]+)", rec.getMessage())
            if m:
                return float(m.group(1))
        raise AssertionError(f"no log line matching {prefix!r}")

    ref_mean_f = logged("Total fscore:")
    ref_mean_k = logged("Kendall_tau:")
    ref_mean_s = logged("Spearsman_r:")

    assert len(fold_orders) == len(SPLITS)
    assert len(ref_train_losses) == len(SPLITS) * EPOCHS
    n_train = len(SPLITS[0]["train_keys"])
    for log in fold_orders:
        assert len(log) == EPOCHS * n_train

    # ---- our run, replaying the reference's realized batch order ----
    def batch_order(split_idx, epoch):
        flat = fold_orders[split_idx][epoch * n_train:(epoch + 1) * n_train]
        return [flat[s:s + BS] for s in range(0, n_train, BS)]

    cfg = Config(
        model=CFG_M,
        data=DataConfig(root=protocol_root, ex_dataset="tvsum",
                        datasets="tvsum", length_bucket=128),
        eval=EvalConfig(),
        train=TrainConfig(lr=LR, weight_decay=WD, batch_size=BS,
                          max_epoch=EPOCHS, warm_start_from_save=True,
                          model_save_every=1, state_save_every=1),
    )
    metrics_path = str(our_dir / "metrics.jsonl")
    result = finetune(cfg, SPLITS, workdir=str(our_dir),
                      export_summary=True, metrics_path=metrics_path,
                      batch_order=batch_order)

    with open(metrics_path) as f:
        ours = [json.loads(l) for l in f if l.strip()]
    ours = [r for r in ours if "epoch" in r]
    assert len(ours) == len(SPLITS) * EPOCHS

    our_train_losses = [r["train_loss"] for r in ours]
    np.testing.assert_allclose(our_train_losses, ref_train_losses, rtol=2e-3,
                               err_msg="per-epoch train losses diverge")

    ref_val_losses = [v[0] for v in ref_val]
    our_val_losses = [r["val_loss"] for r in ours]
    np.testing.assert_allclose(our_val_losses, ref_val_losses, rtol=2e-3,
                               err_msg="per-epoch val losses diverge")

    # F rides the knapsack SELECTION (bit-parity fuzzed) → tight; τ/ρ are
    # rank correlations over f32 scores, where ~1e-5 prediction drift flips
    # near-tied frame ranks — discrete jumps no continuous tolerance covers,
    # so they get an absolute band instead (observed drift ~1e-3)
    np.testing.assert_allclose([r["fscore"] for r in ours],
                               [v[1] for v in ref_val], rtol=1e-3,
                               err_msg="per-epoch fscore sequence")
    for key, col in (("kendall_tau", 2), ("spearman_rho", 3)):
        np.testing.assert_allclose([r[key] for r in ours],
                                   [v[col] for v in ref_val], atol=3e-3,
                                   err_msg=f"per-epoch {key} sequence")

    # fold-averaged maxima: the reference's own AverageMeter bookkeeping
    # (train.py:98-108, parsed from its log) vs FinetuneResult
    np.testing.assert_allclose(result.fscore, ref_mean_f, rtol=1e-3)
    np.testing.assert_allclose(result.kendall_tau, ref_mean_k, atol=3e-3)
    np.testing.assert_allclose(result.spearman_rho, ref_mean_s, atol=3e-3)

    # summary.json (written once per fold, last fold wins — train.py:77):
    # the reference names videos by its SHUFFLED val enumeration order, so
    # compare the selected-frame lists as multisets
    with open(ref_cwd / "summary.json") as f:
        ref_summary = json.load(f)
    with open(our_dir / "summary.json") as f:
        our_summary = json.load(f)
    assert sorted(map(tuple, ref_summary.values())) == \
        sorted(map(tuple, our_summary.values()))


def test_pretrain_protocol_races_reference_main(tmp_path, monkeypatch,
                                                caplog):
    """The composed pretrain protocol — shuffled drop-last batches, the
    13000-numerator cosine-warmup scheduler stepping INSIDE the batch loop,
    encoder-only Adam — must track the reference ``pretrain.py`` ``main()``
    on every realized per-step loss triple and per-epoch total."""
    _patch_cuda(monkeypatch)
    ref_pt = _import_reference_module("pretrain")

    root = str(tmp_path / "pt")
    make_synthetic_pretrain_tree(root, n_videos=9, min_frames=40,
                                 max_frames=90, seed=7)

    # ours (sorted glob) and the reference (raw glob) may order videos
    # differently → map reference indices to ours by matching the arrays
    our_ds = PreTrainDataset(root)

    pcfg = PretrainConfig(lr=1e-2, weight_decay=5e-4, batch_size=2,
                          epochs=2, warmup_epochs=50,
                          scheduler_samples=13000, save_every=1)
    # start all three runs (torch reference, our driver, the step replay)
    # from the DRIVER'S own init so its returned history is comparable
    _, init_key = jax.random.split(jax.random.PRNGKey(pcfg.seed))
    params0 = init_pretrain_model(init_key, CFG_M)

    # intercept the model factory: load OUR init into the real
    # PretrainModel and record each forward's loss triple
    ref_steps = []
    orig_pm = ref_pt.PretrainModel

    def pm_factory(**kwargs):
        model = orig_pm(**kwargs)
        enc_state = {f"encoder.{k}": torch.tensor(np.ascontiguousarray(v))
                     for k, v in
                     simnet_to_torch_state(params0["encoder"]).items()}
        enc_state["video_transform.weight"] = torch.tensor(
            np.asarray(params0["video_transform"]["w"]).T.copy())
        enc_state["video_transform.bias"] = torch.tensor(
            np.asarray(params0["video_transform"]["b"]))
        missing, unexpected = model.load_state_dict(enc_state, strict=False)
        assert not unexpected
        orig_forward = model.forward

        def rec_forward(*a, **k):
            out = orig_forward(*a, **k)
            ref_steps.append([float(x) for x in out])
            return out

        model.forward = rec_forward
        return model

    order_log = []

    def loader_factory(dataset=None, shuffle=False, num_workers=0,
                       collate_fn=None, batch_size=1, drop_last=False, **kw):
        dataset = _RecordingDataset(dataset, order_log)
        return torch.utils.data.DataLoader(
            dataset=dataset, shuffle=shuffle, num_workers=0,
            collate_fn=collate_fn, batch_size=batch_size,
            drop_last=drop_last, **kw)

    monkeypatch.setattr(ref_pt, "PretrainModel", pm_factory)
    monkeypatch.setattr(ref_pt, "DataLoader", loader_factory)
    monkeypatch.chdir(tmp_path)

    args = types.SimpleNamespace(
        data=root, batch_size=pcfg.batch_size, d_model=CFG_M.d_model,
        use_pos=True, num_layers=CFG_M.num_layers,
        num_heads=CFG_M.num_heads, dropout=0.0, sparsity=0.0,
        lr=pcfg.lr, weight_decay=pcfg.weight_decay, epochs=pcfg.epochs)
    with caplog.at_level(logging.INFO):
        ref_pt.main(args)

    # rebuild the reference dataset (same glob order within one process)
    # to map its indices onto ours by exact array match
    ref_ds_items = ref_pt.PreTrainDataset(root)
    ref_to_ours = []
    for feats, _ in ref_ds_items.data:
        fnp = np.asarray(feats)
        matches = [j for j in range(len(our_ds))
                   if our_ds[j][0].shape == fnp.shape
                   and np.array_equal(our_ds[j][0], fnp)]
        assert len(matches) == 1
        ref_to_ours.append(matches[0])

    n = len(our_ds)
    per_epoch = n  # DataLoader draws every index; drop_last trims BATCHES
    steps_per_epoch = n // pcfg.batch_size
    # NB: with drop_last the loader still *samples* a full permutation but
    # only fetches complete batches → the log carries exactly the fetched
    # indices
    fetched_per_epoch = steps_per_epoch * pcfg.batch_size
    assert len(order_log) == pcfg.epochs * fetched_per_epoch
    assert len(ref_steps) == pcfg.epochs * steps_per_epoch

    def batch_order(epoch):
        flat = order_log[epoch * fetched_per_epoch:
                         (epoch + 1) * fetched_per_epoch]
        flat = [ref_to_ours[i] for i in flat]
        return [flat[s:s + pcfg.batch_size]
                for s in range(0, fetched_per_epoch, pcfg.batch_size)]

    # ---- our run ----
    our_steps = []
    cfg = Config(model=CFG_M, data=DataConfig(root=root, length_bucket=128),
                 pretrain=pcfg)
    our_pt_dir = tmp_path / "ours_pt"
    our_pt_dir.mkdir()
    out = pretrain(cfg, our_ds, workdir=str(our_pt_dir),
                   batch_order=batch_order)

    # our driver logs the per-4-step breakdown; recompute per-step losses by
    # replaying the steps? No — the driver already returns per-epoch means
    # of per-step totals; for the step-level race use the recorded torch
    # triples vs a replay of our step over the same order.
    from vidsum_tpu.train.steps import make_optimizer, make_pretrain_step
    import jax.numpy as jnp
    from vidsum_tpu.data.collate import pad_batch_pretrain
    from vidsum_tpu.train.schedule import reference_pretrain_schedule

    steps_sched = max(pcfg.scheduler_samples // pcfg.batch_size, 1)
    schedule = reference_pretrain_schedule(pcfg.lr, steps_sched,
                                           pcfg.warmup_epochs, pcfg.epochs)
    optimizer = make_optimizer(schedule, pcfg.weight_decay)
    step = make_pretrain_step(CFG_M, pcfg, optimizer)
    params = jax.tree_util.tree_map(lambda a: a, params0)
    opt_state = optimizer.init(params)
    for epoch in range(pcfg.epochs):
        for batch in batch_order(epoch):
            feats, reps = zip(*[our_ds[j] for j in batch])
            x, v, mask = pad_batch_pretrain(feats, reps, bucket=128)
            params, opt_state, (tot, ma, ce, re_) = step(
                params, opt_state, jnp.asarray(x), jnp.asarray(v),
                jnp.asarray(mask), jax.random.PRNGKey(epoch))
            our_steps.append([float(ma), float(ce), float(re_)])

    np.testing.assert_allclose(np.asarray(our_steps),
                               np.asarray(ref_steps), rtol=3e-3, atol=2e-5,
                               err_msg="per-step pretrain loss triples")

    # the driver's own run over the same order must realize the same
    # per-epoch mean of per-step totals that the replay produced
    weights = np.array([1.0, pcfg.center_weight, pcfg.repel_weight])
    replay_totals = (np.asarray(our_steps) * weights).sum(axis=1)
    replay_epoch_means = replay_totals.reshape(pcfg.epochs, -1).mean(axis=1)
    np.testing.assert_allclose(out["history"], replay_epoch_means, rtol=1e-4)
