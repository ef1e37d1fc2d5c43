import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from vidsum_tpu.config import (
    Config, DataConfig, ModelConfig, PretrainConfig, TrainConfig,
)
from vidsum_tpu.data import PATH, TSDataset
from vidsum_tpu.data.synthetic import (
    make_synthetic_h5, make_synthetic_pretrain_tree,
)
from vidsum_tpu.models import init_simnet
from vidsum_tpu.train import (
    finetune, load_checkpoint, make_eval_forward, pretrain, save_checkpoint,
)
from vidsum_tpu.data.datasets import PreTrainDataset

TINY_MODEL = ModelConfig(d_model=32, num_heads=4, num_layers=1, dropout=0.1,
                         max_len=256)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    make_synthetic_h5(str(root / PATH["tvsum"]), n_videos=6, seed=11)
    return str(root)


def tiny_config(data_root, **train_kwargs) -> Config:
    train_kwargs.setdefault("max_epoch", 2)
    return Config(
        model=TINY_MODEL,
        data=DataConfig(root=data_root, ex_dataset="tvsum", datasets="tvsum",
                        length_bucket=128),
        train=TrainConfig(lr=1e-3, weight_decay=1e-4, batch_size=2,
                          **train_kwargs),
    )


def test_checkpoint_roundtrip(tmp_path):
    params = init_simnet(jax.random.PRNGKey(0), TINY_MODEL)
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, params, meta={"epoch": 3})
    zeros = jax.tree_util.tree_map(np.zeros_like, params)
    restored, meta = load_checkpoint(path, zeros)
    assert meta == {"epoch": 3}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpointer(tmp_path):
    """Queued writes land atomically; same-path saves keep submission order;
    flush surfaces worker failures."""
    import pytest

    from vidsum_tpu.train import AsyncCheckpointer

    params = init_simnet(jax.random.PRNGKey(0), TINY_MODEL)
    host = jax.device_get(params)
    path = str(tmp_path / "ck.msgpack")
    ckpt = AsyncCheckpointer()
    stale = jax.tree_util.tree_map(np.zeros_like, host)
    ckpt.save(path, stale, meta={"epoch": 0})
    ckpt.save(path, host, meta={"epoch": 1})  # last write must win
    ckpt.flush()
    zeros = jax.tree_util.tree_map(np.zeros_like, params)
    restored, meta = load_checkpoint(path, zeros)
    assert meta == {"epoch": 1}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ckpt.save(str(tmp_path / "no_dir" / "x.ckpt"), host)  # unwritable path
    with pytest.raises(Exception):
        ckpt.flush()


def test_finetune_micro_train(data_root, tmp_path):
    """2-epoch micro-train: loss decreases, metrics come out, ckpt written."""
    cfg = tiny_config(data_root)
    splits = [{
        "train_keys": [f"x.h5/video_{i}" for i in range(4)],
        "test_keys": ["x.h5/video_4", "x.h5/video_5"],
    }]
    # nonexistent nested workdir: the driver must create it (regression —
    # round 4 verify drive crashed on the first summary.json write)
    tmp_path = tmp_path / "nested" / "run"
    result = finetune(cfg, splits, workdir=str(tmp_path))
    assert 0.0 <= result.fscore <= 100.0
    assert len(result.per_split) == 1
    assert os.path.exists(tmp_path / cfg.train.save_ckpt)
    assert os.path.exists(tmp_path / "summary.json")
    with open(tmp_path / "summary.json") as f:
        summary = json.load(f)
    assert set(summary) == {"video_0", "video_1"}


def test_finetune_loss_decreases(data_root, tmp_path):
    """Learnable synthetic gtscore → train loss must drop over epochs."""
    import logging
    from vidsum_tpu.train import finetune as ft_mod  # noqa: F401
    from vidsum_tpu.train.finetune import (
        _train_epoch, make_finetune_step, make_optimizer,
    )
    import jax.numpy as jnp
    cfg = tiny_config(data_root)
    dataset = TSDataset(data_root, "tvsum", "tvsum", split="train")
    optimizer = make_optimizer(cfg.train.lr, cfg.train.weight_decay)
    step = make_finetune_step(cfg.model, optimizer)
    params = init_simnet(jax.random.PRNGKey(0), cfg.model)
    opt_state = optimizer.init(params)
    rng_np = np.random.default_rng(0)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(5):
        params, opt_state, loss, rng = _train_epoch(
            step, params, opt_state, dataset, cfg, rng_np, rng)
        losses.append(loss)
    assert losses[-1] < losses[0]


def test_pretrain_micro_train(tmp_path):
    root = str(tmp_path / "pt")
    make_synthetic_pretrain_tree(root, n_videos=6, min_frames=30,
                                 max_frames=60, seed=12)
    cfg = Config(
        model=TINY_MODEL,
        data=DataConfig(root=root, length_bucket=64),
        pretrain=PretrainConfig(lr=1e-3, batch_size=2, epochs=2,
                                warmup_epochs=1, scheduler_samples=12),
    )
    dataset = PreTrainDataset(root)
    tmp_path = tmp_path / "wd"  # nonexistent: pretrain() must create it
    out = pretrain(cfg, dataset, workdir=str(tmp_path))
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"]).all()
    # encoder checkpoint written for the finetune warm start
    assert os.path.exists(tmp_path / cfg.train.pretrain_ckpt)
    # the frozen video_transform must still hold its init values
    p0 = init_pretrain_init_values(cfg)
    got = out["params"]["video_transform"]
    np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(p0["w"]))


def init_pretrain_init_values(cfg):
    from vidsum_tpu.models.pretrain import init_pretrain_model
    rng = jax.random.PRNGKey(cfg.pretrain.seed)
    _, init_key = jax.random.split(rng)
    return init_pretrain_model(init_key, cfg.model)["video_transform"]


def test_pretrain_to_finetune_warm_start(data_root, tmp_path):
    """Weight-only handoff: finetune must load the pretrained encoder."""
    root = str(tmp_path / "pt2")
    make_synthetic_pretrain_tree(root, n_videos=4, min_frames=30,
                                 max_frames=60, seed=13)
    cfg_pt = Config(model=TINY_MODEL, data=DataConfig(root=root,
                                                      length_bucket=64),
                    pretrain=PretrainConfig(lr=1e-3, batch_size=2, epochs=1,
                                            warmup_epochs=1,
                                            scheduler_samples=8))
    pretrain(cfg_pt, PreTrainDataset(root), workdir=str(tmp_path))

    cfg_ft = tiny_config(data_root, use_pretrained=True)
    splits = [{"train_keys": [f"x/video_{i}" for i in range(4)],
               "test_keys": ["x/video_4"]}]
    result = finetune(cfg_ft, splits, workdir=str(tmp_path),
                      export_summary=False)
    assert np.isfinite(result.fscore)


def test_cli_train_smoke(data_root, tmp_path, capsys):
    split_file = tmp_path / "splits.json"
    split_file.write_text(json.dumps([{
        "train_keys": [f"x/video_{i}" for i in range(4)],
        "test_keys": ["x/video_4", "x/video_5"]}]))
    from vidsum_tpu.cli.train import main
    main(["--data", data_root, "--datasets", "tvsum", "--ex_dataset", "tvsum",
          "--d_model", "32", "--num_heads", "4", "--num_layers", "1",
          "--batch_size", "2", "--max_epoch", "1",
          "--split_path", str(split_file), "--workdir", str(tmp_path)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert {"fscore", "kendall_tau", "spearman_rho"} <= set(metrics)


def test_cli_pretrain_smoke(tmp_path):
    root = str(tmp_path / "pt3")
    make_synthetic_pretrain_tree(root, n_videos=4, min_frames=20,
                                 max_frames=40, seed=14)
    from vidsum_tpu.cli.pretrain import main
    main(["--data", root, "--d_model", "32", "--num_heads", "4",
          "--num_layers", "1", "--batch_size", "2", "--epochs", "1",
          "--length_bucket", "64", "--save", str(tmp_path)])
    assert os.path.exists(tmp_path / "pretrain.ckpt")


def test_finetune_resume(data_root, tmp_path):
    """Interrupt-and-resume: a resumed run continues from the saved epoch
    with optimizer state intact (no reference analogue: model_mae.pth is
    weight-only)."""
    splits = [{"train_keys": [f"x/video_{i}" for i in range(4)],
               "test_keys": ["x/video_4"]}]
    metrics_path = str(tmp_path / "metrics.jsonl")

    cfg2 = tiny_config(data_root)
    finetune(cfg2, splits, workdir=str(tmp_path), export_summary=False,
             metrics_path=metrics_path)
    assert os.path.exists(tmp_path / "train_state.ckpt")

    cfg4 = tiny_config(data_root)
    cfg4 = Config(model=cfg4.model, data=cfg4.data, eval=cfg4.eval,
                  train=dataclasses.replace(cfg4.train, max_epoch=4))
    result = finetune(cfg4, splits, workdir=str(tmp_path),
                      export_summary=False, resume=True,
                      metrics_path=metrics_path)
    assert np.isfinite(result.fscore)
    with open(metrics_path) as f:
        records = [json.loads(l) for l in f if l.strip()]
    epochs = [r["epoch"] for r in records if "epoch" in r]
    # first run: epochs 0,1; resumed run continues at 2,3 (no repeats)
    assert epochs == [0, 1, 2, 3]


def test_state_save_every_gating(data_root, tmp_path):
    """state_save_every=3: the full resume state lands on gate epochs and
    always on the split's last epoch; resuming from it works."""
    splits = [{"train_keys": [f"x/video_{i}" for i in range(4)],
               "test_keys": ["x/video_4"]}]
    cfg = tiny_config(data_root, max_epoch=5)
    cfg = Config(model=cfg.model, data=cfg.data, eval=cfg.eval,
                 train=dataclasses.replace(cfg.train, state_save_every=3,
                                           model_save_every=2))
    finetune(cfg, splits, workdir=str(tmp_path), export_summary=False)
    with open(tmp_path / "train_state.ckpt.meta.json") as f:
        meta = json.load(f)
    assert meta["epoch"] == 4  # final epoch always saved
    with open(tmp_path / "model_mae.ckpt.meta.json") as f:
        model_meta = json.load(f)
    assert model_meta["epoch"] == 4  # final epoch always saves (cadence 2)
    cfg7 = Config(model=cfg.model, data=cfg.data, eval=cfg.eval,
                  train=dataclasses.replace(cfg.train, max_epoch=7))
    result = finetune(cfg7, splits, workdir=str(tmp_path),
                      export_summary=False, resume=True)
    assert np.isfinite(result.fscore)


def test_finetune_augmented_mix(tmp_path):
    """Augmented/transfer config: '+'-joined datasets train together, split
    keys restrict only the experiment dataset (BASELINE config 3)."""
    root = str(tmp_path / "aug")
    os.makedirs(root)
    from vidsum_tpu.data import PATH as PATH_MAP
    for i, name in enumerate(["tvsum", "summe", "ovp", "youtube"]):
        make_synthetic_h5(os.path.join(root, PATH_MAP[name]), n_videos=3,
                          seed=30 + i)
    cfg = Config(
        model=TINY_MODEL,
        data=DataConfig(root=root, ex_dataset="tvsum",
                        datasets="tvsum+summe+ovp+youtube",
                        length_bucket=128),
        train=TrainConfig(lr=1e-3, batch_size=4, max_epoch=1),
    )
    splits = [{"train_keys": ["x/video_0", "x/video_1"],
               "test_keys": ["x/video_2"]}]
    result = finetune(cfg, splits, workdir=str(tmp_path),
                      export_summary=False)
    assert np.isfinite(result.fscore)


def test_pretrain_dataset_ready(tmp_path):
    """PreTrainDatasetReady: h5 features + per-key video reps."""
    from vidsum_tpu.data import PATH as PATH_MAP
    from vidsum_tpu.data.datasets import PreTrainDatasetReady
    root = str(tmp_path / "ready")
    make_synthetic_h5(os.path.join(root, PATH_MAP["tvsum"]), n_videos=3,
                      seed=44)
    rep_dir = os.path.join(root, "video", "tvsum")
    os.makedirs(rep_dir)
    for i in range(3):
        np.save(os.path.join(rep_dir, f"video_{i}.npy"),
                np.random.default_rng(i).normal(size=512).astype(np.float32))
    ds = PreTrainDatasetReady(root, "tvsum")
    assert len(ds) == 3
    feats, rep = ds[0]
    assert feats.shape[1] == 1024 and rep.shape == (512,)


def test_cli_pretrain_from_h5(tmp_path):
    """--from_h5 path: PreTrainDatasetReady feeding the pretrain CLI."""
    from vidsum_tpu.data import PATH as PATH_MAP
    root = str(tmp_path / "h5pt")
    make_synthetic_h5(os.path.join(root, PATH_MAP["tvsum"]), n_videos=3,
                      seed=55, min_picks=20, max_picks=40)
    rep_dir = os.path.join(root, "video", "tvsum")
    os.makedirs(rep_dir)
    for i in range(3):
        np.save(os.path.join(rep_dir, f"video_{i}.npy"),
                np.random.default_rng(i).normal(size=512).astype(np.float32))
    from vidsum_tpu.cli.pretrain import main
    main(["--data", root, "--datasets", "tvsum", "--from_h5", "--d_model",
          "32", "--num_heads", "4", "--num_layers", "1", "--batch_size", "2",
          "--epochs", "1", "--length_bucket", "64", "--save", str(tmp_path)])
    assert os.path.exists(tmp_path / "pretrain.ckpt")


def test_cli_evaluate(data_root, tmp_path, capsys):
    """Standalone eval CLI on a saved checkpoint."""
    from vidsum_tpu.train import save_checkpoint
    params = init_simnet(jax.random.PRNGKey(0), TINY_MODEL)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params)
    from vidsum_tpu.cli.evaluate import main
    main(["--data", data_root, "--ex_dataset", "tvsum", "--ckpt", ckpt,
          "--d_model", "32", "--num_heads", "4", "--num_layers", "1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert {"val_loss", "fscore", "kendall_tau", "spearman_rho"} <= set(rec)


def test_finetune_driver_with_mesh(data_root, tmp_path):
    """The full finetune driver running dp x tp over the 8-device harness."""
    from vidsum_tpu.config import MeshConfig
    from vidsum_tpu.parallel import make_mesh
    mesh = make_mesh(MeshConfig(data=4, model=2))
    cfg = tiny_config(data_root)
    cfg = Config(model=cfg.model, data=cfg.data, eval=cfg.eval,
                 train=dataclasses.replace(cfg.train, batch_size=4,
                                           max_epoch=1))
    splits = [{"train_keys": [f"x/video_{i}" for i in range(4)],
               "test_keys": ["x/video_4"]}]
    result = finetune(cfg, splits, workdir=str(tmp_path),
                      export_summary=False, mesh=mesh)
    assert np.isfinite(result.fscore)


def test_pretrain_driver_with_mesh(tmp_path):
    from vidsum_tpu.config import MeshConfig
    from vidsum_tpu.parallel import make_mesh
    root = str(tmp_path / "ptm")
    make_synthetic_pretrain_tree(root, n_videos=6, min_frames=30,
                                 max_frames=60, seed=70)
    cfg = Config(model=TINY_MODEL, data=DataConfig(root=root,
                                                   length_bucket=64),
                 pretrain=PretrainConfig(lr=1e-3, batch_size=4, epochs=1,
                                         warmup_epochs=1,
                                         scheduler_samples=8))
    mesh = make_mesh(MeshConfig(data=4, model=2))
    out = pretrain(cfg, PreTrainDataset(root), workdir=str(tmp_path),
                   mesh=mesh)
    assert np.isfinite(out["history"]).all()


def test_finetune_mesh_batch_divisibility(data_root, tmp_path):
    from vidsum_tpu.config import MeshConfig
    from vidsum_tpu.parallel import make_mesh
    mesh = make_mesh(MeshConfig(data=8, model=1))
    cfg = tiny_config(data_root)  # batch_size=2, not divisible by 8
    with pytest.raises(ValueError):
        finetune(cfg, [{"train_keys": ["x/video_0"],
                        "test_keys": ["x/video_1"]}],
                 workdir=str(tmp_path), export_summary=False, mesh=mesh)


def test_resume_is_exact(data_root, tmp_path):
    """2 epochs + resume for 2 more must produce bit-identical params to an
    uninterrupted 4-epoch run (per-(split, epoch) RNG streams)."""
    import shutil
    from vidsum_tpu.train.checkpoint import load_checkpoint
    splits = [{"train_keys": [f"x/video_{i}" for i in range(4)],
               "test_keys": ["x/video_4"]}]

    d_straight = str(tmp_path / "straight"); os.makedirs(d_straight)
    d_resumed = str(tmp_path / "resumed"); os.makedirs(d_resumed)

    cfg4 = tiny_config(data_root, max_epoch=4)
    finetune(cfg4, splits, workdir=d_straight, export_summary=False)

    cfg2 = tiny_config(data_root)  # max_epoch=2
    finetune(cfg2, splits, workdir=d_resumed, export_summary=False)
    finetune(cfg4, splits, workdir=d_resumed, export_summary=False,
             resume=True)

    params_a = init_simnet(jax.random.PRNGKey(0), TINY_MODEL)
    like = {"params": params_a, "opt_state": None}
    # compare the saved model checkpoints (params only)
    a, _ = load_checkpoint(os.path.join(d_straight, "model_mae.ckpt"),
                           params_a)
    b, _ = load_checkpoint(os.path.join(d_resumed, "model_mae.ckpt"),
                           params_a)
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pretrain_resume_is_exact(tmp_path):
    """Pretrain full-state resume (round 2): 2 epochs + resume for 2 more
    produce bit-identical params to an uninterrupted 4-epoch run
    (per-epoch RNG streams; optimizer moments restored)."""
    root = str(tmp_path / "ptr")
    make_synthetic_pretrain_tree(root, n_videos=6, min_frames=30,
                                 max_frames=60, seed=14)

    def cfg_for(epochs):
        return Config(
            model=TINY_MODEL,
            data=DataConfig(root=root, length_bucket=64),
            pretrain=PretrainConfig(lr=1e-3, batch_size=2, epochs=epochs,
                                    warmup_epochs=1, scheduler_samples=12),
        )

    dataset = PreTrainDataset(root)
    d_straight = str(tmp_path / "straight"); os.makedirs(d_straight)
    d_resumed = str(tmp_path / "resumed"); os.makedirs(d_resumed)

    out4 = pretrain(cfg_for(4), dataset, workdir=d_straight)
    pretrain(cfg_for(2), dataset, workdir=d_resumed)
    out_r = pretrain(cfg_for(4), dataset, workdir=d_resumed, resume=True)

    assert len(out_r["history"]) == 4
    np.testing.assert_allclose(out_r["history"], out4["history"],
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out4["params"]),
                    jax.tree_util.tree_leaves(out_r["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume ignored when no state exists
    d_fresh = str(tmp_path / "fresh"); os.makedirs(d_fresh)
    out_f = pretrain(cfg_for(2), dataset, workdir=d_fresh, resume=True)
    assert len(out_f["history"]) == 2
