import os

import numpy as np
import pytest

from vidsum_tpu.data import (
    PATH, PreTrainDataset, TSDataset, bucket_length, item_weights,
    load_splits, make_batches, pad_batch, pad_batch_pretrain,
    split_keys_to_names,
)
from vidsum_tpu.data.splits import builtin_split_path
from vidsum_tpu.data.synthetic import (
    make_synthetic_h5, make_synthetic_pretrain_tree,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_h5(str(root / PATH["tvsum"]), n_videos=5, seed=1)
    make_synthetic_h5(str(root / PATH["summe"]), n_videos=3, seed=2)
    return str(root)


def test_val_split_loads_user_metadata(data_root):
    ds = TSDataset(data_root, "tvsum", "tvsum", split="val")
    assert len(ds) == 5
    feats, target, user = ds[0]
    assert feats.shape[1] == 1024
    assert target.shape == (feats.shape[0],)
    assert user.user_summary.shape[0] == 5
    assert user.change_points.shape[1] == 2
    assert user.name == "video_0"
    assert len(user.picks) == feats.shape[0]


def test_val_split_respects_keys(data_root):
    keys = ["any/prefix/x.h5/video_1", "y.h5/video_3"]
    ds = TSDataset(data_root, "tvsum", "tvsum", keys=keys, split="val")
    assert [u.name for u in ds.user_summaries] == ["video_1", "video_3"]


def test_train_split_concatenates_datasets(data_root):
    both = TSDataset(data_root, "tvsum", "tvsum+summe", split="train")
    only = TSDataset(data_root, "tvsum", "tvsum", split="train")
    assert len(both) == len(only) + 3


def test_train_split_key_restriction_applies_to_ex_dataset_only(data_root):
    keys = ["a.h5/video_0", "a.h5/video_2"]
    ds = TSDataset(data_root, "tvsum", "tvsum+summe", keys=keys, split="train")
    assert len(ds) == 2 + 3   # restricted tvsum + full summe


def test_min_frames_filter(data_root):
    ds_all = TSDataset(data_root, "tvsum", "tvsum", split="train",
                       min_frames=0)
    ds_filtered = TSDataset(data_root, "tvsum", "tvsum", split="train",
                            min_frames=10_000)
    assert len(ds_all) == 5 and len(ds_filtered) == 0


def test_split_keys_to_names():
    keys = ["../datasets/eccv16_dataset_summe_google_pool5.h5/video_22"]
    assert split_keys_to_names(keys) == ["video_22"]


def test_builtin_splits_load():
    for name in ("tvsum", "summe", "tvsum_aug", "summe_aug"):
        splits = load_splits(builtin_split_path(name))
        assert len(splits) == 5
        for fold in splits:
            assert fold["train_keys"] and fold["test_keys"]
            # train/test disjoint within a fold
            assert not set(fold["train_keys"]) & set(fold["test_keys"])


def test_bucket_length():
    assert bucket_length(1) == 128
    assert bucket_length(128) == 128
    assert bucket_length(129) == 256
    assert bucket_length(300, bucket=64) == 320
    assert bucket_length(5000, max_len=2048) == 2048


def test_pad_batch_sentinel_and_mask():
    f = [np.ones((10, 8), np.float32), np.ones((20, 8), np.float32)]
    t = [np.ones(10, np.float32), np.ones(20, np.float32)]
    x, tgt, mask = pad_batch(f, t, bucket=32)
    assert x.shape == (2, 32, 8) and tgt.shape == (2, 32)
    # sentinel-1000 semantics preserved: mask derivable like the reference
    np.testing.assert_array_equal(mask, x[:, :, 0] == 1000.0)
    assert mask[0, 10:].all() and not mask[0, :10].any()


def test_pad_batch_pretrain(data_root, tmp_path):
    root = str(tmp_path / "pt")
    make_synthetic_pretrain_tree(root, n_videos=4, seed=3)
    ds = PreTrainDataset(root)
    assert len(ds) == 4
    feats, reps = zip(*[ds[i] for i in range(4)])
    x, v, mask = pad_batch_pretrain(feats, reps, bucket=32)
    assert v.shape == (4, 512)
    np.testing.assert_array_equal(mask, x[:, :, 0] == 1000.0)


def test_make_batches_modes():
    batches = list(make_batches(10, 4, shuffle=False))
    assert [len(b) for b in batches] == [4, 4, 2]
    batches = list(make_batches(10, 4, shuffle=False, drop_last=True))
    assert [len(b) for b in batches] == [4, 4]
    batches = list(make_batches(10, 4, shuffle=False, pad_to_batch=True))
    assert [len(b) for b in batches] == [4, 4, 4]
    # the padded final chunk cycles its OWN indices (keeps the length
    # bucket of the real items) and item_weights zero-weights the repeats
    assert batches[-1] == [8, 9, 8, 9]
    np.testing.assert_array_equal(item_weights(batches[-1]),
                                  [1.0, 1.0, 0.0, 0.0])
    np.testing.assert_array_equal(item_weights(batches[0]), np.ones(4))
    # 1-item final chunk cycles to fill the whole batch
    assert list(make_batches(9, 4, shuffle=False, pad_to_batch=True))[-1] \
        == [8, 8, 8, 8]
    # shuffle is deterministic under a fixed generator
    a = list(make_batches(10, 4, shuffle=True, rng=np.random.default_rng(0)))
    b = list(make_batches(10, 4, shuffle=True, rng=np.random.default_rng(0)))
    assert a == b
