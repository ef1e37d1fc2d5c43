"""DSNet 5-fold split configs.

Reference: ``src/splits_dsnet/*.yaml`` loaded at ``src/train.py:205-212`` via
``load_yaml`` — a YAML list of ``{train_keys, test_keys}`` folds whose entries
are ``<path>/eccv16_dataset_<ds>_google_pool5.h5/video_N`` strings; the data
layer keeps only the trailing ``video_N`` component
(``src/data/dataset.py:133-136``).

Known reference quirk (SURVEY.md §2.2): ``tvsum.yaml`` and ``summe.yaml`` are
byte-identical and contain SumMe keys; we load whatever file is named, same as
the reference.
"""

from __future__ import annotations

import os
from pathlib import PurePosixPath
from typing import Dict, List

from vidsum_tpu.utils.io import load_json, load_yaml

SPLIT_DIR = os.path.join(os.path.dirname(__file__), "splits_dsnet")


def split_keys_to_names(keys: List[str]) -> List[str]:
    """``…_pool5.h5/video_7`` → ``video_7`` (dataset.py:133-136)."""
    return [PurePosixPath(k).name for k in keys]


def load_splits(path: str) -> List[Dict[str, List[str]]]:
    """Load a split file (.yaml or .json) into a list of fold dicts."""
    if path.endswith(".json"):
        return load_json(path)
    return load_yaml(path)


def builtin_split_path(dataset: str) -> str:
    """Path to the bundled DSNet split config for a dataset name
    (``tvsum``, ``summe``, ``tvsum_aug``, ``summe_aug``).

    The fold definitions are the canonical DSNet splits (same video keys as
    the reference's ``src/splits_dsnet/*.yaml``), stored as compact JSON with
    only the ``<h5file>/<video_key>`` tails.
    """
    return os.path.join(SPLIT_DIR, f"{dataset}.json")
