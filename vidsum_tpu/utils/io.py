"""Config-file loaders (reference: ``src/utils/utils.py:28-42``)."""

from __future__ import annotations

import json

import yaml


def load_yaml(path: str):
    with open(path, "r") as f:
        return yaml.safe_load(f)


def load_json(path: str):
    with open(path) as f:
        return json.load(f)
