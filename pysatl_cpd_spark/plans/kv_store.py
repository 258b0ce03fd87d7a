"""Typed key-value stage storage (parity: reference benchmarking storages —
SaverCSV/LoaderCSV with their `_literal`/`_list` filename-suffix typing,
benchmarking/storages/). The reference threads pipeline metadata (scalars,
lists, dicts) between steps through a filesystem KV; here the same contract
is JSON sidecars next to the stage tables, with numpy types normalized."""

from __future__ import annotations

import json
import os

import numpy as np


def _normalize(value):
    if isinstance(value, np.ndarray):
        return {"__type__": "ndarray", "data": value.tolist()}
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, tuple):
        return {"__type__": "tuple", "data": [_normalize(v) for v in value]}
    if isinstance(value, list):
        return [_normalize(v) for v in value]
    if isinstance(value, dict):
        return {k: _normalize(v) for k, v in value.items()}
    return value


def _denormalize(value):
    if isinstance(value, dict):
        if value.get("__type__") == "ndarray":
            return np.asarray(value["data"])
        if value.get("__type__") == "tuple":
            return tuple(_denormalize(v) for v in value["data"])
        return {k: _denormalize(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_denormalize(v) for v in value]
    return value


class KvStore:
    """save(key, value) / load(key) of int | float | str | list | tuple |
    ndarray | dict — the reference storage value domain
    (benchmarking/custom_types.py)."""

    def __init__(self, root: str) -> None:
        self._root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self._root, f"{key}.json")

    def save(self, key: str, value) -> None:
        tmp = self._path(key) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(_normalize(value), fh)
        os.replace(tmp, self._path(key))

    def load(self, key: str):
        with open(self._path(key)) as fh:
            return _denormalize(json.load(fh))

    def keys(self) -> list[str]:
        return sorted(
            f[:-5] for f in os.listdir(self._root) if f.endswith(".json")
        )
