# -*- coding: utf-8 -*-
"""Typed file IO (reference: utils/io.py:38-112).

Extension-dispatched reader for png/jpg/pkl/npy/csv/json.  Binary reads
(img/pkl/npy/npz) optionally go through a memcached byte-cache
(`IO.configure_cache`) like the reference's `mc_client` path
(utils/io.py:58-101) — but speaking stock memcached instead of the
SenseTime cluster client, with populate-on-miss and disk fallback on any
cache error.  RAM pinning of shared per-city files lives in the dataset
layer.
"""

from __future__ import annotations

import csv
import io as _io
import json
import os
import pickle
from typing import Any, Dict, Optional

import numpy as np


class IO:
    _cache = None  # Optional[MemcachedClient]

    @classmethod
    def configure_cache(cls, client) -> None:
        """Install (or clear, with None) a `MemcachedClient` used for all
        binary reads."""
        cls._cache = client

    @classmethod
    def _read_bytes(cls, path: str) -> bytes:
        """File bytes through the cache when configured (miss -> disk ->
        populate; any cache failure -> disk)."""
        if cls._cache is not None:
            blob = cls._cache.get_file(path)
            if blob is not None:
                return blob
        with open(path, "rb") as f:
            blob = f.read()
        if cls._cache is not None:
            cls._cache.set_file(path, blob)
        return blob

    @classmethod
    def get(cls, path: str) -> Any:
        ext = os.path.splitext(path)[1].lower()
        if ext in (".png", ".jpg", ".jpeg"):
            return cls._read_img(path)
        if ext in (".pkl", ".pickle"):
            return cls._read_pkl(path)
        if ext in (".npy", ".npz"):
            if cls._cache is not None:
                return np.load(_io.BytesIO(cls._read_bytes(path)),
                               allow_pickle=False)
            return np.load(path)
        if ext == ".csv":
            return cls._read_csv(path)
        if ext == ".json":
            with open(path) as f:
                return json.load(f)
        raise ValueError(f"Unsupported file extension: {ext}")

    @classmethod
    def _read_img(cls, path: str):
        from PIL import Image

        if cls._cache is not None:
            return Image.open(_io.BytesIO(cls._read_bytes(path)))
        return Image.open(path)

    @classmethod
    def _read_pkl(cls, path: str):
        if cls._cache is not None:
            return pickle.loads(cls._read_bytes(path))
        with open(path, "rb") as f:
            return pickle.load(f)

    @classmethod
    def _read_csv(cls, path: str) -> Dict[int, Dict[str, float]]:
        """csv -> {id: row} keyed by the first column
        (reference: utils/io.py:96-112)."""
        out = {}
        with open(path, newline="") as f:
            reader = csv.DictReader(f)
            key = reader.fieldnames[0]
            for row in reader:
                out[int(float(row[key]))] = {
                    k: float(v) for k, v in row.items() if k != key
                }
        return out
