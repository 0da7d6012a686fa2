# -*- coding: utf-8 -*-
"""Typed file IO (reference: utils/io.py:38-112).

Extension-dispatched reader for png/jpg/pkl/npy/csv/json.  The reference's
optional SenseTime memcached client is cluster-specific and intentionally
dropped; RAM pinning of shared per-city files lives in the dataset layer.
"""

from __future__ import annotations

import csv
import io as _io
import json
import os
import pickle
from typing import Any, Dict

import numpy as np


class IO:
    @classmethod
    def get(cls, path: str) -> Any:
        ext = os.path.splitext(path)[1].lower()
        if ext in (".png", ".jpg", ".jpeg"):
            return cls._read_img(path)
        if ext in (".pkl", ".pickle"):
            return cls._read_pkl(path)
        if ext == ".npy":
            return np.load(path)
        if ext == ".npz":
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

        return Image.open(path)

    @classmethod
    def _read_pkl(cls, path: str):
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
