# -*- coding: utf-8 -*-
"""Named multi-series running averages (reference: utils/average_meter.py:11-63)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union


class AverageMeter:
    def __init__(self, items: Optional[Sequence[str]] = None):
        self.items = list(items) if items is not None else None
        n = 1 if items is None else len(self.items)
        self._val = [0.0] * n
        self._sum = [0.0] * n
        self._count = [0] * n

    def reset(self):
        n = len(self._val)
        self._val = [0.0] * n
        self._sum = [0.0] * n
        self._count = [0] * n

    def update(self, values: Union[float, Sequence[float]]):
        if isinstance(values, (list, tuple)):
            for i, v in enumerate(values):
                self._val[i] = float(v)
                self._sum[i] += float(v)
                self._count[i] += 1
        else:
            self._val[0] = float(values)
            self._sum[0] += float(values)
            self._count[0] += 1

    def val(self, idx: Optional[int] = None):
        if idx is None:
            return self._val if self.items else self._val[0]
        return self._val[idx]

    def count(self, idx: Optional[int] = None):
        if idx is None:
            return self._count if self.items else self._count[0]
        return self._count[idx]

    def avg(self, idx: Optional[int] = None):
        def _avg(i):
            return self._sum[i] / self._count[i] if self._count[i] else 0.0

        if idx is None:
            return ([_avg(i) for i in range(len(self._sum))]
                    if self.items else _avg(0))
        return _avg(idx)

    def as_dict(self):
        assert self.items is not None
        return dict(zip(self.items, self.avg()))
