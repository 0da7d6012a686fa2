# -*- coding: utf-8 -*-
"""Distributed runtime (reference: utils/distributed.py:22-109).

The reference's NCCL process-group init, rank helpers, NUMA affinity
pinning and L2-fetch tuning collapse into JAX-native equivalents:
``jax.distributed.initialize()`` for multi-host rendezvous, a
``jax.sharding.Mesh`` over all devices for collectives (ICI intra-slice,
DCN across slices), and ``jax.process_index`` for rank logic.  Device
placement replaces affinity hacks (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def init_dist(coordinator_address: Optional[str] = None,
              num_processes: Optional[int] = None,
              process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces init_process_group("nccl"),
    utils/distributed.py:65-82). No-op for single-process runs."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def is_master() -> bool:
    return get_rank() == 0


def make_data_mesh(data_axis: int = -1, tile_axis: int = 1):
    """Mesh with ('data', 'tile') axes over all devices
    (SURVEY.md §7: DP replicates params / psums grads over ICI; the tile
    axis shards rasterizer tiles + Gaussians for giant scenes)."""
    import jax

    devices = np.asarray(jax.devices())
    n = len(devices)
    if data_axis == -1:
        assert n % tile_axis == 0
        data_axis = n // tile_axis
    assert data_axis * tile_axis == n, (
        f"mesh {data_axis}x{tile_axis} != {n} devices")
    return jax.sharding.Mesh(
        devices.reshape(data_axis, tile_axis), ("data", "tile"))


def make_simple_mesh() -> "object":
    import jax

    return jax.make_mesh((len(jax.devices()),), ("data",))
