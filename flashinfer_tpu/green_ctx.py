"""Compute-resource partitioning (reference green-context analog).

The reference's `green_ctx.py:34-50` carves SM subsets out of a GPU so
concurrent kernels don't interfere. TPU cores are not partitionable that
way; the TPU-native controls for concurrent workloads are (a) multi-slice
/ subset meshes (run different programs on different device subsets) and
(b) the XLA scheduler's stream assignment. This module exposes the same
API shape, implemented as device-subset meshes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def split_device(device=None, partitions: int = 2) -> list[list]:
    """Split the visible devices into ``partitions`` groups (the TPU
    analog of green-context SM splits — reference green_ctx.py:34).
    On a single-chip host this returns one group per chip and cannot
    subdivide a chip (TPU cores are not partitionable)."""
    devices = jax.devices() if device is None else list(device)
    n = len(devices)
    if partitions > n:
        raise ValueError(
            f"cannot split {n} TPU device(s) into {partitions} partitions: "
            "TPU cores are indivisible; use multi-chip hosts"
        )
    per = n // partitions
    return [devices[i * per:(i + 1) * per] for i in range(partitions)]


def make_partition_meshes(partitions: int = 2, axis_name: str = "x"
                          ) -> list[Mesh]:
    """One single-axis mesh per partition, for running concurrent
    independent programs on disjoint device subsets."""
    import numpy as np

    return [
        Mesh(np.asarray(group), (axis_name,))
        for group in split_device(partitions=partitions)
    ]
