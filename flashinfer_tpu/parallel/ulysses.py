"""Ulysses sequence parallelism: head-scatter / head-gather all-to-all.

Capability parity with reference `UlyssesCommunicator`
(flashinfer/comm/ulysses.py:49-777; fused-transpose kernel
ulysses_all_to_all.cuh:177): the SP↔TP relayout
``[B, S_local, H, D] ↔ [B, S_global, H_local, D]`` around attention.
TPU re-design: one `jax.lax.all_to_all` over the sequence mesh axis inside
shard_map — XLA lowers it to ICI all-to-all with the transpose fused, which
is exactly what the reference's NVLink fused-transpose kernel hand-rolls.
"""

from __future__ import annotations

import jax


def scatter_heads(x: jax.Array, axis: str) -> jax.Array:
    """[B, S_local, H, D] → [B, S_global, H_local, D] (ulysses.py:57-100).

    Call inside shard_map over ``axis`` (the sequence-parallel axis). Heads
    must be divisible by the axis size.
    """
    # split over heads (dim 2), concat over sequence (dim 1)
    return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)


def gather_heads(x: jax.Array, axis: str) -> jax.Array:
    """[B, S_global, H_local, D] → [B, S_local, H, D] (inverse)."""
    return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)


class UlyssesCommunicator:
    """API-parity object form (reference ulysses.py:49).

    world_size == 1 passes through, matching the reference's no-cluster
    fallback (ulysses.py:86-88).
    """

    def __init__(self, axis: str, axis_size: int):
        self.axis = axis
        self.world_size = axis_size

    def scatter_heads(self, x: jax.Array) -> jax.Array:
        if self.world_size == 1:
            return x
        return scatter_heads(x, self.axis)

    def gather_heads(self, x: jax.Array) -> jax.Array:
        if self.world_size == 1:
            return x
        return gather_heads(x, self.axis)
