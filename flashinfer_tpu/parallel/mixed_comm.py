"""Mixed TP×DP communication modes.

Capability parity with reference flashinfer/comm/mixed_comm.py:107-1243
(+ include/flashinfer/comm/mixed_comm_decl.cuh): the mode combos a serving
stack uses around TP-sharded layers when data parallelism shares the same
device group — AllGather(dp)→matmul, matmul→ReduceScatter(tp),
AllReduce(tp), and the AG/RS "sequence-parallel sandwich". The reference
implements these over an NVSHMEM symmetric heap; on TPU each mode is the
corresponding XLA collective inside shard_map, with overlap handled by the
latency-hiding scheduler.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class MixedCommMode(enum.Enum):
    """Communication placement around a TP layer (reference
    mixed_comm.py mode combos)."""

    ALL_REDUCE = "ar"  # row-parallel output: psum over tp
    REDUCE_SCATTER = "rs"  # row-parallel output, sequence-sharded residual
    ALL_GATHER = "ag"  # sequence-sharded input → replicated layer input
    AG_RS = "ag_rs"  # sequence-parallel sandwich: AG before, RS after


def mixed_comm_pre(x: jax.Array, mode: MixedCommMode, tp_axis: str,
                   *, seq_dim: int = 0) -> jax.Array:
    """Pre-layer collective: gather the sequence-sharded activations
    before a TP layer (modes AG / AG_RS)."""
    if mode in (MixedCommMode.ALL_GATHER, MixedCommMode.AG_RS):
        return jax.lax.all_gather(x, tp_axis, axis=seq_dim, tiled=True)
    return x


def mixed_comm_post(y: jax.Array, mode: MixedCommMode, tp_axis: str,
                    *, seq_dim: int = 0) -> jax.Array:
    """Post-layer collective: reduce the row-parallel partial outputs."""
    if mode == MixedCommMode.ALL_REDUCE:
        return jax.lax.psum(y, tp_axis)
    if mode in (MixedCommMode.REDUCE_SCATTER, MixedCommMode.AG_RS):
        return jax.lax.psum_scatter(
            y, tp_axis, scatter_dimension=seq_dim, tiled=True
        )
    return y


def mixed_comm_layer(x: jax.Array, layer_fn, mode: MixedCommMode,
                     tp_axis: str, *, seq_dim: int = 0) -> jax.Array:
    """Wrap a TP layer with the chosen comm mode (the reference's
    mixed_comm entry): ``post(layer(pre(x)))``."""
    return mixed_comm_post(
        layer_fn(mixed_comm_pre(x, mode, tp_axis, seq_dim=seq_dim)),
        mode, tp_axis, seq_dim=seq_dim,
    )
