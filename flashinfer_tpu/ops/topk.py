"""Exact top-k selection + fused index transforms for sparse attention.

Capability parity with reference flashinfer/topk.py (`top_k` topk.py:511
radix-select kernel topk.cuh:444-689, `top_k_page_table_transform`
topk.py:665, `top_k_ragged_transform` topk.py:808, `TopKTieBreak`
topk.py:40) and flashinfer/topk_varlen/.

TPU re-design: the multi-CTA radix select exists because GPUs lack a fast
global sort; TPUs lower `lax.top_k` to an optimized sort-based selection
on the VPU, so `lax.top_k` IS the kernel. Tie-breaking is implemented by
key augmentation (value-index packing) — fully deterministic, which also
subsumes the reference's `deterministic=` mode (XLA is batch-invariant
by construction). Out-of-range lanes are masked to -inf before selection.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class TopKTieBreak(enum.IntEnum):
    NONE = 0
    LOWER_INDEX_FIRST = 1
    HIGHER_INDEX_FIRST = 2


def _masked(x: jax.Array, lengths: jax.Array | None) -> jax.Array:
    if lengths is None:
        return x
    idx = jnp.arange(x.shape[-1], dtype=jnp.int32)
    return jnp.where(idx[None, :] < lengths[:, None], x, -jnp.inf)


def top_k(
    input: jax.Array,  # noqa: A002 (reference arg name) [batch, d]
    k: int,
    sorted: bool = True,  # noqa: A002
    deterministic: bool = False,
    tie_break: int = TopKTieBreak.NONE,
    dsa_graph_safe: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k values+indices per row (reference topk.py:511).

    Always deterministic on TPU; ``tie_break`` selects which equal-valued
    boundary elements win (lax.top_k natively prefers lower indices).
    """
    del deterministic, dsa_graph_safe
    x = input.astype(jnp.float32)
    if tie_break == TopKTieBreak.HIGHER_INDEX_FIRST:
        vals, idx_rev = jax.lax.top_k(x[:, ::-1], k)
        idx = x.shape[-1] - 1 - idx_rev
    else:
        vals, idx = jax.lax.top_k(x, k)
    # lax.top_k returns sorted descending already; `sorted=False` is a
    # permission to be unsorted, not a requirement.
    del sorted
    return vals.astype(input.dtype), idx.astype(jnp.int32)


def top_k_page_table_transform(
    input: jax.Array,  # noqa: A002 [num_rows, max_len] scores
    src_page_table: jax.Array,  # [batch, max_len] i32
    lengths: jax.Array,  # [num_rows] i32
    k: int,
    row_to_batch: jax.Array | None = None,
    deterministic: bool = False,
    tie_break: int = TopKTieBreak.NONE,
    dsa_graph_safe: bool = False,
    row_starts: jax.Array | None = None,
    page_table_row_starts: jax.Array | None = None,
) -> jax.Array:
    """Fused top-k + page-table lookup (reference topk.py:665):
    ``out[i, j] = src_page_table[batch(i), pt_row_start[i] + topk_idx[i, j]]``.
    """
    num_rows = input.shape[0]
    rows = jnp.arange(num_rows, dtype=jnp.int32)
    batch_idx = row_to_batch if row_to_batch is not None else rows
    x = input.astype(jnp.float32)
    idx = jnp.arange(x.shape[-1], dtype=jnp.int32)
    if row_starts is not None:
        # valid window for row i is [row_starts[i], row_starts[i]+lengths[i])
        valid = (idx[None, :] >= row_starts[:, None]) & (
            idx[None, :] < row_starts[:, None] + lengths[:, None]
        )
    else:
        valid = idx[None, :] < lengths[:, None]
    x = jnp.where(valid, x, -jnp.inf)
    _, top_idx = top_k(x, k, tie_break=tie_break,
                       deterministic=deterministic,
                       dsa_graph_safe=dsa_graph_safe)
    if row_starts is not None:
        top_idx = top_idx - row_starts[:, None]
    pt_start = (
        page_table_row_starts[:, None]
        if page_table_row_starts is not None
        else 0
    )
    return src_page_table[batch_idx[:, None], pt_start + top_idx]


def top_k_ragged_transform(
    input: jax.Array,  # noqa: A002 [num_rows, max_len]
    offsets: jax.Array,  # [num_rows] i32
    lengths: jax.Array,  # [num_rows] i32
    k: int,
    deterministic: bool = False,
    tie_break: int = TopKTieBreak.NONE,
    dsa_graph_safe: bool = False,
    row_starts: jax.Array | None = None,
) -> jax.Array:
    """Fused top-k + offset add (reference topk.py:808):
    ``out[i, j] = topk_idx[i, j] + offsets[i]``."""
    x = input
    if row_starts is not None:
        idx = jnp.arange(x.shape[-1], dtype=jnp.int32)
        x = jnp.where(idx[None, :] >= row_starts[:, None], x, -jnp.inf)
    x = _masked(x.astype(jnp.float32), lengths)
    _, top_idx = top_k(x, k, tie_break=tie_break,
                       deterministic=deterministic,
                       dsa_graph_safe=dsa_graph_safe)
    if row_starts is not None:
        top_idx = top_idx - row_starts[:, None]
    return top_idx + offsets[:, None]


def topk_varlen(
    scores: jax.Array,  # [total] ragged concatenated rows
    indptr: jax.Array,  # [num_rows + 1] host or device i32
    k: int,
    max_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Variable-length top-k (reference flashinfer/topk_varlen/): select
    top-k within each ragged segment; returns (values [rows, k],
    global indices [rows, k]). ``max_len`` bounds segment length (static).
    """
    num_rows = indptr.shape[0] - 1
    col = jnp.arange(max_len, dtype=jnp.int32)
    starts = indptr[:-1]
    lens = indptr[1:] - indptr[:-1]
    gather_idx = jnp.minimum(starts[:, None] + col[None, :],
                             scores.shape[0] - 1)
    dense = jnp.where(col[None, :] < lens[:, None],
                      scores[gather_idx].astype(jnp.float32), -jnp.inf)
    vals, idx = jax.lax.top_k(dense, k)
    return vals.astype(scores.dtype), (idx + starts[:, None]).astype(jnp.int32)
