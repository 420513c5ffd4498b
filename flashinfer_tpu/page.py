"""Paged KV-cache management.

Capability parity with reference flashinfer/page.py (append_paged_kv_cache
page.py:83, get_batch_indices_positions page.py:251, get_seq_lens page.py:326;
device kernels include/flashinfer/page.cuh:299-492), re-designed for TPU:
appends are functional scatters that XLA fuses/donates in-place under jit,
so no custom kernel is needed for this bandwidth-trivial op.

Paged-KV layout contract (SURVEY §2.9): per-request view is
``kv_indptr/kv_indices/kv_last_page_len`` with 1 <= last_page_len <= page_size.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .utils import KVLayout, check_kv_layout, kv_cache_dims, unpack_paged_kv_cache


def get_seq_lens(
    kv_indptr: jax.Array, kv_last_page_len: jax.Array, page_size: int
) -> jax.Array:
    """Per-request KV sequence lengths (reference: page.py:326).

    ``seq_len = (num_pages - 1) * page_size + last_page_len`` with empty
    requests (0 pages) mapping to 0.
    """
    num_pages = kv_indptr[1:] - kv_indptr[:-1]
    return jnp.where(
        num_pages == 0,
        0,
        jnp.maximum(num_pages - 1, 0) * page_size + kv_last_page_len,
    ).astype(jnp.int32)


def get_batch_indices_positions(
    append_indptr: jax.Array, seq_lens: jax.Array, nnz: int
) -> tuple[jax.Array, jax.Array]:
    """Convert ragged append layout to per-token (batch_index, position).

    ``append_indptr[b]:append_indptr[b+1]`` are the tokens appended for
    request ``b``; they land at KV positions
    ``[seq_lens[b] - append_len_b, seq_lens[b])`` (reference: page.py:251).
    ``nnz`` must be static (it sizes the output).
    """
    token_ids = jnp.arange(nnz, dtype=jnp.int32)
    batch_indices = (
        jnp.searchsorted(append_indptr, token_ids, side="right").astype(jnp.int32) - 1
    )
    token_in_req = token_ids - append_indptr[batch_indices]
    append_len = append_indptr[batch_indices + 1] - append_indptr[batch_indices]
    positions = seq_lens[batch_indices] - append_len + token_in_req
    return batch_indices, positions.astype(jnp.int32)


def append_paged_kv_cache(
    append_key: jax.Array,
    append_value: jax.Array,
    batch_indices: jax.Array,
    positions: jax.Array,
    paged_kv_cache: Any,
    kv_indices: jax.Array,
    kv_indptr: jax.Array,
    kv_last_page_len: jax.Array,  # kept for API parity; layout derives from positions
    kv_layout: str = "NHD",
) -> Any:
    """Append new K/V tokens into the paged cache; returns the updated cache.

    append_key/append_value: ``[nnz, num_kv_heads, head_dim]``.
    batch_indices/positions: ``[nnz]`` (from :func:`get_batch_indices_positions`).

    Functional analog of reference page.py:83 / page.cuh:299: each token ``i``
    is written to page ``kv_indices[kv_indptr[b] + positions[i] // page_size]``
    at in-page offset ``positions[i] % page_size``.
    """
    layout = check_kv_layout(kv_layout)
    tuple_in = isinstance(paged_kv_cache, (tuple, list))
    k_cache, v_cache = unpack_paged_kv_cache(paged_kv_cache, layout)
    _, page_size, _, _ = kv_cache_dims(k_cache, layout)

    page_in_req = positions // page_size
    entry = kv_indices[kv_indptr[batch_indices] + page_in_req]
    offset = positions % page_size

    append_key = append_key.astype(k_cache.dtype)
    append_value = append_value.astype(v_cache.dtype)
    if layout == KVLayout.NHD:
        k_cache = k_cache.at[entry, offset].set(append_key)
        v_cache = v_cache.at[entry, offset].set(append_value)
    else:  # HND: [pages, heads, page_size, dim]
        k_cache = k_cache.at[entry, :, offset].set(append_key)
        v_cache = v_cache.at[entry, :, offset].set(append_value)

    if tuple_in:
        return (k_cache, v_cache)
    return jnp.stack([k_cache, v_cache], axis=1)


def block_sparse_indices_to_vector_sparse_offsets(
    block_sparse_indices: jax.Array,
    block_sparse_indptr: jax.Array,
    vector_sparse_offsets: jax.Array,
    vector_sparse_indptr: jax.Array,
    kv_len: jax.Array,
    stride_block: int,
    stride_n: int,
    block_size: int,
) -> jax.Array:
    """Expand block-sparse page indices to per-token offsets
    (reference: flashinfer/page.py — used by the sparse attention wrappers).
    """
    del vector_sparse_offsets
    nnz = int(vector_sparse_indptr[-1]) if vector_sparse_indptr.shape else 0
    token_ids = jnp.arange(nnz, dtype=jnp.int32)
    row = jnp.searchsorted(vector_sparse_indptr, token_ids, side="right") - 1
    tok_in_row = token_ids - vector_sparse_indptr[row]
    blk = tok_in_row // block_size
    in_blk = tok_in_row % block_size
    page = block_sparse_indices[block_sparse_indptr[row] + blk]
    return (page * stride_block + in_blk * stride_n).astype(jnp.int32)


def append_paged_mla_kv_cache(
    append_ckv: jax.Array,  # [nnz, head_dim_ckv]
    append_kpe: jax.Array,  # [nnz, head_dim_kpe]
    batch_indices: jax.Array,
    positions: jax.Array,
    ckv_cache: jax.Array,  # [pages, page_size, head_dim_ckv]
    kpe_cache: jax.Array,  # [pages, page_size, head_dim_kpe]
    kv_indices: jax.Array,
    kv_indptr: jax.Array,
    kv_last_page_len: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Append MLA compressed-KV rows into the paged caches (reference
    page.py append_paged_mla_kv_cache; kernel page.cuh:492). Returns the
    updated (ckv_cache, kpe_cache)."""
    del kv_last_page_len
    page_size = ckv_cache.shape[1]
    page_in_req = positions // page_size
    entry = kv_indices[kv_indptr[batch_indices] + page_in_req]
    offset = positions % page_size
    ckv_cache = ckv_cache.at[entry, offset].set(
        append_ckv.astype(ckv_cache.dtype))
    kpe_cache = kpe_cache.at[entry, offset].set(
        append_kpe.astype(kpe_cache.dtype))
    return ckv_cache, kpe_cache
