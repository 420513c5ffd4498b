"""Decode context parallelism (DCP): sequence-sharded decode with fused
partial-state reduction.

Capability parity with reference `comm/dcp_alltoall.py` + the cute-dsl MLA
DCP path (SURVEY §2.7): at decode time the KV cache of long requests is
sharded across a cp axis; each rank computes a partial (o, lse) over its
local KV shard and the partials are reduced with the associative LSE merge.
The reference needs a custom LL128-FIFO all-to-all kernel (MNNVL-only);
on TPU the reduction is one `all_gather` of (o, lse) over ICI + the merge
math — XLA overlaps the gather with surrounding compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import merge_attention_states


def dcp_merge(o_local: jax.Array, lse_local: jax.Array, axis: str
              ) -> tuple[jax.Array, jax.Array]:
    """Merge per-rank partial attention states over mesh axis ``axis``.

    o_local: [B, H, D]; lse_local: [B, H] (natural log). Call inside
    shard_map; every rank returns the identical merged (o, lse).
    """
    o_all = jax.lax.all_gather(o_local, axis)  # [cp, B, H, D]
    lse_all = jax.lax.all_gather(lse_local, axis)  # [cp, B, H]

    def merge(carry, x):
        o_a, l_a = carry
        o_b, l_b = x
        return merge_attention_states(o_a, l_a, o_b, l_b), None

    (o, lse), _ = jax.lax.scan(
        merge,
        (o_all[0].astype(jnp.float32), lse_all[0]),
        (o_all[1:].astype(jnp.float32), lse_all[1:]),
    )
    return o.astype(o_local.dtype), lse


def dcp_decode_attention(
    q: jax.Array,  # [B, H_q, D] (replicated across cp)
    k_cache_local: jax.Array,  # [pages_local, ps, H_kv, D] local shard
    v_cache_local: jax.Array,
    page_table_local: jax.Array,  # [B, max_pages_local] local page ids
    kv_lens_local: jax.Array,  # [B] tokens held by THIS rank per request
    axis: str,
    *,
    sm_scale: float | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Context-parallel paged decode: local partial attention + LSE merge
    over ``axis`` (inside shard_map)."""
    from ..ops.attention.pallas_decode import paged_decode_attention

    o, lse = paged_decode_attention(
        q, k_cache_local, v_cache_local, page_table_local, kv_lens_local,
        sm_scale=sm_scale, interpret=interpret,
    )
    o_m, _ = dcp_merge(o, lse, axis)
    return o_m
