"""MiniMax Sparse Attention (MSA) pipeline.

Capability parity with reference flashinfer/msa_ops/ (msa_proxy_score
proxy_score.py, msa_topk_select sparse_topk_select.py, msa_sparse_attention
sparse_prefill.py, msa_sparse_decode_attention sparse_decode.py):
stage 1 computes per-128-token-KV-block max QK logits with a cheap proxy,
stage 2 selects top-K blocks per (query token, head), stage 3 runs exact
attention restricted to the selected blocks.

TPU re-design: stage 1 is one blocked einsum + segment max (MXU does the
proxy matmul at full tilt, the block max is a reshape-reduce XLA fuses);
stage 2 is lax.top_k with force-include head/tail windows; stage 3 gathers
the selected blocks per token and runs dense attention over the gathered
window (topk×128 tokens — small enough that the gather-attend fuses well).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

MSA_BLOCK = 128  # KV tokens per scored block (reference kernel constant)

SUPPORTS_PACKED_KV = True


def msa_proxy_score(
    q: jax.Array,  # [total_q, H_q, 128]
    k: jax.Array,  # [total_k, H_kv, 128]
    cu_seqlens_q: jax.Array,  # [B+1]
    cu_seqlens_k: jax.Array | None = None,
    *,
    page_table: jax.Array | None = None,
    seqused_k: jax.Array | None = None,
    causal: bool = True,
    max_seqlen_q: int | None = None,
    max_k_tiles: int | None = None,
    output: jax.Array | None = None,
    reduce_heads: bool = False,
    q_offset: jax.Array | None = None,
) -> jax.Array:
    """Per-KV-block max attention logits (MSA stage 1).

    Returns ``max_score [H, max_k_tiles, total_q]`` f32: the max of the
    unscaled causally-masked QK^T logits over each 128-token KV block;
    invalid/above-causal blocks give -inf. ``reduce_heads`` maxes over the
    GQA group (per-kv-head scores).
    """
    if page_table is not None:
        # paged proxy-K (reference msa_ops proxy over the paged pool):
        # gather each request's valid rows from the page pool host-side at
        # call time — the scoring path below then runs unchanged
        pt = np.asarray(page_table)
        used = np.asarray(seqused_k)
        ps = k.shape[1]
        hkv_p, d_p = k.shape[2], k.shape[3]
        idx_list, ks_list = [], [0]
        for b in range(pt.shape[0]):
            n = int(used[b])
            pages_b = pt[b, : max(1, -(-n // ps))]
            rows = (pages_b[:, None] * ps + np.arange(ps)[None, :]
                    ).reshape(-1)[:n]
            idx_list.append(rows)
            ks_list.append(ks_list[-1] + n)
        gather = jnp.asarray(np.concatenate(idx_list).astype(np.int32))
        k = k.reshape(-1, hkv_p, d_p)[gather]
        cu_seqlens_k = jnp.asarray(np.asarray(ks_list, np.int32))
        page_table = None
    total_q, hq, d = q.shape
    total_k, hkv, _ = k.shape
    g = hq // hkv
    qs = np.asarray(cu_seqlens_q)
    ks = np.asarray(cu_seqlens_k) if cu_seqlens_k is not None else qs
    batch = len(qs) - 1
    if max_k_tiles is None:
        max_k_tiles = max(
            1, max(-(-int(ks[b + 1] - ks[b]) // MSA_BLOCK) for b in range(batch))
        )

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)

    out = jnp.full((hq, max_k_tiles, total_q), -jnp.inf, jnp.float32)
    for b in range(batch):
        q0, q1 = int(qs[b]), int(qs[b + 1])
        k0, k1 = int(ks[b]), int(ks[b + 1])
        klen = k1 - k0
        if q1 == q0 or klen == 0:
            continue
        n_tiles = -(-klen // MSA_BLOCK)
        kpad = n_tiles * MSA_BLOCK
        kb = jnp.pad(kf[k0:k1], ((0, kpad - klen), (0, 0), (0, 0)))
        qb = qf[q0:q1].reshape(q1 - q0, hkv, g, d)
        s = jnp.einsum("qhgd,khd->hgqk", qb, kb)  # [hkv,g,ql,kpad]
        kv_pos = jnp.arange(kpad)
        valid = kv_pos < klen
        if causal:
            q_pos = jnp.arange(q1 - q0) + klen - (q1 - q0)
            if q_offset is not None:
                q_pos = q_pos + q_offset[b]
            mask = q_pos[:, None] >= kv_pos[None, :]
            valid = jnp.logical_and(valid[None, :], mask)
        else:
            valid = jnp.broadcast_to(valid[None, :], (q1 - q0, kpad))
        s = jnp.where(valid[None, None], s, -jnp.inf)
        s = s.reshape(hkv, g, q1 - q0, n_tiles, MSA_BLOCK).max(-1)
        s = s.transpose(0, 1, 3, 2).reshape(hq, n_tiles, q1 - q0)
        out = out.at[:, :n_tiles, q0:q1].set(s)
    if reduce_heads:
        out = out.reshape(hkv, g, max_k_tiles, total_q).max(1)
    return out


def msa_quantize_qk_fp4(
    x: jax.Array,  # [total, H, 128] bf16/f32
    global_scale: float | None = None,
) -> tuple[jax.Array, jax.Array, float]:
    """Quantize a proxy Q or K to packed NVFP4 (reference proxy_score.py
    _quantize_qk_to_nvfp4). Returns ``(x_fp4 [total,H,64] uint8, per-16
    e4m3-range scales, 1/global_scale)`` in this package's fp4 scale layout
    (per-vector trailing dim, not the cuBLAS 128x4 tiling — TPU has no
    tensor-core scale-tile requirement)."""
    from .quantization import fp4_quantize

    if x.ndim != 3 or x.shape[2] != 128:
        raise ValueError(f"x must be (total, num_heads, 128), got {x.shape}")
    if global_scale is None:
        amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
        global_scale = (448.0 * 6.0) / max(amax, 1e-12)
    xq, sf = fp4_quantize(
        x, jnp.asarray(global_scale, jnp.float32), sf_vec_size=16
    )
    return xq, sf, 1.0 / float(global_scale)


def msa_proxy_score_fp4(
    q_fp4: jax.Array,  # [total_q, H_q, 64] uint8 packed e2m1
    k_fp4: jax.Array,  # [total_k, H_kv, 64] or paged [pages, ps, H_kv, 64]
    q_scale: jax.Array,
    k_scale: jax.Array,
    q_global_scale: float,
    k_global_scale: float,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array | None = None,
    *,
    page_table: jax.Array | None = None,
    seqused_k: jax.Array | None = None,
    causal: bool = True,
    max_seqlen_q: int | None = None,
    max_k_tiles: int | None = None,
    output: jax.Array | None = None,
    reduce_heads: bool = False,
    q_offset: jax.Array | None = None,
) -> jax.Array:
    """NVFP4 MSA proxy pass (reference msa_ops/proxy_score.py:611
    msa_proxy_score_fp4): same contract as :func:`msa_proxy_score` but Q/K
    arrive packed e2m1 + per-16 block scales + per-tensor global scales, so
    the full-index K read from HBM is ~4.5 bits/elem.

    TPU mapping: the e2m1 unpack and scale multiply are elementwise bit ops
    XLA fuses into the einsum's input stream — HBM traffic stays at packed
    size, matching the reference's bandwidth intent without fp4 tensor
    cores. The two global scales fold into the logits as
    ``q_global_scale * k_global_scale`` before the block max, as in the
    reference.
    """
    from .quantization import fp4_dequantize

    def deq(xq, sf):
        return fp4_dequantize(xq, sf, sf_vec_size=16, dtype=jnp.float32)

    q = deq(q_fp4, q_scale)
    k = deq(k_fp4, k_scale)  # flat or paged: unpack is layout-agnostic
    out = msa_proxy_score(
        q, k, cu_seqlens_q, cu_seqlens_k,
        page_table=page_table, seqused_k=seqused_k, causal=causal,
        max_seqlen_q=max_seqlen_q, max_k_tiles=max_k_tiles,
        reduce_heads=reduce_heads, q_offset=q_offset,
    )
    gscale = float(q_global_scale) * float(k_global_scale)
    if gscale != 1.0:
        finite = out > -jnp.inf
        out = jnp.where(finite, out * gscale, out)
    return out


def msa_topk_select(
    max_score: jax.Array,  # [H, max_k_tiles, total_q] f32
    topk: int,
    num_valid_pages: jax.Array | int | None = None,
    output: jax.Array | None = None,
    force_begin_blocks: int = 0,
    force_end_blocks: int = 0,
) -> jax.Array:
    """Top-K KV-block indices per (head, query token) (MSA stage 2).

    Returns sorted block indices ``[H, total_q, topk]`` i32 with -1 for
    slots beyond the valid block count. ``force_begin/end_blocks``
    unconditionally include the first/last blocks (attention sinks and the
    local window, reference sparse_topk_select.py).
    """
    h, tiles, total_q = max_score.shape
    s = jnp.swapaxes(max_score.astype(jnp.float32), 1, 2)  # [H, Tq, tiles]
    blk = jnp.arange(tiles, dtype=jnp.int32)
    if num_valid_pages is None:
        nvalid = jnp.full((total_q,), tiles, jnp.int32)
    elif isinstance(num_valid_pages, int):
        nvalid = jnp.full((total_q,), num_valid_pages, jnp.int32)
    else:
        nvalid = jnp.asarray(num_valid_pages, jnp.int32)
    valid = blk[None, :] < nvalid[:, None]  # [Tq, tiles]
    s = jnp.where(valid[None], s, -jnp.inf)
    if force_begin_blocks:
        s = jnp.where(
            jnp.logical_and(blk[None, None] < force_begin_blocks, valid[None]),
            jnp.inf, s,
        )
    if force_end_blocks:
        lo = nvalid[:, None] - force_end_blocks
        s = jnp.where(
            jnp.logical_and(blk[None, None, :] >= lo[None], valid[None]),
            jnp.inf, s,
        )
    _, idx = jax.lax.top_k(s, topk)  # [H, Tq, topk]
    kept = jnp.take_along_axis(s, idx, axis=-1) > -jnp.inf
    idx = jnp.where(kept, idx, jnp.iinfo(jnp.int32).max)
    idx = jnp.sort(idx, axis=-1)
    return jnp.where(idx == jnp.iinfo(jnp.int32).max, -1, idx).astype(jnp.int32)


def _gather_block_attention(
    q: jax.Array,  # [total_q, H_q, D]
    k: jax.Array,  # [total_k, H_kv, D]
    v: jax.Array,
    block_idx: jax.Array,  # [H_kv or H_q, total_q, topk] (block ids, -1 pad)
    kv_base: jax.Array,  # [total_q] start row of each token's kv segment
    kv_len: jax.Array,  # [total_q] its kv length
    q_pos: jax.Array,  # [total_q] absolute causal position (or -1 non-causal)
    sm_scale: float,
) -> jax.Array:
    """Exact attention over gathered top-K blocks (MSA stage 3 core)."""
    total_q, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    per_kv = block_idx.shape[0] == hkv
    topk = block_idx.shape[2]
    win = topk * MSA_BLOCK

    off = jnp.arange(MSA_BLOCK, dtype=jnp.int32)
    safe_blk = jnp.maximum(block_idx, 0)
    # kv row ids per (h, token, topk*128)
    pos = (safe_blk[..., None] * MSA_BLOCK + off).reshape(
        block_idx.shape[0], total_q, win
    )
    rows = kv_base[None, :, None] + pos
    blk_ok = jnp.broadcast_to(
        (block_idx >= 0)[..., None], block_idx.shape + (MSA_BLOCK,)
    ).reshape(block_idx.shape[0], total_q, win)
    tok_valid = jnp.logical_and(blk_ok, pos < kv_len[None, :, None])
    if q_pos is not None:
        tok_valid = jnp.logical_and(tok_valid, pos <= q_pos[None, :, None])
    rows = jnp.minimum(rows, k.shape[0] - 1)

    qf = q.astype(jnp.float32) * sm_scale
    out = jnp.zeros((total_q, hq, d), jnp.float32)
    for h in range(hq):
        hb = h // g if per_kv else h
        kv_h = h // g
        kg = k[:, kv_h].astype(jnp.float32)[rows[hb]]  # [Tq, win, D]
        vg = v[:, kv_h].astype(jnp.float32)[rows[hb]]
        s = jnp.einsum("td,twd->tw", qf[:, h], kg)
        s = jnp.where(tok_valid[hb], s, -jnp.inf)
        m = jnp.max(s, -1, keepdims=True)
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        p = jnp.exp(s - m_safe)
        p = jnp.where(tok_valid[hb], p, 0.0)
        l = jnp.sum(p, -1, keepdims=True)
        out = out.at[:, h].set(
            jnp.einsum("tw,twd->td", p / jnp.where(l == 0, 1, l), vg)
        )
    return out.astype(q.dtype)


def msa_sparse_attention(
    q: jax.Array,  # [total_q, H_q, D]
    k: jax.Array,  # [total_k, H_kv, D]
    v: jax.Array,
    block_indices: jax.Array,  # [H, total_q, topk] from msa_topk_select
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array | None = None,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    **_ignored,
) -> jax.Array:
    """MSA sparse prefill (stage 3): exact attention over the selected
    blocks (reference sparse_prefill.py msa_sparse_attention)."""
    total_q, hq, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    qs = np.asarray(cu_seqlens_q)
    ks = np.asarray(cu_seqlens_k) if cu_seqlens_k is not None else qs
    batch = len(qs) - 1
    kv_base = np.zeros(total_q, np.int32)
    kv_len = np.zeros(total_q, np.int32)
    q_pos = np.zeros(total_q, np.int32)
    for b in range(batch):
        q0, q1 = int(qs[b]), int(qs[b + 1])
        klen = int(ks[b + 1] - ks[b])
        kv_base[q0:q1] = int(ks[b])
        kv_len[q0:q1] = klen
        q_pos[q0:q1] = np.arange(q1 - q0) + klen - (q1 - q0)
    return _gather_block_attention(
        q, k, v, block_indices, jnp.asarray(kv_base), jnp.asarray(kv_len),
        jnp.asarray(q_pos) if causal else None, sm_scale,
    )


def msa_sparse_decode_attention(
    q: jax.Array,  # [B, H_q, D]
    k: jax.Array,  # flat [total_k, H_kv, D]
    v: jax.Array,
    block_indices: jax.Array,  # [H, B, topk]
    kv_seg_starts: jax.Array,  # [B] start row per request
    kv_seg_lens: jax.Array,  # [B]
    *,
    sm_scale: float | None = None,
    **_ignored,
) -> jax.Array:
    """MSA sparse decode (stage 3, q_len == 1 per request)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    q_pos = jnp.asarray(kv_seg_lens, jnp.int32) - 1
    return _gather_block_attention(
        q, k, v, block_indices, jnp.asarray(kv_seg_starts, jnp.int32),
        jnp.asarray(kv_seg_lens, jnp.int32), q_pos, sm_scale,
    )
