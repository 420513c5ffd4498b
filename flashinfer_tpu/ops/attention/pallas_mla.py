"""Streaming MLA (multi-latent attention) kernel — decode AND prefill.

Reference: BatchMLAPagedAttentionWrapper (flashinfer/mla/_core.py:1962,
plan :2133) with the heap-balanced MLAPlan (scheduler.cuh:1578) and device
kernel include/flashinfer/attention/mla.cuh:853.

TPU re-design (round 2 — replaces the BlockSpec-per-page grid, which pays
~1.3 us of fixed cost per page step):

* ONE kernel covers ragged q_len: the host plan emits one work item per
  (request, q-token-tile); decode is TQ=1 (128 rows = the q heads of one
  token), speculative/prefill tiles pack TQ tokens x H heads of MXU rows.
* KV streams HBM->VMEM with manual double-buffered page DMAs from the
  SEPARATE ckv/kpe caches (no [*, 576] concat copy per call), 4-slot
  parity scheme as in the decode kernel.
* The chunk loop is software-pipelined with an s-carry (QK of chunk c+1
  issues on the MXU before the VPU consumes chunk c) and split into a
  mask-free clean prefix + masked boundary suffix.
* ckv_scale folds into the q_nope pre-scale, kpe_scale into the q_pe
  pre-scale, and the V-side ckv_scale into the epilogue — quantized
  (int8/fp8) caches never rescale data in the hot loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...env import resolve_interpret
from ...utils import cdiv

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def build_mla_work_plan(q_lens: np.ndarray, tq: int):
    """One work item per (request, q-token tile): returns (w_req, w_tile)
    i32 tables. The reference's heap-balanced split (heap.h:15) collapses
    to the sequential sweep — VMEM state replaces the merge pass."""
    w_req, w_tile = [], []
    for b, ql in enumerate(np.asarray(q_lens, np.int64)):
        for t in range(max(1, cdiv(int(ql), tq))):
            w_req.append(b)
            w_tile.append(t)
    if not w_req:
        w_req, w_tile = [0], [0]
    return (jnp.asarray(np.asarray(w_req, np.int32)),
            jnp.asarray(np.asarray(w_tile, np.int32)))


def _mla_stream_kernel(
    # scalar prefetch
    w_req_ref,  # [W] request of each work
    w_tile_ref,  # [W] q-tile index within the request
    kv_lens_ref,  # [B]
    q_lens_ref,  # [B]
    page_table_ref,  # [B, max_pages]
    # inputs
    q_ref,  # [1, TQ*H, D_ckv + D_kpe] VMEM (auto-pipelined)
    ckv_hbm_ref,  # [pages, ps, D_ckv] ANY; combined: [pages, ps, D_c+D_p]
    kpe_hbm_ref,  # [pages, ps, D_kpe] ANY (dummy when combined)
    # outputs
    o_ref,  # [1, TQ*H, D_ckv]
    lse_ref,  # [1, TQ*H, 8]
    # scratch
    ckv_buf,  # [6, CP, ps, D_ckv]
    kpe_buf,  # [6, CP, ps, D_kpe]
    sem,  # DMA [6, CP, 2]
    *,
    num_heads: int,
    tq: int,
    head_dim_ckv: int,
    head_dim_kpe: int,
    page_size: int,
    chunk_pages: int,
    sm_scale: float,
    causal: bool,
    ckv_scale: float,
    kpe_scale: float,
    combined: bool,
    use_exp2: bool = True,  # log2-domain softmax (see pallas_prefill)
):
    w = pl.program_id(0)
    log2e = float(np.log2(np.e)) if use_exp2 else 1.0
    fexp = jnp.exp2 if use_exp2 else jnp.exp
    num_w = pl.num_programs(0)
    rows = tq * num_heads
    ct = chunk_pages * page_size
    dc, dp = head_dim_ckv, head_dim_kpe

    req = w_req_ref[w]
    tile = w_tile_ref[w]
    kv_len = kv_lens_ref[req]
    q_len = q_lens_ref[req]
    tok0 = tile * tq

    def eff_of(wi):
        r = w_req_ref[wi]
        kl = kv_lens_ref[r]
        ql = q_lens_ref[r]
        t0 = w_tile_ref[wi] * tq
        if causal:
            last = jnp.minimum(t0 + tq, jnp.maximum(ql, 1)) - 1
            return jnp.minimum(kl, kl - ql + last + 1)
        return kl

    def n_chunks_of(wi):
        return jnp.maximum(
            jax.lax.div(jnp.maximum(eff_of(wi), 1) + ct - 1, ct), 1
        )

    parity = jax.lax.rem(w, 2)

    def slot_of(chunk):
        return jnp.where(chunk == 0, 4 + parity, jax.lax.rem(chunk, 4))

    def issue(wi, chunk, slot):
        r = w_req_ref[wi]
        for j in range(chunk_pages):
            page = page_table_ref[r, chunk * chunk_pages + j]
            pltpu.make_async_copy(
                ckv_hbm_ref.at[page], ckv_buf.at[slot, j], sem.at[slot, j, 0]
            ).start()
            if not combined:  # combined layout: ckv+kpe ride ONE dma
                pltpu.make_async_copy(
                    kpe_hbm_ref.at[page], kpe_buf.at[slot, j],
                    sem.at[slot, j, 1],
                ).start()

    def wait(slot):
        for j in range(chunk_pages):
            pltpu.make_async_copy(
                ckv_hbm_ref.at[0], ckv_buf.at[slot, j], sem.at[slot, j, 0]
            ).wait()
            if not combined:
                pltpu.make_async_copy(
                    kpe_hbm_ref.at[0], kpe_buf.at[slot, j],
                    sem.at[slot, j, 1],
                ).wait()

    n_chunks = n_chunks_of(w)

    @pl.when(w == 0)
    def _bootstrap():
        issue(0, 0, 4)

    def cross_work_issue():
        @pl.when(w + 1 < num_w)
        def _():
            issue(w + 1, 0, 5 - parity)

    kv_dtype = ckv_buf.dtype
    compute_dtype = jnp.float32 if kv_dtype == jnp.float32 else jnp.bfloat16
    # per-component dequant scales fold into the q pre-scale (ckv on the
    # nope dims, kpe on the pe dims); the V-side ckv_scale applies once at
    # the epilogue
    qf = q_ref[0].astype(jnp.float32) * (sm_scale * log2e)
    qn = (qf[:, :dc] * ckv_scale).astype(compute_dtype)
    qp = (qf[:, dc:] * kpe_scale).astype(compute_dtype)

    diag = kv_len - q_len
    rows_tok = tok0 + jax.lax.broadcasted_iota(
        jnp.int32, (rows, ct), 0) // num_heads
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (rows, ct), 1)

    # clean prefix: the final chunk is always the masked epilogue chunk
    clean_cols = kv_len
    if causal:
        clean_cols = jnp.minimum(clean_cols, tok0 + diag + 1)
    tile_full = (tok0 + tq) <= q_len
    n_clean = jnp.where(
        tile_full, jax.lax.div(jnp.maximum(clean_cols, 0), ct), 0
    )
    n_clean = jnp.minimum(n_clean, n_chunks - 1)

    def qk(slot):
        if combined:
            kv = ckv_buf[slot].reshape(ct, dc + dp)
            ckv, kpe = kv[:, :dc], kv[:, dc:]
        else:
            ckv = ckv_buf[slot].reshape(ct, dc)
            kpe = kpe_buf[slot].reshape(ct, dp)
        if ckv.dtype != compute_dtype:
            ckv = ckv.astype(compute_dtype)
            kpe = kpe.astype(compute_dtype)
        s = jax.lax.dot_general(
            qn, ckv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            qp, kpe, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s  # [rows, ct]

    def pv(p, slot):
        if combined:
            v = ckv_buf[slot].reshape(ct, dc + dp)[:, :dc]
        else:
            v = ckv_buf[slot].reshape(ct, dc)
        if v.dtype != compute_dtype:
            v = v.astype(compute_dtype)
        return jax.lax.dot_general(
            p.astype(compute_dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, D_ckv]

    def update(s, chunk, m_prev, l_prev, acc, slot, *, masked):
        if masked:
            kv_pos = chunk * ct + cols_i
            mask = jnp.logical_and(kv_pos < kv_len, rows_tok < q_len)
            if causal:
                mask = jnp.logical_and(mask, kv_pos <= rows_tok + diag)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = fexp(m_prev - m_new)
        p = fexp(s - m_new)  # masked cols underflow to exactly 0
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + pv(p, slot)
        return m_new, l_new, acc_new

    def make_body(masked):
        def body(c, carry):
            m, l, acc, s_cur = carry

            @pl.when(c + 2 < n_chunks)
            def _pf():
                issue(w, c + 2, slot_of(c + 2))

            @pl.when(c + 2 == n_chunks)
            def _pf_cross():
                cross_work_issue()

            nslot = slot_of(c + 1)
            wait(nslot)
            s_next = qk(nslot)
            m, l, acc = update(s_cur, c, m, l, acc, slot_of(c),
                               masked=masked)
            return m, l, acc, s_next
        return body

    @pl.when(n_chunks > 1)
    def _pf1():
        issue(w, 1, slot_of(1))

    @pl.when(n_chunks <= 1)
    def _pf1_cross():
        cross_work_issue()

    wait(slot_of(0))
    s0 = qk(slot_of(0))

    m0 = jnp.full((rows, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, dc), jnp.float32)
    carry = jax.lax.fori_loop(
        0, n_clean, make_body(False), (m0, l0, acc0, s0))
    carry = jax.lax.fori_loop(
        n_clean, n_chunks - 1, make_body(True), carry)
    m, l, acc, s_last = carry
    m, l, acc = update(
        s_last, n_chunks - 1, m, l, acc, slot_of(n_chunks - 1), masked=True)

    row_valid = jnp.logical_and(rows_tok[:, :1] < q_len, kv_len > 0)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = acc * (ckv_scale if ckv_scale != 1.0 else 1.0) / l_safe
    o_ref[0] = jnp.where(row_valid, o, 0.0).astype(o_ref.dtype)
    if use_exp2:
        lse = (m + jnp.log2(l_safe)) * float(np.log(2.0))
    else:
        lse = m + jnp.log(l_safe)
    lse = jnp.where(jnp.logical_and(row_valid, l > 0.0), lse, -jnp.inf)
    lse_ref[0] = jnp.broadcast_to(lse, (rows, 8)).astype(lse_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "tq", "head_dim_ckv", "sm_scale", "causal",
        "ckv_scale", "kpe_scale", "use_exp2", "chunk_tokens", "interpret",
    ),
)
def mla_stream(
    q: jax.Array,  # [B, qmax*H, D_ckv + D_kpe] (token-major rows, padded)
    ckv_cache: jax.Array,  # [pages, ps, D_ckv]
    kpe_cache: jax.Array,  # [pages, ps, D_kpe]
    page_table: jax.Array,  # [B, max_pages]
    kv_lens: jax.Array,  # [B]
    q_lens: jax.Array,  # [B]
    w_req: jax.Array,  # [W] plan table
    w_tile: jax.Array,  # [W]
    *,
    num_heads: int,
    tq: int,
    head_dim_ckv: int,
    sm_scale: float,
    causal: bool,
    ckv_scale: float = 1.0,
    kpe_scale: float = 1.0,
    use_exp2: bool = True,
    chunk_tokens: int = 1024,  # KV tokens per DMA chunk (autotunable)
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Run the streaming MLA kernel; returns (o [B, qmax*H, D_ckv],
    lse [B, qmax*H])."""
    batch, rows_total, d_total = q.shape
    _, page_size, cache_d = ckv_cache.shape
    combined = kpe_cache is None
    dc = head_dim_ckv
    dp = d_total - head_dim_ckv
    if dp % 128:
        # Mosaic DMA slices must be 128-lane aligned: zero-pad the pe dims
        # (zeros contribute nothing to q_pe . kpe scores)
        dp_pad = ((dp + 127) // 128) * 128
        q = jnp.pad(q, ((0, 0), (0, 0), (0, dp_pad - dp)))
        if combined:
            if cache_d != head_dim_ckv + dp_pad:
                raise ValueError(
                    "combined MLA cache must be lane-padded: last dim "
                    f"{cache_d} vs required {head_dim_ckv + dp_pad}")
        else:
            kpe_cache = jnp.pad(
                kpe_cache, ((0, 0), (0, 0), (0, dp_pad - dp)))
        dp = dp_pad
        d_total = dc + dp
    rows = tq * num_heads
    num_works = w_req.shape[0]
    chunk_pages = max(1, min(chunk_tokens // page_size, 32))
    max_pages = page_table.shape[1]
    pad_pages = (-max_pages) % chunk_pages
    if pad_pages:
        page_table = jnp.pad(page_table, ((0, 0), (0, pad_pages)))

    if combined and cache_d != dc + dp:
        raise ValueError(f"combined cache last dim {cache_d} != {dc + dp}")
    kernel = functools.partial(
        _mla_stream_kernel,
        num_heads=num_heads, tq=tq, head_dim_ckv=head_dim_ckv,
        head_dim_kpe=dp, page_size=page_size, chunk_pages=chunk_pages,
        sm_scale=float(sm_scale), causal=bool(causal),
        ckv_scale=float(ckv_scale), kpe_scale=float(kpe_scale),
        combined=combined, use_exp2=bool(use_exp2),
    )
    if combined:
        kpe_cache = jnp.zeros((1, 8, 128), ckv_cache.dtype)  # dummy

    def q_map(w, wr, wt, kl, ql, pt):
        return (wr[w], wt[w], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_works,),
        in_specs=[
            pl.BlockSpec((1, rows, d_total), q_map),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, head_dim_ckv), q_map),
            pl.BlockSpec((1, rows, 8), q_map),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (6, chunk_pages, page_size, dc + dp if combined else dc),
                ckv_cache.dtype,
            ),
            pltpu.VMEM(
                (6, chunk_pages, page_size, 8 if combined else dp),
                kpe_cache.dtype,
            ),
            pltpu.SemaphoreType.DMA((6, chunk_pages, 2)),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, rows_total, head_dim_ckv), q.dtype),
            jax.ShapeDtypeStruct((batch, rows_total, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
    )(w_req, w_tile, kv_lens, q_lens, page_table,
      q, ckv_cache, kpe_cache)
    return out, lse[:, :, 0]


# ---------------------------------------------------------------------------
# Combined-cache row append (the MLA analog of paged_append_rows)
# ---------------------------------------------------------------------------


def _mla_append_rows_kernel(
    entries_ref,  # [B] i32 (SMEM): flat page row per request
    offs_ref,  # [B] i32 (SMEM): token offset within the page
    rows_ref,  # [B, D] VMEM: new combined (ckv | kpe) rows
    cache_ref,  # ANY [R, ps, D] — aliased input
    out_ref,  # ANY, aliased to cache_ref's buffer
    buf,  # [2, G, ps, D] VMEM scratch
    sem_in,  # DMA [2, G]
    sem_out,  # DMA [2, G]
    *,
    page_size: int,
    group: int,
    batch: int,
):
    """Single-launch batched append into the combined MLA cache
    [rows, page_size, D_ckv + D_kpe_pad]: read-modify-write G owning pages
    per pipelined iteration (same slot-parity scheme as
    pallas_decode._append_rows_kernel; a single token row cannot be
    DMA-sliced because of sublane tiling, so the whole page is rewritten
    with the row folded in via a masked select)."""
    n_groups = (batch + group - 1) // group

    def issue_in(i, slot):
        for g in range(group):
            idx = i * group + g
            if idx >= batch:
                break
            pltpu.make_async_copy(
                out_ref.at[entries_ref[idx]], buf.at[slot, g],
                sem_in.at[slot, g],
            ).start()

    def wait_in(i, slot):
        for g in range(group):
            idx = i * group + g
            if idx >= batch:
                break
            pltpu.make_async_copy(
                out_ref.at[0], buf.at[slot, g], sem_in.at[slot, g]
            ).wait()

    def issue_out(i, slot):
        for g in range(group):
            idx = i * group + g
            if idx >= batch:
                break
            pltpu.make_async_copy(
                buf.at[slot, g], out_ref.at[entries_ref[idx]],
                sem_out.at[slot, g],
            ).start()

    def wait_out(i, slot):
        for g in range(group):
            idx = i * group + g
            if idx >= batch:
                break
            pltpu.make_async_copy(
                buf.at[slot, g], out_ref.at[0], sem_out.at[slot, g]
            ).wait()

    issue_in(0, 0)
    for i in range(n_groups):
        slot = i % 2
        if i + 1 < n_groups:
            if i >= 1:
                wait_out(i - 1, 1 - slot)
            issue_in(i + 1, 1 - slot)
        wait_in(i, slot)
        for g in range(group):
            idx = i * group + g
            if idx >= batch:
                break
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (page_size, 1), 0)
                == offs_ref[idx]
            )
            buf[slot, g] = jnp.where(
                row, rows_ref[idx][None, :].astype(buf.dtype),
                buf[slot, g])
        issue_out(i, slot)
    for i in range(max(n_groups - 2, 0), n_groups):
        wait_out(i, i % 2)


def mla_append_rows(
    cache_flat: jax.Array,  # [rows, page_size, D] combined flat MLA cache
    entries: jax.Array,  # [B] i32 flat page row of each request
    offs: jax.Array,  # [B] i32 token offset within that page
    rows_new: jax.Array,  # [B, D] combined (ckv | kpe-padded) rows
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Write one new token's combined (ckv | kpe) row per request into the
    flat MLA cache IN PLACE (aliased Pallas read-modify-write; the MLA
    analog of :func:`pallas_decode.paged_append_rows` — reference
    AppendPagedKVMlaCache, page.cuh:441). Call it immediately before the
    attention kernel that reads the cache so the alias chain
    `cache -> append -> attention` stays a linear ownership chain and XLA
    never copies the buffer. Requests must own distinct pages."""
    batch = entries.shape[0]
    page_size, d = cache_flat.shape[1], cache_flat.shape[2]
    group = min(8, batch)
    kernel = functools.partial(
        _mla_append_rows_kernel, page_size=page_size, group=group,
        batch=batch,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((batch, d), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, group, page_size, d), cache_flat.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache_flat.shape, cache_flat.dtype),
        input_output_aliases={3: 0},  # cache_flat (after 2 prefetch args)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
    )(entries, offs, rows_new.astype(cache_flat.dtype), cache_flat)
