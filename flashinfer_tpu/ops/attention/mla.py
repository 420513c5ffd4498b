"""MLA (multi-latent attention, DeepSeek) paged decode — Pallas TPU kernel.

Capability parity with reference `BatchMLAPagedAttentionWrapper`
(flashinfer/mla/_core.py:1962; plan :2133, run :2267; kernels
include/flashinfer/attention/mla.cuh:853, plan `MLAPlan`
scheduler.cuh:1578). Semantics: compressed KV cache — per token one
``head_dim_ckv`` (512) latent vector + one ``head_dim_kpe`` (64) rope
vector shared by ALL query heads (MQA-like); attention scores are
``q_nope·ckv + q_pe·kpe`` and the output re-uses ckv as V.

TPU re-design: because KV is single-headed, the kernel is a (batch,
kv-page) grid like decode, but with all 128 q heads (× q_len for
speculative multi-token queries) riding the MXU M-dimension of one
``[H·q_len, 576] × [576, page]`` matmul — no GQA packing tricks needed.
The reference's heap-balanced split-KV plan (heap.h:15) collapses to the
sequential page sweep with VMEM-resident online-softmax state.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from ...api_logging import flashinfer_api
from ...trace import MLA_DECODE_TRACE
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...env import resolve_interpret
from .decode import build_dense_page_table

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _mla_kernel(
    # scalar prefetch
    page_table_ref,  # [B, max_pages] i32
    kv_lens_ref,  # [B] i32
    # inputs
    q_ref,  # [1, H*q_len, D_ckv + D_kpe]
    kv_ref,  # [1, page_size, D_ckv + D_kpe]  (concat ckv|kpe)
    # outputs
    o_ref,  # [1, H*q_len, D_ckv]
    lse_ref,  # [1, 1, H*q_len]
    # scratch
    m_scratch,  # [H*q_len, 128]
    l_scratch,  # [H*q_len, 128]
    acc_scratch,  # [H*q_len, D_ckv]
    *,
    num_heads: int,
    q_len: int,
    head_dim_ckv: int,
    page_size: int,
    sm_scale: float,
    causal: bool,
    ckv_scale: float,
    kpe_scale: float,
):
    b = pl.program_id(0)
    p = pl.program_id(1)
    kv_len = kv_lens_ref[b]
    rows = num_heads * q_len

    @pl.when(p == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    page_start = p * page_size

    @pl.when(page_start < kv_len)
    def _compute():
        q = q_ref[0].astype(jnp.float32) * sm_scale  # [rows, D]
        kv = kv_ref[0].astype(jnp.float32)  # [ps, D]
        if ckv_scale != 1.0 or kpe_scale != 1.0:
            d = head_dim_ckv
            kv = jnp.concatenate(
                [kv[:, :d] * ckv_scale, kv[:, d:] * kpe_scale], axis=1
            )
        s = jax.lax.dot_general(
            q, kv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, ps]

        pos = page_start + jax.lax.broadcasted_iota(
            jnp.int32, (rows, page_size), dimension=1
        )
        if causal and q_len > 1:
            # row r = token (r // H); token t sees kv_len - (q_len-1-t) entries
            tok = jax.lax.broadcasted_iota(
                jnp.int32, (rows, page_size), dimension=0
            ) // num_heads
            limit = kv_len - (q_len - 1) + tok
        else:
            limit = kv_len
        mask = pos < limit
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [rows, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_new)
        probs = jnp.exp(s - m_new[:, :1])
        probs = jnp.where(mask, probs, 0.0)
        l_cur = jnp.sum(probs, axis=1, keepdims=True)
        m_scratch[...] = m_new
        l_scratch[...] = l_prev * alpha + jnp.broadcast_to(l_cur, l_prev.shape)
        pv = jax.lax.dot_general(
            probs, kv[:, :head_dim_ckv],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, D_ckv]
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    @pl.when(p == pl.num_programs(1) - 1)
    def _finalize():
        l = l_scratch[...]
        m = m_scratch[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[...] / l_safe[:, :1]).astype(o_ref.dtype)
        lse = m[:, :1] + jnp.log(l_safe[:, :1])
        lse = jnp.where(l[:, :1] == 0.0, -jnp.inf, lse)
        lse_ref[0, 0] = lse[:, 0].astype(lse_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "q_len", "head_dim_ckv", "sm_scale", "causal",
        "ckv_scale", "kpe_scale", "interpret",
    ),
)
def paged_mla_attention(
    q: jax.Array,  # [B, H*q_len, D_ckv + D_kpe]  (nope|pe concat)
    kv_cache: jax.Array,  # [pages, page_size, D_ckv + D_kpe]
    page_table: jax.Array,  # [B, max_pages]
    kv_lens: jax.Array,  # [B]
    *,
    num_heads: int,
    q_len: int,
    head_dim_ckv: int,
    sm_scale: float,
    causal: bool,
    ckv_scale: float = 1.0,
    kpe_scale: float = 1.0,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    batch = q.shape[0]
    _, page_size, d_total = kv_cache.shape
    max_pages = page_table.shape[1]
    rows = num_heads * q_len

    kernel = functools.partial(
        _mla_kernel,
        num_heads=num_heads, q_len=q_len, head_dim_ckv=head_dim_ckv,
        page_size=page_size, sm_scale=float(sm_scale), causal=bool(causal),
        ckv_scale=float(ckv_scale), kpe_scale=float(kpe_scale),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, max_pages),
        in_specs=[
            pl.BlockSpec((1, rows, d_total), lambda b, p, pt, kl: (b, 0, 0)),
            pl.BlockSpec(
                (1, page_size, d_total), lambda b, p, pt, kl: (pt[b, p], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, head_dim_ckv), lambda b, p, pt, kl: (b, 0, 0)),
            pl.BlockSpec((1, 1, rows), lambda b, p, pt, kl: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, head_dim_ckv), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, rows, head_dim_ckv), q.dtype),
            jax.ShapeDtypeStruct((batch, 1, rows), jnp.float32),
        ],
        interpret=resolve_interpret(interpret),
    )(page_table, kv_lens, q, kv_cache)
    return out, lse[:, 0]


class BatchMLAPagedAttentionWrapper:
    """MLA paged attention with the plan/run protocol (mla/_core.py:1962).

    plan() builds the static dense page table host-side (the TPU analog of
    `MLAPlan`'s pinned-memory work tables, scheduler.cuh:1578); run() is a
    pure jitted Pallas launch. Supports uniform multi-token queries per
    request (speculative decoding) via ``qo_indptr`` strides.
    """

    def __init__(self, float_workspace_buffer: Any = None, backend: str = "auto",
                 *_args, **_kw) -> None:
        del float_workspace_buffer, backend
        self._plan: dict[str, Any] | None = None
        self._page_table: jax.Array | None = None
        self._kv_lens: jax.Array | None = None

    def plan(
        self,
        qo_indptr: Any,
        kv_indptr: Any,
        kv_indices: Any,
        kv_len_arr: Any,
        num_heads: int,
        head_dim_ckv: int,
        head_dim_kpe: int,
        page_size: int,
        causal: bool,
        sm_scale: float,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = None,
        use_profiler: bool = False,
    ) -> None:
        del q_data_type, kv_data_type, use_profiler
        from ...utils import cdiv
        from .pallas_mla import build_mla_work_plan

        qo = np.asarray(qo_indptr, np.int64)
        q_lens = np.diff(qo) if len(qo) > 1 else np.asarray([1])
        batch = len(qo) - 1
        qmax = int(q_lens.max()) if batch else 1
        # q-tile size: decode TQ=1 (one token x 128 heads of MXU rows);
        # speculative/prefill tiles pack up to 4 tokens
        tq = 1 if qmax <= 1 else min(4, qmax)
        qmax_pad = cdiv(qmax, tq) * tq
        w_req, w_tile = build_mla_work_plan(q_lens, tq)
        # padded-q gather map (host): token t of request b -> padded row
        pad_src = np.zeros(batch * qmax_pad, np.int64)
        pad_valid = np.zeros(batch * qmax_pad, bool)
        for b in range(batch):
            ql = int(q_lens[b])
            pad_src[b * qmax_pad:b * qmax_pad + ql] = np.arange(
                qo[b], qo[b] + ql)
            pad_valid[b * qmax_pad:b * qmax_pad + ql] = True
        table = build_dense_page_table(
            np.asarray(kv_indptr, np.int32), np.asarray(kv_indices, np.int32)
        )
        self._page_table = jnp.asarray(table)
        self._kv_lens = jnp.asarray(np.asarray(kv_len_arr, np.int32))
        # DMA chunk: 2048-token chunks measure ~2% over 1024 at long kv
        # (553 vs 542 GB/s, b64 kv2k v5e) but over-read short requests —
        # pick by the planned batch's median kv length
        kvl = np.asarray(kv_len_arr, np.int64)
        chunk_tokens = 2048 if (len(kvl) and np.median(kvl) >= 2048) else 1024
        self._plan = dict(
            chunk_tokens=int(max(chunk_tokens, page_size)),
            num_heads=num_heads, head_dim_ckv=head_dim_ckv,
            head_dim_kpe=head_dim_kpe, page_size=page_size,
            causal=bool(causal), sm_scale=float(sm_scale),
            batch=batch, qmax_pad=qmax_pad, tq=tq,
            total_q=int(qo[-1]) if batch else 0,
            w_req=w_req, w_tile=w_tile,
            q_lens=jnp.asarray(q_lens.astype(np.int32)),
            pad_src=jnp.asarray(pad_src.astype(np.int32)),
            pad_valid=jnp.asarray(pad_valid),
            # padded-row index of each ragged token (computed host-side at
            # plan time: creating it lazily inside a traced run() leaks a
            # tracer into the plan cache)
            inv=jnp.asarray(np.nonzero(pad_valid)[0].astype(np.int32)),
        )

    @flashinfer_api(trace=MLA_DECODE_TRACE, method=True)
    def run(
        self,
        q_nope: jax.Array,  # [B*q_len, H, D_ckv]
        q_pe: jax.Array,  # [B*q_len, H, D_kpe]
        ckv_cache: jax.Array,  # [pages, page_size, D_ckv]
        kpe_cache: jax.Array,  # [pages, page_size, D_kpe]
        out: Any = None,
        lse: Any = None,
        return_lse: bool = False,
        *,
        ckv_scale: float | None = None,
        kpe_scale: float | None = None,
        interpret: bool | None = None,
        **_ignored,
    ):
        if self._plan is None:
            raise RuntimeError("call plan() before run()")
        from .pallas_mla import mla_stream

        p = self._plan
        if (resolve_interpret(interpret) and p["qmax_pad"] == p["tq"]
                and p["batch"] > 0
                and p["total_q"] == p["batch"] * p["qmax_pad"]):
            # uniform q_len under the interpreter: the BlockSpec kernel is
            # an independent reference implementation and emulates much
            # faster than the streaming kernel's DMA pipeline
            return self._run_blockspec(
                q_nope, q_pe, ckv_cache, kpe_cache,
                return_lse=return_lse, ckv_scale=ckv_scale,
                kpe_scale=kpe_scale, interpret=interpret)
        h, d_ckv, d_kpe = p["num_heads"], p["head_dim_ckv"], p["head_dim_kpe"]
        batch, qmax_pad, tq = p["batch"], p["qmax_pad"], p["tq"]
        # ragged [total_q, H, D] -> padded token-major rows
        # [B, qmax_pad*H, D_ckv + D_kpe]
        pad_src, pad_valid = p["pad_src"], p["pad_valid"]
        qn = (q_nope[pad_src]
              * pad_valid[:, None, None].astype(q_nope.dtype))
        qp = (q_pe[pad_src]
              * pad_valid[:, None, None].astype(q_pe.dtype))
        q = jnp.concatenate([qn, qp], axis=-1).reshape(
            batch, qmax_pad * h, d_ckv + d_kpe)
        o, lse_out = mla_stream(
            q, ckv_cache, kpe_cache, self._page_table, self._kv_lens,
            p["q_lens"], p["w_req"], p["w_tile"],
            num_heads=h, tq=tq, head_dim_ckv=d_ckv,
            sm_scale=p["sm_scale"], causal=p["causal"],
            ckv_scale=float(ckv_scale or 1.0),
            kpe_scale=float(kpe_scale or 1.0),
            chunk_tokens=p.get("chunk_tokens", 1024),
            interpret=interpret,
        )
        o = o.reshape(batch * qmax_pad, h, d_ckv)[p["inv"]]
        lse_out = lse_out.reshape(batch * qmax_pad, h)[p["inv"]]
        if return_lse:
            return o, lse_out
        return o

    def _run_blockspec(self, q_nope, q_pe, ckv_cache, kpe_cache, *,
                       return_lse, ckv_scale, kpe_scale, interpret):
        p = self._plan
        h, d_ckv, d_kpe = p["num_heads"], p["head_dim_ckv"], p["head_dim_kpe"]
        q_len, batch = p["qmax_pad"], p["batch"]
        qn = q_nope.reshape(batch, q_len * h, d_ckv)
        qp = q_pe.reshape(batch, q_len * h, d_kpe)
        if kpe_cache is None:
            # combined lane-padded cache [pages, ps, d_ckv + kpe_pad]:
            # zero-pad q_pe to the cache's pe width (zeros score 0)
            kv = ckv_cache
            pad = kv.shape[-1] - d_ckv - d_kpe
            if pad:
                qp = jnp.pad(qp, ((0, 0), (0, 0), (0, pad)))
        else:
            kv = jnp.concatenate([ckv_cache, kpe_cache], axis=-1)
        q = jnp.concatenate([qn, qp], axis=-1)
        if kv.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            kv = kv.astype(jnp.bfloat16)
        o, lse_out = paged_mla_attention(
            q, kv, self._page_table, self._kv_lens,
            num_heads=h, q_len=q_len, head_dim_ckv=d_ckv,
            sm_scale=p["sm_scale"], causal=p["causal"],
            ckv_scale=float(ckv_scale or 1.0),
            kpe_scale=float(kpe_scale or 1.0), interpret=interpret,
        )
        o = o.reshape(batch * q_len, h, d_ckv)
        lse_out = lse_out.reshape(batch * q_len, h)
        if return_lse:
            return o, lse_out
        return o

    run_return_lse = functools.partialmethod(run, return_lse=True)


class BatchDecodeMlaWithPagedKVCacheWrapper(BatchMLAPagedAttentionWrapper):
    """Legacy MLA decode wrapper (reference decode.py:2346) — the older
    argument order over the same kernel. plan(indptr, indices,
    last_page_len, num_qo_heads, head_dim_ckv, page_size, ...)."""

    def plan(  # type: ignore[override]
        self,
        indptr: Any,
        indices: Any,
        last_page_len: Any,
        num_qo_heads: int,
        head_dim_compressed_kv: int,
        page_size: int,
        causal: bool = False,
        sm_scale: float | None = None,
        window_left: int = -1,
        logits_soft_cap: float | None = None,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = None,
        **_ignored,
    ) -> None:
        import math as _math

        indptr_h = np.asarray(indptr, np.int32)
        last_h = np.asarray(last_page_len, np.int32)
        batch = len(indptr_h) - 1
        pages = indptr_h[1:] - indptr_h[:-1]
        kv_lens = np.where(
            pages == 0, 0, np.maximum(pages - 1, 0) * page_size + last_h
        ).astype(np.int32)
        qo_indptr = np.arange(batch + 1, dtype=np.int32)
        if sm_scale is None:
            sm_scale = 1.0 / _math.sqrt(head_dim_compressed_kv + 64)
        super().plan(
            qo_indptr, indptr_h, np.asarray(indices, np.int32), kv_lens,
            num_qo_heads, head_dim_compressed_kv, 64, page_size,
            causal=causal, sm_scale=float(sm_scale),
            q_data_type=q_data_type, kv_data_type=kv_data_type,
        )


def xqa_mla(
    q: jax.Array,  # [B, beam, H, 576] (nope|pe concat) or split pair
    kv_cache: jax.Array,  # [pages, page_size, 576]
    page_table: jax.Array,
    seq_lens: jax.Array,
    output: Any = None,
    workspace_buffer: Any = None,
    *,
    q_scale: float = 1.0,
    kv_scale: Any = None,
    sm_scale: float | None = None,
    **_ignored,
) -> jax.Array:
    """XQA MLA decode (reference xqa.py:542) routed to the MLA kernel."""
    del output, workspace_buffer
    import math as _math

    b, beam, h, d_total = q.shape
    d_ckv = d_total - 64
    if sm_scale is None:
        sm_scale = q_scale / _math.sqrt(d_total)
    kvf = kv_cache
    if kvf.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        kvf = kvf.astype(jnp.bfloat16)
    # beams share their request's cache (reference xqa.py beam_width):
    # fold beam into batch with a repeated page table — each beam is an
    # independent non-causal query over the same prefix
    qq = q.reshape(b * beam, h, d_total)
    pt = jnp.repeat(page_table, beam, axis=0) if beam > 1 else page_table
    sl = jnp.repeat(seq_lens, beam, axis=0) if beam > 1 else seq_lens
    o, _ = paged_mla_attention(
        qq, kvf, pt, sl.astype(jnp.int32),
        num_heads=h, q_len=1, head_dim_ckv=d_ckv, sm_scale=float(sm_scale),
        causal=False,
        ckv_scale=float(kv_scale) if kv_scale is not None else 1.0,
        kpe_scale=float(kv_scale) if kv_scale is not None else 1.0,
    )
    return o.reshape(b, beam, h, d_ckv)

def sparse_mla_attention(
    q: jax.Array,  # [B, Q, H, 576] (nope-absorbed 512 | pe 64)
    kv_cache: jax.Array,  # [pages, page_size, 576] (ckv | kpe)
    indices: jax.Array,  # [B, Q, K] i32 global token slots (page*ps + slot)
    topk_lens: jax.Array | None = None,  # [B] or [B, Q] valid-count per q
    *,
    sm_scale: float | None = None,
    head_dim_ckv: int = 512,
    sinks: jax.Array | None = None,  # [H] attention-sink logits
    return_lse: bool = False,
):
    """DSv3.2/GLM sparse top-k MLA attention (reference
    mla/_sparse_mla_sm120.py:30; entry `_core.py:540`): every query token
    attends to exactly its ``K`` pre-selected candidate KV tokens, given as
    global slot indices into the shared paged pool
    (``uses_shared_paged_kv_idx`` layout). Negative indices and positions
    ``>= topk_lens`` are masked out.

    TPU design: the candidate rows are scattered single tokens, so a
    Pallas per-row DMA would be descriptor-rate-bound (~1152 B/row —
    measured in round 2 that descriptor rate, not bandwidth, limits such
    kernels). The XLA row-gather feeds one ``[H, 576] x [576, K]`` MXU
    matmul per (b, q) instead — with 128 shared q heads the arithmetic
    intensity makes this MXU-bound, which is the same regime the
    reference's warp-spec sparse kernel targets.
    """
    b, q_len, h, d_total = q.shape
    k_top = indices.shape[-1]
    d_ckv = head_dim_ckv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d_total)
    pool = kv_cache.reshape(-1, kv_cache.shape[-1])
    if pool.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        pool = pool.astype(jnp.bfloat16)
    valid = indices >= 0
    if topk_lens is not None:
        if topk_lens.ndim == 1:
            topk_lens = topk_lens[:, None]
        valid = jnp.logical_and(
            valid,
            jnp.arange(k_top, dtype=jnp.int32)[None, None, :]
            < topk_lens[..., None],
        )
    safe = jnp.where(valid, indices, 0)
    kv = pool[safe]  # [B, Q, K, 576]
    qf = q.astype(jnp.float32) * sm_scale
    s = jnp.einsum(
        "bqhd,bqkd->bqhk", qf, kv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(valid[:, :, None, :], s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    if sinks is not None:
        m = jnp.maximum(m, sinks.astype(jnp.float32)[None, None, :, None])
    m = jnp.maximum(m, DEFAULT_MASK_VALUE)  # all-masked rows stay finite
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if sinks is not None:
        l = l + jnp.exp(sinks.astype(jnp.float32)[None, None, :, None] - m)
    o = jnp.einsum(
        "bqhk,bqkd->bqhd", p / jnp.maximum(l, 1e-30),
        kv[..., :d_ckv].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    if not return_lse:
        return o
    lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0]  # [B, Q, H]
    return o, lse


def trtllm_batch_decode_with_kv_cache_mla(
    query: jax.Array,  # [B, Q, H, 576]
    kv_cache: jax.Array,  # [pages, page_size, 576]
    workspace_buffer: Any = None,
    qk_nope_head_dim: int = 128,
    kv_lora_rank: int = 512,
    qk_rope_head_dim: int = 64,
    block_tables: jax.Array | None = None,  # dense [B, P] or sparse [B,Q,K]
    seq_lens: jax.Array | None = None,
    max_seq_len: int = 0,
    sparse_mla_top_k: int = 0,
    out: Any = None,
    bmm1_scale: float = 1.0,
    bmm2_scale: float = 1.0,
    sinks: Any = None,
    lse: Any = None,
    return_lse: bool = False,
    sparse_mla_top_k_lens: jax.Array | None = None,
    **_ignored,
):
    """MLA decode with optional sparse top-k (reference _core.py:3454).

    ``sparse_mla_top_k == 0``: dense paged MLA via the streaming kernel
    (``block_tables`` is the per-request page table). ``> 0``: the DSv3.2
    sparse path — ``block_tables`` is ``[B, Q, top_k]`` global slot
    indices (``uses_shared_paged_kv_idx``).
    """
    del workspace_buffer, qk_nope_head_dim, out, lse
    b, q_len, h, d_total = query.shape
    if sinks is not None and isinstance(sinks, (list, tuple)):
        sinks = sinks[0]
    if sparse_mla_top_k > 0:
        res = sparse_mla_attention(
            query, kv_cache, block_tables,
            sparse_mla_top_k_lens if sparse_mla_top_k_lens is not None
            else seq_lens,
            sm_scale=float(bmm1_scale), head_dim_ckv=kv_lora_rank,
            sinks=sinks, return_lse=return_lse,
        )
        o = res[0] if return_lse else res
        if bmm2_scale != 1.0:
            o = (o.astype(jnp.float32) * bmm2_scale).astype(o.dtype)
        return (o, res[1]) if return_lse else o
    kvf = kv_cache
    if kvf.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        kvf = kvf.astype(jnp.bfloat16)
    o, lse_out = paged_mla_attention(
        query.reshape(b, q_len * h, d_total) if q_len > 1 else query[:, 0],
        kvf, block_tables, seq_lens.astype(jnp.int32),
        num_heads=h, q_len=q_len, head_dim_ckv=kv_lora_rank,
        sm_scale=float(bmm1_scale), causal=q_len > 1,
    )
    o = o.reshape(b, q_len, h, kv_lora_rank)
    if bmm2_scale != 1.0:
        o = (o.astype(jnp.float32) * bmm2_scale).astype(o.dtype)
    if return_lse:
        return o, lse_out.reshape(b, q_len, h)
    return o


def trtllm_batch_decode_sparse_mla_dsv4(
    query: jax.Array,  # [B, Q, H, 512]
    swa_kv_cache: jax.Array,  # [pages, page_size, 512] sliding-window pool
    workspace_buffer: Any = None,
    sparse_indices: jax.Array | None = None,  # [B, Q, K] (first 128 = SWA)
    compressed_kv_cache: jax.Array | None = None,  # [pages, ps, 512]
    sparse_topk_lens: jax.Array | None = None,
    seq_lens: jax.Array | None = None,
    out: Any = None,
    bmm1_scale: float = 1.0,
    bmm2_scale: float = 1.0,
    sinks: Any = None,
    **_ignored,
) -> jax.Array:
    """DeepSeek V4 sparse MLA decode (reference _core.py:1487): head dim
    512 for q and both pools; ``sparse_indices`` columns ``[:128]`` index
    the SWA pool, the rest the compressed pool; ``sparse_topk_lens``
    counts valid entries including the 128 SWA slots.

    TPU design: both pools are row-gathered into one candidate set and a
    single dense softmax runs over it (one MXU matmul per (b, q)), the
    same unification the trtllm-gen kernel does across its two segment
    descriptors.
    """
    del workspace_buffer, out
    if sparse_indices is None:
        raise ValueError("sparse_indices required")
    n_swa = min(128, sparse_indices.shape[-1])
    d = query.shape[-1]
    swa_pool = swa_kv_cache.reshape(-1, d)
    if compressed_kv_cache is not None and sparse_indices.shape[-1] > n_swa:
        comp_pool = compressed_kv_cache.reshape(-1, d)
        offset = swa_pool.shape[0]
        # merge: rebase compressed indices past the SWA pool, stack pools
        pool = jnp.concatenate([swa_pool, comp_pool], axis=0)
        idx = jnp.concatenate(
            [
                sparse_indices[..., :n_swa],
                jnp.where(
                    sparse_indices[..., n_swa:] >= 0,
                    sparse_indices[..., n_swa:] + offset,
                    sparse_indices[..., n_swa:],
                ),
            ],
            axis=-1,
        )
    else:
        pool = swa_pool
        idx = sparse_indices[..., :n_swa]
    if sinks is not None and isinstance(sinks, (list, tuple)):
        sinks = sinks[0]
    o = sparse_mla_attention(
        query, pool[:, None, :], idx, sparse_topk_lens,
        sm_scale=float(bmm1_scale), head_dim_ckv=d, sinks=sinks,
    )
    if bmm2_scale != 1.0:
        o = (o.astype(jnp.float32) * bmm2_scale).astype(o.dtype)
    return o
