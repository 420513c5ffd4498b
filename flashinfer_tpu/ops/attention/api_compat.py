"""Backend-named API compatibility layer.

The reference ships several backend-specific entry points (trtllm-gen
cubins, XQA, cuDNN graphs, fmha_varlen) that all compute the same math as
the core wrappers — adopters (vLLM/SGLang/TRT-LLM) call these names
directly. On TPU there is exactly one backend (Pallas/XLA), so these are
thin routers to the core kernels with the reference argument surface:

* `trtllm_batch_decode_with_kv_cache` (reference decode.py:3007)
* `xqa_batch_decode_with_kv_cache` (decode.py:3526), `xqa` (xqa.py:188)
* `cudnn_batch_decode_with_kv_cache` / `cudnn_batch_prefill_with_kv_cache`
  (flashinfer/cudnn/{decode,prefill}.py)
* `fmha_varlen` (prefill.py:4136)
* `fast_decode_plan` (decode.py:3731 — SGLang fast-path plan)
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import KVLayout, check_kv_layout
from .decode import BatchDecodeWithPagedKVCacheWrapper
from .pallas_decode import paged_decode_attention
from .pallas_prefill import build_prefill_plan, run_prefill


def _unpack_block_kv(kv_cache: Any, kv_layout: str):
    """Reference trtllm kv layout: 5-D [pages, 1|2, ...] or (k, v) tuple;
    HND = [pages, H, ps, D] (decode.py:3007 docstring). Returns NHD k, v."""
    layout = check_kv_layout(kv_layout)
    if isinstance(kv_cache, (tuple, list)):
        k, v = kv_cache
    else:
        k, v = kv_cache[:, 0], kv_cache[:, 1]
    if layout == KVLayout.HND:
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    return k, v


def trtllm_batch_decode_with_kv_cache(
    query: jax.Array,  # [tokens, H_q, D]
    kv_cache: Any,
    workspace_buffer: Any = None,
    block_tables: jax.Array = None,  # [B, max_pages]
    seq_lens: jax.Array = None,  # [B]
    max_seq_len: int = 0,
    bmm1_scale: float = 1.0,
    bmm2_scale: float = 1.0,
    window_left: int = -1,
    out: Any = None,
    out_dtype: Any = None,
    sinks: Any = None,
    kv_layout: str = "HND",
    enable_pdl: Any = None,
    backend: str = "auto",
    q_len_per_req: int = 1,
    o_scale: float = 1.0,
    return_lse: bool = False,
    **_ignored,
):
    """Paged decode with trtllm-gen argument surface (decode.py:3007).

    ``bmm1_scale`` multiplies logits (the caller folds sm_scale and any
    q/k dequant scales in); ``bmm2_scale`` scales the output.
    """
    del workspace_buffer, max_seq_len, out, enable_pdl, backend
    k_cache, v_cache = _unpack_block_kv(kv_cache, kv_layout)
    if q_len_per_req != 1:
        # speculative multi-token decode (reference xqa spec-dec,
        # xqa.py:188 q_len inference): the last q_len_per_req positions of
        # each request attend causally over its pages — exactly a paged
        # prefill plan with qo_len = q_len_per_req
        import numpy as _np

        seq_h = _np.asarray(seq_lens, _np.int64)
        bt_h = _np.asarray(block_tables, _np.int64)
        batch = seq_h.shape[0]
        ps = k_cache.shape[1]
        hkv = k_cache.shape[2]
        hq = query.shape[-2]
        d = query.shape[-1]
        qo_indptr = _np.arange(batch + 1, dtype=_np.int64) * q_len_per_req
        page_lists = [
            bt_h[b, : max(1, -(-int(seq_h[b]) // ps))] for b in range(batch)
        ]
        plan = build_prefill_plan(
            qo_indptr, seq_h, hq, hkv, causal=True,
            page_table=page_lists, page_size=ps,
        )
        kf, vf = k_cache, v_cache
        if kf.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            # fp8 has NO hardware convert on v5e: one upcast pass + the
            # bf16 kernel measures FASTER than in-kernel fp8 conversion
            # (0.41+0.65 vs 1.85 ms on the b64/kv1k sweep) — int8 caches
            # below stream natively instead
            kf = kf.astype(jnp.bfloat16)
            vf = vf.astype(jnp.bfloat16)
        o, lse = run_prefill(
            query.reshape(batch * q_len_per_req, hq, d),
            kf.reshape(-1, hkv, d), vf.reshape(-1, hkv, d), plan,
            sm_scale=float(bmm1_scale), causal=True,
            window_left=window_left,
        )
        if bmm2_scale != 1.0:
            o = (o.astype(jnp.float32) * bmm2_scale).astype(o.dtype)
        if o_scale != 1.0:
            o = (o.astype(jnp.float32) / o_scale).astype(o.dtype)
        if out_dtype is not None:
            o = o.astype(out_dtype)
        return (o, lse) if return_lse else o
    kf = k_cache
    if kf.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        # see the q_len_per_req path above: upcast-then-bf16-kernel beats
        # in-kernel fp8 conversion on v5e; int8 streams natively (the
        # kernel's int8->bf16 convert hides under the DMA — measured
        # 776 vs 908 GB/s same-bytes, benchmarks/decode_int8_probe.py)
        kf = kf.astype(jnp.bfloat16)
        v_cache = v_cache.astype(jnp.bfloat16)
    o, lse = paged_decode_attention(
        query, kf, v_cache, block_tables, seq_lens.astype(jnp.int32),
        sm_scale=float(bmm1_scale), window_left=window_left,
        sinks=None if sinks is None else jnp.asarray(sinks),
    )
    if bmm2_scale != 1.0:
        o = (o.astype(jnp.float32) * bmm2_scale).astype(o.dtype)
    if o_scale != 1.0:
        o = (o.astype(jnp.float32) / o_scale).astype(o.dtype)
    if out_dtype is not None:
        o = o.astype(out_dtype)
    return (o, lse) if return_lse else o


def xqa_batch_decode_with_kv_cache(*args, **kwargs):
    """XQA decode (reference decode.py:3526) — same math, one TPU backend."""
    return trtllm_batch_decode_with_kv_cache(*args, **kwargs)


def xqa(
    q: jax.Array,  # [B, beam, H_q, D]
    k_cache: jax.Array,
    v_cache: jax.Array,
    page_table: jax.Array,
    seq_lens: jax.Array,
    output: Any = None,
    workspace_buffer: Any = None,
    *,
    q_scale: float = 1.0,
    kv_scale: Any = None,
    sliding_win_size: int = 0,
    sinks: Any = None,
    kv_layout: str = "NHD",
    **_ignored,
):
    """XQA-style decode (reference xqa.py:188): beam dim folded into batch."""
    del output, workspace_buffer
    b, beam, hq, d = q.shape
    layout = check_kv_layout(kv_layout)
    if layout == KVLayout.HND:
        k_cache = jnp.swapaxes(k_cache, 1, 2)
        v_cache = jnp.swapaxes(v_cache, 1, 2)
    if beam != 1:
        # beam search: beams share the request's pages — fold the beam dim
        # into batch with repeated page rows (reference xqa.py beamWidth)
        q = q.reshape(b * beam, 1, hq, d)
        page_table = jnp.repeat(page_table, beam, axis=0)
        seq_lens = jnp.repeat(seq_lens.reshape(-1), beam, axis=0)
        o = xqa(q, k_cache, v_cache, page_table, seq_lens,
                q_scale=q_scale, kv_scale=kv_scale,
                sliding_win_size=sliding_win_size, sinks=sinks,
                kv_layout="NHD")
        return o.reshape(b, beam, *o.shape[2:]) if o.ndim == 4 else (
            o.reshape(b, beam, hq, d))
    sm = q_scale / math.sqrt(d)
    kv_s = float(kv_scale) if kv_scale is not None else 1.0
    kf, vf = k_cache, v_cache
    if kf.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        kf = kf.astype(jnp.bfloat16)
        vf = vf.astype(jnp.bfloat16)
    o, _ = paged_decode_attention(
        q[:, 0], kf, vf, page_table, seq_lens.astype(jnp.int32),
        sm_scale=sm, k_scale=kv_s, v_scale=kv_s,
        window_left=(sliding_win_size - 1) if sliding_win_size > 0 else -1,
        sinks=None if sinks is None else jnp.asarray(sinks),
    )
    return o[:, None]


def cudnn_batch_decode_with_kv_cache(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    scale: float,
    workspace_buffer: Any,
    *,
    max_sequence_kv: int = 0,
    actual_seq_lens_kv: jax.Array = None,
    block_tables: jax.Array = None,
    return_lse: bool = False,
    **_ignored,
):
    """cuDNN decode surface (reference flashinfer/cudnn/decode.py)."""
    del workspace_buffer, max_sequence_kv
    o, lse = paged_decode_attention(
        q, k_cache, v_cache, block_tables,
        jnp.ravel(actual_seq_lens_kv).astype(jnp.int32), sm_scale=scale,
    )
    return (o, lse) if return_lse else o


def fmha_varlen(
    q: jax.Array,  # [total_q, H_q, D]
    k: jax.Array,  # [total_kv, H_kv, D]
    v: jax.Array,
    qo_segment_offsets: Any,  # [B+1]
    kv_segment_offsets: Any,  # [B+1]
    plan_info: Any = None,
    causal: bool = False,
    sm_scale: float | None = None,
    return_lse: bool = False,
    **_ignored,
):
    """Varlen FMHA (reference prefill.py:4136): ragged self-attention over
    host segment offsets."""
    del plan_info
    qo = np.asarray(qo_segment_offsets, np.int64)
    kv = np.asarray(kv_segment_offsets, np.int64)
    plan = build_prefill_plan(
        qo, kv[1:] - kv[:-1], q.shape[1], k.shape[1],
        causal=causal, kv_row_starts=kv[:-1],
    )
    out, lse = run_prefill(q, k, v, plan, sm_scale=sm_scale, causal=causal)
    return (out, lse) if return_lse else out


def fast_decode_plan(wrapper: BatchDecodeWithPagedKVCacheWrapper, *args,
                     **kwargs):
    """SGLang fast-path plan (reference decode.py:3731): on TPU plan() is
    already host-array-only with no device sync, so the fast path IS the
    plan path."""
    return wrapper.plan(*args, **kwargs)
