"""Prefill/append attention public API: single + batch ragged/paged wrappers.

Capability parity with reference flashinfer/prefill.py
(`single_prefill_with_kv_cache` prefill.py:1174,
`BatchPrefillWithPagedKVCacheWrapper` prefill.py:1493 / plan prefill.py:2069,
`BatchPrefillWithRaggedKVCacheWrapper` prefill.py:2948). Plan/run split per
SURVEY §2.9: plan() builds the flat-item work list host-side
(pallas_prefill.build_prefill_plan — the TPU analog of PrefillSplitQOKVIndptr
scheduler.cuh:763); run() is a pure jitted device call.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from ...api_logging import flashinfer_api
from ...trace import PREFILL_TRACE
import numpy as np

from ...utils import (
    KVLayout,
    check_kv_layout,
    kv_cache_dims,
    unpack_paged_kv_cache,
)
from .pallas_prefill import PrefillPlan, build_prefill_plan, run_prefill
from .variants import AttentionVariant


def _as_variant(jit_args):
    if jit_args is None:
        return None
    if isinstance(jit_args, AttentionVariant):
        return jit_args
    raise NotImplementedError(
        "jit_args must be an AttentionVariant (C++ source injection is a "
        "CUDA mechanism; on TPU the hooks are traced Python callables)")


def _default_plan_kwargs(
    num_qo_heads, num_kv_heads, head_dim, causal, window_left,
    logits_soft_cap, sm_scale,
):
    return dict(
        num_qo_heads=num_qo_heads,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        causal=bool(causal),
        window_left=int(window_left),
        logits_soft_cap=float(logits_soft_cap or 0.0),
        sm_scale=(
            float(sm_scale) if sm_scale is not None else 1.0 / math.sqrt(head_dim)
        ),
    )


class BatchPrefillWithRaggedKVCacheWrapper:
    """Batch prefill over ragged (contiguous per-request) KV
    (reference prefill.py:2948)."""

    def __init__(
        self,
        float_workspace_buffer: Any = None,
        kv_layout: str = "NHD",
        backend: str = "auto",
        *,
        jit_args: Any = None,
    ) -> None:
        del float_workspace_buffer, backend
        # custom attention variants: jit_args accepts an AttentionVariant
        # (the reference injects C++ source via jit_args,
        # jit/attention/modules.py:1599; here the hooks are Python
        # callables traced into the Pallas kernel — variants.py)
        self._variant = _as_variant(jit_args)
        self._kv_layout = check_kv_layout(kv_layout)
        self._plan: PrefillPlan | None = None
        self._params: dict | None = None
        self._custom_mask = None
        self._kv_indptr_host: np.ndarray | None = None

    def plan(
        self,
        qo_indptr: Any,
        kv_indptr: Any,
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim_qk: int,
        head_dim_vo: int | None = None,
        custom_mask: Any = None,
        packed_custom_mask: Any = None,
        causal: bool = False,
        pos_encoding_mode: str = "NONE",
        use_fp16_qk_reduction: bool = False,
        window_left: int = -1,
        logits_soft_cap: float | None = None,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = None,
        sm_scale: float | None = None,
        rope_scale: float | None = None,
        rope_theta: float | None = None,
    ) -> None:
        del head_dim_vo, use_fp16_qk_reduction, q_data_type, kv_data_type
        if pos_encoding_mode not in ("NONE", "ALIBI", "ROPE_LLAMA"):
            raise NotImplementedError(
                f"pos_encoding_mode {pos_encoding_mode!r} not supported"
            )
        qo_h = np.asarray(qo_indptr, np.int64)
        kv_h = np.asarray(kv_indptr, np.int64)
        kv_lens = kv_h[1:] - kv_h[:-1]
        self._plan = build_prefill_plan(
            qo_h, kv_lens, num_qo_heads, num_kv_heads,
            causal=causal, kv_row_starts=kv_h[:-1],
        )
        self._params = _default_plan_kwargs(
            num_qo_heads, num_kv_heads, head_dim_qk, causal, window_left,
            logits_soft_cap, sm_scale,
        )
        self._params["use_alibi"] = pos_encoding_mode == "ALIBI"
        self._params["use_rope"] = pos_encoding_mode == "ROPE_LLAMA"
        self._params["rope_theta"] = float(rope_theta or 1e4)
        self._params["rope_scale"] = float(rope_scale or 1.0)
        self._qo_indptr_dev = jnp.asarray(qo_h.astype(np.int32))
        self._kv_lens_dev = jnp.asarray(kv_lens.astype(np.int32))
        self._custom_mask = _build_plan_mask(
            self._plan, qo_h, kv_lens, custom_mask, packed_custom_mask
        )

    begin_forward = plan

    @flashinfer_api(trace=PREFILL_TRACE, method=True)
    def run(
        self,
        q: jax.Array,  # [total_q, H_q, D]
        k: jax.Array,  # [total_kv, H_kv, D]
        v: jax.Array,
        *,
        k_scale: float | None = None,
        v_scale: float | None = None,
        return_lse: bool = False,
        sinks: jax.Array | None = None,
        enable_pdl: bool | None = None,
        interpret: bool | None = None,
    ):
        if self._plan is None:
            raise RuntimeError("call plan() before run()")
        del enable_pdl
        p = self._params
        if self._kv_layout == KVLayout.HND:
            k = jnp.swapaxes(k, 0, 1)
            v = jnp.swapaxes(v, 0, 1)
        alibi = None
        if p["use_alibi"]:
            alibi = _alibi_slopes(p["num_qo_heads"])
        rope_kw = {}
        if p.get("use_rope"):
            # fused rope: q rotated here at its in-request positions (the
            # append convention: token i of request b sits at
            # kv_len - qo_len + i); K rotates inside the kernel
            from ..rope import apply_rope

            offs = self._kv_lens_dev - jnp.diff(self._qo_indptr_dev)
            q, _ = apply_rope(
                q, q, self._qo_indptr_dev, offs,
                rope_scale=p["rope_scale"], rope_theta=p["rope_theta"])
            rope_kw = dict(rope_theta=p["rope_theta"],
                           rope_scale=p["rope_scale"])
        out, lse = run_prefill(
            q, k, v, self._plan,
            sm_scale=p["sm_scale"], causal=p["causal"],
            logits_soft_cap=p["logits_soft_cap"], window_left=p["window_left"],
            k_scale=float(k_scale or 1.0), v_scale=float(v_scale or 1.0),
            sinks=sinks, alibi_slopes=alibi, custom_mask=self._custom_mask,
            variant=self._variant, interpret=interpret, **rope_kw,
        )
        if return_lse:
            return out, lse
        return out

    def run_return_lse(self, *args, **kwargs):
        return self.run(*args, return_lse=True, **kwargs)

    forward = run

    def end_forward(self) -> None:
        pass


class BatchPrefillWithPagedKVCacheWrapper:
    """Batch prefill/append over a paged KV cache (reference prefill.py:1493).

    q covers the new (appended) tokens; KV pages cover prefix + new tokens.
    """

    def __init__(
        self,
        float_workspace_buffer: Any = None,
        kv_layout: str = "NHD",
        use_cuda_graph: bool = False,
        backend: str = "auto",
        *,
        jit_args: Any = None,
    ) -> None:
        del float_workspace_buffer, use_cuda_graph, backend
        self._variant = _as_variant(jit_args)
        self._kv_layout = check_kv_layout(kv_layout)
        self._plan: PrefillPlan | None = None
        self._params: dict | None = None
        self._custom_mask = None
        self._page_size: int | None = None

    def plan(
        self,
        qo_indptr: Any,
        paged_kv_indptr: Any,
        paged_kv_indices: Any,
        paged_kv_last_page_len: Any,
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim_qk: int,
        page_size: int,
        head_dim_vo: int | None = None,
        custom_mask: Any = None,
        packed_custom_mask: Any = None,
        causal: bool = False,
        pos_encoding_mode: str = "NONE",
        use_fp16_qk_reduction: bool = False,
        window_left: int = -1,
        logits_soft_cap: float | None = None,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = None,
        sm_scale: float | None = None,
        rope_scale: float | None = None,
        rope_theta: float | None = None,
    ) -> None:
        del head_dim_vo, use_fp16_qk_reduction, q_data_type, kv_data_type
        if pos_encoding_mode not in ("NONE", "ALIBI", "ROPE_LLAMA"):
            raise NotImplementedError(
                f"pos_encoding_mode {pos_encoding_mode!r} not supported")
        qo_h = np.asarray(qo_indptr, np.int64)
        indptr_h = np.asarray(paged_kv_indptr, np.int64)
        indices_h = np.asarray(paged_kv_indices, np.int64)
        last_h = np.asarray(paged_kv_last_page_len, np.int64)
        batch = len(qo_h) - 1
        pages_per_req = indptr_h[1:] - indptr_h[:-1]
        kv_lens = np.where(
            pages_per_req == 0, 0,
            np.maximum(pages_per_req - 1, 0) * page_size + last_h,
        )
        page_table = [
            indices_h[indptr_h[b] : indptr_h[b + 1]] for b in range(batch)
        ]
        self._plan = build_prefill_plan(
            qo_h, kv_lens, num_qo_heads, num_kv_heads,
            causal=causal, page_table=page_table, page_size=page_size,
        )
        self._page_size = page_size
        self._params = _default_plan_kwargs(
            num_qo_heads, num_kv_heads, head_dim_qk, causal, window_left,
            logits_soft_cap, sm_scale,
        )
        self._params["use_alibi"] = pos_encoding_mode == "ALIBI"
        # fused rope on the paged path (VERDICT r2 #8): the hm kernel
        # gathers each request's pages into a logically-contiguous
        # 8-aligned pool, so its in-flight K rotation (chunk-local
        # positions) is exactly the request-relative rope position —
        # reference pos_enc.cuh:294 fuses the same way
        self._params["use_rope"] = pos_encoding_mode == "ROPE_LLAMA"
        self._params["rope_theta"] = float(rope_theta or 1e4)
        self._params["rope_scale"] = float(rope_scale or 1.0)
        self._qo_indptr_dev = jnp.asarray(qo_h.astype(np.int32))
        self._kv_lens_dev = jnp.asarray(kv_lens.astype(np.int32))
        self._custom_mask = _build_plan_mask(
            self._plan, qo_h, kv_lens, custom_mask, packed_custom_mask
        )

    begin_forward = plan

    @flashinfer_api(method=True)
    def run(
        self,
        q: jax.Array,  # [total_q, H_q, D]
        paged_kv_cache: Any,
        *,
        k_scale: float | None = None,
        v_scale: float | None = None,
        return_lse: bool = False,
        sinks: jax.Array | None = None,
        enable_pdl: bool | None = None,
        interpret: bool | None = None,
    ):
        if self._plan is None:
            raise RuntimeError("call plan() before run()")
        del enable_pdl
        p = self._params
        k_cache, v_cache = unpack_paged_kv_cache(paged_kv_cache, self._kv_layout)
        if self._kv_layout == KVLayout.HND:
            k_cache = jnp.swapaxes(k_cache, 1, 2)
            v_cache = jnp.swapaxes(v_cache, 1, 2)
        num_pages, page_size, h_kv, d = kv_cache_dims(k_cache, KVLayout.NHD)
        if page_size != self._page_size:
            raise ValueError(
                f"cache page_size {page_size} != planned {self._page_size}"
            )
        k_rows = k_cache.reshape(num_pages * page_size, h_kv, d)
        v_rows = v_cache.reshape(num_pages * page_size, h_kv, d)
        alibi = _alibi_slopes(p["num_qo_heads"]) if p["use_alibi"] else None
        rope_kw = {}
        if p.get("use_rope"):
            from ..rope import apply_rope

            offs = self._kv_lens_dev - jnp.diff(self._qo_indptr_dev)
            q, _ = apply_rope(
                q, q, self._qo_indptr_dev, offs,
                rope_scale=p["rope_scale"], rope_theta=p["rope_theta"])
            rope_kw = dict(rope_theta=p["rope_theta"],
                           rope_scale=p["rope_scale"])
        out, lse = run_prefill(
            q, k_rows, v_rows, self._plan,
            sm_scale=p["sm_scale"], causal=p["causal"],
            logits_soft_cap=p["logits_soft_cap"], window_left=p["window_left"],
            k_scale=float(k_scale or 1.0), v_scale=float(v_scale or 1.0),
            sinks=sinks, alibi_slopes=alibi, custom_mask=self._custom_mask,
            interpret=interpret, **rope_kw,
        )
        if return_lse:
            return out, lse
        return out

    def run_return_lse(self, *args, **kwargs):
        return self.run(*args, return_lse=True, **kwargs)

    forward = run

    def end_forward(self) -> None:
        pass


def _alibi_slopes(num_heads: int) -> jax.Array:
    """Standard ALiBi slopes (reference test_helpers/alibi_reference.py
    semantics): slope_h = 2^(-8 * (h+1) / num_heads)."""
    h = jnp.arange(1, num_heads + 1, dtype=jnp.float32)
    return 2.0 ** (-8.0 * h / num_heads)


def _build_plan_mask(plan, qo_indptr, kv_lens, custom_mask, packed_custom_mask):
    """Normalize the reference's two custom-mask forms into the kernel's
    padded mask (prefill.py custom_mask/packed_custom_mask contract:
    flattened concat of per-request [q_len × kv_len] bools; packed =
    little-endian bit-packed, quantization/packbits.py)."""
    if custom_mask is None and packed_custom_mask is None:
        return None
    from .pallas_prefill import build_padded_custom_mask

    if packed_custom_mask is not None:
        total = int(np.sum((qo_indptr[1:] - qo_indptr[:-1]) * kv_lens))
        bits = np.unpackbits(
            np.asarray(packed_custom_mask, np.uint8), bitorder="little"
        )[:total]
        flat = bits.astype(np.float32)
    else:
        flat = np.asarray(custom_mask).reshape(-1).astype(np.float32)
    return build_padded_custom_mask(plan, qo_indptr, kv_lens, flat)


def single_prefill_with_kv_cache(
    q: jax.Array,  # [qo_len, H_q, D]
    k: jax.Array,  # [kv_len, H_kv, D]
    v: jax.Array,
    custom_mask: Any = None,
    packed_custom_mask: Any = None,
    causal: bool = False,
    kv_layout: str = "NHD",
    pos_encoding_mode: str = "NONE",
    use_fp16_qk_reduction: bool = False,
    sm_scale: float | None = None,
    window_left: int = -1,
    logits_soft_cap: float | None = None,
    rope_scale: float | None = None,
    rope_theta: float | None = None,
    return_lse: bool = False,
    backend: str = "auto",
    interpret: bool | None = None,
):
    """Single-request prefill attention (reference prefill.py:1174)."""
    del use_fp16_qk_reduction, rope_scale, rope_theta, backend
    layout = check_kv_layout(kv_layout)
    if layout == KVLayout.HND:
        k = jnp.swapaxes(k, 0, 1)
        v = jnp.swapaxes(v, 0, 1)
    qo_len = q.shape[0]
    kv_len = k.shape[0]
    num_qo_heads, num_kv_heads = q.shape[1], k.shape[1]
    plan = build_prefill_plan(
        np.asarray([0, qo_len]), np.asarray([kv_len]),
        num_qo_heads, num_kv_heads, causal=causal,
        kv_row_starts=np.asarray([0]),
    )
    alibi = _alibi_slopes(num_qo_heads) if pos_encoding_mode == "ALIBI" else None
    if pos_encoding_mode not in ("NONE", "ALIBI"):
        raise NotImplementedError("apply rope ops before attention")
    mask = _build_plan_mask(
        plan, np.asarray([0, qo_len]), np.asarray([kv_len]),
        custom_mask, packed_custom_mask,
    )
    out, lse = run_prefill(
        q, k, v, plan,
        sm_scale=sm_scale, causal=causal,
        logits_soft_cap=float(logits_soft_cap or 0.0), window_left=window_left,
        alibi_slopes=alibi, custom_mask=mask, interpret=interpret,
    )
    if return_lse:
        return out, lse
    return out
