"""Decode attention public API: plan/run wrappers over the Pallas kernel.

Capability parity with reference flashinfer/decode.py
(`single_decode_with_kv_cache` decode.py:514,
`BatchDecodeWithPagedKVCacheWrapper` decode.py:710 with plan decode.py:1376 /
run decode.py:1810, `CUDAGraphBatchDecodeWithPagedKVCacheWrapper`
decode.py:2274). TPU re-design of the plan/run split (SURVEY §2.9):

* plan() runs host-side (numpy) and converts the CSR page view
  (kv_indptr / kv_indices / kv_last_page_len) into a **static-shaped** dense
  page table [batch, max_pages_bucket] — the bucketed padding is the XLA
  analog of the reference's CUDA-graph fixed-shape contract
  (decode.py:1437-1466): shapes only change across power-of-two buckets, so
  run() never retraces between steps.
* run() is a pure jitted device call reusable across all layers.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import (
    KVLayout,
    bucket_size,
    cdiv,
    check_kv_layout,
    kv_cache_dims,
    unpack_paged_kv_cache,
)
from ...api_logging import flashinfer_api
from ...trace import DECODE_TRACE
from .pallas_decode import paged_decode_attention


def recommended_page_size(max_kv_len: int) -> int:
    """Plan-time page-size advisory for serving allocators (VERDICT r4 #7).

    Measured on v5e (b64, bf16 KV, 8 kv heads, d128, same-process A/B):
    at kv1024 ps16 beats ps32 (777.6 vs 671.6 GB/s — more pages per
    request keeps more DMAs in flight at short contexts), but at kv2048
    the ordering FLIPS (ps16 591-660 vs ps32 705 GB/s: per-page DMA
    issue overhead dominates once the stream is already deep). The
    serving default is therefore kv-length-dependent, decided when the
    cache is allocated — the analog of the reference's plan-time split
    sizing (include/flashinfer/attention/scheduler.cuh:426-525), applied
    to the layout knob TPU actually exposes.
    """
    return 16 if max_kv_len <= 1024 else 32


def build_dense_page_table(
    kv_indptr: np.ndarray,
    kv_indices: np.ndarray,
    max_pages: int | None = None,
    bucket: bool = True,
) -> np.ndarray:
    """CSR page list → dense padded [batch, max_pages] table (host side).

    Padding entries are 0 (a valid pool page); the kernel masks them by
    kv_len, so their contents never affect the output.
    """
    kv_indptr = np.asarray(kv_indptr, dtype=np.int32)
    kv_indices = np.asarray(kv_indices, dtype=np.int32)
    batch = len(kv_indptr) - 1
    pages_per_req = kv_indptr[1:] - kv_indptr[:-1]
    needed = int(pages_per_req.max()) if batch > 0 else 1
    if max_pages is None:
        max_pages = bucket_size(needed) if bucket else max(needed, 1)
    elif needed > max_pages:
        raise ValueError(
            f"request needs {needed} pages > frozen max_pages {max_pages}"
        )
    from ...native import get_lib

    lib = get_lib()
    table = np.zeros((batch, max_pages), dtype=np.int32)
    if lib is not None and batch > 0:
        import ctypes

        i32p = ctypes.POINTER(ctypes.c_int32)
        rc = lib.fi_build_dense_page_table(
            np.ascontiguousarray(kv_indptr).ctypes.data_as(i32p),
            np.ascontiguousarray(kv_indices).ctypes.data_as(i32p),
            batch, max_pages, table.ctypes.data_as(i32p),
        )
        if rc == 0:
            return table
    for i in range(batch):
        n = int(pages_per_req[i])
        table[i, :n] = kv_indices[kv_indptr[i] : kv_indptr[i] + n]
    return table


class BatchDecodeWithPagedKVCacheWrapper:
    """Batched paged-KV decode attention with the plan/run protocol.

    Example::

        wrapper = BatchDecodeWithPagedKVCacheWrapper(kv_layout="NHD")
        wrapper.plan(kv_indptr, kv_indices, kv_last_page_len,
                     num_qo_heads, num_kv_heads, head_dim, page_size)
        for layer in range(num_layers):
            o = wrapper.run(q[layer], kv_cache[layer])
    """

    def __init__(
        self,
        float_workspace_buffer: Any = None,  # unused on TPU (XLA owns scratch)
        kv_layout: str = "NHD",
        use_cuda_graph: bool = False,  # analog: freeze shapes at first plan
        use_tensor_cores: bool = False,  # TPU: MXU always used where profitable
        paged_kv_indptr_buffer: Any = None,
        paged_kv_indices_buffer: Any = None,
        paged_kv_last_page_len_buffer: Any = None,
        backend: str = "auto",
        jit_args: Any = None,
    ) -> None:
        del float_workspace_buffer, use_tensor_cores, backend
        del paged_kv_indptr_buffer, paged_kv_indices_buffer
        del paged_kv_last_page_len_buffer
        from .prefill import _as_variant

        self._variant = _as_variant(jit_args)
        self._kv_layout = check_kv_layout(kv_layout)
        self._fixed_shapes = bool(use_cuda_graph)
        self._frozen_batch: int | None = None
        self._frozen_max_pages: int | None = None
        self._plan_params: dict[str, Any] | None = None
        self._page_table: jax.Array | None = None
        self._kv_lens: jax.Array | None = None

    @property
    def is_cuda_graph_enabled(self) -> bool:  # API-parity alias
        return self._fixed_shapes

    def plan(
        self,
        indptr: Any,
        indices: Any,
        last_page_len: Any,
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim: int,
        page_size: int,
        pos_encoding_mode: str = "NONE",
        window_left: int = -1,
        logits_soft_cap: float | None = None,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = None,
        sm_scale: float | None = None,
        rope_scale: float | None = None,
        rope_theta: float | None = None,
        non_blocking: bool = True,
    ) -> None:
        """Host-side scheduling: build static-shaped plan arrays.

        Matches reference plan() argument surface (decode.py:1239). With
        pos_encoding_mode="ROPE_LLAMA" the cache holds PRE-ROPE keys:
        run() rotates q host-side (one tiny row per request) and the
        kernel rotates K chunks on the fly — no roped cache copy ever
        materializes (reference pos_enc.cuh:294 fused rotary).
        """
        del non_blocking
        if pos_encoding_mode not in ("NONE", "ROPE_LLAMA", "ALIBI"):
            raise ValueError(f"bad pos_encoding_mode {pos_encoding_mode}")
        indptr_h = np.asarray(indptr, dtype=np.int32)
        indices_h = np.asarray(indices, dtype=np.int32)
        last_h = np.asarray(last_page_len, dtype=np.int32)
        batch = len(indptr_h) - 1

        if self._fixed_shapes:
            if self._frozen_batch is None:
                self._frozen_batch = batch
            elif batch != self._frozen_batch:
                raise ValueError(
                    f"fixed-shape wrapper planned with batch {batch} != "
                    f"frozen {self._frozen_batch}"
                )

        table = build_dense_page_table(
            indptr_h, indices_h, max_pages=self._frozen_max_pages
        )
        if self._fixed_shapes and self._frozen_max_pages is None:
            self._frozen_max_pages = table.shape[1]

        pages_per_req = indptr_h[1:] - indptr_h[:-1]
        kv_lens = np.where(
            pages_per_req == 0,
            0,
            np.maximum(pages_per_req - 1, 0) * page_size + last_h,
        ).astype(np.int32)

        self._page_table = jnp.asarray(table)
        self._kv_lens = jnp.asarray(kv_lens)
        self._plan_params = dict(
            num_qo_heads=num_qo_heads,
            num_kv_heads=num_kv_heads,
            head_dim=head_dim,
            page_size=page_size,
            pos_encoding_mode=pos_encoding_mode,
            window_left=window_left,
            logits_soft_cap=float(logits_soft_cap or 0.0),
            sm_scale=(
                float(sm_scale) if sm_scale is not None else 1.0 / math.sqrt(head_dim)
            ),
            rope_theta=float(rope_theta or 1e4),
            rope_scale=float(rope_scale or 1.0),
            q_data_type=q_data_type,
            kv_data_type=kv_data_type,
        )

    begin_forward = plan  # legacy alias (reference keeps both)

    @flashinfer_api(trace=DECODE_TRACE, method=True)
    def run(
        self,
        q: jax.Array,  # [batch, num_qo_heads, head_dim]
        paged_kv_cache: Any,
        *,
        q_scale: float | None = None,
        k_scale: float | None = None,
        v_scale: float | None = None,
        return_lse: bool = False,
        sinks: jax.Array | None = None,  # [H_q] attention-sink logits
        enable_pdl: bool | None = None,  # CUDA-ism; accepted and ignored
        interpret: bool | None = None,
    ):
        if self._plan_params is None:
            raise RuntimeError("call plan() before run()")
        del enable_pdl
        p = self._plan_params
        use_rope = p["pos_encoding_mode"] == "ROPE_LLAMA"
        if use_rope:
            from ..rope import apply_rope_pos_ids

            q, _ = apply_rope_pos_ids(
                q, q, jnp.maximum(self._kv_lens - 1, 0),
                rope_scale=p["rope_scale"], rope_theta=p["rope_theta"])
        rope_kw = dict(
            rope_theta=p["rope_theta"] if use_rope else 0.0,
            rope_scale=p["rope_scale"],
        )
        # 5-D NHD combined cache rides the single-DMA-per-page fast path
        # (k+v of a page in one descriptor — half the DMA issue rate)
        from ...env import resolve_interpret

        if (
            not isinstance(paged_kv_cache, (tuple, list))
            and getattr(paged_kv_cache, "ndim", 0) == 5
            and self._kv_layout == KVLayout.NHD
            and not resolve_interpret(interpret)  # interpreter → blockspec
        ):
            from .pallas_decode import paged_decode_attention_combined

            sm_scale = p["sm_scale"]
            if q_scale is not None:
                sm_scale = sm_scale * q_scale
            if paged_kv_cache.shape[2] != p["page_size"]:
                raise ValueError(
                    f"cache page_size {paged_kv_cache.shape[2]} != planned "
                    f"{p['page_size']}"
                )
            out, lse = paged_decode_attention_combined(
                q, paged_kv_cache, self._page_table, self._kv_lens,
                sm_scale=sm_scale, logits_soft_cap=p["logits_soft_cap"],
                window_left=p["window_left"],
                k_scale=float(k_scale) if k_scale is not None else 1.0,
                v_scale=float(v_scale) if v_scale is not None else 1.0,
                sinks=sinks, variant=self._variant, interpret=interpret,
                **rope_kw,
            )
            if return_lse:
                return out, lse
            return out
        k_cache, v_cache = unpack_paged_kv_cache(paged_kv_cache, self._kv_layout)
        if self._kv_layout == KVLayout.HND:
            k_cache = jnp.swapaxes(k_cache, 1, 2)
            v_cache = jnp.swapaxes(v_cache, 1, 2)
        _, page_size, _, _ = kv_cache_dims(k_cache, KVLayout.NHD)
        if page_size != p["page_size"]:
            raise ValueError(
                f"cache page_size {page_size} != planned {p['page_size']}"
            )
        sm_scale = p["sm_scale"]
        if q_scale is not None:
            sm_scale = sm_scale * q_scale
        out, lse = paged_decode_attention(
            q,
            k_cache,
            v_cache,
            self._page_table,
            self._kv_lens,
            sm_scale=sm_scale,
            logits_soft_cap=p["logits_soft_cap"],
            window_left=p["window_left"],
            k_scale=float(k_scale) if k_scale is not None else 1.0,
            v_scale=float(v_scale) if v_scale is not None else 1.0,
            sinks=sinks,
            variant=self._variant,
            interpret=interpret,
            **rope_kw,
        )
        if return_lse:
            return out, lse
        return out

    def run_return_lse(self, *args, **kwargs):
        return self.run(*args, return_lse=True, **kwargs)

    forward = run  # legacy alias

    def end_forward(self) -> None:  # legacy no-op (reference keeps it)
        pass


class CUDAGraphBatchDecodeWithPagedKVCacheWrapper(
    BatchDecodeWithPagedKVCacheWrapper
):
    """Fixed-shape decode wrapper (reference decode.py:2274).

    On TPU the CUDA-graph contract maps to frozen plan shapes so jitted
    run() never retraces; provided for drop-in API parity.
    """

    def __init__(
        self,
        workspace_buffer: Any = None,
        indptr_buffer: Any = None,
        indices_buffer: Any = None,
        last_page_len_buffer: Any = None,
        kv_layout: str = "NHD",
        use_tensor_cores: bool = False,
    ) -> None:
        super().__init__(
            float_workspace_buffer=workspace_buffer,
            kv_layout=kv_layout,
            use_cuda_graph=True,
            use_tensor_cores=use_tensor_cores,
        )
        if indices_buffer is not None:
            # buffer capacity bounds the page-table width, like the reference
            self._frozen_max_pages = bucket_size(
                max(1, int(np.asarray(indices_buffer).shape[0]))
            )


def single_decode_with_kv_cache(
    q: jax.Array,  # [num_qo_heads, head_dim]
    k: jax.Array,  # [kv_len, num_kv_heads, head_dim] (NHD)
    v: jax.Array,
    kv_layout: str = "NHD",
    pos_encoding_mode: str = "NONE",
    use_tensor_cores: bool = False,
    q_scale: float | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    window_left: int = -1,
    logits_soft_cap: float | None = None,
    sm_scale: float | None = None,
    rope_scale: float | None = None,
    rope_theta: float | None = None,
    return_lse: bool = False,
    interpret: bool | None = None,
):
    """Single-request decode attention (reference decode.py:514).

    The contiguous KV is viewed as synthetic pages of up to 512 tokens and
    dispatched to the paged kernel — one code path, zero copies beyond the
    pad-to-page-multiple.
    """
    del use_tensor_cores
    use_rope = pos_encoding_mode == "ROPE_LLAMA"
    if pos_encoding_mode not in ("NONE", "ROPE_LLAMA"):
        raise NotImplementedError(
            f"pos_encoding_mode {pos_encoding_mode!r}: NONE and ROPE_LLAMA "
            "are supported (fused in-kernel rotary)"
        )
    layout = check_kv_layout(kv_layout)
    if layout == KVLayout.HND:
        k = jnp.swapaxes(k, 0, 1)
        v = jnp.swapaxes(v, 0, 1)
    kv_len, num_kv_heads, head_dim = k.shape
    num_qo_heads = q.shape[0]

    if use_rope:
        # q sits at position kv_len - 1; K rotates inside the kernel
        from ..rope import apply_rope_pos_ids

        q, _ = apply_rope_pos_ids(
            q[None], q[None], jnp.asarray([kv_len - 1], jnp.int32),
            rope_scale=float(rope_scale or 1.0),
            rope_theta=float(rope_theta or 1e4))
        q = q[0]
    page = min(512, bucket_size(kv_len, minimum=16))
    padded = cdiv(kv_len, page) * page
    if padded != kv_len:
        pad = [(0, padded - kv_len), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    num_pages = padded // page
    k_cache = k.reshape(num_pages, page, num_kv_heads, head_dim)
    v_cache = v.reshape(num_pages, page, num_kv_heads, head_dim)
    page_table = jnp.arange(num_pages, dtype=jnp.int32)[None, :]
    kv_lens = jnp.asarray([kv_len], dtype=jnp.int32)

    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    if q_scale is not None:
        sm_scale = sm_scale * q_scale
    out, lse = paged_decode_attention(
        q[None],
        k_cache,
        v_cache,
        page_table,
        kv_lens,
        rope_theta=float(rope_theta or 1e4) if use_rope else 0.0,
        rope_scale=float(rope_scale or 1.0),
        sm_scale=sm_scale,
        logits_soft_cap=float(logits_soft_cap or 0.0),
        window_left=window_left,
        k_scale=float(k_scale) if k_scale is not None else 1.0,
        v_scale=float(v_scale) if v_scale is not None else 1.0,
        interpret=interpret,
    )
    if return_lse:
        return out[0], lse[0]
    return out[0]
