"""Holistic mixed prefill+decode attention (one kernel for the whole batch)
and attention-sink wrappers.

Capability parity with reference flashinfer/attention/_core.py
(`BatchAttention` :44 — fuses paged-prefill and paged-decode requests into
ONE kernel launch via the two-bin `TwoStageHolisticPlan`
scheduler.cuh:1241 + persistent work-stealing kernels persistent.cuh;
`BatchAttentionWithAttentionSinkWrapper` :330) and the POD-attention
wrappers (flashinfer/pod.py:61,732 — colocated prefill+decode CTAs,
arXiv 2410.18038).

TPU re-design (SURVEY §7): the flat-item prefill plan ALREADY schedules
arbitrary mixes of qo_len=1 (decode) and qo_len>1 (prefill) requests into
one planned tile list, so the persistent work-stealing machinery collapses
to a single `build_prefill_plan` + one Pallas launch — the planned tile
table IS the work queue, with Pallas's sequential grid playing the role
of the persistent CTAs.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import KVLayout, check_kv_layout, kv_cache_dims, unpack_paged_kv_cache
from .pallas_prefill import build_prefill_plan, run_prefill
from .prefill import BatchPrefillWithPagedKVCacheWrapper


class BatchAttention:
    """One-kernel mixed prefill+decode paged attention
    (reference flashinfer/attention/_core.py:44)."""

    def __init__(self, kv_layout: str = "NHD", device: Any = None,
                 backend: str = "auto") -> None:
        del device, backend
        self._kv_layout = check_kv_layout(kv_layout)
        self._plan = None
        self._params: dict[str, Any] = {}

    def plan(
        self,
        qo_indptr: Any,  # [B+1]
        kv_indptr: Any,  # [B+1] page offsets
        kv_indices: Any,  # [nnz_pages]
        kv_len_arr: Any,  # [B] token lengths
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim_qk: int,
        head_dim_vo: int,
        page_size: int,
        causal: bool = False,
        sm_scale: float | None = None,
        logits_soft_cap: float | None = None,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = jnp.bfloat16,
        use_profiler: bool = False,
    ) -> None:
        del head_dim_vo, q_data_type, kv_data_type, use_profiler
        qo_h = np.asarray(qo_indptr, np.int64)
        indptr_h = np.asarray(kv_indptr, np.int64)
        indices_h = np.asarray(kv_indices, np.int64)
        kv_lens = np.asarray(kv_len_arr, np.int64)
        batch = len(qo_h) - 1
        page_table = [
            indices_h[indptr_h[b]:indptr_h[b + 1]] for b in range(batch)
        ]
        self._plan = build_prefill_plan(
            qo_h, kv_lens, num_qo_heads, num_kv_heads,
            causal=causal, page_table=page_table, page_size=page_size,
        )
        self._params = dict(
            page_size=page_size, causal=bool(causal),
            sm_scale=(float(sm_scale) if sm_scale is not None
                      else 1.0 / math.sqrt(head_dim_qk)),
            logits_soft_cap=float(logits_soft_cap or 0.0),
        )

    def run(
        self,
        q: jax.Array,  # [total_q, H_q, D]
        kv_cache: Any,
        out: Any = None,
        lse: Any = None,
        *,
        k_scale: float | None = None,
        v_scale: float | None = None,
        logits_soft_cap: float = 0.0,
        profiler_buffer: Any = None,
        interpret: bool | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (out, lse) — the reference always returns both
        (_core.py run)."""
        if self._plan is None:
            raise RuntimeError("call plan() before run()")
        del out, lse, profiler_buffer
        p = self._params
        k_cache, v_cache = unpack_paged_kv_cache(kv_cache, self._kv_layout)
        if self._kv_layout == KVLayout.HND:
            k_cache = jnp.swapaxes(k_cache, 1, 2)
            v_cache = jnp.swapaxes(v_cache, 1, 2)
        num_pages, page_size, h_kv, d = kv_cache_dims(k_cache, KVLayout.NHD)
        if page_size != p["page_size"]:
            raise ValueError(
                f"cache page_size {page_size} != planned {p['page_size']}"
            )
        k_rows = k_cache.reshape(num_pages * page_size, h_kv, d)
        v_rows = v_cache.reshape(num_pages * page_size, h_kv, d)
        return run_prefill(
            q, k_rows, v_rows, self._plan,
            sm_scale=p["sm_scale"], causal=p["causal"],
            logits_soft_cap=logits_soft_cap or p["logits_soft_cap"],
            k_scale=float(k_scale or 1.0), v_scale=float(v_scale or 1.0),
            interpret=interpret,
        )


class BatchAttentionWithAttentionSinkWrapper(BatchPrefillWithPagedKVCacheWrapper):
    """Prefill/decode paged attention with StreamingLLM attention sinks
    (reference attention/_core.py:330): per-head sink logits join the
    softmax denominator. Pass ``sinks=[num_qo_heads] f32`` to run()."""

    def __init__(
        self,
        float_workspace_buffer: Any = None,
        kv_layout: str = "NHD",
        use_cuda_graph: bool = False,
        backend: str = "auto",
        pos_encoding_mode: str = "NONE",
        use_fp16_qk_reduction: bool = False,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = jnp.bfloat16,
        head_dim_qk: int = 128,
        head_dim_vo: int = 128,
        window_left: int = -1,
        **_buffers,
    ) -> None:
        super().__init__(
            float_workspace_buffer=float_workspace_buffer,
            kv_layout=kv_layout, use_cuda_graph=use_cuda_graph,
        )
        self._default_window_left = window_left


# -- POD attention (reference pod.py): on TPU the holistic plan already
# colocates prefill and decode work in one launch, so POD == BatchAttention
# with the (prefill, decode) requests concatenated.


class PODWithPagedKVCacheWrapper(BatchAttention):
    """Prefill-On-Decode wrapper (reference flashinfer/pod.py:61). The
    single prefill request and the decode batch are planned as one holistic
    launch — the TPU equivalent of colocated prefill/decode CTAs."""

    def __init__(self, float_workspace_buffer: Any = None,
                 kv_layout: str = "NHD", **kw) -> None:
        del float_workspace_buffer, kw
        super().__init__(kv_layout=kv_layout)


class BatchPODWithPagedKVCacheWrapper(BatchAttention):
    """Batch POD (reference flashinfer/pod.py:732)."""

    def __init__(self, float_workspace_buffer: Any = None,
                 kv_layout: str = "NHD", **kw) -> None:
        del float_workspace_buffer, kw
        super().__init__(kv_layout=kv_layout)
