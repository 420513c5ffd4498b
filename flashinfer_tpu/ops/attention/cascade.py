"""Multi-level cascade (shared-prefix) attention.

Capability parity with reference flashinfer/cascade.py:226
(`MultiLevelCascadeAttentionWrapper`, run cascade.py:522) and the legacy
`BatchDecodeWithSharedPrefixPagedKVCacheWrapper` /
`BatchPrefillWithSharedPrefixPagedKVCacheWrapper` pair.

Design (same as reference): level 0 holds pages shared by many requests
(e.g. a system prompt), deeper levels hold progressively less-shared pages,
the last level is per-request unique KV. run() computes attention per level
(non-causal for shared levels, causal at the unique level — causality only
matters where the query tokens themselves live) and folds the per-level
(v, lse) states with the associative LSE merge.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .merge import merge_state
from .prefill import BatchPrefillWithPagedKVCacheWrapper


class MultiLevelCascadeAttentionWrapper:
    """Attention with KV shared across requests at multiple levels
    (reference cascade.py:226)."""

    def __init__(
        self,
        num_levels: int,
        float_workspace_buffer: Any = None,
        kv_layout: str = "NHD",
        use_cuda_graph: bool = False,
    ) -> None:
        del float_workspace_buffer, use_cuda_graph
        self._num_levels = num_levels
        self._wrappers = [
            BatchPrefillWithPagedKVCacheWrapper(kv_layout=kv_layout)
            for _ in range(num_levels)
        ]

    def plan(
        self,
        qo_indptr_arr: Sequence[Any],  # per-level qo indptr
        paged_kv_indptr_arr: Sequence[Any],
        paged_kv_indices_arr: Sequence[Any],
        paged_kv_last_page_len_arr: Sequence[Any],
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim: int,
        page_size: int,
        causal: bool = True,
        pos_encoding_mode: str = "NONE",
        window_left: int = -1,
        logits_soft_cap: float | None = None,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = None,
        sm_scale: float | None = None,
    ) -> None:
        """Plan every level. The last level is causal (it contains the query
        tokens); shared-prefix levels are non-causal full attention over
        their pages (reference cascade semantics)."""
        if len(qo_indptr_arr) != self._num_levels:
            raise ValueError(
                f"expected {self._num_levels} qo_indptr arrays, "
                f"got {len(qo_indptr_arr)}"
            )
        for lvl, w in enumerate(self._wrappers):
            is_last = lvl == self._num_levels - 1
            w.plan(
                qo_indptr_arr[lvl],
                paged_kv_indptr_arr[lvl],
                paged_kv_indices_arr[lvl],
                paged_kv_last_page_len_arr[lvl],
                num_qo_heads,
                num_kv_heads,
                head_dim,
                page_size,
                causal=causal and is_last,
                pos_encoding_mode=pos_encoding_mode,
                window_left=window_left if is_last else -1,
                logits_soft_cap=logits_soft_cap,
                q_data_type=q_data_type,
                kv_data_type=kv_data_type,
                sm_scale=sm_scale,
            )

    begin_forward = plan

    def run(
        self,
        q: jax.Array,  # [total_q, H_q, D]
        paged_kv_cache: Any,
        *,
        k_scale: float | None = None,
        v_scale: float | None = None,
        return_lse: bool = False,
    ):
        """Bottom-up merge (reference cascade.py:522): last level first,
        then fold in upper (more-shared) levels."""
        out, lse = self._wrappers[-1].run(
            q, paged_kv_cache, k_scale=k_scale, v_scale=v_scale,
            return_lse=True,
        )
        for wrapper in reversed(self._wrappers[:-1]):
            out_l, lse_l = wrapper.run(
                q, paged_kv_cache, k_scale=k_scale, v_scale=v_scale,
                return_lse=True,
            )
            out, lse = merge_state(out_l, lse_l, out, lse)
        if return_lse:
            return out, lse
        return out

    forward = run

    def end_forward(self) -> None:
        pass


def batch_attention_with_shared_prefix_paged_kv_cache(
    q: jax.Array,
    qo_indptr: Any,
    shared_k: jax.Array,  # [shared_len, H_kv, D]
    shared_v: jax.Array,
    paged_kv_cache: Any,
    kv_indptr: Any,
    kv_indices: Any,
    kv_last_page_len: Any,
    page_size: int,
    causal: bool = True,
    kv_layout: str = "NHD",
) -> jax.Array:
    """Two-level shared-prefix helper (reference
    Batch{Decode,Prefill}WithSharedPrefixPagedKVCacheWrapper semantics):
    full attention over the shared prefix + causal attention over unique
    KV, merged."""
    from .pallas_prefill import build_prefill_plan, run_prefill
    from .prefill import BatchPrefillWithPagedKVCacheWrapper

    qo_h = np.asarray(qo_indptr, np.int64)
    batch = len(qo_h) - 1
    num_qo_heads = q.shape[1]
    num_kv_heads = shared_k.shape[1]
    shared_len = shared_k.shape[0]

    # level 0: every request attends the same contiguous shared prefix
    plan0 = build_prefill_plan(
        qo_h, np.full(batch, shared_len), num_qo_heads, num_kv_heads,
        causal=False, kv_row_starts=np.zeros(batch, np.int64),
    )
    v0, s0 = run_prefill(q, shared_k, shared_v, plan0, causal=False)

    # level 1: unique per-request paged KV, causal
    w = BatchPrefillWithPagedKVCacheWrapper(kv_layout=kv_layout)
    w.plan(
        qo_h, kv_indptr, kv_indices, kv_last_page_len,
        num_qo_heads, num_kv_heads, q.shape[2], page_size, causal=causal,
    )
    v1, s1 = w.run(q, paged_kv_cache, return_lse=True)
    out, _ = merge_state(v0, s0, v1, s1)
    return out


class BatchDecodeWithSharedPrefixPagedKVCacheWrapper:
    """Shared-prefix batch decode (reference cascade.py:561): attention
    over a common prefix (contiguous K/V) merged with per-request unique
    paged KV via the LSE algebra. Superseded by
    MultiLevelCascadeAttentionWrapper in the reference; kept for parity."""

    def __init__(self, float_workspace_buffer=None, kv_layout: str = "NHD"):
        from .decode import BatchDecodeWithPagedKVCacheWrapper

        self._batch_decode = BatchDecodeWithPagedKVCacheWrapper(
            float_workspace_buffer, kv_layout)
        self._kv_layout = kv_layout

    def plan(self, *args, **kwargs):
        return self._batch_decode.plan(*args, **kwargs)

    begin_forward = plan

    def forward(self, q, k_shared, v_shared, unique_kv_cache, **kw):
        import jax.numpy as jnp

        from ...utils import merge_attention_states
        from .decode import single_decode_with_kv_cache

        o_unique, lse_unique = self._batch_decode.run(
            q, unique_kv_cache, return_lse=True)
        # shared prefix: same K/V for every request → batch as one prefill
        # row per request over the shared rows
        if self._kv_layout == "HND":
            k_shared = jnp.swapaxes(k_shared, 0, 1)
            v_shared = jnp.swapaxes(v_shared, 0, 1)
        outs = []
        lses = []
        from .pallas_decode import paged_decode_attention
        import numpy as np

        s_len = k_shared.shape[0]
        page = min(512, max(16, 1 << (s_len - 1).bit_length()))
        pad = (-s_len) % page
        kp = jnp.pad(k_shared, ((0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(v_shared, ((0, pad), (0, 0), (0, 0)))
        np_ = (s_len + pad) // page
        kc = kp.reshape(np_, page, *k_shared.shape[1:])
        vc = vp.reshape(np_, page, *v_shared.shape[1:])
        batch = q.shape[0]
        table = jnp.broadcast_to(
            jnp.arange(np_, dtype=jnp.int32)[None], (batch, np_))
        lens = jnp.full((batch,), s_len, jnp.int32)
        o_shared, lse_shared = paged_decode_attention(q, kc, vc, table, lens)
        o, _ = merge_attention_states(
            o_shared, lse_shared, o_unique, lse_unique)
        return o.astype(q.dtype)

    run = forward

    def end_forward(self):
        pass


class BatchPrefillWithSharedPrefixPagedKVCacheWrapper:
    """Shared-prefix batch prefill (reference cascade.py ~1006)."""

    def __init__(self, float_workspace_buffer=None, kv_layout: str = "NHD"):
        from .prefill import BatchPrefillWithPagedKVCacheWrapper

        self._batch_prefill = BatchPrefillWithPagedKVCacheWrapper(
            float_workspace_buffer, kv_layout)
        self._kv_layout = kv_layout
        self._qo_indptr = None

    def plan(self, qo_indptr, *args, **kwargs):
        import numpy as np

        self._qo_indptr = np.asarray(qo_indptr, np.int64)
        return self._batch_prefill.plan(qo_indptr, *args, **kwargs)

    begin_forward = plan

    def forward(self, q, k_shared, v_shared, unique_kv_cache,
                causal: bool = False, **kw):
        import jax.numpy as jnp
        import numpy as np

        from ...utils import merge_attention_states
        from .pallas_prefill import build_prefill_plan, run_prefill

        if self._kv_layout == "HND":
            k_shared = jnp.swapaxes(k_shared, 0, 1)
            v_shared = jnp.swapaxes(v_shared, 0, 1)
        o_unique, lse_unique = self._batch_prefill.run(
            q, unique_kv_cache, return_lse=True)
        # shared level: every request attends the full shared prefix
        # (non-causal by definition — queries come after the prefix)
        s_len = k_shared.shape[0]
        hq = q.shape[1]
        hkv = k_shared.shape[1]
        qo = self._qo_indptr
        kv_lens = np.full(len(qo) - 1, s_len, np.int64)
        plan = build_prefill_plan(
            qo, kv_lens, hq, hkv, causal=False,
            kv_row_starts=np.zeros(len(qo) - 1, np.int64))
        o_shared, lse_shared = run_prefill(
            q, k_shared, v_shared, plan, causal=False)
        o, _ = merge_attention_states(
            o_shared, lse_shared, o_unique, lse_unique)
        return o.astype(q.dtype)

    run = forward

    def end_forward(self):
        pass
