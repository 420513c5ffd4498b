"""Block-sparse attention (BSR mask) wrappers.

Capability parity with reference flashinfer/sparse.py
(`BlockSparseAttentionWrapper` sparse.py:195,
`VariableBlockSparseAttentionWrapper` sparse.py:1075). The reference
reuses the prefill kernels by treating sparse column blocks as KV pages
(SURVEY §2.1); the TPU build does exactly the same: each BSR row block
becomes one "request" of the flat-item Pallas prefill plan whose page
table is its column-block list (page_size = C).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import cdiv
from .pallas_prefill import build_prefill_plan, run_prefill


class BlockSparseAttentionWrapper:
    """BSR-mask attention, any (R, C) block size (reference sparse.py:195).

    plan(indptr, indices, M, N, R, C, ...) declares the block-sparse
    pattern; run(q [M, Hq, D], k/v [N, Hkv, D]) computes attention where
    q row-block i attends exactly the column blocks
    ``indices[indptr[i]:indptr[i+1]]``.
    """

    def __init__(self, float_workspace_buffer: Any = None,
                 backend: str = "auto") -> None:
        del float_workspace_buffer, backend
        self._plan = None
        self._params: dict[str, Any] = {}

    def plan(
        self,
        indptr: Any,  # [MB + 1]
        indices: Any,  # [nnz]
        M: int,
        N: int,
        R: int,
        C: int,
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim: int,
        mask: Any = None,
        packed_mask: Any = None,
        causal: bool = False,
        pos_encoding_mode: str = "NONE",
        use_fp16_qk_reduction: bool = False,
        logits_soft_cap: float | None = None,
        sm_scale: float | None = None,
        rope_scale: float | None = None,
        rope_theta: float | None = None,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = None,
        o_data_type: Any = None,
        non_blocking: bool = True,
        block_mask: Any = None,
    ) -> None:
        if N % C:
            raise ValueError("N must be divisible by C")
        indptr_h = np.asarray(indptr, np.int64)
        indices_h = np.asarray(indices, np.int64)
        mb = len(indptr_h) - 1
        if mb != cdiv(M, R):
            raise ValueError(f"indptr rows {mb} != ceil(M/R) {cdiv(M, R)}")

        qo_indptr = np.minimum(np.arange(mb + 1, dtype=np.int64) * R, M)
        blocks_per_row = indptr_h[1:] - indptr_h[:-1]
        kv_lens = blocks_per_row * C
        page_table = [
            indices_h[indptr_h[i]:indptr_h[i + 1]].astype(np.int64)
            for i in range(mb)
        ]
        self._plan = build_prefill_plan(
            qo_indptr, kv_lens, num_qo_heads, num_kv_heads,
            causal=False, page_table=page_table, page_size=C,
        )
        # causal BSR and per-element inner-block masks (reference
        # sparse.py:195,333): the column blocks are scattered, so causal
        # needs each gathered column's ABSOLUTE position — built host-side
        # at plan time into the padded custom-mask layout the kernel
        # consumes (same mechanism as packed custom masks).
        self._mask = None
        if causal or mask is not None or packed_mask is not None:
            elem = None
            if packed_mask is not None:
                bits = np.unpackbits(
                    np.asarray(packed_mask, np.uint8))[: len(indices_h) * R * C]
                elem = bits.reshape(len(indices_h), R, C).astype(bool)
            elif mask is not None:
                elem = np.asarray(mask, bool).reshape(-1, R, C)
            pm = np.zeros(
                (self._plan.tq_pad, self._plan.tkv_pad), np.float32)
            diag = N - M
            for i in range(mb):
                qs = int(self._plan.q_pad_starts[i])
                ks = int(self._plan.kv_pad_starts[i])
                ql = int(qo_indptr[i + 1] - qo_indptr[i])
                blocks = indices_h[indptr_h[i]:indptr_h[i + 1]]
                if ql == 0 or len(blocks) == 0:
                    continue
                kv_abs = (blocks[:, None] * C
                          + np.arange(C)[None, :]).reshape(-1)
                q_abs = int(qo_indptr[i]) + np.arange(ql)
                m = np.ones((ql, len(kv_abs)), bool)
                if causal:
                    m &= kv_abs[None, :] <= q_abs[:, None] + diag
                if elem is not None:
                    eb = elem[indptr_h[i]:indptr_h[i + 1]]  # [nb, R, C]
                    eb = np.swapaxes(eb, 0, 1).reshape(R, -1)[:ql]
                    m &= eb
                pm[qs:qs + ql, ks:ks + len(kv_abs)] = m
            self._mask = jnp.asarray(pm)
        self._params = dict(
            M=M, N=N, R=R, C=C,
            num_qo_heads=num_qo_heads, num_kv_heads=num_kv_heads,
            head_dim=head_dim,
            logits_soft_cap=float(logits_soft_cap or 0.0),
            sm_scale=(float(sm_scale) if sm_scale is not None
                      else 1.0 / math.sqrt(head_dim)),
        )

    begin_forward = plan

    def run(
        self,
        q: jax.Array,  # [M, num_qo_heads, head_dim]
        k: jax.Array,  # [N, num_kv_heads, head_dim]
        v: jax.Array,
        *,
        return_lse: bool = False,
        interpret: bool | None = None,
        **_ignored,
    ):
        if self._plan is None:
            raise RuntimeError("call plan() before run()")
        p = self._params
        out, lse = run_prefill(
            q, k, v, self._plan,
            sm_scale=p["sm_scale"], causal=False,
            logits_soft_cap=p["logits_soft_cap"],
            custom_mask=self._mask, interpret=interpret,
        )
        if return_lse:
            return out, lse
        return out

    forward = run

    def end_forward(self) -> None:
        pass


class VariableBlockSparseAttentionWrapper:
    """Variable (R_i, C_j) block-sparse attention with per-head patterns
    (reference sparse.py:1075 — VSA-style video sparse attention).

    plan(block_mask_map [H, MB, NB], block_row_sz [H, MB],
    block_col_sz [H, NB], ...); run(q [Hq? ...]) — v1 computes per
    kv-head with a dense row/col-expanded mask (XLA fuses the expansion
    into the attention einsum); kernel-tiled variant is a perf follow-up.
    """

    def __init__(self, float_workspace_buffer: Any = None,
                 backend: str = "auto") -> None:
        del float_workspace_buffer, backend
        self._state: dict[str, Any] | None = None

    def plan(
        self,
        block_mask_map: Any,  # [H, MB, NB] bool
        block_row_sz: Any,  # [H, MB] i32
        block_col_sz: Any,  # [H, NB] i32
        num_qo_heads: int,
        num_kv_heads: int,
        head_dim: int,
        causal: bool = False,
        pos_encoding_mode: str = "NONE",
        use_fp16_qk_reduction: bool = False,
        logits_soft_cap: float | None = None,
        sm_scale: float | None = None,
        q_data_type: Any = jnp.bfloat16,
        kv_data_type: Any = None,
        **_ignored,
    ) -> None:
        bm = np.asarray(block_mask_map, bool)
        rs = np.asarray(block_row_sz, np.int64)
        cs = np.asarray(block_col_sz, np.int64)
        if bm.ndim != 3:
            raise ValueError("block_mask_map must be [num_kv_heads, MB, NB]")
        # expand per-head block masks to dense element masks (host side,
        # one-time plan cost — the run stays fully jitted/static)
        masks = []
        for h in range(bm.shape[0]):
            row_ids = np.repeat(np.arange(bm.shape[1]), rs[h])
            col_ids = np.repeat(np.arange(bm.shape[2]), cs[h])
            masks.append(bm[h][np.ix_(row_ids, col_ids)])
        dense = np.stack(masks)  # [H, M, N]
        if causal:
            m, n = dense.shape[1], dense.shape[2]
            tri = np.tril(np.ones((m, n), bool), k=n - m)
            dense &= tri
        self._state = dict(
            mask=jnp.asarray(dense),
            num_qo_heads=num_qo_heads, num_kv_heads=num_kv_heads,
            sm_scale=(float(sm_scale) if sm_scale is not None
                      else 1.0 / math.sqrt(head_dim)),
            logits_soft_cap=float(logits_soft_cap or 0.0),
        )

    def run(
        self,
        q: jax.Array,  # [M, num_qo_heads, head_dim]
        k: jax.Array,  # [N, num_kv_heads, head_dim]
        v: jax.Array,
        *,
        return_lse: bool = False,
        **_ignored,
    ):
        if self._state is None:
            raise RuntimeError("call plan() before run()")
        st = self._state
        hq, hkv = st["num_qo_heads"], st["num_kv_heads"]
        g = hq // hkv
        qf = q.astype(jnp.float32) * st["sm_scale"]  # [M, Hq, D]
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        qf = qf.reshape(q.shape[0], hkv, g, q.shape[2])
        s = jnp.einsum("mhgd,nhd->hgmn", qf, kf)
        if st["logits_soft_cap"] > 0:
            c = st["logits_soft_cap"]
            s = c * jnp.tanh(s / c)
        mask = st["mask"][:, None]  # [Hkv, 1, M, N]
        s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        p = jnp.exp(s - m_safe)
        p = jnp.where(mask, p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("hgmn,nhd->mhgd", p / jnp.where(l == 0, 1, l), vf)
        o = o.reshape(q.shape).astype(q.dtype)
        if return_lse:
            lse = (m_safe + jnp.log(jnp.where(l == 0, 1, l)))[..., 0]
            lse = jnp.where(l[..., 0] == 0, -jnp.inf, lse)
            lse = lse.transpose(2, 0, 1).reshape(q.shape[0], hq)
            return o, lse
        return o
