"""MLA paged decode vs dense jnp reference (reference test:
tests/attention/test_deepseek_mla.py parameter style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.mla import BatchMLAPagedAttentionWrapper


def _ref_mla(q_nope, q_pe, ckv, kpe, kv_lens, sm_scale, causal, q_len):
    """Dense MLA reference: per request, scores over its kv prefix."""
    b = len(kv_lens)
    h = q_nope.shape[1]
    outs, lses = [], []
    for i in range(b):
        n = int(kv_lens[i])
        c = ckv[i][:n]  # [n, D_ckv]
        k = kpe[i][:n]  # [n, D_kpe]
        for t in range(q_len):
            row = i * q_len + t
            s = (q_nope[row].astype(np.float32) @ c.T.astype(np.float32)
                 + q_pe[row].astype(np.float32) @ k.T.astype(np.float32))
            s *= sm_scale
            if causal and q_len > 1:
                limit = n - (q_len - 1) + t
                s[:, limit:] = -np.inf
            m = s.max(-1, keepdims=True)
            p = np.exp(s - m)
            l = p.sum(-1, keepdims=True)
            outs.append((p / l) @ c.astype(np.float32))
            lses.append((m + np.log(l))[:, 0])
    return np.stack(outs), np.stack(lses)


@pytest.mark.parametrize("batch,q_len", [(2, 1), (3, 1), (2, 2)])
@pytest.mark.parametrize("page_size", [16, 32])
def test_mla_vs_reference(batch, q_len, page_size):
    h, d_ckv, d_kpe = 16, 512, 64
    rng = np.random.default_rng(0)
    kv_lens = rng.integers(page_size, 3 * page_size, batch)
    pages_per = -(-kv_lens // page_size)
    kv_indptr = np.concatenate([[0], np.cumsum(pages_per)]).astype(np.int32)
    num_pages = int(kv_indptr[-1])
    kv_indices = np.arange(num_pages, dtype=np.int32)
    qo_indptr = np.arange(batch + 1, dtype=np.int32) * q_len

    q_nope = rng.standard_normal((batch * q_len, h, d_ckv)).astype(np.float32)
    q_pe = rng.standard_normal((batch * q_len, h, d_kpe)).astype(np.float32)
    ckv_cache = rng.standard_normal((num_pages, page_size, d_ckv)).astype(np.float32)
    kpe_cache = rng.standard_normal((num_pages, page_size, d_kpe)).astype(np.float32)
    sm_scale = 1.0 / np.sqrt(d_ckv + d_kpe)

    w = BatchMLAPagedAttentionWrapper()
    w.plan(qo_indptr, kv_indptr, kv_indices, kv_lens.astype(np.int32),
           h, d_ckv, d_kpe, page_size, causal=True, sm_scale=sm_scale)
    o, lse = w.run(
        jnp.asarray(q_nope), jnp.asarray(q_pe),
        jnp.asarray(ckv_cache), jnp.asarray(kpe_cache), return_lse=True,
    )

    # dense per-request views
    ckv_dense = np.stack([
        ckv_cache[kv_indptr[i]:kv_indptr[i + 1]].reshape(-1, d_ckv)[
            :3 * page_size].copy()
        if pages_per[i] * page_size >= 3 * page_size else
        np.pad(ckv_cache[kv_indptr[i]:kv_indptr[i + 1]].reshape(-1, d_ckv),
               ((0, 3 * page_size - pages_per[i] * page_size), (0, 0)))
        for i in range(batch)
    ])
    kpe_dense = np.stack([
        np.pad(kpe_cache[kv_indptr[i]:kv_indptr[i + 1]].reshape(-1, d_kpe),
               ((0, max(0, 3 * page_size - pages_per[i] * page_size)), (0, 0)))
        [:3 * page_size]
        for i in range(batch)
    ])
    ref_o, ref_lse = _ref_mla(
        q_nope, q_pe, ckv_dense, kpe_dense, kv_lens, sm_scale, True, q_len
    )
    np.testing.assert_allclose(np.asarray(o), ref_o, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, rtol=2e-3, atol=2e-3)


def test_mla_fp8_kv_runs():
    batch, h, d_ckv, d_kpe, page_size = 2, 8, 512, 64, 16
    rng = np.random.default_rng(1)
    kv_lens = np.array([20, 30], np.int32)
    kv_indptr = np.array([0, 2, 4], np.int32)
    kv_indices = np.arange(4, dtype=np.int32)
    qo_indptr = np.arange(batch + 1, dtype=np.int32)
    q_nope = jnp.asarray(rng.standard_normal((batch, h, d_ckv)), jnp.bfloat16)
    q_pe = jnp.asarray(rng.standard_normal((batch, h, d_kpe)), jnp.bfloat16)
    ckv = jnp.asarray(rng.standard_normal((4, page_size, d_ckv)),
                      jnp.float8_e4m3fn)
    kpe = jnp.asarray(rng.standard_normal((4, page_size, d_kpe)),
                      jnp.float8_e4m3fn)
    w = BatchMLAPagedAttentionWrapper()
    w.plan(qo_indptr, kv_indptr, kv_indices, kv_lens, h, d_ckv, d_kpe,
           page_size, causal=False, sm_scale=0.05, )
    o = w.run(q_nope, q_pe, ckv, kpe, ckv_scale=1.5, kpe_scale=0.5)
    assert o.shape == (batch, h, d_ckv)
    assert bool(jnp.isfinite(o.astype(jnp.float32)).all())


def test_mla_ragged_qlen_stream():
    """Ragged q_len per request (speculative/prefill) through the
    streaming kernel vs per-request dense reference."""
    import numpy as np
    import jax.numpy as jnp
    from flashinfer_tpu.ops.attention.mla import (
        BatchMLAPagedAttentionWrapper,
    )

    h, d_ckv, d_kpe, ps = 8, 128, 64, 8
    q_lens = [3, 1, 6]
    kv_lens = [40, 17, 23]
    rng = np.random.default_rng(5)
    pages_per = [-(-l // ps) for l in kv_lens]
    total_pages = sum(pages_per)
    ckv = jnp.asarray(
        rng.standard_normal((total_pages, ps, d_ckv)), jnp.float32)
    kpe = jnp.asarray(
        rng.standard_normal((total_pages, ps, d_kpe)), jnp.float32)
    kv_indptr = np.concatenate([[0], np.cumsum(pages_per)])
    kv_indices = np.arange(total_pages)
    qo_indptr = np.concatenate([[0], np.cumsum(q_lens)])
    total_q = int(qo_indptr[-1])
    qn = jnp.asarray(rng.standard_normal((total_q, h, d_ckv)), jnp.float32)
    qp = jnp.asarray(rng.standard_normal((total_q, h, d_kpe)), jnp.float32)

    w = BatchMLAPagedAttentionWrapper()
    sm = 1.0 / np.sqrt(d_ckv + d_kpe)
    w.plan(qo_indptr, kv_indptr, kv_indices, np.asarray(kv_lens), h,
           d_ckv, d_kpe, ps, causal=True, sm_scale=sm)
    out = w.run(qn, qp, ckv, kpe)

    # dense reference per request
    for b in range(len(q_lens)):
        ql, kl = q_lens[b], kv_lens[b]
        rows = np.arange(kv_indptr[b] * ps, kv_indptr[b] * ps + kl)
        ckv_b = np.asarray(ckv).reshape(-1, d_ckv)[rows]
        kpe_b = np.asarray(kpe).reshape(-1, d_kpe)[rows]
        qs = slice(int(qo_indptr[b]), int(qo_indptr[b + 1]))
        qnb, qpb = np.asarray(qn)[qs], np.asarray(qp)[qs]
        s = (np.einsum("qhd,kd->hqk", qnb, ckv_b)
             + np.einsum("qhd,kd->hqk", qpb, kpe_b)) * sm
        pos = np.arange(kl)[None, :]
        limit = (kl - ql + 1 + np.arange(ql))[:, None]
        s = np.where(pos < limit, s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("hqk,kd->qhd", p, ckv_b)
        np.testing.assert_allclose(
            np.asarray(out)[qs], ref, rtol=2e-3, atol=2e-3)


def _dense_from_sparse_ref(q, pool, idx, valid, d_ckv):
    """Numpy reference: softmax over the valid gathered candidates."""
    b, ql, h, dt = q.shape
    out = np.zeros((b, ql, h, d_ckv), np.float32)
    for i in range(b):
        for t in range(ql):
            sel = idx[i, t][valid[i, t]]
            kv = pool[sel].astype(np.float32)  # [k, 576]
            s = q[i, t].astype(np.float32) @ kv.T / np.sqrt(dt)
            m = s.max(-1, keepdims=True)
            p = np.exp(s - m)
            out[i, t] = (p / p.sum(-1, keepdims=True)) @ kv[:, :d_ckv]
    return out


def test_sparse_mla_vs_dense_gather():
    """Sparse top-k MLA (reference _sparse_mla_sm120.py semantics):
    per-q-token global slot indices, negatives + beyond-topk_lens masked."""
    from flashinfer_tpu.ops.attention.mla import sparse_mla_attention

    rng = np.random.default_rng(3)
    b, ql, h, k_top, d_ckv = 2, 2, 8, 24, 128
    d_t = d_ckv + 64
    n_slots = 160
    pool = rng.standard_normal((n_slots, d_t)).astype(np.float32)
    q = rng.standard_normal((b, ql, h, d_t)).astype(np.float32)
    idx = rng.integers(0, n_slots, (b, ql, k_top)).astype(np.int32)
    idx[0, 0, 5] = -1  # hole
    lens = np.array([k_top, k_top - 4], np.int32)
    valid = (idx >= 0) & (np.arange(k_top)[None, None, :] < lens[:, None, None])

    o = sparse_mla_attention(
        jnp.asarray(q), jnp.asarray(pool).reshape(n_slots // 16, 16, d_t),
        jnp.asarray(idx), jnp.asarray(lens),
        sm_scale=1.0 / np.sqrt(d_t), head_dim_ckv=d_ckv,
    )
    ref = _dense_from_sparse_ref(q, pool, idx, valid, d_ckv)
    np.testing.assert_allclose(np.asarray(o), ref, rtol=2e-3, atol=2e-3)


def test_trtllm_mla_sparse_matches_dense_on_full_prefix():
    """sparse_mla_top_k with indices = the full prefix must equal the
    dense paged MLA result (reference cross-checks sparse vs dense the
    same way in tests/attention/test_trtllm_gen_mla.py)."""
    from flashinfer_tpu.ops.attention.mla import (
        trtllm_batch_decode_with_kv_cache_mla,
    )

    rng = np.random.default_rng(4)
    b, h, d_ckv, ps = 2, 8, 128, 16
    d_t = d_ckv + 64
    kv_lens = np.array([29, 41], np.int32)
    max_pages = 3
    cache = rng.standard_normal((b * max_pages, ps, d_t)).astype(np.float32)
    table = np.arange(b * max_pages, dtype=np.int32).reshape(b, max_pages)
    q = rng.standard_normal((b, 1, h, d_t)).astype(np.float32)

    dense = trtllm_batch_decode_with_kv_cache_mla(
        jnp.asarray(q), jnp.asarray(cache), block_tables=jnp.asarray(table),
        seq_lens=jnp.asarray(kv_lens), kv_lora_rank=d_ckv,
        bmm1_scale=1.0 / np.sqrt(d_t),
    )
    k_top = int(kv_lens.max())
    idx = np.full((b, 1, k_top), -1, np.int32)
    for i in range(b):
        pos = np.arange(kv_lens[i])
        idx[i, 0, :kv_lens[i]] = table[i][pos // ps] * ps + pos % ps
    sparse = trtllm_batch_decode_with_kv_cache_mla(
        jnp.asarray(q), jnp.asarray(cache), block_tables=jnp.asarray(idx),
        seq_lens=None, kv_lora_rank=d_ckv, sparse_mla_top_k=k_top,
        bmm1_scale=1.0 / np.sqrt(d_t),
    )
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), rtol=2e-3, atol=2e-3)


def test_sparse_mla_dsv4_two_pools():
    from flashinfer_tpu.ops.attention.mla import (
        trtllm_batch_decode_sparse_mla_dsv4,
    )

    rng = np.random.default_rng(5)
    b, ql, h, d = 1, 1, 4, 128
    swa = rng.standard_normal((4, 8, d)).astype(np.float32)  # 32 slots
    comp = rng.standard_normal((4, 8, d)).astype(np.float32)
    n_swa = 128  # column convention: all of our 130 columns < 128 are SWA
    idx = np.full((b, ql, 130), -1, np.int32)
    idx[0, 0, :16] = np.arange(16)  # SWA slots
    idx[0, 0, 128:130] = [3, 7]  # compressed slots
    lens = np.array([130], np.int32)
    o = trtllm_batch_decode_sparse_mla_dsv4(
        jnp.asarray(rng.standard_normal((b, ql, h, d)).astype(np.float32)),
        jnp.asarray(swa), sparse_indices=jnp.asarray(idx),
        compressed_kv_cache=jnp.asarray(comp),
        sparse_topk_lens=jnp.asarray(lens), bmm1_scale=1.0 / np.sqrt(d),
    )
    assert o.shape == (b, ql, h, d)
    assert np.isfinite(np.asarray(o)).all()


def test_xqa_mla_beam_matches_per_beam():
    """beam>1 folds into batch; each beam must equal its own beam=1 call."""
    from flashinfer_tpu.ops.attention.mla import xqa_mla

    rng = np.random.default_rng(17)
    b, beam, h, ps = 2, 3, 4, 16
    q = rng.standard_normal((b, beam, h, 576)).astype(np.float32)
    kv = rng.standard_normal((8, ps, 576)).astype(np.float32)
    pt = np.array([[0, 1, 2, 3], [4, 5, 6, 7]], np.int32)
    lens = np.array([40, 60], np.int32)
    out = xqa_mla(jnp.asarray(q), jnp.asarray(kv), jnp.asarray(pt),
                  jnp.asarray(lens))
    assert out.shape == (b, beam, h, 512)
    for j in range(beam):
        single = xqa_mla(jnp.asarray(q[:, j:j + 1]), jnp.asarray(kv),
                         jnp.asarray(pt), jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(out[:, j]),
                                   np.asarray(single[:, 0]),
                                   rtol=2e-5, atol=2e-5)
