"""Block-sparse attention, holistic BatchAttention, custom masks, sinks
(reference tests: tests/attention/test_block_sparse.py,
test_batch_attention.py, test_attention_sink.py styles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu import (
    BatchAttention,
    BlockSparseAttentionWrapper,
    VariableBlockSparseAttentionWrapper,
    single_prefill_with_kv_cache,
)
from flashinfer_tpu.ops.attention.decode import BatchDecodeWithPagedKVCacheWrapper
from flashinfer_tpu.testing.utils import attention_ref


def _dense_masked_ref(q, k, v, mask, sm_scale=None):
    """mask [M, N] bool (True = attend)."""
    m_, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / np.sqrt(d)
    qf = q.astype(np.float32).reshape(m_, hkv, g, d) * sm_scale
    s = np.einsum("mhgd,nhd->hgmn", qf, k.astype(np.float32))
    s = np.where(mask[None, None], s, -np.inf)
    mx = np.max(s, axis=-1, keepdims=True)
    mx_safe = np.where(np.isinf(mx), 0.0, mx)
    p = np.exp(s - mx_safe)
    p = np.where(mask[None, None], p, 0.0)
    l = p.sum(-1, keepdims=True)
    o = np.einsum("hgmn,nhd->mhgd", p / np.where(l == 0, 1, l),
                  v.astype(np.float32))
    return o.reshape(m_, hq, d)


@pytest.mark.parametrize("r,c", [(1, 1), (16, 16), (4, 32)])
def test_block_sparse_vs_dense(r, c):
    mb, nb = 4, 6
    m_, n = mb * r, nb * c
    hq, hkv, d = 4, 2, 64
    rng = np.random.default_rng(0)
    block = rng.random((mb, nb)) < 0.5
    block[:, 0] = True  # no empty rows
    indptr = np.concatenate([[0], np.cumsum(block.sum(1))]).astype(np.int32)
    indices = np.concatenate([np.nonzero(block[i])[0] for i in range(mb)
                              ]).astype(np.int32)
    q = rng.standard_normal((m_, hq, d)).astype(np.float32)
    k = rng.standard_normal((n, hkv, d)).astype(np.float32)
    v = rng.standard_normal((n, hkv, d)).astype(np.float32)

    w = BlockSparseAttentionWrapper()
    w.plan(indptr, indices, m_, n, r, c, hq, hkv, d)
    o = np.asarray(w.run(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    dense_mask = np.kron(block, np.ones((r, c), bool))[:m_, :n]
    ref = _dense_masked_ref(q, k, v, dense_mask)
    np.testing.assert_allclose(o, ref, rtol=2e-3, atol=2e-3)


def test_variable_block_sparse():
    hkv, hq, d = 2, 4, 32
    rng = np.random.default_rng(1)
    row_sz = np.array([[2, 3], [1, 4]], np.int64)  # [H, MB]
    col_sz = np.array([[3, 3], [2, 4]], np.int64)  # [H, NB]
    bm = rng.random((hkv, 2, 2)) < 0.6
    bm[:, :, 0] = True
    m_, n = 5, 6
    q = rng.standard_normal((m_, hq, d)).astype(np.float32)
    k = rng.standard_normal((n, hkv, d)).astype(np.float32)
    v = rng.standard_normal((n, hkv, d)).astype(np.float32)
    w = VariableBlockSparseAttentionWrapper()
    w.plan(bm, row_sz, col_sz, hq, hkv, d)
    o = np.asarray(w.run(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    # per-head dense reference
    g = hq // hkv
    for h in range(hkv):
        mask = bm[h][np.ix_(np.repeat(np.arange(2), row_sz[h]),
                            np.repeat(np.arange(2), col_sz[h]))]
        ref = _dense_masked_ref(
            q[:, h * g:(h + 1) * g], k[:, h:h + 1], v[:, h:h + 1], mask)
        np.testing.assert_allclose(o[:, h * g:(h + 1) * g], ref,
                                   rtol=2e-3, atol=2e-3)


def test_batch_attention_mixed_prefill_decode():
    """Mixed batch: request0 decode (q_len 1), request1 prefill (q_len 8)."""
    hq, hkv, d, ps = 4, 2, 64, 8
    rng = np.random.default_rng(2)
    kv_lens = np.array([24, 8], np.int64)
    qo_indptr = np.array([0, 1, 9], np.int64)
    pages_per = -(-kv_lens // ps)
    kv_indptr = np.concatenate([[0], np.cumsum(pages_per)]).astype(np.int32)
    kv_indices = np.arange(kv_indptr[-1], dtype=np.int32)
    num_pages = int(kv_indptr[-1])
    k_cache = rng.standard_normal((num_pages, ps, hkv, d)).astype(np.float32)
    v_cache = rng.standard_normal((num_pages, ps, hkv, d)).astype(np.float32)
    q = rng.standard_normal((9, hq, d)).astype(np.float32)

    w = BatchAttention()
    w.plan(qo_indptr, kv_indptr, kv_indices, kv_lens, hq, hkv, d, d, ps,
           causal=True)
    o, lse = w.run(jnp.asarray(q), (jnp.asarray(k_cache), jnp.asarray(v_cache)))
    o = np.asarray(o)

    # reference per request
    for b, (s, e) in enumerate(zip(qo_indptr[:-1], qo_indptr[1:])):
        kl, ql = int(kv_lens[b]), int(e - s)
        rows = np.concatenate([
            np.arange(p * ps, p * ps + ps)
            for p in kv_indices[kv_indptr[b]:kv_indptr[b + 1]]
        ])[:kl]
        kk, vv = k_cache.reshape(-1, hkv, d)[rows], v_cache.reshape(-1, hkv, d)[rows]
        pos_q = np.arange(ql) + kl - ql
        mask = pos_q[:, None] >= np.arange(kl)[None, :]
        ref = _dense_masked_ref(q[s:e], kk, vv, mask)
        np.testing.assert_allclose(o[s:e], ref, rtol=2e-3, atol=2e-3,
                                   err_msg=f"request {b}")


def test_custom_mask_single_prefill():
    qo, kv, hq, hkv, d = 8, 16, 4, 2, 64
    rng = np.random.default_rng(3)
    q = rng.standard_normal((qo, hq, d)).astype(np.float32)
    k = rng.standard_normal((kv, hkv, d)).astype(np.float32)
    v = rng.standard_normal((kv, hkv, d)).astype(np.float32)
    mask = rng.random((qo, kv)) < 0.6
    mask[:, 0] = True
    o = np.asarray(single_prefill_with_kv_cache(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        custom_mask=jnp.asarray(mask),
    ))
    ref = _dense_masked_ref(q, k, v, mask)
    np.testing.assert_allclose(o, ref, rtol=2e-3, atol=2e-3)


def test_decode_sinks():
    """Sink logits enlarge the softmax denominator (StreamingLLM)."""
    b, hq, hkv, d, ps = 2, 4, 2, 64, 8
    rng = np.random.default_rng(4)
    kv_len = 16
    num_pages = b * kv_len // ps
    k_cache = rng.standard_normal((num_pages, ps, hkv, d)).astype(np.float32)
    v_cache = rng.standard_normal((num_pages, ps, hkv, d)).astype(np.float32)
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    indptr = np.array([0, 2, 4], np.int32)
    indices = np.arange(4, dtype=np.int32)
    last = np.array([ps, ps], np.int32)
    sinks = np.array([0.5, -1.0, 2.0, 0.0], np.float32)

    w = BatchDecodeWithPagedKVCacheWrapper()
    w.plan(indptr, indices, last, hq, hkv, d, ps)
    o_sink = np.asarray(w.run(jnp.asarray(q),
                              (jnp.asarray(k_cache), jnp.asarray(v_cache)),
                              sinks=jnp.asarray(sinks)))
    o_plain = np.asarray(w.run(jnp.asarray(q),
                               (jnp.asarray(k_cache), jnp.asarray(v_cache))))

    # reference: softmax with extra sink logit per head
    g = hq // hkv
    sm = 1.0 / np.sqrt(d)
    for i in range(b):
        rows = np.concatenate([np.arange(p * ps, (p + 1) * ps)
                               for p in indices[indptr[i]:indptr[i + 1]]])
        kk = k_cache.reshape(-1, hkv, d)[rows]
        vv = v_cache.reshape(-1, hkv, d)[rows]
        for h in range(hq):
            s = (q[i, h] * sm) @ kk[:, h // g].T
            denom = np.exp(s).sum() + np.exp(sinks[h])
            ref = (np.exp(s) / denom) @ vv[:, h // g]
            np.testing.assert_allclose(o_sink[i, h], ref, rtol=2e-3, atol=2e-3)
    assert not np.allclose(o_sink, o_plain)


def test_block_sparse_causal():
    """Causal BSR: absolute-position causal masking over scattered column
    blocks (reference sparse.py:333)."""
    from flashinfer_tpu.ops.attention.sparse import (
        BlockSparseAttentionWrapper,
    )

    M = N = 64
    R = C = 16
    hq, hkv, d = 4, 2, 128
    mb, nb = M // R, N // C
    rng = np.random.default_rng(0)
    bm = rng.random((mb, nb)) < 0.6
    bm[:, 0] = True  # every row attends something
    indptr = np.concatenate([[0], np.cumsum(bm.sum(1))])
    indices = np.concatenate([np.nonzero(bm[i])[0] for i in range(mb)])
    q = jnp.asarray(rng.standard_normal((M, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, hkv, d)), jnp.float32)

    w = BlockSparseAttentionWrapper()
    w.plan(indptr, indices, M, N, R, C, hq, hkv, d, causal=True)
    out = w.run(q, k, v)

    dense = np.kron(bm, np.ones((R, C), bool))
    dense &= np.tril(np.ones((M, N), bool), k=N - M)
    from flashinfer_tpu.testing import attention_ref
    ref = attention_ref(q, k, v, custom_mask=jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_block_sparse_inner_element_mask():
    """Per-element masks inside nonzero blocks (reference sparse.py mask
    argument)."""
    from flashinfer_tpu.ops.attention.sparse import (
        BlockSparseAttentionWrapper,
    )

    M = N = 32
    R = C = 16
    hq, hkv, d = 2, 1, 128
    mb, nb = M // R, N // C
    rng = np.random.default_rng(1)
    bm = np.ones((mb, nb), bool)
    indptr = np.arange(mb + 1) * nb
    indices = np.tile(np.arange(nb), mb)
    elem = rng.random((len(indices), R, C)) < 0.7
    elem[:, :, 0] = True
    q = jnp.asarray(rng.standard_normal((M, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, hkv, d)), jnp.float32)

    w = BlockSparseAttentionWrapper()
    w.plan(indptr, indices, M, N, R, C, hq, hkv, d, mask=elem)
    out = w.run(q, k, v)

    dense = np.zeros((M, N), bool)
    for i in range(mb):
        for jj, b in enumerate(indices[indptr[i]:indptr[i + 1]]):
            dense[i * R:(i + 1) * R, b * C:(b + 1) * C] = elem[
                indptr[i] + jj]
    from flashinfer_tpu.testing import attention_ref
    ref = attention_ref(q, k, v, custom_mask=jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
