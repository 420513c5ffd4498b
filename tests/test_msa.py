"""MSA pipeline tests vs dense references (reference tests/msa_ops/ style)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.msa import (
    MSA_BLOCK,
    msa_proxy_score,
    msa_sparse_attention,
    msa_sparse_decode_attention,
    msa_topk_select,
)


def test_proxy_score_matches_blocked_max():
    rng = np.random.default_rng(0)
    lens = [200, 130]
    total = sum(lens)
    hq, hkv, d = 4, 2, 128
    q = rng.standard_normal((total, hq, d)).astype(np.float32)
    k = rng.standard_normal((total, hkv, d)).astype(np.float32)
    cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)

    out = np.asarray(msa_proxy_score(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(cu), causal=True))
    g = hq // hkv
    for b, (s0, s1) in enumerate(zip(cu[:-1], cu[1:])):
        klen = s1 - s0
        n_tiles = -(-klen // MSA_BLOCK)
        sc = np.einsum("qhd,khd->hqk",
                       q[s0:s1].reshape(-1, hkv, g, d).reshape(s1 - s0, hq, d),
                       np.repeat(k[s0:s1], g, axis=1))
        mask = np.arange(s1 - s0)[:, None] >= np.arange(klen)[None, :]
        sc = np.where(mask[None], sc, -np.inf)
        for t in range(n_tiles):
            blk = sc[:, :, t * MSA_BLOCK:(t + 1) * MSA_BLOCK]
            ref = blk.max(-1) if blk.size else None
            np.testing.assert_allclose(
                out[:, t, s0:s1], ref, rtol=1e-5, atol=1e-5)


def test_topk_select_force_blocks():
    h, tiles, tq, topk = 1, 10, 2, 4
    rng = np.random.default_rng(1)
    scores = rng.standard_normal((h, tiles, tq)).astype(np.float32)
    idx = np.asarray(msa_topk_select(
        jnp.asarray(scores), topk, num_valid_pages=8,
        force_begin_blocks=1, force_end_blocks=1))
    assert idx.shape == (h, tq, topk)
    for t in range(tq):
        sel = idx[0, t]
        assert 0 in sel  # forced first block
        assert 7 in sel  # forced last valid block
        assert (sel < 8).all() and (sel >= 0).all()
        assert (np.sort(sel) == sel).all()


def test_sparse_attention_full_topk_equals_dense():
    """With topk covering all blocks, sparse == dense causal attention."""
    rng = np.random.default_rng(2)
    lens = [150]
    total = sum(lens)
    hq, hkv, d = 2, 1, 64
    q = rng.standard_normal((total, hq, d)).astype(np.float32)
    k = rng.standard_normal((total, hkv, d)).astype(np.float32)
    v = rng.standard_normal((total, hkv, d)).astype(np.float32)
    cu = np.array([0, total], np.int32)

    n_tiles = -(-total // MSA_BLOCK)
    proxy_q = np.pad(q, ((0, 0), (0, 0), (0, 128 - d)))
    proxy_k = np.pad(k, ((0, 0), (0, 0), (0, 128 - d)))
    score = msa_proxy_score(jnp.asarray(proxy_q), jnp.asarray(proxy_k),
                            jnp.asarray(cu), causal=True)
    idx = msa_topk_select(score, n_tiles)
    out = np.asarray(msa_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), idx,
        jnp.asarray(cu), causal=True))

    # dense reference
    sm = 1.0 / np.sqrt(d)
    for h in range(hq):
        s = (q[:, h] * sm) @ k[:, 0].T
        s = np.where(np.tril(np.ones((total, total), bool)), s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        np.testing.assert_allclose(out[:, h], p @ v[:, 0], rtol=2e-3,
                                   atol=2e-3)


def test_sparse_decode():
    rng = np.random.default_rng(3)
    b, hq, hkv, d = 2, 2, 1, 64
    lens = np.array([140, 260], np.int32)
    starts = np.array([0, 140], np.int32)
    total_k = int(lens.sum())
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((total_k, hkv, d)).astype(np.float32)
    v = rng.standard_normal((total_k, hkv, d)).astype(np.float32)
    max_tiles = 3
    idx = np.full((hkv, b, max_tiles), -1, np.int32)
    idx[0, 0, :2] = [0, 1]
    idx[0, 1, :3] = [0, 1, 2]
    out = np.asarray(msa_sparse_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(idx),
        starts, lens))
    sm = 1.0 / np.sqrt(d)
    for i in range(b):
        rows = np.arange(starts[i], starts[i] + lens[i])
        for h in range(hq):
            s = (q[i, h] * sm) @ k[rows, 0].T
            p = np.exp(s - s.max())
            p /= p.sum()
            np.testing.assert_allclose(out[i, h], p @ v[rows, 0],
                                       rtol=2e-3, atol=2e-3)


def test_msa_proxy_score_paged():
    """Paged proxy-K (page_table + seqused_k) matches the flat-K path."""
    from flashinfer_tpu.ops.msa import msa_proxy_score

    rng = np.random.default_rng(0)
    hq, hkv, d, ps = 2, 1, 128, 16
    kv_lens = [40, 17]
    q_lens = [40, 17]
    pages_per = [-(-l // ps) for l in kv_lens]
    tp = sum(pages_per)
    pool = rng.standard_normal((tp, ps, hkv, d)).astype(np.float32)
    pt = np.zeros((2, max(pages_per)), np.int32)
    pt[0, :pages_per[0]] = np.arange(pages_per[0])
    pt[1, :pages_per[1]] = pages_per[0] + np.arange(pages_per[1])
    k_flat = np.concatenate([
        pool[:pages_per[0]].reshape(-1, hkv, d)[:kv_lens[0]],
        pool[pages_per[0]:].reshape(-1, hkv, d)[:kv_lens[1]],
    ])
    cu_q = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)
    cu_k = np.concatenate([[0], np.cumsum(kv_lens)]).astype(np.int32)
    q = jnp.asarray(rng.standard_normal((sum(q_lens), hq, d)), jnp.float32)

    ref = msa_proxy_score(q, jnp.asarray(k_flat), cu_q, cu_k)
    out = msa_proxy_score(
        q, jnp.asarray(pool), cu_q,
        page_table=jnp.asarray(pt), seqused_k=jnp.asarray(kv_lens))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_msa_proxy_score_fp4_matches_dequant_reference():
    """fp4 proxy == bf16 proxy on the dequantized packed inputs, with the
    global scales folded into the logits (reference proxy_score.py:611)."""
    from flashinfer_tpu.ops.msa import (
        msa_proxy_score, msa_proxy_score_fp4, msa_quantize_qk_fp4,
    )
    from flashinfer_tpu.ops.quantization import fp4_dequantize

    rng = np.random.default_rng(3)
    total, hq, hkv = 24, 4, 2
    q = jnp.asarray(rng.standard_normal((total, hq, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((total, hkv, 128)), jnp.float32)
    cu = jnp.asarray([0, 10, 24], jnp.int32)
    qf4, qs, qg = msa_quantize_qk_fp4(q)
    kf4, ks, kg = msa_quantize_qk_fp4(k)
    out = msa_proxy_score_fp4(qf4, kf4, qs, ks, qg, kg, cu)
    qd = fp4_dequantize(qf4, qs, sf_vec_size=16, dtype=jnp.float32)
    kd = fp4_dequantize(kf4, ks, sf_vec_size=16, dtype=jnp.float32)
    ref = np.asarray(msa_proxy_score(qd, kd, cu), np.float32) * (qg * kg)
    outn = np.asarray(out, np.float32)
    fin = np.isfinite(ref)
    np.testing.assert_allclose(outn[fin], ref[fin], rtol=1e-4, atol=1e-4)
    assert np.all(np.isneginf(outn[~fin]))
