"""Prefill attention vs dense jnp reference (single, ragged batch, paged)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention import prefill
from flashinfer_tpu.testing import attention_ref, make_paged_kv_cache


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape, dtype=np.float32), dtype=dtype)


@pytest.mark.parametrize("qo_len,kv_len", [(1, 1), (17, 17), (128, 128), (99, 263), (256, 139)])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("num_qo_heads,num_kv_heads", [(4, 4), (8, 2)])
def test_single_prefill(rng, qo_len, kv_len, causal, num_qo_heads, num_kv_heads):
    if causal and qo_len > kv_len:
        pytest.skip("causal requires qo_len <= kv_len")
    d = 128
    q = _rand(rng, (qo_len, num_qo_heads, d))
    k = _rand(rng, (kv_len, num_kv_heads, d))
    v = _rand(rng, (kv_len, num_kv_heads, d))
    out, lse = prefill.single_prefill_with_kv_cache(
        q, k, v, causal=causal, return_lse=True
    )
    ref, ref_lse = attention_ref(q, k, v, causal=causal, return_lse=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("window_left", [0, 16])
def test_single_prefill_sliding_window(rng, window_left):
    q = _rand(rng, (64, 4, 128))
    k = _rand(rng, (64, 4, 128))
    v = _rand(rng, (64, 4, 128))
    out = prefill.single_prefill_with_kv_cache(
        q, k, v, causal=True, window_left=window_left
    )
    ref = attention_ref(q, k, v, causal=True, window_left=window_left)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_single_prefill_soft_cap(rng):
    q = _rand(rng, (32, 2, 128))
    k = _rand(rng, (50, 2, 128))
    v = _rand(rng, (50, 2, 128))
    out = prefill.single_prefill_with_kv_cache(q, k, v, logits_soft_cap=20.0)
    ref = attention_ref(q, k, v, logits_soft_cap=20.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_single_prefill_alibi(rng):
    q = _rand(rng, (32, 4, 128))
    k = _rand(rng, (32, 4, 128))
    v = _rand(rng, (32, 4, 128))
    out = prefill.single_prefill_with_kv_cache(
        q, k, v, causal=True, pos_encoding_mode="ALIBI"
    )
    # explicit alibi reference
    qf, kf, vf = (np.asarray(t, np.float32) for t in (q, k, v))
    slopes = 2.0 ** (-8.0 * np.arange(1, 5) / 4)
    s = np.einsum("qhd,khd->hqk", qf / np.sqrt(128), kf)
    qpos = np.arange(32)[:, None]
    kpos = np.arange(32)[None, :]
    s += slopes[:, None, None] * (kpos - qpos)[None]
    s = np.where((kpos <= qpos)[None], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("hqk,khd->qhd", p, vf)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_single_prefill_sinks(rng):
    q = _rand(rng, (16, 2, 128))
    k = _rand(rng, (16, 2, 128))
    v = _rand(rng, (16, 2, 128))
    sinks = jnp.asarray([0.5, -0.3])
    from flashinfer_tpu.ops.attention.pallas_prefill import build_prefill_plan, run_prefill
    plan = build_prefill_plan(
        np.asarray([0, 16]), np.asarray([16]), 2, 2, causal=True,
        kv_row_starts=np.asarray([0]),
    )
    out, _ = run_prefill(q, k, v, plan, causal=True, sinks=sinks)
    ref = attention_ref(q, k, v, causal=True, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("causal", [False, True])
def test_batch_ragged_prefill(rng, causal):
    qo_lens = [5, 128, 31, 1]
    kv_lens = [5, 200, 64, 77]
    hq, hkv, d = 8, 2, 128
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int32)
    kv_indptr = np.concatenate([[0], np.cumsum(kv_lens)]).astype(np.int32)
    q = _rand(rng, (int(qo_indptr[-1]), hq, d), jnp.bfloat16)
    k = _rand(rng, (int(kv_indptr[-1]), hkv, d), jnp.bfloat16)
    v = _rand(rng, (int(kv_indptr[-1]), hkv, d), jnp.bfloat16)
    w = prefill.BatchPrefillWithRaggedKVCacheWrapper()
    w.plan(qo_indptr, kv_indptr, hq, hkv, d, causal=causal)
    out, lse = w.run(q, k, v, return_lse=True)
    for b in range(4):
        qs, qe = qo_indptr[b], qo_indptr[b + 1]
        ks, ke = kv_indptr[b], kv_indptr[b + 1]
        ref, ref_lse = attention_ref(
            q[qs:qe].astype(jnp.float32), k[ks:ke].astype(jnp.float32),
            v[ks:ke].astype(jnp.float32), causal=causal, return_lse=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[qs:qe], np.float32), np.asarray(ref),
            rtol=3e-2, atol=3e-2,
        )
        np.testing.assert_allclose(
            np.asarray(lse[qs:qe]), np.asarray(ref_lse), rtol=8e-3, atol=8e-3
        )


@pytest.mark.parametrize("page_size", [8, 16])
def test_batch_paged_prefill(rng, page_size):
    # append semantics: qo covers last tokens, kv covers full history
    qo_lens = [4, 17, 60]
    kv_lens = [33, 17, 128]
    hq, hkv, d = 8, 4, 128
    (
        k_cache, v_cache, kv_indptr, kv_indices, kv_last_page_len,
        dense_k, dense_v,
    ) = make_paged_kv_cache(rng, kv_lens, page_size, hkv, d)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int32)
    q = _rand(rng, (int(qo_indptr[-1]), hq, d), jnp.bfloat16)
    w = prefill.BatchPrefillWithPagedKVCacheWrapper()
    w.plan(
        qo_indptr, kv_indptr, kv_indices, kv_last_page_len,
        hq, hkv, d, page_size, causal=True,
    )
    out = w.run(q, (k_cache, v_cache))
    for b in range(3):
        qs, qe = qo_indptr[b], qo_indptr[b + 1]
        ref = attention_ref(
            q[qs:qe].astype(jnp.float32), dense_k[b], dense_v[b], causal=True
        )
        np.testing.assert_allclose(
            np.asarray(out[qs:qe], np.float32), np.asarray(ref),
            rtol=3e-2, atol=3e-2,
        )
