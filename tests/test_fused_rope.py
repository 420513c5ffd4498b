"""Fused rope-on-the-fly (pos_encoding_mode=ROPE_LLAMA): the cache holds
pre-rope keys; the kernel rotates K chunks in-flight (reference
pos_enc.cuh:294 fused into decode.cuh/prefill.cuh)."""

import jax.numpy as jnp
import numpy as np

import flashinfer_tpu as fi
from flashinfer_tpu.ops.rope import apply_rope_pos_ids


def test_decode_fused_rope_matches_pre_roped():
    hq, hkv, d, ps = 8, 2, 128, 16
    batch, kv_len = 3, 70
    theta = 1e4
    rng = np.random.default_rng(0)
    pages = -(-kv_len // ps)
    npages = batch * pages
    k_raw = jnp.asarray(rng.standard_normal((npages * ps, hkv, d)),
                        jnp.float32)
    v_raw = jnp.asarray(rng.standard_normal((npages * ps, hkv, d)),
                        jnp.float32)
    q = jnp.asarray(rng.standard_normal((batch, hq, d)), jnp.float32)

    indptr = jnp.asarray(np.arange(batch + 1) * pages, jnp.int32)
    indices = jnp.asarray(np.arange(npages), jnp.int32)
    last = jnp.full((batch,), kv_len - (pages - 1) * ps, jnp.int32)

    # fused path: raw (pre-rope) cache + ROPE_LLAMA
    w = fi.BatchDecodeWithPagedKVCacheWrapper(jnp.zeros((1,)), "NHD")
    w.plan(indptr, indices, last, hq, hkv, d, ps,
           pos_encoding_mode="ROPE_LLAMA", rope_theta=theta)
    kc = k_raw.reshape(npages, ps, hkv, d)
    vc = v_raw.reshape(npages, ps, hkv, d)
    out = w.run(q, (kc, vc))

    # reference: rope k at its positions + rope q at kv_len-1, NONE mode
    pos = jnp.asarray(np.tile(np.arange(pages * ps), batch), jnp.int32)
    _, k_roped = apply_rope_pos_ids(k_raw, k_raw, pos, rope_theta=theta)
    q_roped, _ = apply_rope_pos_ids(
        q, q, jnp.full((batch,), kv_len - 1, jnp.int32), rope_theta=theta)
    w2 = fi.BatchDecodeWithPagedKVCacheWrapper(jnp.zeros((1,)), "NHD")
    w2.plan(indptr, indices, last, hq, hkv, d, ps)
    ref = w2.run(q_roped, (k_roped.reshape(npages, ps, hkv, d),
                           v_raw.reshape(npages, ps, hkv, d)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_prefill_fused_rope_matches_pre_roped():
    hq, hkv, d = 4, 2, 128
    qo = 70
    theta = 5e5
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((qo, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((qo, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((qo, hkv, d)), jnp.float32)
    qi = jnp.asarray([0, qo], jnp.int32)

    w = fi.BatchPrefillWithRaggedKVCacheWrapper(jnp.zeros((1,)), "NHD")
    w.plan(qi, qi, hq, hkv, d, causal=True,
           pos_encoding_mode="ROPE_LLAMA", rope_theta=theta)
    out = w.run(q, k, v)

    pos = jnp.arange(qo, dtype=jnp.int32)
    q_r, k_r = apply_rope_pos_ids(q, k, pos, rope_theta=theta)
    w2 = fi.BatchPrefillWithRaggedKVCacheWrapper(jnp.zeros((1,)), "NHD")
    w2.plan(qi, qi, hq, hkv, d, causal=True)
    ref = w2.run(q_r, k_r, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_paged_prefill_fused_rope_matches_pre_roped():
    """Paged-prefill wrapper with ROPE_LLAMA (VERDICT r2 #8): raw cache +
    in-kernel K rotation == pre-roped cache + NONE, incl. a chunked
    append (prefix already cached, q covers only the new suffix)."""
    hq, hkv, d, ps = 4, 2, 128, 16
    theta = 1e4
    rng = np.random.default_rng(2)
    kv_lens = [70, 45]
    qo_lens = [30, 45]  # request 0 appends 30 new tokens after 40 cached
    pages = [-(-l // ps) for l in kv_lens]
    npages = sum(pages)
    total_q = sum(qo_lens)

    k_raw = jnp.asarray(rng.standard_normal((npages * ps, hkv, d)),
                        jnp.float32)
    v_raw = jnp.asarray(rng.standard_normal((npages * ps, hkv, d)),
                        jnp.float32)
    q = jnp.asarray(rng.standard_normal((total_q, hq, d)), jnp.float32)

    qi = jnp.asarray(np.cumsum([0] + qo_lens), jnp.int32)
    indptr = jnp.asarray(np.cumsum([0] + pages), jnp.int32)
    indices = jnp.asarray(np.arange(npages), jnp.int32)
    last = jnp.asarray(
        [l - (p - 1) * ps for l, p in zip(kv_lens, pages)], jnp.int32)
    kc = k_raw.reshape(npages, ps, hkv, d)
    vc = v_raw.reshape(npages, ps, hkv, d)

    w = fi.BatchPrefillWithPagedKVCacheWrapper(jnp.zeros((1,)), "NHD")
    w.plan(qi, indptr, indices, last, hq, hkv, d, ps, causal=True,
           pos_encoding_mode="ROPE_LLAMA", rope_theta=theta)
    out = w.run(q, (kc, vc))

    # reference: pre-rope K rows at their within-request positions and q
    # at (kv_len - qo_len + i), then NONE mode
    pos_rows = np.concatenate(
        [np.arange(p * ps) for p in pages]).astype(np.int32)
    _, k_roped = apply_rope_pos_ids(
        k_raw, k_raw, jnp.asarray(pos_rows), rope_theta=theta)
    q_pos = np.concatenate([
        np.arange(qo) + (kv - qo) for qo, kv in zip(qo_lens, kv_lens)
    ]).astype(np.int32)
    q_roped, _ = apply_rope_pos_ids(
        q, q, jnp.asarray(q_pos), rope_theta=theta)
    w2 = fi.BatchPrefillWithPagedKVCacheWrapper(jnp.zeros((1,)), "NHD")
    w2.plan(qi, indptr, indices, last, hq, hkv, d, ps, causal=True)
    ref = w2.run(q_roped, (k_roped.reshape(npages, ps, hkv, d), vc))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
