"""Batch/single decode attention vs dense jnp reference.

Mirrors the reference's sweep style (tests/attention/test_batch_decode_kernels.py:97).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import flashinfer_tpu as fi
from flashinfer_tpu.testing import attention_ref, make_paged_kv_cache


@pytest.mark.parametrize("batch_kv_lens", [[17], [1, 2, 3], [127, 64, 1, 300]])
@pytest.mark.parametrize("page_size", [8, 16])
@pytest.mark.parametrize("num_qo_heads,num_kv_heads", [(8, 8), (8, 2)])
@pytest.mark.parametrize("head_dim", [128])
@pytest.mark.parametrize("logits_soft_cap", [0.0, 30.0])
def test_batch_decode(
    rng, batch_kv_lens, page_size, num_qo_heads, num_kv_heads, head_dim,
    logits_soft_cap,
):
    batch = len(batch_kv_lens)
    (
        k_cache, v_cache, kv_indptr, kv_indices, kv_last_page_len,
        dense_k, dense_v,
    ) = make_paged_kv_cache(
        rng, batch_kv_lens, page_size, num_kv_heads, head_dim
    )
    q = jnp.asarray(
        rng.standard_normal((batch, num_qo_heads, head_dim), dtype=np.float32),
        dtype=jnp.bfloat16,
    )

    wrapper = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="NHD")
    wrapper.plan(
        kv_indptr, kv_indices, kv_last_page_len,
        num_qo_heads, num_kv_heads, head_dim, page_size,
        logits_soft_cap=logits_soft_cap,
    )
    out, lse = wrapper.run(q, (k_cache, v_cache), return_lse=True)

    for i in range(batch):
        ref_o, ref_lse = attention_ref(
            q[i : i + 1].astype(jnp.float32),
            dense_k[i],
            dense_v[i],
            logits_soft_cap=logits_soft_cap,
            return_lse=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[i], dtype=np.float32),
            np.asarray(ref_o[0], dtype=np.float32),
            rtol=2e-2, atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(lse[i]), np.asarray(ref_lse[0]), rtol=1e-3, atol=1e-3
        )


@pytest.mark.parametrize("kv_len", [1, 54, 511, 2048])
@pytest.mark.parametrize("window_left", [-1, 32])
def test_single_decode(rng, kv_len, window_left):
    num_qo_heads, num_kv_heads, head_dim = 32, 8, 128
    q = jnp.asarray(
        rng.standard_normal((num_qo_heads, head_dim), dtype=np.float32),
        dtype=jnp.bfloat16,
    )
    k = jnp.asarray(
        rng.standard_normal((kv_len, num_kv_heads, head_dim), dtype=np.float32),
        dtype=jnp.bfloat16,
    )
    v = jnp.asarray(
        rng.standard_normal((kv_len, num_kv_heads, head_dim), dtype=np.float32),
        dtype=jnp.bfloat16,
    )
    out = fi.single_decode_with_kv_cache(q, k, v, window_left=window_left)
    ref = attention_ref(
        q[None].astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), window_left=window_left,
    )[0]
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_decode_fp8_kv(rng):
    batch_kv_lens = [33, 100]
    page_size, num_qo_heads, num_kv_heads, head_dim = 16, 8, 4, 128
    batch = len(batch_kv_lens)
    (
        k_cache, v_cache, kv_indptr, kv_indices, kv_last_page_len,
        dense_k, dense_v,
    ) = make_paged_kv_cache(
        rng, batch_kv_lens, page_size, num_kv_heads, head_dim
    )
    k_scale = v_scale = 2.0
    k8 = (k_cache.astype(jnp.float32) / k_scale).astype(jnp.float8_e4m3fn)
    v8 = (v_cache.astype(jnp.float32) / v_scale).astype(jnp.float8_e4m3fn)
    q = jnp.asarray(
        rng.standard_normal((batch, num_qo_heads, head_dim), dtype=np.float32),
        dtype=jnp.bfloat16,
    )
    wrapper = fi.BatchDecodeWithPagedKVCacheWrapper()
    wrapper.plan(
        kv_indptr, kv_indices, kv_last_page_len,
        num_qo_heads, num_kv_heads, head_dim, page_size,
        kv_data_type=jnp.float8_e4m3fn,
    )
    out = wrapper.run(q, (k8, v8), k_scale=k_scale, v_scale=v_scale)
    for i in range(batch):
        # compare against the dequantized-fp8 dense reference
        dk = dense_k[i].astype(jnp.float32)
        dv = dense_v[i].astype(jnp.float32)
        dk = (dk / k_scale).astype(jnp.float8_e4m3fn).astype(jnp.float32) * k_scale
        dv = (dv / v_scale).astype(jnp.float8_e4m3fn).astype(jnp.float32) * v_scale
        ref = attention_ref(q[i : i + 1].astype(jnp.float32), dk, dv)[0]
        np.testing.assert_allclose(
            np.asarray(out[i], dtype=np.float32),
            np.asarray(ref, dtype=np.float32),
            rtol=6e-2, atol=6e-2,
        )


def test_recommended_page_size():
    # plan-time advisory (measured table: ps16 wins <=1k kv, ps32 beyond)
    assert fi.recommended_page_size(512) == 16
    assert fi.recommended_page_size(1024) == 16
    assert fi.recommended_page_size(2048) == 32
    assert fi.recommended_page_size(131072) == 32
