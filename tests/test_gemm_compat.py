"""deep_gemm entry points, fp4 MoE variant, api_compat attention routers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.deep_gemm import (
    fp8_gemm_nt,
    m_grouped_fp8_gemm_nt_contiguous,
    m_grouped_fp8_gemm_nt_masked,
)
from flashinfer_tpu.ops.gemm_pallas import e2m1_decode
from flashinfer_tpu.ops.moe import trtllm_fp4_block_scale_moe
from flashinfer_tpu.ops.quantization import e2m1_encode, pack_e2m1
from flashinfer_tpu import (
    fmha_varlen,
    trtllm_batch_decode_with_kv_cache,
)


def _q8(x):
    s = np.abs(x).max() / 448.0
    return (x / s).astype(jnp.float8_e4m3fn), s


def test_fp8_gemm_nt():
    rng = np.random.default_rng(0)
    m, n, k = 16, 256, 256
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((n, k)).astype(np.float32)
    xq = jnp.asarray(x).astype(jnp.float8_e4m3fn)
    wq = jnp.asarray(w).astype(jnp.float8_e4m3fn)
    xs = jnp.ones((m, k // 128), jnp.float32)
    ws = jnp.ones((n // 128, k // 128), jnp.float32)
    out = np.asarray(fp8_gemm_nt((xq, xs), (wq, ws), out_dtype=jnp.float32))
    ref = np.asarray(xq, np.float32) @ np.asarray(wq, np.float32).T
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-1)


def test_m_grouped_contiguous():
    rng = np.random.default_rng(1)
    g, n, k = 2, 128, 128
    sizes = [3, 5]
    t = sum(sizes)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32).astype(
        jnp.float8_e4m3fn)
    w = jnp.asarray(rng.standard_normal((g, n, k)) * 0.1, jnp.float32).astype(
        jnp.float8_e4m3fn)
    xs = jnp.ones((t, k // 128), jnp.float32)
    ws = jnp.ones((g, n // 128, k // 128), jnp.float32)
    m_idx = jnp.asarray(sum([[i] * s for i, s in enumerate(sizes)], []),
                        jnp.int32)
    out = np.asarray(m_grouped_fp8_gemm_nt_contiguous(
        (x, xs), (w, ws), m_indices=m_idx, out_dtype=jnp.float32))
    xf, wf = np.asarray(x, np.float32), np.asarray(w, np.float32)
    np.testing.assert_allclose(out[:3], xf[:3] @ wf[0].T, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(out[3:], xf[3:] @ wf[1].T, rtol=2e-2, atol=2e-2)


def test_m_grouped_masked():
    rng = np.random.default_rng(2)
    g, m_max, n, k = 2, 4, 128, 128
    x = jnp.asarray(rng.standard_normal((g, m_max, k)), jnp.float32).astype(
        jnp.float8_e4m3fn)
    w = jnp.asarray(rng.standard_normal((g, n, k)) * 0.1, jnp.float32).astype(
        jnp.float8_e4m3fn)
    xs = jnp.ones((g, m_max, k // 128), jnp.float32)
    ws = jnp.ones((g, n // 128, k // 128), jnp.float32)
    masked_m = jnp.asarray([2, 4], jnp.int32)
    out = np.asarray(m_grouped_fp8_gemm_nt_masked(
        (x, xs), (w, ws), masked_m=masked_m, out_dtype=jnp.float32))
    assert out.shape == (g, m_max, n)
    assert (out[0, 2:] == 0).all()
    xf, wf = np.asarray(x, np.float32), np.asarray(w, np.float32)
    np.testing.assert_allclose(out[1], xf[1] @ wf[1].T, rtol=2e-2, atol=2e-2)


def test_trtllm_fp4_moe_runs():
    rng = np.random.default_rng(3)
    e, h, i_sz, t, topk = 4, 64, 32, 6, 2
    hidden = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
    logits = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)

    def pack(shape):
        vals = rng.standard_normal(shape).astype(np.float32)
        codes = e2m1_encode(jnp.asarray(vals))
        return pack_e2m1(codes)

    w13 = pack((e, 2 * i_sz, h))
    w2 = pack((e, h, i_sz))
    s13 = jnp.ones((e, 2 * i_sz, h // 16), jnp.float32) * 0.1
    s2 = jnp.ones((e, h, i_sz // 16), jnp.float32) * 0.1
    out = trtllm_fp4_block_scale_moe(
        logits, None, hidden, None, w13, s13, w2, s2,
        None, None, None, num_experts=e, top_k=topk,
        routing_method_type=1,  # Renormalize
    )
    assert out.shape == (t, h)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_trtllm_decode_compat():
    rng = np.random.default_rng(4)
    b, hq, hkv, d, ps = 2, 4, 2, 64, 8
    num_pages = 4
    kv = jnp.asarray(
        rng.standard_normal((num_pages, 2, hkv, ps, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    bt = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    sl = jnp.asarray([16, 12], jnp.int32)
    o = trtllm_batch_decode_with_kv_cache(
        q, kv, None, bt, sl, 16, bmm1_scale=1.0 / np.sqrt(d),
        kv_layout="HND")
    assert o.shape == (b, hq, d)
    assert bool(jnp.isfinite(o.astype(jnp.float32)).all())


def test_fmha_varlen_compat():
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((10, 4, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((10, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((10, 2, 64)), jnp.float32)
    qo = np.array([0, 4, 10])
    out = fmha_varlen(q, k, v, qo, qo, causal=True)
    assert out.shape == q.shape
    from flashinfer_tpu import single_prefill_with_kv_cache
    ref0 = single_prefill_with_kv_cache(q[:4], k[:4], v[:4], causal=True)
    np.testing.assert_allclose(np.asarray(out[:4]), np.asarray(ref0),
                               rtol=2e-3, atol=2e-3)
