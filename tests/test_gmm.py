"""Grouped matmul with in-kernel dequant (quantized MoE experts stay
quantized in HBM — reference group_gemm_fp8_groupwise, VERDICT r1 #4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.gmm import fused_moe_quant, grouped_matmul_quant


@pytest.mark.parametrize("dtype", ["int8", "fp8", "bf16"])
def test_gmm_matches_ragged_dot(dtype):
    rng = np.random.default_rng(0)
    e, k, n = 4, 256, 512
    gs = np.asarray([37, 0, 140, 5], np.int32)
    ts = int(gs.sum())
    x = jnp.asarray(rng.standard_normal((ts, k)), jnp.float32)
    if dtype == "int8":
        wq = jnp.asarray(rng.integers(-127, 127, (e, k, n)), jnp.int8)
    elif dtype == "fp8":
        wq = jnp.asarray(rng.standard_normal((e, k, n)), jnp.float8_e4m3fn)
    else:
        wq = jnp.asarray(rng.standard_normal((e, k, n)) * 0.1, jnp.bfloat16)
    ws = jnp.asarray(rng.random((e, k // 128, n // 128)) + 0.5, jnp.float32)

    y = grouped_matmul_quant(x, jnp.asarray(gs), wq, ws, tn=256)

    # reference: explicit dequant + ragged_dot
    wf = wq.astype(jnp.float32).reshape(e, k // 128, 128, n // 128, 128)
    wf = (wf * ws[:, :, None, :, None]).reshape(e, k, n)
    import jax

    ref = jax.lax.ragged_dot(x, wf, jnp.asarray(gs),
                             preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=3e-2, atol=3e-2 * np.sqrt(k))


def test_gmm_no_scale():
    rng = np.random.default_rng(1)
    e, k, n = 2, 128, 256
    gs = np.asarray([64, 64], np.int32)
    x = jnp.asarray(rng.standard_normal((128, k)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((e, k, n)) * 0.1, jnp.bfloat16)
    import jax

    y = grouped_matmul_quant(x, jnp.asarray(gs), wq, None, tn=256)
    ref = jax.lax.ragged_dot(x, wq.astype(jnp.float32), jnp.asarray(gs),
                             preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-1)


def test_fused_moe_quant_matches_dequant_path():
    rng = np.random.default_rng(2)
    e, h, i_sz, t, topk = 4, 256, 256, 24, 2
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
    w13q = jnp.asarray(rng.integers(-127, 127, (e, h, 2 * i_sz)), jnp.int8)
    w13s = jnp.asarray(rng.random((e, h // 128, 2 * i_sz // 128)) * 0.01,
                       jnp.float32)
    w2q = jnp.asarray(rng.integers(-127, 127, (e, i_sz, h)), jnp.int8)
    w2s = jnp.asarray(rng.random((e, i_sz // 128, h // 128)) * 0.01,
                      jnp.float32)
    ids = jnp.asarray(rng.integers(0, e, (t, topk)), jnp.int32)
    wts = jnp.full((t, topk), 0.5, jnp.float32)

    out = fused_moe_quant(x, w13q, w13s, w2q, w2s, ids, wts)

    from flashinfer_tpu.ops.moe import fused_moe

    def dq(wq, ws):
        eo, r, c = wq.shape
        wf = wq.astype(jnp.float32).reshape(eo, r // 128, 128, c // 128, 128)
        return (wf * ws[:, :, None, :, None]).reshape(eo, r, c).astype(
            jnp.bfloat16)

    ref = fused_moe(x, dq(w13q, w13s), dq(w2q, w2s), ids, wts)
    # both paths round through bf16 at different points; tolerance scales
    # with the output magnitude
    scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-9
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=0.02 * scale)


@pytest.mark.parametrize("m,k,n,tn", [(5, 128, 256, 256), (64, 256, 512, 256),
                                      (130, 384, 768, 256)])
def test_dense_matmul_quant_block_scales(m, k, n, tn):
    from flashinfer_tpu.ops.gmm import dense_matmul_quant

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    ws = jnp.asarray(rng.random((k // 128, n // 128)) * 0.02 + 0.01,
                     jnp.float32)
    y = dense_matmul_quant(x, wq, ws, tn=tn)
    wf = wq.astype(jnp.float32) * jnp.repeat(jnp.repeat(ws, 128, 0), 128, 1)
    ref = x.astype(jnp.float32) @ wf
    scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-9
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=0.02 * scale)


def test_dense_matmul_quant_no_scale_exact():
    from flashinfer_tpu.ops.gmm import dense_matmul_quant

    rng = np.random.default_rng(1)
    m, k, n = 16, 128, 256
    x = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-8, 9, (k, n)), jnp.int8)
    y = dense_matmul_quant(x, wq, None, tn=256)
    # f32 accumulate inside the kernel; the only rounding is the final
    # bf16 output cast — compare against the identically-cast reference
    ref = (x.astype(jnp.float32) @ wq.astype(jnp.float32)).astype(
        jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref, np.float32))


def test_decode_gemm_impl_gmm_matches_xla():
    """llama decode_step with decode_gemm_impl='gmm' must match the XLA
    convert-dot path on int8 weights (same params, same cache)."""
    import jax

    from flashinfer_tpu.models.llama import (
        LlamaConfig, decode_step, init_kv_cache, init_params_quantized,
    )
    from dataclasses import replace

    cfg = LlamaConfig.tiny(num_layers=2)
    params = init_params_quantized(jax.random.PRNGKey(0), cfg,
                                   weight_dtype=jnp.int8)
    batch, page_size, pages_per = 4, 16, 3
    num_pages = batch * pages_per
    page_table = jnp.arange(num_pages, dtype=jnp.int32).reshape(
        batch, pages_per)
    tokens = jnp.asarray([1, 2, 3, 4], jnp.int32)
    positions = jnp.asarray([0, 5, 9, 17], jnp.int32)
    kv_lens = positions + 1

    outs = {}
    for impl in ("xla", "gmm"):
        c = replace(cfg, decode_gemm_impl=impl)
        kv = init_kv_cache(c, num_pages, page_size)
        logits, _ = decode_step(params, c, kv, tokens, positions,
                                page_table, kv_lens, interpret=True)
        outs[impl] = np.asarray(logits, np.float32)
    scale = np.max(np.abs(outs["xla"])) + 1e-9
    np.testing.assert_allclose(outs["gmm"], outs["xla"], rtol=5e-2,
                               atol=0.03 * scale)
