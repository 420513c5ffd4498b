"""GEMM family: bf16/fp8/fp4 + grouped GEMM vs dequantized references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops import gemm, quantization as q


def test_mm_bf16(rng):
    a = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((128, 96), dtype=np.float32), jnp.bfloat16)
    out = gemm.mm_bf16(a, b, out_dtype=jnp.float32)
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-1)


@pytest.mark.parametrize("m,k,n", [(16, 256, 128), (300, 384, 512)])
def test_mm_fp8_groupwise(rng, m, k, n):
    a = rng.standard_normal((m, k), dtype=np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32)
    aq, a_s = q.groupwise_scaled_quantize(jnp.asarray(a))
    wq, w_s = q.blockwise_scaled_quantize(jnp.asarray(w))
    out = gemm.mm_fp8(aq, wq, a_s, w_s, out_dtype=jnp.float32)
    # dequantized reference
    adq = np.asarray(aq.astype(jnp.float32)).reshape(m, k // 128, 128) * np.asarray(a_s)[..., None]
    wdq = (
        np.asarray(wq.astype(jnp.float32)).reshape(k // 128, 128, n // 128, 128)
        * np.asarray(w_s)[:, None, :, None]
    )
    # implementation contract: dequantized operands enter the MXU as bf16
    # (TPU has no fp8 unit — same contract as grouped_mm_fp8 below)
    adq = np.asarray(jnp.asarray(adq.reshape(m, k), jnp.bfloat16), np.float32)
    wdq = np.asarray(jnp.asarray(wdq.reshape(k, n), jnp.bfloat16), np.float32)
    ref = adq @ wdq
    rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 3e-2, rel.max()


def test_mm_fp8_per_tensor(rng):
    a = rng.standard_normal((32, 128), dtype=np.float32)
    w = rng.standard_normal((128, 64), dtype=np.float32)
    aq, a_s = q.fp8_quantize(jnp.asarray(a))
    wq, w_s = q.fp8_quantize(jnp.asarray(w))
    out = gemm.mm_fp8(aq, wq, a_s, w_s, out_dtype=jnp.float32)
    ref = (np.asarray(aq.astype(jnp.float32)) * float(a_s)) @ (
        np.asarray(wq.astype(jnp.float32)) * float(w_s)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-2, atol=3e-1)


def test_e2m1_roundtrip():
    vals = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, -0.5, -6.0])
    codes = q.e2m1_encode(vals)
    from flashinfer_tpu.ops.gemm_pallas import e2m1_decode
    back = e2m1_decode(codes.astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


def test_fp4_quant_dequant(rng):
    x = jnp.asarray(rng.standard_normal((8, 256), dtype=np.float32))
    packed, scales = q.fp4_quantize(x, sf_vec_size=16)
    assert packed.shape == (8, 128) and packed.dtype == jnp.uint8
    deq = q.fp4_dequantize(packed, scales, sf_vec_size=16, dtype=jnp.float32)
    # e2m1 with 16-block scales: ~1 bit mantissa → loose tolerance,
    # but errors must be bounded by the per-block scale * max quant err
    err = np.abs(np.asarray(deq) - np.asarray(x))
    block_amax = np.abs(np.asarray(x)).reshape(8, 16, 16).max(-1, keepdims=True)
    bound = np.broadcast_to(block_amax * 0.26 + 1e-3, err.reshape(8, 16, 16).shape)
    assert (err.reshape(8, 16, 16) <= bound).all()


def test_mxfp4_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((4, 128), dtype=np.float32))
    packed, scales = q.mxfp4_quantize(x)
    deq = q.mxfp4_dequantize(packed, scales, dtype=jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(x))
    assert err.max() < np.abs(np.asarray(x)).max() * 0.6


@pytest.mark.parametrize("m,k,n", [(64, 256, 256), (100, 384, 512)])
def test_mm_fp4(rng, m, k, n):
    a = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32), jnp.bfloat16)
    w = rng.standard_normal((k, n), dtype=np.float32)
    # quantize along K (contraction dim): scale blocks [K//16, N]
    k_blocks = k // 16
    wf = w.reshape(k_blocks, 16, n)
    amax = np.abs(wf).max(1)
    scale = np.maximum(amax, 1e-12) / 6.0  # [k_blocks, n]
    codes = np.asarray(q.e2m1_encode(jnp.asarray(wf / scale[:, None, :]))).reshape(k, n)
    packed_kn = q.pack_fp4_weights_for_gemm(jnp.asarray(codes))
    out = gemm.mm_fp4(
        a, packed_kn, jnp.asarray(scale, np.float32),
        sf_block=16, out_dtype=jnp.float32,
    )
    from flashinfer_tpu.ops.gemm_pallas import e2m1_decode
    wdq2 = np.asarray(e2m1_decode(jnp.asarray(codes, jnp.int32)))
    wdq2 = wdq2.reshape(k_blocks, 16, n) * scale[:, None, :]
    # kernel contract: the dequantized weights enter the MXU as bf16
    wdq2_bf16 = np.asarray(jnp.asarray(wdq2, jnp.bfloat16), np.float32)
    ref = np.asarray(a, np.float32) @ wdq2_bf16.reshape(k, n)
    rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 3e-2, rel.max()


def test_grouped_mm(rng):
    x = jnp.asarray(rng.standard_normal((20, 64), dtype=np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 64, 32), dtype=np.float32), jnp.bfloat16)
    gs = jnp.asarray([5, 8, 7], jnp.int32)
    out = gemm.grouped_mm_bf16(x, w, gs, out_dtype=jnp.float32)
    xs = np.asarray(x, np.float32)
    ws = np.asarray(w, np.float32)
    ref = np.concatenate(
        [xs[0:5] @ ws[0], xs[5:13] @ ws[1], xs[13:20] @ ws[2]]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-2, atol=3e-1)


def test_segment_gemm_wrapper(rng):
    x = jnp.asarray(rng.standard_normal((10, 32), dtype=np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((4, 32, 16), dtype=np.float32), jnp.bfloat16)
    wrapper = gemm.SegmentGEMMWrapper()
    out = wrapper.run(
        x, w, batch_size=2, seg_lens=jnp.asarray([6, 4]),
        weight_indices=jnp.asarray([2, 0]),
    )
    xs, ws = np.asarray(x, np.float32), np.asarray(w, np.float32)
    ref = np.concatenate([xs[:6] @ ws[2], xs[6:] @ ws[0]])
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=3e-2, atol=3e-1)


def test_packbits():
    bits = jnp.asarray([1, 0, 1, 1, 0, 0, 0, 1, 1, 1], bool)
    out = np.asarray(q.packbits(bits))
    assert out[0] == 0b10110001
    assert out[1] == 0b11000000


def test_grouped_mm_fp8(rng):
    t, k, n, g = 12, 256, 128, 2
    x = rng.standard_normal((t, k), dtype=np.float32)
    w = rng.standard_normal((g, k, n), dtype=np.float32)
    xq, xs = q.groupwise_scaled_quantize(jnp.asarray(x))
    wqs = [q.blockwise_scaled_quantize(jnp.asarray(w[i])) for i in range(g)]
    wq = jnp.stack([a for a, _ in wqs])
    ws = jnp.stack([b for _, b in wqs])
    gs = jnp.asarray([7, 5], jnp.int32)
    out = gemm.grouped_mm_fp8(xq, xs, wq, ws, gs, out_dtype=jnp.float32)
    # dequantized ref
    xdq = np.asarray(xq.astype(jnp.float32)).reshape(t, k // 128, 128) * np.asarray(xs)[..., None]
    xdq = xdq.reshape(t, k)
    wdq = (
        np.asarray(wq.astype(jnp.float32)).reshape(g, k // 128, 128, n // 128, 128)
        * np.asarray(ws)[:, :, None, :, None]
    ).reshape(g, k, n)
    # implementation contract: dequantized operands enter the dot as bf16
    xdq = np.asarray(jnp.asarray(xdq, jnp.bfloat16), np.float32)
    wdq = np.asarray(jnp.asarray(wdq, jnp.bfloat16), np.float32)
    ref = np.concatenate([xdq[:7] @ wdq[0], xdq[7:] @ wdq[1]])
    rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 3e-2


def test_mm_int8_w8a8(rng):
    """Native int8 MXU GEMM: per-token activation quant x per-channel
    weight quant, exact f32 scale epilogue."""
    from flashinfer_tpu.ops.gemm import (
        mm_int8, quantize_int8_channels, quantize_int8_rows)

    m, k, n = 24, 128, 96
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wf = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    w8, ws = quantize_int8_channels(wf)
    assert w8.dtype == jnp.int8 and ws.shape == (n,)

    y = mm_int8(x, w8, b_scale=ws, out_dtype=jnp.float32)
    ref = np.asarray(x, np.float32) @ np.asarray(wf)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(y), ref, atol=0.02 * scale)

    # pre-quantized activations bit-match the auto-quant path
    x8, xs = quantize_int8_rows(x)
    y2 = mm_int8(x8, w8, a_scale=xs, b_scale=ws, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y))

    with pytest.raises(ValueError, match="a_scale"):
        mm_int8(x, w8, a_scale=xs)


def test_mm_int8_int32_accumulation_exact(rng):
    """The int8 dot must accumulate in int32 (no precision loss)."""
    from flashinfer_tpu.ops.gemm import mm_int8

    m, k, n = 8, 256, 16
    a = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    y = mm_int8(a, b, out_dtype=jnp.float32)
    ref = np.asarray(a, np.int64) @ np.asarray(b, np.int64)
    np.testing.assert_array_equal(np.asarray(y, np.int64), ref)
