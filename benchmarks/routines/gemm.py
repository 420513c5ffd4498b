"""GEMM benchmark routines (reference benchmarks/routines/gemm.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.testing.utils import bench_loop

V5E_BF16_TFLOPS = 197.0


def bench_mm_bf16(m: int = 4096, k: int = 4096, n: int = 4096) -> dict:
    """bf16 GEMM TFLOP/s."""
    from flashinfer_tpu.ops.gemm import mm_bf16

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    # this routine is the PROBE that anchors every roofline: iters was 16
    # with a 1-iter base, and one jittery base draw printed 1473 TF/s in
    # an r5 run (vs_roofline 7.5) — larger spans make the delta robust
    dt = bench_loop(lambda x, b: mm_bf16(x, b).astype(x.dtype), a, b,
                    iters=48, base_iters=8)
    tf = 2 * m * k * n / dt / 1e12
    return {"routine": "mm_bf16", "ms": round(dt * 1e3, 3),
            "metric": "TFLOP/s", "value": round(tf, 1),
            "vs_roofline": round(tf / V5E_BF16_TFLOPS, 4)}


def bench_mm_int8(m: int = 4096, k: int = 4096, n: int = 4096) -> dict:
    """Native int8 MXU GEMM (W8A8 serving path): bf16 activations are
    per-token-quantized in-step, so the measured time is the FULL
    quantize→int8-matmul→scale-epilogue chain. Roofline = 2× the bf16 MXU
    rate (the MXU's int8 mode; reference analog: fp8 tensor cores at 2×,
    gemm_groupwise_sm100.cuh)."""
    from flashinfer_tpu.ops.gemm import mm_int8, quantize_int8_channels

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w8, w_s = quantize_int8_channels(
        jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32))

    def step(x, w8, w_s):
        y = mm_int8(x, w8, b_scale=w_s)
        return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))

    dt = bench_loop(step, a, w8, w_s, iters=48, base_iters=8)
    tf = 2 * m * k * n / dt / 1e12
    return {"routine": "mm_int8_w8a8", "ms": round(dt * 1e3, 3),
            "metric": "TFLOP/s", "value": round(tf, 1),
            "vs_roofline": round(tf / (2 * V5E_BF16_TFLOPS), 4)}


def bench_mm_fp8_groupwise(m: int = 4096, k: int = 4096, n: int = 4096
                           ) -> dict:
    """FP8 groupwise GEMM (DeepGEMM contract) TFLOP/s."""
    from flashinfer_tpu.ops.gemm import mm_fp8

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32).astype(
        jnp.float8_e4m3fn)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.float32).astype(
        jnp.float8_e4m3fn)
    a_s = jnp.ones((m, k // 128), jnp.float32)
    b_s = jnp.ones((k // 128, n // 128), jnp.float32)

    def step(x, b, a_s, b_s):
        return mm_fp8(x, b, a_s, b_s).astype(jnp.float8_e4m3fn)

    # iters raised 16 -> 48 after the r4 driver recorded a physically
    # impossible 1619 TF/s on this metric (delta-timing jitter at low
    # iter counts; VERDICT r4 weak #4)
    dt = bench_loop(step, a, b, a_s, b_s, iters=48, base_iters=8)
    tf = 2 * m * k * n / dt / 1e12
    return {"routine": "mm_fp8_groupwise", "ms": round(dt * 1e3, 3),
            "metric": "TFLOP/s", "value": round(tf, 1),
            "vs_roofline": round(tf / V5E_BF16_TFLOPS, 4)}


def bench_mm_fp4(m: int = 4096, k: int = 4096, n: int = 4096) -> dict:
    """FP4 (e2m1, NVFP4-style sf_block=16) dequant-fused GEMM TFLOP/s
    vs the bf16 roofline — the evidence row for SURVEY §7's
    dequant-under-matmul claim (reference fp4_gemm_cutlass.h role;
    VERDICT r4 ask #10)."""
    import numpy as np_

    from flashinfer_tpu.ops.gemm_pallas import (
        fp4_mm, pack_fp4_weights_for_gemm,
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    codes = jnp.asarray(rng.integers(0, 16, (k, n)), jnp.uint8)
    packed = pack_fp4_weights_for_gemm(codes)
    b_scale = jnp.asarray(rng.random((k // 16, n)) * 0.1 + 0.01,
                          jnp.float32)

    def step(x, packed, b_scale):
        return fp4_mm(x, packed, b_scale).astype(x.dtype)[:, :k]

    dt = bench_loop(step, a, packed, b_scale, iters=24, base_iters=4)
    tf = 2 * m * k * n / dt / 1e12
    return {"routine": "mm_fp4", "ms": round(dt * 1e3, 3),
            "config": f"{m}x{k}x{n} e2m1 sf16",
            "metric": "TFLOP/s", "value": round(tf, 1),
            "vs_roofline": round(tf / V5E_BF16_TFLOPS, 4)}
