"""GEMM public API: bf16/fp8/fp4 matmuls, batched + grouped/segment GEMM.

Capability parity with reference flashinfer/gemm/gemm_base.py
(mm_bf16:597, bmm_bf16:878, mm_fp8:4449, mm_fp4:6751), grouped_mm/core.py,
and SegmentGEMMWrapper. Backend dispatch (reference `backend_requirement`
utils.py:1164) reduces to: XLA dot for bf16 (MXU-optimal as-is), Pallas
fused-dequant kernels for quantized paths, lax.ragged_dot for grouped bf16.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import backend_requirement
from .gemm_pallas import fp4_mm, fp8_groupwise_mm


def mm_bf16(
    a: jax.Array, b: jax.Array, out: Any = None, out_dtype=jnp.bfloat16
) -> jax.Array:
    """bf16 GEMM (reference gemm_base.py:597). XLA already emits the
    optimal MXU loop; no custom kernel needed."""
    del out
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def bmm_bf16(
    a: jax.Array, b: jax.Array, out: Any = None, out_dtype=jnp.bfloat16
) -> jax.Array:
    """Batched bf16 GEMM (reference gemm_base.py:878)."""
    del out
    return jnp.einsum(
        "bmk,bkn->bmn", a, b, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def quantize_int8_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-token (per-row) symmetric int8 quantization.

    Returns ``(x_int8 [M, K], scale_f32 [M, 1])`` with
    ``x ≈ x_int8 * scale``. This is the activation side of the W8A8
    serving path (reference analog: per-token fp8 activation scales,
    gemm_base.py mm_fp8 per-token a_scale); on TPU int8 is the native
    MXU low-precision input so activations quantize to int8 instead."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.round(xf / scale).astype(jnp.int8)
    return x8, scale


def mm_int8(
    a: jax.Array,  # [M, K] int8 (or bf16/f32 → quantized per-token here)
    b: jax.Array,  # [K, N] int8
    a_scale: jax.Array | None = None,  # [M, 1] | scalar (required if a int8)
    b_scale: jax.Array | None = None,  # [N] | [1, N] | scalar
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Native int8 MXU GEMM: ``dot_general(int8, int8) → int32`` with an
    f32 scale epilogue — the TPU's answer to the reference's fp8
    tensor-core GEMM (gemm_groupwise_sm100.cuh role; 2× the bf16 MXU
    rate, measured 352 TF/s vs 178 TF/s bf16 incl. dynamic activation
    quant on the same chip).

    Float ``a`` is quantized per-token on the fly (the XLA fusion keeps
    the whole quantize→matmul→scale chain at ~2× bf16). Per-channel
    ``b_scale`` and per-token ``a_scale`` fold exactly into the epilogue:
    ``out[m,n] = acc_i32[m,n] · a_scale[m] · b_scale[n]``."""
    if a.dtype != jnp.int8:
        if a_scale is not None:
            raise ValueError("a_scale only valid with pre-quantized int8 a")
        a, a_scale = quantize_int8_rows(a)
    elif a_scale is None and b_scale is not None:
        # ADVICE r3: a half-scaled product (weight scale without the
        # activation scale) is silently off by ~127/amax per row. Raw
        # unscaled int8 x int8 (both scales None) stays legal — it is the
        # exact-int32-accumulation mode the tests pin down.
        raise ValueError("a_scale is required when a is pre-quantized int8 "
                         "and b_scale is provided")
    acc = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32)
    if a_scale is not None:
        out = out * jnp.asarray(a_scale, jnp.float32).reshape(-1, 1)
    if b_scale is not None:
        b_scale = jnp.asarray(b_scale, jnp.float32)
        out = out * (b_scale if b_scale.ndim == 0 else b_scale.reshape(1, -1))
    return out.astype(out_dtype)


def quantize_int8_channels(
    w: jax.Array, axis: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 weight quantization (reduce over
    ``axis``). Returns ``(w_int8, scale_f32[..., N])`` for mm_int8's
    b/b_scale slots."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(wf / scale).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=axis)


def mm_fp8(
    a: jax.Array,  # [M, K] fp8
    b: jax.Array,  # [K, N] fp8
    a_scale: jax.Array,  # scalar | [M, 1] | [M, K//128]
    b_scale: jax.Array,  # scalar | [K//128, N//128]
    out: Any = None,
    out_dtype=jnp.bfloat16,
    backend: str = "auto",
) -> jax.Array:
    """FP8 GEMM with per-tensor or groupwise scales (reference
    gemm_base.py:4449). Groupwise = DeepGEMM contract: a_scale per
    (token, 128-k-group), b_scale per (128,128) block."""
    del out
    a_scale = jnp.asarray(a_scale, jnp.float32)
    b_scale = jnp.asarray(b_scale, jnp.float32)
    groupwise = a_scale.ndim == 2 and a_scale.shape[-1] == a.shape[1] // 128
    if groupwise and b_scale.ndim == 2:
        if backend == "pallas_fused":
            # experimental fused-dequant kernel: measured NEGATIVE on v5e
            # (Mosaic lowers the e4m3->bf16 convert in software at ~24
            # TF/s end-to-end vs 126 here — see docs/design.md "fp8 GEMM
            # story r5"); kept reachable for future chips with fast
            # fp8 converts
            from .gemm_pallas import fp8_groupwise_mm_fused

            return fp8_groupwise_mm_fused(a, b, a_scale, b_scale,
                                          out_dtype=out_dtype)
        # dequant-then-dot with f32 scale math (the DeepGEMM precision
        # contract) and a MULTI-DIM dot_general so the dequanted operands
        # keep their (m, kg, 128) grouped view — no reshape-back pass.
        # r5 measured at 4096^3: this 137.9 TF/s vs 109.6 for the
        # reshape-back route and 125.6 for bf16-scale math (which breaks
        # the f32 contract); pure bf16 dot ceiling 188 on the same draw.
        # The serving-grade quantized GEMM on v5e remains mm_int8
        # (native 2x-rate MXU, 0.85-0.87 of its roofline).
        m, k = a.shape
        n = b.shape[1]
        kg = k // 128
        a3 = (
            a.astype(jnp.float32).reshape(m, kg, 128) * a_scale[..., None]
        ).astype(jnp.bfloat16)
        b3 = (
            b.astype(jnp.float32).reshape(kg, 128, n // 128, 128)
            * b_scale[:, None, :, None]
        ).astype(jnp.bfloat16).reshape(kg, 128, n)
        return jax.lax.dot_general(
            a3, b3, dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
    # per-tensor / per-token fast path: scale folds outside the dot
    out_f = jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if a_scale.ndim == 0:
        out_f = out_f * a_scale
    else:
        out_f = out_f * a_scale.reshape(-1, 1)
    out_f = out_f * b_scale.reshape(1, -1) if b_scale.ndim == 1 else out_f * b_scale
    return out_f.astype(out_dtype)


def bmm_fp8(
    A: jax.Array,  # [B, M, K] fp8
    B: jax.Array,  # [B, K, N] fp8
    A_scale: jax.Array,  # scalar or [B]
    B_scale: jax.Array,
    dtype=jnp.bfloat16,
    out: Any = None,
    backend: str = "auto",
) -> jax.Array:
    """Batched FP8 GEMM with per-tensor scales (reference gemm_base.py
    bmm_fp8)."""
    del out, backend
    of = jnp.einsum(
        "bmk,bkn->bmn", A.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    a_s = jnp.asarray(A_scale, jnp.float32).reshape(-1, 1, 1)
    b_s = jnp.asarray(B_scale, jnp.float32).reshape(-1, 1, 1)
    return (of * a_s * b_s).astype(dtype)


def mm_fp4(
    a: jax.Array,  # [M, K] bf16 activation (or fp4-packed for w4a4 later)
    b_packed: jax.Array,  # [K, N//2] uint8 packed e2m1
    b_scale: jax.Array,  # [K//sf_block, N]
    sf_block: int = 16,
    out_dtype=jnp.bfloat16,
    backend: str = "auto",
) -> jax.Array:
    """FP4-weight GEMM with fused dequant (reference gemm_base.py:6751)."""
    del backend
    return fp4_mm(a, b_packed, b_scale, sf_block=sf_block, out_dtype=out_dtype)


def grouped_mm_bf16(
    x: jax.Array,  # [total_tokens, K] ragged by group
    weights: jax.Array,  # [num_groups, K, N]
    group_sizes: jax.Array,  # [num_groups] i32
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Grouped (segment) GEMM: tokens of group g hit weights[g]
    (reference grouped_mm/core.py:81; group_gemm.cuh:47).

    XLA's ragged_dot lowers to the native TPU grouped-matmul path."""
    return jax.lax.ragged_dot(
        x, weights, group_sizes.astype(jnp.int32),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def grouped_mm_fp8(
    x: jax.Array,  # [T, K] fp8 (or bf16)
    x_scale: jax.Array,  # [T, K//128] f32
    weights: jax.Array,  # [G, K, N] fp8
    w_scale: jax.Array,  # [G, K//128, N//128] f32
    group_sizes: jax.Array,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Groupwise-scaled FP8 grouped GEMM (reference
    group_gemm_fp8_groupwise_sm100.cuh). v1: dequantized ragged_dot —
    scales folded into operands (weights dequantized per-block into bf16
    on the fly; XLA fuses the dequant into the gather of each group)."""
    k = x.shape[-1]
    g, _, n = weights.shape
    xf = x.astype(jnp.float32).reshape(-1, k // 128, 128)
    xdq = (xf * x_scale[..., None]).reshape(-1, k).astype(jnp.bfloat16)
    wf = weights.astype(jnp.float32).reshape(g, k // 128, 128, n // 128, 128)
    wdq = (wf * w_scale[:, :, None, :, None]).reshape(g, k, n).astype(jnp.bfloat16)
    return jax.lax.ragged_dot(
        xdq, wdq, group_sizes.astype(jnp.int32),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def grouped_mm_mxfp8(
    x: jax.Array,  # [T, K] mxfp8 (e4m3) or bf16
    x_scale: jax.Array,  # [T, K//32] e8m0-style power-of-two scales (f32 here)
    weights: jax.Array,  # [G, K, N] fp8
    w_scale: jax.Array,  # [G, K//32, N]
    group_sizes: jax.Array,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """MXFP8 (32-element block scaled) grouped GEMM (reference
    grouped_mm/core.py:348)."""
    k = x.shape[-1]
    g, _, n = weights.shape
    xf = x.astype(jnp.float32).reshape(-1, k // 32, 32)
    xdq = (xf * jnp.asarray(x_scale, jnp.float32)[..., None]).reshape(-1, k)
    wf = weights.astype(jnp.float32).reshape(g, k // 32, 32, n)
    wdq = (wf * jnp.asarray(w_scale, jnp.float32)[:, :, None, :]).reshape(g, k, n)
    return jax.lax.ragged_dot(
        xdq.astype(jnp.bfloat16), wdq.astype(jnp.bfloat16),
        group_sizes.astype(jnp.int32), preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def grouped_mm_fp4(
    x: jax.Array,  # [T, K] bf16 activations
    weights_packed: jax.Array,  # [G, K, N//2] uint8 packed e2m1
    w_scale: jax.Array,  # [G, K//sf_block, N]
    group_sizes: jax.Array,
    sf_block: int = 16,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """FP4-weight grouped GEMM (reference grouped_mm/core.py:508;
    group_gemm_mxfp4_groupwise_*). v1: dequant-to-bf16 + ragged_dot (the
    dequant is a gather-free elementwise XLA fuses into the weight read)."""
    from .gemm_pallas import e2m1_decode

    g, k, n_half = weights_packed.shape
    n = n_half * 2
    lo = e2m1_decode(weights_packed & 0xF)
    hi = e2m1_decode(weights_packed >> 4)
    w = jnp.stack([lo, hi], axis=-1).reshape(g, k, n)
    w = w.reshape(g, k // sf_block, sf_block, n) * jnp.asarray(
        w_scale, jnp.float32
    )[:, :, None, :]
    w = w.reshape(g, k, n).astype(jnp.bfloat16)
    return jax.lax.ragged_dot(
        x.astype(jnp.bfloat16), w, group_sizes.astype(jnp.int32),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def mm_mxfp8(
    a: jax.Array,  # [M, K] fp8
    b: jax.Array,  # [K, N] fp8
    a_scale: jax.Array,  # [M, K//32]
    b_scale: jax.Array,  # [K//32, N]
    out_dtype=jnp.bfloat16,
    backend: str = "auto",
    **_ignored,
) -> jax.Array:
    """MXFP8 GEMM (reference gemm_base.py:5380)."""
    del backend
    k = a.shape[-1]
    af = a.astype(jnp.float32).reshape(-1, k // 32, 32)
    adq = (af * jnp.asarray(a_scale, jnp.float32)[..., None]).reshape(-1, k)
    bf = b.astype(jnp.float32).reshape(k // 32, 32, -1)
    bdq = (bf * jnp.asarray(b_scale, jnp.float32)[:, None, :]).reshape(k, -1)
    return jnp.dot(
        adq.astype(jnp.bfloat16), bdq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def bmm_mxfp8(
    A: jax.Array,  # [B, M, K] fp8
    B: jax.Array,  # [B, K, N] fp8
    A_scale: jax.Array,  # [B, M, K//32]
    B_scale: jax.Array,  # [B, K//32, N]
    dtype=jnp.bfloat16,
    out: Any = None,
    backend: str = "auto",
) -> jax.Array:
    """Batched MXFP8 GEMM (reference gemm bmm_mxfp8)."""
    del out, backend
    b, m, k = A.shape
    n = B.shape[-1]
    adq = (A.astype(jnp.float32).reshape(b, m, k // 32, 32)
           * jnp.asarray(A_scale, jnp.float32)[..., None]).reshape(b, m, k)
    bdq = (B.astype(jnp.float32).reshape(b, k // 32, 32, n)
           * jnp.asarray(B_scale, jnp.float32)[:, :, None, :]).reshape(b, k, n)
    return jnp.einsum(
        "bmk,bkn->bmn", adq.astype(jnp.bfloat16), bdq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


class SegmentGEMMWrapper:
    """Segment GEMM for LoRA / per-request experts (reference
    flashinfer SegmentGEMMWrapper, gemm/__init__.py:110).

    run(x, weights, batch_size, weight_column_major, seg_lens | seg_indptr,
    weight_indices) — weight_indices allows many segments to share a weight
    (LoRA batching)."""

    def __init__(self, float_workspace_buffer: Any = None) -> None:
        del float_workspace_buffer

    def run(
        self,
        x: jax.Array,  # [total_tokens, K]
        weights: jax.Array,  # [num_weights, K, N] (or [num_weights, N, K])
        batch_size: int,
        weight_column_major: bool = False,
        seg_lens: jax.Array | None = None,
        seg_indptr: jax.Array | None = None,
        weight_indices: jax.Array | None = None,
        out_dtype=None,
    ) -> jax.Array:
        if weight_column_major:
            weights = jnp.swapaxes(weights, 1, 2)
        if seg_lens is None:
            if seg_indptr is None:
                raise ValueError("need seg_lens or seg_indptr")
            seg_lens = seg_indptr[1:] - seg_indptr[:-1]
        seg_lens = jnp.asarray(seg_lens, jnp.int32)
        if weight_indices is not None:
            weights = weights[jnp.asarray(weight_indices, jnp.int32)]
        out_dtype = out_dtype or x.dtype
        return jax.lax.ragged_dot(
            x, weights, seg_lens, preferred_element_type=jnp.float32
        ).astype(out_dtype)

    forward = run
