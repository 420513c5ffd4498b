"""Normalization ops: RMSNorm family, LayerNorm, fused residual variants.

Capability parity with reference flashinfer/norm/ (5,844 LoC; kernels
include/flashinfer/norm.cuh:63-763): rmsnorm, fused_add_rmsnorm, gemma
variants, layernorm, quantizing variants (fp8 out), fused rmsnorm+silu,
fused qk-rmsnorm-rope.

TPU re-design: norms are reduction+elementwise — jnp under jit lets XLA
fuse them into neighboring matmuls (the same fusion the reference gets by
hand-writing epilogues). All math in f32 with cast-back, matching the
reference's accumulation precision (norm.cuh uses float accumulators).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..api_logging import flashinfer_api
from ..trace import RMSNORM_TRACE


def _rms(x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps)


@flashinfer_api(trace=RMSNORM_TRACE)
def rmsnorm(
    x: jax.Array,  # [..., hidden]
    weight: jax.Array,  # [hidden]
    eps: float = 1e-6,
    out: jax.Array | None = None,  # API parity; ignored (functional)
    enable_pdl: bool | None = None,
) -> jax.Array:
    """RMS normalization: ``x / sqrt(mean(x^2)+eps) * w``
    (reference norm.cuh:63)."""
    del out, enable_pdl
    return (_rms(x, eps) * weight.astype(jnp.float32)).astype(x.dtype)


def fused_add_rmsnorm(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    enable_pdl: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused residual-add + RMSNorm (reference norm.cuh:175).

    Returns ``(normed, new_residual)`` where ``new_residual = x + residual``
    (the reference updates both tensors in place).
    """
    del enable_pdl
    new_residual = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(
        x.dtype
    )
    return rmsnorm(new_residual, weight, eps), new_residual


def gemma_rmsnorm(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    out: jax.Array | None = None,
    enable_pdl: bool | None = None,
) -> jax.Array:
    """Gemma-style RMSNorm with (1 + w) scaling (reference norm.cuh:291)."""
    del out, enable_pdl
    return (_rms(x, eps) * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def gemma_fused_add_rmsnorm(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    enable_pdl: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    del enable_pdl
    new_residual = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(
        x.dtype
    )
    return gemma_rmsnorm(new_residual, weight, eps), new_residual


def layernorm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """LayerNorm (reference norm.cuh:414)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    if beta is not None:
        y = y + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def rmsnorm_fp8_quant(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    quant_dtype=jnp.float8_e4m3fn,
) -> tuple[jax.Array, jax.Array]:
    """RMSNorm fused with per-token FP8 quantization (reference
    norm quantizing variants, include/flashinfer/norm/). Returns
    ``(q_out [..., hidden] fp8, scales [..., 1] f32)``."""
    y = _rms(x, eps) * weight.astype(jnp.float32)
    fp8_max = 448.0 if quant_dtype == jnp.float8_e4m3fn else 57344.0
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / fp8_max
    return (y / scale).astype(quant_dtype), scale


def fused_rmsnorm_silu(
    x: jax.Array,
    gate: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
) -> jax.Array:
    """RMSNorm(x) * silu(gate) (reference csrc/rmsnorm_silu.cu)."""
    y = _rms(x, eps) * weight.astype(jnp.float32)
    g = gate.astype(jnp.float32)
    return (y * (g * jax.nn.sigmoid(g))).astype(x.dtype)


def fused_qk_rmsnorm_rope(
    q: jax.Array,  # [nnz, num_q_heads, head_dim]
    k: jax.Array,  # [nnz, num_k_heads, head_dim]
    q_weight: jax.Array,  # [head_dim]
    k_weight: jax.Array,
    pos_ids: jax.Array,
    eps: float = 1e-6,
    rotary_dim: int | None = None,
    interleave: bool = False,
    rope_scale: float = 1.0,
    rope_theta: float = 1e4,
) -> tuple[jax.Array, jax.Array]:
    """Per-head QK-RMSNorm followed by RoPE (reference
    csrc/fused_qk_rmsnorm_rope; Qwen3-style)."""
    from .rope import apply_rope_pos_ids

    qn = (_rms(q, eps) * q_weight.astype(jnp.float32)).astype(q.dtype)
    kn = (_rms(k, eps) * k_weight.astype(jnp.float32)).astype(k.dtype)
    return apply_rope_pos_ids(
        qn, kn, pos_ids, rotary_dim, interleave, rope_scale, rope_theta
    )


def layernorm_scale_shift(
    x: jax.Array,  # [..., hidden]
    scale: jax.Array,  # [..., hidden] or [hidden] (DiT modulation)
    shift: jax.Array,
    eps: float = 1e-6,
) -> jax.Array:
    """DiT fused LayerNorm(x) * (1 + scale) + shift (reference
    diffusion_ops norm fusions)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)).astype(
        x.dtype
    )
