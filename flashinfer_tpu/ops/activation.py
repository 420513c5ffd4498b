"""Gated-MLP activation fusions.

Capability parity with reference flashinfer/activation.py:248 (kernels
include/flashinfer/activation.cuh:29): silu_and_mul, gelu_and_mul,
gelu_tanh_and_mul, plus quantizing fused variants. Input convention matches
the reference: ``x = [..., 2 * hidden]`` where ``x[..., :hidden]`` is the
gate branch and ``x[..., hidden:]`` is the up branch; output ``act(gate) * up``.

TPU re-design: pure jnp — XLA fuses these into the adjacent GEMMs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    d = x.shape[-1] // 2
    return x[..., :d].astype(jnp.float32), x[..., d:].astype(jnp.float32)


def silu_and_mul(
    x: jax.Array, out: jax.Array | None = None, enable_pdl: bool | None = None
) -> jax.Array:
    del out, enable_pdl
    gate, up = _split(x)
    return (gate * jax.nn.sigmoid(gate) * up).astype(x.dtype)


def gelu_and_mul(
    x: jax.Array, out: jax.Array | None = None, enable_pdl: bool | None = None
) -> jax.Array:
    del out, enable_pdl
    gate, up = _split(x)
    return (jax.nn.gelu(gate, approximate=False) * up).astype(x.dtype)


def gelu_tanh_and_mul(
    x: jax.Array, out: jax.Array | None = None, enable_pdl: bool | None = None
) -> jax.Array:
    del out, enable_pdl
    gate, up = _split(x)
    return (jax.nn.gelu(gate, approximate=True) * up).astype(x.dtype)


def silu_and_mul_fp8_quant(
    x: jax.Array, quant_dtype=jnp.float8_e4m3fn
) -> tuple[jax.Array, jax.Array]:
    """silu_and_mul fused with per-token FP8 quantization (reference
    fused act-quant variants). Returns (values fp8, scale [..., 1] f32)."""
    gate, up = _split(x)
    y = gate * jax.nn.sigmoid(gate) * up
    fp8_max = 448.0 if quant_dtype == jnp.float8_e4m3fn else 57344.0
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / fp8_max
    return (y / scale).astype(quant_dtype), scale
