"""Quantization ops: FP4 (NVFP4/MXFP4-equivalent), FP8, packbits.

Capability parity with reference flashinfer/quantization/
(fp4_quantization.py, fp8_quantization.py, packbits.py; kernels
csrc/fp4_kv_quantization.cu:280, include/flashinfer/quantization.cuh:120).

TPU re-design: quantize/dequantize are elementwise + small reductions —
jnp under jit (XLA fuses into producers). The GEMM-side dequant is fused
in-kernel (gemm_pallas.py). FP4 values are packed two-e2m1-per-byte along
the last dim; scale blocks: NVFP4 = 16 elements with fp8-e4m3 scales +
global f32 scale, MXFP4 = 32 elements with power-of-two (e8m0) scales.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import FP8_E4M3_MAX, FP8_E5M2_MAX, FP4_E2M1_MAX
from .gemm_pallas import e2m1_decode


def e2m1_encode(x: jax.Array) -> jax.Array:
    """Round float values to nearest e2m1 code (uint8 in [0, 15]).

    Ties round to even mantissa (matching hardware convert behavior).
    """
    xf = x.astype(jnp.float32)
    sign = (xf < 0).astype(jnp.uint8) << 3
    a = jnp.abs(xf)
    # thresholds at midpoints between magnitudes {0,.5,1,1.5,2,3,4,6};
    # round-half-to-even: 0.25->0, 0.75->1.0(code2), 1.25->1.0, 1.75->2,
    # 2.5->2, 3.5->4, 5->4
    code = jnp.zeros(a.shape, jnp.uint8)
    bounds = [
        (0.25, 1),  # 0.5
        (0.75, 2),  # 1.0
        (1.25, 3),  # 1.5
        (1.75, 4),  # 2.0
        (2.5, 5),  # 3.0
        (3.5, 6),  # 4.0
        (5.0, 7),  # 6.0
    ]
    # half-to-even adjustments on exact midpoints
    for thresh, c in bounds:
        code = jnp.where(a > thresh, jnp.uint8(c), code)
    # exact midpoints → even codes
    mids_even = [(0.25, 0), (0.75, 2), (1.25, 2), (1.75, 4), (2.5, 4), (3.5, 6), (5.0, 6)]
    for mid, c in mids_even:
        code = jnp.where(a == mid, jnp.uint8(c), code)
    return sign | code


def pack_e2m1(codes: jax.Array) -> jax.Array:
    """Pack uint8 nibble codes [..., N] → bytes [..., N//2] (even index in
    low nibble)."""
    lo = codes[..., 0::2]
    hi = codes[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)



def fp4_quantize(
    x: jax.Array,  # [..., K] with K % (2*sf_block) == 0
    global_scale: jax.Array | None = None,  # scalar f32 (NVFP4 two-level)
    sf_vec_size: int = 16,
    sf_use_ue8m0: bool = False,  # True → MXFP4 power-of-two scales
    is_sf_swizzled_layout: bool = True,  # accepted; TPU uses linear layout
) -> tuple[jax.Array, jax.Array]:
    """Quantize to packed e2m1 + per-block scales (reference
    fp4_quantization.py fp4_quantize).

    Returns (packed uint8 [..., K//2], scales [..., K//sf_vec_size]).
    NVFP4: scales stored as fp8-e4m3 of (amax/6/global_scale);
    MXFP4 (sf_use_ue8m0): scales are exact powers of two, stored f32.
    """
    del is_sf_swizzled_layout
    k = x.shape[-1]
    assert k % sf_vec_size == 0 and k % 2 == 0
    xf = x.astype(jnp.float32)
    blocks = xf.reshape(*x.shape[:-1], k // sf_vec_size, sf_vec_size)
    amax = jnp.max(jnp.abs(blocks), axis=-1)
    if global_scale is None:
        global_scale = jnp.float32(1.0)
    if sf_use_ue8m0:
        scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30) / FP4_E2M1_MAX)))
        scale_stored = scale
    else:
        raw = amax / FP4_E2M1_MAX / global_scale
        scale_q = jnp.clip(raw, 1e-4 / 448.0, FP8_E4M3_MAX).astype(jnp.float8_e4m3fn)
        scale_stored = scale_q
        scale = scale_q.astype(jnp.float32) * global_scale
    scaled = blocks / jnp.maximum(scale[..., None], 1e-30)
    codes = e2m1_encode(jnp.clip(scaled, -FP4_E2M1_MAX, FP4_E2M1_MAX))
    packed = pack_e2m1(codes.reshape(*x.shape[:-1], k))
    return packed, scale_stored


def _e2m1_to_f32(codes: jax.Array) -> jax.Array:
    """Branchless e2m1 code -> f32 via bit construction (magnitudes
    [0, .5, 1, 1.5, 2, 3, 4, 6] = exponent 126 + (m>>1), one mantissa
    bit) — int ops + one bitcast, no f32 select chains."""
    n = codes.astype(jnp.int32)
    m3 = n & 7
    sign = (n & 8) << 28
    e32 = jnp.where(m3 >= 1, 126 + (m3 >> 1), 0)
    mant = jnp.where(m3 >= 2, (m3 & 1) << 22, 0)
    return jax.lax.bitcast_convert_type(sign | (e32 << 23) | mant,
                                        jnp.float32)


def fp4_dequantize(
    packed: jax.Array,
    scales: jax.Array,
    global_scale: jax.Array | None = None,
    sf_vec_size: int = 16,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Dequantize packed e2m1 (reference fp4_dequantize / mxfp4_dequantize).

    Memory-lean form (r5): the original unpack-to-int32-stack +
    f32-select decode materialized ~64x the packed bytes in
    intermediates and OOM'd a 16 GB chip dequantizing a 0.25 GB
    KV cache; this path decodes nibble planes straight to scaled
    values and interleaves once at the output width.
    """
    k = packed.shape[-1] * 2
    sf = scales.astype(jnp.float32)
    if global_scale is not None:
        sf = sf * global_scale
    # per-element scale for the nibble planes: scale block i covers
    # output columns [i*sf, (i+1)*sf) = packed columns [i*sf/2, ...) —
    # both planes of a packed column share its block scale
    sf_half = jnp.repeat(sf, sf_vec_size // 2, axis=-1)  # [..., K//2]
    lo = (_e2m1_to_f32(packed & 0xF) * sf_half).astype(jnp.bfloat16)
    hi = (_e2m1_to_f32(packed >> 4) * sf_half).astype(jnp.bfloat16)
    # interleave [lo0, hi0, lo1, hi1, ...] WITHOUT a trailing dim of 2:
    # a [..., K//2, 2] intermediate tile-pads 64x on TPU (measured: a
    # 0.25 GB cache dequant allocated 16 GB) — instead pack each bf16
    # pair into one u32 and bitcast, which is physically the
    # interleaved row
    lo16 = jax.lax.bitcast_convert_type(lo, jnp.uint16).astype(jnp.uint32)
    hi16 = jax.lax.bitcast_convert_type(hi, jnp.uint16).astype(jnp.uint32)
    u32 = (hi16 << 16) | lo16
    out = jax.lax.bitcast_convert_type(u32, jnp.bfloat16).reshape(
        *packed.shape[:-1], k)
    return out if dtype == jnp.bfloat16 else out.astype(dtype)


def mxfp4_quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """MXFP4: 32-element blocks, power-of-two scales (reference
    fp4_quantization.py mxfp4_quantize)."""
    return fp4_quantize(x, sf_vec_size=32, sf_use_ue8m0=True)


def mxfp4_dequantize(packed: jax.Array, scales: jax.Array, dtype=jnp.bfloat16):
    return fp4_dequantize(packed, scales, sf_vec_size=32, dtype=dtype)


def nvfp4_quantize(x, global_scale=None, sf_vec_size=16):
    return fp4_quantize(x, global_scale, sf_vec_size)


def fp8_quantize(
    x: jax.Array,
    scale: jax.Array | None = None,  # precomputed scale; else per-tensor amax
    dtype=jnp.float8_e4m3fn,
) -> tuple[jax.Array, jax.Array]:
    """Per-tensor FP8 quantize; returns (values, scale) with
    x ≈ values * scale."""
    fp8_max = FP8_E4M3_MAX if dtype == jnp.float8_e4m3fn else FP8_E5M2_MAX
    xf = x.astype(jnp.float32)
    if scale is None:
        scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / fp8_max
    return (xf / scale).astype(dtype), jnp.asarray(scale, jnp.float32)


def mxfp8_quantize(
    x: jax.Array, block_size: int = 32, dtype=jnp.float8_e4m3fn
) -> tuple[jax.Array, jax.Array]:
    """Per-32-block FP8 with power-of-two scales (reference
    fp8_quantization.py mxfp8_quantize)."""
    k = x.shape[-1]
    assert k % block_size == 0
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], k // block_size, block_size)
    fp8_max = FP8_E4M3_MAX if dtype == jnp.float8_e4m3fn else FP8_E5M2_MAX
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30) / fp8_max)))
    q = (xf / scale[..., None]).astype(dtype).reshape(x.shape)
    return q, scale


def mxfp8_dequantize(q: jax.Array, scale: jax.Array, block_size: int = 32,
                     dtype=jnp.bfloat16) -> jax.Array:
    k = q.shape[-1]
    v = q.astype(jnp.float32).reshape(*q.shape[:-1], k // block_size, block_size)
    return (v * scale[..., None]).reshape(q.shape).astype(dtype)


def groupwise_scaled_quantize(
    x: jax.Array, group_size: int = 128, dtype=jnp.float8_e4m3fn
) -> tuple[jax.Array, jax.Array]:
    """Per-token per-128-group FP8 quantize — the activation-side layout of
    the groupwise FP8 GEMM (reference mm_fp8 / deep_gemm per-token-group
    scaling). Returns (q [..., K], scales [..., K//group])."""
    k = x.shape[-1]
    assert k % group_size == 0
    fp8_max = FP8_E4M3_MAX if dtype == jnp.float8_e4m3fn else FP8_E5M2_MAX
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], k // group_size, group_size)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / fp8_max
    q = (xf / scale[..., None]).astype(dtype).reshape(x.shape)
    return q, scale


def blockwise_scaled_quantize(
    w: jax.Array, block: int = 128, dtype=jnp.float8_e4m3fn
) -> tuple[jax.Array, jax.Array]:
    """Per-128x128-block FP8 quantize — the weight-side layout of groupwise
    FP8 GEMM. w: [K, N] → (q [K, N], scales [K//block, N//block])."""
    k, n = w.shape
    assert k % block == 0 and n % block == 0
    fp8_max = FP8_E4M3_MAX if dtype == jnp.float8_e4m3fn else FP8_E5M2_MAX
    wf = w.astype(jnp.float32).reshape(k // block, block, n // block, block)
    amax = jnp.max(jnp.abs(wf), axis=(1, 3))
    scale = jnp.maximum(amax, 1e-12) / fp8_max
    q = (wf / scale[:, None, :, None]).astype(dtype).reshape(k, n)
    return q, scale


class SfLayout(enum.Enum):
    """FP4 scale-factor layouts (reference SfLayout enum): the reference
    distinguishes 128x4 / 8x4 swizzles vs linear; TPU consumes linear."""

    layout_128x4 = 0
    layout_8x4 = 1
    layout_linear = 2


def e2m1_and_ufp8sf_scale_to_float(
    packed: jax.Array, scales: jax.Array, global_scale=None,
    sf_vec_size: int = 16, dtype=jnp.float32,
) -> jax.Array:
    """Host-side FP4 dequant (reference e2m1_and_ufp8sf_scale_to_float):
    packed e2m1 codes x fp8-e4m3 scale factors (x optional global scale)."""
    out = fp4_dequantize(packed, scales, sf_vec_size=sf_vec_size, dtype=dtype)
    if global_scale is not None:
        out = (out.astype(jnp.float32) * global_scale).astype(dtype)
    return out


def block_scale_interleave(unswizzled_sf: jax.Array) -> jax.Array:
    """Scale-factor layout shuffle (reference fp4_quantization.py:1155).

    The reference swizzles FP4 block scales into the 128x4 tile layout the
    SM100 tensor cores consume. TPU kernels read scales through lane-tiled
    VMEM blocks, so the natural (linear) layout IS the fast layout — this
    is the identity, kept so checkpoints/callers round-trip unchanged.
    """
    return unswizzled_sf


nvfp4_block_scale_interleave = block_scale_interleave


def shuffle_matrix_a(input_tensor: jax.Array, epilogue_tile_m: int
                     ) -> jax.Array:
    """Weight pre-shuffle for trtllm low-latency GEMM (reference
    fp4_quantization.py:1273). TPU MXU consumes the natural row-major
    layout — identity (no shuffled-weight kernel exists to feed)."""
    del epilogue_tile_m
    return input_tensor


def shuffle_matrix_sf_a(input_tensor: jax.Array, epilogue_tile_m: int,
                        num_elts_per_sf: int = 16) -> jax.Array:
    """Scale-factor companion of :func:`shuffle_matrix_a` — identity on
    TPU (reference fp4_quantization.py:1295)."""
    del epilogue_tile_m, num_elts_per_sf
    return input_tensor


def scaled_fp4_grouped_quantize(
    x: jax.Array,  # [T, K] grouped rows
    group_sizes: jax.Array,  # [G]
    global_scale: jax.Array | None = None,
    sf_vec_size: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Grouped NVFP4 quantization (reference fp4_quantization.py:1894):
    per-16-element-block scales within each group's rows."""
    del group_sizes  # row-blocked scales are group-agnostic on TPU
    return fp4_quantize(x, global_scale=global_scale, sf_vec_size=sf_vec_size)


def packbits(x: jax.Array, bitorder: str = "big") -> jax.Array:
    """Pack a bool vector into bytes (reference quantization/packbits.py;
    kernel quantization.cuh:120)."""
    x = x.astype(jnp.uint8).reshape(-1)
    n = x.shape[0]
    pad = (-n) % 8
    x = jnp.pad(x, (0, pad))
    bits = x.reshape(-1, 8)
    if bitorder == "big":
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    else:
        weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


def segment_packbits(
    x: jax.Array, indptr: jax.Array, bitorder: str = "big"
) -> tuple[jax.Array, jax.Array]:
    """Pack a ragged bool array segment-wise, each segment padded to byte
    alignment (reference quantization/packbits.py segment_packbits).
    indptr must be host-available (shapes depend on it)."""
    indptr_h = np.asarray(indptr)
    batch = len(indptr_h) - 1
    out_indptr = np.zeros(batch + 1, np.int32)
    segs = []
    for b in range(batch):
        seg = x[int(indptr_h[b]) : int(indptr_h[b + 1])]
        segs.append(packbits(seg, bitorder))
        out_indptr[b + 1] = out_indptr[b] + segs[-1].shape[0]
    return jnp.concatenate(segs) if segs else jnp.zeros(0, jnp.uint8), jnp.asarray(
        out_indptr
    )


# re-export the GEMM weight pre-pack (lives with the kernel that defines it)
from .gemm_pallas import pack_fp4_weights_for_gemm  # noqa: F401,E402
