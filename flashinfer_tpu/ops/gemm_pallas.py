"""Pallas TPU kernels: quantized GEMM (FP8 groupwise, FP4 block-scaled).

TPU-native re-design of the reference GEMM family
(flashinfer/gemm/gemm_base.py mm_fp8:4449 / mm_fp4:6751; kernels
include/flashinfer/gemm/{gemm_groupwise_sm100.cuh,fp4_gemm_cutlass.h};
DeepGEMM port flashinfer/deep_gemm.py):

* TPU has no FP8/FP4 MXU inputs — weights/activations are stored quantized
  in HBM (the bandwidth win, which is what matters: these GEMMs are
  memory-bound at inference batch sizes) and **dequantized in-kernel in
  VMEM** right before the bf16 MXU dot, so the dequant hides under the
  matmul pipeline (SURVEY §7 "FP4 on TPU").
* Groupwise scaling contract matches the reference / DeepGEMM: A scales
  per (token × 128-k-group), B scales per (128 × 128 k,n block). The scale
  multiply folds into the per-k-block accumulation.
* FP4 (e2m1) is packed two-per-byte with per-16/32-element scale blocks
  (NVFP4 / MXFP4 equivalents).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env import resolve_interpret
from ..utils import cdiv, round_up

BM, BN, BK = 256, 256, 128  # MXU-aligned macro tiles; BK fixed by scale groups


def _fp8_groupwise_kernel(
    a_ref,  # [BM, BK] fp8
    b_ref,  # [BK, BN] fp8
    a_s_ref,  # [BM, num_k_blocks] f32 (per-row scales, all k-groups)
    b_s_ref,  # [num_k_blocks, BN] f32 (block scales expanded over columns)
    o_ref,  # [BM, BN] out dtype
    acc_ref,  # [BM, BN] f32 scratch
    *,
    num_k_blocks: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[...].astype(jnp.bfloat16)
    b = b_ref[...].astype(jnp.bfloat16)
    partial = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dynamic lane/sublane slicing is illegal in Mosaic — select the k-th
    # scale column/row with a masked reduction (tiny VPU op)
    a_cols = jax.lax.broadcasted_iota(jnp.int32, a_s_ref.shape, 1)
    a_s = jnp.sum(
        jnp.where(a_cols == k, a_s_ref[...], 0.0), axis=1, keepdims=True
    )  # [BM, 1]
    b_rows = jax.lax.broadcasted_iota(jnp.int32, b_s_ref.shape, 0)
    b_s = jnp.sum(
        jnp.where(b_rows == k, b_s_ref[...], 0.0), axis=0, keepdims=True
    )  # [1, BN]
    acc_ref[...] += partial * a_s * b_s

    @pl.when(k == num_k_blocks - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fp8_groupwise_mm(
    a: jax.Array,  # [M, K] fp8
    b: jax.Array,  # [K, N] fp8
    a_scale: jax.Array,  # [M, K//128] f32  (per token per k-group)
    b_scale: jax.Array,  # [K//128, N//128] f32 (per k,n block)
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jax.Array:
    """Groupwise-scaled FP8 GEMM (reference mm_fp8 groupwise path /
    deep_gemm.py). Shapes must be multiples of (BM? no — padded here)."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and k % BK == 0, f"K={k} must be a multiple of {BK}"
    mp, np_ = round_up(m, BM), round_up(n, BN)
    if mp != m:
        a = jnp.pad(a.astype(jnp.float32), ((0, mp - m), (0, 0))).astype(a.dtype)
        a_scale = jnp.pad(a_scale, ((0, mp - m), (0, 0)))
    if np_ != n:
        b = jnp.pad(b.astype(jnp.float32), ((0, 0), (0, np_ - n))).astype(b.dtype)
        b_scale = jnp.pad(b_scale, ((0, 0), (0, np_ // 128 - b_scale.shape[1])))
    nkb = k // BK

    # expand b_scale [K/128, N/128] to per-(kblock, column) [K/128, N] so the
    # kernel reads a (1, BN) lane-aligned row — cheap (small array).
    b_scale_cols = jnp.repeat(b_scale, 128, axis=1)[:, :np_]

    grid = (mp // BM, np_ // BN, nkb)
    out = pl.pallas_call(
        functools.partial(_fp8_groupwise_kernel, num_k_blocks=nkb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((BK, BN), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((BM, nkb), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((nkb, BN), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        interpret=resolve_interpret(interpret),
    )(a, b, a_scale.astype(jnp.float32), b_scale_cols.astype(jnp.float32))
    return out[:m, :n]


def _fp8_fused_kernel(
    a_ref,  # [BM2, K] fp8
    as_ref,  # [BM2, K//128] f32
    b_ref,  # [K, BN2] fp8
    bs_ref,  # [K//128, BN2] f32 (block scales pre-expanded over columns)
    o_ref,  # [BM2, BN2]
    *,
    k_groups: int,
):
    bm, k = a_ref.shape
    bn = b_ref.shape[1]
    # Per-group K=128 dots with the f32 scales applied to the f32 partial
    # accumulator (the reference's accumulator-side scaling,
    # gemm_groupwise_sm100.cuh). No reshapes: splitting the lane/sublane
    # dims of a VMEM tile forces a Mosaic relayout (measured r5: the
    # reshape-based variant ran at 19.7 TF/s — 9x slower than this).
    a_s = as_ref[...]  # (bm, kg) f32
    acc = jnp.zeros((bm, bn), jnp.float32)
    for g in range(k_groups):
        a_g = a_ref[:, g * 128:(g + 1) * 128].astype(jnp.bfloat16)
        b_g = b_ref[g * 128:(g + 1) * 128, :].astype(jnp.bfloat16)
        p = jax.lax.dot_general(
            a_g, b_g, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + p * a_s[:, g:g + 1] * bs_ref[g:g + 1, :]
    o_ref[...] = acc.astype(o_ref.dtype)


BM2, BN2 = 512, 256  # large-tile fused path: K stays whole per tile


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fp8_groupwise_mm_fused(
    a: jax.Array,  # [M, K] fp8
    b: jax.Array,  # [K, N] fp8
    a_scale: jax.Array,  # [M, K//128] f32
    b_scale: jax.Array,  # [K//128, N//128] f32
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jax.Array:
    """Large-shape groupwise FP8 GEMM with in-VMEM dequant fused under
    the MXU pipeline (reference deep_gemm.py / gemm_groupwise_sm100.cuh
    role).

    Why this beats the XLA dequant-then-dot route: XLA materializes both
    bf16 dequanted operands in HBM (write+re-read of ~2x operand bytes —
    measured r5: cast-only dot 155 TF/s vs pure-bf16 188 TF/s at 4096^3,
    scales pushing it to 110-126). Here dequant happens on VMEM tiles as
    they stream, so HBM sees only the fp8 bytes. Requires K % 128 == 0;
    M/N are padded to the (512, 256) macro tile.
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and k % 128 == 0, f"K={k} must be a multiple of 128"
    kg = k // 128
    mp, np_ = round_up(m, BM2), round_up(n, BN2)
    if mp != m:
        a = jnp.pad(a.astype(jnp.float32), ((0, mp - m), (0, 0))).astype(
            a.dtype)
        a_scale = jnp.pad(a_scale, ((0, mp - m), (0, 0)))
    if np_ != n:
        b = jnp.pad(b.astype(jnp.float32), ((0, 0), (0, np_ - n))).astype(
            b.dtype)
        b_scale = jnp.pad(
            b_scale, ((0, 0), (0, np_ // 128 - b_scale.shape[1])))
    b_scale_cols = jnp.repeat(b_scale.astype(jnp.float32), 128, axis=1)
    grid = (mp // BM2, np_ // BN2)
    out = pl.pallas_call(
        functools.partial(_fp8_fused_kernel, k_groups=kg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM2, k), lambda i, j: (i, 0)),
            pl.BlockSpec((BM2, kg), lambda i, j: (i, 0)),
            pl.BlockSpec((k, BN2), lambda i, j: (0, j)),
            pl.BlockSpec((kg, BN2), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((BM2, BN2), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
        interpret=resolve_interpret(interpret),
    )(a, a_scale.astype(jnp.float32), b, b_scale_cols)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# FP4 (e2m1) dequant + GEMM
# ---------------------------------------------------------------------------


def e2m1_decode(nibbles: jax.Array) -> jax.Array:
    """Decode e2m1 4-bit codes (int) to float32 values.

    Layout: bit3 = sign, bits2-1 = exponent, bit0 = mantissa.
    Magnitudes: 0, .5, 1, 1.5, 2, 3, 4, 6 (reference FP4 contract,
    csrc/fp4_kv_quantization.cu semantics).
    """
    # branchless f32 BIT CONSTRUCTION (r5): magnitudes [0, .5, 1, 1.5, 2,
    # 3, 4, 6] map to exponent 126 + (m3 >> 1) with one mantissa bit —
    # pure int ops + one bitcast instead of the exp2 transcendental +
    # select chain (the r4 form dominated the fp4 GEMM at ~26 TF/s)
    n = nibbles.astype(jnp.int32)
    m3 = n & 7
    sign = (n & 8) << 28  # bit 31
    e32 = jnp.where(m3 >= 1, 126 + (m3 >> 1), 0)
    mant = jnp.where(m3 >= 2, (m3 & 1) << 22, 0)
    bits = sign | (e32 << 23) | mant
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _fp4_mm_kernel(
    a_ref,  # [BM, BK] bf16 activation
    bq_ref,  # [BK, BN // 2] uint8 packed weights (planar-in-tile layout)
    bs_ref,  # [BK // sf_block, BN] f32 weight scales
    o_ref,  # [BM, BN]
    acc_ref,  # [BM, BN] f32
    *,
    num_k_blocks: int,
    sf_block: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = bq_ref[...].astype(jnp.int32)  # [BK, BN//2]; i8 shifts don't
    lo = packed & 0xF  # legalize on Mosaic, so widen before bit ops
    hi = (packed >> 4) & 0xF
    # planar-in-tile layout (see pack_fp4_weights_for_gemm): within each
    # BN-wide tile, byte column j holds output columns j (lo nibble) and
    # j + BN/2 (hi nibble) — a lane concat, which Mosaic handles natively
    # (an interleaved layout would need an unsupported shape cast).
    b = jnp.concatenate([e2m1_decode(lo), e2m1_decode(hi)], axis=1)  # [BK, BN]
    # expand per-sf_block scales along K with a 0/1 expansion matmul
    # (in-kernel sublane reshape/repeat is unsupported; this is a tiny MXU
    # op). bs_ref holds ALL k-groups [K//sf, BN]; select this block's rows
    # by global row index in the expansion matrix.
    rows = jax.lax.broadcasted_iota(jnp.int32, (packed.shape[0], bs_ref.shape[0]), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (packed.shape[0], bs_ref.shape[0]), 1)
    rows_global = k * packed.shape[0] + rows
    expand = (rows_global // sf_block == cols).astype(jnp.float32)  # [BK, K//sf]
    scale_full = jax.lax.dot_general(
        expand, bs_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BK, BN]
    b = b * scale_full
    partial = jax.lax.dot_general(
        a_ref[...].astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += partial

    @pl.when(k == num_k_blocks - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pack_fp4_weights_for_gemm(codes: jax.Array) -> jax.Array:
    """Pre-shuffle e2m1 nibble codes [K, N] into the fp4_mm kernel layout.

    TPU analog of the reference's pre-shuffled weight layouts
    (trtllm_low_latency_gemm / nvfp4 swizzled scale factors): within each
    BN-wide column tile, byte column j packs output columns j (low nibble)
    and j + BN/2 (high nibble), so the in-kernel unpack is a plain lane
    concat. N must be a multiple of BN (pad first).
    """
    k, n = codes.shape
    assert n % BN == 0, f"N={n} must be a multiple of {BN} (pad first)"
    tiles = codes.reshape(k, n // BN, BN)
    lo = tiles[..., : BN // 2]
    hi = tiles[..., BN // 2 :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)  # [K, n//BN, BN//2]
    return packed.reshape(k, n // 2)


@functools.partial(
    jax.jit, static_argnames=("sf_block", "out_dtype", "interpret")
)
def fp4_mm(
    a: jax.Array,  # [M, K] bf16/f32 activation
    b_packed: jax.Array,  # [K, N // 2] uint8 (pack_fp4_weights_for_gemm layout)
    b_scale: jax.Array,  # [K // sf_block, N] f32 per-block weight scales
    sf_block: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jax.Array:
    """FP4 weight × bf16 activation GEMM with fused in-kernel dequant
    (reference mm_fp4 gemm_base.py:6751; NVFP4 sf_block=16 / MXFP4=32).

    Note the scale layout here is [K // sf_block, N]: scale blocks run
    along K (weights are quantized along the contraction dim), transposed
    from the reference's row-major weight layout because TPU wants B as
    [K, N] for the MXU. Weights must be packed with
    :func:`pack_fp4_weights_for_gemm`.
    """
    m, k = a.shape
    k2, n_half = b_packed.shape
    n = n_half * 2
    assert k == k2 and k % BK == 0 and BK % sf_block == 0
    assert n % BN == 0, f"N={n} must be a multiple of {BN} (pad before packing)"
    mp, np_ = round_up(m, BM), n
    if mp != m:
        a = jnp.pad(a, ((0, mp - m), (0, 0)))
    nkb = k // BK

    grid = (mp // BM, np_ // BN, nkb)
    out = pl.pallas_call(
        functools.partial(
            _fp4_mm_kernel, num_k_blocks=nkb, sf_block=sf_block
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((BK, BN // 2), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((k // sf_block, BN), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        interpret=resolve_interpret(interpret),
    )(a, b_packed, b_scale.astype(jnp.float32))
    return out[:m, :n]
