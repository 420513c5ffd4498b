"""Fused W8A8 MoE expert pipeline in Pallas (native int8 MXU).

Reference analog: csrc/trtllm_fused_moe_runner.cu — the whole value of the
fused-MoE device sequence is that NOTHING between the two grouped GEMMs
touches HBM at full precision. Round-3 phase attribution showed the XLA
version spends ~3x the GEMM time in un-fused glue (epilogue scale, silu,
requantize, finalize): the fix is two Pallas kernels.

  K1 (gmm1+act+requant): for each single-expert m-tile, the int8 gate AND
     up tiles of w13 are dot'ed on the MXU's int8 mode (int32 accumulate),
     the f32 scale epilogue + SiLU + per-row requantization all happen on
     the tile in VMEM, and only int8 rows + one f32 scale per row leave
     the kernel. Whole-I output tiles (tn = I) so the per-row amax is
     exact (not per-subtile).

  K2 (gmm2): int8 x int8 -> int32 with the (row scale x per-channel
     w2_scale) epilogue, bf16 out.

Both kernels reuse the megablox-style single-expert m-tile layout of
ops/gmm.py: rows pre-sorted by expert, padded so each m-tile belongs to
exactly one expert, tile->expert map on scalar prefetch driving the
weight BlockSpecs (auto double-buffered quantized weight streams).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env import resolve_interpret


def _pad_sorted_rows(x_sorted: jax.Array, group_sizes: jax.Array, tm: int):
    """Repack rows so every m-tile is single-expert (shared with
    gmm.py's layout). Returns (x_padded [Tp, K], padded_row [Ts],
    tile_e [MT])."""
    ts, k = x_sorted.shape
    e = group_sizes.shape[0]
    gs = group_sizes.astype(jnp.int32)
    padded = ((gs + tm - 1) // tm) * tm
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)])
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(gs)])
    tp = ((ts + tm - 1) // tm) * tm + e * tm
    mt = tp // tm
    rows = jnp.arange(ts, dtype=jnp.int32)
    e_of_row = jnp.searchsorted(starts[1:], rows, side="right").astype(
        jnp.int32)
    padded_row = offs[e_of_row] + (rows - starts[e_of_row])
    x_padded = jnp.zeros((tp, k), x_sorted.dtype).at[padded_row].set(
        x_sorted)
    tile_starts = jnp.arange(mt, dtype=jnp.int32) * tm
    tile_e = jnp.minimum(
        jnp.searchsorted(offs[1:], tile_starts, side="right").astype(
            jnp.int32),
        e - 1)
    return x_padded, padded_row, tile_e


def _gmm1_act_kernel(
    tile_e_ref,  # scalar prefetch [MT]
    x_ref,  # [TM, K] int8
    xs_ref,  # [TM, 1] f32 per-row activation scale
    wg_ref,  # [1, K, I] int8 (gate half)
    wu_ref,  # [1, K, I] int8 (up half)
    sg_ref,  # [1, 1, 1, I] f32 gate out-channel scales
    su_ref,  # [1, 1, 1, I] f32 up out-channel scales
    o_ref,  # [TM, I] int8 requantized activation rows
    os_ref,  # [TM, 1] f32 per-row output scale
):
    x8 = x_ref[...]
    dims = (((1,), (0,)), ((), ()))
    accg = jax.lax.dot_general(
        x8, wg_ref[0], dims, preferred_element_type=jnp.int32)
    accu = jax.lax.dot_general(
        x8, wu_ref[0], dims, preferred_element_type=jnp.int32)
    xs = xs_ref[...]  # [TM, 1]
    g = accg.astype(jnp.float32) * xs * sg_ref[0, 0, 0][None, :]
    u = accu.astype(jnp.float32) * xs * su_ref[0, 0, 0][None, :]
    act = (g * jax.lax.logistic(g)) * u  # silu(gate) * up, f32 in VMEM
    amax = jnp.max(jnp.abs(act), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    o_ref[...] = jnp.round(act * (1.0 / s)).astype(jnp.int8)
    os_ref[...] = s


def _gmm2_kernel(
    tile_e_ref,
    i_ref,  # [TM, I] int8
    is_ref,  # [TM, 1] f32 row scales (already includes topk weight if set)
    w2_ref,  # [1, I, TN] int8
    s2_ref,  # [1, 1, 1, TN] f32 out-channel scales
    o_ref,  # [TM, TN] bf16
):
    acc = jax.lax.dot_general(
        i_ref[...], w2_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * is_ref[...]
                  * s2_ref[0, 0, 0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn2", "interpret"))
def moe_expert_pipeline_w8a8(
    x8_sorted: jax.Array,  # [Ts, K] int8 rows sorted by expert
    xs_sorted: jax.Array,  # [Ts, 1] f32 per-row scales
    group_sizes: jax.Array,  # [E] i32
    w13_q: jax.Array,  # [E, K, 2I] int8 ([gate | up] halves)
    w13_scale: jax.Array,  # [E, 2I] f32 per-out-channel
    w2_q: jax.Array,  # [E, I, H] int8
    w2_scale: jax.Array,  # [E, H] f32
    *,
    tm: int = 512,
    tn2: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Sorted rows in, sorted bf16 expert outputs out ([Ts, H])."""
    ts, k = x8_sorted.shape
    e, _, i2 = w13_q.shape
    i = i2 // 2
    h = w2_q.shape[2]
    tn2 = min(tn2, h)
    assert h % tn2 == 0 and i % 128 == 0 and k % 128 == 0

    x_p, padded_row, tile_e = _pad_sorted_rows(x8_sorted, group_sizes, tm)
    tp = x_p.shape[0]
    mt = tp // tm
    xs_p = jnp.zeros((tp, 1), jnp.float32).at[padded_row].set(
        xs_sorted.astype(jnp.float32))
    # Mosaic requires the last TWO block dims to equal the array dims (or
    # be (8,128)-divisible): scale tables ride as 4-D [E, halves/tiles, 1,
    # cols] so each (1,1,1,cols) block satisfies that exactly.
    s13_4d = w13_scale.astype(jnp.float32).reshape(e, 2, 1, i)
    s2_4d = w2_scale.astype(jnp.float32).reshape(
        e, h // tn2, 1, tn2)

    interp = resolve_interpret(interpret)
    g1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mt,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda m, te: (m, 0)),
            pl.BlockSpec((tm, 1), lambda m, te: (m, 0)),
            pl.BlockSpec((1, k, i), lambda m, te: (te[m], 0, 0)),
            pl.BlockSpec((1, k, i), lambda m, te: (te[m], 0, 1)),
            pl.BlockSpec((1, 1, 1, i), lambda m, te: (te[m], 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, i), lambda m, te: (te[m], 1, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, i), lambda m, te: (m, 0)),
            pl.BlockSpec((tm, 1), lambda m, te: (m, 0)),
        ],
    )
    inter8, inter_s = pl.pallas_call(
        _gmm1_act_kernel,
        grid_spec=g1,
        out_shape=[
            jax.ShapeDtypeStruct((tp, i), jnp.int8),
            jax.ShapeDtypeStruct((tp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interp,
    )(tile_e, x_p, xs_p, w13_q, w13_q, s13_4d, s13_4d)

    g2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mt, h // tn2),
        in_specs=[
            pl.BlockSpec((tm, i), lambda m, j, te: (m, 0)),
            pl.BlockSpec((tm, 1), lambda m, j, te: (m, 0)),
            pl.BlockSpec((1, i, tn2), lambda m, j, te: (te[m], 0, j)),
            pl.BlockSpec((1, 1, 1, tn2),
                         lambda m, j, te: (te[m], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, tn2), lambda m, j, te: (m, j)),
    )
    y_p = pl.pallas_call(
        _gmm2_kernel,
        grid_spec=g2,
        out_shape=jax.ShapeDtypeStruct((tp, h), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interp,
    )(tile_e, inter8, inter_s, w2_q, s2_4d)
    return y_p[padded_row]
