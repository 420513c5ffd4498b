"""Fused W8A8 MoE expert pipeline in Pallas (native int8 MXU).

Reference analog: csrc/trtllm_fused_moe_runner.cu — the whole value of the
fused-MoE device sequence is that NOTHING between the two grouped GEMMs
touches HBM at full precision. Round-3 phase attribution showed the XLA
version spends ~3x the GEMM time in un-fused glue (epilogue scale, silu,
requantize, finalize): the fix is two Pallas kernels.

  K1 (gmm1+act+requant): for each single-expert m-tile, the int8
     [gate|up] tile of w13 rides ONE MXU int8 dot (int32 accumulate), the
     f32 scale epilogue + SiLU + per-row requantization all happen on the
     tile in VMEM, and only int8 rows + one f32 scale per row leave the
     kernel. Whole-I output tiles (tn = I) so the per-row amax is exact
     (not per-subtile).

  K2 (gmm2): int8 x int8 -> int32 with the (row scale x per-channel
     w2_scale) epilogue, bf16 out.

Both kernels reuse the megablox-style single-expert m-tile layout of
ops/gmm.py: rows pre-sorted by expert, padded so each m-tile belongs to
exactly one expert, tile->expert map on scalar prefetch driving the
weight BlockSpecs (auto double-buffered quantized weight streams).

Round-4 rework (VERDICT r3 #2, 78 TF/s -> target >=160): the padded
row layout is now GATHER-based — the previous ``.at[padded_row].set``
scatter of the [Tp, K] int8 activations ran ~5x below HBM roofline
(the same pathology moe_finalize documents: XLA row-scatter on TPU is
serialized; a measured 720 us scatter vs 10 us gather on equal bytes).
All data movement into and out of the kernels is now one gather each,
and the caller can fold its finalize unpermute into the output gather
via ``out_gather_idx``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env import resolve_interpret


def _padded_layout(group_sizes: jax.Array, tm: int, ts: int):
    """Index math for the single-expert m-tile layout (no data movement).

    Returns ``(src_sorted [Tp], valid [Tp], padded_row [Ts], tile_e [MT])``
    where ``src_sorted[p]`` is the sorted-row index feeding padded row
    ``p`` (gather form), ``valid[p]`` marks real rows, ``padded_row[r]``
    is the inverse map (where sorted row ``r`` landed), and ``tile_e[m]``
    the expert owning m-tile ``m``.
    """
    e = group_sizes.shape[0]
    gs = group_sizes.astype(jnp.int32)
    padded = ((gs + tm - 1) // tm) * tm
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)])
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(gs)])
    tp = ((ts + tm - 1) // tm) * tm + e * tm  # static worst-case size
    mt = tp // tm

    p = jnp.arange(tp, dtype=jnp.int32)
    e_of_p = jnp.minimum(
        jnp.searchsorted(offs[1:], p, side="right").astype(jnp.int32),
        e - 1)
    idx = p - offs[e_of_p]
    valid = idx < gs[e_of_p]
    src_sorted = starts[e_of_p] + jnp.where(valid, idx, 0)

    rows = jnp.arange(ts, dtype=jnp.int32)
    e_of_row = jnp.searchsorted(starts[1:], rows, side="right").astype(
        jnp.int32)
    padded_row = offs[e_of_row] + (rows - starts[e_of_row])

    tile_starts = jnp.arange(mt, dtype=jnp.int32) * tm
    tile_e = jnp.minimum(
        jnp.searchsorted(offs[1:], tile_starts, side="right").astype(
            jnp.int32),
        e - 1)
    return src_sorted, valid, padded_row, tile_e


def _gmm1_act_kernel(
    tile_e_ref,  # scalar prefetch [MT]
    x_ref,  # [TM, K] int8
    xs_ref,  # [TM, 1] f32 per-row activation scale
    w13_ref,  # [1, K, 2I] int8 ([gate | up] halves, one MXU dot)
    s13_ref,  # [1, 1, 2I] f32 out-channel scales
    o_ref,  # [TM, I] int8 requantized activation rows
    os_ref,  # [TM, 1] f32 per-row output scale
):
    i = o_ref.shape[1]
    acc = jax.lax.dot_general(
        x_ref[...], w13_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # [TM, 2I]
    xs = xs_ref[...]  # [TM, 1]
    s13 = s13_ref[0, 0][None, :]  # [1, 2I]
    z = acc.astype(jnp.float32) * xs * s13
    g, u = z[:, :i], z[:, i:]
    act = (g * jax.lax.logistic(g)) * u  # silu(gate) * up, f32 in VMEM
    amax = jnp.max(jnp.abs(act), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    o_ref[...] = jnp.round(act * (1.0 / s)).astype(jnp.int8)
    os_ref[...] = s


def _fused_expert_kernel(
    tile_e_ref,  # scalar prefetch [MT]
    x_ref,  # [TM, K] int8
    xs_ref,  # [TM, 1] f32
    w13_ref,  # [1, K, 2I] int8
    s13_ref,  # [1, 1, 2I] f32
    w2_ref,  # [1, I, H] int8
    s2_ref,  # [1, 1, H] f32
    o_ref,  # [TM, H] bf16
    *,
    split: int,
    inter_mode: str = "int8",  # "int8" (dynamic per-row requant),
    # "int8_static" (fixed scale — skips the amax pass; bench knob),
    # "bf16" (no requant; gmm2 runs at the 1x bf16 MXU rate)
):
    """ONE kernel for the whole expert: gmm1 -> silu*up -> requant ->
    gmm2 -> scale, per m-tile. The tile is processed in ``split`` row
    halves so the VLIW scheduler always has an independent MXU dot
    (half j+1's gmm, half j's gmm2) to overlap with half j's VPU
    epilogue — the two-kernel form serialized dot -> epilogue per grid
    step. The int8 intermediate never touches HBM.

    r5 re-measurement: the whole-tile straight-line form (split=1) runs
    this pipeline at ~330 TF/s on padded work (0.536 ms at the t4096 e8
    bench geometry) — the r4 "kernel at 133 TF/s" attribution was
    dominated by the XLA gather/mask passes AROUND the kernel (since
    removed); split>1 measured neutral once the glue was gone, so
    split=1 is the default.
    """
    i2 = w13_ref.shape[2]
    i = i2 // 2
    tm = x_ref.shape[0]
    hs = tm // split
    dims = (((1,), (0,)), ((), ()))
    s13 = s13_ref[0, 0][None, :]  # [1, 2I]
    s2 = s2_ref[0, 0][None, :]  # [1, H]

    def gmm1(j):
        return jax.lax.dot_general(
            x_ref[pl.ds(j * hs, hs)], w13_ref[0], dims,
            preferred_element_type=jnp.int32)  # [hs, 2I]

    def epi1(acc, j):
        xs = xs_ref[pl.ds(j * hs, hs)]
        z = acc.astype(jnp.float32) * xs * s13
        g, u = z[:, :i], z[:, i:]
        act = (g * jax.lax.logistic(g)) * u
        if inter_mode == "bf16":
            return act.astype(jnp.bfloat16), None
        if inter_mode == "int8_static":
            s = jnp.full((hs, 1), 1.0 / 16.0, jnp.float32)
        else:
            amax = jnp.max(jnp.abs(act), axis=-1, keepdims=True)
            s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        return jnp.round(act * (1.0 / s)).astype(jnp.int8), s

    def gmm2(i8):
        if i8.dtype == jnp.bfloat16:
            return jax.lax.dot_general(
                i8, w2_ref[0].astype(jnp.bfloat16), dims,
                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            i8, w2_ref[0], dims, preferred_element_type=jnp.int32)

    # software pipeline over row halves: issue the NEXT half's gmm1
    # before consuming the current half's accumulator
    acc = gmm1(0)
    for j in range(split):
        acc_next = gmm1(j + 1) if j + 1 < split else None
        i8, s = epi1(acc, j)
        y = gmm2(i8)
        ys = y.astype(jnp.float32) if s is None else y.astype(
            jnp.float32) * s
        o_ref[pl.ds(j * hs, hs)] = (ys * s2).astype(o_ref.dtype)
        acc = acc_next


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


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tn2", "interpret", "return_padded", "fused",
                     "split", "inter_mode"))
def moe_expert_pipeline_w8a8(
    x8_sorted: jax.Array,  # [Ts, K] int8 rows sorted by expert
    xs_sorted: jax.Array,  # [Ts, 1] f32 per-row scales
    group_sizes: jax.Array,  # [E] i32
    w13_q: jax.Array,  # [E, K, 2I] int8 ([gate | up] halves)
    w13_scale: jax.Array,  # [E, 2I] f32 per-out-channel
    w2_q: jax.Array,  # [E, I, H] int8
    w2_scale: jax.Array,  # [E, H] f32
    *,
    out_gather_idx: jax.Array | None = None,  # [R] sorted-row indices
    in_row_idx: jax.Array | None = None,  # [Ts] row map composed into the
    # input gather (x8_sorted then holds UNSORTED rows indexed by it)
    tm: int = 256,
    tn2: int = 512,
    interpret: bool | None = None,
    return_padded: bool = False,
    fused: bool | None = None,  # one-kernel pipeline (None = auto by VMEM)
    split: int = 1,  # row halves for the fused kernel's MXU/VPU overlap
    inter_mode: str = "int8",  # fused-kernel intermediate (see kernel)
) -> jax.Array:
    """Sorted rows in, bf16 expert outputs out.

    Default return is ``[Ts, H]`` in sorted-row order. With
    ``out_gather_idx`` the output rows are gathered as
    ``y_sorted[out_gather_idx]`` in the SAME pass (callers fold their
    finalize unpermute in, avoiding a second full-size gather). With
    ``return_padded`` the raw ``([Tp, H], padded_row)`` pair is returned.
    """
    # with in_row_idx the rows array is UNSORTED token rows and the true
    # sorted-row count is the index map's length (T*K assignments), not
    # the token count
    ts = (in_row_idx.shape[0] if in_row_idx is not None
          else x8_sorted.shape[0])
    k = x8_sorted.shape[1]
    e, _, i2 = w13_q.shape
    i = i2 // 2
    h = w2_q.shape[2]
    # largest 128-multiple tile that divides h (ADVICE r3: h=896/1152/...
    # are 128-multiples that 512 does not divide; terminate at 128)
    tn2 = min(tn2, h)
    while h % tn2 != 0:
        tn2 -= 128
    assert tn2 >= 128 and i % 128 == 0 and k % 128 == 0
    # static padding is e*tm rows of ALWAYS-EXECUTED MXU work: keep it
    # under ~25% of the real rows by shrinking tm for many-expert calls
    # (r5: e64 x tm512 padded the t4096-top8 workload by 2x)
    while tm > 128 and e * tm * 4 > ts:
        tm //= 2

    src_sorted, valid, padded_row, tile_e = _padded_layout(
        group_sizes, tm, ts)
    tp = src_sorted.shape[0]
    mt = tp // tm
    # gather (not scatter!) into the padded layout, optionally COMPOSED
    # with the caller's token->sorted-row map (in_row_idx) so the whole
    # input side is ONE int8 gather. Padding rows gather row 0's real
    # bytes unmasked — their outputs never leave (dropped by the output
    # gather), and int8 garbage cannot produce non-finite values, so the
    # r4 `where(valid, ..., 0)` masking pass (a full [Tp, K] select) is
    # dropped (r5: the XLA passes around the kernel, not the kernel,
    # were half the "pipe" time).
    if in_row_idx is not None:
        gidx = in_row_idx[src_sorted]
        x_p = x8_sorted[gidx]
        xs_p = xs_sorted.astype(jnp.float32)[gidx]
    else:
        x_p = x8_sorted[src_sorted]
        xs_p = xs_sorted.astype(jnp.float32)[src_sorted]

    # Mosaic requires the last TWO block dims to equal the array dims (or
    # be (8,128)-divisible): the w13 scale table rides as 3-D [E, 1, 2I]
    # so each (1,1,2I) block satisfies that; w2 scales as 4-D tiles.
    s13_3d = w13_scale.astype(jnp.float32).reshape(e, 1, i2)
    s2_4d = w2_scale.astype(jnp.float32).reshape(
        e, h // tn2, 1, tn2)

    interp = resolve_interpret(interpret)

    if fused is None:
        # weight blocks double-buffer; keep the whole working set under
        # ~96 MB of the 128 MB VMEM
        wbytes = 2 * (k * i2 + i * h)
        act = tm * (k + 4 * i2 + i + 4 * h + 8)
        fused = wbytes + act < 96 * 1024 * 1024
    if fused:
        gf = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mt,),
            in_specs=[
                pl.BlockSpec((tm, k), lambda m, te: (m, 0)),
                pl.BlockSpec((tm, 1), lambda m, te: (m, 0)),
                pl.BlockSpec((1, k, i2), lambda m, te: (te[m], 0, 0)),
                pl.BlockSpec((1, 1, i2), lambda m, te: (te[m], 0, 0)),
                pl.BlockSpec((1, i, h), lambda m, te: (te[m], 0, 0)),
                pl.BlockSpec((1, 1, h), lambda m, te: (te[m], 0, 0)),
            ],
            out_specs=pl.BlockSpec((tm, h), lambda m, te: (m, 0)),
        )
        y_p = pl.pallas_call(
            functools.partial(_fused_expert_kernel, split=split,
                              inter_mode=inter_mode),
            grid_spec=gf,
            out_shape=jax.ShapeDtypeStruct((tp, h), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interp,
        )(tile_e, x_p, xs_p, w13_q, s13_3d,
          w2_q, w2_scale.astype(jnp.float32).reshape(e, 1, h))
        if return_padded:
            return y_p, padded_row
        if out_gather_idx is not None:
            return y_p[padded_row[out_gather_idx]]
        return y_p[padded_row]

    g1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mt,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda m, te: (m, 0)),
            pl.BlockSpec((tm, 1), lambda m, te: (m, 0)),
            pl.BlockSpec((1, k, i2), lambda m, te: (te[m], 0, 0)),
            pl.BlockSpec((1, 1, i2), lambda m, te: (te[m], 0, 0)),
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
    )(tile_e, x_p, xs_p, w13_q, s13_3d)

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
    if return_padded:
        return y_p, padded_row
    if out_gather_idx is not None:
        return y_p[padded_row[out_gather_idx]]
    return y_p[padded_row]
