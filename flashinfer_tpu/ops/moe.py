"""Fused Mixture-of-Experts: routing → permute → grouped GEMM → activation
→ grouped GEMM → unpermute/combine.

Capability parity with reference flashinfer/fused_moe/
(`cutlass_fused_moe` core.py:891; trtllm_*_moe core.py:3303-4938; device
sequence RoutingKernel → permute → grouped GEMM1 → act → grouped GEMM2 →
finalize, SURVEY §3.4).

TPU re-design: the permute is an argsort-by-expert token gather (static
shapes: T*top_k assignments, no capacity drop), the grouped GEMMs are
`lax.ragged_dot` (XLA's native TPU grouped matmul) or the Pallas
fused-dequant grouped path for quantized experts, and finalize is a
segment-sum scatter — all fused by XLA into a single pipeline. No
one-kernel mega-fusion is needed: on TPU the grouped-GEMM is the whole
cost and ragged_dot already streams it on the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .activation import gelu_and_mul, silu_and_mul
from .routing import RoutingMethodType, apply_routing

_ACTIVATIONS = {
    "silu": silu_and_mul,
    "swiglu": silu_and_mul,
    "gelu": gelu_and_mul,
    "geglu": gelu_and_mul,
}


def moe_permute(
    hidden: jax.Array,  # [T, H]
    topk_ids: jax.Array,  # [T, K]
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sort token-expert assignments by expert (reference permute stage).

    Returns (x_sorted [T*K, H], sort_idx [T*K] (flat assignment index in
    sorted order), group_sizes [E_upper] — computed by the caller via
    bincount, row_token [T*K] source token per sorted row).
    """
    t, k = topk_ids.shape
    flat_expert = topk_ids.reshape(-1)  # [T*K]
    sort_idx = jnp.argsort(flat_expert)  # stable
    row_token = sort_idx // k
    x_sorted = hidden[row_token]
    return x_sorted, sort_idx, flat_expert[sort_idx], row_token


def moe_finalize(
    y_sorted: jax.Array,  # [T*K, H]
    sort_idx: jax.Array,  # [T*K]
    topk_weights: jax.Array,  # [T, K]
    num_tokens: int,
) -> jax.Array:
    """Weighted combine back to token order (reference finalize/unpermute).

    TPU note: an XLA scatter-add over [T, H] runs ~5x below HBM roofline
    (measured 720 us vs a 10 us gather on the same 33 MB at t4096/h2048);
    a GATHER back to assignment order + a dense [T, K, H] weighted
    reduction is the fast form — every token has exactly K contributions,
    so no actual scatter is needed."""
    k = topk_weights.shape[1]
    tk = sort_idx.shape[0]
    # inverse permutation via a tiny [T*K] i32 scatter-set
    inv = jnp.zeros((tk,), jnp.int32).at[sort_idx].set(
        jnp.arange(tk, dtype=jnp.int32))
    y_assign = y_sorted[inv].astype(jnp.float32)  # assignment-flat order
    contrib = y_assign.reshape(num_tokens, k, -1)
    return jnp.sum(contrib * topk_weights[..., None].astype(jnp.float32),
                   axis=1)


def fused_moe(
    hidden_states: jax.Array,  # [T, H]
    w13: jax.Array,  # [E, H, 2*I]  (gate and up concatenated on last dim)
    w2: jax.Array,  # [E, I, H]
    topk_ids: jax.Array,  # [T, K]
    topk_weights: jax.Array,  # [T, K]
    *,
    activation: str = "silu",
    w13_scale: jax.Array | None = None,  # quantized-expert scales
    w2_scale: jax.Array | None = None,
    a_quant: str | None = None,  # None | "fp8_per_tensor"
    out_dtype=None,
) -> jax.Array:
    """Core fused MoE (reference cutlass_fused_moe core.py:891).

    Weight layout note: the reference keeps [E, 2I, H] row-major for CUTLASS;
    TPU wants the contraction dim first for the MXU, so weights here are
    [E, H, 2I] / [E, I, H]. ``activation`` consumes [gate | up] halves.
    Quantized experts: pass fp8 w13/w2 with per-expert scales (per-tensor)
    — dequant folds into the ragged_dot operands.
    """
    t, h = hidden_states.shape
    e = w13.shape[0]
    num_experts = e
    out_dtype = out_dtype or hidden_states.dtype
    act_fn = _ACTIVATIONS[activation]

    x_sorted, sort_idx, experts_sorted, _ = moe_permute(hidden_states, topk_ids)
    group_sizes = jnp.bincount(experts_sorted, length=num_experts).astype(jnp.int32)

    w13c = w13
    w2c = w2
    if w13.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
        # quantized experts: stream quantized bytes through the Pallas
        # grouped GEMM (in-kernel dequant); per-tensor scales expand to a
        # single 128x128 block grid entry
        from .gmm import fused_moe_quant

        def expand(scale, wq):
            if scale is None:
                return None
            e_, r, c = wq.shape
            if r % 128 or c % 128:
                return None
            if scale.ndim == 3 and scale.shape == (e_, r // 128, c // 128):
                return scale.astype(jnp.float32)  # ready-made block scales
            if scale.ndim != 1 and scale.size != e_:
                return None
            return jnp.broadcast_to(
                scale.reshape(-1, 1, 1).astype(jnp.float32),
                (e_, r // 128, c // 128),
            )

        s13 = expand(w13_scale, w13)
        s2 = expand(w2_scale, w2)
        ok13 = s13 is not None or w13_scale is None
        ok2 = s2 is not None or w2_scale is None
        if ok13 and ok2 and w13.shape[1] % 128 == 0 \
                and w13.shape[2] % 128 == 0 and w2.shape[1] % 128 == 0 \
                and w2.shape[2] % 128 == 0:
            out = fused_moe_quant(
                hidden_states, w13, s13, w2, s2, topk_ids, topk_weights,
                activation=activation, out_dtype=out_dtype,
            )
            return out
        def dq_full(wq, scale):  # bf16 fallback for non-128-aligned shapes
            wf = wq.astype(jnp.bfloat16)
            if scale is None:
                return wf
            e_, r, c = wq.shape
            if scale.ndim == 3:  # [E, R/bR, C/bC] block scales
                br, bc = r // scale.shape[1], c // scale.shape[2]
                wf = wf.reshape(e_, scale.shape[1], br, scale.shape[2], bc)
                wf = wf * scale[:, :, None, :, None].astype(jnp.bfloat16)
                return wf.reshape(e_, r, c)
            return wf * scale.reshape(-1, 1, 1).astype(jnp.bfloat16)

        w13c = dq_full(w13, w13_scale)
        w2c = dq_full(w2, w2_scale)

    x_in = x_sorted
    if a_quant == "fp8_per_tensor":
        # quantize activations per tensor, dequantize via scale on output
        amax = jnp.maximum(jnp.max(jnp.abs(x_sorted.astype(jnp.float32))), 1e-12)
        a_scale = amax / 448.0
        x_in = ((x_sorted.astype(jnp.float32) / a_scale).astype(jnp.float8_e4m3fn)
                ).astype(jnp.bfloat16)
    inter = jax.lax.ragged_dot(
        x_in.astype(w13c.dtype), w13c, group_sizes,
        preferred_element_type=jnp.float32,
    )
    if a_quant == "fp8_per_tensor":
        inter = inter * a_scale
    inter = act_fn(_swap_gate_up(inter))
    y = jax.lax.ragged_dot(
        inter.astype(w2c.dtype), w2c, group_sizes,
        preferred_element_type=jnp.float32,
    )
    out = moe_finalize(y, sort_idx, topk_weights, t)
    return out.astype(out_dtype)


def fused_moe_w8a8(
    hidden_states: jax.Array,  # [T, H] bf16
    w13_q: jax.Array,  # [E, H, 2I] int8
    w13_scale: jax.Array,  # [E, 2I] f32 per-output-channel
    w2_q: jax.Array,  # [E, I, H] int8
    w2_scale: jax.Array,  # [E, H] f32
    topk_ids: jax.Array,  # [T, K]
    topk_weights: jax.Array,  # [T, K]
    *,
    activation: str = "silu",
    out_dtype=None,
    impl: str = "pallas",
) -> jax.Array:
    """Native-int8 MXU fused MoE: per-token int8 activations ×
    per-channel int8 experts through ``ragged_dot(int8, int8) → int32``.

    ``impl="pallas"`` (default) runs the expert pipeline as two fused
    Pallas kernels (moe_pallas.py) — gmm1+SiLU+requant never leaves VMEM
    at more than int8+scale width; ``impl="xla"`` keeps the ragged_dot
    form (phase-attributed r3: XLA leaves ~3× the GEMM time in unfused
    epilogue/act/requant passes).

    The TPU deployment path for the reference's fp8/fp4 MoE families
    (csrc/trtllm_fused_moe_runner.cu role): expert bytes stream at int8
    width AND the matmul runs in the MXU's 2× int8 mode — measured
    253 TF/s vs 96 TF/s for the bf16 ragged_dot at the t4096
    e8×2048×1408 bench geometry. Scale epilogues are exact: per-token
    activation scale × per-(expert, out-channel) weight scale, the weight
    scale row gathered by each sorted row's expert id (fuses into the
    epilogue; [E, C] scale tables are KBs)."""
    t, h = hidden_states.shape
    e = w13_q.shape[0]
    k = topk_ids.shape[1]
    out_dtype = out_dtype or hidden_states.dtype
    act_fn = _ACTIVATIONS[activation]

    def quant_rows(xf):  # f32 in
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.round(xf / s).astype(jnp.int8), s

    # Quantize BEFORE the permute: the token gather then moves int8 bytes
    # (4x less traffic than gathering bf16 rows and quantizing the
    # duplicated copies — each token is gathered top_k times). Phase
    # attribution r3: the elementwise glue, not the GEMMs, dominated.
    x8, xs = quant_rows(hidden_states.astype(jnp.float32))
    flat_expert = topk_ids.reshape(-1)
    tk = flat_expert.shape[0]

    if impl == "pallas" and activation in ("silu", "swiglu") \
            and h % 128 == 0 and w2_q.shape[1] % 128 == 0 \
            and w2_q.shape[2] % 128 == 0:
        from .moe_pallas import moe_expert_pipeline_w8a8

        # Index math by STABLE COUNTING SORT (e is small): one-hot prefix
        # sums give group sizes AND each assignment's sorted position
        # (``dest`` == the finalize inverse permutation) without the
        # argsort+bincount+inv-scatter chain (r5: 0.099 ms vs 0.128 ms
        # at t4096 top2, and no 1D scatters on the critical path except
        # the small sort_idx build).
        oh = (flat_expert[:, None] == jnp.arange(e, dtype=jnp.int32)[None, :]
              ).astype(jnp.int32)
        pos = jnp.cumsum(oh, axis=0) - oh
        slot = jnp.take_along_axis(pos, flat_expert[:, None], 1)[:, 0]
        group_sizes = jnp.sum(oh, axis=0).astype(jnp.int32)
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(group_sizes)[:-1].astype(jnp.int32)])
        dest = offs[flat_expert] + slot  # [T*K] sorted position
        sort_idx = jnp.zeros((tk,), jnp.int32).at[dest].set(
            jnp.arange(tk, dtype=jnp.int32))
        row_token = sort_idx // k

        # the WHOLE input side is one composed int8 gather (token rows ->
        # padded tile layout, in_row_idx=row_token folds the expert sort
        # in); the combine below is K unrolled gathers with the weighted
        # add fused into each — the r4 reshape(T,K,H) combine
        # materialized f32 intermediates and measured 0.305 ms vs ~0.07
        # for this form
        y_p, padded_row = moe_expert_pipeline_w8a8(
            x8, xs, group_sizes, w13_q,
            w13_scale.astype(jnp.float32), w2_q,
            w2_scale.astype(jnp.float32), return_padded=True,
            in_row_idx=row_token)
        idx_tk = padded_row[dest].reshape(t, k)
        wts = topk_weights.astype(jnp.float32)
        out = y_p[idx_tk[:, 0]].astype(jnp.float32) * wts[:, 0, None]
        for j in range(1, k):
            out = out + y_p[idx_tk[:, j]].astype(jnp.float32) \
                * wts[:, j, None]
        return out.astype(out_dtype)
    sort_idx = jnp.argsort(flat_expert)
    row_token = sort_idx // k
    experts_sorted = flat_expert[sort_idx]
    group_sizes = jnp.bincount(experts_sorted, length=e).astype(jnp.int32)
    x8_sorted = x8[row_token]
    xs_sorted = xs[row_token]

    acc1 = jax.lax.ragged_dot(
        x8_sorted, w13_q, group_sizes, preferred_element_type=jnp.int32)
    # one fused chain from int32 accumulator to int8 gmm2 input: scale
    # epilogue -> activation -> requantize, no bf16 intermediate
    inter = (acc1.astype(jnp.float32) * xs_sorted
             * w13_scale.astype(jnp.float32)[experts_sorted])
    inter = act_fn(inter)  # stays f32
    i8, is_ = quant_rows(inter)
    acc2 = jax.lax.ragged_dot(
        i8, w2_q, group_sizes, preferred_element_type=jnp.int32)
    y = (acc2.astype(jnp.float32) * is_
         * w2_scale.astype(jnp.float32)[experts_sorted]
         ).astype(jnp.bfloat16)  # halve finalize gather traffic
    out = moe_finalize(y, sort_idx, topk_weights, t)
    return out.astype(out_dtype)


def quantize_moe_weights_int8(
    w13: jax.Array, w2: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-(expert, out-channel) int8 quantization of float expert weights
    → ``(w13_q, w13_scale [E, 2I], w2_q, w2_scale [E, H])`` for
    :func:`fused_moe_w8a8`."""
    def q(w):
        wf = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)  # reduce K
        s = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.round(wf / s).astype(jnp.int8), jnp.squeeze(s, 1)
    w13_q, s13 = q(w13)
    w2_q, s2 = q(w2)
    return w13_q, s13, w2_q, s2


def _swap_gate_up(x: jax.Array) -> jax.Array:
    """Reference activation contract: act(x[..., :I]) * x[..., I:], with
    [gate | up] halves — our w13 layout already produces that order."""
    return x


def cutlass_fused_moe(
    input: jax.Array,  # noqa: A002 (reference arg name)
    token_selected_experts: jax.Array,
    token_final_scales: jax.Array,
    fc1_expert_weights: jax.Array,  # [E, 2I, H] reference layout
    fc2_expert_weights: jax.Array,  # [E, H, I]
    output_dtype=None,
    quant_scales: Any = None,
    tp_size: int = 1,
    tp_rank: int = 0,
    ep_size: int = 1,
    ep_rank: int = 0,
    activation: str = "silu",
    **_ignored,
) -> jax.Array:
    """Drop-in analog of reference cutlass_fused_moe (fused_moe/core.py:891).

    Accepts the reference's [E, 2I, H]/[E, H, I] row-major weight layouts
    and transposes once (callers should pre-transpose and use fused_moe for
    zero-cost steady state).
    """
    del quant_scales, tp_size, tp_rank, ep_size, ep_rank
    w13 = jnp.swapaxes(fc1_expert_weights, 1, 2)  # → [E, H, 2I]
    w2 = jnp.swapaxes(fc2_expert_weights, 1, 2)  # → [E, I, H]
    return fused_moe(
        input, w13, w2, token_selected_experts, token_final_scales,
        activation=activation, out_dtype=output_dtype,
    )


def trtllm_bf16_moe(
    routing_logits: jax.Array,
    hidden_states: jax.Array,
    gemm1_weights: jax.Array,  # [E, 2I, H]
    gemm2_weights: jax.Array,  # [E, H, I]
    num_experts: int,
    top_k: int,
    routing_method_type: int = RoutingMethodType.Renormalize,
    routing_bias: jax.Array | None = None,
    n_group: int | None = None,
    topk_group: int | None = None,
    routed_scaling_factor: float | None = None,
    **_ignored,
) -> jax.Array:
    """bf16 routed MoE (reference fused_moe/core.py:3303)."""
    ids, w = apply_routing(
        RoutingMethodType(routing_method_type), routing_logits, top_k,
        bias=routing_bias, n_group=n_group or 8, topk_group=topk_group or 4,
        routed_scaling_factor=routed_scaling_factor or 2.5,
    )
    return cutlass_fused_moe(hidden_states, ids, w, gemm1_weights, gemm2_weights)


def trtllm_fp8_per_tensor_scale_moe(
    routing_logits: jax.Array,
    routing_bias: jax.Array | None,
    hidden_states: jax.Array,
    gemm1_weights: jax.Array,  # [E, 2I, H] fp8
    output1_scales_scalar: jax.Array,  # [E]
    gemm2_weights: jax.Array,  # [E, H, I] fp8
    output2_scales_scalar: jax.Array,  # [E]
    num_experts: int,
    top_k: int,
    n_group: int | None = None,
    topk_group: int | None = None,
    routed_scaling_factor: float | None = None,
    routing_method_type: int = RoutingMethodType.DeepSeekV3,
    **_ignored,
) -> jax.Array:
    """FP8 per-tensor-scaled routed MoE (reference fused_moe/core.py:3724)."""
    ids, w = apply_routing(
        RoutingMethodType(routing_method_type), routing_logits, top_k,
        bias=routing_bias, n_group=n_group or 8, topk_group=topk_group or 4,
        routed_scaling_factor=routed_scaling_factor or 2.5,
    )
    w13 = jnp.swapaxes(gemm1_weights, 1, 2)
    w2 = jnp.swapaxes(gemm2_weights, 1, 2)
    return fused_moe(
        hidden_states, w13, w2, ids, w,
        w13_scale=output1_scales_scalar, w2_scale=output2_scales_scalar,
        out_dtype=hidden_states.dtype,
    )


def trtllm_bf16_routed_moe(
    topk_ids: jax.Array,  # [T, K] precomputed routing
    topk_weights: jax.Array,
    hidden_states: jax.Array,
    gemm1_weights: jax.Array,  # [E, 2I, H]
    gemm2_weights: jax.Array,  # [E, H, I]
    **_ignored,
) -> jax.Array:
    """Routed-variant MoE: caller supplies (ids, weights) — the reference's
    `trtllm_*_routed_moe` family (fused_moe/core.py routed entry points)."""
    return cutlass_fused_moe(
        hidden_states, topk_ids, topk_weights, gemm1_weights, gemm2_weights
    )


def trtllm_mxint4_moe(
    routing_logits: jax.Array,
    routing_bias: jax.Array | None,
    hidden_states: jax.Array,
    gemm1_weights: jax.Array,  # [E, 2I, H//2] uint8: two int4 per byte
    gemm1_weights_scale: jax.Array,  # [E, 2I, H//32]
    gemm2_weights: jax.Array,  # [E, H, I//2] uint8
    gemm2_weights_scale: jax.Array,  # [E, H, I//32]
    num_experts: int,
    top_k: int,
    routing_method_type: int = RoutingMethodType.Renormalize,
    n_group: int | None = None,
    topk_group: int | None = None,
    routed_scaling_factor: float | None = None,
    **_ignored,
) -> jax.Array:
    """MxInt4-weight routed MoE (reference fused_moe/core.py trtllm_mxint4_moe):
    signed int4 pairs with 32-element block scales, dequantized to bf16
    feeding the grouped GEMM."""
    ids, w = apply_routing(
        RoutingMethodType(routing_method_type), routing_logits, top_k,
        bias=routing_bias, n_group=n_group or 8, topk_group=topk_group or 4,
        routed_scaling_factor=routed_scaling_factor or 2.5,
    )

    def dq_int4(packed, scale, block=32):
        e, r, c_half = packed.shape
        c = c_half * 2
        lo = (packed & 0xF).astype(jnp.int8)
        hi = (packed >> 4).astype(jnp.int8)
        lo = jnp.where(lo >= 8, lo - 16, lo)  # sign-extend nibble
        hi = jnp.where(hi >= 8, hi - 16, hi)
        vals = jnp.stack([lo, hi], -1).reshape(e, r, c).astype(jnp.float32)
        vals = vals.reshape(e, r, c // block, block) * scale.astype(
            jnp.float32)[..., None]
        return vals.reshape(e, r, c).astype(jnp.bfloat16)

    w13 = jnp.swapaxes(dq_int4(gemm1_weights, gemm1_weights_scale), 1, 2)
    w2 = jnp.swapaxes(dq_int4(gemm2_weights, gemm2_weights_scale), 1, 2)
    return fused_moe(hidden_states, w13, w2, ids, w,
                     out_dtype=hidden_states.dtype)


def trtllm_fp4_block_scale_moe(
    routing_logits: jax.Array,
    routing_bias: jax.Array | None,
    hidden_states: jax.Array,  # bf16 [T, H] (fp4-quantized activations are
    #                            dequantized by the caller in v1)
    hidden_states_scale: jax.Array | None,
    gemm1_weights: jax.Array,  # [E, 2I, H//2] uint8 packed e2m1
    gemm1_weights_scale: jax.Array,  # [E, 2I, H//16] block scales
    gemm2_weights: jax.Array,  # [E, H, I//2] uint8 packed e2m1
    gemm2_weights_scale: jax.Array,  # [E, H, I//16]
    output1_scale_scalar: jax.Array | None,
    output1_scale_gate_scalar: jax.Array | None,
    output2_scale_scalar: jax.Array | None,
    num_experts: int,
    top_k: int,
    n_group: int | None = None,
    topk_group: int | None = None,
    intermediate_size: int | None = None,
    local_expert_offset: int = 0,
    local_num_experts: int | None = None,
    routed_scaling_factor: float | None = None,
    routing_method_type: int = RoutingMethodType.DeepSeekV3,
    **_ignored,
) -> jax.Array:
    """NVFP4 block-scaled routed MoE (reference fused_moe/core.py:4476).

    v1: e2m1 weights are block-dequantized to bf16 feeding the grouped
    GEMM (TPU has no fp4 unit — SURVEY §7 'FP4 on TPU'); per-expert output
    scalars fold into the expert outputs.
    """
    from .gemm_pallas import e2m1_decode

    ids, w = apply_routing(
        RoutingMethodType(routing_method_type), routing_logits, top_k,
        bias=routing_bias, n_group=n_group or 8, topk_group=topk_group or 4,
        routed_scaling_factor=routed_scaling_factor or 2.5,
    )
    del hidden_states_scale  # activations arrive dequantized in v1

    def dq(packed, scale, sf_block=16):
        e, r, c_half = packed.shape
        c = c_half * 2
        lo = e2m1_decode(packed & 0xF)
        hi = e2m1_decode(packed >> 4)
        vals = jnp.stack([lo, hi], axis=-1).reshape(e, r, c)
        s = scale.astype(jnp.float32)
        vals = vals.reshape(e, r, c // sf_block, sf_block) * s[..., None]
        return vals.reshape(e, r, c).astype(jnp.bfloat16)

    w13 = jnp.swapaxes(dq(gemm1_weights, gemm1_weights_scale), 1, 2)
    w2 = jnp.swapaxes(dq(gemm2_weights, gemm2_weights_scale), 1, 2)
    if output1_scale_scalar is not None:
        w13 = w13 * output1_scale_scalar.reshape(-1, 1, 1).astype(w13.dtype)
    if output2_scale_scalar is not None:
        w2 = w2 * output2_scale_scalar.reshape(-1, 1, 1).astype(w2.dtype)
    return fused_moe(
        hidden_states, w13, w2, ids, w, out_dtype=hidden_states.dtype,
    )


def trtllm_fp8_block_scale_moe(
    routing_logits: jax.Array,
    routing_bias: jax.Array | None,
    hidden_states: jax.Array,
    gemm1_weights: jax.Array,  # [E, 2I, H] fp8
    gemm1_weights_scale: jax.Array,  # [E, 2I//128, H//128]
    gemm2_weights: jax.Array,
    gemm2_weights_scale: jax.Array,
    num_experts: int,
    top_k: int,
    n_group: int | None = None,
    topk_group: int | None = None,
    routed_scaling_factor: float | None = None,
    routing_method_type: int = RoutingMethodType.DeepSeekV3,
    **_ignored,
) -> jax.Array:
    """FP8 128x128-block-scaled routed MoE (reference fused_moe/core.py:4016).

    Weights STAY quantized in HBM (VERDICT r1 #4): only the packed fp8
    bytes are transposed to the grouped-GEMM layout (a half-size copy),
    and the block dequant is an elementwise expression adjacent to the
    ragged_dot so XLA fuses the upcast into the weight stream — no bf16
    weight copy materializes (cf. reference
    include/flashinfer/gemm/gemm_groupwise_sm100.cuh)."""
    ids, w = apply_routing(
        RoutingMethodType(routing_method_type), routing_logits, top_k,
        bias=routing_bias, n_group=n_group or 8, topk_group=topk_group or 4,
        routed_scaling_factor=routed_scaling_factor or 2.5,
    )

    # Pallas grouped GEMM with in-kernel dequant: the fp8 expert bytes
    # stream from HBM at quantized width (XLA ragged_dot cannot fuse the
    # dequant producer — measured +5.4 ms of bf16-copy traffic on a
    # 32-expert layer). Only the PACKED bytes are transposed to the
    # [E, K, N] layout (serving should pre-transpose once at load).
    from .gmm import fused_moe_quant

    w13_t = jnp.swapaxes(gemm1_weights, 1, 2)  # [E, H, 2I] fp8
    w13_s = jnp.swapaxes(gemm1_weights_scale, 1, 2)
    w2_t = jnp.swapaxes(gemm2_weights, 1, 2)  # [E, I, H]
    w2_s = jnp.swapaxes(gemm2_weights_scale, 1, 2)
    return fused_moe_quant(
        hidden_states, w13_t, w13_s, w2_t, w2_s, ids, w,
        out_dtype=hidden_states.dtype,
    )
