"""MoE benchmark routines (reference benchmarks/routines/moe.py +
MoE_benchmarks.md methodology)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.testing.utils import bench_loop

V5E_BF16_TFLOPS = 197.0
V5E_INT8_TOPS = 394.0


def _make_inputs(num_tokens, hidden, intermediate, num_experts, top_k,
                 expert_dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((num_tokens, hidden)), jnp.bfloat16)
    # int8 experts are built host-side WITHOUT materializing f32 weights on
    # device: at DSv3-like geometry (e64 x h7168) the f32 originals alone
    # are ~11 GB and OOM the 16 GB HBM (measured r4)
    if expert_dtype in ("int8", "w8a8"):
        w13_np = rng.integers(
            -127, 128, (num_experts, hidden, 2 * intermediate), np.int8)
        w2_np = rng.integers(
            -127, 128, (num_experts, intermediate, hidden), np.int8)
        w13 = jnp.asarray(w13_np, jnp.int8)
        w2 = jnp.asarray(w2_np, jnp.int8)
    scales = {}
    if expert_dtype == "int8":
        scales = dict(w13_scale=jnp.full((num_experts,), 4e-4, jnp.float32),
                      w2_scale=jnp.full((num_experts,), 4e-4, jnp.float32))
    elif expert_dtype == "w8a8":
        scales = dict(
            w13_scale=jnp.full((num_experts, 2 * intermediate), 4e-4,
                               jnp.float32),
            w2_scale=jnp.full((num_experts, hidden), 4e-4, jnp.float32))
    else:
        w13 = jnp.asarray(rng.standard_normal(
            (num_experts, hidden, 2 * intermediate)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal(
            (num_experts, intermediate, hidden)) * 0.05, jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, num_experts, (num_tokens, top_k)),
                      jnp.int32)
    wts = jnp.full((num_tokens, top_k), 1.0 / top_k, jnp.float32)
    return x, w13, w2, ids, wts, scales


def bench_fused_moe(
    num_tokens: int = 4096, hidden: int = 2048, intermediate: int = 1408,
    num_experts: int = 8, top_k: int = 2, expert_dtype: str = "w8a8",
) -> dict:
    """Fused MoE (permute → grouped GEMM ×2 → combine) TFLOP/s + tok/s.

    ``expert_dtype``: "bf16" (ragged_dot), "int8" (Pallas in-kernel-dequant
    gmm, block scales), "w8a8" (native int8 MXU ragged_dot with per-token
    activation quant — the production path, 2× MXU rate)."""
    from flashinfer_tpu.ops.moe import fused_moe, fused_moe_w8a8

    x, w13, w2, ids, wts, scales = _make_inputs(
        num_tokens, hidden, intermediate, num_experts, top_k, expert_dtype)

    if expert_dtype == "w8a8":
        def step(x_cur, w13, w2, ids, wts):
            return fused_moe_w8a8(
                x_cur, w13, scales["w13_scale"], w2, scales["w2_scale"],
                ids, wts).astype(x_cur.dtype)
    else:
        def step(x_cur, w13, w2, ids, wts):
            return fused_moe(x_cur, w13, w2, ids, wts,
                             **scales).astype(x_cur.dtype)

    dt = bench_loop(step, x, w13, w2, ids, wts, iters=32, base_iters=4)
    flops = 2 * num_tokens * top_k * hidden * 3 * intermediate
    tf = flops / dt / 1e12
    roof = V5E_INT8_TOPS if expert_dtype == "w8a8" else V5E_BF16_TFLOPS
    return {
        "routine": "fused_moe", "ms": round(dt * 1e3, 3),
        "config": f"t{num_tokens} e{num_experts}x{hidden}x{intermediate} "
                  f"top{top_k} {expert_dtype}",
        "metric": "TFLOP/s", "value": round(tf, 1),
        "vs_roofline": round(tf / roof, 4),
        "vs_bf16_roofline": round(tf / V5E_BF16_TFLOPS, 4),
        "tokens_per_s": round(num_tokens / dt),
    }


def bench_fused_moe_phases(
    num_tokens: int = 4096, hidden: int = 2048, intermediate: int = 1408,
    num_experts: int = 8, top_k: int = 2, expert_dtype: str = "w8a8",
) -> dict:
    """Phase attribution (VERDICT r2 #2): permute / GEMM1 / act / GEMM2 /
    finalize, measured as cumulative-prefix deltas so fusion across phase
    boundaries is charged where it executes."""
    from flashinfer_tpu.ops.moe import (
        _ACTIVATIONS, moe_finalize, moe_permute)

    x, w13, w2, ids, wts, scales = _make_inputs(
        num_tokens, hidden, intermediate, num_experts, top_k, expert_dtype)
    act_fn = _ACTIVATIONS["silu"]
    e = num_experts
    h = hidden
    w8a8 = expert_dtype == "w8a8"

    def quant_rows(v):
        vf = v.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(vf), -1, keepdims=True), 1e-8) / 127.0
        return jnp.round(vf / s).astype(jnp.int8), s

    def as_xshape(v):
        """Reduce any [R, C] intermediate to the carry's [T, H] shape."""
        v = v[:num_tokens]
        if v.shape[1] >= h:
            return v[:, :h]
        return jnp.pad(v, ((0, 0), (0, h - v.shape[1])))

    def prefix(x_cur, w13, w2, ids, wts, upto):
        xs_, sort_idx, experts_sorted, _ = moe_permute(x_cur, ids)
        gs = jnp.bincount(experts_sorted, length=e).astype(jnp.int32)
        if upto == 0:
            return as_xshape(xs_)
        if w8a8:
            x8, s_a = quant_rows(xs_)
            acc = jax.lax.ragged_dot(x8, w13, gs,
                                     preferred_element_type=jnp.int32)
            inter = (acc.astype(jnp.float32) * s_a
                     * scales["w13_scale"].astype(jnp.float32)[experts_sorted])
        else:
            inter = jax.lax.ragged_dot(
                xs_.astype(w13.dtype), w13, gs,
                preferred_element_type=jnp.float32)
        if upto == 1:
            return as_xshape(inter).astype(x_cur.dtype)
        inter = act_fn(inter).astype(x_cur.dtype)
        if upto == 2:
            return as_xshape(inter)
        if w8a8:
            i8, s_i = quant_rows(inter)
            acc2 = jax.lax.ragged_dot(i8, w2, gs,
                                      preferred_element_type=jnp.int32)
            y = (acc2.astype(jnp.float32) * s_i
                 * scales["w2_scale"].astype(jnp.float32)[experts_sorted])
        else:
            y = jax.lax.ragged_dot(inter.astype(w2.dtype), w2, gs,
                                   preferred_element_type=jnp.float32)
        if upto == 3:
            return as_xshape(y).astype(x_cur.dtype)
        return moe_finalize(y, sort_idx, wts, num_tokens).astype(x_cur.dtype)

    names = ["permute", "gemm1", "act", "gemm2", "finalize"]
    times = []
    for upto in range(5):
        def step(x_cur, w13, w2, ids, wts, upto=upto):
            return prefix(x_cur, w13, w2, ids, wts, upto)
        times.append(bench_loop(step, x, w13, w2, ids, wts,
                                iters=24, base_iters=4))
    out = {"routine": "fused_moe_phases", "config": expert_dtype,
           "cumulative_ms": {n: round(t * 1e3, 3)
                             for n, t in zip(names, times)}}
    deltas = [times[0]] + [times[i] - times[i - 1] for i in range(1, 5)]
    out["phase_ms"] = {n: round(max(d, 0.0) * 1e3, 3)
                       for n, d in zip(names, deltas)}

    if w8a8:
        # Pallas-pipeline attribution (r4): glue (quant+sort+prologue) vs
        # the fused kernels — the phases above describe the XLA form only
        from flashinfer_tpu.ops.moe import fused_moe_w8a8
        from flashinfer_tpu.ops.moe_pallas import moe_expert_pipeline_w8a8

        def full_pallas(x_cur, w13, w2, ids, wts):
            return fused_moe_w8a8(
                x_cur, w13, scales["w13_scale"], w2, scales["w2_scale"],
                ids, wts, impl="pallas").astype(x_cur.dtype)

        t_full = bench_loop(full_pallas, x, w13, w2, ids, wts,
                            iters=24, base_iters=4)
        xf = x.astype(jnp.float32)
        s_a = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True),
                          1e-8) / 127.0
        x8 = jnp.round(xf / s_a).astype(jnp.int8)
        flat = ids.reshape(-1)
        sort_idx = jnp.argsort(flat)
        row_token = sort_idx // top_k
        gs = jnp.bincount(flat[sort_idx], length=e).astype(jnp.int32)
        x8s = x8[row_token]
        xss = s_a[row_token]

        def pipe_only(x8c, xss, gs, w13, s13, w2, s2):
            y = moe_expert_pipeline_w8a8(x8c, xss, gs, w13, s13, w2, s2)
            return jnp.clip(y[:, :x8c.shape[1]], -127, 127
                            ).astype(jnp.int8)

        t_pipe = bench_loop(
            pipe_only, x8s, xss, gs, w13,
            scales["w13_scale"].astype(jnp.float32), w2,
            scales["w2_scale"].astype(jnp.float32), iters=24, base_iters=4)
        out["pallas_full_ms"] = round(t_full * 1e3, 3)
        out["pallas_pipe_ms"] = round(t_pipe * 1e3, 3)
        out["pallas_glue_ms"] = round(max(t_full - t_pipe, 0.0) * 1e3, 3)
    return out
