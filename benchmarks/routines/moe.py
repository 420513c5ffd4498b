"""MoE benchmark routines (reference benchmarks/routines/moe.py +
MoE_benchmarks.md methodology)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.testing.utils import bench_loop

V5E_BF16_TFLOPS = 197.0


def bench_fused_moe(
    num_tokens: int = 4096, hidden: int = 2048, intermediate: int = 1408,
    num_experts: int = 8, top_k: int = 2, expert_dtype: str = "bf16",
) -> dict:
    """Fused MoE (permute → grouped GEMM ×2 → combine) TFLOP/s + tok/s.

    ``expert_dtype="int8"`` benches the production quantized-expert path
    (Pallas gmm, weights stream at int8 width)."""
    from flashinfer_tpu.ops.moe import fused_moe

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((num_tokens, hidden)), jnp.bfloat16)
    if expert_dtype == "int8":
        w13 = jnp.asarray(rng.integers(-127, 128, (
            num_experts, hidden, 2 * intermediate)), jnp.int8)
        w2 = jnp.asarray(rng.integers(-127, 128, (
            num_experts, intermediate, hidden)), jnp.int8)
        w13_scale = jnp.full((num_experts,), 4e-4, jnp.float32)
        w2_scale = jnp.full((num_experts,), 4e-4, jnp.float32)
    else:
        w13 = jnp.asarray(
            rng.standard_normal((num_experts, hidden, 2 * intermediate))
            * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(
            rng.standard_normal((num_experts, intermediate, hidden)) * 0.05,
            jnp.bfloat16)
        w13_scale = w2_scale = None
    ids = jnp.asarray(rng.integers(0, num_experts, (num_tokens, top_k)),
                      jnp.int32)
    wts = jnp.full((num_tokens, top_k), 1.0 / top_k, jnp.float32)

    def step(x_cur, w13, w2, ids, wts):
        return fused_moe(x_cur, w13, w2, ids, wts, w13_scale=w13_scale,
                         w2_scale=w2_scale).astype(x_cur.dtype)

    dt = bench_loop(step, x, w13, w2, ids, wts, iters=16)
    flops = 2 * num_tokens * top_k * hidden * 3 * intermediate
    tf = flops / dt / 1e12
    return {
        "routine": "fused_moe", "ms": round(dt * 1e3, 3),
        "config": f"t{num_tokens} e{num_experts}x{hidden}x{intermediate} "
                  f"top{top_k} {expert_dtype}",
        "metric": "TFLOP/s", "value": round(tf, 1),
        "vs_roofline": round(tf / V5E_BF16_TFLOPS, 4),
        "tokens_per_s": round(num_tokens / dt),
    }
