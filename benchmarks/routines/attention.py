"""Attention benchmark routines (reference benchmarks/routines/attention.py)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.testing.utils import bench_loop

V5E_HBM_GBS = 819.0
V5E_BF16_TFLOPS = 197.0


def bench_decode_attention(
    batch: int = 64, kv_len: int = 2048, page_size: int = 32,
    num_q_heads: int = 32, num_kv_heads: int = 8, head_dim: int = 128,
) -> dict:
    """Paged decode attention: achieved HBM bandwidth vs roofline."""
    from flashinfer_tpu.ops.attention.pallas_decode import (
        paged_decode_attention_combined,
    )

    pages_per = kv_len // page_size
    num_pages = batch * pages_per
    rng = np.random.default_rng(0)
    kv = jnp.asarray(
        rng.standard_normal((num_pages, 2, page_size, num_kv_heads, head_dim)),
        jnp.bfloat16,
    )
    q = jnp.asarray(rng.standard_normal((batch, num_q_heads, head_dim)),
                    jnp.bfloat16)
    pt = jnp.asarray(np.arange(num_pages, dtype=np.int32).reshape(
        batch, pages_per))
    kl = jnp.full((batch,), kv_len, jnp.int32)

    def step(q_cur, kv, pt, kl):
        o, _ = paged_decode_attention_combined(q_cur, kv, pt, kl)
        return o

    dt = bench_loop(step, q, kv, pt, kl, iters=32)
    kv_bytes = 2 * batch * kv_len * num_kv_heads * head_dim * 2
    gbs = kv_bytes / dt / 1e9
    return {
        "routine": "decode_attention", "ms": round(dt * 1e3, 3),
        "metric": "GB/s", "value": round(gbs, 1),
        "vs_roofline": round(gbs / V5E_HBM_GBS, 4),
    }


def bench_prefill_attention(
    qo_len: int = 4096, num_q_heads: int = 32, num_kv_heads: int = 8,
    head_dim: int = 128,
) -> dict:
    """Ragged causal prefill: TFLOP/s vs MXU roofline."""
    from flashinfer_tpu.ops.attention.pallas_prefill import (
        build_prefill_plan, run_prefill,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((qo_len, num_q_heads, head_dim)),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((qo_len, num_kv_heads, head_dim)),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((qo_len, num_kv_heads, head_dim)),
                    jnp.bfloat16)
    plan = build_prefill_plan(
        np.asarray([0, qo_len]), np.asarray([qo_len]), num_q_heads,
        num_kv_heads, causal=True, kv_row_starts=np.asarray([0]),
    )

    def step(q_cur, k, v):
        o, _ = run_prefill(q_cur, k, v, plan, causal=True)
        return o.astype(q_cur.dtype)

    dt = bench_loop(step, q, k, v, iters=16)
    flops = 2 * 2 * num_q_heads * head_dim * (qo_len * (qo_len + 1) / 2)
    tf = flops / dt / 1e12
    return {
        "routine": "prefill_attention", "ms": round(dt * 1e3, 3),
        "metric": "TFLOP/s", "value": round(tf, 1),
        "vs_roofline": round(tf / V5E_BF16_TFLOPS, 4),
    }
