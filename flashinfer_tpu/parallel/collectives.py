"""TP collectives and fused allreduce patterns.

Capability parity with the reference's custom allreduce stack
(flashinfer/comm/allreduce.py:547 `allreduce_fusion`, trtllm_allreduce.cuh
one-shot/two-shot strategies, vllm_custom_all_reduce.cuh) — re-designed for
TPU: XLA collectives (`psum`, `reduce_scatter`+`all_gather`) over ICI inside
`shard_map`; the one-shot/two-shot strategy distinction maps to
psum vs reduce_scatter→all_gather (XLA picks ring/tree over ICI itself).
The "fusion" epilogues (residual add + RMSNorm [+ FP8 quant]) are plain
jnp ops after the collective that XLA fuses into one pass over the data —
the whole point of the reference's fused kernels, for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norm import rmsnorm


def all_reduce(x: jax.Array, axis: str) -> jax.Array:
    """Sum-allreduce over a mesh axis (inside shard_map)."""
    return jax.lax.psum(x, axis)


def reduce_scatter(x: jax.Array, axis: str, *, scatter_dim: int = 0) -> jax.Array:
    """Sum-reduce-scatter over a mesh axis (inside shard_map)."""
    return jax.lax.psum_scatter(
        x, axis, scatter_dimension=scatter_dim, tiled=True
    )


def all_gather(x: jax.Array, axis: str, *, gather_dim: int = 0) -> jax.Array:
    """All-gather over a mesh axis (inside shard_map)."""
    return jax.lax.all_gather(x, axis, axis=gather_dim, tiled=True)


def all_to_all(
    x: jax.Array, axis: str, *, split_dim: int, concat_dim: int
) -> jax.Array:
    """All-to-all over a mesh axis (inside shard_map)."""
    return jax.lax.all_to_all(
        x, axis, split_axis=split_dim, concat_axis=concat_dim, tiled=True
    )


# Fusion patterns of reference AllReduceFusionPattern
# (flashinfer/comm/allreduce.py; trtllm_allreduce_fusion.cuh).
_PATTERNS = (
    "allreduce",
    "allreduce_residual_rmsnorm",
    "allreduce_residual_rmsnorm_fp8_quant",
)


def allreduce_fusion(
    x: jax.Array,
    axis: str,
    *,
    pattern: str = "allreduce_residual_rmsnorm",
    residual: jax.Array | None = None,
    norm_weight: jax.Array | None = None,
    eps: float = 1e-6,
    fp8_scale: jax.Array | None = None,
    use_oneshot: bool | None = None,  # accepted for parity; XLA owns strategy
):
    """Allreduce with fused epilogue (reference allreduce.py:547).

    Returns ``reduced`` for pattern "allreduce";
    ``(normed, prenorm_residual)`` for "...residual_rmsnorm";
    ``(fp8_out, prenorm_residual)`` for the quantizing variant.
    Must be called inside shard_map over ``axis``.
    """
    del use_oneshot
    if pattern not in _PATTERNS:
        raise ValueError(f"unknown fusion pattern {pattern!r}; choices {_PATTERNS}")
    reduced = jax.lax.psum(x, axis)
    if pattern == "allreduce":
        return reduced
    if residual is None or norm_weight is None:
        raise ValueError("residual and norm_weight required for fused patterns")
    prenorm = reduced + residual
    normed = rmsnorm(prenorm, norm_weight, eps=eps)
    if pattern == "allreduce_residual_rmsnorm":
        return normed, prenorm
    scale = fp8_scale if fp8_scale is not None else jnp.float32(1.0)
    q = jnp.clip(
        normed.astype(jnp.float32) / scale, -448.0, 448.0
    ).astype(jnp.float8_e4m3fn)
    return q, prenorm
