"""MoE routing methods.

Capability parity with reference RoutingMethodType (flashinfer/tllm_enums.py:10-31)
and the routing kernels (include/flashinfer/trtllm/fused_moe/RoutingKernel.cuh,
csrc/fused_moe/noAuxTcKernels.cu — DeepSeek-V3 no-aux top-k; fused routing
flashinfer/fused_moe/fused_routing_dsv3.py).

TPU re-design: routing is a tiny [tokens, experts] computation; jnp top_k /
masked reductions under jit are optimal (it fuses with the router GEMM).
All functions return (topk_ids [T, K] i32, topk_weights [T, K] f32).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class RoutingMethodType(enum.IntEnum):
    """Mirrors reference tllm_enums.py:10-31."""

    Default = 0
    Renormalize = 1
    DeepSeekV3 = 2
    Llama4 = 3
    RenormalizeNaive = 4
    TopK = 5
    SigmoidRenorm = 6
    MiniMax2 = 7
    Sigmoid = 8
    Unspecified = 9


def routing_topk(logits: jax.Array, top_k: int):
    """TopK: softmax over ALL experts, then pick top-k (weights not
    renormalized)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    w, ids = jax.lax.top_k(probs, top_k)
    return ids.astype(jnp.int32), w


def routing_renormalize(logits: jax.Array, top_k: int):
    """Renormalize: top-k over logits → softmax over the selected k
    (TRT-LLM 'Renormalize'; the common Mixtral/Qwen2 recipe)."""
    w, ids = jax.lax.top_k(logits.astype(jnp.float32), top_k)
    w = jax.nn.softmax(w, axis=-1)
    return ids.astype(jnp.int32), w


def routing_renormalize_naive(logits: jax.Array, top_k: int):
    """RenormalizeNaive (Qwen3): softmax over all → top-k → renormalize."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    w, ids = jax.lax.top_k(probs, top_k)
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
    return ids.astype(jnp.int32), w


def routing_llama4(logits: jax.Array, top_k: int = 1):
    """Llama4: top-1 expert, sigmoid gate weight."""
    w, ids = jax.lax.top_k(logits.astype(jnp.float32), top_k)
    return ids.astype(jnp.int32), jax.nn.sigmoid(w)


def routing_sigmoid(logits: jax.Array, top_k: int, renormalize: bool = False):
    """Sigmoid / SigmoidRenorm: sigmoid scores → top-k (→ renormalize)."""
    scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    w, ids = jax.lax.top_k(scores, top_k)
    if renormalize:
        w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
    return ids.astype(jnp.int32), w


def routing_deepseek_v3(
    logits: jax.Array,  # [T, E] router logits
    bias: jax.Array,  # [E] e_score_correction_bias
    top_k: int = 8,
    n_group: int = 8,
    topk_group: int = 4,
    routed_scaling_factor: float = 2.5,
):
    """DeepSeek-V3 no-aux-loss routing (reference noAuxTcKernels.cu /
    RoutingKernel.cuh DSv3 path):

    1. scores = sigmoid(logits); selection uses scores + bias
    2. group score = sum of top-2 (scores+bias) within each expert group
    3. keep topk_group groups, mask the rest
    4. top-k experts by (scores+bias) within kept groups
    5. weights = raw sigmoid scores of selected experts, normalized to
       sum 1, scaled by routed_scaling_factor
    """
    t, e = logits.shape
    scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    biased = scores + bias.astype(jnp.float32)[None, :]
    g = biased.reshape(t, n_group, e // n_group)
    top2 = jax.lax.top_k(g, 2)[0]
    group_scores = jnp.sum(top2, axis=-1)  # [T, n_group]
    _, top_groups = jax.lax.top_k(group_scores, topk_group)
    group_mask = jnp.zeros((t, n_group), bool)
    group_mask = group_mask.at[
        jnp.arange(t)[:, None], top_groups
    ].set(True)
    expert_mask = jnp.repeat(group_mask, e // n_group, axis=-1)
    masked = jnp.where(expert_mask, biased, -jnp.inf)
    _, ids = jax.lax.top_k(masked, top_k)
    w = jnp.take_along_axis(scores, ids, axis=-1)
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-20)
    w = w * routed_scaling_factor
    return ids.astype(jnp.int32), w


def apply_routing(
    method: RoutingMethodType,
    logits: jax.Array,
    top_k: int,
    *,
    bias: jax.Array | None = None,
    n_group: int = 8,
    topk_group: int = 4,
    routed_scaling_factor: float = 2.5,
):
    """Dispatch on RoutingMethodType (reference RoutingKernel.cuh)."""
    if method in (RoutingMethodType.Default, RoutingMethodType.TopK):
        return routing_topk(logits, top_k)
    if method == RoutingMethodType.Renormalize:
        return routing_renormalize(logits, top_k)
    if method == RoutingMethodType.RenormalizeNaive:
        return routing_renormalize_naive(logits, top_k)
    if method == RoutingMethodType.Llama4:
        return routing_llama4(logits, top_k)
    if method == RoutingMethodType.Sigmoid:
        return routing_sigmoid(logits, top_k, renormalize=False)
    if method in (RoutingMethodType.SigmoidRenorm, RoutingMethodType.MiniMax2):
        return routing_sigmoid(logits, top_k, renormalize=True)
    if method == RoutingMethodType.DeepSeekV3:
        if bias is None:
            bias = jnp.zeros(logits.shape[-1], jnp.float32)
        return routing_deepseek_v3(
            logits, bias, top_k, n_group, topk_group, routed_scaling_factor
        )
    raise ValueError(f"unsupported routing method {method}")
