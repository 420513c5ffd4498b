"""Expert-parallel MoE dispatch / combine over a mesh axis.

Capability parity with the reference MoE-EP runtime (flashinfer/moe_ep/ —
Split mode dispatch→expert-compute→combine, `MoeAlltoAll`
comm/trtllm_moe_alltoall.py, LL/HT algorithms with bounded per-rank
buffers). TPU re-design: capacity-bounded dense all-to-all inside
shard_map over the ``ep`` axis — the static-shape analog of the
reference's pre-sized symmetric-memory buffers
(MoE_benchmarks.md "128 tok/rank" == the same capacity bound). Overflow
beyond capacity is dropped, exactly like capacity-bounded EP serving.

Layout: each rank owns ``E_local = num_experts / ep_size`` consecutive
experts and ``T_local`` tokens. Dispatch routes each (token, k) assignment
to the rank owning its expert; combine routes the expert outputs back and
applies routing weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.activation import silu_and_mul


def _plan_dispatch(topk_ids: jax.Array, ep_size: int, e_local: int, cap: int):
    """Static-shape send plan: slot[t,k] = position in the dest-rank buffer.

    Returns (dest [T,K], slot [T,K], ok [T,K]) where ok marks assignments
    that fit under capacity (first-come order).
    """
    t, k = topk_ids.shape
    dest = topk_ids // e_local  # [T, K]
    flat = dest.reshape(-1)
    # position of each assignment within its destination group
    onehot = jax.nn.one_hot(flat, ep_size, dtype=jnp.int32)  # [T*K, ep]
    pos = jnp.cumsum(onehot, axis=0) - onehot  # exclusive prefix per dest
    slot = jnp.take_along_axis(pos, flat[:, None], axis=1)[:, 0]  # [T*K]
    ok = slot < cap
    return dest, slot.reshape(t, k), ok.reshape(t, k)


def ep_dispatch(
    hidden: jax.Array,  # [T_local, H]
    topk_ids: jax.Array,  # [T_local, K] global expert ids
    axis: str,
    *,
    num_experts: int,
    capacity: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Route tokens to expert-owning ranks (inside shard_map over ``axis``).

    Returns ``(x_recv [ep*cap, H], expert_local [ep*cap], valid [ep*cap],
    slot [T,K], ok [T,K])`` — the last two feed :func:`ep_combine`.
    """
    ep = jax.lax.axis_size(axis)
    e_local = num_experts // ep
    t, k = topk_ids.shape
    h = hidden.shape[1]

    dest, slot, ok = _plan_dispatch(topk_ids, ep, e_local, capacity)

    send_x = jnp.zeros((ep, capacity, h), hidden.dtype)
    send_eid = jnp.full((ep, capacity), -1, jnp.int32)
    d = jnp.where(ok, dest, 0)
    s = jnp.where(ok, slot, capacity - 1)  # dummies overwrite a masked slot
    tok_idx = jnp.broadcast_to(jnp.arange(t)[:, None], (t, k))
    send_x = send_x.at[d, s].set(
        jnp.where(ok[..., None], hidden[tok_idx], 0), mode="drop"
    )
    send_eid = send_eid.at[d, s].set(
        jnp.where(ok, topk_ids % e_local, -1), mode="drop"
    )

    # all-to-all: dim0 = destination rank → dim0 = source rank
    x_recv = jax.lax.all_to_all(send_x, axis, split_axis=0, concat_axis=0,
                                tiled=True)
    eid_recv = jax.lax.all_to_all(send_eid, axis, split_axis=0, concat_axis=0,
                                  tiled=True)
    x_recv = x_recv.reshape(ep * capacity, h)
    eid_recv = eid_recv.reshape(ep * capacity)
    valid = eid_recv >= 0
    return x_recv, jnp.where(valid, eid_recv, 0), valid, slot, ok


def ep_combine(
    y_local: jax.Array,  # [ep*cap, H] expert outputs in recv order
    valid: jax.Array,  # [ep*cap]
    slot: jax.Array,  # [T, K] from dispatch
    ok: jax.Array,  # [T, K]
    topk_weights: jax.Array,  # [T, K]
    dest: jax.Array,  # [T, K] destination ranks (topk_ids // e_local)
    axis: str,
    *,
    capacity: int,
) -> jax.Array:
    """Return expert outputs to token owners and reduce with weights."""
    ep = jax.lax.axis_size(axis)
    h = y_local.shape[1]
    y = jnp.where(valid[:, None], y_local, 0).reshape(ep, capacity, h)
    # reverse trip: dim0 goes back to the source ranks
    y_back = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0, tiled=True)
    # y_back[r, c] = output for the assignment this rank queued at slot c
    # of its send buffer to rank r.
    gathered = y_back[jnp.where(ok, dest, 0), jnp.where(ok, slot, 0)]  # [T,K,H]
    w = jnp.where(ok, topk_weights, 0.0).astype(jnp.float32)
    return jnp.einsum("tkh,tk->th", gathered.astype(jnp.float32), w)


def moe_ep_forward(
    hidden: jax.Array,  # [T_local, H]
    topk_ids: jax.Array,  # [T_local, K]
    topk_weights: jax.Array,  # [T_local, K]
    w13_local: jax.Array,  # [E_local, H, 2I] this rank's experts
    w2_local: jax.Array,  # [E_local, I, H]
    axis: str,
    *,
    num_experts: int,
    capacity: int | None = None,
    activation=silu_and_mul,
) -> jax.Array:
    """Full EP MoE layer: dispatch → local grouped GEMM → combine.

    The local expert compute sorts received tokens by expert and uses
    `lax.ragged_dot` (MXU grouped matmul), mirroring the reference's
    dispatch→grouped-GEMM→combine Split pipeline (moe_ep/layer.py:19).
    """
    ep_static = w13_local.shape[0] and num_experts // w13_local.shape[0]
    t, k = topk_ids.shape
    if capacity is None:
        capacity = max(1, (t * k * 2) // max(ep_static, 1))
    e_local = w13_local.shape[0]

    x_recv, eid, valid, slot, ok = ep_dispatch(
        hidden, topk_ids, axis, num_experts=num_experts, capacity=capacity
    )
    # sort received tokens by local expert for the ragged grouped GEMM
    sort_key = jnp.where(valid, eid, e_local)  # invalid rows sort last
    order = jnp.argsort(sort_key)
    x_sorted = x_recv[order]
    group_sizes = jnp.bincount(
        jnp.where(valid, eid, e_local), length=e_local + 1
    ).astype(jnp.int32)[:e_local]

    inter = jax.lax.ragged_dot(
        x_sorted.astype(w13_local.dtype), w13_local, group_sizes,
        preferred_element_type=jnp.float32,
    )
    inter = activation(inter)
    y_sorted = jax.lax.ragged_dot(
        inter.astype(w2_local.dtype), w2_local, group_sizes,
        preferred_element_type=jnp.float32,
    )
    y = jnp.zeros_like(y_sorted).at[order].set(y_sorted)

    e_local_div = num_experts // jax.lax.axis_size(axis)
    dest = topk_ids // e_local_div
    out = ep_combine(
        y.astype(hidden.dtype), valid, slot, ok, topk_weights, dest, axis,
        capacity=capacity,
    )
    return out.astype(hidden.dtype)
