"""Ring attention: context parallelism by KV rotation with LSE merge.

Capability parity with the reference's ring wrapper
(flashinfer/parallel_attention/parallel_wrapper.py:216-249 — P2P
isend/irecv KV rotation + online-softmax merge; composition with Ulysses in
parallel_attention.py:12-92). TPU re-design: a `lax.scan` of cp_size steps,
each step `jax.lax.ppermute`-rotating the local KV shard around the ring
(ICI neighbour exchange) and merging the partial (out, lse) states with the
associative LSE algebra (utils.merge_attention_states) — the same math as
cascade/split-KV merge (SURVEY §2.9).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils import merge_attention_states

_NEG_INF = float("-inf")


def _block_attention(
    q: jax.Array,  # [B, Sq, Hq, D] (f32 math inside)
    k: jax.Array,  # [B, Sk, Hkv, D]
    v: jax.Array,
    q_offset: jax.Array,  # scalar i32: global position of q[0]
    k_offset: jax.Array,  # scalar i32: global position of k[0]
    *,
    causal: bool,
    sm_scale: float,
) -> tuple[jax.Array, jax.Array]:
    """Dense attention of a q block vs one kv block; returns (out, lse)."""
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    qf = q.astype(jnp.float32) * sm_scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # [B, Hkv, G, Sq, Sk]
    qf = qf.reshape(b, sq, hkv, group, d)
    s = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf)
    if causal:
        pos_q = q_offset + jnp.arange(sq)[:, None]
        pos_k = k_offset + jnp.arange(k.shape[1])[None, :]
        mask = pos_q >= pos_k  # [Sq, Sk]
        s = jnp.where(mask[None, None, None], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(s - m_safe)
    p = jnp.where(jnp.isneginf(s), 0.0, p)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhgqk,bkhd->bhgqd", p, vf)
    o = o / jnp.where(l == 0.0, 1.0, l)
    lse = jnp.where(l == 0.0, _NEG_INF, m_safe + jnp.log(jnp.where(l == 0, 1, l)))
    # back to [B, Sq, Hq, D] / [B, Sq, Hq]
    o = o.transpose(0, 3, 1, 2, 4).reshape(b, sq, hq, d)
    lse = lse[..., 0].transpose(0, 3, 1, 2).reshape(b, sq, hq)
    return o, lse


def ring_attention(
    q: jax.Array,  # [B, Sq_local, Hq, D] — local q shard
    k: jax.Array,  # [B, Skv_local, Hkv, D] — local kv shard
    v: jax.Array,
    axis: str,  # cp mesh axis (inside shard_map)
    *,
    causal: bool = True,
    sm_scale: float | None = None,
) -> jax.Array:
    """Ring (context-parallel) attention over mesh axis ``axis``.

    Sequence is sharded contiguously over the axis: device i holds global
    positions ``[i*S_local, (i+1)*S_local)`` for both q and kv. Each of the
    cp_size scan steps attends q against the currently-held kv shard, then
    rotates kv to the next neighbour with ppermute.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    cp = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    s_q = q.shape[1]
    s_kv = k.shape[1]
    perm = [(i, (i + 1) % cp) for i in range(cp)]

    q_offset = my * s_q

    def step(carry, i):
        k_cur, v_cur, o_acc, lse_acc = carry
        src = (my - i) % cp  # whose kv shard we currently hold
        o_i, lse_i = _block_attention(
            q, k_cur, v_cur, q_offset, src * s_kv,
            causal=causal, sm_scale=sm_scale,
        )
        o_acc, lse_acc = merge_attention_states(o_acc, lse_acc, o_i, lse_i)
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (k_nxt, v_nxt, o_acc, lse_acc), None

    o0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full(q.shape[:-1], _NEG_INF, jnp.float32)
    (_, _, o, _), _ = jax.lax.scan(
        step, (k, v, o0, lse0), jnp.arange(cp), length=cp
    )
    return o.astype(q.dtype)
