"""Ring attention: context parallelism by KV rotation with LSE merge.

Capability parity with the reference's ring wrapper
(flashinfer/parallel_attention/parallel_wrapper.py:216-249 — P2P
isend/irecv KV rotation + online-softmax merge; composition with Ulysses in
parallel_attention.py:12-92). TPU re-design: a `lax.scan` of cp_size steps,
each step `jax.lax.ppermute`-rotating the local KV shard around the ring
(ICI neighbour exchange) and merging the partial (out, lse) states with the
associative LSE algebra (utils.merge_attention_states) — the same math as
cascade/split-KV merge (SURVEY §2.9).

The per-step block attention runs the Pallas streaming prefill kernel
(never materializing [Sq, Sk] scores — round-1 used a dense jnp block,
unusable at the long contexts ring attention exists for). With contiguous
sequence sharding a (q-shard, kv-shard) pair is one of exactly three
cases, selected by `lax.switch`: the diagonal (causal within the block),
fully visible (kv entirely in the past), or fully masked (skipped).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils import merge_attention_states

_NEG_INF = float("-inf")


def _make_block_plans(batch: int, sq: int, sk: int, hq: int, hkv: int):
    """Host-side prefill plans for the per-shard kernel calls (static:
    every rank/step uses the same shapes)."""
    import numpy as np

    from ..ops.attention.pallas_prefill import build_prefill_plan

    qo = np.arange(batch + 1, dtype=np.int64) * sq
    kv_lens = np.full(batch, sk, np.int64)
    kv_starts = np.arange(batch, dtype=np.int64) * sk
    plan_c = build_prefill_plan(qo, kv_lens, hq, hkv, causal=True,
                                kv_row_starts=kv_starts)
    plan_f = build_prefill_plan(qo, kv_lens, hq, hkv, causal=False,
                                kv_row_starts=kv_starts)
    return plan_c, plan_f


def _block_attention_kernel(
    q: jax.Array,  # [B, Sq, Hq, D]
    k: jax.Array,  # [B, Sk, Hkv, D]
    v: jax.Array,
    case: jax.Array,  # scalar i32: 0=diagonal, 1=full, 2=skip
    plans,  # (plan_causal, plan_full) from _make_block_plans
    *,
    sm_scale: float,
) -> tuple[jax.Array, jax.Array]:
    """One ring step through the Pallas prefill kernel; returns
    (out [B,Sq,Hq,D] f32, lse [B,Sq,Hq])."""
    from ..ops.attention.pallas_prefill import run_prefill

    b, sq, hq, d = q.shape
    sk, hkv = k.shape[1], k.shape[2]
    qr = q.reshape(b * sq, hq, d)
    kr = k.reshape(b * sk, hkv, d)
    vr = v.reshape(b * sk, hkv, d)

    def run(causal, plan):
        def f():
            o, lse = run_prefill(qr, kr, vr, plan, causal=causal,
                                 sm_scale=sm_scale)
            return (o.reshape(b, sq, hq, d).astype(jnp.float32),
                    lse.reshape(b, sq, hq))
        return f

    def skip():
        return (jnp.zeros((b, sq, hq, d), jnp.float32),
                jnp.full((b, sq, hq), _NEG_INF, jnp.float32))

    plan_c, plan_f = plans
    return jax.lax.switch(case, [run(True, plan_c), run(False, plan_f),
                                 skip])


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
    b, s_q, hq, d = q.shape
    s_kv, hkv = k.shape[1], k.shape[2]
    perm = [(i, (i + 1) % cp) for i in range(cp)]
    if causal and s_q != s_kv:
        raise ValueError("causal ring attention needs equal q/kv shards")
    plans = _make_block_plans(b, s_q, s_kv, hq, hkv)

    def step(carry, i):
        k_cur, v_cur, o_acc, lse_acc = carry
        src = (my - i) % cp  # whose kv shard we currently hold
        if causal:
            # 0 = diagonal (src == my), 1 = fully visible (src < my),
            # 2 = fully masked (src > my: strictly in the future)
            case = jnp.where(src == my, 0, jnp.where(src < my, 1, 2))
        else:
            case = jnp.int32(1)
        o_i, lse_i = _block_attention_kernel(
            q, k_cur, v_cur, case, plans, sm_scale=sm_scale,
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
