"""Linear-attention / SSM family: Mamba selective-state-update, Gated
DeltaNet (GDN), and Kimi Delta Attention (KDA).

Capability parity with reference:
* `selective_state_update` flashinfer/mamba/selective_state_update.py:104
  (kernel csrc/selective_state_update.cu:682) — Mamba2 generation step
  with state-cache slot indexing, multi-token (MTP), dt softplus/bias,
  z-gating, GQA-style B/C groups.
* `chunk_gated_delta_rule` flashinfer/gdn_prefill.py:119 (Qwen3-Next GDN)
  — gated delta-rule linear attention over packed varlen sequences with
  initial/final state I/O and state-pool indexing.
* `recurrent_kda` flashinfer/kda.py:38 — per-K-dimension gated delta rule
  (Kimi), decode + prefill.

TPU re-design: the recurrences are `lax.scan`s whose per-step body is a
rank-1 state update batched over (batch, heads) — the VPU handles the
outer products while the state stays resident in registers/VMEM across
the scan (XLA keeps scan carries on-chip). Varlen packing uses segment
resets inside one scan instead of per-sequence kernel launches, so one
compilation covers every batch shape.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Mamba selective state update
# ---------------------------------------------------------------------------


def selective_state_update(
    state: jax.Array,  # [cache, H, dim, dstate] (or [cache, dim, dstate])
    x: jax.Array,  # [B, H, dim] or [B, T, H, dim]
    dt: jax.Array,  # same layout as x
    A: jax.Array,  # [H, dim, dstate] (or [dim, dstate])
    B: jax.Array,  # [B, G, dstate] or [B, T, G, dstate]
    C: jax.Array,  # same layout as B
    D: jax.Array | None = None,  # [H, dim] (or [dim])
    z: jax.Array | None = None,  # same layout as x
    dt_bias: jax.Array | None = None,  # [H, dim] (or [dim])
    dt_softplus: bool = False,
    state_batch_indices: jax.Array | None = None,  # [B]
    pad_slot_id: int = -1,
    dst_state_batch_indices: jax.Array | None = None,  # [B]
    disable_state_update: bool = False,
    **_unsupported,
) -> tuple[jax.Array, jax.Array]:
    """Mamba2 generation-step state update; returns (out, new_state).

    Recurrence per (head h, channel d):
      ``dt' = softplus(dt + dt_bias)`` (if dt_softplus)
      ``state' = state * exp(dt' * A) + dt' * x * B``
      ``y = <state', C> + D * x``,  gated by ``y *= silu(z)``.

    Functional twist vs the reference (which mutates ``state`` in place):
    the updated state cache is *returned*; under jit, donate the argument
    for true in-place semantics.
    """
    squeeze_head = state.ndim == 3
    if squeeze_head:
        state = state[:, None]
        A = A[None] if A.ndim == 2 else A
        if D is not None and D.ndim == 1:
            D = D[None]
        if dt_bias is not None and dt_bias.ndim == 1:
            dt_bias = dt_bias[None]
        x = x[:, None] if x.ndim == 2 else x
        dt = dt[:, None] if dt.ndim == 2 else dt
        z = z[:, None] if (z is not None and z.ndim == 2) else z
        B = B[:, None] if B.ndim == 2 else B
        C = C[:, None] if C.ndim == 2 else C

    multi_token = x.ndim == 4  # [B, T, H, dim]
    if not multi_token:
        x, dt, B, C = (t[:, None] for t in (x, dt, B, C))
        if z is not None:
            z = z[:, None]

    batch = x.shape[0]
    nheads, dim, dstate = A.shape[0], x.shape[-1], A.shape[-1]
    ngroups = B.shape[2]
    heads_per_group = nheads // ngroups

    idx = (
        state_batch_indices
        if state_batch_indices is not None
        else jnp.arange(batch, dtype=jnp.int32)
    )
    dst_idx = dst_state_batch_indices if dst_state_batch_indices is not None else idx
    s0 = state[jnp.where(idx < 0, 0, idx)].astype(jnp.float32)  # [B,H,dim,ds]

    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)[None, None]
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    Af = A.astype(jnp.float32)  # [H, dim, ds]
    Bg = jnp.repeat(B.astype(jnp.float32), heads_per_group, axis=2)  # [B,T,H,ds]
    Cg = jnp.repeat(C.astype(jnp.float32), heads_per_group, axis=2)

    def step(s, t):
        x_t, dt_t, b_t, c_t = t  # [B,H,dim], [B,H,dim], [B,H,ds], [B,H,ds]
        da = jnp.exp(dt_t[..., None] * Af[None])  # [B,H,dim,ds]
        dbx = (dt_t * x_t)[..., None] * b_t[:, :, None, :]  # [B,H,dim,ds]
        s_new = s * da + dbx
        y = jnp.einsum("bhds,bhs->bhd", s_new, c_t)
        return s_new, y

    xs = (
        jnp.moveaxis(xf, 1, 0),
        jnp.moveaxis(dtf, 1, 0),
        jnp.moveaxis(Bg, 1, 0),
        jnp.moveaxis(Cg, 1, 0),
    )
    s_final, ys = jax.lax.scan(step, s0, xs)
    y = jnp.moveaxis(ys, 0, 1)  # [B,T,H,dim]
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None] * xf
    if z is not None:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))

    if disable_state_update:
        new_state = state
    else:
        ok = (idx >= 0) if pad_slot_id is not None else jnp.ones(batch, bool)
        safe_dst = jnp.where(dst_idx < 0, 0, dst_idx)
        upd = jnp.where(
            ok[:, None, None, None], s_final, state[safe_dst].astype(jnp.float32)
        )
        new_state = state.at[safe_dst].set(upd.astype(state.dtype))

    if not multi_token:
        y = y[:, 0]
    out = y.astype(x.dtype)
    if squeeze_head:
        out = out[..., 0, :] if not multi_token and out.ndim == 3 else out.squeeze(-2)
        new_state = new_state[:, 0]
    return out, new_state


# ---------------------------------------------------------------------------
# Checkpointing SSU (MTP replay)
# ---------------------------------------------------------------------------


def checkpointing_ssu(
    state: jax.Array,  # [cache, H, dim, dstate] committed checkpoint state
    x: jax.Array,  # [B, T, H, dim] new (speculative) token inputs
    dt: jax.Array,  # [B, T, H] or [B, T, H, dim] (tied across dim)
    A: jax.Array,  # [H, dim, dstate]
    B: jax.Array,  # [B, T, G, dstate]
    C: jax.Array,  # [B, T, G, dstate]
    x_cache: jax.Array,  # [cache, H, R, dim] ring of cached x
    B_cache: jax.Array,  # [cache, G, R, dstate] ring of cached B
    dt_cache: jax.Array,  # [cache, H, R] f32 ring of PROCESSED dt
    ring_start: jax.Array,  # [cache] i32: oldest live ring row per slot
    prev_num_accepted_tokens: jax.Array,  # [cache] i32: old tokens to replay
    D: jax.Array | None = None,  # [H, dim]
    z: jax.Array | None = None,  # [B, T, H, dim]
    dt_bias: jax.Array | None = None,  # [H] or [H, dim] (tied)
    dt_softplus: bool = False,
    state_batch_indices: jax.Array | None = None,  # [B] batch -> cache slot
    pad_slot_id: int = -1,
    state_scale: jax.Array | None = None,  # [cache, H, dim] f32 (int8 state)
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array,
           jax.Array | None]:
    """Checkpointing selective-state-update with MTP replay.

    Capability parity with the reference's
    `flashinfer/mamba/checkpointing_ssu.py:226` (kernel
    `csrc/checkpointing_ssu.cu:612`): the state cache holds a COMMITTED
    checkpoint; speculative (multi-token-prediction) steps never write it.
    Each call, per cache slot:

      1. **Replay**: the `prev_num_accepted_tokens[slot]` oldest live ring
         rows — the tokens the verifier accepted from the previous
         speculative round — are re-applied to the checkpoint state, which
         is committed (returned). Replay uses the *processed* dt stored in
         `dt_cache` (decays are recomputed; prefix sums are not
         ring-shift-invariant, so none are cached).
      2. **Speculate**: the `T` new tokens are processed from the replayed
         state to produce `out`, and their (x, B, dt') are written into the
         ring at rows `(ring_start + pnat + i) mod R` so the next call can
         replay whichever prefix gets accepted. The new state they imply is
         NOT committed.

    The logical replay window is `R - T` (same flush rule as the
    reference: callers must flush once `pnat + 2T > R`).

    TPU re-design: one `lax.scan` over the `R + T` ring+new token axis with
    per-slot validity masks (replay rows gathered by a mod-R index vector,
    so arbitrary `ring_start`/`pnat` combinations ride one compiled
    program); the state stays in the scan carry on-chip. Quantized (int8)
    state is decoded via `state_scale` on entry and re-quantized
    per-(slot, head, dim) on commit, mirroring the reference's
    QUANT_MAX=127 contract.

    Functional contract (vs the reference's in-place mutation): returns
    ``(out, new_state, new_x_cache, new_B_cache, new_dt_cache,
    new_ring_start, new_state_scale)``; donate the cache arguments under
    jit for in-place updates. `new_ring_start = (ring_start + pnat) % R` —
    the host-side bookkeeping the reference leaves to the caller is folded
    into the return values.
    """
    cache, nheads, dim, dstate = state.shape
    batch, T = x.shape[0], x.shape[1]
    ngroups = B.shape[2]
    R = x_cache.shape[2]
    # Input contract (reference wrapper checks, advisor r2 low). Note one
    # documented divergence from the reference checkpoint policy: the
    # reference requantizes the int8/fp8 state only on window flush; here
    # the commit requantizes every call, adding one extra quantization
    # round per MTP step from an already-quantized base (bounded by 1 ULP
    # of the per-(slot,head,dim) scale per round).
    if state.dtype in (jnp.int8, jnp.float8_e4m3fn) and state_scale is None:
        raise ValueError("quantized state dtype requires state_scale")
    if state_scale is not None and state.dtype not in (
            jnp.int8, jnp.float8_e4m3fn):
        raise ValueError("state_scale requires an int8/fp8 state dtype")
    if nheads % ngroups:
        raise ValueError(f"nheads={nheads} not divisible by ngroups={ngroups}")
    if R < 2 * T:
        raise ValueError(
            f"ring length R={R} must be >= 2*T={2 * T} (flush rule)")
    heads_per_group = nheads // ngroups
    if dt.ndim == 4:  # tie_hdim: dt is per-head, broadcast across dim
        dt = dt[..., 0]

    idx = (
        state_batch_indices
        if state_batch_indices is not None
        else jnp.arange(batch, dtype=jnp.int32)
    )
    valid = idx != pad_slot_id
    safe = jnp.where(valid, idx, 0)  # for GATHERS only
    # Writes route pad lanes OUT OF BOUNDS and scatter with mode='drop':
    # clamping them to slot 0 would let a pad lane's stale values race a
    # real lane assigned slot 0 (advisor r2 high: slot-0 state corruption).
    safe_dst = jnp.where(valid, idx, cache).astype(jnp.int32)

    # processed dt for the NEW tokens
    dtf = dt.astype(jnp.float32)  # [B, T, H]
    if dt_bias is not None:
        bias = dt_bias.astype(jnp.float32)
        bias = bias[:, 0] if bias.ndim == 2 else bias  # tied across dim
        dtf = dtf + bias[None, None]
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)

    Af = A.astype(jnp.float32)  # [H, dim, ds]
    s0 = state[safe].astype(jnp.float32)  # [B, H, dim, ds]
    if state_scale is not None:
        s0 = s0 * state_scale[safe][..., None]

    # --- gather the replay window from the ring --------------------------
    pnat = prev_num_accepted_tokens[safe]  # [B]
    start = ring_start[safe]  # [B]
    offs = jnp.arange(R, dtype=jnp.int32)  # replay window offsets
    rows = (start[:, None] + offs[None]) % R  # [B, R]
    rep_mask = offs[None] < pnat[:, None]  # [B, R]
    bidx = jnp.arange(batch)[:, None]
    xr = x_cache[safe][bidx, :, rows].astype(jnp.float32)  # [B, R, H, dim]
    br = B_cache[safe][bidx, :, rows].astype(jnp.float32)  # [B, R, G, ds]
    dtr = dt_cache[safe][bidx, :, rows].astype(jnp.float32)  # [B, R, H]

    def _apply(s, x_t, b_t, dt_t, live):
        # s: [B,H,dim,ds]; x_t: [B,H,dim]; b_t: [B,H,ds]; dt_t: [B,H]
        da = jnp.exp(dt_t[..., None, None] * Af[None])  # [B,H,dim,ds]
        dbx = (dt_t[..., None] * x_t)[..., None] * b_t[:, :, None, :]
        s_new = s * da + dbx
        return jnp.where(live[:, None, None, None], s_new, s)

    def rep_step(s, t):
        x_t, b_t, dt_t, live = t
        b_t = jnp.repeat(b_t, heads_per_group, axis=1)  # [B,H,ds]
        return _apply(s, x_t, b_t, dt_t, live), None

    s_replayed, _ = jax.lax.scan(
        rep_step,
        s0,
        (
            jnp.moveaxis(xr, 1, 0),
            jnp.moveaxis(br, 1, 0),
            jnp.moveaxis(dtr, 1, 0),
            jnp.moveaxis(rep_mask, 1, 0),
        ),
    )

    # --- speculate over the T new tokens (not committed) -----------------
    xf = x.astype(jnp.float32)
    Bg = jnp.repeat(B.astype(jnp.float32), heads_per_group, axis=2)
    Cg = jnp.repeat(C.astype(jnp.float32), heads_per_group, axis=2)

    def new_step(s, t):
        x_t, b_t, c_t, dt_t = t
        s_new = _apply(s, x_t, b_t, dt_t, jnp.ones((batch,), bool))
        y = jnp.einsum("bhds,bhs->bhd", s_new, c_t)
        return s_new, y

    _, ys = jax.lax.scan(
        new_step,
        s_replayed,
        (
            jnp.moveaxis(xf, 1, 0),
            jnp.moveaxis(Bg, 1, 0),
            jnp.moveaxis(Cg, 1, 0),
            jnp.moveaxis(dtf, 1, 0),
        ),
    )
    y = jnp.moveaxis(ys, 0, 1)  # [B,T,H,dim]
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None] * xf
    if z is not None:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))
    out = y.astype(x.dtype)

    # --- commit: replayed state + ring writes + advanced ring head -------
    if state_scale is not None:
        amax = jnp.max(jnp.abs(s_replayed), axis=-1)  # [B,H,dim]
        qmax = 127.0 if state.dtype == jnp.int8 else 448.0
        new_scale_rows = jnp.maximum(amax / qmax, 1e-12)
        scaled = s_replayed / new_scale_rows[..., None]
        # int8 commit rounds to the integer grid (reference cvt_rni_sat_s8);
        # fp8 encode is a plain RN cast — integer-rounding first would zero
        # every scaled magnitude < 0.5 (advisor r2 medium)
        if state.dtype == jnp.int8:
            scaled = jnp.round(scaled)
        s_commit = jnp.clip(scaled, -qmax, qmax)
        new_state_scale = state_scale.at[safe_dst].set(
            new_scale_rows, mode="drop")
    else:
        s_commit = s_replayed
        new_state_scale = None
    new_state = state.at[safe_dst].set(
        s_commit.astype(state.dtype), mode="drop")

    new_start = ((start + pnat) % R).astype(ring_start.dtype)
    new_ring_start = ring_start.at[safe_dst].set(new_start, mode="drop")
    woffs = jnp.arange(T, dtype=jnp.int32)
    wrows = ((start + pnat)[:, None] + woffs[None]) % R  # [B, T]

    def _ring_set(ring, vals):
        # ring: [cache, H', R, d']; vals: [B, T, H', d'] — scatter new rows;
        # pad lanes index out of bounds and drop
        return ring.at[safe_dst[:, None], :, wrows].set(
            vals.astype(ring.dtype), mode="drop")

    new_x_cache = _ring_set(x_cache, x)
    new_B_cache = _ring_set(B_cache, B)
    dt_vals = dtf[..., None]  # [B, T, H, 1]
    new_dt_cache = _ring_set(dt_cache[..., None], dt_vals)[..., 0]

    return (out, new_state, new_x_cache, new_B_cache, new_dt_cache,
            new_ring_start, new_state_scale)


# ---------------------------------------------------------------------------
# Gated delta rule (GDN / Qwen3-Next) and KDA (Kimi)
# ---------------------------------------------------------------------------


def _l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, -1, keepdims=True) + eps)


def _delta_rule_scan(
    q: jax.Array,  # [B, T, H, K] f32
    k: jax.Array,  # [B, T, H, K] f32
    v: jax.Array,  # [B, T, H, V] f32
    g: jax.Array,  # [B, T, H] (scalar gate) or [B, T, H, K] (vector gate), log-space
    beta: jax.Array,  # [B, T, H]
    s0: jax.Array,  # [B, H, K, V] f32
    scale: float,
    seg_start: jax.Array | None,  # [B, T] bool: True resets state (varlen packing)
    *,
    init_pool: jax.Array | None = None,  # [S, H, K, V]: per-seq reset state
    seg_idx: jax.Array | None = None,  # [T] i32 sequence of each token
    num_finals: int | None = None,  # collect [num_finals, H, K, V] end states
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """Core recurrence shared by GDN (scalar gate) and KDA (vector gate):
      S_t = decay_t ⊙ S_{t-1};  S_t += β_t k_t ⊗ (v_t − S_tᵀ k_t);  o_t = (q_t·S_t)·scale

    Packed-varlen extensions (both need ``seg_idx``; batch must be 1, the
    packed layout): ``init_pool`` seeds each sequence's state at its reset
    boundary (reference fla ``initial_state`` semantics), and
    ``num_finals`` captures every sequence's end state by overwriting
    ``finals[seg_idx_t]`` after each step — segments are contiguous, so
    the surviving write IS the final state.
    """
    vector_gate = g.ndim == 4

    def step(carry, t):
        s, finals = carry
        q_t, k_t, v_t, g_t, b_t, reset, sid = t
        if seg_start is not None:
            s_reset = (
                init_pool[sid][None]
                if init_pool is not None
                else jnp.zeros_like(s)
            )
            s = jnp.where(reset[:, None, None, None], s_reset, s)
        decay = jnp.exp(g_t)
        if vector_gate:
            s = s * decay[..., None]  # [B,H,K,1] broadcast over V
        else:
            s = s * decay[..., None, None]
        pred = jnp.einsum("bhkv,bhk->bhv", s, k_t)
        err = (v_t - pred) * b_t[..., None]
        s = s + k_t[..., None] * err[..., None, :]  # k ⊗ err
        o_t = jnp.einsum("bhkv,bhk->bhv", s, q_t) * scale
        if finals is not None:
            finals = jax.lax.dynamic_update_index_in_dim(
                finals, s[0], sid, 0)
        return (s, finals), o_t

    t_axis = lambda a: jnp.moveaxis(a, 1, 0)
    resets = (
        t_axis(seg_start)
        if seg_start is not None
        else jnp.zeros((q.shape[1], q.shape[0]), bool)
    )
    sids = (
        seg_idx.astype(jnp.int32)
        if seg_idx is not None
        else jnp.zeros((q.shape[1],), jnp.int32)
    )
    finals0 = (
        jnp.zeros((num_finals,) + s0.shape[1:], s0.dtype)
        if num_finals is not None else None
    )
    (s_final, finals), os = jax.lax.scan(
        step, (s0, finals0),
        (t_axis(q), t_axis(k), t_axis(v), t_axis(g), t_axis(beta), resets,
         sids),
    )
    return jnp.moveaxis(os, 0, 1), s_final, finals


def _delta_rule_chunked(
    q: jax.Array,  # [B, T, H, K] f32
    k: jax.Array,
    v: jax.Array,  # [B, T, H, V] f32
    g: jax.Array,  # [B, T, H] log-space scalar gate
    beta: jax.Array,  # [B, T, H]
    s0: jax.Array,  # [B, H, K, V] f32
    scale: float,
    chunk: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Chunk-parallel gated delta rule (scalar gate) — the MXU form.

    Reference ships a dedicated chunked kernel family for this
    (flashinfer/gdn_prefill.py:581, gdn_kernels/); the recurrence
    ``S_t = d_t (I - b_t k_t k_t^T) S_{t-1} + b_t k_t v_t^T`` admits a WY
    representation per chunk: with within-chunk cumulative log-decay gl
    and G_{ts} = exp(gl_t - gl_s),

      (I + A) R = B,  A_{ts} = b_t (k_t . k_s) G_{ts}  (strictly lower)
                      B_t   = b_t (v_t - exp(gl_t) S_prev^T k_t)
      o_t  = exp(gl_t) S_prev^T q_t + sum_{s<=t} G_{ts} (q_t . k_s) r_s
      S'   = exp(gl_C) S_prev + sum_s exp(gl_C - gl_s) k_s r_s^T

    so a whole chunk becomes batched [C, C] / [C, K] / [C, V] matmuls plus
    ONE unit-lower triangular solve — sequential work drops from T rank-1
    steps to T/C chunk steps with the state resident across the scan.
    """
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    nc = t // chunk
    c = chunk

    def to_chunks(a, trail):
        return jnp.moveaxis(
            a.reshape(b, nc, c, h, *trail), 3, 2
        )  # [B, NC, H, C, *]

    qc = to_chunks(q, (dk,))
    kc = to_chunks(k, (dk,))
    vc = to_chunks(v, (dv,))
    gc = to_chunks(g, ())
    bc = to_chunks(beta, ())
    tri_lower = jnp.tril(jnp.ones((c, c), bool), k=-1)
    tri_incl = jnp.tril(jnp.ones((c, c), bool))
    eye = jnp.eye(c, dtype=jnp.float32)

    def step(s, xs):
        qt, kt, vt, gt, bt = xs  # [B, H, C, *]
        gl = jnp.cumsum(gt, axis=-1)  # [B, H, C]
        gamma = jnp.exp(gl[..., :, None] - gl[..., None, :])  # [B,H,C,C]
        kk = jnp.einsum("bhtk,bhsk->bhts", kt, kt)
        a_mat = jnp.where(tri_lower, bt[..., :, None] * kk * gamma, 0.0)
        pred = jnp.einsum("bhkv,bhtk->bhtv", s, kt) * jnp.exp(
            gl)[..., None]
        rhs = bt[..., None] * (vt - pred)
        # (I + A)^{-1} for strictly-lower (nilpotent) A via product
        # doubling: sum_{k<2m} N^k = (sum_{k<m} N^k)(I + N^m), N = -A.
        # log2(C) batched [C, C] matmuls — MXU work instead of the
        # sequential TriangularSolve (which halves TPU throughput).
        n_mat = -a_mat
        inv = eye + n_mat
        p_mat2 = n_mat
        for _ in range(max((c - 1).bit_length() - 1, 0)):
            p_mat2 = jnp.einsum("bhts,bhsu->bhtu", p_mat2, p_mat2)
            inv = inv + jnp.einsum("bhts,bhsu->bhtu", inv, p_mat2)
        r = jnp.einsum("bhts,bhsv->bhtv", inv, rhs)  # [B,H,C,V]
        qk = jnp.einsum("bhtk,bhsk->bhts", qt, kt)
        p_mat = jnp.where(tri_incl, qk * gamma, 0.0)
        o = (jnp.einsum("bhkv,bhtk->bhtv", s, qt) * jnp.exp(gl)[..., None]
             + jnp.einsum("bhts,bhsv->bhtv", p_mat, r)) * scale
        k_dec = kt * jnp.exp(gl[..., -1:] - gl)[..., None]
        s_new = s * jnp.exp(gl[..., -1])[..., None, None] + jnp.einsum(
            "bhtk,bhtv->bhkv", k_dec, r)
        return s_new, o

    xs = tuple(jnp.moveaxis(a, 1, 0) for a in (qc, kc, vc, gc, bc))
    s_final, os = jax.lax.scan(step, s0, xs)  # os [NC, B, H, C, V]
    out = jnp.moveaxis(os, 0, 1)  # [B, NC, H, C, V]
    out = jnp.moveaxis(out, 2, 3).reshape(b, t, h, dv)
    return out, s_final


def _delta_rule_chunked_vector(
    q: jax.Array,  # [B, T, H, K] f32
    k: jax.Array,
    v: jax.Array,  # [B, T, H, V] f32
    g: jax.Array,  # [B, T, H, K] per-K-dim log decay (<= 0)
    beta: jax.Array,  # [B, T, H]
    s0: jax.Array,  # [B, H, K, V] f32
    scale: float,
    chunk: int = 64,
    sub: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Chunk-parallel delta rule with a per-K-dimension decay gate (KDA).

    Same WY form as the scalar-gate kernel (see _delta_rule_chunked), but
    the decay between positions is the per-dim vector
    ``exp(G_t - G_s) in R^K`` (G = within-chunk cumulative log-decay), so
    the [C, C] matrices contract over K *through* the decay:

      A_ts = b_t sum_kappa k_t[kappa] k_s[kappa] exp(G_t[k] - G_s[k])

    Numerics: the naive factoring ``(k exp(G)) @ (k exp(-G))^T``
    overflows (exp(-G) is unbounded). Instead each row sub-block of S
    rows anchors the factorization at its own start ``a_i = G_{b_i}``:
    for rows ``t >= b_i`` and columns ``s < b_i`` both exponents
    ``G_t - a_i`` and ``a_i - G_s`` are <= 0 (G is non-increasing), so the
    off-diagonal 3/4 of the matrix is exact, safe, and pure MXU matmul;
    the [S, S] diagonal blocks materialize ``exp(G_t - G_s)`` directly
    (bounded: differences of <= S steps). This mirrors how the
    reference's flash-KDA kernel family (csrc/kda/, kda_prefill.py:563)
    tiles the intra-chunk decay.
    """
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    nc, c, s_sz = t // chunk, chunk, sub
    nb = chunk // sub  # row sub-blocks per chunk

    def to_chunks(a, trail):
        return jnp.moveaxis(a.reshape(b, nc, c, h, *trail), 3, 2)

    qc, kc, vc = to_chunks(q, (dk,)), to_chunks(k, (dk,)), to_chunks(v, (dv,))
    gc, bc = to_chunks(g, (dk,)), to_chunks(beta, ())
    tri_lower_s = jnp.tril(jnp.ones((s_sz, s_sz), bool), k=-1)
    tri_incl_s = jnp.tril(jnp.ones((s_sz, s_sz), bool))
    eye = jnp.eye(c, dtype=jnp.float32)

    def decayed_mats(glc, kt, qt):
        """[C, C] A-without-beta (strictly lower) and P (inclusive)."""
        # glc: [B,H,C,K] cumulative (inclusive) log decay within the chunk
        # anchor a_i = G_{b_i - 1}: the cumulative decay *before* the
        # block's first row (block 0 anchors at 0)
        prev = jnp.pad(glc[..., :-1, :], ((0, 0),) * 2 + ((1, 0), (0, 0)))
        anchors = prev[..., ::s_sz, :]  # [B,H,NB,K]
        kb = kt.reshape(*kt.shape[:-2], nb, s_sz, dk)
        qb = qt.reshape(*qt.shape[:-2], nb, s_sz, dk)
        gb = glc.reshape(*glc.shape[:-2], nb, s_sz, dk)
        # row factors: exp(G_t - a_i) <= 1 within the block
        row_dec = jnp.exp(gb - anchors[..., :, None, :])
        k_row = kb  # raw k for the diagonal blocks
        q_row = qb
        kt_rowdec = kb * row_dec
        qt_rowdec = qb * row_dec
        # column factors per row-block: exp(a_i - G_s), zeroed at s >= b_i
        col_pos = jnp.arange(c, dtype=jnp.int32)
        blk_start = (jnp.arange(nb, dtype=jnp.int32) * s_sz)
        col_valid = col_pos[None, :] < blk_start[:, None]  # [NB, C]
        col_exp = jnp.exp(
            jnp.minimum(anchors[..., :, None, :] - glc[..., None, :, :], 0.0)
        )  # [B,H,NB,C,K]; min() guards masked (s>=b_i) entries from inf
        ks_coldec = jnp.where(
            col_valid[..., None], kt[..., None, :, :] * col_exp, 0.0
        )
        # off-diagonal rows: [B,H,NB,S,C]
        a_off = jnp.einsum("...isk,...ick->...isc", kt_rowdec, ks_coldec)
        p_off = jnp.einsum("...isk,...ick->...isc", qt_rowdec, ks_coldec)
        # diagonal [S, S] blocks: direct exp(G_t - G_s), bounded by S steps
        gdiff = gb[..., :, None, :] - gb[..., None, :, :]  # [B,H,NB,S,S,K]
        dec = jnp.exp(gdiff)
        a_diag = jnp.einsum("...tk,...sk,...tsk->...ts", k_row, k_row, dec)
        p_diag = jnp.einsum("...tk,...sk,...tsk->...ts", q_row, k_row, dec)
        a_diag = jnp.where(tri_lower_s, a_diag, 0.0)
        p_diag = jnp.where(tri_incl_s, p_diag, 0.0)
        # scatter diagonal blocks into the [.., NB, S, C] row strips
        strips_a, strips_p = [], []
        for i in range(nb):
            pad = ((0, 0), (i * s_sz, c - (i + 1) * s_sz))
            strips_a.append(jnp.pad(a_diag[..., i, :, :], ((0, 0),) * (a_diag.ndim - 3) + pad))
            strips_p.append(jnp.pad(p_diag[..., i, :, :], ((0, 0),) * (p_diag.ndim - 3) + pad))
        a_full = a_off + jnp.stack(strips_a, axis=-3)
        p_full = p_off + jnp.stack(strips_p, axis=-3)
        # [B,H,NB,S,C] -> [B,H,C,C]
        a_full = a_full.reshape(*a_full.shape[:-3], c, c)
        p_full = p_full.reshape(*p_full.shape[:-3], c, c)
        return a_full, p_full

    def step(s, xs):
        qt, kt, vt, gt, bt = xs  # [B, H, C, *]
        gl = jnp.cumsum(gt, axis=-2)  # [B,H,C,K] inclusive cumulative
        a_nb, p_mat = decayed_mats(gl, kt, qt)
        a_mat = bt[..., :, None] * a_nb
        dec_in = jnp.exp(gl)  # [B,H,C,K] <= 1
        pred = jnp.einsum("bhkv,bhtk->bhtv", s, kt * dec_in)
        rhs = bt[..., None] * (vt - pred)
        n_mat = -a_mat
        inv = eye + n_mat
        p2 = n_mat
        for _ in range(max((c - 1).bit_length() - 1, 0)):
            p2 = jnp.einsum("bhts,bhsu->bhtu", p2, p2)
            inv = inv + jnp.einsum("bhts,bhsu->bhtu", inv, p2)
        r = jnp.einsum("bhts,bhsv->bhtv", inv, rhs)  # [B,H,C,V]
        o = (jnp.einsum("bhkv,bhtk->bhtv", s, qt * dec_in)
             + jnp.einsum("bhts,bhsv->bhtv", p_mat, r)) * scale
        dec_out = jnp.exp(gl[..., -1:, :] - gl)  # exp(G_C - G_s) <= 1
        s_new = s * jnp.exp(gl[..., -1, :])[..., None] + jnp.einsum(
            "bhtk,bhtv->bhkv", kt * dec_out, r)
        return s_new, o

    xs = tuple(jnp.moveaxis(a, 1, 0) for a in (qc, kc, vc, gc, bc))
    s_final, os = jax.lax.scan(step, s0, xs)
    out = jnp.moveaxis(os, 0, 1)
    out = jnp.moveaxis(out, 2, 3).reshape(b, t, h, dv)
    return out, s_final


def chunk_gated_delta_rule(
    q: jax.Array,  # [total, Hq, K] (packed varlen) or [B, T, Hq, K]
    k: jax.Array,
    v: jax.Array,  # [total, Hv, V]
    g: jax.Array | None = None,  # [total, H] log-space forget gate
    beta: jax.Array | None = None,  # [total, H]
    scale: float | None = None,
    initial_state: jax.Array | None = None,  # [num_seqs, H, K, V]
    output_final_state: bool = False,
    cu_seqlens: jax.Array | None = None,  # [num_seqs+1]
    use_qk_l2norm_in_kernel: bool = False,
    state_indices: jax.Array | None = None,  # [num_seqs] rows into state pool
    **_unsupported,
):
    """Gated delta-rule linear attention (reference gdn_prefill.py:119).

    Packed varlen input (2-D indptr `cu_seqlens`) is processed as ONE
    scan with in-scan state resets at sequence boundaries — the TPU
    equivalent of the reference's per-sequence CTA scheduling. GQA/GVA:
    q/k heads are broadcast up to ``H = max(Hq, Hv)``.
    Returns ``out`` or ``(out, final_state [num_seqs, H, K, V])``.
    """
    packed = q.ndim == 3
    if packed:
        q, k, v = q[None], k[None], v[None]
        if g is not None:
            g = g[None]
        if beta is not None:
            beta = beta[None]
    b, t, hq, dk = q.shape
    hv, dv = v.shape[2], v.shape[3]
    h = max(hq, hv)
    if hq < h:
        q = jnp.repeat(q, h // hq, axis=2)
        k = jnp.repeat(k, h // hq, axis=2)
    if hv < h:
        v = jnp.repeat(v, h // hv, axis=2)
    if scale is None:
        scale = 1.0 / math.sqrt(dk)
    qf, kf, vf = (a.astype(jnp.float32) for a in (q, k, v))
    if use_qk_l2norm_in_kernel:
        qf, kf = _l2norm(qf), _l2norm(kf)
    gf = (
        g.astype(jnp.float32)
        if g is not None
        else jnp.zeros((b, t, h), jnp.float32)
    )
    bf = (
        beta.astype(jnp.float32)
        if beta is not None
        else jnp.ones((b, t, h), jnp.float32)
    )

    seg_start = None
    seg_of_token = None
    if cu_seqlens is not None:
        pos = jnp.arange(t, dtype=jnp.int32)
        seg_of_token = (
            jnp.searchsorted(cu_seqlens, pos, side="right").astype(jnp.int32) - 1
        )
        seg_start = jnp.isin(pos, cu_seqlens[:-1])[None]

    init_pool = None
    if initial_state is not None:
        init = initial_state.astype(jnp.float32)
        if state_indices is not None:
            init = init[state_indices]
        if cu_seqlens is not None:
            # per-sequence init: seed s0 with seq 0's state, later seqs
            # seed at their reset boundary from the pool inside the scan
            init_pool = init
            s0 = init[0][None]
        else:
            s0 = init
    else:
        s0 = jnp.zeros((b, h, dk, dv), jnp.float32)

    num_seqs = int(cu_seqlens.shape[0]) - 1 if cu_seqlens is not None \
        else None

    # chunk-parallel MXU path for dense scalar-gate prefill (the scan
    # stays for varlen packing and vector gates — see _delta_rule_chunked)
    chunk = 64
    finals = None
    if (cu_seqlens is None and gf.ndim == 3 and t >= 2 * chunk
            and t % chunk == 0):
        out, s_final = _delta_rule_chunked(
            qf, kf, vf, gf, bf, s0, scale, chunk=chunk)
    else:
        out, s_final, finals = _delta_rule_scan(
            qf, kf, vf, gf, bf, s0, scale, seg_start,
            init_pool=init_pool, seg_idx=seg_of_token,
            num_finals=(num_seqs if (output_final_state
                                     and cu_seqlens is not None) else None))
    out = out.astype(v.dtype)

    if packed:
        out = out[0]
    if output_final_state:
        # packed varlen: [num_seqs, H, K, V] per-sequence end states
        # (reference fla chunk_gated_delta_rule return contract); dense:
        # the [B, H, K, V] carry
        return out, (finals if finals is not None else s_final)
    return out


def gdn_decode(
    q: jax.Array,  # [B, Hq, K]
    k: jax.Array,
    v: jax.Array,  # [B, Hv, V]
    g: jax.Array,  # [B, H]
    beta: jax.Array,  # [B, H]
    state: jax.Array,  # [pool, H, K, V]
    state_indices: jax.Array | None = None,  # [B]
    scale: float | None = None,
    use_qk_l2norm_in_kernel: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Single-token GDN decode (reference gdn_decode.py:906); returns
    (out [B, Hv, V], updated state pool)."""
    b = q.shape[0]
    idx = state_indices if state_indices is not None else jnp.arange(b)
    s0 = state[idx].astype(jnp.float32)
    out, s_final = chunk_gated_delta_rule(
        q[:, None], k[:, None], v[:, None], g[:, None], beta[:, None],
        scale=scale, initial_state=s0, output_final_state=True,
        use_qk_l2norm_in_kernel=use_qk_l2norm_in_kernel,
    )
    new_state = state.at[idx].set(s_final.astype(state.dtype))
    return out[:, 0], new_state


def recurrent_kda(
    q: jax.Array,  # [B, T, H, K]
    k: jax.Array,
    v: jax.Array,  # [B, T, Hv, V]
    g: jax.Array,  # [B, T, Hv, K] per-K-dim gate
    beta: jax.Array,  # [B, T, Hv]
    A_log: jax.Array | None = None,  # [H]
    dt_bias: jax.Array | None = None,  # [H, K] or [H*K]
    scale: float | None = None,
    initial_state: jax.Array | None = None,  # [B, H, K, V]
    output_final_state: bool = False,
    use_qk_l2norm_in_kernel: bool = True,
    use_gate_in_kernel: bool = False,
    lower_bound: float | None = None,
    cu_seqlens: jax.Array | None = None,
    beta_is_logit: bool = False,
    **_unsupported,
) -> tuple[jax.Array, Optional[jax.Array]]:
    """Kimi Delta Attention (reference kda.py:38): delta rule with a
    per-K-dimension decay gate. ``use_gate_in_kernel`` fuses the gate
    transform ``g ← −exp(A_log) · softplus(g + dt_bias)``."""
    b, t, h, dk = q.shape
    hv, dv = v.shape[2], v.shape[3]
    if hv != h:
        v = jnp.repeat(v, h // hv, axis=2) if hv < h else v
        g = jnp.repeat(g, h // g.shape[2], axis=2) if g.shape[2] < h else g
        beta = (
            jnp.repeat(beta, h // beta.shape[2], axis=2)
            if beta.shape[2] < h else beta
        )
    if scale is None:
        scale = 1.0 / math.sqrt(dk)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    if use_qk_l2norm_in_kernel:
        qf, kf = _l2norm(qf), _l2norm(kf)
    gf = g.astype(jnp.float32)
    if use_gate_in_kernel:
        if A_log is None:
            raise ValueError("A_log required with use_gate_in_kernel")
        bias = (
            dt_bias.reshape(h, dk).astype(jnp.float32)
            if dt_bias is not None else 0.0
        )
        gf = -jnp.exp(A_log.astype(jnp.float32))[None, None, :, None] * (
            jax.nn.softplus(gf + bias)
        )
    if lower_bound is not None:
        gf = jnp.maximum(gf, math.log(lower_bound))
    bf = beta.astype(jnp.float32)
    if beta_is_logit:
        bf = jax.nn.sigmoid(bf)

    seg_start = None
    if cu_seqlens is not None:
        pos = jnp.arange(t, dtype=jnp.int32)
        seg_start = jnp.isin(pos, cu_seqlens[:-1])[None]

    s0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((b, h, dk, dv), jnp.float32)
    )
    chunk = 64
    if cu_seqlens is None and t >= 2 * chunk and t % chunk == 0:
        # chunk-parallel MXU path (flash-KDA analog). KDA gates are
        # log-decays (<= 0 by construction: -exp(A_log)*softplus); the
        # clamp makes that a hard precondition of the anchored factoring.
        out, s_final = _delta_rule_chunked_vector(
            qf, kf, v.astype(jnp.float32), jnp.minimum(gf, 0.0), bf, s0,
            scale, chunk=chunk,
        )
    else:
        out, s_final, _ = _delta_rule_scan(
            qf, kf, v.astype(jnp.float32), gf, bf, s0, scale, seg_start
        )
    out = out.astype(v.dtype)
    return (out, s_final) if output_final_state else (out, None)
