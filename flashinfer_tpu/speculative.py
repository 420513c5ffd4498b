"""Speculative decoding: multi-token verify + chain accept/reject.

Reference surfaces: XQA spec-decode (xqa.py:188, q_len_per_req > 1) and
`chain_speculative_sampling` (sampling.py:1980). This module wires them
into an end-to-end draft→verify→accept serving round over the flagship
model.

TPU-native verify design (instead of a host re-plan per step): the n+1
new tokens' attention splits into
  * a CACHE part — each new token attends the committed pages with the
    production streaming decode kernel (batch B·(n+1) rows, kv_len =
    committed length, fully jittable: no dynamic plan), and
  * a NEW part — an (n+1)×(n+1) dense causal block among the new tokens
    (n is tiny; this is VPU noise),
merged with the associative LSE state-merge algebra (cascade.cuh:45) —
the same split-KV identity the cascade/ring paths are built on.

Rollback semantics match the reference engines: draft K/V rows are
appended optimistically; rejected rows stay in the cache but remain
invisible because the committed kv_len is only advanced by the accepted
count (they are overwritten by later steps).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .models.llama import (
    LlamaConfig, _index_layer, _layer_keys, _mlp, _mm, _rope,
)
from .ops.attention.merge import merge_state
from .ops.norm import rmsnorm
from .ops.sampling import chain_speculative_sampling


@partial(jax.jit, static_argnames=("cfg", "interpret"),
         donate_argnums=(2,))
def verify_tokens(
    params: dict,
    cfg: LlamaConfig,
    kv_caches: jax.Array,  # [L, pages, 2, ps, Hkv*D] — DONATED
    tokens: jax.Array,  # [B, n1] = [committed_next, draft_1..draft_n]
    start_pos: jax.Array,  # [B] position of tokens[:, 0] (== committed len)
    page_table: jax.Array,  # [B, P]
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Multi-token target forward; returns (logits [B, n1, V], caches).

    Position i of the output is the target distribution AFTER seeing
    tokens[:, :i+1] — exactly the n+1 distributions
    chain_speculative_sampling consumes (n draft checks + bonus).
    """
    from .ops.attention.pallas_decode import (
        _combined_call, paged_append_rows,
    )

    batch, n1 = tokens.shape
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    group = hq // hkv
    g8 = max(8, ((group + 7) // 8) * 8)
    rows = hkv * g8
    num_layers, num_pages = kv_caches.shape[0], kv_caches.shape[1]
    page_size = kv_caches.shape[3]
    kv_flat = kv_caches.reshape(
        num_layers * num_pages, 2, page_size, hkv * d)
    chunk_pages = max(1, min(512 // page_size, 32))
    pad_pages = (-page_table.shape[1]) % chunk_pages
    table0 = (jnp.pad(page_table, ((0, 0), (0, pad_pages)))
              if pad_pages else page_table)
    chunk_pages = min(chunk_pages, table0.shape[1])
    sinks_arr = jnp.full((rows, 128), -jnp.inf, jnp.float32)
    sm_scale = 1.0 / math.sqrt(d)
    start_pos = start_pos.astype(jnp.int32)
    b_idx = jnp.arange(batch)
    pos = start_pos[:, None] + jnp.arange(n1)[None, :]  # [B, n1]
    # replicate the batch over the n1 new tokens for the cache-part call
    table_rep = jnp.repeat(table0, n1, axis=0)  # [B*n1, P]
    lens_rep = jnp.repeat(start_pos, n1)  # committed length only

    x = params["embed"][tokens].astype(cfg.dtype)  # [B, n1, H]
    lkeys = _layer_keys(cfg, params)
    for l in range(cfg.num_layers):
        lp = {k: _index_layer(params[k], l) for k in lkeys}
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        if "wqkv" in lp:  # fused projection (fuse_qkv_mlp)
            qkv = _mm(x, lp["wqkv"])
            qf = qkv[..., : hq * d]
            kf = qkv[..., hq * d: (hq + hkv) * d]
            vf = qkv[..., (hq + hkv) * d:]
        else:
            qf, kf, vf = (_mm(x, lp["wq"]), _mm(x, lp["wk"]),
                          _mm(x, lp["wv"]))
        q = _rope(qf.reshape(batch, n1, hq, d), pos, cfg.rope_theta)
        k = _rope(kf.reshape(batch, n1, hkv, d), pos, cfg.rope_theta)
        v = vf.reshape(batch, n1, hkv, d)
        # optimistic appends: one row per (token i, request) launch
        for i in range(n1):
            entry = page_table[b_idx, pos[:, i] // page_size]
            kv_flat = paged_append_rows(
                kv_flat, entry + l * num_pages, pos[:, i] % page_size,
                k[:, i].reshape(batch, hkv * d),
                v[:, i].reshape(batch, hkv * d), interpret=interpret)

        # cache part: every new token over the committed pages
        q4 = q.reshape(batch * n1, hkv, group, d)
        if g8 != group:
            q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, g8 - group), (0, 0)))
        o_cache, lse_cache = _combined_call(
            q4.reshape(batch * n1, rows, d), kv_flat,
            table_rep + l * num_pages, lens_rep, sinks_arr,
            batch=batch * n1, rows=rows, g8=g8, group=group,
            num_q_heads=hq, num_kv_heads=hkv, head_dim=d,
            page_size=page_size, chunk_pages=chunk_pages,
            sm_scale=sm_scale, logits_soft_cap=0.0, window_left=-1,
            k_scale=1.0, v_scale=1.0, use_sinks=False,
            interpret=interpret)  # [B*n1, Hq, d], [B*n1, Hq]

        # new part: dense causal block among the n1 new tokens
        kr = jnp.repeat(k, group, axis=2)  # [B, n1, Hq, d]
        vr = jnp.repeat(v, group, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       kr.astype(jnp.float32)) * sm_scale
        mask = jnp.tril(jnp.ones((n1, n1), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        denom = jnp.sum(p, axis=-1)
        o_new = jnp.einsum("bhqk,bkhd->bqhd", p / denom[..., None],
                           vr.astype(jnp.float32))
        lse_new = (m + jnp.log(denom)).transpose(0, 2, 1)  # [B, n1, Hq]

        o_m, _ = merge_state(
            o_cache.reshape(batch * n1, hq, d).astype(jnp.float32),
            lse_cache.reshape(batch * n1, hq),
            o_new.reshape(batch * n1, hq, d),
            lse_new.reshape(batch * n1, hq))
        attn = o_m.reshape(batch, n1, hq * d).astype(cfg.dtype)
        x = h_in + _mm(attn, lp["wo"])
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        y = _mlp(cfg, lp, x.reshape(batch * n1, -1))
        x = h_in + y.reshape(batch, n1, -1).astype(x.dtype)

    x = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    return logits, kv_flat.reshape(kv_caches.shape)


def speculative_decode_round(
    target_params: dict,
    target_cfg: LlamaConfig,
    target_caches: jax.Array,
    draft_params: dict,
    draft_cfg: LlamaConfig,
    draft_caches: jax.Array,
    committed_token: jax.Array,  # [B] last sampled (not yet cached) token
    committed_len: jax.Array,  # [B] tokens already in both caches
    page_table: jax.Array,  # [B, P] (shared geometry for both models)
    *,
    num_draft: int = 3,
    key: jax.Array | None = None,
    interpret: bool | None = None,
):
    """One draft→verify→accept round (the reference's XQA spec-decode +
    chain_speculative_sampling flow, end to end).

    Returns (out_tokens [B, n+1] accepted + replacement/bonus, -1 padded;
    accepted [B]; target_caches; draft_caches; draft_tokens [B, n]).
    """
    from .models.llama import decode_step

    if key is None:
        key = jax.random.key(0)
    batch = committed_token.shape[0]
    n = num_draft

    # --- draft: n sequential single-token decode steps -------------------
    draft_tokens, draft_probs = [], []
    tok = committed_token
    for i in range(n):
        pos = committed_len + i
        logits_d, draft_caches = decode_step(
            draft_params, draft_cfg, draft_caches, tok, pos, page_table,
            pos + 1, interpret=interpret)
        probs = jax.nn.softmax(logits_d, axis=-1)
        tok = jnp.argmax(logits_d, axis=-1).astype(jnp.int32)
        draft_tokens.append(tok)
        draft_probs.append(probs)
    draft_tokens = jnp.stack(draft_tokens, axis=1)  # [B, n]
    draft_probs = jnp.stack(draft_probs, axis=1)  # [B, n, V]

    # --- target: one multi-token verify pass -----------------------------
    verify_in = jnp.concatenate(
        [committed_token[:, None], draft_tokens], axis=1)  # [B, n+1]
    logits_t, target_caches = verify_tokens(
        target_params, target_cfg, target_caches, verify_in,
        committed_len, page_table, interpret=interpret)
    target_probs = jax.nn.softmax(logits_t, axis=-1)  # [B, n+1, V]

    out_tokens, accepted, _emitted = chain_speculative_sampling(
        draft_probs, draft_tokens, target_probs, key=key)
    return out_tokens, accepted, target_caches, draft_caches, draft_tokens
