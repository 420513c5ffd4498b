"""Qwen3-Next-style hybrid serving model: Gated-DeltaNet linear
attention + periodic full attention + renormalized MoE.

Third model family (alongside models/llama.py and models/deepseek.py):
demonstrates the framework's linear-attention serving path end-to-end —
the architecture class the reference supports through its GDN kernel
family (gdn_prefill.py:581, gdn_decode.py:906, gdn_kernels/).

Layer pattern: 3 of every 4 layers are LINEAR (gated delta rule with a
depthwise short convolution and an RMSNorm-gated output), every 4th is
FULL attention (GQA over the paged KV cache). The MLP is a
renormalize-routed MoE with one shared expert (Qwen3-MoE routing) or a
dense gated MLP.

Serving state per batch = three pools, all static-shape:
  * paged KV cache for the full-attention layers,
  * GDN state pool ``[L_lin, B, H, dk, dv]`` (the reference keeps the
    same per-slot state pool, gdn_decode.py state_indices),
  * conv state ``[L_lin, B, K-1, conv_dim]`` (trailing window of the
    depthwise causal conv).

Ops exercised: chunk_gated_delta_rule (chunk-parallel WY prefill path),
gdn_decode, paged decode attention with the aliased append kernel,
routing_renormalize + fused_moe, rmsnorm, silu_and_mul, RoPE.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.activation import silu_and_mul
from ..ops.moe import fused_moe
from ..ops.norm import rmsnorm
from ..ops.routing import routing_renormalize_naive
from ..ops.ssm import chunk_gated_delta_rule, gdn_decode
from .llama import _rope


@dataclass(frozen=True)
class QwenNextConfig:
    vocab_size: int = 151936
    hidden_size: int = 2048
    num_layers: int = 48
    full_attn_every: int = 4  # layer l is full attention iff l % this == this-1
    # full attention (GQA) — Qwen3-Next semantics: per-head q/k RMSNorm,
    # sigmoid output gating (q_proj doubles as [query | gate]), and
    # partial rotary over the first rotary_fraction * head_dim dims
    num_qo_heads: int = 16
    num_kv_heads: int = 2
    head_dim: int = 256
    rope_theta: float = 10000000.0
    qk_norm: bool = True
    attn_gate: bool = True
    rotary_fraction: float = 0.25
    # linear attention (GDN)
    linear_k_heads: int = 16
    linear_v_heads: int = 32
    linear_dk: int = 128
    linear_dv: int = 128
    conv_kernel: int = 4
    # MoE (0 experts → dense)
    num_experts: int = 512
    top_k: int = 10
    num_shared_experts: int = 1
    moe_intermediate_size: int = 512
    rms_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def conv_dim(self) -> int:
        return (2 * self.linear_k_heads * self.linear_dk
                + self.linear_v_heads * self.linear_dv)

    @property
    def num_linear_layers(self) -> int:
        return sum(1 for l in range(self.num_layers) if not self.is_full(l))

    def is_full(self, l: int) -> bool:
        return l % self.full_attn_every == self.full_attn_every - 1

    def linear_index(self, l: int) -> int:
        return sum(1 for i in range(l) if not self.is_full(i))

    def full_index(self, l: int) -> int:
        return sum(1 for i in range(l) if self.is_full(i))

    @classmethod
    def qwen3_next_80b(cls) -> "QwenNextConfig":
        return cls()

    @classmethod
    def tiny(cls, **kw) -> "QwenNextConfig":
        return replace(
            cls(
                vocab_size=512,
                hidden_size=256,
                num_layers=4,
                num_qo_heads=8,
                num_kv_heads=4,
                head_dim=128,
                linear_k_heads=2,
                linear_v_heads=4,
                linear_dk=64,
                linear_dv=64,
                num_experts=4,
                top_k=2,
                num_shared_experts=1,
                moe_intermediate_size=128,
            ),
            **kw,
        )


def init_params(key: jax.Array, cfg: QwenNextConfig) -> dict:
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, 4 + 20 * cfg.num_layers))

    def w(*shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(cfg.dtype)

    layers = []
    for l in range(cfg.num_layers):
        lp = {"attn_norm": jnp.ones((h,), cfg.dtype),
              "mlp_norm": jnp.ones((h,), cfg.dtype)}
        if cfg.is_full(l):
            hq, hkv, d = cfg.num_qo_heads, cfg.num_kv_heads, cfg.head_dim
            lp.update(
                wq=w(h, hq * d), wk=w(h, hkv * d), wv=w(h, hkv * d),
                wo=w(hq * d, h))
            if cfg.attn_gate:
                lp.update(wg=w(h, hq * d))
            if cfg.qk_norm:
                lp.update(q_norm=jnp.ones((d,), cfg.dtype),
                          k_norm=jnp.ones((d,), cfg.dtype))
        else:
            hv, dv = cfg.linear_v_heads, cfg.linear_dv
            lp.update(
                w_qkv=w(h, cfg.conv_dim),
                conv_w=(jax.random.normal(
                    next(keys), (cfg.conv_dim, cfg.conv_kernel),
                    jnp.float32) * 0.3).astype(cfg.dtype),
                w_z=w(h, hv * dv),
                w_ba=w(h, 2 * hv),
                a_log=jnp.zeros((hv,), jnp.float32),
                dt_bias=jnp.zeros((hv,), jnp.float32),
                gdn_norm=jnp.ones((dv,), cfg.dtype),
                wo=w(hv * dv, h))
        if cfg.num_experts:
            e, i_sz = cfg.num_experts, cfg.moe_intermediate_size
            lp.update(router=w(h, e), w13=w(e, h, 2 * i_sz),
                      w2=w(e, i_sz, h))
            if cfg.num_shared_experts:
                si = i_sz * cfg.num_shared_experts
                lp.update(s_gate=w(h, si), s_up=w(h, si), s_w2=w(si, h),
                          s_gate_w=w(h, 1))
        else:
            i_sz = 4 * h
            lp.update(w_gate=w(h, i_sz), w_up=w(h, i_sz), w2=w(i_sz, h))
        layers.append(lp)
    return {
        "embed": w(cfg.vocab_size, h, scale=0.02),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": w(h, cfg.vocab_size),
        "layers": layers,
    }


def init_state(cfg: QwenNextConfig, batch: int, num_pages: int,
               page_size: int, kv_dtype=None) -> dict:
    """All serving state: paged KV (full-attn layers), GDN state pool,
    conv trailing windows."""
    return {
        "kv": jnp.zeros(
            (cfg.num_layers - cfg.num_linear_layers, num_pages, 2,
             page_size, cfg.num_kv_heads * cfg.head_dim),
            kv_dtype or cfg.dtype),
        "gdn": jnp.zeros(
            (cfg.num_linear_layers, batch, cfg.linear_v_heads,
             cfg.linear_dk, cfg.linear_dv), jnp.float32),
        "conv": jnp.zeros(
            (cfg.num_linear_layers, batch, cfg.conv_kernel - 1,
             cfg.conv_dim), cfg.dtype),
    }


def _rope_partial(x: jax.Array, pos: jax.Array, theta: float,
                  frac: float) -> jax.Array:
    """Rotary over the first frac*d dims, pass-through on the rest
    (HF Qwen3Next apply_rotary_pos_emb with rotary_dim = cos.shape[-1])."""
    d = x.shape[-1]
    rot = int(d * frac)
    if rot >= d:
        return _rope(x, pos, theta)
    return jnp.concatenate(
        [_rope(x[..., :rot], pos, theta), x[..., rot:]], axis=-1)


def _qk_heads(cfg: QwenNextConfig, lp: dict, x: jax.Array, pos, shape_q,
              shape_k):
    """q/k projections with per-head RMSNorm then partial rotary."""
    q = (x @ lp["wq"]).reshape(shape_q)
    k = (x @ lp["wk"]).reshape(shape_k)
    if cfg.qk_norm:
        q = rmsnorm(q, lp["q_norm"], eps=cfg.rms_eps)
        k = rmsnorm(k, lp["k_norm"], eps=cfg.rms_eps)
    q = _rope_partial(q, pos, cfg.rope_theta, cfg.rotary_fraction)
    k = _rope_partial(k, pos, cfg.rope_theta, cfg.rotary_fraction)
    return q, k


def _attn_out(cfg: QwenNextConfig, lp: dict, attn_flat: jax.Array,
              x: jax.Array) -> jax.Array:
    """Sigmoid output gate (HF: attn * sigmoid(gate half of q_proj))."""
    if cfg.attn_gate:
        gate = (x @ lp["wg"]).astype(jnp.float32)
        attn_flat = (attn_flat.astype(jnp.float32)
                     * jax.nn.sigmoid(gate)).astype(attn_flat.dtype)
    return attn_flat @ lp["wo"]


def _split_qkv(cfg: QwenNextConfig, qkv: jax.Array):
    """[..., conv_dim] → q [..., Hk, dk], k, v [..., Hv, dv]."""
    hk, dk = cfg.linear_k_heads, cfg.linear_dk
    hv, dv = cfg.linear_v_heads, cfg.linear_dv
    nq = hk * dk
    q = qkv[..., :nq].reshape(*qkv.shape[:-1], hk, dk)
    k = qkv[..., nq:2 * nq].reshape(*qkv.shape[:-1], hk, dk)
    v = qkv[..., 2 * nq:].reshape(*qkv.shape[:-1], hv, dv)
    return q, k, v


def _gdn_gates(cfg: QwenNextConfig, lp: dict, x: jax.Array):
    """x [..., H] → (g log-forget [..., Hv], beta [..., Hv])."""
    hv = cfg.linear_v_heads
    ba = (x @ lp["w_ba"]).astype(jnp.float32)
    beta = jax.nn.sigmoid(ba[..., :hv])
    g = -jnp.exp(lp["a_log"]) * jax.nn.softplus(
        ba[..., hv:] + lp["dt_bias"])
    return g, beta


def _gated_out(cfg: QwenNextConfig, lp: dict, o: jax.Array, z: jax.Array):
    """RMSNorm-gated output: rmsnorm(o) * silu(z), heads merged, @ wo."""
    hv, dv = cfg.linear_v_heads, cfg.linear_dv
    o = rmsnorm(o.reshape(*o.shape[:-2], hv, dv), lp["gdn_norm"],
                eps=cfg.rms_eps)
    zf = z.reshape(*z.shape[:-1], hv, dv)
    o = o * jax.nn.silu(zf.astype(jnp.float32)).astype(o.dtype)
    return o.reshape(*o.shape[:-2], hv * dv) @ lp["wo"]


def _mlp(cfg: QwenNextConfig, lp: dict, x: jax.Array) -> jax.Array:
    if not cfg.num_experts:
        gate, up = x @ lp["w_gate"], x @ lp["w_up"]
        return silu_and_mul(jnp.concatenate([gate, up], -1)) @ lp["w2"]
    logits = (x @ lp["router"]).astype(jnp.float32)
    # HF Qwen3Next routing: softmax over ALL experts -> top-k -> renorm
    # (TRT-LLM "RenormalizeNaive")
    ids, wts = routing_renormalize_naive(logits, cfg.top_k)
    y = fused_moe(x, lp["w13"], lp["w2"], ids, wts, out_dtype=x.dtype)
    if cfg.num_shared_experts:
        g, u = x @ lp["s_gate"], x @ lp["s_up"]
        sh = silu_and_mul(jnp.concatenate([g, u], -1)) @ lp["s_w2"]
        if "s_gate_w" in lp:  # HF shared_expert_gate: sigmoid scalar gate
            sh = sh * jax.nn.sigmoid(
                (x @ lp["s_gate_w"]).astype(jnp.float32)).astype(sh.dtype)
        y = y + sh
    return y


@partial(jax.jit, static_argnames=("cfg", "interpret"),
         donate_argnums=(2,))
def decode_step(
    params: dict,
    cfg: QwenNextConfig,
    state: dict,  # init_state pools — DONATED
    token_ids: jax.Array,  # [B]
    positions: jax.Array,  # [B]
    page_table: jax.Array,  # [B, P]
    kv_lens: jax.Array,  # [B] kv length INCLUDING the new token
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, dict]:
    """One hybrid decode step; returns (logits [B, V], new state)."""
    from ..ops.attention.pallas_decode import (
        _combined_call, paged_append_rows,
    )

    batch = token_ids.shape[0]
    kv, gdn_pool, conv_pool = state["kv"], state["gdn"], state["conv"]
    l_full, num_pages = kv.shape[0], kv.shape[1]
    page_size = kv.shape[3]
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    group = hq // hkv
    g8 = max(8, ((group + 7) // 8) * 8)
    rows = hkv * g8
    kv_flat = kv.reshape(l_full * num_pages, 2, page_size, hkv * d)
    chunk_pages = max(1, min(512 // page_size, 32))
    pad_pages = (-page_table.shape[1]) % chunk_pages
    table0 = (jnp.pad(page_table, ((0, 0), (0, pad_pages)))
              if pad_pages else page_table)
    chunk_pages = min(chunk_pages, table0.shape[1])
    sinks_arr = jnp.full((rows, 128), -jnp.inf, jnp.float32)
    positions = positions.astype(jnp.int32)
    b_idx = jnp.arange(batch)
    entry0 = page_table[b_idx, positions // page_size]
    off = positions % page_size

    x = params["embed"][token_ids].astype(cfg.dtype)
    for l in range(cfg.num_layers):
        lp = params["layers"][l]
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        if cfg.is_full(l):
            fi = cfg.full_index(l)
            q, k = _qk_heads(cfg, lp, x, positions, (batch, hq, d),
                             (batch, hkv, d))
            v = (x @ lp["wv"]).reshape(batch, hkv, d)
            k2, v2 = k.reshape(batch, hkv * d), v.reshape(batch, hkv * d)
            kv_flat = paged_append_rows(
                kv_flat, entry0 + fi * num_pages, off, k2, v2,
                interpret=interpret)
            q4 = q.reshape(batch, hkv, group, d)
            if g8 != group:
                q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, g8 - group), (0, 0)))
            attn, _ = _combined_call(
                q4.reshape(batch, rows, d), kv_flat,
                table0 + fi * num_pages, kv_lens, sinks_arr,
                batch=batch, rows=rows, g8=g8, group=group,
                num_q_heads=hq, num_kv_heads=hkv, head_dim=d,
                page_size=page_size, chunk_pages=chunk_pages,
                sm_scale=1.0 / math.sqrt(d), logits_soft_cap=0.0,
                window_left=-1, k_scale=1.0, v_scale=1.0,
                use_sinks=False, interpret=interpret)
            x = h_in + _attn_out(cfg, lp, attn.reshape(batch, hq * d), x)
        else:
            li = cfg.linear_index(l)
            qkv = x @ lp["w_qkv"]  # [B, conv_dim]
            window = jnp.concatenate(
                [conv_pool[li], qkv[:, None]], axis=1)  # [B, K, conv_dim]
            conv_pool = conv_pool.at[li].set(window[:, 1:])
            y = jnp.einsum("bkc,ck->bc", window.astype(jnp.float32),
                           lp["conv_w"].astype(jnp.float32))
            y = jax.nn.silu(y).astype(cfg.dtype)
            q, k, v = _split_qkv(cfg, y)
            g, beta = _gdn_gates(cfg, lp, x)
            o, new_pool = gdn_decode(
                q, k, v, g, beta, gdn_pool[li],
                scale=1.0 / math.sqrt(cfg.linear_dk))
            gdn_pool = gdn_pool.at[li].set(new_pool)
            z = x @ lp["w_z"]
            x = h_in + _gated_out(cfg, lp, o, z)
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        x = h_in + _mlp(cfg, lp, x).astype(x.dtype)

    x = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    new_state = {"kv": kv_flat.reshape(kv.shape), "gdn": gdn_pool,
                 "conv": conv_pool}
    return logits, new_state


def prefill(
    params: dict,
    cfg: QwenNextConfig,
    state: dict,
    token_ids: jax.Array,  # [B, T] dense right-aligned-free prompt batch
    page_table: jax.Array,  # [B, P]
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, dict]:
    """Dense uniform-length prefill; returns (hidden [B, T, H], state).

    GDN layers ride the chunk-parallel delta-rule path (T % 64 == 0 and
    T >= 128 hits the WY/MXU kernel; shorter prompts use the scan) with
    ``output_final_state=True`` so decode can continue the recurrence;
    full-attention layers run dense causal attention and scatter the
    prompt K/V into the paged cache (one-time prefill cost)."""
    batch, t = token_ids.shape
    kv, gdn_pool, conv_pool = state["kv"], state["gdn"], state["conv"]
    num_pages, page_size = kv.shape[1], kv.shape[3]
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    pos = jnp.broadcast_to(jnp.arange(t), (batch, t))
    kk = cfg.conv_kernel

    x = params["embed"][token_ids].astype(cfg.dtype)
    for l in range(cfg.num_layers):
        lp = params["layers"][l]
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        if cfg.is_full(l):
            fi = cfg.full_index(l)
            q, k = _qk_heads(cfg, lp, x, pos, (batch, t, hq, d),
                             (batch, t, hkv, d))
            v = (x @ lp["wv"]).reshape(batch, t, hkv, d)
            # dense causal GQA
            kr = jnp.repeat(k, hq // hkv, axis=2)
            vr = jnp.repeat(v, hq // hkv, axis=2)
            s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                           kr.astype(jnp.float32)) / math.sqrt(d)
            mask = jnp.tril(jnp.ones((t, t), bool))
            s = jnp.where(mask[None, None], s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", p,
                              vr.astype(jnp.float32)).astype(cfg.dtype)
            x = h_in + _attn_out(
                cfg, lp, attn.reshape(batch, t, hq * d), x)
            # scatter prompt K/V rows into the paged cache (one-time)
            page_of = page_table[jnp.arange(batch)[:, None],
                                 pos // page_size].reshape(-1)  # [B*T]
            slot_of = (pos % page_size).reshape(-1)
            rows2 = jnp.stack(
                [k.reshape(batch * t, hkv * d),
                 v.reshape(batch * t, hkv * d)], axis=1)  # [B*T, 2, hd]
            kv = kv.at[fi, page_of, :, slot_of, :].set(
                rows2.astype(kv.dtype))
        else:
            li = cfg.linear_index(l)
            qkv = x @ lp["w_qkv"]  # [B, T, conv_dim]
            padded = jnp.concatenate(
                [jnp.zeros((batch, kk - 1, cfg.conv_dim), qkv.dtype),
                 qkv], axis=1)
            # depthwise causal conv, kernel K
            y = sum(padded[:, j:j + t].astype(jnp.float32)
                    * lp["conv_w"][:, j].astype(jnp.float32)
                    for j in range(kk))
            y = jax.nn.silu(y).astype(cfg.dtype)
            conv_pool = conv_pool.at[li].set(padded[:, t:])  # last K-1
            q, k, v = _split_qkv(cfg, y)
            g, beta = _gdn_gates(cfg, lp, x)
            o, s_final = chunk_gated_delta_rule(
                q, k, v, g, beta, scale=1.0 / math.sqrt(cfg.linear_dk),
                initial_state=gdn_pool[li], output_final_state=True,
                use_qk_l2norm_in_kernel=True)
            gdn_pool = gdn_pool.at[li].set(s_final)
            z = x @ lp["w_z"]
            x = h_in + _gated_out(cfg, lp, o, z)
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        y2 = _mlp(cfg, lp, x.reshape(batch * t, -1))
        x = h_in + y2.reshape(batch, t, -1).astype(x.dtype)

    hidden = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
    return hidden, {"kv": kv, "gdn": gdn_pool, "conv": conv_pool}
