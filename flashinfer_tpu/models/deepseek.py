"""DeepSeek-V3-family serving model: MLA + DSv3-routed MoE over paged KV.

Second flagship model family (the reference leaves models to vLLM/SGLang;
this is the MLA/MoE counterpart of models/llama.py): multi-latent
attention in the ABSORBED form over the combined compressed paged cache,
DeepSeek-V3 no-aux-loss routing (sigmoid + bias, group-limited top-k),
shared + routed experts, first-k dense layers — built entirely from
flashinfer_tpu ops:

* attention: streaming MLA kernel (`pallas_mla.mla_stream`, reference
  mla/_core.py:1962 + mla.cuh:853) over the combined
  ``[pages, ps, D_ckv + D_kpe_pad]`` cache layout (one DMA per page —
  reference paged_kv_mla_t stores ckv|kpe together too, page.cuh:647);
* cache append: aliased single-launch row-append kernel
  (`mla_append_rows`) so the per-layer alias chain append → attention
  keeps the multi-GB cache in place;
* MoE: `routing_deepseek_v3` (reference noAuxTcKernels.cu) feeding
  `fused_moe` — quantized (int8/fp8) experts ride the grouped
  in-kernel-dequant Pallas GEMM (ops/gmm.py) and never materialize bf16;
* TP sharding: MLA's compressed cache is HEAD-AGNOSTIC, so the KV cache
  replicates over tp while q/o projections shard by head — the TP layout
  unique to MLA (and the reason its KV memory stays 1/tp_size of MHA's).

Absorbed-form math (decode hot path; reference mla/_core.py run):
  q_nope[h] @ W_UK[h] gives the query in compressed space; scores =
  q_abs . ckv + q_pe . kpe; output o = (P @ ckv) @ W_UV[h]. Prefill
  reuses the same path through ragged q-tile plans (the MHA-form prefill
  with decompressed K/V is a known further optimization).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.activation import silu_and_mul
from ..ops.moe import fused_moe
from ..ops.norm import rmsnorm
from ..ops.routing import routing_deepseek_v3


@dataclass(frozen=True)
class DeepseekConfig:
    vocab_size: int = 129280
    hidden_size: int = 7168
    num_layers: int = 61
    num_heads: int = 128
    q_lora_rank: int = 1536  # 0 → direct q projection
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # MoE
    num_experts: int = 256
    num_shared_experts: int = 1
    top_k: int = 8
    n_group: int = 8
    topk_group: int = 4
    routed_scaling_factor: float = 2.5
    moe_intermediate_size: int = 2048
    dense_intermediate_size: int = 18432
    first_k_dense: int = 3
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def kpe_pad(self) -> int:
        """kpe lane-padded to 128 (Mosaic DMA slices are 128-lane)."""
        return ((self.qk_rope_head_dim + 127) // 128) * 128

    @property
    def cache_dim(self) -> int:
        return self.kv_lora_rank + self.kpe_pad

    @classmethod
    def deepseek_v3(cls) -> "DeepseekConfig":
        return cls()

    @classmethod
    def tiny(cls, **kw) -> "DeepseekConfig":
        return replace(
            cls(
                vocab_size=512,
                hidden_size=256,
                num_layers=3,
                num_heads=8,
                q_lora_rank=0,
                kv_lora_rank=256,
                qk_nope_head_dim=64,
                qk_rope_head_dim=64,
                v_head_dim=64,
                num_experts=8,
                num_shared_experts=1,
                top_k=2,
                n_group=2,
                topk_group=1,
                moe_intermediate_size=128,
                dense_intermediate_size=256,
                first_k_dense=1,
            ),
            **kw,
        )


def _layer_keys(cfg: DeepseekConfig, l: int) -> tuple[str, ...]:
    base = ["attn_norm", "mlp_norm", "wkv_a", "kv_norm", "w_uk", "w_uv",
            "wo"]
    base += ["wq_a", "q_norm", "wq_b"] if cfg.q_lora_rank else ["wq"]
    if l < cfg.first_k_dense:
        base += ["d_gate", "d_up", "d_w2"]
    else:
        base += ["router", "router_bias", "w13", "w2"]
        if cfg.num_shared_experts:
            base += ["s_gate", "s_up", "s_w2"]
    return tuple(base)


def init_params(key: jax.Array, cfg: DeepseekConfig) -> dict:
    """Random-normal params. Per-layer weights live under ``layers``
    (a list of dicts — dense and MoE layers have different key sets, so
    the llama-style stacked layout does not apply)."""
    h = cfg.hidden_size
    hh, dn, dr = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    dv, kvr, qr = cfg.v_head_dim, cfg.kv_lora_rank, cfg.q_lora_rank
    keys = iter(jax.random.split(key, 4 + 16 * cfg.num_layers))

    def w(*shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(cfg.dtype)

    layers = []
    for l in range(cfg.num_layers):
        lp = {
            "attn_norm": jnp.ones((h,), cfg.dtype),
            "mlp_norm": jnp.ones((h,), cfg.dtype),
            "wkv_a": w(h, kvr + dr),
            "kv_norm": jnp.ones((kvr,), cfg.dtype),
            "w_uk": w(hh, dn, kvr, scale=1.0 / math.sqrt(dn)),
            "w_uv": w(hh, kvr, dv, scale=1.0 / math.sqrt(kvr)),
            "wo": w(hh * dv, h),
        }
        if qr:
            lp["wq_a"] = w(h, qr)
            lp["q_norm"] = jnp.ones((qr,), cfg.dtype)
            lp["wq_b"] = w(qr, hh * (dn + dr))
        else:
            lp["wq"] = w(h, hh * (dn + dr))
        if l < cfg.first_k_dense:
            i_sz = cfg.dense_intermediate_size
            lp["d_gate"] = w(h, i_sz)
            lp["d_up"] = w(h, i_sz)
            lp["d_w2"] = w(i_sz, h)
        else:
            e, i_sz = cfg.num_experts, cfg.moe_intermediate_size
            lp["router"] = w(h, e)
            lp["router_bias"] = jnp.zeros((e,), jnp.float32)
            lp["w13"] = w(e, h, 2 * i_sz)
            lp["w2"] = w(e, i_sz, h)
            if cfg.num_shared_experts:
                si = i_sz * cfg.num_shared_experts
                lp["s_gate"] = w(h, si)
                lp["s_up"] = w(h, si)
                lp["s_w2"] = w(si, h)
        layers.append(lp)
    return {
        "embed": w(cfg.vocab_size, h, scale=0.02),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": w(h, cfg.vocab_size),
        "layers": layers,
    }


def quantize_expert_params(params: dict, cfg: DeepseekConfig,
                           dtype=jnp.int8) -> dict:
    """Quantize MoE expert weights to int8 (TPU-native: the int8→bf16
    upcast is one native VPU op — measured 4.2× over bf16 ragged_dot on
    v5e) or fp8, with per-128×128-block scales consumed by the grouped
    in-kernel-dequant GEMM. Router/shared/dense/attention weights stay
    bf16."""
    out = dict(params)
    new_layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        for name in ("w13", "w2"):
            if name not in lp:
                continue
            wf = lp[name].astype(jnp.float32)
            e, r, c = wf.shape
            if r % 128 or c % 128:
                continue  # tiny configs: keep bf16
            blocks = wf.reshape(e, r // 128, 128, c // 128, 128)
            amax = jnp.max(jnp.abs(blocks), axis=(2, 4))
            qmax = 127.0 if dtype == jnp.int8 else 448.0
            scale = jnp.maximum(amax, 1e-8) / qmax
            q = blocks / scale[:, :, None, :, None]
            if dtype == jnp.int8:
                q = jnp.clip(jnp.round(q), -127, 127)
            lp[name] = q.reshape(e, r, c).astype(dtype)
            lp[name + "_scale"] = scale.astype(jnp.float32)
        new_layers.append(lp)
    out["layers"] = new_layers
    return out


def init_kv_cache(cfg: DeepseekConfig, num_pages: int, page_size: int,
                  dtype=None) -> jax.Array:
    """Combined compressed cache [L, pages, ps, D_ckv + D_kpe_pad] — ckv
    and (lane-padded) kpe share the page row so the decode kernel issues
    ONE DMA descriptor per page (measured 317 → 474 GB/s vs separate
    caches; reference paged_kv_mla_t also combines them, page.cuh:647)."""
    return jnp.zeros(
        (cfg.num_layers, num_pages, page_size, cfg.cache_dim),
        dtype or cfg.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Half-split rotary on [B(, S), H, D] with positions [B(, S)]."""
    d = x.shape[-1]
    half = d // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = positions[..., None].astype(jnp.float32)[..., None, :] * freqs
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).astype(x.dtype)


def _q_heads(cfg: DeepseekConfig, lp: dict, x: jax.Array, positions):
    """x [..., H] → (q_abs [..., heads, kvr], q_pe [..., heads, dr]):
    the absorbed query (q_nope @ W_UK) and the roped positional query."""
    hh, dn, dr = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    if cfg.q_lora_rank:
        cq = rmsnorm(x @ lp["wq_a"], lp["q_norm"], eps=cfg.rms_eps)
        q = (cq @ lp["wq_b"]).reshape(*x.shape[:-1], hh, dn + dr)
    else:
        q = (x @ lp["wq"]).reshape(*x.shape[:-1], hh, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = _rope(q_pe, positions, cfg.rope_theta)
    q_abs = jnp.einsum("...hd,hdk->...hk", q_nope.astype(jnp.float32),
                       lp["w_uk"].astype(jnp.float32)).astype(x.dtype)
    return q_abs, q_pe


def _ckv_row(cfg: DeepseekConfig, lp: dict, x: jax.Array, positions):
    """x [..., H] → combined cache row [..., kvr + kpe_pad]."""
    kvr, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    c = x @ lp["wkv_a"]  # [..., kvr + dr]
    ckv = rmsnorm(c[..., :kvr], lp["kv_norm"], eps=cfg.rms_eps)
    kpe = _rope(c[..., None, kvr:], positions, cfg.rope_theta)[..., 0, :]
    pad = cfg.kpe_pad - dr
    if pad:
        kpe = jnp.pad(kpe, [(0, 0)] * (kpe.ndim - 1) + [(0, pad)])
    return jnp.concatenate([ckv, kpe], axis=-1)


def _mla_out(cfg: DeepseekConfig, lp: dict, o_c: jax.Array) -> jax.Array:
    """Compressed attention output [..., heads, kvr] → model dim."""
    o_v = jnp.einsum("...hk,hkv->...hv", o_c.astype(jnp.float32),
                     lp["w_uv"].astype(jnp.float32)).astype(o_c.dtype)
    return o_v.reshape(*o_c.shape[:-2],
                       cfg.num_heads * cfg.v_head_dim) @ lp["wo"]


def _moe_mlp(cfg: DeepseekConfig, lp: dict, x: jax.Array,
             l: int) -> jax.Array:
    if l < cfg.first_k_dense:
        gate, up = x @ lp["d_gate"], x @ lp["d_up"]
        return silu_and_mul(jnp.concatenate([gate, up], -1)) @ lp["d_w2"]
    logits = (x @ lp["router"]).astype(jnp.float32)
    ids, wts = routing_deepseek_v3(
        logits, lp["router_bias"], cfg.top_k, cfg.n_group,
        cfg.topk_group, cfg.routed_scaling_factor)
    y = fused_moe(x, lp["w13"], lp["w2"], ids, wts,
                  w13_scale=lp.get("w13_scale"),
                  w2_scale=lp.get("w2_scale"), out_dtype=x.dtype)
    if cfg.num_shared_experts:
        gate, up = x @ lp["s_gate"], x @ lp["s_up"]
        y = y + silu_and_mul(jnp.concatenate([gate, up], -1)) @ lp["s_w2"]
    return y


@partial(jax.jit, static_argnames=("cfg", "interpret", "kv_scale"),
         donate_argnums=(2,))
def decode_step(
    params: dict,
    cfg: DeepseekConfig,
    kv_caches: jax.Array,  # [L, pages, ps, cache_dim] — DONATED
    token_ids: jax.Array,  # [B]
    positions: jax.Array,  # [B] position of the new token
    page_table: jax.Array,  # [B, P]
    kv_lens: jax.Array,  # [B] kv length INCLUDING the new token
    *,
    kv_scale: float = 1.0 / 16.0,  # dequant scale for int8/fp8 caches
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One absorbed-MLA decode step; returns (logits [B, V], new cache).

    Per layer: append the new token's combined (ckv | kpe) row with the
    aliased Pallas append kernel, then run the streaming MLA kernel over
    the updated cache — append → attention → next append is a linear
    ownership chain so the cache updates in place (models/llama.py has
    the measured copy-cost story)."""
    from ..ops.attention.pallas_mla import mla_append_rows, mla_stream

    batch = token_ids.shape[0]
    num_layers, num_pages, page_size, _ = kv_caches.shape
    kv_flat = kv_caches.reshape(num_layers * num_pages, page_size,
                                cfg.cache_dim)
    positions = positions.astype(jnp.int32)
    entry0 = page_table[jnp.arange(batch), positions // page_size]
    off = positions % page_size
    sm_scale = 1.0 / math.sqrt(cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
    w_req = jnp.arange(batch, dtype=jnp.int32)
    w_tile = jnp.zeros((batch,), jnp.int32)
    q_lens = jnp.ones((batch,), jnp.int32)

    quant = kv_caches.dtype in (jnp.int8, jnp.float8_e4m3fn,
                                jnp.float8_e5m2)
    kq_scale = float(kv_scale) if quant else 1.0

    def to_cache(r):
        if not quant:
            return r
        rs = r.astype(jnp.float32) / kq_scale
        if kv_caches.dtype == jnp.int8:
            return jnp.clip(jnp.round(rs), -127, 127).astype(jnp.int8)
        return rs.astype(kv_caches.dtype)

    x = params["embed"][token_ids].astype(cfg.dtype)  # [B, H]
    for l in range(cfg.num_layers):
        lp = params["layers"][l]
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        row = _ckv_row(cfg, lp, x, positions)  # [B, cache_dim]
        kv_flat = mla_append_rows(
            kv_flat, entry0 + l * num_pages, off, to_cache(row),
            interpret=interpret)
        q_abs, q_pe = _q_heads(cfg, lp, x, positions)
        q = jnp.concatenate([q_abs, q_pe], -1).reshape(
            batch, cfg.num_heads, cfg.kv_lora_rank + cfg.qk_rope_head_dim)
        # full flat cache + offset page table: slicing out the layer's
        # pages would materialize a copy of the whole layer cache per step
        o_c, _ = mla_stream(
            q, kv_flat, None, page_table + l * num_pages, kv_lens,
            q_lens, w_req, w_tile,
            num_heads=cfg.num_heads, tq=1,
            head_dim_ckv=cfg.kv_lora_rank, sm_scale=sm_scale,
            causal=False, ckv_scale=kq_scale, kpe_scale=kq_scale,
            interpret=interpret)
        o_c = o_c.reshape(batch, cfg.num_heads, cfg.kv_lora_rank)
        x = h_in + _mla_out(cfg, lp, o_c)
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        x = h_in + _moe_mlp(cfg, lp, x, l).astype(x.dtype)

    x = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, kv_flat.reshape(kv_caches.shape)


def prefill(
    params: dict,
    cfg: DeepseekConfig,
    kv_caches: jax.Array,  # [L, pages, ps, cache_dim]
    token_ids: jax.Array,  # [total_q] ragged tokens
    qo_indptr,  # host [B+1]
    page_table: jax.Array,  # [B, P] pages owned by each request
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Ragged causal MLA prefill; returns (hidden [total_q, H], caches).

    Rides the SAME streaming MLA kernel through ragged q-tile work items
    (plan emits (request, q-tile) pairs; reference mla/_core.py plan)
    — MLA prefill and decode share one kernel by design. Cache rows for
    the prompt tokens are scattered in before attention (a one-time
    prefill cost, not the per-step hot path)."""
    import numpy as np

    from ..ops.attention.mla import BatchMLAPagedAttentionWrapper

    qo = np.asarray(qo_indptr, np.int64)
    batch = len(qo) - 1
    q_lens = qo[1:] - qo[:-1]
    num_layers, num_pages, page_size, _ = kv_caches.shape
    total_q = token_ids.shape[0]
    pos = jnp.concatenate(
        [jnp.arange(int(n)) for n in q_lens]
    ) if batch else jnp.arange(total_q)
    # flat cache slot of each ragged token: page_table[b, pos//ps]*ps+pos%ps
    b_of = np.repeat(np.arange(batch), q_lens)
    pt_np = np.asarray(page_table)
    slot = (pt_np[b_of, np.asarray(pos) // page_size] * page_size
            + np.asarray(pos) % page_size)
    slot = jnp.asarray(slot, jnp.int32)

    wrapper = BatchMLAPagedAttentionWrapper()
    kv_indptr = np.arange(batch + 1) * pt_np.shape[1]
    wrapper.plan(
        qo, kv_indptr, pt_np.reshape(-1), q_lens.astype(np.int32),
        num_heads=cfg.num_heads, head_dim_ckv=cfg.kv_lora_rank,
        head_dim_kpe=cfg.qk_rope_head_dim, page_size=page_size,
        causal=True, sm_scale=1.0 / math.sqrt(
            cfg.qk_nope_head_dim + cfg.qk_rope_head_dim),
    )

    x = params["embed"][token_ids].astype(cfg.dtype)
    kvr, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    caches = kv_caches
    for l in range(cfg.num_layers):
        lp = params["layers"][l]
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        rows = _ckv_row(cfg, lp, x, pos)  # [total_q, cache_dim]
        cache_l = caches[l].reshape(num_pages * page_size, cfg.cache_dim)
        cache_l = cache_l.at[slot].set(rows.astype(caches.dtype))
        cache_l = cache_l.reshape(num_pages, page_size, cfg.cache_dim)
        caches = caches.at[l].set(cache_l)
        q_abs, q_pe = _q_heads(cfg, lp, x, pos)
        o_c = wrapper.run(
            q_abs, q_pe, cache_l, None, interpret=interpret)
        x = h_in + _mla_out(cfg, lp, o_c)
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        x = h_in + _moe_mlp(cfg, lp, x, l).astype(x.dtype)
    return rmsnorm(x, params["final_norm"], eps=cfg.rms_eps), caches


# ---------------------------------------------------------------------------
# Sharded decode: shard_map over (dp, tp) — MLA-specific TP layout
# ---------------------------------------------------------------------------


def make_sharded_decode_fn(
    cfg: DeepseekConfig, mesh: Mesh, *, dp: str = "dp", tp: str = "tp",
    moe_mode: str = "masked",  # "masked" | "ep"
    interpret: bool | None = None,
):
    """Jitted shard_map decode over (dp, tp).

    MLA TP layout: q/o projections and W_UK/W_UV shard by HEAD over tp;
    the compressed kv projection (wkv_a) and the cache are head-agnostic
    and REPLICATE over tp (each rank appends the identical row — MLA's
    KV memory is 1/tp of MHA). MoE experts shard over tp on the expert
    axis; ``moe_mode="masked"`` computes every token's local-expert share
    on all ranks and psums, ``moe_mode="ep"`` shards tokens over tp and
    runs the drop-free EP dispatch/combine all-to-all (parallel/ep.py,
    reference moe_ep Split pipeline). Batch/pages shard over dp.
    """
    tp_size = mesh.shape[tp]
    if cfg.num_heads % tp_size or cfg.num_experts % tp_size:
        raise ValueError("heads and experts must divide tp size")
    if moe_mode not in ("masked", "ep"):
        raise ValueError(f"unknown moe_mode {moe_mode!r}")
    cfg_loc = replace(cfg, num_heads=cfg.num_heads // tp_size)
    e_loc = cfg.num_experts // tp_size

    def local_step(params, kv_caches, token_ids, positions, page_table,
                   kv_lens):
        from ..ops.attention.pallas_mla import mla_append_rows, mla_stream

        batch = token_ids.shape[0]
        num_layers, num_pages, page_size, _ = kv_caches.shape
        kv_flat = kv_caches.reshape(num_layers * num_pages, page_size,
                                    cfg.cache_dim)
        pos = positions.astype(jnp.int32)
        entry0 = page_table[jnp.arange(batch), pos // page_size]
        off = pos % page_size
        sm_scale = 1.0 / math.sqrt(
            cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
        w_req = jnp.arange(batch, dtype=jnp.int32)
        w_tile = jnp.zeros((batch,), jnp.int32)
        q_lens = jnp.ones((batch,), jnp.int32)
        my_rank = jax.lax.axis_index(tp)

        x = params["embed"][token_ids].astype(cfg.dtype)
        for l in range(cfg.num_layers):
            lp = params["layers"][l]
            h_in = x
            x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
            row = _ckv_row(cfg, lp, x, pos)
            kv_flat = mla_append_rows(
                kv_flat, entry0 + l * num_pages, off, row,
                interpret=interpret)
            q_abs, q_pe = _q_heads(cfg_loc, lp, x, pos)
            q = jnp.concatenate([q_abs, q_pe], -1).reshape(
                batch, cfg_loc.num_heads,
                cfg.kv_lora_rank + cfg.qk_rope_head_dim)
            o_c, _ = mla_stream(
                q, kv_flat, None, page_table + l * num_pages, kv_lens,
                q_lens, w_req, w_tile,
                num_heads=cfg_loc.num_heads, tq=1,
                head_dim_ckv=cfg.kv_lora_rank, sm_scale=sm_scale,
                causal=False, interpret=interpret)
            o_c = o_c.reshape(batch, cfg_loc.num_heads, cfg.kv_lora_rank)
            x = h_in + jax.lax.psum(_mla_out(cfg_loc, lp, o_c), tp)
            h_in = x
            x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
            if l < cfg.first_k_dense:
                y_full = jax.lax.psum(_moe_mlp(cfg, lp, x, l), tp)
            else:
                logits = (x @ lp["router"]).astype(jnp.float32)
                ids, wts = routing_deepseek_v3(
                    logits, lp["router_bias"], cfg.top_k, cfg.n_group,
                    cfg.topk_group, cfg.routed_scaling_factor)
                if moe_mode == "ep":
                    # REAL EP: tokens shard over tp, drop-free HT
                    # dispatch/combine (parallel/ep.py), results gathered
                    # back to the tp-replicated activations
                    from ..parallel.ep import moe_ep_forward

                    bl = batch // tp_size
                    start = my_rank * bl
                    sl = lambda a: jax.lax.dynamic_slice_in_dim(
                        a, start, bl)
                    y_r = moe_ep_forward(
                        sl(x), sl(ids), sl(wts), lp["w13"], lp["w2"],
                        tp, num_experts=cfg.num_experts, algo="ht")
                    y_full = jax.lax.all_gather(
                        y_r.astype(x.dtype), tp, axis=0, tiled=True)
                else:
                    # masked-TP: every rank sees all tokens, computes its
                    # expert shard; foreign ids hit expert 0 with weight 0
                    lo = my_rank * e_loc
                    mine = (ids >= lo) & (ids < lo + e_loc)
                    ids_loc = jnp.where(mine, ids - lo, 0)
                    wts_loc = jnp.where(mine, wts, 0.0)
                    y = fused_moe(x, lp["w13"], lp["w2"], ids_loc,
                                  wts_loc, out_dtype=x.dtype)
                    y_full = jax.lax.psum(y, tp)
                if cfg.num_shared_experts:
                    g, u = x @ lp["s_gate"], x @ lp["s_up"]
                    y_s = silu_and_mul(
                        jnp.concatenate([g, u], -1)) @ lp["s_w2"]
                    y_full = y_full + jax.lax.psum(y_s, tp)
            x = h_in + y_full.astype(x.dtype)

        x = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
        logits_loc = (x @ params["lm_head"]).astype(jnp.float32)
        logits = jax.lax.all_gather(logits_loc, tp, axis=1, tiled=True)
        return logits, kv_flat.reshape(kv_caches.shape)

    cache_spec = P(None, dp, None, None)
    in_specs = (
        param_specs(cfg, tp=tp), cache_spec, P(dp), P(dp), P(dp, None),
        P(dp),
    )
    out_specs = (P(dp, None), cache_spec)
    fn = shard_map(local_step, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return jax.jit(fn), in_specs, out_specs


def param_specs(cfg: DeepseekConfig, *, tp: str = "tp") -> dict:
    """PartitionSpec tree: q/o/W_UK/W_UV shard by head over tp, the
    compressed kv path and cache replicate, experts shard over tp."""
    def layer_spec(l: int) -> dict:
        sp = {
            "attn_norm": P(), "mlp_norm": P(), "wkv_a": P(),
            "kv_norm": P(), "w_uk": P(tp), "w_uv": P(tp),
            "wo": P(tp, None),
        }
        if cfg.q_lora_rank:
            sp.update(wq_a=P(), q_norm=P(), wq_b=P(None, tp))
        else:
            sp["wq"] = P(None, tp)  # head-major columns: tp = head split
        if l < cfg.first_k_dense:
            sp.update(d_gate=P(None, tp), d_up=P(None, tp),
                      d_w2=P(tp, None))
        else:
            sp.update(router=P(), router_bias=P(),
                      w13=P(tp), w2=P(tp))
            if cfg.num_shared_experts:
                sp.update(s_gate=P(None, tp), s_up=P(None, tp),
                          s_w2=P(tp, None))
        return sp

    return {
        "embed": P(), "final_norm": P(), "lm_head": P(None, tp),
        "layers": [layer_spec(l) for l in range(cfg.num_layers)],
    }


def shard_params(params: dict, cfg: DeepseekConfig, mesh: Mesh,
                 specs) -> dict:
    """Device_put params to the spec tree from make_sharded_decode_fn
    (manual walk: PartitionSpec is itself a tuple-pytree, so tree.map
    over (params, specs) would descend into the specs)."""
    put = lambda v, s: jax.device_put(v, NamedSharding(mesh, s))
    out = {k: put(params[k], specs[k])
           for k in ("embed", "final_norm", "lm_head")}
    out["layers"] = [
        {k: put(lp[k], sp[k]) for k in lp}
        for lp, sp in zip(params["layers"], specs["layers"])
    ]
    return out
