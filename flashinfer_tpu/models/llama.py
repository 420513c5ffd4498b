"""Flagship serving model: Llama-3-geometry transformer over paged KV.

This is the adopter-side model the reference leaves to vLLM/SGLang
(SURVEY §1): token-by-token paged-KV decode and ragged prefill built
entirely from flashinfer_tpu ops — paged decode attention (Pallas), RoPE,
RMSNorm, gated-MLP activation, optional fused MoE — plus a
shard_map-sharded decode step (dp × tp) used by the multi-chip dry run.

Design notes (TPU-first):
* Layers are stacked on a leading axis and driven by `lax.scan`, so the
  whole L-layer decode compiles to ONE scanned layer body (single Pallas
  kernel instance regardless of depth).
* The KV cache is scan-carried per layer: xs = per-layer (params, cache),
  ys = updated cache. All shapes static; decode never retraces.
* TP sharding follows megatron algebra: qkv/gate/up column-split, o/w2
  row-split with one psum each — the two collectives per layer ride ICI.
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
from ..ops.attention.pallas_decode import paged_decode_attention
from ..ops.attention.pallas_prefill import build_prefill_plan, run_prefill
from ..ops.moe import fused_moe
from ..ops.norm import rmsnorm
from ..ops.routing import routing_renormalize


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    num_layers: int = 32
    num_qo_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 14336
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # MoE (0 experts → dense gated MLP)
    num_experts: int = 0
    top_k: int = 2
    # decode-step GEMM path for quantized int8 weights: "xla" (convert-dot)
    # or "gmm" (Pallas dense_matmul_quant — streams weights at int8 width;
    # at M=batch=64 the XLA path runs well under the weight-streaming
    # roofline, benchmarks/dense_smallm_ab.py). Prefill always uses XLA
    # (M is large there; the MXU, not weight DMA, binds).
    decode_gemm_impl: str = "xla"
    # prefill GEMM path for quantized weights: "xla" (convert-dot) or
    # "w8a8" (per-token int8 activations x int8 weights on the MXU's
    # native 2x int8 mode — prefill M is large, so GEMMs are
    # compute-bound and the int8 matmul halves their time; decode stays
    # "xla" because M=batch GEMMs are weight-DMA-bound, measured r3)
    prefill_gemm_impl: str = "xla"

    @classmethod
    def llama3_8b(cls) -> "LlamaConfig":
        return cls()

    @classmethod
    def tiny(cls, **kw) -> "LlamaConfig":
        return replace(
            cls(
                vocab_size=512,
                hidden_size=256,
                num_layers=4,
                num_qo_heads=8,
                num_kv_heads=4,
                head_dim=128,
                intermediate_size=512,
            ),
            **kw,
        )


def init_params(key: jax.Array, cfg: LlamaConfig) -> dict:
    """Random-normal params, layer-stacked for lax.scan."""
    h, d = cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_qo_heads, cfg.num_kv_heads
    i_sz, l, v = cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    keys = iter(jax.random.split(key, 16))

    def w(key, *shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(cfg.dtype)

    p = {
        "embed": w(next(keys), v, h, scale=0.02),
        "wq": w(next(keys), l, h, hq * d),
        "wk": w(next(keys), l, h, hkv * d),
        "wv": w(next(keys), l, h, hkv * d),
        "wo": w(next(keys), l, hq * d, h),
        "attn_norm": jnp.ones((l, h), cfg.dtype),
        "mlp_norm": jnp.ones((l, h), cfg.dtype),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": w(next(keys), h, v),
    }
    if cfg.num_experts:
        e = cfg.num_experts
        p["router"] = w(next(keys), l, h, e)
        # gate/up kept as separate trailing groups [..., 2, I] so a TP
        # column-split of I never mixes the halves
        p["w13"] = w(next(keys), l, e, h, 2, i_sz)
        p["w2"] = w(next(keys), l, e, i_sz, h)
    else:
        p["w_gate"] = w(next(keys), l, h, i_sz)
        p["w_up"] = w(next(keys), l, h, i_sz)
        p["w2"] = w(next(keys), l, i_sz, h)
    return p


def quantize_params(params: dict, cfg: LlamaConfig) -> dict:
    """Quantize the projection/MLP weights to FP8 e4m3 with per-output-
    channel scales (the serving deployment format — reference analog:
    FP8-weight GEMMs, gemm_groupwise; here dequant fuses into the XLA dot
    at full MXU rate, measured 212 TFLOP/s on v5e).

    Quantized entries become ``(q_e4m3, scale_f32[out])``; norms/embeddings
    stay bf16. ``_mm`` consumes either form, so decode_step/prefill work
    unchanged on quantized params. HBM footprint halves: weights stream
    from HBM as fp8 bytes (VERDICT #4: no bf16 weight copy materializes —
    the upcast happens in-register inside the fused dot).
    """
    qkeys = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w2", "lm_head"}
    if cfg.num_experts:
        qkeys -= {"w2"}  # MoE expert weights keep their own quant path
    layer_keys = set(_layer_keys(cfg))
    out = {}
    for name, w in params.items():
        if name not in qkeys:
            out[name] = w
            continue
        wf = w.astype(jnp.float32)
        # reduce every dim except the trailing out-channel (and the
        # leading layer-stack dim for per-layer weights)
        lead = 1 if name in layer_keys else 0
        amax = jnp.max(jnp.abs(wf), axis=tuple(range(lead, w.ndim - 1)),
                       keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 448.0  # e4m3 max normal
        q = (wf / scale).astype(jnp.float8_e4m3fn)
        out[name] = (q, scale.astype(jnp.float32))
    return out


def init_params_quantized(key: jax.Array, cfg: LlamaConfig,
                          weight_dtype=jnp.float8_e4m3fn) -> dict:
    """Random params generated DIRECTLY in the fp8 deployment format.

    Building full-precision 8B params first needs ~2x the final HBM
    (init_params + quantize_params OOMs a 16 GB chip at 32 layers), so
    each layer slice is generated, quantized and freed before the next —
    peak transient is one [hidden, intermediate] f32 tensor (~0.25 GB).
    """
    h, d = cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_qo_heads, cfg.num_kv_heads
    i_sz, l, v = cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    if cfg.num_experts:
        raise NotImplementedError("quantized init: dense models only")
    keys = iter(jax.random.split(key, 16))

    @partial(jax.jit, static_argnames=("in_dim", "out_dim"))
    def gen_q(key, in_dim, out_dim):
        w = jax.random.normal(key, (in_dim, out_dim), jnp.float32)
        w = w * (1.0 / math.sqrt(in_dim))
        amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        if weight_dtype == jnp.int8:  # int8->bf16 is a native VPU convert
            scale = jnp.maximum(amax, 1e-8) / 127.0
            return (jnp.clip(jnp.round(w / scale), -127, 127)
                    .astype(jnp.int8), scale)
        scale = jnp.maximum(amax, 1e-8) / 448.0
        return (w / scale).astype(weight_dtype), scale

    def stack_q(key, in_dim, out_dim):
        qs, ss = [], []
        for lk in jax.random.split(key, l):
            q, s = gen_q(lk, in_dim, out_dim)
            qs.append(q)
            ss.append(s)
        return jnp.stack(qs), jnp.stack(ss)

    p = {
        "embed": (jax.random.normal(next(keys), (v, h), jnp.float32)
                  * 0.02).astype(cfg.dtype),
        "wq": stack_q(next(keys), h, hq * d),
        "wk": stack_q(next(keys), h, hkv * d),
        "wv": stack_q(next(keys), h, hkv * d),
        "wo": stack_q(next(keys), hq * d, h),
        "attn_norm": jnp.ones((l, h), cfg.dtype),
        "mlp_norm": jnp.ones((l, h), cfg.dtype),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "w_gate": stack_q(next(keys), h, i_sz),
        "w_up": stack_q(next(keys), h, i_sz),
        "w2": stack_q(next(keys), i_sz, h),
    }
    q, s = gen_q(next(keys), h, v)
    p["lm_head"] = (q, s)
    return p


def _mm(x: jax.Array, w, impl: str = "xla") -> jax.Array:
    """x @ w for plain or fp8-quantized ``(q, scale)`` weights; the upcast
    and scale fuse into the XLA dot (no bf16 weight copy in HBM).

    ``impl="gmm"`` routes int8 weights through the Pallas
    ``dense_matmul_quant`` kernel (weight streamed at int8 width with the
    dequant hidden under the MXU pipeline) — the small-M decode-step path;
    the per-output-channel scale applies outside as an XLA epilogue."""
    if isinstance(w, tuple):
        q, scale = w
        if impl == "w8a8" and q.dtype == jnp.int8:
            # native int8 MXU path: activations quantize per token, the
            # int8xint8->int32 matmul runs at 2x the bf16 MXU rate and
            # skips the VPU weight upcast entirely (measured 352 vs
            # 178 TF/s at M=4096; the decode win is the removed convert)
            from ..ops.gemm import mm_int8

            lead = x.shape[:-1]
            y = mm_int8(x.reshape(-1, x.shape[-1]), q,
                        b_scale=scale.reshape(-1), out_dtype=x.dtype)
            return y.reshape(*lead, -1)
        if impl == "gmm" and q.dtype == jnp.int8 and x.ndim == 2:
            from ..ops.gmm import dense_matmul_quant

            y = dense_matmul_quant(x, q, None)
            return y * scale.astype(y.dtype)
        return (x @ q.astype(x.dtype)) * scale.astype(x.dtype)
    return x @ w


def init_kv_cache(
    cfg: LlamaConfig, num_pages: int, page_size: int, dtype=None
) -> jax.Array:
    """Combined per-layer paged cache [L, pages, 2, page_size, Hkv*D] —
    the reference's combined layout (decode.py:1841) with a layer axis and
    the head/dim axes PRE-MERGED.  The merge matters on TPU: the physical
    tiling covers the minor-most two dims, so reshaping [ps, Hkv, D] ->
    [ps, Hkv*D] at step time is a full-cache relayout copy (measured
    13 ms/step on a 2 GB cache).  Kernels address heads as lane ranges of
    Hkv*D, so this is their native layout; k and v of a page share one
    DMA descriptor in the decode kernel."""
    shape = (cfg.num_layers, num_pages, 2, page_size,
             cfg.num_kv_heads * cfg.head_dim)
    dtype = dtype or cfg.dtype
    return jnp.zeros(shape, dtype)


def _rope_tables(positions: jax.Array, d: int, theta: float):
    """cos/sin tables for :func:`_rope` — position-only, so the decode
    step computes them ONCE and reuses them across all layers (r5: the
    per-layer recompute was 2L trig+broadcast passes per step)."""
    half = d // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = positions[..., None].astype(jnp.float32)[..., None, :] * freqs
    return jnp.cos(ang), jnp.sin(ang)  # [..., 1, half]


def _rope(x: jax.Array, positions: jax.Array, theta: float,
          tables=None) -> jax.Array:
    """RoPE on [B(, S), H, D] with per-row positions [B(, S)] (interleaved
    halves, reference pos_enc.cuh rotary convention)."""
    d = x.shape[-1]
    half = d // 2
    cos, sin = tables if tables is not None else _rope_tables(
        positions, d, theta)
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).astype(x.dtype)


def _append_decode_kv(
    k_cache_l: jax.Array,  # [pages, ps, Hkv, D]
    v_cache_l: jax.Array,
    k_new: jax.Array,  # [B, Hkv, D]
    v_new: jax.Array,
    page_table: jax.Array,  # [B, P]
    positions: jax.Array,  # [B] token position being written
) -> tuple[jax.Array, jax.Array]:
    ps = k_cache_l.shape[1]
    batch = positions.shape[0]
    entry = page_table[jnp.arange(batch), positions // ps]
    off = positions % ps
    k_cache_l = k_cache_l.at[entry, off].set(k_new.astype(k_cache_l.dtype))
    v_cache_l = v_cache_l.at[entry, off].set(v_new.astype(v_cache_l.dtype))
    return k_cache_l, v_cache_l


def _mlp(cfg: LlamaConfig, lp: dict, x: jax.Array,
         impl: str = "xla") -> jax.Array:
    if cfg.num_experts:
        logits = (x @ lp["router"]).astype(jnp.float32)
        ids, wts = routing_renormalize(logits, cfg.top_k)
        e, h, _, i_loc = lp["w13"].shape
        w13 = lp["w13"].reshape(e, h, 2 * i_loc)
        return fused_moe(x, w13, lp["w2"], ids, wts).astype(x.dtype)
    if "w13d" in lp:  # fused gate‖up (fuse_qkv_mlp): one GEMM
        return _mm(silu_and_mul(_mm(x, lp["w13d"], impl)), lp["w2"], impl)
    gate = _mm(x, lp["w_gate"], impl)
    up = _mm(x, lp["w_up"], impl)
    return _mm(silu_and_mul(jnp.concatenate([gate, up], axis=-1)),
               lp["w2"], impl)


def _index_layer(v, l: int):
    """params[k][l] for plain arrays or fp8 (q, scale) tuples."""
    if isinstance(v, tuple):
        return (v[0][l], v[1][l])
    return v[l]


def _layer_keys(cfg: LlamaConfig, params: dict | None = None
                ) -> tuple[str, ...]:
    base = ("wq", "wk", "wv", "wo", "attn_norm", "mlp_norm")
    if cfg.num_experts:
        keys = base + ("router", "w13", "w2")
    else:
        keys = base + ("w_gate", "w_up", "w2")
    if params is not None:  # fused-weight layouts (fuse_qkv_mlp)
        if "wqkv" in params:
            keys = ("wqkv",) + tuple(
                k for k in keys if k not in ("wq", "wk", "wv"))
        if "w13d" in params:
            keys = tuple(
                k for k in keys if k not in ("w_gate", "w_up")) + ("w13d",)
    return keys


def fuse_qkv_mlp(params: dict, cfg: LlamaConfig) -> dict:
    """Merge wq/wk/wv → ``wqkv`` and w_gate/w_up → ``w13d`` (out-channel
    concat; per-output-channel quant scales concat the same way).

    Decode at small M pays a fixed scheduling overhead per GEMM (model
    attribution: qkvo+lm_head+norms ~4.1 ms of a 20.8 ms step vs a ~2 ms
    DMA floor); fusing drops 5 GEMMs/layer to 3. Works for both plain and
    quantized ``(q, scale)`` params. NOT for the TP-sharded paths — the
    megatron column split must split q/k/v (gate/up) separately."""
    def cat(ws):
        if isinstance(ws[0], tuple):
            return (jnp.concatenate([w[0] for w in ws], axis=-1),
                    jnp.concatenate([w[1] for w in ws], axis=-1))
        return jnp.concatenate(ws, axis=-1)

    out = dict(params)
    if all(k in out for k in ("wq", "wk", "wv")):
        out["wqkv"] = cat([out.pop("wq"), out.pop("wk"), out.pop("wv")])
    if all(k in out for k in ("w_gate", "w_up")):
        out["w13d"] = cat([out.pop("w_gate"), out.pop("w_up")])
    return out


def _qkv(x: jax.Array, lp: dict, cfg: LlamaConfig, impl: str = "xla"
         ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """q/k/v projections of [N, H] → ([N, Hq, D], [N, Hkv, D] ×2) for
    separate or fused (``wqkv``) weights."""
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    n = x.shape[0]
    if "wqkv" in lp:
        qkv = _mm(x, lp["wqkv"], impl)
        q = qkv[:, : hq * d]
        k = qkv[:, hq * d: (hq + hkv) * d]
        v = qkv[:, (hq + hkv) * d:]
    else:
        q = _mm(x, lp["wq"], impl)
        k = _mm(x, lp["wk"], impl)
        v = _mm(x, lp["wv"], impl)
    return (q.reshape(n, hq, d), k.reshape(n, hkv, d),
            v.reshape(n, hkv, d))


@partial(jax.jit,
         static_argnames=("cfg", "interpret", "kv_scale", "append_mode"),
         donate_argnums=(2,))
def decode_step(
    params: dict,
    cfg: LlamaConfig,
    kv_caches: jax.Array,  # [L, pages, 2, ps, Hkv, D] — DONATED
    token_ids: jax.Array,  # [B]
    positions: jax.Array,  # [B] position of the new token (== prior kv_len)
    page_table: jax.Array,  # [B, P]
    kv_lens: jax.Array,  # [B] kv length INCLUDING the new token
    *,
    kv_scale: float = 1.0 / 32.0,  # dequant scale for int8/fp8 caches
    append_mode: str = "inject",  # "inject" (default; r5) | "per_layer"
    # inject: the cache stays read-only through all 32 layers (the
    # attention kernel folds the new token's (k, v) in as one extra
    # online-softmax column) and ONE aliased Pallas append writes all
    # L*B rows at the end — measured 20.3 vs 23.9 ms/step same-process
    # vs per-layer appends at the 32L bench geometry (r4's inject used
    # an XLA scatter, which copied the cache and failed to compile at
    # 32L; with the batched aliased kernel the deferred form wins)
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One decode step for a batch; returns (logits [B, V], updated cache).

    Layers are python-unrolled on a flat [L*pages] combined cache.  Each
    layer writes the new token's (k, v) row with the aliased Pallas append
    kernel and the attention kernel then reads the updated cache — the
    cache value flows `append -> attention -> next append` as a linear
    ownership chain, so XLA keeps every update in place (an XLA scatter
    with any kernel reader, before OR after, forces a full multi-GB cache
    copy: measured 13 ms/step on a 2 GB cache).
    """
    from ..ops.attention.pallas_decode import _combined_call, paged_append_rows

    x = params["embed"][token_ids].astype(cfg.dtype)  # [B, H]
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    batch = token_ids.shape[0]
    group = hq // hkv
    g8 = max(8, ((group + 7) // 8) * 8)
    rows = hkv * g8
    num_layers, num_pages = kv_caches.shape[0], kv_caches.shape[1]
    page_size = kv_caches.shape[3]
    # [L, pages, 2, ps, Hkv*D] -> [L*pages, 2, ps, Hkv*D]: merging MAJOR
    # dims only — a free bitcast (never merge the minor-most two at step
    # time: that is a full-cache physical relayout).  Layers are
    # python-unrolled (measured: scan xs/ys restacks the cache and
    # scan-carry over layers copies it).
    kv_flat = kv_caches.reshape(
        num_layers * num_pages, 2, page_size, hkv * d
    )
    chunk_pages = max(1, min(512 // page_size, 32))
    max_pages = page_table.shape[1]
    pad_pages = (-max_pages) % chunk_pages
    table0 = (
        jnp.pad(page_table, ((0, 0), (0, pad_pages))) if pad_pages
        else page_table
    )
    chunk_pages = min(chunk_pages, table0.shape[1])
    sinks_arr = jnp.full((rows, 128), -jnp.inf, jnp.float32)
    sm_scale = 1.0 / math.sqrt(d)
    positions = positions.astype(jnp.int32)
    b_idx = jnp.arange(batch)
    off = positions % page_size

    # quantized KV cache: int8 is the TPU-native choice — the int8->bf16
    # upcast is a single native VPU op and vanishes under the DMA (measured
    # 0.219 ms vs 0.408 bf16 vs 1.849 fp8 on the b64/kv1k sweep; fp8 has
    # no hardware convert on v5e and runs conversion-bound)
    quant = kv_caches.dtype in (jnp.int8, jnp.float8_e4m3fn,
                                jnp.float8_e5m2)
    kq_scale = float(kv_scale) if quant else 1.0

    def to_cache(x):
        if not quant:
            return x
        xs = x.astype(jnp.float32) / kq_scale
        if kv_caches.dtype == jnp.int8:
            return jnp.clip(jnp.round(xs), -127, 127).astype(jnp.int8)
        return xs.astype(kv_caches.dtype)

    entry0 = page_table[b_idx, positions // page_size]  # [B]
    rope_tabs = _rope_tables(positions, d, cfg.rope_theta)
    inject = append_mode == "inject"
    knew_all, vnew_all = [], []
    gimpl = cfg.decode_gemm_impl
    lkeys = _layer_keys(cfg, params)
    for l in range(cfg.num_layers):
        lp = {k: _index_layer(params[k], l) for k in lkeys}
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        q, k, v = _qkv(x, lp, cfg, gimpl)
        q = _rope(q, positions, cfg.rope_theta, tables=rope_tabs)
        k = _rope(k, positions, cfg.rope_theta, tables=rope_tabs)
        k2, v2 = k.reshape(batch, hkv * d), v.reshape(batch, hkv * d)

        if inject:
            # the cache stays READ-ONLY inside the step: the kernel folds
            # the just-computed (k, v) in as one extra online-softmax
            # column, and all cache writes defer to ONE scatter at the end
            # (per-layer aliased appends devolve into full-cache copies at
            # 32-layer scale — measured 41 ms/step vs ~16 structural)
            knew_all.append(k2)
            vnew_all.append(v2)
        else:
            kv_flat = paged_append_rows(
                kv_flat, entry0 + l * num_pages, off,
                to_cache(k2), to_cache(v2), interpret=interpret,
            )

        q4 = q.reshape(batch, hkv, group, d)
        if g8 != group:
            q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, g8 - group), (0, 0)))
        q3 = q4.reshape(batch, rows, d)
        attn, _ = _combined_call(
            q3, kv_flat, table0 + l * num_pages, kv_lens, sinks_arr,
            batch=batch, rows=rows, g8=g8, group=group,
            num_q_heads=hq, num_kv_heads=hkv, head_dim=d,
            page_size=page_size, chunk_pages=chunk_pages,
            sm_scale=sm_scale, logits_soft_cap=0.0, window_left=-1,
            k_scale=kq_scale, v_scale=kq_scale, use_sinks=False,
            inject_kv=(k2, v2) if inject else None,
            interpret=interpret,
        )
        x = h_in + _mm(attn.reshape(batch, hq * d), lp["wo"], gimpl)
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        x = h_in + _mlp(cfg, lp, x, gimpl).astype(x.dtype)

    if inject:
        # ONE aliased Pallas append launch for all L*B rows (l, b) ->
        # flat page row entry0[b] + l*num_pages, slot off[b] — the
        # VERDICT r4 ask-#4 "batch page-appends across layers". The r4
        # form was an XLA `.at[].set` scatter here, which broke the
        # cache's linear ownership chain (full-cache copy) and failed to
        # compile at 32L; the aliased kernel keeps the in-place contract
        # and each (l, b) row owns a distinct page.
        kq = to_cache(jnp.stack(knew_all))  # [L, B, Hkv*D]
        vq = to_cache(jnp.stack(vnew_all))
        rows_idx = (entry0[None, :]
                    + (jnp.arange(num_layers) * num_pages)[:, None]
                    ).reshape(-1)
        off_idx = jnp.broadcast_to(off[None, :], (num_layers, batch)
                                   ).reshape(-1)
        kv_flat = paged_append_rows(
            kv_flat, rows_idx, off_idx, kq.reshape(-1, hkv * d),
            vq.reshape(-1, hkv * d), interpret=interpret)

    x = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
    logits = _mm(x, params["lm_head"], gimpl).astype(jnp.float32)
    return logits, kv_flat.reshape(kv_caches.shape)


def prefill(
    params: dict,
    cfg: LlamaConfig,
    token_ids: jax.Array,  # [total_q] ragged tokens
    qo_indptr,  # host [B+1]
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Ragged causal prefill; returns hidden states [total_q, H].

    Uses the flat-item Pallas prefill kernel via a host-built plan
    (self-attention: kv == q tokens). KV-cache write-back is left to the
    serving layer (append_paged_kv_cache) — this computes the activations.
    """
    import numpy as np

    qo_indptr = np.asarray(qo_indptr, np.int64)
    kv_lens = qo_indptr[1:] - qo_indptr[:-1]
    plan = build_prefill_plan(
        qo_indptr, kv_lens, cfg.num_qo_heads, cfg.num_kv_heads,
        causal=True, kv_row_starts=qo_indptr[:-1].astype(np.int64),
    )
    total_q = token_ids.shape[0]
    pos = jnp.concatenate(
        [jnp.arange(int(e - s)) for s, e in zip(qo_indptr[:-1], qo_indptr[1:])]
    ) if len(qo_indptr) > 1 else jnp.arange(total_q)

    x = params["embed"][token_ids].astype(cfg.dtype)
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    lkeys = _layer_keys(cfg, params)
    pimpl = cfg.prefill_gemm_impl

    for l in range(cfg.num_layers):
        lp = {k: _index_layer(params[k], l) for k in lkeys}
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        q, k, v = _qkv(x, lp, cfg, pimpl)
        q = _rope(q, pos, cfg.rope_theta)
        k = _rope(k, pos, cfg.rope_theta)
        attn, _ = run_prefill(q, k, v, plan, causal=True, interpret=interpret)
        x = h_in + _mm(attn.reshape(total_q, hq * d), lp["wo"], pimpl)
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        x = h_in + _mlp(cfg, lp, x, pimpl).astype(x.dtype)
    return rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)


def prefill_with_cache(
    params: dict,
    cfg: LlamaConfig,
    kv_caches: jax.Array,  # [L, pages, 2, ps, Hkv*D] combined cache
    token_ids: jax.Array,  # [total_q] ragged tokens
    qo_indptr,  # host [B+1]
    page_table: jax.Array,  # [B, P] pages owned by each request
    *,
    kv_scale: float = 1.0 / 32.0,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Ragged causal prefill that ALSO writes the prompt K/V into the
    paged cache; returns (hidden [total_q, H], caches).

    The serving admission path (reference BatchPrefillWithPagedKVCache +
    append_paged_kv_cache): attention rides the flat-item prefill kernel,
    and each layer's roped K/V rows scatter into the owning pages (a
    one-time prefill cost, not the decode hot path).
    """
    import numpy as np

    qo_indptr = np.asarray(qo_indptr, np.int64)
    batch = len(qo_indptr) - 1
    kv_lens = qo_indptr[1:] - qo_indptr[:-1]
    plan = build_prefill_plan(
        qo_indptr, kv_lens, cfg.num_qo_heads, cfg.num_kv_heads,
        causal=True, kv_row_starts=qo_indptr[:-1].astype(np.int64),
    )
    total_q = token_ids.shape[0]
    num_layers, num_pages = kv_caches.shape[0], kv_caches.shape[1]
    page_size = kv_caches.shape[3]
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    pos = jnp.concatenate(
        [jnp.arange(int(n)) for n in kv_lens]
    ) if batch else jnp.arange(total_q)
    b_of = np.repeat(np.arange(batch), kv_lens)
    pt_np = np.asarray(page_table)
    page_of = jnp.asarray(
        pt_np[b_of, np.asarray(pos) // page_size], jnp.int32)
    slot_of = pos % page_size

    quant = kv_caches.dtype in (jnp.int8, jnp.float8_e4m3fn,
                                jnp.float8_e5m2)

    def to_cache(a):
        if not quant:
            return a.astype(kv_caches.dtype)
        s = a.astype(jnp.float32) / float(kv_scale)
        if kv_caches.dtype == jnp.int8:
            return jnp.clip(jnp.round(s), -127, 127).astype(jnp.int8)
        return s.astype(kv_caches.dtype)

    x = params["embed"][token_ids].astype(cfg.dtype)
    caches = kv_caches
    lkeys = _layer_keys(cfg, params)
    pimpl = cfg.prefill_gemm_impl
    for l in range(cfg.num_layers):
        lp = {k: _index_layer(params[k], l) for k in lkeys}
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        q, k, v = _qkv(x, lp, cfg, pimpl)
        q = _rope(q, pos, cfg.rope_theta)
        k = _rope(k, pos, cfg.rope_theta)
        rows2 = jnp.stack(
            [to_cache(k.reshape(total_q, hkv * d)),
             to_cache(v.reshape(total_q, hkv * d))], axis=1)
        caches = caches.at[l, page_of, :, slot_of, :].set(rows2)
        attn, _ = run_prefill(q, k, v, plan, causal=True,
                              interpret=interpret)
        x = h_in + _mm(attn.reshape(total_q, hq * d), lp["wo"], pimpl)
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        x = h_in + _mlp(cfg, lp, x, pimpl).astype(x.dtype)
    return rmsnorm(x, params["final_norm"], eps=cfg.rms_eps), caches


def prefill_append_with_cache(
    params: dict,
    cfg: LlamaConfig,
    kv_caches: jax.Array,  # [L, pages, 2, ps, Hkv*D] combined cache
    token_ids: jax.Array,  # [total_q] ragged NEW (suffix) tokens
    qo_indptr,  # host [B+1] over the new tokens
    page_table: jax.Array,  # [B, P] pages owned by each request
    prefix_lens,  # host [B]: tokens ALREADY in the cache per request
    *,
    kv_scale: float = 1.0 / 32.0,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Chunked/prefix-aware prefill: the new tokens attend the request's
    EXISTING cache pages (a shared or previously-chunked prefix) plus
    themselves, and their K/V rows are written into the owned pages.

    The reference analog is chunked prefill over BatchPrefillWithPagedKV
    (qo_len < kv_len append semantics, scheduler.cuh causal diag shift) —
    the serving engine's prefix-cache admission path. Each layer scatters
    the suffix K/V first, then runs the PAGED prefill plan over the pool,
    so prefix and suffix stream through the same kernel reads."""
    import numpy as np

    qo_indptr = np.asarray(qo_indptr, np.int64)
    prefix_lens = np.asarray(prefix_lens, np.int64)
    batch = len(qo_indptr) - 1
    q_lens = qo_indptr[1:] - qo_indptr[:-1]
    kv_lens = prefix_lens + q_lens  # cache rows visible per request
    num_layers, num_pages = kv_caches.shape[0], kv_caches.shape[1]
    page_size = kv_caches.shape[3]
    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    total_q = int(qo_indptr[-1])

    pt_np = np.asarray(page_table)
    page_lists = [
        pt_np[b, : max(1, -(-int(kv_lens[b]) // page_size))]
        for b in range(batch)
    ]
    plan = build_prefill_plan(
        qo_indptr, kv_lens, cfg.num_qo_heads, cfg.num_kv_heads,
        causal=True, page_table=page_lists, page_size=page_size,
    )
    # absolute position of each new token (rope + scatter slots)
    pos_np = np.concatenate(
        [prefix_lens[b] + np.arange(int(q_lens[b])) for b in range(batch)]
    ) if batch else np.arange(total_q)
    pos = jnp.asarray(pos_np, jnp.int32)
    b_of = np.repeat(np.arange(batch), q_lens)
    page_of = jnp.asarray(pt_np[b_of, pos_np // page_size], jnp.int32)
    slot_of = jnp.asarray(pos_np % page_size, jnp.int32)

    quant = kv_caches.dtype in (jnp.int8, jnp.float8_e4m3fn,
                                jnp.float8_e5m2)
    kq_scale = float(kv_scale) if quant else 1.0

    def to_cache(a):
        if not quant:
            return a.astype(kv_caches.dtype)
        s = a.astype(jnp.float32) / kq_scale
        if kv_caches.dtype == jnp.int8:
            return jnp.clip(jnp.round(s), -127, 127).astype(jnp.int8)
        return s.astype(kv_caches.dtype)

    x = params["embed"][token_ids].astype(cfg.dtype)
    caches = kv_caches
    lkeys = _layer_keys(cfg, params)
    for l in range(cfg.num_layers):
        lp = {k: _index_layer(params[k], l) for k in lkeys}
        h_in = x
        x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        q, k, v = _qkv(x, lp, cfg)
        q = _rope(q, pos, cfg.rope_theta)
        k = _rope(k, pos, cfg.rope_theta)
        rows2 = jnp.stack(
            [to_cache(k.reshape(total_q, hkv * d)),
             to_cache(v.reshape(total_q, hkv * d))], axis=1)
        caches = caches.at[l, page_of, :, slot_of, :].set(rows2)
        # paged attention over prefix + suffix from the pool
        # (cache layout is [pages, 2, ps, Hkv*D]: split k/v FIRST, then
        # flatten pages x ps into pool rows)
        pool_k = caches[l, :, 0].reshape(num_pages * page_size, hkv, d)
        pool_v = caches[l, :, 1].reshape(num_pages * page_size, hkv, d)
        attn, _ = run_prefill(
            q, pool_k, pool_v, plan, causal=True,
            k_scale=kq_scale, v_scale=kq_scale, interpret=interpret)
        x = h_in + _mm(attn.reshape(total_q, hq * d), lp["wo"])
        h_in = x
        x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        x = h_in + _mlp(cfg, lp, x).astype(x.dtype)
    return rmsnorm(x, params["final_norm"], eps=cfg.rms_eps), caches


# ---------------------------------------------------------------------------
# Sharded decode: shard_map over (dp, tp) — megatron TP + data parallel
# ---------------------------------------------------------------------------

def param_specs(cfg: LlamaConfig, *, tp: str = "tp") -> dict:
    """PartitionSpec per param: column-split qkv/gate/up, row-split o/w2."""
    sp = {
        "embed": P(None, None),
        "wq": P(None, None, tp),
        "wk": P(None, None, tp),
        "wv": P(None, None, tp),
        "wo": P(None, tp, None),
        "attn_norm": P(None, None),
        "mlp_norm": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, tp),
    }
    if cfg.num_experts:
        sp.update(
            router=P(None, None, None),
            w13=P(None, None, None, None, tp),
            w2=P(None, None, tp, None),
        )
    else:
        sp.update(
            w_gate=P(None, None, tp),
            w_up=P(None, None, tp),
            w2=P(None, tp, None),
        )
    return sp


def make_sharded_decode_fn(
    cfg: LlamaConfig, mesh: Mesh, *, dp: str = "dp", tp: str = "tp",
    interpret: bool | None = None,
):
    """Build a jitted shard_map decode step over mesh axes (dp, tp).

    Batch shards over dp; heads/intermediate shard over tp with one psum
    after the attention out-proj and one after the MLP down-proj (the
    allreduce_fusion pattern, parallel/collectives.py). The KV cache
    shards over (dp on pages? no — pages are per-request) tp on kv heads.
    Returns fn(params, caches, tokens, positions, page_table, kv_lens).
    """
    tp_size = mesh.shape[tp]
    cfg_local = replace(
        cfg,
        num_qo_heads=cfg.num_qo_heads // tp_size,
        num_kv_heads=cfg.num_kv_heads // tp_size,
        intermediate_size=cfg.intermediate_size // tp_size,
        vocab_size=cfg.vocab_size // tp_size,
    )

    def local_step(params, kv_caches, token_ids, positions, page_table, kv_lens):
        x = params["embed"][token_ids].astype(cfg.dtype)
        batch = token_ids.shape[0]
        d = cfg.head_dim
        hq, hkv = cfg_local.num_qo_heads, cfg_local.num_kv_heads
        layer_params = {k: params[k] for k in _layer_keys(cfg)}

        def layer(x, xs):
            lp, kv_c = xs  # kv_c: [pages, 2, ps, hkv_local*d] (merged)
            h_in = x
            x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
            q = (x @ lp["wq"]).reshape(batch, hq, d)
            k = (x @ lp["wk"]).reshape(batch, hkv, d)
            v = (x @ lp["wv"]).reshape(batch, hkv, d)
            q = _rope(q, positions, cfg.rope_theta)
            k = _rope(k, positions, cfg.rope_theta)
            kv_c4 = kv_c.reshape(kv_c.shape[0], 2, kv_c.shape[2], hkv, d)
            k_c, v_c = _append_decode_kv(
                kv_c4[:, 0], kv_c4[:, 1], k, v, page_table, positions
            )
            attn, _ = paged_decode_attention(
                q, k_c, v_c, page_table, kv_lens, interpret=interpret
            )
            o = attn.reshape(batch, hq * d) @ lp["wo"]
            x = h_in + jax.lax.psum(o, tp)
            h_in = x
            x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
            y = _mlp(cfg_local, lp, x).astype(x.dtype)
            x = h_in + jax.lax.psum(y, tp)
            return x, jnp.stack([k_c, v_c], axis=1).reshape(kv_c.shape)

        x, kv_all = jax.lax.scan(layer, x, (layer_params, kv_caches))
        x = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
        logits_loc = (x @ params["lm_head"]).astype(jnp.float32)
        logits = jax.lax.all_gather(logits_loc, tp, axis=1, tiled=True)
        return logits, kv_all

    pspecs = param_specs(cfg, tp=tp)
    # combined cache [L, pages, 2, ps, Hkv*D]: page pool shards over dp
    # (group-local page ids), kv heads over tp (contiguous d-blocks of the
    # merged Hkv*D axis == whole heads while tp <= Hkv)
    cache_spec = P(None, dp, None, None, tp)
    in_specs = (
        pspecs,
        cache_spec,
        P(dp),  # tokens
        P(dp),  # positions
        P(dp, None),  # page_table
        P(dp),  # kv_lens
    )
    out_specs = (P(dp, None), cache_spec)
    fn = shard_map(
        local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn), in_specs, out_specs


def shard_params(params: dict, cfg: LlamaConfig, mesh: Mesh, *, tp: str = "tp"):
    """Device_put params with the TP layout of :func:`param_specs`."""
    specs = param_specs(cfg, tp=tp)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in params.items()
    }


# ---------------------------------------------------------------------------
# Pipeline parallelism: layer-stacked weights sharded over a "pp" axis,
# activations rotated stage→stage with ppermute (gpipe, SPMD form)
# ---------------------------------------------------------------------------


def make_pp_decode_fn(
    cfg: LlamaConfig, mesh: Mesh, *, pp: str = "pp", tp: str = "tp",
    interpret: bool | None = None,
):
    """Build a jitted shard_map decode step over mesh axes (pp, tp).

    The layer dimension shards over pp (cfg.num_layers % pp_size == 0);
    within a stage, attention/MLP shard over tp exactly like
    :func:`make_sharded_decode_fn`. One microbatch flows through the
    pp_size scan steps; every rank executes its local stage each step and
    the activation rotates to the next stage with `lax.ppermute` — rank
    r's compute is meaningful at step r, and cache writes are masked to
    that step (the SPMD formulation of gpipe; the reference has no PP
    execution engine, only the group algebra in comm/mapping.py:442 —
    this provides the actual TPU pipeline).

    Returns (fn, in_specs, out_specs); logits come out replicated.
    """
    pp_size, tp_size = mesh.shape[pp], mesh.shape[tp]
    if cfg.num_layers % pp_size:
        raise ValueError("num_layers must divide pp_size")
    cfg_local = replace(
        cfg,
        num_qo_heads=cfg.num_qo_heads // tp_size,
        num_kv_heads=cfg.num_kv_heads // tp_size,
        intermediate_size=cfg.intermediate_size // tp_size,
    )

    def local_step(params, kv_caches, token_ids, positions, page_table, kv_lens):
        batch = token_ids.shape[0]
        d = cfg.head_dim
        hq, hkv = cfg_local.num_qo_heads, cfg_local.num_kv_heads
        my_stage = jax.lax.axis_index(pp)
        perm = [(i, (i + 1) % pp_size) for i in range(pp_size)]
        layer_params = {k: params[k] for k in _layer_keys(cfg)}

        def run_stage(x, kv_all):
            def layer(x, xs):
                lp, kv_c = xs  # [pages, 2, ps, hkv_local*d] (merged)
                h_in = x
                x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
                q = (x @ lp["wq"]).reshape(batch, hq, d)
                k = (x @ lp["wk"]).reshape(batch, hkv, d)
                v = (x @ lp["wv"]).reshape(batch, hkv, d)
                q = _rope(q, positions, cfg.rope_theta)
                k = _rope(k, positions, cfg.rope_theta)
                kv_c4 = kv_c.reshape(kv_c.shape[0], 2, kv_c.shape[2], hkv, d)
                k_c, v_c = _append_decode_kv(
                    kv_c4[:, 0], kv_c4[:, 1], k, v, page_table, positions
                )
                attn, _ = paged_decode_attention(
                    q, k_c, v_c, page_table, kv_lens, interpret=interpret
                )
                o = attn.reshape(batch, hq * d) @ lp["wo"]
                x = h_in + jax.lax.psum(o, tp)
                h_in = x
                x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
                y = _mlp(cfg_local, lp, x).astype(x.dtype)
                x = h_in + jax.lax.psum(y, tp)
                return x, jnp.stack([k_c, v_c], axis=1).reshape(kv_c.shape)

            return jax.lax.scan(layer, x, (layer_params, kv_all))

        x0 = params["embed"][token_ids].astype(cfg.dtype)
        kv_all = kv_caches

        def pp_step(carry, step_idx):
            x, kv_all = carry
            y, kv_new = run_stage(x, kv_all)
            active = step_idx == my_stage  # this rank's turn in the pipe
            kv_all = jnp.where(active, kv_new, kv_all)
            y = jax.lax.ppermute(y, pp, perm)
            return (y, kv_all), None

        (x, kv_all), _ = jax.lax.scan(
            pp_step, (x0, kv_all), jnp.arange(pp_size), length=pp_size
        )
        # after pp_size rotations the fully-processed activation is back on
        # stage 0 — broadcast it to all ranks
        x = jax.lax.psum(
            jnp.where(my_stage == 0, x, jnp.zeros_like(x)), pp
        )
        x = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
        logits_loc = (x @ params["lm_head"]).astype(jnp.float32)
        logits = jax.lax.all_gather(logits_loc, tp, axis=1, tiled=True)
        return logits, kv_all

    # per-layer params shard their leading (layer) dim over pp
    pspecs = {}
    for k, base in param_specs(cfg, tp=tp).items():
        if k in ("embed", "final_norm", "lm_head"):
            pspecs[k] = base
        else:
            pspecs[k] = P(pp, *tuple(base)[1:])
    cache_spec = P(pp, None, None, None, tp)
    in_specs = (pspecs, cache_spec, P(), P(), P(None, None), P())
    out_specs = (P(None, None), cache_spec)
    fn = shard_map(local_step, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return jax.jit(fn), in_specs, out_specs
