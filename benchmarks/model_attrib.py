"""Attribution for the 32L llama decode step: time variants with the
attention kernel / appends / MLP nulled out to locate the gap between the
measured step and the ~16 ms HBM floor. Null variants produce WRONG
logits — timing only."""

from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from flashinfer_tpu.models.llama import (  # noqa: E402
    LlamaConfig, _index_layer, _layer_keys, _mlp, _mm, _rope,
    init_kv_cache, init_params_quantized,
)
from flashinfer_tpu.ops.norm import rmsnorm  # noqa: E402


def make_step(cfg, skip=()):
    from flashinfer_tpu.ops.attention.pallas_decode import (
        _combined_call, paged_append_rows,
    )

    d, hq, hkv = cfg.head_dim, cfg.num_qo_heads, cfg.num_kv_heads
    group = hq // hkv
    g8 = max(8, ((group + 7) // 8) * 8)
    rows = hkv * g8
    kq_scale = 1.0 / 32.0

    def step(params, kv_caches, token_ids, positions, page_table, kv_lens):
        x = params["embed"][token_ids].astype(cfg.dtype)
        batch = token_ids.shape[0]
        num_layers, num_pages = kv_caches.shape[0], kv_caches.shape[1]
        page_size = kv_caches.shape[3]
        kv_flat = kv_caches.reshape(
            num_layers * num_pages, 2, page_size, hkv * d)
        chunk_pages = max(1, min(512 // page_size, 32))
        table0 = page_table
        sm_scale = 1.0 / math.sqrt(d)
        positions32 = positions.astype(jnp.int32)
        b_idx = jnp.arange(batch)
        off = positions32 % page_size
        entry0 = page_table[b_idx, positions32 // page_size]

        def to_cache(v):
            return jnp.clip(jnp.round(v.astype(jnp.float32) / kq_scale),
                            -127, 127).astype(jnp.int8)

        for l in range(cfg.num_layers):
            lp = {k: _index_layer(params[k], l) for k in _layer_keys(cfg)}
            h_in = x
            x = rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
            q = _mm(x, lp["wq"]).reshape(batch, hq, d)
            k = _mm(x, lp["wk"]).reshape(batch, hkv, d)
            v = _mm(x, lp["wv"]).reshape(batch, hkv, d)
            q = _rope(q, positions32, cfg.rope_theta)
            k = _rope(k, positions32, cfg.rope_theta)
            k2, v2 = k.reshape(batch, hkv * d), v.reshape(batch, hkv * d)
            if "append" not in skip:
                kv_flat = paged_append_rows(
                    kv_flat, entry0 + l * num_pages, off,
                    to_cache(k2), to_cache(v2))
            q4 = q.reshape(batch, hkv, group, d)
            if g8 != group:
                q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, g8 - group), (0, 0)))
            q3 = q4.reshape(batch, rows, d)
            if "attn" not in skip:
                attn, _ = _combined_call(
                    q3, kv_flat, table0 + l * num_pages, kv_lens,
                    jnp.full((rows, 128), -jnp.inf, jnp.float32),
                    batch=batch, rows=rows, g8=g8, group=group,
                    num_q_heads=hq, num_kv_heads=hkv, head_dim=d,
                    page_size=page_size, chunk_pages=chunk_pages,
                    sm_scale=sm_scale, logits_soft_cap=0.0,
                    window_left=-1, k_scale=kq_scale, v_scale=kq_scale,
                    use_sinks=False, inject_kv=None, interpret=False)
                attn_flat = attn.reshape(batch, hq * d)
            else:
                attn_flat = (q + v2.reshape(batch, hkv, d)[:, :1] * 1e-6
                             ).reshape(batch, hq * d)
            x = h_in + _mm(attn_flat, lp["wo"])
            h_in = x
            x = rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
            if "mlp" not in skip:
                x = h_in + _mlp(cfg, lp, x).astype(x.dtype)
            else:
                x = h_in + x * 1e-6
        x = rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
        if "lmhead" not in skip:
            logits = _mm(x, params["lm_head"]).astype(jnp.float32)
        else:
            logits = x[:, :1].astype(jnp.float32)
        return logits, kv_flat.reshape(kv_caches.shape)

    return step


def timed_variant(cfg, skip, n, num_pages, page_size, batch, kv_len):
    step = make_step(cfg, skip)

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def run_n(tokens, kv, positions, kv_lens, params, page_table, n):
        def body(_, carry):
            tokens, kv = carry
            logits, kv = step(params, kv, tokens, positions, page_table,
                              kv_lens)
            return jnp.argmax(logits, -1).astype(jnp.int32), kv
        out, kv = jax.lax.fori_loop(0, n, body, (tokens, kv))
        return out, kv

    params = init_params_quantized(jax.random.PRNGKey(0), cfg)
    page_table = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(batch, -1))
    tokens = jnp.zeros((batch,), jnp.int32)
    positions = jnp.full((batch,), kv_len, jnp.int32)
    kv_lens = jnp.full((batch,), kv_len + 1, jnp.int32)

    def timed(m):
        best = float("inf")
        for _ in range(2):
            kv = init_kv_cache(cfg, num_pages, page_size, dtype=jnp.int8)
            out, kv = run_n(tokens, kv, positions, kv_lens, params,
                            page_table, m)
            _ = np.asarray(out[0])
            del kv
            kv = init_kv_cache(cfg, num_pages, page_size, dtype=jnp.int8)
            t0 = time.perf_counter()
            out, kv = run_n(tokens, kv, positions, kv_lens, params,
                            page_table, m)
            _ = np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
            del kv
        return best

    delta = timed(n) - timed(1)
    return max(delta / (n - 1), 0.0)


def main():
    from benchmarks.routines.gemm import bench_mm_bf16

    print("calib:", bench_mm_bf16(), flush=True)
    cfg = LlamaConfig(num_layers=32)
    batch, kv_len, page_size = 64, 1024, 32
    pages_per = kv_len // page_size + 1
    num_pages = batch * pages_per
    variants = [
        ("full", ()),
        ("no-attn", ("attn",)),
        ("no-append", ("append",)),
        ("no-attn-append", ("attn", "append")),
        ("gemms-only", ("attn", "append", "lmhead")),
        ("no-mlp", ("mlp",)),
    ]
    for name, skip in variants:
        dt = timed_variant(cfg, skip, 16, num_pages, page_size, batch,
                           kv_len)
        print(f"{name:16s} {dt*1e3:7.3f} ms/step", flush=True)


def weight_dtype_ab():
    """Full-model A/B: fp8 vs int8 weights (weights >> VMEM, so both
    genuinely stream from HBM every step). Sequential with frees (both
    models resident would exceed HBM); two rounds to expose drift."""
    from benchmarks.routines.gemm import bench_mm_bf16

    print("calib:", bench_mm_bf16(), flush=True)
    cfg = LlamaConfig(num_layers=32)
    batch, kv_len, page_size = 64, 1024, 32
    num_pages = batch * (kv_len // page_size + 1)
    for rep in range(2):
        for wd in (jnp.float8_e4m3fn, jnp.int8):
            import gc

            step = make_step(cfg, ())

            @functools.partial(jax.jit, static_argnames=("n",),
                               donate_argnums=(1,))
            def run_n(tokens, kv, positions, kv_lens, params, page_table,
                      n):
                def body(_, carry):
                    tokens, kv = carry
                    logits, kv = step(params, kv, tokens, positions,
                                      page_table, kv_lens)
                    return jnp.argmax(logits, -1).astype(jnp.int32), kv
                return jax.lax.fori_loop(0, n, body, (tokens, kv))

            params = init_params_quantized(jax.random.PRNGKey(0), cfg,
                                           weight_dtype=wd)
            page_table = jnp.asarray(
                np.arange(num_pages, dtype=np.int32).reshape(batch, -1))
            tokens = jnp.zeros((batch,), jnp.int32)
            positions = jnp.full((batch,), kv_len, jnp.int32)
            kv_lens = jnp.full((batch,), kv_len + 1, jnp.int32)

            def timed(m):
                best = float("inf")
                for _ in range(2):
                    kv = init_kv_cache(cfg, num_pages, page_size,
                                       dtype=jnp.int8)
                    out, kv = run_n(tokens, kv, positions, kv_lens,
                                    params, page_table, m)
                    _ = np.asarray(out[0])
                    del kv
                    kv = init_kv_cache(cfg, num_pages, page_size,
                                       dtype=jnp.int8)
                    t0 = time.perf_counter()
                    out, kv = run_n(tokens, kv, positions, kv_lens,
                                    params, page_table, m)
                    _ = np.asarray(out[0])
                    best = min(best, time.perf_counter() - t0)
                    del kv
                return best

            dt = (timed(16) - timed(1)) / 15
            name = "int8" if wd == jnp.int8 else "fp8 "
            print(f"rep{rep} weights={name}: {dt*1e3:7.3f} ms/step "
                  f"({batch/dt:7.0f} tok/s)", flush=True)
            del params
            gc.collect()


if __name__ == "__main__":
    import sys as _s
    (weight_dtype_ab if "weights" in _s.argv[1:] else main)()
