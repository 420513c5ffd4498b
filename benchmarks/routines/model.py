"""End-to-end model benchmarks: the BASELINE.md north-star metrics
(tokens/sec/chip at 8B FP8 paged decode, p50 TTFT).

Reference analog: the e2e serving numbers FlashInfer's adopters measure
(testing/utils.py FLOPs/TB calculators + benchmarks/routines)."""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.testing.utils import bench_loop


def bench_model_decode(
    num_layers: int = 32, batch: int = 64, kv_len: int = 1024,
    page_size: int = 32, fp8_weights: bool = True, fp8_cache: bool = True,
    iters: int = 8,
) -> dict:
    """Tokens/sec/chip for llama-8B-geometry paged decode."""
    from flashinfer_tpu.models.llama import (
        LlamaConfig, decode_step, init_kv_cache, init_params,
        quantize_params,
    )

    cfg = LlamaConfig(num_layers=num_layers)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if fp8_weights:
        params = quantize_params(params, cfg)
        params = jax.tree.map(jax.device_put, params)

    pages_per = kv_len // page_size + 1  # room for the tokens being decoded
    num_pages = batch * pages_per
    cache_dtype = jnp.float8_e4m3fn if fp8_cache else cfg.dtype
    kv = init_kv_cache(cfg, num_pages, page_size, dtype=cache_dtype)
    page_table = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(batch, pages_per))
    tokens = jnp.zeros((batch,), jnp.int32)
    positions = jnp.full((batch,), kv_len, jnp.int32)
    kv_lens = jnp.full((batch,), kv_len + 1, jnp.int32)

    def step(carry, params, page_table):
        tokens, kv, positions, kv_lens = carry
        logits, kv = decode_step(
            params, cfg, kv, tokens, positions, page_table, kv_lens)
        # argmax feeds the next token: a true dependent chain; positions
        # stay fixed so shapes/pages are static across iters
        return (jnp.argmax(logits, -1).astype(jnp.int32), kv,
                positions, kv_lens)

    dt = min(
        bench_loop(step, (tokens, kv, positions, kv_lens), params,
                   page_table, iters=iters, reps=2)
        for _ in range(2)
    )
    toks = batch / dt
    return {
        "routine": "model_decode",
        "config": f"{num_layers}L-8B{'-fp8' if fp8_weights else ''}"
                  f"{'-fp8kv' if fp8_cache else ''} b{batch} kv{kv_len}",
        "ms_per_step": round(dt * 1e3, 3),
        "metric": "tokens/s/chip", "value": round(toks, 1),
    }


def bench_model_ttft(
    num_layers: int = 32, prompt_len: int = 2048, fp8_weights: bool = True,
) -> dict:
    """p50 time-to-first-token: full prefill of one prompt + logits."""
    from flashinfer_tpu.models.llama import (
        LlamaConfig, init_params, prefill, quantize_params, _mm,
    )
    from flashinfer_tpu.ops.norm import rmsnorm

    cfg = LlamaConfig(num_layers=num_layers)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if fp8_weights:
        params = quantize_params(params, cfg)
        params = jax.tree.map(jax.device_put, params)
    tokens = jnp.zeros((prompt_len,), jnp.int32)
    qo = np.asarray([0, prompt_len], np.int64)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def ttft_fn(params, tokens):
        x = prefill(params, cfg, tokens, qo)
        return _mm(x[-1:], params["lm_head"])  # first-token logits

    # wall-clock timing with sync (TTFT is a latency metric): median of 5
    out = ttft_fn(params, tokens)
    _ = np.asarray(jax.numpy.ravel(out)[0])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = ttft_fn(params, tokens)
        _ = np.asarray(jax.numpy.ravel(out)[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "routine": "model_ttft",
        "config": f"{num_layers}L-8B prompt{prompt_len}"
                  f"{'-fp8' if fp8_weights else ''}",
        "metric": "p50_ttft_ms", "value": round(dt * 1e3, 1),
    }
