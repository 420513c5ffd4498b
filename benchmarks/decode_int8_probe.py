"""Is int8 paged decode conversion-bound? Compare int8 kv1k against
bf16 kv512 (same HBM bytes) and bf16 kv1k, interleaved, with chunk-size
variants."""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from flashinfer_tpu.testing.utils import bench_loop  # noqa: E402


def mk(kv_len, cache_dt, page_size=32):
    from flashinfer_tpu.ops.attention.pallas_decode import (
        paged_decode_attention_combined,
    )

    batch, hq, hkv, d = 64, 32, 8, 128
    pages_per = kv_len // page_size
    num_pages = batch * pages_per
    rng = np.random.default_rng(0)
    shape = (num_pages, 2, page_size, hkv, d)
    if cache_dt == jnp.int8:
        kv = jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)
    else:
        kv = jnp.asarray(rng.standard_normal(shape), cache_dt)
    q = jnp.asarray(rng.standard_normal((batch, hq, d)), jnp.bfloat16)
    pt = jnp.asarray(np.arange(num_pages, dtype=np.int32).reshape(
        batch, pages_per))
    kl = jnp.full((batch,), kv_len, jnp.int32)
    scale = 1.0 / 32.0 if cache_dt == jnp.int8 else 1.0

    def step(q_cur, kv, pt, kl):
        o, _ = paged_decode_attention_combined(
            q_cur, kv, pt, kl, k_scale=scale, v_scale=scale)
        return o
    nbytes = num_pages * 2 * page_size * hkv * d * jnp.dtype(cache_dt).itemsize
    return step, (q, kv, pt, kl), nbytes


def main():
    from benchmarks.routines.gemm import bench_mm_bf16

    print("calib:", bench_mm_bf16(), flush=True)
    cases = [
        ("int8 kv1024", 1024, jnp.int8),
        ("bf16 kv512 ", 512, jnp.bfloat16),
        ("bf16 kv1024", 1024, jnp.bfloat16),
    ]
    res = {n: [] for n, *_ in cases}
    for rep in range(4):
        for n, kv_len, dt in cases:
            step, args, nbytes = mk(kv_len, dt)
            t = bench_loop(step, *args, iters=32)
            res[n].append((t, nbytes))
    for n, *_ in cases:
        t, nbytes = min(res[n])
        print(f"{n}: {t*1e3:7.3f} ms  {nbytes/t/1e9:6.1f} GB/s  (all ms: "
              + ", ".join(f"{x*1e3:.3f}" for x, _ in res[n]) + ")")


if __name__ == "__main__":
    main()
