"""A/B: decode-GEMM (M=64) weight streaming by dtype — bf16 vs fp8 vs
int8 (+per-channel scale). v5e has no hardware fp8 convert; int8->bf16 is
one native VPU op. Measures effective weight bandwidth."""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from flashinfer_tpu.testing.utils import bench_loop  # noqa: E402

M, K, N = 64, 4096, 14336


def mk(wdtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wf = rng.standard_normal((K, N)).astype(np.float32)
    scale = jnp.asarray(np.abs(wf).max(0, keepdims=True) / 127.0,
                        jnp.bfloat16)
    if wdtype == "bf16":
        w = jnp.asarray(wf, jnp.bfloat16)

        def step(x, w):
            return ((x @ w)[:, :K]).astype(x.dtype)
        nbytes = K * N * 2
        return step, (x, w), nbytes
    if wdtype == "fp8":
        q = jnp.asarray(wf / np.asarray(scale, np.float32) / 3.5,
                        jnp.float8_e4m3fn)
    else:
        q = jnp.asarray(
            np.clip(np.round(wf / np.asarray(scale, np.float32)), -127,
                    127), jnp.int8)

    def step(x, q, scale):
        y = (x @ q.astype(x.dtype)) * scale.astype(x.dtype)
        return y[:, :K].astype(x.dtype)

    return step, (x, q, scale), K * N


def main():
    from benchmarks.routines.gemm import bench_mm_bf16

    print("calib:", bench_mm_bf16(), flush=True)
    kinds = ["bf16", "fp8", "int8"]
    res = {k: [] for k in kinds}
    for rep in range(4):
        for k in kinds:
            step, args, nbytes = mk(k)
            dt = bench_loop(step, *args, iters=64)
            res[k].append((dt, nbytes))
    for k in kinds:
        dt, nbytes = min(res[k])
        print(f"{k:5s}: {dt*1e6:8.1f} us  weight-stream "
              f"{nbytes/dt/1e9:7.1f} GB/s   (all us: "
              + ", ".join(f"{d*1e6:.1f}" for d, _ in res[k]) + ")")


if __name__ == "__main__":
    main()
