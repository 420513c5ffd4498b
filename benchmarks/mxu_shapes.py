"""MXU shape cost model probe: time chained dots of various (M, K, N)
inside one pallas kernel. Each iteration's lhs depends on the previous
result (defeats loop hoisting)."""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from flashinfer_tpu.testing.utils import bench_loop  # noqa: E402

ITERS = 256


def time_shape(m, k, n, nt=False, out_dtype=jnp.float32):
    def kernel(a_ref, b_ref, o_ref, acc):
        a = a_ref[...]
        acc[...] = jnp.zeros((m, 128), jnp.float32)

        def body(i, carry):
            # rhs depends on the loop index -> the dot cannot be hoisted
            b = b_ref[jax.lax.rem(i, 2)]
            if nt:  # contract b's dim 1 (the NT / q@k.T form)
                s = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=out_dtype)
            else:
                s = jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=out_dtype)
            acc[...] += s[:, :128].astype(jnp.float32)
            return carry

        jax.lax.fori_loop(0, ITERS, body, 0)
        o_ref[...] = acc[...]

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b_shape = (2, n, k) if nt else (2, k, n)
    b = jnp.asarray(rng.standard_normal(b_shape), jnp.bfloat16)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(a, b):
        r = fn(a, b)
        return a + r[:, :1].astype(a.dtype)  # dependent chain for bench_loop

    dt = bench_loop(step, a, b, iters=8)
    us = dt / ITERS * 1e6
    tf = 2 * m * k * n / (dt / ITERS) / 1e12
    return us, tf


def main():
    shapes = [
        ("qk-nt  512x128x512 ", 512, 128, 512, True, jnp.float32),
        ("qk-nn  512x128x512 ", 512, 128, 512, False, jnp.float32),
        ("pv-nn  512x512x128 ", 512, 512, 128, False, jnp.float32),
        ("sq-nn  512x512x512 ", 512, 512, 512, False, jnp.float32),
        ("deep   512x1024x512", 512, 1024, 512, False, jnp.float32),
    ]
    res = {s[0]: [] for s in shapes}
    for rep in range(3):
        for name, m, k, n, nt, od in shapes:
            res[name].append(time_shape(m, k, n, nt, od))
    for name, m, k, n, nt, od in shapes:
        best = min(res[name], key=lambda x: x[0])
        print(f"{name}: {best[0]:7.3f} us  {best[1]:6.1f} TF/s   (all us: "
              + ", ".join(f"{x[0]:.3f}" for x in res[name]) + ")")


if __name__ == "__main__":
    main()
