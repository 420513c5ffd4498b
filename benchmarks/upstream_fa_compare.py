"""Head-to-head: our streaming prefill kernel vs jax's bundled TPU
flash-attention kernels (same shape, same process, interleaved).

Establishes the practical single-chip ceiling for causal bf16 FA at
llama-8B geometry (4k, 32 q heads / 8 kv heads, d=128) on the drawn chip.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from flashinfer_tpu.testing.utils import bench_loop  # noqa: E402

QO, HQ, HKV, D = 4096, 32, 8, 128
FLOPS = 2 * 2 * HQ * D * (QO * (QO + 1) / 2)


def ours():
    from flashinfer_tpu.ops.attention.pallas_prefill import (
        build_prefill_plan, run_prefill,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((QO, HQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((QO, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((QO, HKV, D)), jnp.bfloat16)
    plan = build_prefill_plan(
        np.asarray([0, QO]), np.asarray([QO]), HQ, HKV, causal=True,
        kv_row_starts=np.asarray([0]))

    def step(q_cur, k, v):
        o, _ = run_prefill(q_cur, k, v, plan, causal=True)
        return o.astype(q_cur.dtype)

    return step, (q, k, v)


def upstream_fa():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    rng = np.random.default_rng(0)
    # flash_attention wants [B, H, S, D]; GQA unsupported -> repeat kv
    q = jnp.asarray(rng.standard_normal((1, HQ, QO, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, HQ, QO, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, HQ, QO, D)), jnp.bfloat16)

    def step(q_cur, k, v):
        o = flash_attention(q_cur, k, v, causal=True,
                            sm_scale=1.0 / float(np.sqrt(D)))
        return o.astype(q_cur.dtype)

    return step, (q, k, v)


def upstream_splash():
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((HQ, QO, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((HKV, QO, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((HKV, QO, D)), jnp.bfloat16)
    mask = sm.MultiHeadMask(
        [sm.CausalMask((QO, QO)) for _ in range(HQ)])
    kernel = sk.make_splash_mqa_single_device(
        mask=mask) if HKV == 1 else sk.make_splash_mha_single_device(
        mask=mask)

    def step(q_cur, k, v):
        o = kernel(q_cur * (1.0 / float(np.sqrt(D))), k, v)
        return o.astype(q_cur.dtype)

    return step, (q, k, v)


def main():
    from benchmarks.routines.gemm import bench_mm_bf16

    print("calib:", bench_mm_bf16(), flush=True)
    variants = [("ours(e2e)", *ours()), ("jax flash_attention",
                                         *upstream_fa())]
    try:
        variants.append(("jax splash(mha)", *upstream_splash()))
    except Exception as e:
        print("splash setup failed:", str(e)[:200])
    best = {n: float("inf") for n, _, _ in variants}
    for rep in range(4):
        for n, fn, args in variants:
            try:
                best[n] = min(best[n], bench_loop(fn, *args, iters=16,
                                                  reps=1))
            except Exception as e:
                print(n, "failed:", str(e)[:200])
                best[n] = float("nan")
    for n, _, _ in variants:
        dt = best[n]
        # upstream fa repeats kv to 32 heads: same q-side flop count
        print(f"{n:22s} {dt*1e3:7.3f} ms  {FLOPS/dt/1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
