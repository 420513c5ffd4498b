"""Perf attribution for the v2 prefill kernel: interleaved in-process
A/B of full kernel vs skip-softmax vs skip-pv vs skip-qk, plus an
mm_bf16 chip-state calibration. All skip modes produce WRONG outputs —
this is a time-attribution probe only."""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from flashinfer_tpu.ops.attention.pallas_prefill import (  # noqa: E402
    build_prefill_plan, prefill_packed_hm,
)
from flashinfer_tpu.testing.utils import bench_loop  # noqa: E402

QO, HQ, HKV, D = 4096, 32, 8, 128


def main():
    from benchmarks.routines.gemm import bench_mm_bf16

    print("calib:", bench_mm_bf16(), flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((QO, HQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((QO, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((QO, HKV, D)), jnp.bfloat16)
    plan = build_prefill_plan(
        np.asarray([0, QO]), np.asarray([QO]), HQ, HKV, causal=True,
        kv_row_starts=np.asarray([0]))
    g = plan.group
    sm = 1.0 / np.sqrt(D)
    qp4 = jnp.pad(q, ((0, plan.tq_pad - QO), (0, 0), (0, 0))).reshape(
        plan.tq_pad, HKV, g, D)
    kv8 = jnp.asarray(plan.kv8_src, jnp.int32)
    k_hm = jnp.pad(jnp.transpose(k[kv8], (1, 0, 2)),
                   ((0, 0), (0, plan.kv_block), (0, 0)))
    v_hm = jnp.pad(jnp.transpose(v[kv8], (1, 0, 2)),
                   ((0, 0), (0, plan.kv_block), (0, 0)))
    aux = jnp.zeros((HKV, plan.row_block, 128), jnp.float32)
    wargs = (plan.work_q_blk, plan.work_kv_row0_d8, plan.work_kv_len,
             plan.work_qo_len, plan.work_q_pos)
    flops = 2 * 2 * HQ * D * (QO * (QO + 1) / 2)

    def mk(skip):
        def step(qp4, k_hm, v_hm):
            o, _ = prefill_packed_hm(
                qp4, k_hm, v_hm, aux, wargs, group=g, sm_scale=sm,
                causal=True, row_block=plan.row_block,
                kv_block=plan.kv_block, debug_skip=skip)
            return o
        return step

    modes = [None, "softmax", "pv", "qk"]
    best = {m: float("inf") for m in modes}
    for rep in range(4):
        for m in modes:
            best[m] = min(best[m], bench_loop(mk(m), qp4, k_hm, v_hm,
                                              iters=16, reps=1))
    for m in modes:
        dt = best[m]
        print(f"skip={str(m):8s} {dt*1e3:7.3f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s-equiv", flush=True)
    print("calib:", bench_mm_bf16(), flush=True)


if __name__ == "__main__":
    main()
