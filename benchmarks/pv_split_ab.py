"""A/B: pv_split (interleaved exp/PV halves) on the v2 prefill kernel."""

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

    def mk(split):
        def step(qp4, k_hm, v_hm):
            o, _ = prefill_packed_hm(
                qp4, k_hm, v_hm, aux, wargs, group=g, sm_scale=sm,
                causal=True, row_block=plan.row_block,
                kv_block=plan.kv_block, pv_split=split)
            return o
        return step

    splits = [1, 2, 4]
    best = {s: float("inf") for s in splits}
    outs = {}
    for rep in range(4):
        for s in splits:
            best[s] = min(best[s], bench_loop(mk(s), qp4, k_hm, v_hm,
                                              iters=16, reps=1))
    # correctness cross-check
    o1 = mk(1)(qp4, k_hm, v_hm)
    o2 = mk(2)(qp4, k_hm, v_hm)
    print("split2 vs split1 max diff:",
          float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - o2.astype(jnp.float32)))), flush=True)
    for s in splits:
        print(f"pv_split={s}: {best[s]*1e3:7.3f} ms  "
              f"{flops/best[s]/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
