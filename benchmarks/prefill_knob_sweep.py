"""Prefill kernel knob grid: (rb, kb) x pv_split x kt_layout on the
llama-8B 4k causal shape. Picks the best default for the current chip
class (the pool hands out several — calibrate first)."""

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
    sm = 1.0 / np.sqrt(D)
    flops = 2 * 2 * HQ * D * (QO * (QO + 1) / 2)

    results = []
    for rb, kb in [(512, 512), (512, 1024), (1024, 512), (768, 512),
                   (512, 768)]:
        try:
            plan = build_prefill_plan(
                np.asarray([0, QO]), np.asarray([QO]), HQ, HKV, causal=True,
                kv_row_starts=np.asarray([0]), row_block=rb, kv_block=kb)
        except Exception as e:
            print(f"rb{rb} kb{kb}: plan failed {str(e)[:80]}", flush=True)
            continue
        g = plan.group
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

        for split in ([1, 4] if (rb, kb) != (512, 512) else [1, 2, 4, 8]):
            def step(qp4, k_hm, v_hm, split=split, rb=rb, kb=kb):
                o, _ = prefill_packed_hm(
                    qp4, k_hm, v_hm, aux, wargs, group=g, sm_scale=sm,
                    causal=True, row_block=rb, kv_block=kb,
                    pv_split=split)
                return o
            try:
                best = min(bench_loop(step, qp4, k_hm, v_hm, iters=16,
                                      reps=1) for _ in range(4))
                tf = flops / best / 1e12
                results.append((tf, rb, kb, split))
                print(f"rb{rb} kb{kb} split{split}: {best*1e3:7.3f} ms "
                      f"{tf:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"rb{rb} kb{kb} split{split}: {str(e)[:90]}",
                      flush=True)
    results.sort(reverse=True)
    print("BEST:", results[:3], flush=True)


if __name__ == "__main__":
    main()
