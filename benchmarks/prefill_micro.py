"""Microbench: prefill kernel variants on the 4k llama-8B geometry.

Separates pure-kernel time from the pack/unpack XLA passes so kernel work
can be attributed (run with the real TPU backend).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from flashinfer_tpu.ops.attention.pallas_prefill import (
    build_prefill_plan, prefill_packed_hm, prefill_packed_stream,
    run_prefill,
)
from flashinfer_tpu.testing.utils import bench_loop

QO = 4096
HQ, HKV, D = 32, 8, 128


def flops():
    return 2 * 2 * HQ * D * (QO * (QO + 1) / 2)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((QO, HQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((QO, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((QO, HKV, D)), jnp.bfloat16)
    plan = build_prefill_plan(
        np.asarray([0, QO]), np.asarray([QO]), HQ, HKV, causal=True,
        kv_row_starts=np.asarray([0]),
    )
    g = plan.group
    sm = 1.0 / np.sqrt(D)

    # e2e (pack + kernel + unpack)
    def step_e2e(q_cur, k, v):
        o, _ = run_prefill(q_cur, k, v, plan, causal=True)
        return o.astype(q_cur.dtype)

    # pure v2 kernel on prepacked layouts
    qsrc = jnp.asarray(plan.q_src, jnp.int32)
    qp = q[qsrc].reshape(plan.tq_pad, HKV, g, D).transpose(1, 0, 2, 3
        ).reshape(HKV, plan.tq_pad * g, D)
    kv8 = jnp.asarray(plan.kv8_src, jnp.int32)
    k_hm = jnp.pad(jnp.transpose(k[kv8], (1, 0, 2)),
                   ((0, 0), (0, plan.kv_block), (0, 0)))
    v_hm = jnp.pad(jnp.transpose(v[kv8], (1, 0, 2)),
                   ((0, 0), (0, plan.kv_block), (0, 0)))
    aux = jnp.zeros((HKV, plan.row_block, 128), jnp.float32)
    wargs = (plan.work_q_blk, plan.work_kv_row0_d8, plan.work_kv_len,
             plan.work_qo_len, plan.work_q_pos)

    def step_kernel(qp, k_hm, v_hm):
        o, _ = prefill_packed_hm(
            qp, k_hm, v_hm, aux, wargs, group=g, sm_scale=sm, causal=True,
            row_block=plan.row_block, kv_block=plan.kv_block,
        )
        return o

    # v1 streaming kernel on prepacked layouts (packed KV)
    ksrc = jnp.asarray(plan.kv_src, jnp.int32)
    kp = jnp.transpose(k[ksrc], (1, 0, 2))
    vp = jnp.transpose(v[ksrc], (1, 0, 2))
    maskd = jnp.zeros((plan.row_block // g, plan.kv_block), jnp.float32)
    w1 = (plan.work_q_blk, plan.work_kv_blk, plan.work_kv_len,
          plan.work_qo_len, plan.work_q_pos)

    def step_v1(qp, kp, vp):
        o, _ = prefill_packed_stream(
            qp, kp, vp, aux, maskd, w1, group=g, sm_scale=sm, causal=True,
            row_block=plan.row_block, kv_block=plan.kv_block,
        )
        return o

    # the chip's effective clock drifts between runs: interleave the
    # variants and keep per-variant best so comparisons stay paired
    variants = [
        ("e2e run_prefill", step_e2e, (q, k, v)),
        ("v2 kernel only", step_kernel, (qp, k_hm, v_hm)),
        ("v1 kernel only", step_v1, (qp, kp, vp)),
    ]
    best = {name: float("inf") for name, _, _ in variants}
    for rep in range(4):
        for name, fn, args in variants:
            dt = bench_loop(fn, *args, iters=16, reps=1)
            best[name] = min(best[name], dt)
    for name, _, _ in variants:
        dt = best[name]
        print(f"{name:20s} {dt*1e3:7.3f} ms  "
              f"{flops()/dt/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()


def sweep_tiles():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((QO, HQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((QO, HKV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((QO, HKV, D)), jnp.bfloat16)
    sm = 1.0 / np.sqrt(D)
    variants = []
    for rb, kb in [(512, 512), (1024, 512), (512, 1024), (1024, 1024)]:
        plan = build_prefill_plan(
            np.asarray([0, QO]), np.asarray([QO]), HQ, HKV, causal=True,
            kv_row_starts=np.asarray([0]), row_block=rb, kv_block=kb,
        )
        g = plan.group
        qsrc = jnp.asarray(plan.q_src, jnp.int32)
        qp = q[qsrc].reshape(plan.tq_pad, HKV, g, D).transpose(1, 0, 2, 3
            ).reshape(HKV, plan.tq_pad * g, D)
        kv8 = jnp.asarray(plan.kv8_src, jnp.int32)
        k_hm = jnp.pad(jnp.transpose(k[kv8], (1, 0, 2)),
                       ((0, 0), (0, kb), (0, 0)))
        v_hm = jnp.pad(jnp.transpose(v[kv8], (1, 0, 2)),
                       ((0, 0), (0, kb), (0, 0)))
        aux = jnp.zeros((HKV, rb, 128), jnp.float32)
        wargs = (plan.work_q_blk, plan.work_kv_row0_d8, plan.work_kv_len,
                 plan.work_qo_len, plan.work_q_pos)

        def mk(g=g, rb=rb, kb=kb, aux=aux, wargs=wargs):
            def step(qp, k_hm, v_hm):
                o, _ = prefill_packed_hm(
                    qp, k_hm, v_hm, aux, wargs, group=g, sm_scale=sm,
                    causal=True, row_block=rb, kv_block=kb)
                return o
            return step
        variants.append((f"rb{rb}/kb{kb}", mk(), (qp, k_hm, v_hm)))
    best = {n: float("inf") for n, _, _ in variants}
    for rep in range(6):
        for n, fn, args in variants:
            best[n] = min(best[n], bench_loop(fn, *args, iters=32, reps=1))
        print(f"  round {rep}: " + "  ".join(
            f"{n}={flops()/best[n]/1e12:5.1f}" for n, _, _ in variants),
            flush=True)
