"""Microprobe: per-chunk VPU softmax cost vs MXU matmul cost on TPU.

Times three pallas kernels over the same [RB, KB] f32 score tile shape the
prefill kernel uses per chunk:
  * mxu:   qk + pv matmuls only (the MXU work of one chunk)
  * vpu:   online-softmax update only (max/exp/sum/scale, no matmul)
  * vpu2:  same but exp2 instead of exp
  * both:  matmuls + update (one full chunk iteration, s-carry style)

Run on the real chip: python benchmarks/exp_vpu_probe.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, ".")
from flashinfer_tpu.testing.utils import bench_loop  # noqa: E402

RB, KB, D = 512, 512, 128
ITERS = 256  # chunk iterations inside the kernel


def _mk(kind: str):
    def kernel(q_ref, k_ref, v_ref, s_ref, o_ref, m_sc, l_sc, acc_sc):
        q = q_ref[...]
        m_sc[...] = jnp.full((RB, 1), -1e30, jnp.float32)
        l_sc[...] = jnp.zeros((RB, 1), jnp.float32)
        acc_sc[...] = jnp.zeros((RB, D), jnp.float32)

        def body(c, s_cur):
            k = k_ref[...]
            v = v_ref[...]
            if kind in ("mxu", "both"):
                s_next = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                s_next = s_cur
            if kind in ("vpu", "vpu2", "both"):
                m_prev = m_sc[...]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s_cur, axis=1, keepdims=True))
                e = jnp.exp2 if kind == "vpu2" else jnp.exp
                alpha = e(m_prev - m_new)
                p = e(s_cur - m_new)
                l_sc[...] = l_sc[...] * alpha + jnp.sum(
                    p, axis=1, keepdims=True)
                if kind == "both":
                    pv = jax.lax.dot_general(
                        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_sc[...] = acc_sc[...] * alpha + pv
                else:
                    acc_sc[...] = acc_sc[...] * alpha
                m_sc[...] = m_new
            elif kind == "mxu":
                pv = jax.lax.dot_general(
                    s_cur.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_sc[...] = acc_sc[...] + pv
            return s_next + 0.0  # keep the carry live

        s0 = s_ref[...] + q[:, :1]  # tie the chunk loop to the carry input
        s_last = jax.lax.fori_loop(0, ITERS, body, s0)
        o_ref[...] = (acc_sc[...] + s_last[:, :D]
                      + q.astype(jnp.float32)).astype(o_ref.dtype)

    return kernel


def run(kind: str) -> float:
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((RB, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((KB, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((KB, D)), jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((RB, KB)), jnp.float32)

    fn = pl.pallas_call(
        _mk(kind),
        out_shape=jax.ShapeDtypeStruct((RB, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RB, 1), jnp.float32),
            pltpu.VMEM((RB, 1), jnp.float32),
            pltpu.VMEM((RB, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(q, k, v, s):
        return fn(q, k, v, s)[:, :D].astype(q.dtype)

    dt = bench_loop(step, q, k, v, s, iters=8)
    per_chunk_us = dt / ITERS * 1e6
    return per_chunk_us


def main():
    # interleave kinds to defeat chip-state drift
    kinds = ["mxu", "vpu", "vpu2", "both"]
    res = {k: [] for k in kinds}
    for rep in range(4):
        for k in kinds:
            res[k].append(run(k))
    for k in kinds:
        best = min(res[k])
        print(f"{k:5s}: {best:7.3f} us/chunk   (all: "
              + ", ".join(f"{x:.3f}" for x in res[k]) + ")")
    mxu_ideal = 2 * 2 * RB * KB * D / 197e12 * 1e6
    print(f"ideal MXU (197 TF/s): {mxu_ideal:.3f} us/chunk")


if __name__ == "__main__":
    main()
