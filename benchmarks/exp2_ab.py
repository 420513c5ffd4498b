"""Hardware A/B: log2-domain softmax (exp2) vs natural exp in the
streaming prefill + MLA kernels. Interleaves variants in one process
(chip-state drift defeats cross-process comparisons — docs/design.md)."""

from __future__ import annotations

import math
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from flashinfer_tpu.testing.utils import bench_loop  # noqa: E402


def prefill_ab(qo_len=4096, hq=32, hkv=8, d=128):
    from flashinfer_tpu.ops.attention.pallas_prefill import (
        build_prefill_plan, run_prefill,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((qo_len, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((qo_len, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((qo_len, hkv, d)), jnp.bfloat16)
    plan = build_prefill_plan(
        np.asarray([0, qo_len]), np.asarray([qo_len]), hq, hkv,
        causal=True, kv_row_starts=np.asarray([0]))
    flops = 2 * 2 * hq * d * (qo_len * (qo_len + 1) / 2)

    def mk(use_exp2):
        def step(q_cur, k, v):
            o, _ = run_prefill(q_cur, k, v, plan, causal=True,
                               use_exp2=use_exp2)
            return o.astype(q_cur.dtype)
        return step

    res = {False: [], True: []}
    for rep in range(4):
        for ue in (False, True):
            dt = bench_loop(mk(ue), q, k, v, iters=16)
            res[ue].append(flops / dt / 1e12)
    for ue in (False, True):
        name = "exp2" if ue else "exp "
        print(f"prefill {name}: best {max(res[ue]):6.1f} TF/s  (all: "
              + ", ".join(f"{x:.1f}" for x in res[ue]) + ")")


def mla_ab(batch=64, kv_len=2048, ps=64, H=128, dc=512, dp=64):
    from flashinfer_tpu.ops.attention.pallas_mla import (
        build_mla_work_plan, mla_stream,
    )

    pages_per = kv_len // ps
    num_pages = batch * pages_per
    rng = np.random.default_rng(0)
    ckv = jnp.asarray(
        rng.standard_normal((num_pages, ps, dc + 128)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((batch, H, dc + 128)), jnp.bfloat16)
    pt = jnp.asarray(np.arange(num_pages, dtype=np.int32).reshape(
        batch, pages_per))
    kv_lens = jnp.full((batch,), kv_len, jnp.int32)
    q_lens = jnp.ones((batch,), jnp.int32)
    wr, wt = build_mla_work_plan(np.ones(batch), 1)
    kv_bytes = num_pages * ps * (dc + 128) * 2
    kw = dict(num_heads=H, tq=1, head_dim_ckv=dc,
              sm_scale=1 / math.sqrt(dc + dp), causal=False)

    def mk(use_exp2):
        def step(q_cur, ckv, pt, kv_lens, q_lens):
            o, _ = mla_stream(q_cur, ckv, None, pt, kv_lens, q_lens, wr, wt,
                              use_exp2=use_exp2, **kw)
            return jnp.pad(o, ((0, 0), (0, 0), (0, 128))).astype(q_cur.dtype)
        return step

    res = {False: [], True: []}
    for rep in range(4):
        for ue in (False, True):
            dt = bench_loop(mk(ue), q, ckv, pt, kv_lens, q_lens, iters=32)
            res[ue].append(kv_bytes / dt / 1e9)
    for ue in (False, True):
        name = "exp2" if ue else "exp "
        print(f"mla     {name}: best {max(res[ue]):6.1f} GB/s  (all: "
              + ", ".join(f"{x:.1f}" for x in res[ue]) + ")")


def mla_sweep(batch=64, kv_len=2048, ps=64, H=128, dc=512, dp=64):
    """Sweep the MLA kernel's DMA chunk size (interleaved best-of)."""
    from flashinfer_tpu.ops.attention.pallas_mla import (
        build_mla_work_plan, mla_stream,
    )

    pages_per = kv_len // ps
    num_pages = batch * pages_per
    rng = np.random.default_rng(0)
    ckv = jnp.asarray(
        rng.standard_normal((num_pages, ps, dc + 128)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((batch, H, dc + 128)), jnp.bfloat16)
    pt = jnp.asarray(np.arange(num_pages, dtype=np.int32).reshape(
        batch, pages_per))
    kv_lens = jnp.full((batch,), kv_len, jnp.int32)
    q_lens = jnp.ones((batch,), jnp.int32)
    wr, wt = build_mla_work_plan(np.ones(batch), 1)
    kv_bytes = num_pages * ps * (dc + 128) * 2
    kw = dict(num_heads=H, tq=1, head_dim_ckv=dc,
              sm_scale=1 / math.sqrt(dc + dp), causal=False)

    def mk(ct):
        def step(q_cur, ckv, pt, kv_lens, q_lens):
            o, _ = mla_stream(q_cur, ckv, None, pt, kv_lens, q_lens, wr, wt,
                              chunk_tokens=ct, **kw)
            return jnp.pad(o, ((0, 0), (0, 0), (0, 128))).astype(q_cur.dtype)
        return step

    cts = [512, 1024, 2048]
    res = {ct: [] for ct in cts}
    for rep in range(4):
        for ct in cts:
            dt = bench_loop(mk(ct), q, ckv, pt, kv_lens, q_lens, iters=32)
            res[ct].append(kv_bytes / dt / 1e9)
    for ct in cts:
        print(f"mla ct={ct:5d}: best {max(res[ct]):6.1f} GB/s  (all: "
              + ", ".join(f"{x:.1f}" for x in res[ct]) + ")")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "prefill"):
        prefill_ab()
    if which in ("both", "mla"):
        mla_ab()
    if which == "mla_sweep":
        mla_sweep()
