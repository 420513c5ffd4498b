"""Streaming prefill kernel: interpret-mode parity vs the BlockSpec
reference kernel on varied ragged shapes (the TPU production path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.pallas_prefill import (
    build_prefill_plan,
    prefill_packed,
    prefill_packed_hm,
    prefill_packed_stream,
    run_prefill,
)


def _pack_and_run_hm(q, k, v, plan, causal, **kw):
    """Drive the v2 head-major streaming kernel in interpret mode."""
    g = plan.group
    hkv = plan.num_kv_heads
    d = q.shape[-1]
    qsrc = jnp.asarray(plan.q_src, jnp.int32)
    qvalid = jnp.asarray(plan.q_valid)
    qp = (q[qsrc] * qvalid[:, None, None].astype(q.dtype)).reshape(
        plan.tq_pad, hkv, g, d).transpose(1, 0, 2, 3).reshape(
        hkv, plan.tq_pad * g, d)
    kv8_src = jnp.asarray(plan.kv8_src, jnp.int32)
    kv8_valid = jnp.asarray(plan.kv8_valid)
    k_al = k[kv8_src] * kv8_valid[:, None, None].astype(k.dtype)
    v_al = v[kv8_src] * kv8_valid[:, None, None].astype(v.dtype)
    k_hm = jnp.pad(jnp.transpose(k_al, (1, 0, 2)),
                   ((0, 0), (0, plan.kv_block), (0, 0)))
    v_hm = jnp.pad(jnp.transpose(v_al, (1, 0, 2)),
                   ((0, 0), (0, plan.kv_block), (0, 0)))
    aux = kw.pop("aux", jnp.zeros((hkv, plan.row_block, 128), jnp.float32))
    wargs = (plan.work_q_blk, plan.work_kv_row0_d8, plan.work_kv_len,
             plan.work_qo_len, plan.work_q_pos)
    op, _ = prefill_packed_hm(
        qp, k_hm, v_hm, aux, wargs,
        group=g, sm_scale=1.0 / np.sqrt(d), causal=causal,
        row_block=plan.row_block, kv_block=plan.kv_block,
        interpret=True, **kw)
    out = op.reshape(hkv, plan.tq_pad, g, d).transpose(1, 0, 2, 3).reshape(
        plan.tq_pad, q.shape[1], d)
    return out[jnp.asarray(plan.out_src, jnp.int32)]


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("qo_lens,kv_lens", [
    ([5], [5]),
    ([5, 70, 1], [5, 90, 33]),
    ([33, 33], [64, 150]),
    ([256], [256]),  # tile-aligned: exercises the mask-free clean prefix
])
def test_hm_matches_blockspec(causal, qo_lens, kv_lens):
    hq, hkv, d = 4, 2, 128
    rng = np.random.default_rng(0)
    qo = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int64)
    ks = np.concatenate([[0], np.cumsum(kv_lens)]).astype(np.int64)
    plan = build_prefill_plan(qo, np.asarray(kv_lens), hq, hkv,
                              causal=causal, kv_row_starts=ks[:-1])
    q = jnp.asarray(rng.standard_normal((int(qo[-1]), hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((int(ks[-1]), hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((int(ks[-1]), hkv, d)), jnp.float32)
    ref, _ = run_prefill(q, k, v, plan, causal=causal)  # blockspec (interp)
    out = _pack_and_run_hm(q, k, v, plan, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_hm_window_softcap():
    hq, hkv, d = 4, 2, 128
    rng = np.random.default_rng(1)
    qo = np.asarray([0, 40], np.int64)
    plan = build_prefill_plan(qo, np.asarray([160]), hq, hkv, causal=True,
                              kv_row_starts=np.asarray([0]))
    q = jnp.asarray(rng.standard_normal((40, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((160, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((160, hkv, d)), jnp.float32)
    kw = dict(window_left=13, logits_soft_cap=20.0)
    ref, _ = run_prefill(q, k, v, plan, causal=True, **kw)
    out = _pack_and_run_hm(q, k, v, plan, True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def _pack_and_run_stream(q, k, v, plan, causal, **kw):
    g = plan.group
    hkv = plan.num_kv_heads
    d = q.shape[-1]
    qsrc = jnp.asarray(plan.q_src, jnp.int32)
    qvalid = jnp.asarray(plan.q_valid)
    ksrc = jnp.asarray(plan.kv_src, jnp.int32)
    kvalid = jnp.asarray(plan.kv_valid)
    qp = (q[qsrc] * qvalid[:, None, None].astype(q.dtype)).reshape(
        plan.tq_pad, hkv, g, d).transpose(1, 0, 2, 3).reshape(
        hkv, plan.tq_pad * g, d)
    kp = jnp.transpose(k[ksrc] * kvalid[:, None, None].astype(k.dtype),
                       (1, 0, 2))
    vp = jnp.transpose(v[ksrc] * kvalid[:, None, None].astype(v.dtype),
                       (1, 0, 2))
    aux = jnp.zeros((hkv, plan.row_block, 128), jnp.float32)
    maskd = jnp.zeros((8, 128), jnp.float32)
    wargs = (plan.work_q_blk, plan.work_kv_blk, plan.work_kv_len,
             plan.work_qo_len, plan.work_q_pos)
    op, lsep = prefill_packed_stream(
        qp, kp, vp, aux, maskd, wargs,
        group=g, sm_scale=1.0 / np.sqrt(d), causal=causal,
        row_block=plan.row_block, kv_block=plan.kv_block, **kw)
    out = op.reshape(hkv, plan.tq_pad, g, d).transpose(1, 0, 2, 3).reshape(
        plan.tq_pad, q.shape[1], d)
    return out[jnp.asarray(plan.out_src, jnp.int32)]


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("qo_lens,kv_lens", [
    ([5], [5]),
    ([5, 70, 1], [5, 90, 33]),
    ([33, 33], [64, 150]),
])
def test_stream_matches_blockspec(causal, qo_lens, kv_lens):
    hq, hkv, d = 4, 2, 128
    rng = np.random.default_rng(0)
    qo = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int64)
    ks = np.concatenate([[0], np.cumsum(kv_lens)]).astype(np.int64)
    plan = build_prefill_plan(qo, np.asarray(kv_lens), hq, hkv,
                              causal=causal, kv_row_starts=ks[:-1])
    q = jnp.asarray(rng.standard_normal((int(qo[-1]), hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((int(ks[-1]), hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((int(ks[-1]), hkv, d)), jnp.float32)
    ref, _ = run_prefill(q, k, v, plan, causal=causal)  # blockspec (interp)
    out = _pack_and_run_stream(q, k, v, plan, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_stream_window_softcap():
    hq, hkv, d = 4, 2, 128
    rng = np.random.default_rng(1)
    qo = np.asarray([0, 40], np.int64)
    plan = build_prefill_plan(qo, np.asarray([160]), hq, hkv, causal=True,
                              kv_row_starts=np.asarray([0]))
    q = jnp.asarray(rng.standard_normal((40, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((160, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((160, hkv, d)), jnp.float32)
    kw = dict(window_left=13, logits_soft_cap=20.0)
    ref, _ = run_prefill(q, k, v, plan, causal=True, **kw)
    out = _pack_and_run_stream(q, k, v, plan, True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("page_size", [5, 16])
def test_hm_paged_matches_blockspec(page_size):
    """v2 kernel over PAGED plans: page slots map to flat pool rows via
    the 8-aligned gather (serves paged/chunked prefill + holistic)."""
    hq, hkv, d = 4, 2, 128
    rng = np.random.default_rng(7)
    qo_lens = [20, 33]
    kv_lens = [37, 64]
    pages_per = [-(-l // page_size) for l in kv_lens]
    tp = sum(pages_per) + 2
    perm = rng.permutation(tp)
    page_table = []
    c = 0
    for npg in pages_per:
        page_table.append(perm[c:c + npg].astype(np.int64))
        c += npg
    qo = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int64)
    plan = build_prefill_plan(qo, np.asarray(kv_lens), hq, hkv,
                              causal=True, page_table=page_table,
                              page_size=page_size)
    q = jnp.asarray(rng.standard_normal((int(qo[-1]), hq, d)), jnp.float32)
    pool_k = jnp.asarray(
        rng.standard_normal((tp * page_size, hkv, d)), jnp.float32)
    pool_v = jnp.asarray(
        rng.standard_normal((tp * page_size, hkv, d)), jnp.float32)
    ref, _ = run_prefill(q, pool_k, pool_v, plan, causal=True)  # blockspec
    out = _pack_and_run_hm(q, pool_k, pool_v, plan, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def _pack_and_run_hm4(q, k, v, plan, causal, kt_layout, **kw):
    """Drive the v2 kernel with the natural token-major q/out layout and
    (optionally) the transposed-K pool — the TPU production layouts."""
    g = plan.group
    hkv = plan.num_kv_heads
    d = q.shape[-1]
    qsrc = jnp.asarray(plan.q_src, jnp.int32)
    qvalid = jnp.asarray(plan.q_valid)
    qp4 = (q[qsrc] * qvalid[:, None, None].astype(q.dtype)).reshape(
        plan.tq_pad, hkv, g, d)
    kv8_src = jnp.asarray(plan.kv8_src, jnp.int32)
    kv8_valid = jnp.asarray(plan.kv8_valid)
    k_al = k[kv8_src] * kv8_valid[:, None, None].astype(k.dtype)
    v_al = v[kv8_src] * kv8_valid[:, None, None].astype(v.dtype)
    if kt_layout:
        k_hm = jnp.pad(jnp.transpose(k_al, (1, 2, 0)),
                       ((0, 0), (0, 0), (0, plan.kv_block)))
    else:
        k_hm = jnp.pad(jnp.transpose(k_al, (1, 0, 2)),
                       ((0, 0), (0, plan.kv_block), (0, 0)))
    v_hm = jnp.pad(jnp.transpose(v_al, (1, 0, 2)),
                   ((0, 0), (0, plan.kv_block), (0, 0)))
    aux = jnp.zeros((hkv, plan.row_block, 128), jnp.float32)
    wargs = (plan.work_q_blk, plan.work_kv_row0_d8, plan.work_kv_len,
             plan.work_qo_len, plan.work_q_pos)
    op4, _ = prefill_packed_hm(
        qp4, k_hm, v_hm, aux, wargs,
        group=g, sm_scale=1.0 / np.sqrt(d), causal=causal,
        row_block=plan.row_block, kv_block=plan.kv_block,
        kt_layout=kt_layout, interpret=True, **kw)
    out = op4.reshape(plan.tq_pad, q.shape[1], d)
    return out[jnp.asarray(plan.out_src, jnp.int32)]


@pytest.mark.parametrize("kt_layout", [False, True])
@pytest.mark.parametrize("qo_lens,kv_lens", [
    ([5, 70, 1], [5, 90, 33]),
    ([256], [256]),
])
def test_hm_natural_layout_and_kt(kt_layout, qo_lens, kv_lens):
    """Natural [Tq, Hkv, G, D] q/out blocks (zero-copy user layout) and
    the transposed-K pool must match the BlockSpec reference."""
    hq, hkv, d = 4, 2, 128
    rng = np.random.default_rng(2)
    qo = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int64)
    ks = np.concatenate([[0], np.cumsum(kv_lens)]).astype(np.int64)
    plan = build_prefill_plan(qo, np.asarray(kv_lens), hq, hkv,
                              causal=True, kv_row_starts=ks[:-1])
    q = jnp.asarray(rng.standard_normal((int(qo[-1]), hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((int(ks[-1]), hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((int(ks[-1]), hkv, d)), jnp.float32)
    ref, _ = run_prefill(q, k, v, plan, causal=True)
    out = _pack_and_run_hm4(q, k, v, plan, True, kt_layout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_exp2", [False, True])
@pytest.mark.parametrize("pv_split", [1, 2])
def test_hm_exp2_and_pv_split(use_exp2, pv_split):
    """log2-domain softmax and interleaved exp/PV halves are numerically
    equivalent to the natural-exp single-PV kernel."""
    hq, hkv, d = 4, 2, 128
    rng = np.random.default_rng(3)
    qo = np.asarray([0, 40, 203], np.int64)
    kv_lens = np.asarray([160, 77])
    ks = np.asarray([0, 160], np.int64)
    plan = build_prefill_plan(qo, kv_lens, hq, hkv, causal=True,
                              kv_row_starts=ks)
    q = jnp.asarray(rng.standard_normal((203, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((237, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((237, hkv, d)), jnp.float32)
    ref, _ = run_prefill(q, k, v, plan, causal=True)
    out = _pack_and_run_hm(q, k, v, plan, True,
                           use_exp2=use_exp2, pv_split=pv_split)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
