"""SSM / linear-attention family vs naive numpy references
(reference tests: tests/mamba/, tests/gdn/, tests/kda/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.ssm import (
    chunk_gated_delta_rule,
    gdn_decode,
    recurrent_kda,
    selective_state_update,
)


def _np_ssu(state, x, dt, A, B, C, D, z, dt_bias, dt_softplus, hpg):
    """state [B,H,dim,ds]; x/dt [B,H,dim]; B/C [B,G,ds]."""
    dtv = dt + (dt_bias if dt_bias is not None else 0)
    if dt_softplus:
        dtv = np.log1p(np.exp(dtv))
    dA = np.exp(dtv[..., None] * A[None])  # [B,H,dim,ds]
    Bg = np.repeat(B, hpg, axis=1)
    Cg = np.repeat(C, hpg, axis=1)
    dBx = (dtv * x)[..., None] * Bg[:, :, None, :]
    s_new = state * dA + dBx
    y = np.einsum("bhds,bhs->bhd", s_new, Cg)
    if D is not None:
        y = y + D[None] * x
    if z is not None:
        y = y * (z / (1 + np.exp(-z)))
    return y, s_new


@pytest.mark.parametrize("dt_softplus", [False, True])
@pytest.mark.parametrize("with_z", [False, True])
def test_selective_state_update(dt_softplus, with_z):
    b, h, dim, ds, g = 3, 4, 8, 16, 2
    rng = np.random.default_rng(0)
    state = rng.standard_normal((b, h, dim, ds)).astype(np.float32)
    x = rng.standard_normal((b, h, dim)).astype(np.float32)
    dt = rng.standard_normal((b, h, dim)).astype(np.float32) * 0.1
    A = -np.abs(rng.standard_normal((h, dim, ds))).astype(np.float32)
    B = rng.standard_normal((b, g, ds)).astype(np.float32)
    C = rng.standard_normal((b, g, ds)).astype(np.float32)
    D = rng.standard_normal((h, dim)).astype(np.float32)
    z = rng.standard_normal((b, h, dim)).astype(np.float32) if with_z else None
    dt_bias = rng.standard_normal((h, dim)).astype(np.float32) * 0.1

    out, new_state = selective_state_update(
        jnp.asarray(state), jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
        z=jnp.asarray(z) if with_z else None,
        dt_bias=jnp.asarray(dt_bias), dt_softplus=dt_softplus,
    )
    ref_y, ref_s = _np_ssu(state, x, dt, A, B, C, D, z, dt_bias,
                           dt_softplus, h // g)
    np.testing.assert_allclose(np.asarray(out), ref_y, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_state), ref_s, rtol=2e-4,
                               atol=2e-4)


def test_selective_state_update_slot_indices():
    b, h, dim, ds, cache = 2, 2, 4, 8, 6
    rng = np.random.default_rng(1)
    state = rng.standard_normal((cache, h, dim, ds)).astype(np.float32)
    x = rng.standard_normal((b, h, dim)).astype(np.float32)
    dt = np.full((b, h, dim), 0.1, np.float32)
    A = -np.ones((h, dim, ds), np.float32)
    B = rng.standard_normal((b, 1, ds)).astype(np.float32)
    C = rng.standard_normal((b, 1, ds)).astype(np.float32)
    idx = np.array([4, -1], np.int32)  # second request padded out
    out, new_state = selective_state_update(
        jnp.asarray(state), jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C), None,
        state_batch_indices=jnp.asarray(idx), pad_slot_id=-1,
    )
    ns = np.asarray(new_state)
    assert not np.allclose(ns[4], state[4])  # slot 4 updated
    np.testing.assert_array_equal(ns[[0, 1, 2, 3, 5]], state[[0, 1, 2, 3, 5]])


def _np_delta_rule(q, k, v, g, beta, s0, scale, vector_gate=False):
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    s = s0.copy()
    outs = np.zeros((b, t, h, dv), np.float32)
    for i in range(t):
        if vector_gate:
            s = s * np.exp(g[:, i])[..., None]
        else:
            s = s * np.exp(g[:, i])[..., None, None]
        pred = np.einsum("bhkv,bhk->bhv", s, k[:, i])
        err = (v[:, i] - pred) * beta[:, i][..., None]
        s = s + k[:, i][..., None] * err[:, :, None, :]
        outs[:, i] = np.einsum("bhkv,bhk->bhv", s, q[:, i]) * scale
    return outs, s


def test_chunk_gated_delta_rule_batched():
    b, t, h, dk, dv = 2, 10, 3, 16, 8
    rng = np.random.default_rng(2)
    q = rng.standard_normal((b, t, h, dk)).astype(np.float32)
    k = rng.standard_normal((b, t, h, dk)).astype(np.float32)
    v = rng.standard_normal((b, t, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((b, t, h))).astype(np.float32) * 0.1
    beta = rng.uniform(0.1, 0.9, (b, t, h)).astype(np.float32)
    scale = 1.0 / np.sqrt(dk)

    out, s_final = chunk_gated_delta_rule(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        jnp.asarray(beta), output_final_state=True,
    )
    ref_o, ref_s = _np_delta_rule(q, k, v, g, beta,
                                  np.zeros((b, h, dk, dv), np.float32), scale)
    np.testing.assert_allclose(np.asarray(out), ref_o, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(s_final), ref_s, rtol=3e-4, atol=3e-4)


def test_chunk_gated_delta_rule_packed_varlen():
    """Packed varlen == per-sequence independent processing."""
    lens = [5, 3, 7]
    h, dk, dv = 2, 8, 8
    total = sum(lens)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((total, h, dk)).astype(np.float32)
    k = rng.standard_normal((total, h, dk)).astype(np.float32)
    v = rng.standard_normal((total, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((total, h))).astype(np.float32) * 0.1
    beta = rng.uniform(0.1, 0.9, (total, h)).astype(np.float32)
    cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)

    out = chunk_gated_delta_rule(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        jnp.asarray(beta), cu_seqlens=jnp.asarray(cu),
    )
    scale = 1.0 / np.sqrt(dk)
    for i, (s, e) in enumerate(zip(cu[:-1], cu[1:])):
        ref_o, _ = _np_delta_rule(
            q[None, s:e], k[None, s:e], v[None, s:e], g[None, s:e],
            beta[None, s:e], np.zeros((1, h, dk, dv), np.float32), scale)
        np.testing.assert_allclose(
            np.asarray(out[s:e]), ref_o[0], rtol=3e-4, atol=3e-4,
            err_msg=f"seq {i}")


def test_gdn_decode_state_pool():
    b, h, dk, dv, pool = 2, 2, 8, 8, 5
    rng = np.random.default_rng(4)
    state = rng.standard_normal((pool, h, dk, dv)).astype(np.float32)
    q = rng.standard_normal((b, h, dk)).astype(np.float32)
    k = rng.standard_normal((b, h, dk)).astype(np.float32)
    v = rng.standard_normal((b, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((b, h))).astype(np.float32) * 0.1
    beta = rng.uniform(0.1, 0.9, (b, h)).astype(np.float32)
    idx = np.array([3, 0], np.int32)

    out, new_state = gdn_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        jnp.asarray(beta), jnp.asarray(state),
        state_indices=jnp.asarray(idx), use_qk_l2norm_in_kernel=False,
    )
    ref_o, ref_s = _np_delta_rule(
        q[:, None], k[:, None], v[:, None], g[:, None], beta[:, None],
        state[idx], 1.0 / np.sqrt(dk))
    np.testing.assert_allclose(np.asarray(out), ref_o[:, 0], rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(new_state)[idx], ref_s, rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_array_equal(np.asarray(new_state)[[1, 2, 4]],
                                  state[[1, 2, 4]])


def test_recurrent_kda_vector_gate():
    b, t, h, dk, dv = 2, 6, 2, 8, 8
    rng = np.random.default_rng(5)
    q = rng.standard_normal((b, t, h, dk)).astype(np.float32)
    k = rng.standard_normal((b, t, h, dk)).astype(np.float32)
    v = rng.standard_normal((b, t, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((b, t, h, dk))).astype(np.float32) * 0.1
    beta = rng.uniform(0.1, 0.9, (b, t, h)).astype(np.float32)

    out, s_final = recurrent_kda(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        jnp.asarray(beta), output_final_state=True,
        use_qk_l2norm_in_kernel=False,
    )
    ref_o, ref_s = _np_delta_rule(
        q, k, v, g, beta, np.zeros((b, h, dk, dv), np.float32),
        1.0 / np.sqrt(dk), vector_gate=True)
    np.testing.assert_allclose(np.asarray(out), ref_o, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(s_final), ref_s, rtol=3e-4,
                               atol=3e-4)


def test_chunked_delta_rule_matches_scan():
    """Chunk-parallel gated delta rule == the sequential scan (dense
    batch, scalar gate; reference gdn_prefill.py:581 chunked kernels)."""
    from flashinfer_tpu.ops.ssm import (
        _delta_rule_chunked, _delta_rule_scan,
    )

    rng = np.random.default_rng(0)
    b, t, h, dk, dv = 2, 192, 3, 32, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, dk)), jnp.float32)
    # the delta rule is contractive only for L2-normalized keys (GDN
    # always normalizes: use_qk_l2norm_in_kernel) — unnormalized random
    # keys make the recurrence itself explode
    k = rng.standard_normal((b, t, h, dk))
    k = jnp.asarray(k / np.linalg.norm(k, axis=-1, keepdims=True),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, dv)), jnp.float32)
    g = jnp.asarray(-np.abs(rng.standard_normal((b, t, h))) * 0.1,
                    jnp.float32)
    beta = jnp.asarray(rng.random((b, t, h)), jnp.float32)
    s0 = jnp.asarray(rng.standard_normal((b, h, dk, dv)) * 0.1, jnp.float32)
    scale = 1.0 / np.sqrt(dk)

    o_ref, s_ref, _ = _delta_rule_scan(q, k, v, g, beta, s0, scale, None)
    o_chk, s_chk = _delta_rule_chunked(q, k, v, g, beta, s0, scale,
                                       chunk=64)
    np.testing.assert_allclose(np.asarray(o_chk), np.asarray(o_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref),
                               rtol=2e-3, atol=2e-3)


def test_chunked_vector_gate_matches_scan():
    """Chunk-parallel KDA (per-K-dim decay gate) == sequential scan.
    Includes a strong-decay head to exercise the anchored factoring's
    numerics (the naive exp(-G) factoring overflows here)."""
    from flashinfer_tpu.ops.ssm import (
        _delta_rule_chunked_vector, _delta_rule_scan,
    )

    rng = np.random.default_rng(7)
    b, t, h, dk, dv = 2, 192, 2, 32, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, dk)), jnp.float32)
    k = rng.standard_normal((b, t, h, dk))
    k = jnp.asarray(k / np.linalg.norm(k, axis=-1, keepdims=True),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, dv)), jnp.float32)
    # head 0: mild decay; head 1: strong decay (up to -3/step => the
    # within-chunk cumulative reaches -192, exp(+192) would overflow f32)
    g = -np.abs(rng.standard_normal((b, t, h, dk))).astype(np.float32)
    g[..., 1, :] *= 3.0
    g[..., 0, :] *= 0.05
    g = jnp.asarray(g)
    beta = jnp.asarray(rng.random((b, t, h)), jnp.float32)
    s0 = jnp.asarray(rng.standard_normal((b, h, dk, dv)) * 0.1, jnp.float32)
    scale = 1.0 / np.sqrt(dk)

    o_ref, s_ref, _ = _delta_rule_scan(q, k, v, g, beta, s0, scale, None)
    o_chk, s_chk = _delta_rule_chunked_vector(q, k, v, g, beta, s0, scale,
                                              chunk=64)
    assert np.isfinite(np.asarray(o_chk)).all()
    np.testing.assert_allclose(np.asarray(o_chk), np.asarray(o_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref),
                               rtol=2e-3, atol=2e-3)


def test_recurrent_kda_chunked_dispatch_matches_scan():
    """recurrent_kda takes the chunked path at t=128 and must agree with
    the scan path (t=127 forces the scan)."""
    rng = np.random.default_rng(8)
    b, t, h, dk, dv = 1, 128, 2, 16, 16
    q = rng.standard_normal((b, t, h, dk)).astype(np.float32)
    k = rng.standard_normal((b, t, h, dk)).astype(np.float32)
    v = rng.standard_normal((b, t, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((b, t, h, dk))).astype(np.float32) * 0.2
    beta = rng.uniform(0.1, 0.9, (b, t, h)).astype(np.float32)

    out_chunked, s_chunked = recurrent_kda(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        jnp.asarray(beta), output_final_state=True)
    out_scan, s_scan = recurrent_kda(
        jnp.asarray(q[:, :127]), jnp.asarray(k[:, :127]),
        jnp.asarray(v[:, :127]), jnp.asarray(g[:, :127]),
        jnp.asarray(beta[:, :127]), output_final_state=True)
    np.testing.assert_allclose(
        np.asarray(out_chunked[:, :127]), np.asarray(out_scan),
        rtol=2e-3, atol=2e-3)


def test_chunk_gated_delta_rule_varlen_init_and_finals():
    """Packed varlen with PER-SEQUENCE initial states and per-sequence
    final-state collection (reference fla contract; was v1
    NotImplementedError)."""
    lens = [4, 6, 3]
    h, dk, dv = 2, 8, 8
    total = sum(lens)
    rng = np.random.default_rng(5)
    q = rng.standard_normal((total, h, dk)).astype(np.float32)
    k = rng.standard_normal((total, h, dk)).astype(np.float32)
    v = rng.standard_normal((total, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((total, h))).astype(np.float32) * 0.1
    beta = rng.uniform(0.1, 0.9, (total, h)).astype(np.float32)
    cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    init = rng.standard_normal((len(lens), h, dk, dv)).astype(np.float32)
    scale = 1.0 / np.sqrt(dk)

    out, finals = chunk_gated_delta_rule(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        jnp.asarray(beta), cu_seqlens=jnp.asarray(cu),
        initial_state=jnp.asarray(init), output_final_state=True,
    )
    assert finals.shape == (len(lens), h, dk, dv)
    for i, (s, e) in enumerate(zip(cu[:-1], cu[1:])):
        ref_o, ref_s = _np_delta_rule(
            q[None, s:e], k[None, s:e], v[None, s:e], g[None, s:e],
            beta[None, s:e], init[None, i], scale)
        np.testing.assert_allclose(
            np.asarray(out[s:e]), ref_o[0], rtol=3e-4, atol=3e-4,
            err_msg=f"seq {i} out")
        np.testing.assert_allclose(
            np.asarray(finals[i]), ref_s[0], rtol=3e-4, atol=3e-4,
            err_msg=f"seq {i} final state")


def test_chunk_gated_delta_rule_varlen_finals_no_init():
    """Final-state collection works with zero initial states too."""
    lens = [3, 5]
    h, dk, dv = 1, 8, 8
    total = sum(lens)
    rng = np.random.default_rng(6)
    q = rng.standard_normal((total, h, dk)).astype(np.float32)
    k = rng.standard_normal((total, h, dk)).astype(np.float32)
    v = rng.standard_normal((total, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((total, h))).astype(np.float32) * 0.1
    beta = rng.uniform(0.1, 0.9, (total, h)).astype(np.float32)
    cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    scale = 1.0 / np.sqrt(dk)

    out, finals = chunk_gated_delta_rule(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        jnp.asarray(beta), cu_seqlens=jnp.asarray(cu),
        output_final_state=True,
    )
    for i, (s, e) in enumerate(zip(cu[:-1], cu[1:])):
        _, ref_s = _np_delta_rule(
            q[None, s:e], k[None, s:e], v[None, s:e], g[None, s:e],
            beta[None, s:e], np.zeros((1, h, dk, dv), np.float32), scale)
        np.testing.assert_allclose(
            np.asarray(finals[i]), ref_s[0], rtol=3e-4, atol=3e-4,
            err_msg=f"seq {i}")


def _np_ssu_token(state, x, dt_p, A, B, hpg):
    """Apply ONE processed-dt token: state [B,H,dim,ds], x [B,H,dim],
    dt_p [B,H], B [B,G,ds]."""
    dA = np.exp(dt_p[..., None, None] * A[None])
    Bg = np.repeat(B, hpg, axis=1)
    dBx = (dt_p[..., None] * x)[..., None] * Bg[:, :, None, :]
    return state * dA + dBx


@pytest.mark.parametrize("with_z", [False, True])
def test_checkpointing_ssu_replay_rounds(with_z):
    """Three speculative rounds with partial acceptance: the committed
    state after each call must equal the ground truth of applying exactly
    the accepted tokens, and outputs must be computed from that state."""
    from flashinfer_tpu.ops.ssm import checkpointing_ssu

    b, h, dim, ds, g, T, R = 2, 4, 8, 16, 2, 4, 12
    hpg = h // g
    rng = np.random.default_rng(1)
    state = rng.standard_normal((b, h, dim, ds)).astype(np.float32) * 0.1
    x_cache = np.zeros((b, h, R, dim), np.float32)
    B_cache = np.zeros((b, g, R, ds), np.float32)
    dt_cache = np.zeros((b, h, R), np.float32)
    ring_start = np.zeros((b,), np.int32)
    pnat = np.zeros((b,), np.int32)
    A = -np.abs(rng.standard_normal((h, dim, ds))).astype(np.float32)
    D = rng.standard_normal((h, dim)).astype(np.float32)
    dt_bias = rng.standard_normal((h,)).astype(np.float32) * 0.1

    truth = state.copy()  # ground-truth committed state
    st, xc, bc, dc, rs = (jnp.asarray(state), jnp.asarray(x_cache),
                          jnp.asarray(B_cache), jnp.asarray(dt_cache),
                          jnp.asarray(ring_start))
    prev_xs = prev_bs = prev_dts = None
    accepts = [np.array([0, 0]), np.array([3, 1]), np.array([2, 4])]
    for rnd, acc in enumerate(accepts):
        x = rng.standard_normal((b, T, h, dim)).astype(np.float32) * 0.3
        dt = rng.standard_normal((b, T, h)).astype(np.float32) * 0.3
        B = rng.standard_normal((b, T, g, ds)).astype(np.float32) * 0.3
        C = rng.standard_normal((b, T, g, ds)).astype(np.float32) * 0.3
        z = (rng.standard_normal((b, T, h, dim)).astype(np.float32)
             if with_z else None)

        out, st, xc, bc, dc, rs, _ = checkpointing_ssu(
            st, jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
            jnp.asarray(B), jnp.asarray(C), xc, bc, dc, rs,
            jnp.asarray(acc.astype(np.int32)),
            D=jnp.asarray(D),
            z=None if z is None else jnp.asarray(z),
            dt_bias=jnp.asarray(dt_bias), dt_softplus=True,
        )

        # ground truth: replay `acc` accepted tokens from the PREVIOUS round
        for bi in range(b):
            for i in range(int(acc[bi])):
                truth[bi:bi+1] = _np_ssu_token(
                    truth[bi:bi+1], prev_xs[bi:bi+1, i],
                    prev_dts[bi:bi+1, i], A, prev_bs[bi:bi+1, i], hpg)
        np.testing.assert_allclose(np.asarray(st), truth, rtol=2e-4,
                                   atol=2e-4)

        # expected outputs: run the new tokens from the replayed state
        dt_p = np.log1p(np.exp(dt + dt_bias[None, None]))
        s = truth.copy()
        exp_out = np.zeros_like(x)
        for i in range(T):
            s = _np_ssu_token(s, x[:, i], dt_p[:, i], A, B[:, i], hpg)
            Cg = np.repeat(C[:, i], hpg, axis=1)
            y = np.einsum("bhds,bhs->bhd", s, Cg) + D[None] * x[:, i]
            if z is not None:
                zi = z[:, i]
                y = y * (zi / (1 + np.exp(-zi)))
            exp_out[:, i] = y
        np.testing.assert_allclose(np.asarray(out), exp_out, rtol=2e-4,
                                   atol=2e-4)
        prev_xs, prev_bs, prev_dts = x, B, dt_p

    # ring head advanced by the total accepted count
    np.testing.assert_array_equal(
        np.asarray(rs), sum(a for a in accepts) % R)


def test_checkpointing_ssu_pad_slot_and_quantized_state():
    from flashinfer_tpu.ops.ssm import checkpointing_ssu

    b, h, dim, ds, g, T, R, cache = 3, 2, 4, 8, 1, 2, 8, 4
    rng = np.random.default_rng(2)
    scale = np.full((cache, h, dim), 0.01, np.float32)
    state_q = rng.integers(-100, 100, (cache, h, dim, ds)).astype(np.int8)
    x = rng.standard_normal((b, T, h, dim)).astype(np.float32) * 0.3
    dt = np.abs(rng.standard_normal((b, T, h))).astype(np.float32) * 0.3
    A = -np.abs(rng.standard_normal((h, dim, ds))).astype(np.float32)
    B = rng.standard_normal((b, T, g, ds)).astype(np.float32) * 0.3
    C = rng.standard_normal((b, T, g, ds)).astype(np.float32) * 0.3
    x_cache = rng.standard_normal((cache, h, R, dim)).astype(np.float32)
    B_cache = rng.standard_normal((cache, g, R, ds)).astype(np.float32)
    dt_cache = np.abs(rng.standard_normal((cache, h, R))).astype(np.float32)
    ring_start = np.array([1, 5, 0, 2], np.int32)
    pnat = np.array([2, 0, 1, 3], np.int32)
    slots = np.array([2, -1, 0], np.int32)  # batch 1 is padding

    out, st, xc, bc, dc, rs, sc = checkpointing_ssu(
        jnp.asarray(state_q), jnp.asarray(x), jnp.asarray(dt),
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
        jnp.asarray(x_cache), jnp.asarray(B_cache), jnp.asarray(dt_cache),
        jnp.asarray(ring_start), jnp.asarray(pnat),
        state_batch_indices=jnp.asarray(slots), pad_slot_id=-1,
        state_scale=jnp.asarray(scale),
    )
    st, xc, bc, dc, rs, sc = map(np.asarray, (st, xc, bc, dc, rs, sc))
    # untouched slots keep their state, scale, ring position and ring rows
    for s_i in (1, 3):
        np.testing.assert_array_equal(st[s_i], state_q[s_i])
        np.testing.assert_array_equal(sc[s_i], scale[s_i])
        assert rs[s_i] == ring_start[s_i]
        np.testing.assert_array_equal(xc[s_i], x_cache[s_i])

    # touched slot 2 (batch 0): replay pnat=1 token from ring row 0
    hpg = h // g
    s0 = state_q[2].astype(np.float32)[None] * scale[2][None, ..., None]
    s1 = _np_ssu_token(s0, x_cache[2][:, 0][None], dt_cache[2][:, 0][None],
                       A, B_cache[2][:, 0][None], hpg)[0]
    deq = st[2].astype(np.float32) * sc[2][..., None]
    np.testing.assert_allclose(deq, s1, atol=np.abs(s1).max() / 60)
    assert rs[2] == (ring_start[2] + pnat[2]) % R
    # new tokens written at rows (start+pnat)..+T-1 of slot 2
    for i in range(T):
        row = (ring_start[2] + pnat[2] + i) % R
        np.testing.assert_allclose(xc[2][:, row], x[0, i].swapaxes(0, 0),
                                   rtol=1e-6)

    # SLOT 0: a real lane (batch 2) rides slot 0 while a PAD lane (batch 1)
    # exists — the pad lane must not scatter its stale values into slot 0
    # (advisor r2 high: pad lanes clamped to slot 0 silently reverted the
    # real lane's commit). Replay pnat[0]=2 tokens from ring rows 1,2.
    s0_0 = state_q[0].astype(np.float32)[None] * scale[0][None, ..., None]
    for r_i in (ring_start[0], ring_start[0] + 1):
        s0_0 = _np_ssu_token(
            s0_0, x_cache[0][:, r_i % R][None],
            dt_cache[0][:, r_i % R][None], A, B_cache[0][:, r_i % R][None],
            hpg)
    deq0 = st[0].astype(np.float32) * sc[0][..., None]
    np.testing.assert_allclose(deq0, s0_0[0], atol=np.abs(s0_0).max() / 60)
    assert rs[0] == (ring_start[0] + pnat[0]) % R
    for i in range(T):
        row = (ring_start[0] + pnat[0] + i) % R
        np.testing.assert_allclose(xc[0][:, row], x[2, i], rtol=1e-6)


def test_checkpointing_ssu_fp8_state_preserves_small_values():
    """fp8 state commit must RN-cast, not integer-round: scaled magnitudes
    below 0.5 would otherwise quantize to exactly 0 (advisor r2 medium)."""
    from flashinfer_tpu.ops.ssm import checkpointing_ssu

    b, h, dim, ds, g, T, R, cache = 1, 2, 4, 8, 1, 2, 8, 2
    rng = np.random.default_rng(3)
    # state values spanning several fp8 decades below scale*0.5
    sf = rng.standard_normal((cache, h, dim, ds)).astype(np.float32) * 0.05
    scale = np.full((cache, h, dim), 1.0, np.float32)
    state_q = jnp.asarray(sf, jnp.float8_e4m3fn)
    x = rng.standard_normal((b, T, h, dim)).astype(np.float32) * 0.1
    dt = np.abs(rng.standard_normal((b, T, h))).astype(np.float32) * 0.1
    A = -np.abs(rng.standard_normal((h, dim, ds))).astype(np.float32)
    B = rng.standard_normal((b, T, g, ds)).astype(np.float32) * 0.1
    C = rng.standard_normal((b, T, g, ds)).astype(np.float32) * 0.1
    zeros = np.zeros

    out, st, *_rest, sc = checkpointing_ssu(
        state_q, jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C),
        jnp.asarray(zeros((cache, h, R, dim), np.float32)),
        jnp.asarray(zeros((cache, g, R, ds), np.float32)),
        jnp.asarray(zeros((cache, h, R), np.float32)),
        jnp.zeros((cache,), jnp.int32), jnp.zeros((cache,), jnp.int32),
        state_batch_indices=jnp.asarray([0], jnp.int32), pad_slot_id=-1,
        state_scale=jnp.asarray(scale),
    )
    # pnat=0: the committed state is just the (requantized) input state;
    # RN fp8 encode keeps relative error ~2^-3 even for small magnitudes
    deq = np.asarray(st[0], np.float32) * np.asarray(sc)[0][..., None]
    ref = np.asarray(state_q[0], np.float32) * scale[0][..., None]
    nz = np.abs(ref) > 1e-4
    assert nz.any()
    np.testing.assert_allclose(deq[nz], ref[nz], rtol=0.14)
    # integer rounding would have zeroed every |scaled| < 0.5 element
    small = nz & (np.abs(ref / np.asarray(sc)[0][..., None]) < 0.4)
    if small.any():
        assert np.abs(deq[small]).min() > 0


def test_checkpointing_ssu_input_validation():
    from flashinfer_tpu.ops.ssm import checkpointing_ssu

    h, dim, ds, g, T, R, cache = 2, 4, 8, 1, 2, 8, 2
    mk = lambda *s: jnp.zeros(s, jnp.float32)
    args = (mk(cache, h, dim, ds).astype(jnp.int8), mk(1, T, h, dim),
            mk(1, T, h), mk(h, dim, ds), mk(1, T, g, ds), mk(1, T, g, ds),
            mk(cache, h, R, dim), mk(cache, g, R, ds), mk(cache, h, R),
            jnp.zeros((cache,), jnp.int32), jnp.zeros((cache,), jnp.int32))
    with pytest.raises(ValueError, match="state_scale"):
        checkpointing_ssu(*args)  # int8 state without scale
    with pytest.raises(ValueError, match="int8/fp8"):
        checkpointing_ssu(mk(cache, h, dim, ds), *args[1:],
                          state_scale=mk(cache, h, dim))
    with pytest.raises(ValueError, match="ring length"):
        checkpointing_ssu(
            mk(cache, h, dim, ds), mk(1, 6, h, dim), mk(1, 6, h),
            mk(h, dim, ds), mk(1, 6, g, ds), mk(1, 6, g, ds),
            *args[6:])  # T=6 > R/2
