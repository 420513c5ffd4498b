"""Ragged (exact-size) EP transport tests (VERDICT r3 #5).

The `ragged_all_to_all` offset algebra — dest-sort, count exchange, and
the DOUBLE exchange producing each sender's destination offsets — was
previously unexercised code. These tests run the REAL
`ep_dispatch_ragged` / `ep_combine_ragged` / `_moe_ep_forward_ragged`
code paths on the 8-device CPU mesh via the semantics-exact emulation
(`_ragged_a2a_emulated`, which deliberately consumes the exchanged
offsets), and assert against (a) per-row ground truth computed in numpy
and (b) the dense-transport EP forward.

Reference analog: include/flashinfer/comm/trtllm_alltoall.cuh:500-850.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from flashinfer_tpu.parallel.ep import (
    ep_combine_ragged,
    ep_dispatch_ragged,
    moe_ep_forward,
)


def _mesh(ep):
    devs = jax.devices()
    if len(devs) < ep:
        pytest.skip(f"needs {ep} devices")
    return jax.sharding.Mesh(np.array(devs[:ep]), ("ep",))


@pytest.mark.parametrize("ep,t,k,e,h", [
    (4, 16, 2, 8, 64),
    (8, 8, 4, 16, 128),
    (2, 5, 3, 4, 64),      # odd T, K
])
def test_dispatch_ragged_rows_land_grouped_by_source(ep, t, k, e, h):
    """Every routed row arrives at the owner of its expert, grouped by
    source rank in ascending order, with the right local expert id."""
    mesh = _mesh(ep)
    e_local = e // ep
    rng = np.random.default_rng(0)
    # skewed routing: favor low experts so per-pair counts differ
    ids_np = np.minimum(
        rng.integers(0, e, (ep * t, k)) // 2 + rng.integers(0, e // 2),
        e - 1).astype(np.int32)
    x_np = rng.standard_normal((ep * t, h)).astype(np.float32)
    # encode (global_row, k) into the payload so receipt is verifiable
    x_np[:, 0] = np.arange(ep * t)
    x = jnp.asarray(x_np)
    ids = jnp.asarray(ids_np)

    cap = ep * t * k

    def shard_fn(x, ids):
        return ep_dispatch_ragged(
            x, ids, "ep", num_experts=e, recv_capacity=cap)

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=(P("ep"), P("ep")),
        out_specs=(P("ep"), P("ep"), P("ep"), P("ep"), P("ep")),
        check_vma=False))
    x_recv, eid_recv, recv_counts, order, send_counts = fn(x, ids)

    x_recv = np.asarray(x_recv).reshape(ep, cap, h)
    eid_recv = np.asarray(eid_recv).reshape(ep, cap)
    recv_counts = np.asarray(recv_counts).reshape(ep, ep)
    send_counts = np.asarray(send_counts).reshape(ep, ep)

    # count exchange correctness: recv_counts[r, s] == send_counts[s, r]
    np.testing.assert_array_equal(recv_counts, send_counts.T)

    # ground truth: rows rank s sends to rank r, in dest-sorted order
    dest_np = ids_np // e_local
    for r in range(ep):
        pos = 0
        for s in range(ep):
            rows_s = []
            for ti in range(t):
                gt = s * t + ti
                for ki in range(k):
                    if dest_np[gt, ki] == r:
                        rows_s.append((gt, ids_np[gt, ki] % e_local))
            assert recv_counts[r, s] == len(rows_s)
            for gt, eloc in rows_s:
                assert x_recv[r, pos, 0] == gt
                assert eid_recv[r, pos] == eloc
                pos += 1
        # nothing else written
        assert np.all(eid_recv[r, pos:] == -1)


@pytest.mark.parametrize("ep,t,k,e,h", [(4, 16, 2, 8, 64), (8, 6, 3, 8, 128)])
def test_dispatch_combine_ragged_roundtrip_identity(ep, t, k, e, h):
    """combine(dispatch(x)) with identity expert compute returns each
    token's weighted sum of its own rows — exact round-trip through both
    ragged transfers."""
    mesh = _mesh(ep)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((ep * t, h)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, e, (ep * t, k)), jnp.int32)
    wts = jnp.asarray(rng.random((ep * t, k)), jnp.float32)
    cap = ep * t * k

    def shard_fn(x, ids, wts):
        x_recv, eid, recv_counts, order, send_counts = ep_dispatch_ragged(
            x, ids, "ep", num_experts=e, recv_capacity=cap)
        return ep_combine_ragged(
            x_recv, recv_counts, order, send_counts, wts, "ep")

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=(P("ep"),) * 3,
        out_specs=P("ep"), check_vma=False))
    out = np.asarray(fn(x, ids, wts))
    ref = np.asarray(x) * np.asarray(wts).sum(-1, keepdims=True)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ep", [4, 8])
def test_ragged_forward_matches_dense_transport(ep):
    """Full EP MoE forward: transport='ragged' == transport='dense' at
    drop-free capacity (same experts, same tokens)."""
    t, k, e, h, i_sz = 12, 2, 8, 64, 96
    mesh = _mesh(ep)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((ep * t, h)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, e, (ep * t, k)), jnp.int32)
    wts = jnp.asarray(rng.random((ep * t, k)), jnp.float32)
    w13 = jnp.asarray(rng.standard_normal((e, h, 2 * i_sz)) * 0.05,
                      jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, i_sz, h)) * 0.05, jnp.float32)

    def run(transport):
        fn = jax.jit(shard_map(
            functools.partial(
                moe_ep_forward, axis="ep", num_experts=e, algo="ht",
                transport=transport),
            mesh=mesh, in_specs=(P("ep"),) * 5, out_specs=P("ep"),
            check_vma=False))
        return np.asarray(fn(x, ids, wts, w13, w2))

    np.testing.assert_allclose(run("ragged"), run("dense"),
                               rtol=2e-4, atol=2e-4)


def test_ragged_rejects_alive_mask():
    """ADVICE r3 medium: the ragged transport must refuse (not silently
    ignore) the rank-health mask."""
    ep = 2
    mesh = _mesh(ep)
    e, h, i_sz, t, k = 4, 32, 32, 4, 2
    x = jnp.zeros((ep * t, h), jnp.float32)
    ids = jnp.zeros((ep * t, k), jnp.int32)
    wts = jnp.ones((ep * t, k), jnp.float32)
    w13 = jnp.zeros((e, h, 2 * i_sz), jnp.float32)
    w2 = jnp.zeros((e, i_sz, h), jnp.float32)
    with pytest.raises(NotImplementedError):
        fn = shard_map(
            functools.partial(
                moe_ep_forward, axis="ep", num_experts=e,
                transport="ragged", alive=jnp.asarray([True, False])),
            mesh=mesh, in_specs=(P("ep"),) * 5, out_specs=P("ep"),
            check_vma=False)
        fn(x, ids, wts, w13, w2)


def test_ht_bounded_requires_stats():
    """ADVICE r3 high: the bounded-capacity mode must not run with its
    drop counter discarded."""
    ep = 2
    mesh = _mesh(ep)
    e, h, i_sz, t, k = 4, 32, 32, 4, 2
    x = jnp.zeros((ep * t, h), jnp.float32)
    ids = jnp.zeros((ep * t, k), jnp.int32)
    wts = jnp.ones((ep * t, k), jnp.float32)
    w13 = jnp.zeros((e, h, 2 * i_sz), jnp.float32)
    w2 = jnp.zeros((e, i_sz, h), jnp.float32)
    with pytest.raises(ValueError, match="ht_bounded"):
        fn = shard_map(
            functools.partial(
                moe_ep_forward, axis="ep", num_experts=e,
                algo="ht_bounded"),
            mesh=mesh, in_specs=(P("ep"),) * 5, out_specs=P("ep"),
            check_vma=False)
        fn(x, ids, wts, w13, w2)
