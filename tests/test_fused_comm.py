"""Fused comm+compute (collective matmul) on the 8-device CPU mesh.

Semantics vs unfused XLA collectives (the reference tests
all_gather_matmul the same way: vs torch.distributed AG + mm, see
reference tests/comm/test_all_gather_matmul.py), plus an HLO structure
check that the ring decomposition actually lowers to *async*
collective-permute pairs — the property XLA's latency-hiding scheduler
needs to overlap transfer with the per-step dots.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from flashinfer_tpu.parallel import (
    all_gather_matmul,
    gemm_allreduce,
    make_mesh,
    matmul_reduce_scatter,
)

jax.config.update("jax_threefry_partitionable", True)


def _mesh(tp):
    return make_mesh(tp=tp)


@pytest.mark.parametrize("tp", [2, 4, 8])
@pytest.mark.parametrize("bidirectional", [False, True])
def test_all_gather_matmul(tp, bidirectional):
    mesh = _mesh(tp)
    m, k, n = 16, 32, 24
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m * tp, k), jnp.float32)  # global M
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)

    fn = jax.jit(shard_map(
        lambda xs, ws: all_gather_matmul(
            xs, ws, "tp", bidirectional=bidirectional),
        mesh=mesh,
        in_specs=(P("tp", None), P(None, None)),
        out_specs=P(),
        check_vma=False,
    ))
    out = fn(x, w)
    ref = x @ w  # out[i*m:(i+1)*m] = shard_i @ w == global-order matmul
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_all_gather_matmul_return_ag():
    tp = 4
    mesh = _mesh(tp)
    m, k, n = 8, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(2), (m * tp, k), jnp.float32)
    w = jnp.eye(k, n, dtype=jnp.float32)
    fn = jax.jit(shard_map(
        lambda xs, ws: all_gather_matmul(xs, ws, "tp", return_ag=True),
        mesh=mesh,
        in_specs=(P("tp", None), P(None, None)),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    ag, out = fn(x, w)
    np.testing.assert_allclose(np.asarray(ag), np.asarray(x), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_matmul_reduce_scatter(tp):
    mesh = _mesh(tp)
    m, k, n = 16 * tp, 8 * tp, 24
    x = jax.random.normal(jax.random.PRNGKey(3), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (k, n), jnp.float32)

    fn = jax.jit(shard_map(
        lambda xs, ws: matmul_reduce_scatter(xs, ws, "tp"),
        mesh=mesh,
        in_specs=(P(None, "tp"), P("tp", None)),  # K sharded
        out_specs=P("tp", None),  # rows scattered
    ))
    out = fn(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("strategy", ["one_shot", "two_shot"])
def test_gemm_allreduce(strategy):
    tp = 4
    mesh = _mesh(tp)
    m, k, n = 32, 8 * tp, 16
    x = jax.random.normal(jax.random.PRNGKey(5), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (k, n), jnp.float32)
    fn = jax.jit(shard_map(
        lambda xs, ws: gemm_allreduce(xs, ws, "tp", strategy=strategy),
        mesh=mesh,
        in_specs=(P(None, "tp"), P("tp", None)),
        out_specs=P(),
        check_vma=False,
    ))
    np.testing.assert_allclose(np.asarray(fn(x, w)), np.asarray(x @ w),
                               rtol=2e-4, atol=2e-4)


def test_ring_lowers_to_async_permutes():
    """The overlap contract: the ring decomposes into P-1 independent
    collective-permute hops with a dot depending only on the buffer that
    already arrived (on TPU each hop becomes an async
    collective-permute-start/done pair that the latency-hiding scheduler
    overlaps with the dots; the CPU backend keeps them synchronous, so
    here we assert the hop count + structure). Guards against a rewrite
    that would serialize the ring into one blocking all-gather."""
    tp = 8
    mesh = _mesh(tp)
    m, k, n = 16, 32, 24
    x = jnp.zeros((m * tp, k), jnp.float32)
    w = jnp.zeros((k, n), jnp.float32)
    fn = jax.jit(shard_map(
        lambda xs, ws: all_gather_matmul(xs, ws, "tp"),
        mesh=mesh,
        in_specs=(P("tp", None), P(None, None)),
        out_specs=P(),
        check_vma=False,
    ))
    hlo = fn.lower(x, w).compile().as_text()
    n_hops = hlo.count("collective-permute")
    assert n_hops >= tp - 1, f"expected >= {tp - 1} ring hops, got {n_hops}"
    assert "all-gather" not in hlo
