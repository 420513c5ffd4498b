"""Ulysses × Ring ParallelAttention vs dense reference; AOT cache warm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from flashinfer_tpu.parallel import (
    ParallelAttention,
    ParallelConfig,
    make_mesh,
)


@pytest.mark.parametrize("ring,ulysses", [(2, 2), (4, 1), (1, 4)])
def test_parallel_attention_vs_dense(ring, ulysses):
    mesh = make_mesh(cp=ring, tp=ulysses, axis_order=("cp", "tp"))
    b, s, hq, hkv, d = 1, 64, 4, 4, 32  # hkv == hq (ulysses splits heads)
    key = jax.random.key(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, hq, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(kv_, (b, s, hkv, d), jnp.float32)

    pa = ParallelAttention(ParallelConfig(ulysses_axis="tp", ring_axis="cp"))
    fn = jax.jit(shard_map(
        lambda q, k, v: pa(q, k, v),
        mesh=mesh, in_specs=(P(None, ("cp", "tp")),) * 3,
        out_specs=P(None, ("cp", "tp")), check_vma=False,
    ))
    out = np.asarray(fn(q, k, v))

    qf = np.asarray(q) / np.sqrt(d)
    s_mat = np.einsum("bqhd,bkhd->bhqk", qf, np.asarray(k))
    mask = np.tril(np.ones((s, s), bool))
    s_mat = np.where(mask[None, None], s_mat, -np.inf)
    p = np.exp(s_mat - s_mat.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, np.asarray(v))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_aot_warm(tmp_path, monkeypatch):
    from flashinfer_tpu import aot

    n = aot.warm_decode(
        [dict(batch=2, page_size=16, max_pages=2, num_qo_heads=4,
              num_kv_heads=2, head_dim=128, dtype=jnp.float32)],
        verbose=False,
    )
    assert n == 1
