"""Mixed TP×DP comm-mode tests (reference tests/comm/ mixed_comm)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from flashinfer_tpu.parallel import (
    MixedCommMode,
    make_mesh,
    mixed_comm_layer,
    mixed_comm_post,
    mixed_comm_pre,
)

TP = 4


def _run(fn, in_spec, out_spec, *args):
    mesh = make_mesh(tp=TP, axis_order=("tp",))
    return np.asarray(jax.jit(shard_map(
        fn, mesh=mesh, in_specs=in_spec, out_specs=out_spec,
        check_vma=False,
    ))(*args))


def test_all_reduce_mode():
    x = jnp.ones((8, 4), jnp.float32)
    out = _run(
        lambda x: mixed_comm_post(x, MixedCommMode.ALL_REDUCE, "tp"),
        (P("tp", None),), P(None, None), x,
    )
    # each rank contributes its 2-row shard → psum of 4 different shards
    np.testing.assert_allclose(out, np.ones((2, 4)) * 4)


def test_reduce_scatter_mode():
    x = jnp.asarray(np.tile(np.arange(8, dtype=np.float32)[:, None], (1, 4)))
    out = _run(
        lambda x: mixed_comm_post(x, MixedCommMode.REDUCE_SCATTER, "tp"),
        (P(),), P("tp"), x,
    )
    # replicated input: RS sums TP identical copies and shards rows
    np.testing.assert_allclose(
        out, np.tile(np.arange(8, dtype=np.float32)[:, None], (1, 4)) * TP)


def test_all_gather_mode():
    x = jnp.asarray(np.arange(8, dtype=np.float32)[:, None] *
                    np.ones((1, 4), np.float32))
    out = _run(
        lambda x: mixed_comm_pre(x, MixedCommMode.ALL_GATHER, "tp"),
        (P("tp"),), P(None, None), x,
    )
    np.testing.assert_allclose(out, np.asarray(x))


def test_ag_rs_sandwich_roundtrip():
    """AG → identity layer → RS recovers x · tp (sequence-parallel
    sandwich semantics)."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4)),
                    jnp.float32)
    out = _run(
        lambda x: mixed_comm_layer(x, lambda a: a, MixedCommMode.AG_RS, "tp"),
        (P("tp"),), P("tp"), x,
    )
    np.testing.assert_allclose(out, np.asarray(x) * TP, rtol=1e-6)
