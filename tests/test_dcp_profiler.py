"""DCP merge/decode + profiler export + green_ctx partitioning tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from flashinfer_tpu.parallel import dcp_decode_attention, dcp_merge, make_mesh
from flashinfer_tpu.profiler import ProfilerContext, decode_tag
from flashinfer_tpu.green_ctx import make_partition_meshes, split_device


def test_dcp_decode_matches_single_device():
    """KV split over 4 cp ranks == full-KV decode."""
    cp = 4
    mesh = make_mesh(cp=cp, axis_order=("cp",))
    b, hq, hkv, d, ps = 2, 4, 2, 64, 8
    pages_per_rank = 2
    kv_per_rank = pages_per_rank * ps
    total_pages = cp * b * pages_per_rank
    rng = np.random.default_rng(0)
    k_all = rng.standard_normal((total_pages, ps, hkv, d)).astype(np.float32)
    v_all = rng.standard_normal((total_pages, ps, hkv, d)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)

    # global reference: request i owns pages [i*cp*ppr, (i+1)*cp*ppr)
    from flashinfer_tpu.ops.attention.pallas_decode import paged_decode_attention
    pt_global = np.arange(total_pages, dtype=np.int32).reshape(
        b, cp * pages_per_rank)
    kl_global = jnp.full((b,), cp * kv_per_rank, jnp.int32)
    o_ref, _ = paged_decode_attention(
        q, jnp.asarray(k_all), jnp.asarray(v_all), jnp.asarray(pt_global),
        kl_global)

    # shard: rank r holds, per request, its contiguous kv slice.
    # local pool layout: [b * ppr] pages per rank, page_table local ids.
    k_sh = k_all.reshape(b, cp, pages_per_rank, ps, hkv, d).transpose(
        1, 0, 2, 3, 4, 5).reshape(cp * b * pages_per_rank, ps, hkv, d)
    v_sh = v_all.reshape(b, cp, pages_per_rank, ps, hkv, d).transpose(
        1, 0, 2, 3, 4, 5).reshape(cp * b * pages_per_rank, ps, hkv, d)
    pt_local = np.arange(b * pages_per_rank, dtype=np.int32).reshape(
        b, pages_per_rank)
    kl_local = jnp.full((b,), kv_per_rank, jnp.int32)

    fn = jax.jit(shard_map(
        lambda q, k, v: dcp_decode_attention(
            q, k, v, jnp.asarray(pt_local), kl_local, "cp"),
        mesh=mesh,
        in_specs=(P(), P("cp"), P("cp")),
        out_specs=P(),
        check_vma=False,
    ))
    o = fn(q, jnp.asarray(k_sh), jnp.asarray(v_sh))
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)


def test_dcp_merge_is_order_invariant():
    mesh = make_mesh(cp=4, axis_order=("cp",))
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.standard_normal((4, 2, 3, 8)), jnp.float32)
    lse = jnp.asarray(rng.standard_normal((4, 2, 3)), jnp.float32)
    fn = jax.jit(shard_map(
        lambda o, l: dcp_merge(o[0], l[0], "cp"),
        mesh=mesh, in_specs=(P("cp"), P("cp")), out_specs=(P(), P()),
        check_vma=False,
    ))
    o_m, lse_m = fn(o, lse)
    # reference: weighted by softmax of lse
    w = np.exp(np.asarray(lse) - np.asarray(lse).max(0))
    w = w / w.sum(0)
    ref = (np.asarray(o) * w[..., None]).sum(0)
    np.testing.assert_allclose(np.asarray(o_m), ref, rtol=1e-5, atol=1e-5)


def test_profiler_export(tmp_path):
    prof = ProfilerContext()
    with prof.event("plan", batch=4):
        pass
    with prof.event("run"):
        pass
    out = tmp_path / "trace.json"
    prof.export_to_perfetto_trace(str(out))
    data = json.loads(out.read_text())
    names = [e["name"] for e in data["traceEvents"]]
    assert names == ["plan", "run"]
    assert data["traceEvents"][0]["args"] == {"batch": 4}


def test_decode_tag():
    tag = (3 << 24) | (7 << 16) | (5 << 2) | 2
    d = decode_tag(tag)
    assert d == {"type": 2, "event": 5, "block": 7, "core": 3}


def test_green_ctx_partitions():
    groups = split_device(partitions=4)
    assert len(groups) == 4 and all(len(g) == 2 for g in groups)
    meshes = make_partition_meshes(partitions=2)
    assert len(meshes) == 2
    assert meshes[0].devices.size == 4


def test_kernel_events_flag_safe_under_interpreter(monkeypatch):
    """FLASHINFER_TPU_KERNEL_EVENTS must not break the interpreter path
    (trace_value has no CPU lowering; the flag only arms compiled runs)."""
    import jax.numpy as jnp
    import numpy as np
    from flashinfer_tpu.env import env
    from flashinfer_tpu.ops.attention.pallas_decode import (
        paged_decode_attention,
    )

    monkeypatch.setenv("FLASHINFER_TPU_KERNEL_EVENTS", "1")
    env.refresh()
    assert env.kernel_events
    try:
        rng = np.random.default_rng(0)
        k = jnp.asarray(rng.standard_normal((4, 8, 1, 128)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((4, 8, 1, 128)), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((2, 8, 128)), jnp.bfloat16)
        pt = jnp.asarray(np.arange(4, dtype=np.int32).reshape(2, 2))
        lens = jnp.full((2,), 16, jnp.int32)
        o, _ = paged_decode_attention(q, k, v, pt, lens,
                                      kernel_impl="streaming")
        assert np.isfinite(np.asarray(o, np.float32)).all()
    finally:
        monkeypatch.delenv("FLASHINFER_TPU_KERNEL_EVENTS")
        env.refresh()
