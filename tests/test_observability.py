"""Observability depth (VERDICT r2 #10): api_logging levels 3/5/10 on
the decorated flagship surface + fi_trace templates round-tripping
through trace_apply. Reference: flashinfer/api_logging.py:2425-2530,
flashinfer/trace/template.py."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashinfer_tpu as fi
from flashinfer_tpu import trace_apply
from flashinfer_tpu.env import env


def _decode_call():
    """One real decode-wrapper call on tiny shapes."""
    b, hq, hkv, d, ps, npages = 2, 4, 2, 64, 16, 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((npages, 2, ps, hkv, d)),
                     jnp.float32)
    w = fi.BatchDecodeWithPagedKVCacheWrapper(jnp.zeros((1,)), "NHD")
    w.plan(jnp.asarray([0, 2, 4], jnp.int32),
           jnp.asarray([0, 1, 2, 3], jnp.int32),
           jnp.asarray([10, 12], jnp.int32), hq, hkv, d, ps)
    return w, q, kv


def test_loglevel3_logs_decode_inputs_and_outputs(monkeypatch, capsys):
    monkeypatch.setattr(env, "loglevel", 3)
    w, q, kv = _decode_call()
    _ = w.run(q, kv)
    captured = capsys.readouterr().out
    assert "BatchDecodeWithPagedKVCacheWrapper.run" in captured
    assert "arg[0] = array(shape=(2, 4, 64)" in captured
    assert "out[0] = array(shape=(2, 4, 64)" in captured


def test_loglevel5_tensor_stats(monkeypatch, capsys):
    monkeypatch.setattr(env, "loglevel", 5)
    w, q, kv = _decode_call()
    _ = w.run(q, kv)
    captured = capsys.readouterr().out
    assert "min=" in captured and "max=" in captured
    assert "nan=0" in captured and "inf=0" in captured


def test_loglevel10_dumps_arrays(monkeypatch, tmp_path):
    monkeypatch.setattr(env, "loglevel", 10)
    monkeypatch.setattr(env, "logdest", str(tmp_path / "log.txt"))
    monkeypatch.setattr(env, "dump_dir", tmp_path / "dumps")
    w, q, kv = _decode_call()
    out = w.run(q, kv)
    files = sorted((tmp_path / "dumps").glob("*.npz"))
    assert len(files) >= 2  # one _in, one _out
    ins = [f for f in files if f.name.endswith("_in.npz")]
    outs = [f for f in files if f.name.endswith("_out.npz")]
    assert ins and outs
    d_in = np.load(ins[0])
    np.testing.assert_array_equal(d_in["arg0"], np.asarray(q))
    d_out = np.load(outs[0])
    np.testing.assert_allclose(d_out["out0"], np.asarray(out))


def test_jit_safety_inside_trace(monkeypatch):
    """Decorated ops called under jit must not crash at any level:
    tracers contribute metadata only."""
    monkeypatch.setattr(env, "loglevel", 5)

    @jax.jit
    def f(x, w):
        return fi.rmsnorm(x, w)

    x = jnp.ones((4, 64), jnp.float32)
    w = jnp.ones((64,), jnp.float32)
    out = f(x, w)
    assert bool(jnp.isfinite(out).all())


def test_trace_template_dump_and_axes(monkeypatch, tmp_path):
    from flashinfer_tpu.trace import SAMPLING_TRACE

    monkeypatch.setattr(env, "trace_dump", True)
    monkeypatch.setattr(env, "trace_dir", tmp_path)
    logits = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 128)), jnp.float32)
    _ = fi.top_k_top_p_sampling_from_logits(logits, 8, 0.9)
    files = sorted(tmp_path.glob("*top_k_top_p_sampling*.json"))
    assert files, list(tmp_path.iterdir())
    d = json.loads(files[0].read_text())
    assert d["op_type"] == "top_k_top_p_sampling"
    assert d["axes"]["batch"]["size"] == 4
    assert d["axes"]["vocab"]["size"] == 128
    assert d["inputs"]["logits"]["shape"] == [4, 128]
    # template-declared dims ride along for solution matching
    assert d["inputs"]["logits"]["dims"] == ["batch", "vocab"]


def test_trace_roundtrip_through_trace_apply(monkeypatch, tmp_path):
    """Dump a definition, then load_solutions() wires a substitute kernel
    onto exactly that API (reference trace_apply flow)."""
    from flashinfer_tpu.trace import load_solutions

    monkeypatch.setattr(env, "trace_dump", True)
    monkeypatch.setattr(env, "trace_dir", tmp_path)
    x = jnp.ones((4, 64), jnp.float32)
    w = jnp.full((64,), 2.0, jnp.float32)
    _ = fi.rmsnorm(x, w)
    monkeypatch.setattr(env, "trace_dump", False)

    calls = []

    def fake_rmsnorm(x, weight, *a, **k):
        calls.append(x.shape)
        return jnp.zeros_like(x)

    try:
        n = load_solutions(tmp_path, {"rmsnorm": fake_rmsnorm})
        assert n == 1
        out = fi.rmsnorm(x, w)
        assert calls == [(4, 64)]
        assert float(jnp.abs(out).max()) == 0.0
        st = trace_apply.stats()
        assert st[("rmsnorm", "hit")] == 1
    finally:
        trace_apply.disable_apply()
