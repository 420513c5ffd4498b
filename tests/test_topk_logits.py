"""Tests: exact top-k family + LogitsPipe (reference tests/utils/test_logits_processor.py style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.topk import (
    TopKTieBreak,
    top_k,
    top_k_page_table_transform,
    top_k_ragged_transform,
    topk_varlen,
)
from flashinfer_tpu.logits_processor import (
    LogitsPipe, MinP, Sample, Softmax, Temperature, TensorType, TopK, TopP,
)


def test_top_k_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 1000)).astype(np.float32)
    vals, idx = top_k(jnp.asarray(x), 50)
    ref = np.sort(x, axis=-1)[:, ::-1][:, :50]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-6)
    np.testing.assert_array_equal(
        np.take_along_axis(x, np.asarray(idx), -1), np.asarray(vals)
    )


def test_top_k_tie_break():
    x = jnp.asarray([[1.0, 5.0, 5.0, 0.0]])
    _, lo = top_k(x, 1, tie_break=TopKTieBreak.LOWER_INDEX_FIRST)
    _, hi = top_k(x, 1, tie_break=TopKTieBreak.HIGHER_INDEX_FIRST)
    assert int(lo[0, 0]) == 1
    assert int(hi[0, 0]) == 2


def test_top_k_page_table_transform():
    rng = np.random.default_rng(1)
    scores = rng.standard_normal((2, 16)).astype(np.float32)
    lengths = np.array([10, 16], np.int32)
    pt = np.arange(2 * 16, dtype=np.int32).reshape(2, 16) * 7
    out = top_k_page_table_transform(
        jnp.asarray(scores), jnp.asarray(pt), jnp.asarray(lengths), 4
    )
    for i in range(2):
        valid = scores[i, :lengths[i]]
        ref_idx = np.argsort(-valid)[:4]
        np.testing.assert_array_equal(
            np.sort(np.asarray(out[i])), np.sort(pt[i, ref_idx])
        )


def test_top_k_ragged_transform():
    rng = np.random.default_rng(2)
    scores = rng.standard_normal((3, 12)).astype(np.float32)
    lengths = np.array([12, 5, 8], np.int32)
    offsets = np.array([0, 100, 200], np.int32)
    out = top_k_ragged_transform(
        jnp.asarray(scores), jnp.asarray(offsets), jnp.asarray(lengths), 3
    )
    for i in range(3):
        ref = np.argsort(-scores[i, :lengths[i]])[:3] + offsets[i]
        np.testing.assert_array_equal(np.sort(np.asarray(out[i])), np.sort(ref))


def test_topk_varlen():
    scores = jnp.asarray([3.0, 1.0, 2.0, 9.0, 8.0, 7.0, 6.0], jnp.float32)
    indptr = jnp.asarray([0, 3, 7], jnp.int32)
    vals, idx = topk_varlen(scores, indptr, 2, max_len=4)
    np.testing.assert_allclose(np.asarray(vals), [[3.0, 2.0], [9.0, 8.0]])
    np.testing.assert_array_equal(np.asarray(idx), [[0, 2], [3, 4]])


def test_pipe_basic_fusion():
    pipe = LogitsPipe([Temperature(), Softmax(), TopK(), TopP(), Sample()])
    # Softmax+TopK don't fuse, but TopK/TopP/Sample on PROBS do
    assert "FusedTopKTopPSample" in pipe.stage_names
    logits = jax.random.normal(jax.random.key(0), (4, 128))
    ids = pipe(logits, temperature=0.9, top_k=40, top_p=0.9,
               key=jax.random.key(1))
    assert ids.shape == (4,)
    assert bool((ids >= 0).all()) and bool((ids < 128).all())


def test_pipe_softmax_sample_fusion():
    pipe = LogitsPipe([Softmax(), Sample()])
    assert pipe.stage_names == ["FusedSoftmaxSample"]
    logits = jnp.asarray([[0.0, 100.0, 0.0]])
    ids = pipe(logits, key=jax.random.key(0))
    assert int(ids[0]) == 1


def test_pipe_legalization_error():
    with pytest.raises(ValueError, match="Softmax"):
        LogitsPipe([Temperature(), TopP(), Sample()])


def test_pipe_probs_input():
    pipe = LogitsPipe([TopK(), Sample()], input_type=TensorType.PROBS)
    probs = jnp.asarray([[0.1, 0.2, 0.7, 0.0]])
    ids = pipe(probs, top_k=1, key=jax.random.key(0))
    assert int(ids[0]) == 2


def test_pipe_minp():
    pipe = LogitsPipe([Softmax(), MinP()], compile=False)
    probs = pipe(jnp.asarray([[0.0, 2.0, 4.0]]), min_p=0.5)
    out = np.asarray(probs)[0]
    assert out[0] == 0.0 and out[2] > 0
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-6)
