"""Plan/run attention wrappers — the reference tutorial flow
(docs/tutorials/kv_layout.rst + flashinfer README quickstart) on TPU.

Run: python examples/attention_ops.py          (real TPU)
     FORCE_CPU=1 python examples/attention_ops.py  (Pallas interpret mode)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import flashinfer_tpu as fi

rng = np.random.default_rng(0)
num_qo_heads, num_kv_heads, head_dim, page_size = 32, 8, 128, 16

# --- paged KV decode --------------------------------------------------------
kv_lens = [97, 312, 5]
batch = len(kv_lens)
pages_per = [-(-l // page_size) for l in kv_lens]
num_pages = sum(pages_per)
kv_indptr = np.concatenate([[0], np.cumsum(pages_per)]).astype(np.int32)
kv_indices = np.arange(num_pages, dtype=np.int32)
last_len = np.asarray([(l - 1) % page_size + 1 for l in kv_lens], np.int32)

k_cache = jnp.asarray(rng.standard_normal(
    (num_pages, page_size, num_kv_heads, head_dim)), jnp.bfloat16)
v_cache = jnp.asarray(rng.standard_normal(k_cache.shape), jnp.bfloat16)
q = jnp.asarray(rng.standard_normal(
    (batch, num_qo_heads, head_dim)), jnp.bfloat16)

dec = fi.BatchDecodeWithPagedKVCacheWrapper(kv_layout="NHD")
dec.plan(kv_indptr, kv_indices, last_len,
         num_qo_heads, num_kv_heads, head_dim, page_size)
out, lse = dec.run(q, (k_cache, v_cache), return_lse=True)
print("decode out", out.shape, out.dtype, "lse", lse.shape)

# --- ragged prefill ----------------------------------------------------------
qo_lens = [128, 37]
qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int32)
total = int(qo_indptr[-1])
qp = jnp.asarray(rng.standard_normal(
    (total, num_qo_heads, head_dim)), jnp.bfloat16)
kp = jnp.asarray(rng.standard_normal(
    (total, num_kv_heads, head_dim)), jnp.bfloat16)
vp = jnp.asarray(rng.standard_normal(kp.shape), jnp.bfloat16)

pre = fi.BatchPrefillWithRaggedKVCacheWrapper()
pre.plan(qo_indptr, qo_indptr, num_qo_heads, num_kv_heads, head_dim,
         causal=True)
pout = pre.run(qp, kp, vp)
print("prefill out", pout.shape, pout.dtype)

# --- LSE merge (split-KV / cascade algebra) ---------------------------------
o1, s1 = dec.run(q, (k_cache, v_cache), return_lse=True)
merged, mlse = fi.merge_state(o1.astype(jnp.float32), s1,
                              out.astype(jnp.float32), lse)
print("merged", merged.shape, "finite:",
      bool(jnp.isfinite(merged).all() & jnp.isfinite(mlse).all()))
