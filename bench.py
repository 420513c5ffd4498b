"""Headline benchmark: paged-KV decode attention bandwidth vs HBM roofline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = achieved HBM bandwidth / chip peak (decode attention is
bandwidth-bound; the reference's north-star is >=90% of roofline,
BASELINE.md). Runs on whatever the default JAX backend is — the real TPU
chip under the driver, interpreter-mode CPU elsewhere (then numbers are
meaningless but the line still prints).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# chip HBM peak bandwidth (GB/s) by device_kind substring
_PEAK_BW = {
    "v5 lite": 819.0,  # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v5": 1228.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
    "v4": 1228.0,
}


def _peak_bw_gbs() -> float:
    kind = (getattr(jax.devices()[0], "device_kind", "") or "").lower()
    for key, bw in _PEAK_BW.items():
        if key in kind:
            return bw
    return 819.0


def main() -> None:
    from flashinfer_tpu.ops.attention.pallas_decode import (
        paged_decode_attention_combined,
    )

    batch, kv_len, page_size = 64, 2048, 32
    num_q_heads, num_kv_heads, head_dim = 32, 8, 128  # llama-3-8B geometry
    dtype = jnp.bfloat16

    pages_per_req = kv_len // page_size
    num_pages = batch * pages_per_req
    rng = np.random.default_rng(0)
    # combined 5-D layout [pages, 2, ps, H, D]: one DMA per page (k+v)
    kv_cache = jnp.asarray(
        rng.standard_normal(
            (num_pages, 2, page_size, num_kv_heads, head_dim)
        ),
        dtype,
    )
    q = jnp.asarray(
        rng.standard_normal((batch, num_q_heads, head_dim)), dtype
    )
    page_table = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(batch, pages_per_req)
    )
    kv_lens = jnp.full((batch,), kv_len, jnp.int32)

    def step(q_cur, kv_cache, page_table, kv_lens):
        o, _ = paged_decode_attention_combined(
            q_cur, kv_cache, page_table, kv_lens
        )
        return o  # output feeds the next query: true dependent chain

    from flashinfer_tpu.testing.utils import bench_loop

    dt = bench_loop(step, q, kv_cache, page_table, kv_lens, iters=32)

    itemsize = jnp.dtype(dtype).itemsize
    kv_bytes = 2 * batch * kv_len * num_kv_heads * head_dim * itemsize
    io_bytes = (
        kv_bytes
        + 2 * batch * num_q_heads * head_dim * itemsize  # q read + o write
    )
    gbs = io_bytes / dt / 1e9
    peak = _peak_bw_gbs()
    print(json.dumps({
        "metric": "paged_decode_attention_bw",
        "value": round(gbs, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbs / peak, 4),
    }))


if __name__ == "__main__":
    main()
