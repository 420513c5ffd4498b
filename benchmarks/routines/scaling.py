"""Multi-device decode-throughput scaling harness (VERDICT r2 #6).

Measures sharded llama decode tokens/s at dp=1→N (and a tp variant) with
FIXED PER-DEVICE batch (weak scaling), so on real ICI hardware tokens/s
should scale ~linearly with devices; the recorded efficiency column is
the BASELINE.md "≥85% tokens/s scaling" metric. On the virtual CPU mesh
(xla_force_host_platform_device_count) all "devices" share one host's
cores, so efficiencies are NOT meaningful as hardware numbers — the table
proves the sharded program compiles/executes at every scale and the
harness runs unchanged on a real multi-chip slice.

Run standalone (prints one JSON line):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m benchmarks.routines.scaling
Reference analog: multi-rank time aggregation
(flashinfer/testing/utils.py:751) + MoE_benchmarks.md per-scale tables.
"""

from __future__ import annotations

import json
import time


def bench_decode_scaling(
    per_device_batch: int = 8,
    num_layers: int = 2,
    kv_len: int = 128,
    page_size: int = 16,
    steps: int = 8,
    configs: tuple = ((1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4)),
) -> dict:
    """tokens/s of the shard_map decode step per (dp, tp) config."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flashinfer_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_params, make_sharded_decode_fn,
        shard_params,
    )
    from flashinfer_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    cfg = LlamaConfig.tiny(num_layers=num_layers)
    params = init_params(jax.random.key(0), cfg)

    rows = []
    base_tps = None
    for dp, tp in configs:
        if dp * tp > n_dev:
            continue
        mesh = make_mesh(dp=dp, tp=tp)
        batch = per_device_batch * dp
        pages_per = kv_len // page_size + 1
        num_pages = batch * pages_per
        caches = init_kv_cache(cfg, num_pages, page_size)
        step, _in_s, _out_s = make_sharded_decode_fn(cfg, mesh)
        params_s = shard_params(params, cfg, mesh)
        table = jnp.asarray(
            np.arange(num_pages, dtype=np.int32).reshape(batch, pages_per))
        tokens = jnp.zeros((batch,), jnp.int32)
        positions = jnp.full((batch,), kv_len, jnp.int32)
        kv_lens = jnp.full((batch,), kv_len + 1, jnp.int32)

        logits, caches = step(params_s, caches, tokens, positions, table,
                              kv_lens)  # compile + warm
        jax.block_until_ready(logits)
        t0 = time.perf_counter()
        for _ in range(steps):
            logits, caches = step(params_s, caches, tokens, positions,
                                  table, kv_lens)
        jax.block_until_ready(logits)
        dt = (time.perf_counter() - t0) / steps
        tps = batch / dt
        if (dp, tp) == (1, 1):
            base_tps = tps
        eff = (tps / (dp * tp * base_tps)) if base_tps else None
        rows.append({
            "dp": dp, "tp": tp, "batch": batch,
            "ms_per_step": round(dt * 1e3, 3),
            "tokens_per_s": round(tps, 1),
            "scaling_eff": round(eff, 3) if eff is not None else None,
        })
    return {
        "routine": "decode_scaling",
        "config": f"tiny-{num_layers}L pdb{per_device_batch} kv{kv_len}",
        "n_devices": n_dev,
        "virtual_mesh": "TPU" not in str(jax.devices()[0]),
        "rows": rows,
    }


def main() -> None:
    import os

    os.environ.setdefault("FLASHINFER_TPU_NO_PERSISTENT_CACHE", "1")
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    r = bench_decode_scaling()
    r["metric"] = "decode_scaling"
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
