"""AOT compilation-cache warming.

Capability parity with reference flashinfer/aot.py:1106 (enumerate all
JitSpecs × (dtypes, head dims, archs) and pre-build the jit-cache wheel):
on TPU the compiled-artifact store is XLA's persistent compilation cache,
so "AOT" = enabling the cache directory and tracing/compiling the standard
kernel configurations once. Subsequent processes load compiled
executables from disk instead of recompiling (the jit-cache-wheel analog).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .env import env


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point XLA's persistent compilation cache at the flashinfer-tpu
    cache dir (reference: jit-cache wheel, flashinfer-jit-cache/)."""
    path = str(cache_dir or (env.cache_dir / "xla_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


@dataclass
class AotConfig:
    """One decode/prefill kernel configuration to pre-compile
    (reference aot.py:36-100 module lists)."""

    batch_sizes: Sequence[int] = (8, 32, 64)
    page_sizes: Sequence[int] = (16, 32)
    max_pages: Sequence[int] = (16, 64)
    head_configs: Sequence[tuple[int, int, int]] = (
        (32, 8, 128),  # llama-3 8B
        (32, 4, 128),
        (64, 8, 128),  # llama-3 70B
    )
    dtypes: Sequence = (jnp.bfloat16,)


def gen_decode_configs(cfg: AotConfig):
    for b, ps, mp, (hq, hkv, d), dt in itertools.product(
        cfg.batch_sizes, cfg.page_sizes, cfg.max_pages, cfg.head_configs,
        cfg.dtypes,
    ):
        yield dict(batch=b, page_size=ps, max_pages=mp, num_qo_heads=hq,
                   num_kv_heads=hkv, head_dim=d, dtype=dt)


def warm_decode(configs=None, *, verbose: bool = True) -> int:
    """Compile the paged-decode kernel for every config; returns count."""
    from .ops.attention.pallas_decode import paged_decode_attention

    n = 0
    for c in configs or gen_decode_configs(AotConfig()):
        num_pages = max(c["batch"], c["max_pages"])
        k = jnp.zeros(
            (num_pages, c["page_size"], c["num_kv_heads"], c["head_dim"]),
            c["dtype"],
        )
        q = jnp.zeros((c["batch"], c["num_qo_heads"], c["head_dim"]),
                      c["dtype"])
        pt = jnp.zeros((c["batch"], c["max_pages"]), jnp.int32)
        kl = jnp.ones((c["batch"],), jnp.int32)
        out, _ = paged_decode_attention(q, k, k, pt, kl)
        jax.block_until_ready(out)
        n += 1
        if verbose:
            print(f"[aot] decode {c}")
    return n


def main(argv=None) -> int:  # CLI hook (reference aot.py main)
    enable_persistent_cache()
    n = warm_decode()
    print(f"[aot] warmed {n} decode configs into "
          f"{jax.config.jax_compilation_cache_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
