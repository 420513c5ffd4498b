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


def _host_fingerprint() -> str:
    """Identity of the host CPU's ISA extensions. XLA:CPU persists
    AOT-compiled executables specialized to the build host's features and
    SEGFAULTS loading them on a host without those features (observed:
    avx512-built cache entries on a pool machine without avx512) — scope
    the cache directory by this fingerprint so a cache is only ever read
    on a compatible host."""
    import hashlib

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        import platform

        flags = platform.machine() + platform.processor()
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point XLA's persistent compilation cache at the flashinfer-tpu
    cache dir (reference: jit-cache wheel, flashinfer-jit-cache/)."""
    path = str(cache_dir
               or (env.cache_dir / f"xla_cache-{_host_fingerprint()}"))
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

# ---------------------------------------------------------------------------
# Compiled-artifact distribution (the jit-cache-wheel analog)
# ---------------------------------------------------------------------------
# The reference ships prebuilt kernels as the flashinfer-jit-cache /
# flashinfer-cubin wheels (reference aot.py:1106, build scripts in
# scripts/). On TPU the deployable artifact is the XLA persistent
# compilation cache + the autotuner tactic cache: bundle them into one
# tarball on a build host, install on serving hosts, and first-request
# compile time drops to cache-load time. The manifest pins the toolchain
# (XLA serialized executables are jaxlib/libtpu/topology specific).


def _cache_manifest() -> dict:
    import importlib.metadata as md

    from .version import __version__

    def _ver(pkg):
        try:
            return md.version(pkg)
        except Exception:
            return None

    try:
        kinds = sorted({d.device_kind for d in jax.devices()})
    except Exception:
        kinds = []
    return {
        "flashinfer_tpu": __version__,
        "jax": jax.__version__,
        "jaxlib": _ver("jaxlib"),
        "libtpu": _ver("libtpu"),
        "device_kinds": kinds,
        "host_fingerprint": _host_fingerprint(),
    }


def bundle_cache(out_path: str, *, verbose: bool = True) -> str:
    """Pack the XLA persistent cache + autotuner cache into ``out_path``
    (.tar.gz) with a compatibility manifest. Returns the written path."""
    import json
    import tarfile

    root = env.cache_dir
    root.mkdir(parents=True, exist_ok=True)
    manifest = root / "MANIFEST.json"
    manifest.write_text(json.dumps(_cache_manifest(), indent=2))
    with tarfile.open(out_path, "w:gz") as tar:
        for p in sorted(root.rglob("*")):
            tar.add(p, arcname=str(p.relative_to(root)))
    if verbose:
        n = sum(1 for _ in root.rglob("*"))
        print(f"[aot] bundled {n} cache entries -> {out_path}")
    return out_path


def install_cache(bundle_path: str, *, force: bool = False,
                  verbose: bool = True) -> str:
    """Unpack a cache bundle into this host's cache dir. Refuses on a
    jax/jaxlib/libtpu mismatch unless ``force`` (stale executables are
    ignored by XLA, but a mismatched autotuner cache silently picks the
    wrong tactics)."""
    import json
    import tarfile

    root = env.cache_dir
    root.mkdir(parents=True, exist_ok=True)
    with tarfile.open(bundle_path, "r:gz") as tar:
        names = tar.getnames()
        if "MANIFEST.json" in names:
            theirs = json.loads(
                tar.extractfile("MANIFEST.json").read().decode())
            ours = _cache_manifest()
            for key in ("jax", "jaxlib", "libtpu"):
                if theirs.get(key) and ours.get(key) \
                        and theirs[key] != ours[key]:
                    msg = (f"cache bundle {key} {theirs[key]} != host "
                           f"{ours[key]}")
                    if not force:
                        raise RuntimeError(msg + " (pass force=True)")
                    if verbose:
                        print(f"[aot] WARNING: {msg}")
        tar.extractall(root, filter="data")
    if verbose:
        print(f"[aot] installed {len(names)} entries into {root}")
    return str(root)
