"""CLI: python -m flashinfer_tpu <command>.

Capability parity with reference flashinfer/__main__.py:302-711 (click CLI:
collect-env, show-config, clear-cache, module status) mapped to the TPU
runtime: JAX/XLA env collection, compilation+autotuner cache management,
and a micro-benchmark entry.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys


def cmd_show_config(_args) -> int:
    from . import __version__
    from .env import env

    cfg = {
        "version": __version__,
        "loglevel": env.loglevel,
        "logdest": env.logdest,
        "interpret": env.interpret,
        "cache_dir": str(env.cache_dir),
        "trace_dump": env.trace_dump,
        "trace_dir": str(env.trace_dir),
    }
    print(json.dumps(cfg, indent=2))
    return 0


def cmd_collect_env(_args) -> int:
    import platform

    import jax
    import jaxlib

    info = {
        "python": sys.version,
        "platform": platform.platform(),
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
    }
    try:
        import numpy

        info["numpy"] = numpy.__version__
    except ImportError:
        pass
    print(json.dumps(info, indent=2))
    return 0


def cmd_clear_cache(_args) -> int:
    from .env import env

    if env.cache_dir.exists():
        shutil.rmtree(env.cache_dir)
        print(f"cleared {env.cache_dir}")
    else:
        print(f"no cache at {env.cache_dir}")
    return 0


def cmd_module_status(_args) -> int:
    """Per-op module registry + autotuner cache (reference jit/core.py
    jit_spec_registry status + the tunable-tactic cache)."""
    import flashinfer_tpu  # registers the op modules

    from .autotuner import AutoTuner
    from .modules import module_registry

    t = AutoTuner.get()
    t.load_from_file()
    print(json.dumps({
        "stats": module_registry.get_stats(),
        "modules": [
            {"name": s.name, "status": s.status, "kind": s.kind,
             "executables": s.num_executables,
             "library": str(s.library_path) if s.library_path else None}
            for s in module_registry.get_all_statuses()
        ],
        "autotuner_cache_path": str(t.cache_path),
        "autotuner_entries": t.cache,
    }, indent=2))
    return 0


def cmd_bundle_cache(args) -> int:
    from .aot import bundle_cache

    bundle_cache(args.out)
    return 0


def cmd_install_cache(args) -> int:
    from .aot import install_cache

    install_cache(args.bundle, force=args.force)
    return 0


def cmd_bench(_args) -> int:
    import runpy
    from pathlib import Path

    bench = Path(__file__).resolve().parent.parent / "bench.py"
    runpy.run_path(str(bench), run_name="__main__")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="flashinfer_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("show-config").set_defaults(fn=cmd_show_config)
    sub.add_parser("collect-env").set_defaults(fn=cmd_collect_env)
    sub.add_parser("clear-cache").set_defaults(fn=cmd_clear_cache)
    mod = sub.add_parser("module")
    mod.add_argument("action", choices=["status", "list"])
    mod.set_defaults(fn=cmd_module_status)
    sub.add_parser("bench").set_defaults(fn=cmd_bench)
    bc = sub.add_parser(
        "bundle-cache",
        help="pack XLA+autotuner caches into a distributable tarball "
             "(the jit-cache-wheel analog)")
    bc.add_argument("out", nargs="?", default="flashinfer_tpu_cache.tar.gz")
    bc.set_defaults(fn=cmd_bundle_cache)
    ic = sub.add_parser("install-cache",
                        help="unpack a cache bundle on this host")
    ic.add_argument("bundle")
    ic.add_argument("--force", action="store_true")
    ic.set_defaults(fn=cmd_install_cache)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
