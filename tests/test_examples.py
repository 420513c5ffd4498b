"""Smoke-run every shipped example under FORCE_CPU=1.

Advisor r2 found two examples that crashed as shipped; the README
advertises them as runnable, so CI runs them all (reference analog:
examples are exercised by docs CI)."""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path):
    env = dict(os.environ)
    env.update(
        FORCE_CPU="1",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(env.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8").strip(),
        FLASHINFER_TPU_NO_PERSISTENT_CACHE="1",
    )
    proc = subprocess.run(
        [sys.executable, str(path)], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"{path.name} failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
