"""Test config: run on CPU with 8 virtual devices; Pallas kernels run in
interpreter mode (auto-resolved by flashinfer_tpu.env.resolve_interpret).

Mirrors the reference's test strategy (SURVEY §4): parametrized unit tests
vs pure-jnp references; interpreter-mode Pallas replaces the "fake backend"
so CI needs no TPUs. On a real TPU host, set FLASHINFER_TPU_TEST_TPU=1 to
test compiled kernels on-device.
"""

import os

_ON_TPU = bool(os.environ.get("FLASHINFER_TPU_TEST_TPU"))

if not _ON_TPU:
    # XLA:CPU's AOT executable serialization is unreliable on this
    # machine class (observed: deterministic SIGSEGV inside
    # compilation_cache put_executable_and_time while persisting one
    # softmax executable, and feature-mismatch warnings loading entries
    # built on other pool hosts). The persistent cache only pays off for
    # TPU kernel compiles — keep it off under the CPU test run.
    os.environ["FLASHINFER_TPU_NO_PERSISTENT_CACHE"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _ON_TPU:
    # The axon sitecustomize (real-TPU tunnel) calls
    # jax.config.update("jax_platforms", "axon,cpu") at interpreter boot,
    # overriding the env var — force it back to CPU for tests.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """XLA:CPU's JIT segfaults (backend_compile_and_load) sporadically
    once a long-lived process has accumulated enough compiled programs —
    observed at different tests on every full-suite run, never when the
    same module runs alone. Dropping the executable caches between
    modules keeps the live-program count bounded."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
