"""Runs tests/test_speculative.py in a FRESH interpreter.

XLA:CPU's JIT segfaults (backend_compile_and_load) compiling the
speculative verify pjit when the compile happens late in a long-lived
process — the exact same tests pass standalone. Until the jaxlib bug is
fixed, the module executes in a subprocess with FI_SPEC_SUBPROC=1 and
this wrapper asserts on its exit status."""

import os
import subprocess
import sys
from pathlib import Path


def test_speculative_module_in_fresh_interpreter():
    target = Path(__file__).parent / "test_speculative.py"
    env = dict(os.environ)
    env["FI_SPEC_SUBPROC"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "pytest", str(target), "-q",
         "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=2400,
        cwd=str(Path(__file__).parent.parent),
    )
    assert r.returncode == 0, (
        f"subprocess speculative tests failed (rc={r.returncode})\n"
        f"stdout tail:\n{r.stdout[-4000:]}\nstderr tail:\n{r.stderr[-2000:]}"
    )
