"""Per-op module registry (TPU analog of the reference JIT-spec registry).

Reference: flashinfer/jit/core.py:144-226 (JitSpecStatus, JitSpecRegistry,
jit_spec_registry) — there, a "module" is an nvcc/cubin build target and
"compiled" means the .so exists. On TPU the unit of compilation is a
traced-and-lowered XLA executable: each op module registers its jitted
entry points here, and "compiled" means the entry has at least one live
executable in its jit cache (first trace done; later identical shapes hit
the in-process cache, and the XLA persistent cache makes retraces cheap
across processes).

Ops self-register at import time via :func:`register`; status is computed
on demand from the jit caches, so there is zero hot-path overhead.
"""

from __future__ import annotations

import dataclasses
from datetime import datetime
from pathlib import Path
from typing import Callable, Dict, List, Optional


@dataclasses.dataclass
class ModuleStatus:
    """Status for one registered op module (reference JitSpecStatus)."""

    name: str
    created_at: datetime
    is_compiled: bool
    num_executables: int
    kind: str  # "pallas-kernel" | "jit-wrapper" | "native"
    library_path: Optional[Path]  # native modules: the loaded .so

    @property
    def status(self) -> str:
        return "Compiled" if self.is_compiled else "Not Compiled"


@dataclasses.dataclass
class _Entry:
    probe: Callable[[], int]  # -> number of live executables
    kind: str
    created_at: datetime
    library_path: Optional[Path]


class ModuleRegistry:
    """Global registry of op modules (reference JitSpecRegistry)."""

    def __init__(self) -> None:
        self._entries: Dict[str, _Entry] = {}

    def register(
        self,
        name: str,
        probe: Callable[[], int] | object,
        *,
        kind: str = "jit-wrapper",
        library_path: Path | str | None = None,
    ) -> None:
        """Register an op module.

        ``probe`` is either a zero-arg callable returning the number of
        live executables, or a jitted function (its ``_cache_size`` is
        used). Re-registration under the same name is a no-op, matching
        the reference registry.
        """
        if name in self._entries:
            return
        if not callable(probe) or hasattr(probe, "_cache_size"):
            fn = probe

            def probe():  # noqa: ANN202
                try:
                    return int(fn._cache_size())
                except Exception:
                    return 0

        self._entries[name] = _Entry(
            probe=probe, kind=kind, created_at=datetime.now(),
            library_path=Path(library_path) if library_path else None,
        )

    def get_all_specs(self) -> Dict[str, _Entry]:
        return self._entries.copy()

    def get_spec_status(self, name: str) -> Optional[ModuleStatus]:
        e = self._entries.get(name)
        if e is None:
            return None
        try:
            n = int(e.probe())
        except Exception:
            n = 0
        return ModuleStatus(
            name=name, created_at=e.created_at, is_compiled=n > 0,
            num_executables=n, kind=e.kind, library_path=e.library_path,
        )

    def get_all_statuses(self) -> List[ModuleStatus]:
        out = []
        for name in sorted(self._entries):
            s = self.get_spec_status(name)
            if s is not None:
                out.append(s)
        return out

    def get_stats(self) -> Dict[str, int]:
        statuses = self.get_all_statuses()
        return {
            "total": len(statuses),
            "compiled": sum(1 for s in statuses if s.is_compiled),
            "not_compiled": sum(1 for s in statuses if not s.is_compiled),
        }


module_registry = ModuleRegistry()


def register(name: str, probe, *, kind: str = "jit-wrapper",
             library_path=None) -> None:
    module_registry.register(name, probe, kind=kind,
                             library_path=library_path)
