"""Native (C++) host-planner loader: build-on-first-use + ctypes binding.

The TPU analog of the reference's JIT compile/load/cache layer
(flashinfer/jit/core.py:226-370: try_load → FileLock double-check → ninja
build → load): device kernels are XLA/Pallas-compiled so nothing to nvcc,
but the host-side scheduler (csrc/planner.cpp, mirroring the reference's
native scheduler.cuh) is g++-compiled into a shared library cached under
FLASHINFER_TPU_CACHE_DIR, with a file lock for concurrent builders.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

from .env import env

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "planner.cpp"
_lib = None
_tried = False


def _build_and_load() -> ctypes.CDLL | None:
    src_text = _SRC.read_text()
    tag = hashlib.sha256(src_text.encode()).hexdigest()[:16]
    out_dir = env.cache_dir / "native"
    out_dir.mkdir(parents=True, exist_ok=True)
    so_path = out_dir / f"planner_{tag}.so"
    if not so_path.exists():
        lock = out_dir / f"planner_{tag}.lock"
        # double-checked file lock (reference jit/core.py:300-321)
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                if not so_path.exists():
                    tmp = so_path.with_suffix(".so.tmp")
                    subprocess.run(
                        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                         str(_SRC), "-o", str(tmp)],
                        check=True, capture_output=True,
                    )
                    os.replace(tmp, so_path)
            finally:
                os.close(fd)
                os.unlink(lock)
        except FileExistsError:
            import time

            for _ in range(200):  # wait for the other builder
                if so_path.exists():
                    break
                time.sleep(0.05)
    if not so_path.exists():
        return None
    lib = ctypes.CDLL(str(so_path))
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.fi_prefill_plan_sizes.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, i64p,
    ]
    lib.fi_prefill_plan_fill.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
        i64p, i64p, i64p,
        i32p, i32p, i32p, i32p,
        i32p, i32p, i32p, i32p, i32p,
        i64p, u8p, i64p, u8p, i64p, i64p, i64p,
    ]
    lib.fi_build_dense_page_table.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, i32p,
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native planner; None on failure or
    when FLASHINFER_TPU_DISABLE_NATIVE is set."""
    global _lib, _tried
    if env.disable_native:
        return None
    if not _tried:
        _tried = True
        try:
            _lib = _build_and_load()
        except Exception:
            _lib = None
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_prefill_plan(
    qo_indptr: np.ndarray,
    kv_lens: np.ndarray,
    group: int,
    tq_tokens: int,
    row_block: int,
    kv_block: int,
    causal: bool,
    page_size: int = 0,
    page_indptr: np.ndarray | None = None,
    pages: np.ndarray | None = None,
    kv_row_starts: np.ndarray | None = None,
) -> dict | None:
    """Run the C++ planner; returns the plan arrays dict or None when the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    qo = np.ascontiguousarray(qo_indptr, np.int64)
    kl = np.ascontiguousarray(kv_lens, np.int64)
    batch = len(qo) - 1
    sizes = np.zeros(5, np.int64)
    lib.fi_prefill_plan_sizes(
        _ptr(qo, ctypes.c_int64), _ptr(kl, ctypes.c_int64), batch,
        tq_tokens, kv_block, int(causal), _ptr(sizes, ctypes.c_int64),
    )
    num_works, num_items, tq_pad, tkv_pad, total_q = (int(x) for x in sizes)

    out = dict(
        item_w=np.zeros(num_items, np.int32),
        item_c=np.zeros(num_items, np.int32),
        item_first=np.zeros(num_items, np.int32),
        item_last=np.zeros(num_items, np.int32),
        work_q_blk=np.zeros(num_works, np.int32),
        work_kv_blk=np.zeros(num_works, np.int32),
        work_kv_len=np.zeros(num_works, np.int32),
        work_qo_len=np.zeros(num_works, np.int32),
        work_q_pos=np.zeros(num_works, np.int32),
        q_src=np.zeros(tq_pad, np.int64),
        q_valid=np.zeros(tq_pad, np.uint8),
        kv_src=np.zeros(tkv_pad, np.int64),
        kv_valid=np.zeros(tkv_pad, np.uint8),
        out_src=np.zeros(max(total_q, 1), np.int64),
        q_pad_starts=np.zeros(max(batch, 1), np.int64),
        kv_pad_starts=np.zeros(max(batch, 1), np.int64),
    )
    if page_size > 0:
        pi = np.ascontiguousarray(page_indptr, np.int64)
        pg = np.ascontiguousarray(pages, np.int64)
        krs = np.zeros(1, np.int64)
    else:
        pi = np.zeros(1, np.int64)
        pg = np.zeros(1, np.int64)
        krs = np.ascontiguousarray(kv_row_starts, np.int64)
    lib.fi_prefill_plan_fill(
        _ptr(qo, ctypes.c_int64), _ptr(kl, ctypes.c_int64), batch,
        group, tq_tokens, row_block, kv_block, int(causal), page_size,
        _ptr(pi, ctypes.c_int64), _ptr(pg, ctypes.c_int64),
        _ptr(krs, ctypes.c_int64),
        _ptr(out["item_w"], ctypes.c_int32), _ptr(out["item_c"], ctypes.c_int32),
        _ptr(out["item_first"], ctypes.c_int32),
        _ptr(out["item_last"], ctypes.c_int32),
        _ptr(out["work_q_blk"], ctypes.c_int32),
        _ptr(out["work_kv_blk"], ctypes.c_int32),
        _ptr(out["work_kv_len"], ctypes.c_int32),
        _ptr(out["work_qo_len"], ctypes.c_int32),
        _ptr(out["work_q_pos"], ctypes.c_int32),
        _ptr(out["q_src"], ctypes.c_int64), _ptr(out["q_valid"], ctypes.c_uint8),
        _ptr(out["kv_src"], ctypes.c_int64),
        _ptr(out["kv_valid"], ctypes.c_uint8),
        _ptr(out["out_src"], ctypes.c_int64),
        _ptr(out["q_pad_starts"], ctypes.c_int64),
        _ptr(out["kv_pad_starts"], ctypes.c_int64),
    )
    out["sizes"] = dict(num_works=num_works, num_items=num_items,
                        tq_pad=tq_pad, tkv_pad=tkv_pad, total_q=total_q)
    return out
