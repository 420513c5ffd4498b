"""fi_trace template library: per-op definition schemas.

Capability parity with reference flashinfer/trace/template.py (+
templates/ directory): a :class:`TraceTemplate` describes one op's
schema — named axes, tensor dim-names, scalar params — independently of
the Python function. Axis extraction is automatic from the tensor
dim-names at call time (reference template.py:30-43 design), so a dumped
definition carries semantic sizes ("num_tokens": 4096) instead of bare
shape tuples, and a solution JSON can be matched back onto the API via
:func:`load_solutions` → trace_apply (round-trip).

TPU notes: templates are pure metadata — no torch/jax dependency in the
schema itself; values are read from whatever array-likes the call passes
(jax arrays, numpy, tracers — tracers contribute shapes only).
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from .env import env

_lock = threading.Lock()
_counter = 0


@dataclass(frozen=True)
class Var:
    """Axis that varies call-to-call (e.g. num_tokens)."""


@dataclass(frozen=True)
class Const:
    """Axis fixed for a deployment (e.g. head_dim)."""


@dataclass(frozen=True)
class Tensor:
    """Tensor input/output: dims name the template axes positionally.

    A dim name of ``None`` is an unconstrained (ignored) axis.
    """

    dims: tuple
    dtype: str | None = None

    def __init__(self, dims, dtype=None):
        object.__setattr__(self, "dims", tuple(dims))
        object.__setattr__(self, "dtype", dtype)


@dataclass(frozen=True)
class Scalar:
    dtype: str = "float32"


@dataclass
class TraceTemplate:
    """Schema for one op (reference trace/template.py:486).

    ``axes`` maps axis name → Var()/Const(); ``inputs``/``outputs`` map
    argument name → Tensor/Scalar. Inputs are matched to the call's
    positional+keyword arguments by name (in declaration order for
    positionals).
    """

    op_type: str
    axes: dict = field(default_factory=dict)
    inputs: dict = field(default_factory=dict)
    outputs: dict = field(default_factory=dict)

    def extract_axes(self, args: tuple, kwargs: dict) -> dict:
        """Resolve every axis from the first tensor dim that names it."""
        bound = self._bind(args, kwargs)
        resolved: dict[str, int] = {}
        for name, spec in self.inputs.items():
            if not isinstance(spec, Tensor):
                continue
            val = bound.get(name)
            shape = getattr(val, "shape", None)
            if shape is None or len(shape) != len(spec.dims):
                continue
            for dim_name, size in zip(spec.dims, shape):
                if dim_name and dim_name not in resolved:
                    resolved[dim_name] = int(size)
        return resolved

    def _bind(self, args: tuple, kwargs: dict) -> dict:
        names = list(self.inputs.keys())
        bound = dict(zip(names, args))
        bound.update({k: v for k, v in kwargs.items() if k in self.inputs})
        return bound

    def to_definition(self, qualname: str, args: tuple, kwargs: dict
                      ) -> dict:
        bound = self._bind(args, kwargs)
        axes = self.extract_axes(args, kwargs)

        def describe(name, spec):
            if isinstance(spec, Tensor):
                val = bound.get(name)
                d = {"kind": "tensor", "dims": list(spec.dims)}
                if getattr(val, "shape", None) is not None:
                    d["shape"] = [int(s) for s in val.shape]
                    d["dtype"] = str(getattr(val, "dtype", spec.dtype))
                elif spec.dtype:
                    d["dtype"] = spec.dtype
                return d
            val = bound.get(name)
            d = {"kind": "scalar", "dtype": spec.dtype}
            if isinstance(val, (int, float, bool)):
                d["value"] = val
            return d

        return {
            "op_type": self.op_type,
            "api": qualname,
            "axes": {
                k: {"role": type(v).__name__.lower(),
                    **({"size": axes[k]} if k in axes else {})}
                for k, v in self.axes.items()
            },
            "inputs": {k: describe(k, v) for k, v in self.inputs.items()},
            "outputs": {
                k: ({"kind": "tensor", "dims": list(v.dims),
                     **({"dtype": v.dtype} if v.dtype else {})}
                    if isinstance(v, Tensor)
                    else {"kind": "scalar", "dtype": v.dtype})
                for k, v in self.outputs.items()
            },
        }

    def dump(self, qualname: str, args: tuple, kwargs: dict) -> None:
        """Write one definition JSON into FLASHINFER_TPU_TRACE_DIR."""
        global _counter
        with _lock:
            idx = _counter
            _counter += 1
        definition = self.to_definition(qualname, args, kwargs)
        definition["index"] = idx
        try:
            env.trace_dir.mkdir(parents=True, exist_ok=True)
            path = env.trace_dir / (
                f"{idx:06d}_{self.op_type}.json")
            path.write_text(json.dumps(definition, indent=1, default=str))
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Flagship-op templates (reference flashinfer/trace/templates/*.py)
# ---------------------------------------------------------------------------

DECODE_TRACE = TraceTemplate(
    op_type="batch_decode_paged",
    axes={"batch": Var(), "num_qo_heads": Const(), "head_dim": Const(),
          "pages": Var(), "page_size": Const(), "num_kv_heads": Const()},
    inputs={
        "q": Tensor(["batch", "num_qo_heads", "head_dim"]),
        "kv_cache": Tensor(["pages", None, "page_size", "num_kv_heads",
                            "head_dim"]),
    },
    outputs={"out": Tensor(["batch", "num_qo_heads", "head_dim"])},
)

PREFILL_TRACE = TraceTemplate(
    op_type="batch_prefill",
    axes={"total_q": Var(), "num_qo_heads": Const(), "head_dim": Const(),
          "total_kv": Var(), "num_kv_heads": Const()},
    inputs={
        "q": Tensor(["total_q", "num_qo_heads", "head_dim"]),
        "k": Tensor(["total_kv", "num_kv_heads", "head_dim"]),
        "v": Tensor(["total_kv", "num_kv_heads", "head_dim"]),
    },
    outputs={"out": Tensor(["total_q", "num_qo_heads", "head_dim"])},
)

MLA_DECODE_TRACE = TraceTemplate(
    op_type="batch_mla_paged",
    axes={"batch": Var(), "num_heads": Const(), "head_dim_ckv": Const(),
          "head_dim_kpe": Const(), "pages": Var(), "page_size": Const()},
    inputs={
        "q_nope": Tensor(["batch", "num_heads", "head_dim_ckv"]),
        "q_pe": Tensor(["batch", "num_heads", "head_dim_kpe"]),
        "ckv_cache": Tensor(["pages", "page_size", "head_dim_ckv"]),
        "kpe_cache": Tensor(["pages", "page_size", "head_dim_kpe"]),
    },
    outputs={"out": Tensor(["batch", "num_heads", "head_dim_ckv"])},
)

SAMPLING_TRACE = TraceTemplate(
    op_type="top_k_top_p_sampling",
    axes={"batch": Var(), "vocab": Const()},
    inputs={
        "logits": Tensor(["batch", "vocab"]),
        "top_k": Scalar("int32"),
        "top_p": Scalar("float32"),
    },
    outputs={"samples": Tensor(["batch"], "int32")},
)

MOE_TRACE = TraceTemplate(
    op_type="fused_moe",
    axes={"num_tokens": Var(), "hidden": Const(), "num_experts": Const(),
          "intermediate2": Const(), "top_k": Const()},
    inputs={
        "hidden_states": Tensor(["num_tokens", "hidden"]),
        "w13": Tensor(["num_experts", "hidden", "intermediate2"]),
        "w2": Tensor(["num_experts", None, "hidden"]),
        "topk_ids": Tensor(["num_tokens", "top_k"], "int32"),
        "topk_weights": Tensor(["num_tokens", "top_k"]),
    },
    outputs={"out": Tensor(["num_tokens", "hidden"])},
)

GEMM_TRACE = TraceTemplate(
    op_type="mm",
    axes={"m": Var(), "k": Const(), "n": Const()},
    inputs={"a": Tensor(["m", "k"]), "b": Tensor(["k", "n"])},
    outputs={"out": Tensor(["m", "n"])},
)

RMSNORM_TRACE = TraceTemplate(
    op_type="rmsnorm",
    axes={"num_tokens": Var(), "hidden_size": Const()},
    inputs={
        "input": Tensor(["num_tokens", "hidden_size"]),
        "weight": Tensor(["hidden_size"]),
        "eps": Scalar("float32"),
    },
    outputs={"output": Tensor(["num_tokens", "hidden_size"])},
)

ROPE_TRACE = TraceTemplate(
    op_type="apply_rope",
    axes={"num_tokens": Var(), "num_heads": Const(), "head_dim": Const()},
    inputs={
        "q": Tensor(["num_tokens", "num_heads", "head_dim"]),
        "k": Tensor(["num_tokens", None, "head_dim"]),
    },
    outputs={
        "q_rope": Tensor(["num_tokens", "num_heads", "head_dim"]),
        "k_rope": Tensor(["num_tokens", None, "head_dim"]),
    },
)

TEMPLATES: dict[str, TraceTemplate] = {
    t.op_type: t
    for t in (DECODE_TRACE, PREFILL_TRACE, MLA_DECODE_TRACE,
              SAMPLING_TRACE, MOE_TRACE, GEMM_TRACE, RMSNORM_TRACE,
              ROPE_TRACE)
}


def load_solutions(trace_dir: str | Path,
                   solutions: dict[str, Callable]) -> int:
    """Round-trip: read dumped definition JSONs from ``trace_dir`` and
    install ``solutions`` (op_type → callable) for exactly the APIs that
    appear in the trace (reference trace_apply flow: definitions name the
    op, solutions attach to it). Returns the number of APIs wired."""
    from . import trace_apply

    mapping: dict[str, Callable] = {}
    for p in sorted(Path(trace_dir).glob("*.json")):
        try:
            d = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        op, api = d.get("op_type"), d.get("api")
        if op in solutions and api:
            mapping[api] = solutions[op]
    if mapping:
        trace_apply.enable_apply(mapping)
    return len(mapping)
