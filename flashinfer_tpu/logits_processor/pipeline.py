"""LogitsPipe: validate → legalize → fuse → run (reference
flashinfer/logits_processor/{pipeline,compiler,fusion_rules,legalization}.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import jax

from ..ops import sampling as S
from .processors import (
    LogitsProcessor, MinP, Sample, Softmax, Temperature, TensorType, TopK,
    TopP,
)


@dataclass(frozen=True)
class FusionRule:
    """Replace a matching window of processors with one fused stage
    (reference fusion_rules.py)."""

    pattern: tuple[type, ...]
    name: str
    build: Callable[..., "._Stage"]  # noqa: F821


@dataclass
class _Stage:
    name: str
    in_type: TensorType
    out_type: TensorType
    fn: Callable  # fn(x, **kw) -> x


def _fuse_topk_topp_sample(tk: TopK, tp: TopP, s: Sample, in_type):
    def fn(x, *, top_k, top_p, key=None, **kw):
        return S.top_k_top_p_sampling_from_probs(x, top_k, top_p, key=key)
    return _Stage("FusedTopKTopPSample", TensorType.PROBS,
                  TensorType.INDICES, fn)


def _fuse_softmax_sample(sm: Softmax, s: Sample, in_type):
    def fn(x, *, key=None, **kw):
        return S.sampling_from_logits(x, key=key)
    return _Stage("FusedSoftmaxSample", TensorType.LOGITS,
                  TensorType.INDICES, fn)


DEFAULT_FUSION_RULES = (
    FusionRule((TopK, TopP, Sample), "topk_topp_sample",
               _fuse_topk_topp_sample),
    FusionRule((Softmax, Sample), "softmax_sample", _fuse_softmax_sample),
)


class LogitsPipe:
    """Declarative logits pipeline (reference pipeline.py:33).

    >>> pipe = LogitsPipe([Temperature(), Softmax(), TopK(), TopP(), Sample()])
    >>> ids = pipe(logits, temperature=0.9, top_k=40, top_p=0.95,
    ...            key=jax.random.key(0))
    """

    def __init__(
        self,
        processors: Sequence[LogitsProcessor],
        compile: bool = True,  # noqa: A002
        input_type: TensorType | None = None,
        custom_fusion_rules: Sequence[FusionRule] | None = None,
        custom_validity_checks=None,
    ) -> None:
        if not processors:
            raise ValueError("pipeline needs at least one processor")
        self.processors = list(processors)
        self._rules = tuple(custom_fusion_rules or ()) + DEFAULT_FUSION_RULES
        self.input_type = input_type or (
            TensorType.LOGITS
            if TensorType.LOGITS in processors[0].IN
            else processors[0].IN[0]
        )
        self._stages = self._legalize(self.input_type)
        if compile:
            self.compile()

    # -- legalization (reference legalization.py) ---------------------------
    def _legalize(self, in_type: TensorType) -> list[_Stage]:
        stages: list[_Stage] = []
        t = in_type
        for p in self.processors:
            if t not in p.IN:
                if (t == TensorType.LOGITS
                        and TensorType.PROBS in p.IN):
                    raise ValueError(
                        f"{p!r} expects PROBS but receives LOGITS — insert "
                        "Softmax() before it"
                    )
                raise ValueError(f"{p!r} cannot accept {t}")
            out = p.out_type(t)
            in_t = t

            def fn(x, _p=p, _t=in_t, **kw):
                return _p.apply(x, _t, **kw)

            stages.append(_Stage(repr(p), in_t, out, fn))
            t = out
        return stages

    # -- fusion (reference compiler.py / fusion_rules.py) --------------------
    def compile(self) -> "LogitsPipe":
        procs = self.processors
        stages: list[_Stage] = []
        i = 0
        t = self.input_type
        while i < len(procs):
            fused = None
            for rule in self._rules:
                n = len(rule.pattern)
                window = procs[i:i + n]
                if len(window) == n and all(
                    type(p) is c for p, c in zip(window, rule.pattern)
                ):
                    if t in window[0].IN:
                        fused = rule.build(*window, t)
                        break
            if fused is not None:
                stages.append(fused)
                t = fused.out_type
                i += len(rule.pattern)
            else:
                p = procs[i]
                if t not in p.IN:
                    raise ValueError(f"{p!r} cannot accept {t}")
                in_t = t
                out = p.out_type(t)

                def fn(x, _p=p, _t=in_t, **kw):
                    return _p.apply(x, _t, **kw)

                stages.append(_Stage(repr(p), in_t, out, fn))
                t = out
                i += 1
        self._stages = stages
        return self

    @property
    def stage_names(self) -> list[str]:
        return [s.name for s in self._stages]

    def __call__(self, x: jax.Array, **kw) -> jax.Array:
        for s in self._stages:
            x = s.fn(x, **kw)
        return x
