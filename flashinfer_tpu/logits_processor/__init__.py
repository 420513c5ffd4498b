"""Declarative logits-processing pipeline.

Capability parity with reference flashinfer/logits_processor/
(LogitsPipe pipeline.py, processors.py:24-370, fusion_rules.py,
legalization.py): build `LogitsPipe([Temperature(), Softmax(), TopK(),
Sample()])`, validate the LOGITS/PROBS type flow, fuse adjacent
processors, and run the result as one jitted function.
"""

from .processors import (  # noqa: F401
    LogitsProcessor,
    MinP,
    Sample,
    Softmax,
    Temperature,
    TensorType,
    TopK,
    TopP,
)
from .pipeline import LogitsPipe  # noqa: F401
