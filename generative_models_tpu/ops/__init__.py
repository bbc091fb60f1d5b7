"""TPU op layer: every hot op has a Pallas kernel and an XLA twin.

Dispatch contract (SURVEY.md §9.1 stage 6): the XLA twin is always
available and is the correctness reference; the Pallas kernel is used on
TPU backends when enabled via :func:`set_backend` or per-call flags.
"""

from generative_models_tpu.ops.linear import (  # noqa: F401
    fused_linear,
    linear_xla,
    set_backend,
    get_backend,
)
from generative_models_tpu.ops.activations import apply_act, ACTIVATIONS  # noqa: F401
