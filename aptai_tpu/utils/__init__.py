"""Utilities: structured run logging, profiling hooks, tree helpers."""

from aptai_tpu.utils.logging import RunLogger, init_logger
from aptai_tpu.utils.plotting import plot_f0_wav
from aptai_tpu.utils.profiling import StepTimer, trace_profile
from aptai_tpu.utils.trees import param_count, tree_bytes

__all__ = [
    "RunLogger",
    "init_logger",
    "plot_f0_wav",
    "StepTimer",
    "trace_profile",
    "param_count",
    "tree_bytes",
]
