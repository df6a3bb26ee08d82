"""Utilities: checkpointing (orbax/safetensors) and profiling harnesses."""

from .checkpoint import (  # noqa: F401
    export_safetensors,
    import_safetensors,
    load_checkpoint,
    save_checkpoint,
)
from .profiling import StepTimer, benchmark_throughput, trace  # noqa: F401
