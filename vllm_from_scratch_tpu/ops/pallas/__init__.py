"""Pallas TPU kernels for the hot ops.

These override the pure-XLA reference path (ops/attention.py,
ops/mla_attention.py) on TPU.  Dispatch contract:

- ``use_pallas()`` — True on the TPU backend, or when VFS_PALLAS=1
  (interpret mode, for CPU tests); False when VFS_PALLAS=0.
- Kernels accept ``interpret=None`` and resolve it to
  ``jax.default_backend() != "tpu"`` so the same call sites work in CPU
  tests (Pallas interpreter) and on real chips (Mosaic).

Each kernel streams KV pages HBM->VMEM through the Pallas pipeline (the
block-table gather happens in the BlockSpec index_map via scalar prefetch,
so pages are double-buffered automatically) and keeps a flash-attention
online-softmax accumulator in VMEM scratch — one pass over the KV cache,
INT8 dequantization fused into the score/PV matmuls.
"""

from __future__ import annotations

import os

import jax


#: Below this padded context length (tokens) the XLA gather path wins —
#: the kernels' page-pipeline overhead only amortizes on longer contexts
#: (measured crossover on v5e, see benchmarks/bench_kernels.py).
PALLAS_MIN_CTX = int(os.environ.get("VFS_PALLAS_MIN_CTX", "1024"))


def use_pallas(padded_ctx: int | None = None) -> bool:
    flag = os.environ.get("VFS_PALLAS")
    if flag == "1":
        return True
    if flag == "0":
        return False
    if padded_ctx is not None and padded_ctx < PALLAS_MIN_CTX:
        return False
    return jax.default_backend() == "tpu"


def resolve_interpret(interpret) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


from .paged_attention import paged_attention_pallas  # noqa: E402
from .mla_attention import mla_paged_attention_pallas  # noqa: E402

__all__ = [
    "use_pallas",
    "resolve_interpret",
    "paged_attention_pallas",
    "mla_paged_attention_pallas",
]
