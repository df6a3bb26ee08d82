"""Checkpoint save/load: orbax for native round-trips, safetensors for
interchange.

New scope vs the reference (SURVEY.md §5: the reference has no save/load —
models are random-weight, mini_vllm.py:536-542); a production TPU engine
needs real weight loading into sharded jax.Arrays.  Design:

- **orbax** (``save_checkpoint`` / ``load_checkpoint``): the param pytree is
  saved as-is (works for sharded arrays on a mesh — orbax records and
  restores shardings), next to a ``config.json`` holding the full
  EngineConfig tree so a checkpoint is self-describing.
- **safetensors** (``export_safetensors`` / ``import_safetensors``): flat
  dotted-name tensors for interchange with torch/HF tooling.  Pytree paths
  map to names like ``layers.wq`` / ``layers.moe.shared.0``.
- ``LLMEngine.save(dir)`` / ``LLMEngine.from_checkpoint(dir)`` wire it into
  the engine; restoring onto a mesh re-applies the GSPMD shardings from
  parallel config (weights land sharded, never replicated through host RAM
  more than once).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..core.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    QuantConfig,
    SchedulerConfig,
    SpecConfig,
)

# ------------------------------------------------------------------ config io


def config_to_dict(cfg: EngineConfig) -> dict:
    d = dataclasses.asdict(cfg)
    return d


def config_from_dict(d: dict) -> EngineConfig:
    spec = d.get("spec")
    return EngineConfig(
        model=ModelConfig(**d["model"]),
        cache=CacheConfig(**d["cache"]),
        scheduler=SchedulerConfig(**d["scheduler"]),
        parallel=ParallelConfig(**d["parallel"]),
        quant=QuantConfig(**d.get("quant", {})),
        spec=(
            SpecConfig(
                draft=ModelConfig(**spec["draft"]),
                num_draft_tokens=spec["num_draft_tokens"],
            )
            if spec
            else None
        ),
        seed=d.get("seed", 0),
    )


# ------------------------------------------------------------------- orbax io


def save_checkpoint(path: str, params, config: Optional[EngineConfig] = None) -> None:
    """Save a param pytree (and optionally the engine config) under ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config_to_dict(config), f, indent=2)


def load_checkpoint(
    path: str, target=None
) -> Tuple[dict, Optional[EngineConfig]]:
    """Load (params, config).  ``target`` (an abstract or concrete pytree,
    e.g. from ``jax.eval_shape`` with shardings) controls placement; without
    it arrays restore to the default device."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"), target)
    cfg = None
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = config_from_dict(json.load(f))
    return params, cfg


# ------------------------------------------------------------- safetensors io


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        flat[name] = np.asarray(leaf)
    return flat


def export_safetensors(file: str, params) -> None:
    """Write the param pytree as flat dotted-name tensors."""
    from safetensors.numpy import save_file

    save_file(_flatten(params), file)


def import_safetensors(file: str, like) -> dict:
    """Read tensors back into the structure of ``like`` (a template pytree,
    e.g. from ``transformer.init_params`` or ``jax.eval_shape``)."""
    from safetensors.numpy import load_file

    flat = load_file(file)
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, leaf in paths:
        name = ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        if name not in flat:
            raise KeyError(f"checkpoint missing tensor {name!r}")
        arr = flat[name]
        want = tuple(leaf.shape)
        if tuple(arr.shape) != want:
            raise ValueError(f"{name}: shape {arr.shape} != expected {want}")
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves
    )
