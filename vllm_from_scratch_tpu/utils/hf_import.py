"""Import a HuggingFace Llama-family safetensors checkpoint into the engine.

The reference never loads real weights (its engine generates from random
init forever, ref: 05_mini_vllm/mini_vllm.py:536-542); production serving
starts from a released checkpoint.  This module maps the HF Llama layout —
the de-facto interchange format for dense decoder LMs — onto this repo's
layer-stacked param tree:

    model.embed_tokens.weight          [V, H]      -> embed            [V, H]
    model.layers.i.input_layernorm     [H]         -> layers.attn_norm [L, H]
    model.layers.i.self_attn.q_proj    [Hq*D, H]   -> layers.wq        [L, H, Hq*D]
    model.layers.i.self_attn.{k,v}_proj[Hkv*D, H]  -> layers.wkv       [L, H, 2*Hkv*D]
    model.layers.i.self_attn.o_proj    [H, Hq*D]   -> layers.wo        [L, Hq*D, H]
    model.layers.i.post_attention_layernorm        -> layers.ffn_norm  [L, H]
    model.layers.i.mlp.{gate,up}_proj  [F, H]      -> layers.w_gate/up [L, H, F]
    model.layers.i.mlp.down_proj       [H, F]      -> layers.w_down    [L, F, H]
    model.norm.weight                  [H]         -> final_norm       [H]
    lm_head.weight                     [V, H]      -> lm_head          [H, V]
                                       (tied embeddings: embed.T)

torch stores Linear weights [out, in]; this repo's ``mm`` computes x @ W
with W [in, out], so every projection transposes on import.  The math is
identical by construction: pre-norm RMSNorm (fp32 accumulate), half-rotate
RoPE over the full head dim, GQA with scale D**-0.5, bias-free SwiGLU —
see models/transformer._attn and ops/rotary.apply_rope.

Use:
    cfg_kwargs = model_config_kwargs_from_hf(json.load(open(cfgpath)))
    cfg = ModelConfig(**cfg_kwargs)
    params = params_from_hf_llama(load_file(stpath), cfg)
or the one-call ``load_hf_checkpoint(dir)``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from ..core.config import ModelConfig

__all__ = [
    "model_config_kwargs_from_hf",
    "params_from_hf_llama",
    "load_hf_checkpoint",
]


def model_config_kwargs_from_hf(hf: dict) -> dict:
    """Translate a HF ``config.json`` dict into ModelConfig kwargs."""
    archs = hf.get("architectures") or ["LlamaForCausalLM"]
    if not any("Llama" in a or "Mistral" in a or "Qwen2" in a for a in archs):
        raise ValueError(f"unsupported architecture {archs!r} "
                         "(Llama-family dense decoders only)")
    if hf.get("attention_bias") or hf.get("mlp_bias"):
        raise ValueError("bias-carrying Llama variants are not supported")
    H = hf["hidden_size"]
    heads = hf["num_attention_heads"]
    if hf.get("head_dim") not in (None, H // heads):
        raise ValueError("explicit head_dim != hidden_size/num_heads")
    return dict(
        vocab_size=hf["vocab_size"],
        hidden_size=H,
        num_layers=hf["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=hf.get("num_key_value_heads", heads),
        intermediate_size=hf["intermediate_size"],
        max_position=hf.get("max_position_embeddings", 2048),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rms_norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
        dtype={"float32": "float32", "bfloat16": "bfloat16",
               "float16": "bfloat16"}.get(hf.get("torch_dtype", "float32"),
                                          "float32"),
    )


def params_from_hf_llama(tensors: Dict[str, np.ndarray],
                         cfg: ModelConfig) -> dict:
    """Build this repo's param tree from flat HF-named numpy tensors."""
    import jax.numpy as jnp

    from ..ops.rotary import make_rope_table

    dt = jnp.dtype(cfg.dtype)
    L = cfg.num_layers

    def t(name: str) -> np.ndarray:
        if name not in tensors:
            raise KeyError(f"checkpoint missing tensor {name!r}")
        return np.asarray(tensors[name], dtype=np.float32)

    def stack(fmt: str, transform) -> "jnp.ndarray":
        return jnp.stack(
            [jnp.asarray(transform(i), dt) for i in range(L)], axis=0)

    def wq(i):
        return t(f"model.layers.{i}.self_attn.q_proj.weight").T

    def wkv(i):
        k = t(f"model.layers.{i}.self_attn.k_proj.weight").T  # [H, Hkv*D]
        v = t(f"model.layers.{i}.self_attn.v_proj.weight").T
        return np.concatenate([k, v], axis=-1)                # [H, 2*Hkv*D]

    layers = {
        "attn_norm": stack("", lambda i: t(
            f"model.layers.{i}.input_layernorm.weight")),
        "wq": stack("", wq),
        "wkv": stack("", wkv),
        "wo": stack("", lambda i: t(
            f"model.layers.{i}.self_attn.o_proj.weight").T),
        "ffn_norm": stack("", lambda i: t(
            f"model.layers.{i}.post_attention_layernorm.weight")),
        "w_gate": stack("", lambda i: t(
            f"model.layers.{i}.mlp.gate_proj.weight").T),
        "w_up": stack("", lambda i: t(
            f"model.layers.{i}.mlp.up_proj.weight").T),
        "w_down": stack("", lambda i: t(
            f"model.layers.{i}.mlp.down_proj.weight").T),
    }

    embed = t("model.embed_tokens.weight")                    # [V, H]
    if "lm_head.weight" in tensors:
        lm_head = t("lm_head.weight").T                       # [H, V]
    else:  # tie_word_embeddings
        lm_head = embed.T

    import jax
    return {
        "embed": jnp.asarray(embed, dt),
        "layers": layers,
        "final_norm": jnp.asarray(t("model.norm.weight"), dt),
        "lm_head": jnp.asarray(lm_head, dt),
        "rope": make_rope_table(cfg.max_position, cfg.head_dim,
                                cfg.rope_theta),
    }


def load_hf_checkpoint(path: str) -> Tuple[dict, dict]:
    """(ModelConfig kwargs, params) from a HF checkpoint directory
    (``config.json`` + ``model.safetensors``, the save_pretrained layout)."""
    from safetensors.numpy import load_file

    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    kwargs = model_config_kwargs_from_hf(hf_cfg)
    st = os.path.join(path, "model.safetensors")
    if not os.path.exists(st):
        raise FileNotFoundError(
            f"{st} not found (sharded checkpoints: merge or point at a "
            "single-file export)")
    tensors = load_file(st)
    cfg = ModelConfig(**kwargs)
    return kwargs, params_from_hf_llama(tensors, cfg)
