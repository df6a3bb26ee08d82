"""Serve a REAL safetensors checkpoint: torch-exported HF Llama -> engine.

The reference's engine only ever runs random-init weights
(ref: 05_mini_vllm/mini_vllm.py:536-542); production serving loads released
checkpoints.  These tests export a tiny Llama-family model from
torch/transformers (the de-facto checkpoint interchange), import it through
``utils/hf_import.py``, serve it with the full paged/continuous-batching
engine, and demand EXACT greedy tokens vs torch's own forward — a
cross-framework end-to-end equivalence, far stronger than the repo-internal
oracles (it would catch any silent divergence in RoPE convention, RMSNorm
placement, GQA mapping, SwiGLU wiring, or the importer's transposes).

Runs on CPU in float32 (r3 lesson: exact-token gates need f32 + highest
matmul precision; bf16 cross-impl noise is the same order as random-init
logit gaps).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vllm_from_scratch_tpu.core.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_from_scratch_tpu.core.engine import LLMEngine
from vllm_from_scratch_tpu.utils.hf_import import (
    load_hf_checkpoint,
    model_config_kwargs_from_hf,
)

VOCAB = 256


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """Export a tiny float32 GQA Llama with torch and save_pretrained."""
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
        torch_dtype="float32",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("hf_ckpt")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def _torch_greedy(model, prompt, n):
    ids = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        for _ in range(n):
            logits = model(ids).logits[:, -1, :]
            nxt = int(torch.argmax(logits, dim=-1))
            ids = torch.cat([ids, torch.tensor([[nxt]])], dim=1)
    return ids[0, len(prompt):].tolist()


def _build_engine(path, **quant):
    kwargs, params = load_hf_checkpoint(path)
    kwargs["dtype"] = "float32"
    cfg = EngineConfig(
        model=ModelConfig(**kwargs),
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="none"),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=256),
        **quant,
    )
    return LLMEngine(cfg, params=params)


class TestHFCheckpointServing:
    def test_config_translation(self, hf_dir):
        path, _ = hf_dir
        with open(os.path.join(path, "config.json")) as f:
            kwargs = model_config_kwargs_from_hf(json.load(f))
        assert kwargs["num_kv_heads"] == 2 and kwargs["num_heads"] == 4
        assert kwargs["vocab_size"] == VOCAB
        cfg = ModelConfig(**kwargs)
        assert cfg.head_dim == 16 and not cfg.is_mla and not cfg.is_moe

    def test_greedy_tokens_exact_vs_torch(self, hf_dir):
        """Engine-served checkpoint == torch forward, token for token."""
        import jax

        path, model = hf_dir
        rng = np.random.RandomState(3)
        prompts = [list(rng.randint(1, VOCAB, n)) for n in (19, 33, 7)]
        want = [_torch_greedy(model, p, 16) for p in prompts]

        with jax.default_matmul_precision("highest"):
            eng = _build_engine(path)
            sp = SamplingParams(max_new_tokens=16, temperature=0.0,
                                ignore_eos=True)
            got = eng.generate([list(p) for p in prompts], sp)
        got = [got[rid] for rid in sorted(got)]
        assert got == want

    def test_prefix_cache_and_batching_preserve_exactness(self, hf_dir):
        """A second serve of a shared-prefix batch (prefix-cache hits on) is
        still token-exact vs torch."""
        import jax

        path, model = hf_dir
        rng = np.random.RandomState(5)
        shared = list(rng.randint(1, VOCAB, 32))
        prompts = [shared + list(rng.randint(1, VOCAB, 8)) for _ in range(3)]
        want = [_torch_greedy(model, p, 12) for p in prompts]

        with jax.default_matmul_precision("highest"):
            eng = _build_engine(path)
            sp = SamplingParams(max_new_tokens=12, temperature=0.0,
                                ignore_eos=True)
            eng.generate([list(prompts[0])], sp)      # populate prefix cache
            got = eng.generate([list(p) for p in prompts], sp)
        assert eng.kv_mgr.hit_rate > 0                # hits actually happened
        got = [got[rid] for rid in sorted(got)]
        assert got == want

    def test_int8_quantized_serve(self, hf_dir):
        """The production INT8 path serves the same checkpoint end-to-end
        (quantization changes logits, so this asserts healthy generation and
        first-token agreement with the float run, not full exactness)."""
        import jax

        from vllm_from_scratch_tpu.core.config import QuantConfig

        path, model = hf_dir
        prompt = list(np.random.RandomState(7).randint(1, VOCAB, 24))
        with jax.default_matmul_precision("highest"):
            eng = _build_engine(path, quant=QuantConfig(weight_quant="int8"))
            sp = SamplingParams(max_new_tokens=8, temperature=0.0,
                                ignore_eos=True)
            got = eng.generate([list(prompt)], sp)
        toks = list(got.values())[0]
        assert len(toks) == 8
        assert all(0 <= t < VOCAB for t in toks)
