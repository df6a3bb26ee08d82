"""Checkpoint round-trip tests (new scope vs the reference — SURVEY.md §5
notes the reference has no save/load; this is the orbax/safetensors layer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_from_scratch_tpu.core.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_from_scratch_tpu.core.engine import LLMEngine
from vllm_from_scratch_tpu.utils.checkpoint import (
    config_from_dict,
    config_to_dict,
    export_safetensors,
    import_safetensors,
)


def tiny_config(**model_kw):
    return EngineConfig(
        model=ModelConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
            num_kv_heads=2, max_position=128, intermediate_size=32, **model_kw
        ),
        cache=CacheConfig(block_size=16, num_blocks=32, kv_quant="int8"),
        scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64),
    )


def test_config_roundtrip():
    cfg = tiny_config(num_experts=4, top_k=2, kv_lora_rank=8,
                      qk_rope_head_dim=4, qk_nope_head_dim=8, v_head_dim=8)
    assert config_from_dict(config_to_dict(cfg)) == cfg


def test_engine_save_load_same_outputs(tmp_path):
    """Greedy generation is identical before and after a checkpoint cycle."""
    cfg = tiny_config()
    eng = LLMEngine(cfg)
    eng.save(str(tmp_path / "ckpt"))

    eng2 = LLMEngine.from_checkpoint(str(tmp_path / "ckpt"))
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
    prompts = [[5, 6, 7, 8], [9, 10]]
    out1 = eng.generate(prompts, sp)
    out2 = eng2.generate(prompts, sp)
    assert list(out1.values()) == list(out2.values())


def test_safetensors_roundtrip(tmp_path):
    """Flat-tensor export/import preserves every leaf, including tuple
    entries (the MoE shared-expert weights)."""
    from vllm_from_scratch_tpu.models import transformer

    cfg = tiny_config(num_experts=4, top_k=2, num_shared_experts=1).model
    params = transformer.init_params(jax.random.PRNGKey(0), cfg)
    f = str(tmp_path / "m.safetensors")
    export_safetensors(f, params)
    restored = import_safetensors(f, params)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_safetensors_shape_mismatch_raises(tmp_path):
    from vllm_from_scratch_tpu.models import transformer

    cfg = tiny_config().model
    params = transformer.init_params(jax.random.PRNGKey(0), cfg)
    f = str(tmp_path / "m.safetensors")
    export_safetensors(f, params)
    import dataclasses

    bigger = transformer.init_params(
        jax.random.PRNGKey(0), dataclasses.replace(cfg, hidden_size=64)
    )
    with pytest.raises((ValueError, KeyError)):
        import_safetensors(f, bigger)


def test_quantized_restore_onto_mesh(tmp_path):
    """Restoring an int8-weight checkpoint onto a tp=2 mesh must shard the
    QuantizedLinear leaves (q AND the rank-reduced scale) instead of crashing
    on a rank-mismatched PartitionSpec (ADVICE r1: param_shardings emitted
    float-weight specs that applied as a pytree prefix to quantized leaves)."""
    from vllm_from_scratch_tpu.core.config import ParallelConfig, QuantConfig
    from vllm_from_scratch_tpu.models.layers import QuantizedLinear

    cfg = tiny_config(
        num_experts=4, top_k=2, num_shared_experts=1,
        kv_lora_rank=8, qk_rope_head_dim=4, qk_nope_head_dim=8, v_head_dim=8,
    ).replace(quant=QuantConfig(weight_quant="int8"))
    LLMEngine(cfg).save(str(tmp_path / "q"))

    eng = LLMEngine.from_checkpoint(
        str(tmp_path / "q"), parallel=ParallelConfig(tp_size=2)
    )
    moe_w = eng.params["layers"]["moe"]["w_gate"]
    assert isinstance(moe_w, QuantizedLinear)
    # Experts sharded over tp on axis 1 for q [L, E, D, F] and scale [L, E, F].
    assert "tp" in str(moe_w.q.sharding.spec)
    assert "tp" in str(moe_w.scale.sharding.spec)
    assert moe_w.scale.sharding.shard_shape(moe_w.scale.shape)[1] == 2  # E/tp
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    out = eng.generate([[5, 6, 7]], sp)
    assert len(out[0]) == 4


def test_quantized_engine_roundtrip(tmp_path):
    """Saving an int8-weight engine and restoring rebuilds the
    QuantizedLinear pytree (structured orbax target) without re-quantizing."""
    from vllm_from_scratch_tpu.core.config import QuantConfig

    cfg = tiny_config().replace(quant=QuantConfig(weight_quant="int8"))
    eng = LLMEngine(cfg)
    eng.save(str(tmp_path / "q"))
    eng2 = LLMEngine.from_checkpoint(str(tmp_path / "q"))
    from vllm_from_scratch_tpu.models.layers import QuantizedLinear

    assert isinstance(eng2.params["lm_head"], QuantizedLinear)
    sp = SamplingParams(max_new_tokens=5, temperature=0.0, ignore_eos=True)
    assert eng.generate([[5, 6, 7]], sp) == eng2.generate([[5, 6, 7]], sp)


def test_restore_with_eplb_override(tmp_path):
    """Restoring a checkpoint saved with EPLB OFF while overriding EPLB ON
    must not desync the orbax restore target from the stored tree: the
    target's structure follows the SAVED config; __init__ then adds a fresh
    identity expert_map for the enabled EPLB."""
    from vllm_from_scratch_tpu.core.config import ParallelConfig

    cfg = tiny_config(num_experts=4, top_k=2)
    eng = LLMEngine(cfg)
    eng.save(str(tmp_path / "e"))
    eng2 = LLMEngine.from_checkpoint(
        str(tmp_path / "e"), parallel=ParallelConfig(eplb_interval=4))
    assert "expert_map" in eng2.params["layers"]["moe"]
    sp = SamplingParams(max_new_tokens=5, temperature=0.0, ignore_eos=True)
    assert eng.generate([[5, 6, 7]], sp) == eng2.generate([[5, 6, 7]], sp)
