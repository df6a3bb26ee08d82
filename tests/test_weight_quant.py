"""Weight-only INT8 quantization (QuantConfig.weight_quant="int8").

The reference has no quantization (SURVEY.md: everything fp32); weight-only
INT8 with per-output-channel scales is part of this framework's BASELINE
contract.  Contracts tested: mm() accuracy vs float, every model family
serving under int8 weights, EP + weight quant on a mesh, and the memory win.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_from_scratch_tpu.core.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    QuantConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_from_scratch_tpu.core.engine import LLMEngine
from vllm_from_scratch_tpu.models import transformer
from vllm_from_scratch_tpu.models.layers import QuantizedLinear, mm, quantize_linear

GREEDY = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)


def cfg_for(family: str, parallel=None, weight_quant="int8"):
    kw = dict(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
              num_kv_heads=4, max_position=256, intermediate_size=64)
    if family in ("mla", "flagship"):
        kw.update(kv_lora_rank=16, qk_rope_head_dim=8, qk_nope_head_dim=16,
                  v_head_dim=16)
    if family in ("moe", "flagship"):
        kw.update(num_experts=8, top_k=2, num_shared_experts=1)
    return EngineConfig(
        model=ModelConfig(**kw),
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="int8"),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        quant=QuantConfig(weight_quant=weight_quant),
        parallel=parallel or ParallelConfig(),
    )


class TestMM:
    def test_int8_matmul_accuracy(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (32, 64), jnp.float32)
        w = 0.02 * jax.random.normal(k2, (64, 128), jnp.float32)
        out = mm(x, quantize_linear(w))
        ref = x @ w
        # per-channel int8: relative error ~1/127 on the channel amax
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 0.05, err

    def test_stacked_layers_slice_under_scan(self):
        """QuantizedLinear with [L, in, out] slices correctly in lax.scan."""
        w = 0.02 * jax.random.normal(jax.random.PRNGKey(0), (3, 16, 32))
        qw = quantize_linear(w)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))

        def step(carry, wl):
            return carry, mm(x, wl)

        _, ys = jax.lax.scan(step, 0, qw)
        for l in range(3):
            np.testing.assert_allclose(
                np.asarray(ys[l]), np.asarray(mm(x, quantize_linear(w[l]))),
                atol=1e-6,
            )


@pytest.mark.parametrize("family", ["mha", "moe", "mla", "flagship"])
class TestEngineWeightQuant:
    def test_generates(self, family):
        eng = LLMEngine(cfg_for(family))
        out = eng.generate([[5, 6, 7, 8], [9, 10]], GREEDY)
        assert all(len(v) == 6 for v in out.values())

    def test_logits_close_to_float(self, family):
        """Quantized-weight logits stay close to the float model's (same
        params, quantized after init)."""
        cfg = cfg_for(family, weight_quant="none")
        eng = LLMEngine(cfg)
        qparams = transformer.quantize_params(eng.params, cfg.model)

        from vllm_from_scratch_tpu.models.transformer import ModelBatch

        B, T = 1, 8
        batch = ModelBatch(
            tokens=jnp.arange(1, T + 1, dtype=jnp.int32)[None],
            positions=jnp.arange(T, dtype=jnp.int32)[None],
            slots=(jnp.arange(T, dtype=jnp.int32) + cfg.cache.block_size)[None],
            block_tables=jnp.asarray([[1, 2]], jnp.int32),
            ctx_lens=jnp.asarray([T], jnp.int32),
            q_lens=jnp.asarray([T], jnp.int32),
        )
        lf, _ = transformer.forward(
            eng.params, eng.cache, batch, cfg.model,
            block_size=cfg.cache.block_size)
        cache2 = transformer.init_cache(
            cfg.model, cfg.cache.num_blocks, cfg.cache.block_size,
            cfg.cache.kv_quant)
        lq, _ = transformer.forward(
            qparams, cache2, batch, cfg.model, block_size=cfg.cache.block_size)
        # logits are unnormalized; compare top-1 agreement + numeric closeness
        cos = float(
            jnp.sum(lf * lq) / (jnp.linalg.norm(lf) * jnp.linalg.norm(lq))
        )
        assert cos > 0.99, cos


class TestQuantScope:
    def test_scope_experts_leaves_dense_float(self):
        """QuantConfig.scope='experts' must flow through the ENGINE's
        quantize_params call: routed experts become QuantizedLinear while
        lm_head and the dense/attention weights stay float arrays."""
        kw = dict(cfg_for("flagship").__dict__)
        kw["quant"] = QuantConfig(weight_quant="int8", scope="experts")
        eng = LLMEngine(EngineConfig(**kw))
        assert isinstance(eng.params["lm_head"], jax.Array), type(
            eng.params["lm_head"])
        layers = eng.params["layers"]
        for k in ("q_a", "q_b", "wo"):
            if k in layers:
                assert isinstance(layers[k], jax.Array), k
        moe = layers["moe"]
        assert isinstance(moe["w_gate"], QuantizedLinear)
        # and it still generates
        out = eng.generate([[5, 6, 7]], GREEDY)
        assert len(next(iter(out.values()))) == 6


class TestMemoryAndParallel:
    def test_param_bytes_shrink(self):
        cfg = cfg_for("flagship")
        eng = LLMEngine(cfg_for("flagship", weight_quant="none"))

        def nbytes(t):
            return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))

        fp = nbytes(eng.params)
        q = nbytes(transformer.quantize_params(eng.params, cfg.model))
        assert q < 0.45 * fp, (q, fp)  # most weight mass goes 4B -> 1B+scale

    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_ep_tp4_weight_quant_matches_single(self):
        """Sharded int8-weight engine reproduces the single-device int8
        outputs (parallelism orthogonal to quantization)."""
        single = LLMEngine(cfg_for("flagship"))
        out1 = single.generate([[5, 6, 7, 8], [9, 10]], GREEDY)
        sharded = LLMEngine(cfg_for(
            "flagship", parallel=ParallelConfig(dp_size=2, tp_size=4)))
        out2 = sharded.generate([[5, 6, 7, 8], [9, 10]], GREEDY)
        assert list(out1.values()) == list(out2.values())


class TestInt4:
    def test_mm_accuracy(self):
        from vllm_from_scratch_tpu.models.layers import quantize_linear4

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (32, 63), jnp.float32)  # odd in_dim
        w = 0.02 * jax.random.normal(k2, (63, 128), jnp.float32)
        out = mm(x, quantize_linear4(w))
        ref = x @ w
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 0.25, err  # 3-bit mantissa: ~1/7 per-element error

    def test_pack_unpack_exact(self):
        from vllm_from_scratch_tpu.models.layers import (
            _unpack4, quantize_linear4,
        )

        w = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 8))  # stacked+odd
        q = quantize_linear4(w)
        vals = _unpack4(q)
        assert vals.shape == w.shape
        assert int(jnp.max(vals)) <= 7 and int(jnp.min(vals)) >= -7
        # round-trip: dequantized == scale * nibble values
        np.testing.assert_allclose(
            np.asarray(vals.astype(jnp.float32) * q.scale[..., None, :]),
            np.asarray(jnp.clip(jnp.round(w / q.scale[..., None, :]), -7, 7)
                       * q.scale[..., None, :]),
            rtol=1e-6,
        )

    @pytest.mark.parametrize("family", ["mha", "flagship"])
    def test_engine_int4_generates(self, family):
        from vllm_from_scratch_tpu.core.config import QuantConfig

        cfg = cfg_for(family, weight_quant="int4")
        eng = LLMEngine(cfg)
        out = eng.generate([[5, 6, 7, 8], [9, 10]], GREEDY)
        assert all(len(v) == 6 for v in out.values())

    def test_param_bytes_shrink_vs_int8(self):
        """Compare only the quantized weight payloads (embed/norms/rope are
        float either way)."""
        from vllm_from_scratch_tpu.models.layers import (
            quantize_linear, quantize_linear4,
        )

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 512))
        q8 = quantize_linear(w)
        q4 = quantize_linear4(w)
        b8 = q8.q.size * 1 + q8.scale.size * 4
        b4 = q4.q4.size * 1 + q4.scale.size * 4
        assert b4 < 0.6 * b8, (b4, b8)

    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_ep_tp4_int4_matches_single(self):
        """INT4-quantized MoE experts under EP (tp4): _expert_spec must
        mirror the QuantizedLinear4 pytree (same aux) or shard_map rejects
        the rank-3 spec against the rank-2 scale leaf — regression test."""
        single = LLMEngine(cfg_for("flagship", weight_quant="int4"))
        out1 = single.generate([[5, 6, 7, 8], [9, 10]], GREEDY)
        sharded = LLMEngine(cfg_for(
            "flagship", weight_quant="int4",
            parallel=ParallelConfig(dp_size=2, tp_size=4)))
        out2 = sharded.generate([[5, 6, 7, 8], [9, 10]], GREEDY)
        assert list(out1.values()) == list(out2.values())
