"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §2c checklist: TP (Megatron shardings, KV pages on the head axis),
EP (shard_map + psum over "tp"), DP (batch rows).  The strongest contract:
sharded engines must reproduce the single-device greedy outputs bit-for-bit
at fp32 — parallelism is a layout change, not a numerics change.
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
from vllm_from_scratch_tpu.parallel.sharding import make_mesh, param_shardings

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

GREEDY = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
PROMPTS = [list(range(1, 20)), [7, 8, 9], list(range(40, 70))]


def mha_cfg(parallel=ParallelConfig()):
    return EngineConfig(
        model=ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=4, max_position=256),
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="none"),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        parallel=parallel,
    )


def flagship_cfg(parallel=ParallelConfig(), kv_quant="none"):
    return EngineConfig(
        model=ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=4, max_position=256,
                          intermediate_size=64,
                          kv_lora_rank=16, qk_rope_head_dim=8,
                          qk_nope_head_dim=16, v_head_dim=16,
                          num_experts=8, top_k=2, num_shared_experts=1),
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant=kv_quant),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        parallel=parallel,
    )


class TestTP:
    def test_tp4_matches_single_device(self):
        base = LLMEngine(mha_cfg()).generate(PROMPTS, GREEDY)
        tp4 = LLMEngine(mha_cfg(ParallelConfig(tp_size=4))).generate(PROMPTS, GREEDY)
        assert base == tp4

    def test_params_actually_sharded(self):
        eng = LLMEngine(mha_cfg(ParallelConfig(tp_size=4)))
        wq = eng.params["layers"]["wq"]
        assert len(wq.sharding.device_set) == 4
        # column-parallel: each device holds 1/4 of the head-output dim
        shard_shape = wq.sharding.shard_shape(wq.shape)
        assert shard_shape[-1] == wq.shape[-1] // 4

    def test_kv_cache_sharded_on_heads(self):
        eng = LLMEngine(mha_cfg(ParallelConfig(tp_size=4)))
        k = eng.cache.k
        assert k.sharding.shard_shape(k.shape)[2] == k.shape[2] // 4


class TestEPandMLA:
    def test_flagship_tp4_matches_single_device(self):
        """MLA + MoE with experts sharded over tp and shard_map psum EP."""
        base = LLMEngine(flagship_cfg()).generate(PROMPTS, GREEDY)
        tp4 = LLMEngine(flagship_cfg(ParallelConfig(tp_size=4))).generate(PROMPTS, GREEDY)
        assert base == tp4

    def test_expert_weights_sharded(self):
        eng = LLMEngine(flagship_cfg(ParallelConfig(tp_size=4)))
        wg = eng.params["layers"]["moe"]["w_gate"]  # [L, E, D, F]
        assert wg.sharding.shard_shape(wg.shape)[1] == wg.shape[1] // 4

    def test_flagship_int8_tp4_runs(self):
        out = LLMEngine(
            flagship_cfg(ParallelConfig(tp_size=4), kv_quant="int8")
        ).generate(PROMPTS, GREEDY)
        assert all(len(v) == 6 for v in out.values())


class TestDPxTP:
    def test_dp2_tp2_matches_single_device(self):
        base = LLMEngine(mha_cfg()).generate(PROMPTS, GREEDY)
        mix = LLMEngine(
            mha_cfg(ParallelConfig(dp_size=2, tp_size=2))
        ).generate(PROMPTS, GREEDY)
        assert base == mix

    def test_dp2_tp4_full_mesh_flagship(self):
        base = LLMEngine(flagship_cfg()).generate(PROMPTS, GREEDY)
        full = LLMEngine(
            flagship_cfg(ParallelConfig(dp_size=2, tp_size=4))
        ).generate(PROMPTS, GREEDY)
        assert base == full


class TestMeshConstruction:
    def test_make_mesh_shape(self):
        mesh = make_mesh(ParallelConfig(dp_size=2, tp_size=4))
        assert mesh.shape == {"dp": 2, "tp": 4}

    def test_sharding_tree_matches_params(self):
        from vllm_from_scratch_tpu.models import transformer

        cfg = flagship_cfg().model
        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        sh = param_shardings(cfg, make_mesh(ParallelConfig(tp_size=4)))
        # identical tree structure => device_put will succeed
        jax.tree.map(lambda a, s: None, params, sh)


class TestContextParallel:
    """SP/CP (SURVEY.md §2c): sequence-sharded prefill attention must equal
    dense causal attention — all three variants (all-gather CP, ring, and
    Ulysses) are layout changes, not numerics changes."""

    def _data(self, B=2, S=64, Hq=4, Hkv=2, D=16):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, S, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
        return q, k, v

    def _oracle(self, q, k, v):
        from vllm_from_scratch_tpu.ops.attention import dense_attention

        return dense_attention(q, k, v, causal=True)

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("sp",))

    def test_cp_prefill_matches_dense(self):
        from vllm_from_scratch_tpu.parallel.cp import cp_prefill_attention

        q, k, v = self._data()
        mesh = self._mesh()
        out = jax.jit(lambda q, k, v: cp_prefill_attention(
            q, k, v, mesh, axis="sp"))(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._oracle(q, k, v)), atol=1e-5
        )

    def test_ring_attention_matches_dense(self):
        from vllm_from_scratch_tpu.parallel.cp import ring_attention

        q, k, v = self._data()
        mesh = self._mesh()
        out = jax.jit(lambda q, k, v: ring_attention(
            q, k, v, mesh, axis="sp"))(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._oracle(q, k, v)), atol=1e-5
        )

    def test_ulysses_matches_dense(self):
        from vllm_from_scratch_tpu.parallel.cp import ulysses_attention

        q, k, v = self._data(Hq=8, Hkv=8)  # heads must divide axis size
        mesh = self._mesh()
        out = jax.jit(lambda q, k, v: ulysses_attention(
            q, k, v, mesh, axis="sp"))(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._oracle(q, k, v)), atol=1e-5
        )

    def test_ring_attention_jit_under_mesh(self):
        """jit-compiles with sharded inputs (the production entry path)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vllm_from_scratch_tpu.parallel.cp import ring_attention

        mesh = self._mesh()
        q, k, v = self._data()
        sh = NamedSharding(mesh, P(None, "sp"))
        q, k, v = jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh)
        f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, axis="sp"))
        out = f(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._oracle(q, k, v)), atol=1e-5
        )


class TestEPAllToAll:
    """Token-sharded EP with all_to_all dispatch == the dense MoE layer."""

    def _setup(self, E=8, K=2, T=64, D=32, F=64):
        from vllm_from_scratch_tpu.core.config import ModelConfig
        from vllm_from_scratch_tpu.models.moe import init_moe_params

        cfg = ModelConfig(num_experts=E, top_k=K, hidden_size=D,
                          intermediate_size=F)
        p = init_moe_params(jax.random.PRNGKey(0), D, F, E)
        x = jax.random.normal(jax.random.PRNGKey(1), (T, D), jnp.float32)
        return cfg, p, x

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("dp", "tp"))

    def test_exact_matches_dense(self):
        from vllm_from_scratch_tpu.models.moe import moe_ffn
        from vllm_from_scratch_tpu.parallel.ep import ep_moe_ffn_a2a

        cfg, p, x = self._setup()
        ref, _ = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"],
                         top_k=cfg.top_k)
        mesh = self._mesh()  # jit: eager shard_map re-traces per call (slow)
        out = jax.jit(lambda x, p: ep_moe_ffn_a2a(x, p, cfg, mesh))(x, p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_capacity_drop_still_runs(self):
        from vllm_from_scratch_tpu.parallel.ep import ep_moe_ffn_a2a

        cfg, p, x = self._setup()
        mesh = self._mesh()
        out = jax.jit(lambda x, p: ep_moe_ffn_a2a(
            x, p, cfg, mesh, capacity_factor=1.0))(x, p)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_int8_expert_weights(self):
        from vllm_from_scratch_tpu.models.layers import quantize_linear
        from vllm_from_scratch_tpu.models.moe import moe_ffn
        from vllm_from_scratch_tpu.parallel.ep import ep_moe_ffn_a2a

        cfg, p, x = self._setup()
        ref, _ = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"],
                         top_k=cfg.top_k)
        pq = dict(p)
        for k in ("w_gate", "w_up", "w_down"):
            pq[k] = quantize_linear(p[k])
        mesh = self._mesh()
        out = jax.jit(lambda x, p: ep_moe_ffn_a2a(x, p, cfg, mesh))(x, pq)
        err = float(np.max(np.abs(np.asarray(out) - np.asarray(ref))))
        scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-9
        assert err / scale < 0.1

    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_engine_a2a_matches_single_device(self):
        """Full flagship engine with ep_dispatch='a2a' reproduces the
        single-device greedy outputs."""
        from tests.test_parallel import flagship_cfg  # self-import safe

        single = LLMEngine(flagship_cfg())
        out1 = single.generate(PROMPTS, GREEDY)
        a2a = LLMEngine(flagship_cfg(ParallelConfig(
            dp_size=2, tp_size=4, ep_dispatch="a2a")))
        out2 = a2a.generate(PROMPTS, GREEDY)
        assert list(out1.values()) == list(out2.values())


class TestPPxTP:
    """2-D (pp, tp) composition (VERDICT r1 #6): the pipeline schedule is
    manual over "pp" while "tp" stays a GSPMD auto axis — a pp2 x tp2
    engine must reproduce single-device greedy outputs."""

    def test_pp2_tp2_matches_single_device(self):
        base = LLMEngine(mha_cfg()).generate(PROMPTS, GREEDY)
        pt = LLMEngine(mha_cfg(ParallelConfig(pp_size=2, tp_size=2))).generate(
            PROMPTS, GREEDY)
        assert list(base.values()) == list(pt.values())

    def test_pp2_tp2_flagship(self):
        base = LLMEngine(flagship_cfg()).generate(PROMPTS, GREEDY)
        pt = LLMEngine(flagship_cfg(
            ParallelConfig(pp_size=2, tp_size=2))).generate(PROMPTS, GREEDY)
        assert list(base.values()) == list(pt.values())

    def test_pp2_tp2_weights_sharded_both_axes(self):
        eng = LLMEngine(mha_cfg(ParallelConfig(pp_size=2, tp_size=2)))
        wq = eng.params["layers"]["wq"]
        spec = str(wq.sharding.spec)
        assert "pp" in spec and "tp" in spec
        # [L=2, H, Hq*D] -> L/2 per stage, out-features /2 per tp rank
        assert wq.sharding.shard_shape(wq.shape) == (1, wq.shape[1],
                                                     wq.shape[2] // 2)

    def test_pp2_dp2_matches_single_device(self):
        """PP x DP: batch rows shard over the auto "dp" axis while the
        pipeline schedule stays manual over "pp" (weights and KV replicate
        over dp; each dp replica-pair runs the same stage schedule on its
        half of the rows)."""
        base = LLMEngine(mha_cfg()).generate(PROMPTS, GREEDY)
        pd = LLMEngine(mha_cfg(ParallelConfig(pp_size=2, dp_size=2))).generate(
            PROMPTS, GREEDY)
        assert list(base.values()) == list(pd.values())

    def test_pp2_dp2_tp2_flagship(self):
        """All three axes (pipeline stages x data x tensor) on the 8-device
        mesh, MLA + MoE + shared expert."""
        base = LLMEngine(flagship_cfg()).generate(PROMPTS, GREEDY)
        full = LLMEngine(flagship_cfg(
            ParallelConfig(pp_size=2, dp_size=2, tp_size=2))).generate(
                PROMPTS, GREEDY)
        assert list(base.values()) == list(full.values())


class TestContextParallelServing:
    """Engine-integrated CP (VERDICT r1 #3; ref BLOG_PART3_V2.md:709-768):
    the latent cache shards over a "cp" mesh axis with virtual blocks of
    block_size*cp; chunked prefill (PCP) and decode (DCP) flash-merge
    per-rank partials.  Contract: cp engines reproduce single-device greedy
    outputs, and serve prompts beyond one chip's KV budget."""

    def _mla_cfg(self, parallel=ParallelConfig(), num_blocks=64,
                 kv_quant="none"):
        return EngineConfig(
            model=ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                              num_heads=4, num_kv_heads=4, max_position=512,
                              intermediate_size=64,
                              kv_lora_rank=16, qk_rope_head_dim=8,
                              qk_nope_head_dim=16, v_head_dim=16),
            cache=CacheConfig(block_size=16, num_blocks=num_blocks,
                              kv_quant=kv_quant),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=128),
            parallel=parallel,
        )

    def test_cp4_matches_single_device(self):
        prompts = [list(range(1, 101)), [5, 6, 7]]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        cp4 = LLMEngine(self._mla_cfg(ParallelConfig(cp_size=4))).generate(
            prompts, GREEDY)
        assert list(base.values()) == list(cp4.values())

    def test_cp4_int8_latents_match(self):
        """Per-token row quantization is rank-independent, so even the INT8
        latent path reproduces single-device outputs."""
        prompts = [list(range(1, 80))]
        base = LLMEngine(self._mla_cfg(kv_quant="int8")).generate(
            prompts, GREEDY)
        cp4 = LLMEngine(self._mla_cfg(ParallelConfig(cp_size=4),
                                      kv_quant="int8")).generate(
            prompts, GREEDY)
        assert list(base.values()) == list(cp4.values())

    def test_cp_serves_beyond_single_chip_budget(self):
        """num_blocks is per-rank: a cp=4 engine with 8x16-token blocks per
        chip (112 usable tokens) serves a 200-token prompt a single chip of
        the same size cannot hold."""
        prompt = list(range(1, 201))
        sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
        cp = LLMEngine(self._mla_cfg(ParallelConfig(cp_size=4), num_blocks=8))
        assert cp.block_size == 64  # cp_virtual_block_size
        oracle = LLMEngine(self._mla_cfg(num_blocks=64))
        out = cp.generate([prompt], sp)
        assert list(out.values()) == list(oracle.generate([prompt], sp).values())

    def test_cp_decode_steps_scan(self):
        """DCP inside the multi-step decode scan (the serving hot path)."""
        cfg = self._mla_cfg(ParallelConfig(cp_size=4))
        cfg = cfg.replace(scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=128, decode_steps=4))
        prompts = [list(range(1, 50))]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        out = LLMEngine(cfg).generate(prompts, GREEDY)
        assert list(out.values()) == list(base.values())

    def test_cp2_tp2_matches_single_device(self):
        """CP x TP composition (VERDICT r2 #5; ref sizes PCP/DCP alongside
        TP, BLOG_PART3_V2.md:709-768): cache slots shard over "cp", q_b/wo
        heads shard over "tp" within each cp rank."""
        prompts = [list(range(1, 101)), [5, 6, 7]]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        cptp = LLMEngine(
            self._mla_cfg(ParallelConfig(cp_size=2, tp_size=2))
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(cptp.values())

    def test_cp2_dp2_matches_single_device(self):
        """CP x DP composition: batch rows shard over "dp" (attention is
        dp-local), the cache stays dp-replicated via an all-gathered write,
        slots still shard over "cp".  Throughput scales with dp while each
        replica-group serves cp x one chip's context."""
        prompts = [list(range(1, 101)), [5, 6, 7], list(range(40, 90)),
                   [9, 9, 9, 9]]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        cpdp = LLMEngine(
            self._mla_cfg(ParallelConfig(cp_size=2, dp_size=2))
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(cpdp.values())

    def test_cp2_dp2_tp2_flagship_mesh(self):
        """All three serving axes at once on the 8-device mesh."""
        prompts = [list(range(1, 80)), [5, 6, 7], [11, 12], [3, 1, 4]]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        full = LLMEngine(
            self._mla_cfg(ParallelConfig(cp_size=2, dp_size=2, tp_size=2))
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(full.values())

    def test_cp2_pp2_matches_single_device(self):
        """CP composes with PP: both are manual axes of the pipeline
        shard_map (the cp attention body runs directly inside the stage
        schedule — a shard_map cannot nest); the cache shards its layer
        axis over "pp" AND its slot axis over "cp"."""
        prompts = [list(range(1, 101)), [5, 6, 7], list(range(40, 90)),
                   [9, 9, 9, 9]]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        cppp = LLMEngine(
            self._mla_cfg(ParallelConfig(cp_size=2, pp_size=2))
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(cppp.values())

    def test_cp2_pp2_tp2_full_stack(self):
        """Long context x pipeline stages x tensor parallelism on the
        8-device mesh (MLA)."""
        prompts = [list(range(1, 80)), [5, 6, 7], [11, 12], [3, 1, 4]]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        full = LLMEngine(
            self._mla_cfg(ParallelConfig(cp_size=2, pp_size=2, tp_size=2))
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(full.values())

    def test_cp2_pp2_dp2_matches_single_device(self):
        """The last mesh exclusion lifted (was: "cp x pp requires dp==1"):
        "dp" joins the 4-D (pp, cp, dp, tp) mesh as a GSPMD auto axis —
        batch rows shard over "dp" outside the manual {pp, cp} region, the
        cache stays dp-replicated, semantics unchanged."""
        prompts = [list(range(1, 101)), [5, 6, 7], list(range(40, 90)),
                   [9, 9, 9, 9]]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        full = LLMEngine(
            self._mla_cfg(ParallelConfig(cp_size=2, pp_size=2, dp_size=2))
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(full.values())

    def test_flagship_all_on(self):
        """VERDICT r2 weak #5's exact ask: MLA + MoE + long context (cp) +
        EPLB + pp x tp, ALL enabled at once, reproduces single-device
        greedy outputs (prompt beyond one chip's per-rank budget included)."""
        prompts = [list(range(1, 80)), [5, 6, 7], [11, 12], [3, 1, 4]]
        base = LLMEngine(flagship_cfg()).generate(prompts, GREEDY)
        full = LLMEngine(flagship_cfg(ParallelConfig(
            cp_size=2, pp_size=2, tp_size=2,
            eplb_interval=2, eplb_ranks=2))).generate(prompts, GREEDY)
        assert list(base.values()) == list(full.values())

    def test_cp2_pp2_gqa_matches_single_device(self):
        """The composed manual region serves GQA too (cp_gqa body)."""
        prompts = [list(range(1, 90)), [5, 6, 7], [11, 12], [3, 1, 4]]
        base = LLMEngine(self._gqa_cfg()).generate(prompts, GREEDY)
        cppp = LLMEngine(
            self._gqa_cfg(ParallelConfig(cp_size=2, pp_size=2))
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(cppp.values())

    def _gqa_cfg(self, parallel=ParallelConfig(), num_blocks=64,
                 kv_quant="none", num_kv_heads=4):
        return EngineConfig(
            model=ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                              num_heads=4, num_kv_heads=num_kv_heads,
                              max_position=512, intermediate_size=64),
            cache=CacheConfig(block_size=16, num_blocks=num_blocks,
                              kv_quant=kv_quant),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=128),
            parallel=parallel,
        )

    def test_gqa_cp4_matches_single_device(self):
        """GQA long context (VERDICT r2 #6): the paged K/V cache's slot axis
        shards over cp and the flash merge works per kv-head group."""
        prompts = [list(range(1, 101)), [5, 6, 7]]
        base = LLMEngine(self._gqa_cfg()).generate(prompts, GREEDY)
        cp4 = LLMEngine(self._gqa_cfg(ParallelConfig(cp_size=4))).generate(
            prompts, GREEDY)
        assert list(base.values()) == list(cp4.values())

    def test_gqa_cp4_int8_kv_grouped_heads(self):
        """INT8 K/V pages + genuinely grouped heads (Hq=4, Hkv=2)."""
        prompts = [list(range(1, 80))]
        base = LLMEngine(
            self._gqa_cfg(kv_quant="int8", num_kv_heads=2)
        ).generate(prompts, GREEDY)
        cp4 = LLMEngine(
            self._gqa_cfg(ParallelConfig(cp_size=4), kv_quant="int8",
                          num_kv_heads=2)
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(cp4.values())

    def test_gqa_cp_serves_beyond_single_chip_budget(self):
        """A GQA engine with cp=4 reproduces single-device greedy outputs on
        a prompt beyond one chip's KV budget (the VERDICT #6 'done' bar)."""
        prompt = list(range(1, 201))
        sp = SamplingParams(max_new_tokens=6, temperature=0.0,
                            ignore_eos=True)
        cp = LLMEngine(self._gqa_cfg(ParallelConfig(cp_size=4), num_blocks=8))
        assert cp.block_size == 64
        oracle = LLMEngine(self._gqa_cfg(num_blocks=64))
        out = cp.generate([prompt], sp)
        assert list(out.values()) == list(oracle.generate([prompt], sp).values())

    # ---- paged ring attention (ParallelConfig.cp_attn="ring") ----------
    # The reference's npu_ring_mla (BLOG_PART3_V2.md:676-681) as a
    # selectable serving path: prefill-chunk queries split T/cp per rank
    # and the INT8 page-slices rotate around the ring via ppermute; decode
    # keeps the flash merge.  Contract: identical greedy outputs.

    def test_ring_cp4_matches_single_device(self):
        prompts = [list(range(1, 101)), [5, 6, 7]]
        base = LLMEngine(self._mla_cfg()).generate(prompts, GREEDY)
        ring = LLMEngine(self._mla_cfg(
            ParallelConfig(cp_size=4, cp_attn="ring"))).generate(
            prompts, GREEDY)
        assert list(base.values()) == list(ring.values())

    def test_ring_cp4_int8_latents_match(self):
        """The ring rotates the INT8 latent pages + scales as stored."""
        prompts = [list(range(1, 80))]
        base = LLMEngine(self._mla_cfg(kv_quant="int8")).generate(
            prompts, GREEDY)
        ring = LLMEngine(self._mla_cfg(
            ParallelConfig(cp_size=4, cp_attn="ring"),
            kv_quant="int8")).generate(prompts, GREEDY)
        assert list(base.values()) == list(ring.values())

    def test_ring_cp_serves_beyond_single_chip_budget(self):
        """Ring CP preserves the capacity contract: a 200-token prompt a
        single chip of the same pool cannot hold still serves exactly."""
        prompt = list(range(1, 201))
        sp = SamplingParams(max_new_tokens=6, temperature=0.0,
                            ignore_eos=True)
        cp = LLMEngine(self._mla_cfg(
            ParallelConfig(cp_size=4, cp_attn="ring"), num_blocks=8))
        assert cp.block_size == 64
        oracle = LLMEngine(self._mla_cfg(num_blocks=64))
        out = cp.generate([prompt], sp)
        assert list(out.values()) == list(
            oracle.generate([prompt], sp).values())

    def test_ring_gqa_cp4_int8_kv(self):
        """GQA ring: INT8 K/V page-slices + per-slot scales rotate; grouped
        heads (Hq=4, Hkv=2)."""
        prompts = [list(range(1, 80))]
        base = LLMEngine(
            self._gqa_cfg(kv_quant="int8", num_kv_heads=2)
        ).generate(prompts, GREEDY)
        ring = LLMEngine(
            self._gqa_cfg(ParallelConfig(cp_size=4, cp_attn="ring"),
                          kv_quant="int8", num_kv_heads=2)
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(ring.values())

    def test_gqa_cp2_tp2_matches_single_device(self):
        """cp x tp for GQA: kv-heads shard over tp inside each cp rank."""
        prompts = [list(range(1, 101))]
        base = LLMEngine(self._gqa_cfg()).generate(prompts, GREEDY)
        out = LLMEngine(
            self._gqa_cfg(ParallelConfig(cp_size=2, tp_size=2))
        ).generate(prompts, GREEDY)
        assert list(base.values()) == list(out.values())

    def test_cp2_tp2_int8_weights_and_latents(self):
        """The quantized serving configuration composes too: INT8 weights
        shard per-head over tp (quant-aware specs) and INT8 latent pages
        shard over cp."""
        prompts = [list(range(1, 80))]
        base_cfg = self._mla_cfg(kv_quant="int8").replace(
            quant=QuantConfig(weight_quant="int8"))
        cptp_cfg = self._mla_cfg(
            ParallelConfig(cp_size=2, tp_size=2), kv_quant="int8"
        ).replace(quant=QuantConfig(weight_quant="int8"))
        base = LLMEngine(base_cfg).generate(prompts, GREEDY)
        out = LLMEngine(cptp_cfg).generate(prompts, GREEDY)
        assert list(base.values()) == list(out.values())


class TestEPLB:
    """Expert-parallel load balancing wired into the EP path and the engine
    (VERDICT r1 #4; ref: BLOG_PART3_V2.md:185-187).  Contract: permuted
    stacks + expert_map are an output-identity, and rebalancing drops the
    max-rank load share on skewed traffic."""

    def _permuted(self, p, perm):
        out = dict(p)
        for k in ("w_gate", "w_up", "w_down"):
            out[k] = jnp.take(p[k], jnp.asarray(perm), axis=0)
        return out, jnp.asarray(np.argsort(perm), jnp.int32)

    def test_ep_psum_expert_map_identity(self):
        from vllm_from_scratch_tpu.parallel.ep import ep_moe_ffn

        helper = TestEPAllToAll()
        cfg, p, x = helper._setup()
        mesh = helper._mesh()
        ref = jax.jit(lambda x, p: ep_moe_ffn(x, p, cfg, mesh))(x, p)
        perm = np.random.RandomState(0).permutation(cfg.num_experts)
        pp, emap = self._permuted(p, perm)
        out = jax.jit(lambda x, p, em: ep_moe_ffn(
            x, p, cfg, mesh, expert_map=em))(x, pp, emap)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_ep_a2a_expert_map_identity(self):
        from vllm_from_scratch_tpu.parallel.ep import ep_moe_ffn_a2a

        helper = TestEPAllToAll()
        cfg, p, x = helper._setup()
        mesh = helper._mesh()
        ref = jax.jit(lambda x, p: ep_moe_ffn_a2a(x, p, cfg, mesh))(x, p)
        perm = np.random.RandomState(1).permutation(cfg.num_experts)
        pp, emap = self._permuted(p, perm)
        out = jax.jit(lambda x, p, em: ep_moe_ffn_a2a(
            x, p, cfg, mesh, expert_map=em))(x, pp, emap)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def _zero_gate(self, eng):
        """All-equal router logits -> top_k always picks experts (0, 1):
        fully skewed traffic, all load on rank 0 under the identity layout."""
        layers = dict(eng.params["layers"])
        moe = dict(layers["moe"])
        moe["gate"] = jnp.zeros_like(moe["gate"])
        layers["moe"] = moe
        eng.params = {**eng.params, "layers": layers}

    def test_engine_rebalance_drops_max_rank_load(self):
        eng = LLMEngine(flagship_cfg(
            ParallelConfig(eplb_interval=10_000, eplb_ranks=4)))
        self._zero_gate(eng)
        out1 = eng.generate(PROMPTS, GREEDY)
        before = eng.eplb_max_rank_load_frac()
        assert before >= 0.9  # experts 0+1 share a rank under identity layout
        eng._eplb_rebalance()
        out2 = eng.generate(PROMPTS, GREEDY)
        after = eng.eplb_max_rank_load_frac()
        # >=30% drop (here exactly 2x: the two hot experts split ranks)...
        assert after <= 0.7 * before
        # ...while greedy outputs are unchanged by the permutation.
        assert list(out1.values()) == list(out2.values())

    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_engine_ep_eplb_matches_single_device(self):
        """Rebalances mid-serving under a real tp=4 mesh stay exact."""
        base = LLMEngine(flagship_cfg()).generate(PROMPTS, GREEDY)
        eng = LLMEngine(flagship_cfg(
            ParallelConfig(tp_size=4, eplb_interval=2)))
        out = eng.generate(PROMPTS, GREEDY)
        assert eng.metrics.get("eplb_rebalances", 0) >= 1
        assert list(out.values()) == list(base.values())

    @pytest.mark.skipif(jax.device_count() < 2, reason="needs 2 devices")
    def test_engine_eplb_composes_with_pp(self):
        """EPLB under pipeline parallelism (VERDICT r2 weak #5): each stage
        counts its own layers (bubble ticks masked), rebalances mid-serving
        stay exact vs the eplb-off pp engine."""
        base = LLMEngine(flagship_cfg(
            ParallelConfig(pp_size=2))).generate(PROMPTS, GREEDY)
        eng = LLMEngine(flagship_cfg(
            ParallelConfig(pp_size=2, eplb_interval=2, eplb_ranks=4)))
        out = eng.generate(PROMPTS, GREEDY)
        assert eng.metrics.get("eplb_rebalances", 0) >= 1
        assert list(out.values()) == list(base.values())


class TestPipelineParallel:
    """PP (SURVEY.md §2c): stage-sharded layers + microbatched ppermute flow
    reproduce the single-device forward exactly (logits AND cache)."""

    def _setup(self, family="mha", L=4, B=2, T=4):
        # B=2/T=4 keeps the parity check exact but halves the microbatch
        # ticks and the traced graph — these two tests were the suite's
        # slowest compiles (34 s/28 s warm; VERDICT r2 weak #4).
        from vllm_from_scratch_tpu.models import transformer
        from vllm_from_scratch_tpu.models.transformer import ModelBatch

        kw = dict(vocab_size=64, hidden_size=32, num_layers=L, num_heads=2,
                  num_kv_heads=2, max_position=128, intermediate_size=32)
        if family == "mla":
            kw.update(kv_lora_rank=8, qk_rope_head_dim=4, qk_nope_head_dim=8,
                      v_head_dim=8)
        cfg = ModelConfig(**kw)
        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        cache = transformer.init_cache(cfg, 16, 16, "int8")
        rng = np.random.RandomState(0)
        batch = ModelBatch(
            tokens=jnp.asarray(rng.randint(1, 63, (B, T)), jnp.int32),
            positions=jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1)),
            slots=jnp.asarray(
                np.arange(B * T).reshape(B, T) + 16, jnp.int32),  # skip null blk
            block_tables=jnp.asarray(
                np.arange(1, 1 + B * 2).reshape(B, 2), jnp.int32),
            ctx_lens=jnp.full((B,), T, jnp.int32),
            q_lens=jnp.full((B,), T, jnp.int32),
        )
        return cfg, params, cache, batch

    def _mesh(self, n=4):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("pp",))

    @pytest.mark.parametrize("family", ["mha", "mla"])
    def test_matches_single_device(self, family):
        from vllm_from_scratch_tpu.models import transformer
        from vllm_from_scratch_tpu.parallel.pp import pipeline_forward

        cfg, params, cache, batch = self._setup(family)
        # jit both sides: an eager shard_map re-traces per call (~30 s here);
        # under jit the warm persistent cache makes this a ~1 s load.
        ref_logits, ref_cache = jax.jit(
            lambda p, c, b: transformer.forward(p, c, b, cfg, block_size=16)
        )(params, cache, batch)
        mesh = self._mesh()
        pp_logits, pp_cache = jax.jit(
            lambda p, c, b: pipeline_forward(p, c, b, cfg, mesh, block_size=16)
        )(params, cache, batch)
        np.testing.assert_allclose(
            np.asarray(pp_logits), np.asarray(ref_logits), atol=1e-5, rtol=1e-5)
        # Null block (slots 0..15) is a garbage sink by design — bubble-tick
        # writes land there, like pad-token writes in normal operation.
        for a, b in zip(jax.tree.leaves(ref_cache), jax.tree.leaves(pp_cache)):
            np.testing.assert_allclose(
                np.asarray(a)[:, 16:], np.asarray(b)[:, 16:], atol=1e-6)

    def test_single_microbatch(self):
        from vllm_from_scratch_tpu.models import transformer
        from vllm_from_scratch_tpu.parallel.pp import pipeline_forward

        cfg, params, cache, batch = self._setup()
        ref_logits, _ = jax.jit(
            lambda p, c, b: transformer.forward(p, c, b, cfg, block_size=16)
        )(params, cache, batch)
        mesh = self._mesh()
        pp_logits, _ = jax.jit(
            lambda p, c, b: pipeline_forward(
                p, c, b, cfg, mesh, block_size=16, num_microbatches=1)
        )(params, cache, batch)
        np.testing.assert_allclose(
            np.asarray(pp_logits), np.asarray(ref_logits), atol=1e-5, rtol=1e-5)

    def test_jit_under_mesh(self):
        from vllm_from_scratch_tpu.parallel.pp import pipeline_forward

        cfg, params, cache, batch = self._setup()
        mesh = self._mesh()
        f = jax.jit(lambda p, c, b: pipeline_forward(
            p, c, b, cfg, mesh, block_size=16))
        logits, _ = f(params, cache, batch)
        assert np.all(np.isfinite(np.asarray(logits)))

    @pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
    def test_engine_pp4_matches_single_device(self):
        """Full engine with pp_size=4: stage-sharded serving reproduces the
        single-device greedy outputs."""
        import dataclasses

        def cfg(parallel=ParallelConfig()):
            c = mha_cfg(parallel)
            return c.replace(model=dataclasses.replace(c.model, num_layers=4))

        single = LLMEngine(cfg())
        out1 = single.generate(PROMPTS, GREEDY)
        pp = LLMEngine(cfg(ParallelConfig(pp_size=4)))
        out2 = pp.generate(PROMPTS, GREEDY)
        assert list(out1.values()) == list(out2.values())


class TestTPLA:
    """TPLA-style MLA TP (PAPERS.md): the latent cache shards its rank axis
    over "tp" (KV bytes/chip / tp); GSPMD inserts the over-r psums.  Pure
    layout change: greedy outputs bit-match the single-device engine."""

    def test_tpla_tp4_matches_single_device(self):
        base = LLMEngine(flagship_cfg()).generate(PROMPTS, GREEDY)
        tpla = LLMEngine(flagship_cfg(
            ParallelConfig(tp_size=4, mla_kv="tpla"))).generate(PROMPTS, GREEDY)
        assert base == tpla

    def test_latent_cache_actually_sharded(self):
        eng = LLMEngine(flagship_cfg(ParallelConfig(tp_size=4, mla_kv="tpla")))
        c = eng.cache.c  # [L, slots, r]
        assert c.sharding.shard_shape(c.shape)[2] == c.shape[2] // 4
        # replicated variant keeps the full rank per device
        eng2 = LLMEngine(flagship_cfg(ParallelConfig(tp_size=4)))
        c2 = eng2.cache.c
        assert c2.sharding.shard_shape(c2.shape)[2] == c2.shape[2]
