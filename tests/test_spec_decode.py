"""Speculative decoding tests — the blog-only components (BLOG_PART2.md:
1121-1330, BLOG_PART2_V2.md:983-1056): distribution-exact rejection sampling
(KL < 0.05 contract), greedy exactness, acceptance stats, and full engine
integration with a separate draft model."""

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
    SpecConfig,
)
from vllm_from_scratch_tpu.core.engine import LLMEngine
from vllm_from_scratch_tpu.ops.rejection import rejection_sample


class TestRejectionSampler:
    def test_all_accept_when_q_equals_p(self):
        """Drafts sampled from p and verified against p accept (whp) and the
        bonus token appears."""
        key = jax.random.PRNGKey(0)
        V, K, B = 16, 4, 8
        p = jax.nn.softmax(jax.random.normal(key, (B, V)))
        target = jnp.repeat(p[:, None, :], K + 1, axis=1)
        draft_p = jnp.repeat(p[:, None, :], K, axis=1)
        drafts = jax.random.categorical(jax.random.PRNGKey(1), jnp.log(p), shape=(K, B)).T
        out, n_acc = rejection_sample(drafts, draft_p, target, jax.random.PRNGKey(2))
        assert np.all(np.asarray(n_acc) == K)  # identical dists: p/q ratio = 1
        np.testing.assert_array_equal(np.asarray(out[:, :K]), np.asarray(drafts))

    def test_zero_prob_draft_rejected(self):
        """A draft token with target prob 0 must always be rejected."""
        V, K, B = 8, 2, 4
        q = jnp.full((B, K, V), 1.0 / V)
        p = jnp.zeros((B, K + 1, V)).at[:, :, 3].set(1.0)  # target: always token 3
        drafts = jnp.full((B, K), 5, jnp.int32)            # draft proposes 5
        out, n_acc = rejection_sample(drafts, q, p, jax.random.PRNGKey(0))
        assert np.all(np.asarray(n_acc) == 0)
        assert np.all(np.asarray(out[:, 0]) == 3)          # residual == p => 3

    def test_distribution_exact_kl(self):
        """Empirical distribution of emitted tokens matches the target within
        KL < 0.05 (BLOG_PART2_V2.md:1029-1056 contract)."""
        V, K = 8, 3
        N = 4000
        key = jax.random.PRNGKey(3)
        p = jax.nn.softmax(jnp.asarray(np.random.RandomState(0).randn(V)) * 1.5)
        q = jax.nn.softmax(jnp.asarray(np.random.RandomState(1).randn(V)) * 1.5)

        target = jnp.broadcast_to(p, (N, K + 1, V))
        draft_p = jnp.broadcast_to(q, (N, K, V))
        drafts = jax.random.categorical(key, jnp.log(q), shape=(N, K))
        out, n_acc = rejection_sample(
            drafts.astype(jnp.int32), draft_p, target, jax.random.PRNGKey(4)
        )
        # Position-0 emitted tokens are one exact sample from p each.
        first = np.asarray(out[:, 0])
        emp = np.bincount(first, minlength=V) / N
        pk = np.asarray(p)
        kl = float(np.sum(pk * np.log(pk / np.maximum(emp, 1e-9))))
        assert kl < 0.05, f"KL {kl}"

    def test_greedy_one_hot_exact(self):
        """One-hot target (greedy): accept iff draft == argmax, emit argmax."""
        V, K, B = 8, 3, 4
        amax = jnp.asarray([2, 2, 5, 7])
        p = jax.nn.one_hot(amax, V)[:, None, :].repeat(K + 1, axis=1)
        q = jnp.full((B, K, V), 1.0 / V)
        drafts = jnp.stack([
            jnp.asarray([2, 2, 2]),   # all match -> 3 accepted + bonus 2
            jnp.asarray([2, 4, 2]),   # 1 accepted, corrected to 2
            jnp.asarray([1, 5, 5]),   # 0 accepted, corrected to 5
            jnp.asarray([7, 7, 0]),   # 2 accepted, corrected to 7
        ]).astype(jnp.int32)
        out, n_acc = rejection_sample(drafts, q, p, jax.random.PRNGKey(5))
        assert list(np.asarray(n_acc)) == [3, 1, 0, 2]
        for b in range(B):
            assert int(out[b, int(n_acc[b])]) == int(amax[b])


def spec_engine_cfg(spec=True, seed=0, K=4):
    target = ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                         num_heads=4, num_kv_heads=2, max_position=256)
    draft = ModelConfig(vocab_size=128, hidden_size=32, num_layers=1,
                        num_heads=2, num_kv_heads=2, max_position=256)
    return EngineConfig(
        model=target,
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="none"),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        spec=SpecConfig(draft=draft, num_draft_tokens=K) if spec else None,
        seed=seed,
    )


class TestSpecEngine:
    def test_greedy_output_matches_plain_engine(self):
        """Greedy spec decode must produce EXACTLY the plain engine's tokens
        regardless of the draft model (one-hot rejection = exact verify)."""
        sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
        prompts = [list(range(1, 21)), [7, 8, 9]]
        plain = LLMEngine(spec_engine_cfg(spec=False)).generate(prompts, sp)
        spec = LLMEngine(spec_engine_cfg(spec=True)).generate(prompts, sp)
        assert plain == spec

    def test_acceptance_stats_tracked(self):
        sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
        eng = LLMEngine(spec_engine_cfg())
        eng.generate([list(range(1, 21))], sp)
        assert eng.metrics.get("spec_drafted", 0) > 0
        rate = eng.metrics["spec_accepted"] / eng.metrics["spec_drafted"]
        assert 0.0 <= rate <= 1.0

    def test_self_draft_accepts_everything(self):
        """Draft == target (same config+seed weights) => greedy acceptance 1.0
        and ~K+1 tokens per step."""
        target = ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                             num_heads=4, num_kv_heads=2, max_position=256)
        cfg = EngineConfig(
            model=target,
            cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="none"),
            scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
            spec=SpecConfig(draft=target, num_draft_tokens=4),
        )
        eng = LLMEngine(cfg)
        # make draft weights identical to target weights
        eng.draft_params = eng.params
        sp = SamplingParams(max_new_tokens=15, temperature=0.0, ignore_eos=True)
        out = eng.generate([list(range(1, 21))], sp)
        assert len(out[0]) == 15
        rate = eng.metrics["spec_accepted"] / eng.metrics["spec_drafted"]
        assert rate > 0.95, f"self-draft acceptance {rate}"

    def test_eos_inside_accepted_prefix(self):
        sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
        probe = LLMEngine(spec_engine_cfg(spec=False)).generate([[5, 6, 7]], sp)[0]
        eos = probe[4]
        first = probe.index(eos)
        sp_eos = SamplingParams(max_new_tokens=12, temperature=0.0, eos_token_id=eos)
        eng = LLMEngine(spec_engine_cfg())
        out = eng.generate([[5, 6, 7]], sp_eos)[0]
        assert out == probe[: first + 1]
        assert eng.kv_mgr.usage == 0.0

    def test_sampled_spec_runs(self):
        """Stochastic sampling with spec decode completes and is diverse."""
        sp = SamplingParams(max_new_tokens=20, temperature=1.0, top_p=0.9,
                            ignore_eos=True)
        out = LLMEngine(spec_engine_cfg()).generate([[1, 2, 3]], sp)[0]
        assert len(out) == 20 and len(set(out)) > 5


def test_flagship_target_spec_decode():
    """Spec decode with an MLA+MoE target and a small MHA draft — the verify
    forward runs the full flagship stack with return_all_logits."""
    from vllm_from_scratch_tpu.core.config import (
        CacheConfig, EngineConfig, ModelConfig, SamplingParams,
        SchedulerConfig, SpecConfig,
    )
    from vllm_from_scratch_tpu.core.engine import LLMEngine

    target = ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                         num_heads=4, num_kv_heads=4, max_position=256,
                         intermediate_size=64,
                         kv_lora_rank=16, qk_rope_head_dim=8,
                         qk_nope_head_dim=16, v_head_dim=16,
                         num_experts=4, top_k=2)
    draft = ModelConfig(vocab_size=128, hidden_size=32, num_layers=1,
                        num_heads=2, num_kv_heads=2, max_position=256,
                        intermediate_size=32)
    eng = LLMEngine(EngineConfig(
        model=target,
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="int8"),
        scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64),
        spec=SpecConfig(draft=draft, num_draft_tokens=3),
    ))
    sp = SamplingParams(max_new_tokens=10, temperature=0.0, ignore_eos=True)
    out = eng.generate([[3, 4, 5], [9, 8]], sp)
    assert all(len(v) == 10 for v in out.values())
    assert eng.stats().get("spec_drafted", 0) > 0


class TestNgramSpec:
    def test_propose_ngram(self):
        from vllm_from_scratch_tpu.ops.rejection import propose_ngram

        t = [1, 2, 3, 4, 1, 2, 9, 8, 1, 2]
        # last 2-gram (1,2) occurred at idx 4 (followed by 9,8) and idx 0
        # (followed by 3,4); most recent wins
        assert propose_ngram(t, n=2, k=2) == [9, 8]
        assert propose_ngram([1, 2, 3], n=2, k=2) is None  # no earlier match
        assert propose_ngram([5], n=2, k=2) is None        # too short
        # short continuation pads by repeating
        assert propose_ngram([7, 1, 2, 3, 1, 2], n=2, k=3) == [3, 1, 2]

    def test_ngram_engine_greedy_matches_plain(self):
        """Exactness: ngram-spec greedy output == plain engine output, on a
        repetitive prompt (proposals fire) and a random one (fallback)."""
        from vllm_from_scratch_tpu.core.config import (
            CacheConfig, EngineConfig, ModelConfig, SamplingParams,
            SchedulerConfig, SpecConfig,
        )
        from vllm_from_scratch_tpu.core.engine import LLMEngine

        model = ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=4, max_position=256,
                            intermediate_size=64)
        base = dict(
            model=model,
            cache=CacheConfig(block_size=16, num_blocks=64),
            scheduler=SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=64),
        )
        sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 10, 11, 12]]

        plain = LLMEngine(EngineConfig(**base)).generate(prompts, sp)
        ng = LLMEngine(EngineConfig(
            **base, spec=SpecConfig(method="ngram", num_draft_tokens=3,
                                    ngram_n=2)))
        out = ng.generate(prompts, sp)
        assert list(out.values()) == list(plain.values())
        assert ng.stats().get("spec_drafted", 0) > 0


def test_ngram_spec_composes_with_pp():
    """Draft-free ngram spec under a pp2 mesh == plain single-device output
    (VERDICT r1 #6: the verify forward pipelines like any chunk)."""
    import jax
    import pytest

    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    from vllm_from_scratch_tpu.core.config import (
        CacheConfig, EngineConfig, ModelConfig, ParallelConfig,
        SamplingParams, SchedulerConfig, SpecConfig,
    )
    from vllm_from_scratch_tpu.core.engine import LLMEngine

    model = ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                        num_heads=4, num_kv_heads=4, max_position=256,
                        intermediate_size=64)
    base = dict(
        model=model,
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64),
    )
    sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 10, 11, 12]]

    plain = LLMEngine(EngineConfig(**base)).generate(prompts, sp)
    ng_pp = LLMEngine(EngineConfig(
        **base,
        parallel=ParallelConfig(pp_size=2),
        spec=SpecConfig(method="ngram", num_draft_tokens=3, ngram_n=2)))
    out = ng_pp.generate(prompts, sp)
    assert list(out.values()) == list(plain.values())
    assert ng_pp.stats().get("spec_drafted", 0) > 0


def test_draft_model_spec_composes_with_pp():
    """Draft-MODEL spec under a pp2 mesh: the small draft scans replicated
    outside the pipeline, only the (K+1)-token verify pipelines — greedy
    output must EXACTLY match the plain single-device engine (the last
    serving-composition exclusion, lifted)."""
    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    from vllm_from_scratch_tpu.core.config import ParallelConfig

    sp = SamplingParams(max_new_tokens=12, temperature=0.0, ignore_eos=True)
    prompts = [list(range(1, 21)), [7, 8, 9]]
    plain = LLMEngine(spec_engine_cfg(spec=False)).generate(prompts, sp)

    cfg = spec_engine_cfg(spec=True).replace(parallel=ParallelConfig(pp_size=2))
    eng = LLMEngine(cfg)
    assert eng._spec_step_fn is None  # split path engaged
    out = eng.generate(prompts, sp)
    assert list(out.values()) == list(plain.values())
    assert eng.metrics.get("spec_drafted", 0) > 0
