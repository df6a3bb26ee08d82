"""Engine + scheduler tests — port of the reference suite 05 contract
(05_mini_vllm/test_mini_vllm.py, 26 cases): scheduler budgets/caps/chunking,
slot-mapping bounds, end-to-end generate() smoke tests, sampler statistics,
prefill determinism — plus tests the reference *lacks*: an exact dense-oracle
equivalence for the full engine (possible here because our decode path truly
gathers through block tables, unlike mini_vllm.py:468-473), batching
invariance, prefix-cache reuse, and preemption-by-recompute.
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
from vllm_from_scratch_tpu.core.kv_cache_manager import KVCacheManager
from vllm_from_scratch_tpu.core.request import Request, RequestStatus
from vllm_from_scratch_tpu.core.scheduler import Scheduler
from vllm_from_scratch_tpu.models.layers import rms_norm, swiglu
from vllm_from_scratch_tpu.ops.attention import dense_attention
from vllm_from_scratch_tpu.ops.rotary import apply_rope


def small_config(**kw):
    defaults = dict(
        model=ModelConfig(
            vocab_size=128, hidden_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, max_position=256,
        ),
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="none"),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
    )
    defaults.update(kw)
    return EngineConfig(**defaults)


@pytest.fixture(scope="module")
def engine_factory():
    """Engines sharing one config (and thus one compiled program cache)."""
    def make(**kw):
        return LLMEngine(small_config(**kw))
    return make


GREEDY = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)


# ---------------------------------------------------------------- oracle

def oracle_generate(params, cfg: ModelConfig, prompt, num_new):
    """From-scratch full-recompute reference: no paging, no cache, dense
    causal attention each step.  The engine must reproduce this exactly at
    fp32 (greedy)."""
    tokens = list(prompt)
    for _ in range(num_new):
        x = params["embed"][jnp.asarray([tokens], jnp.int32)]
        T = len(tokens)
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        for li in range(cfg.num_layers):
            lyr = {k: v[li] for k, v in params["layers"].items()}
            xn = rms_norm(x, lyr["attn_norm"], cfg.rms_norm_eps)
            q = (xn @ lyr["wq"]).reshape(1, T, cfg.num_heads, cfg.head_dim)
            kv = (xn @ lyr["wkv"]).reshape(1, T, 2 * cfg.num_kv_heads, cfg.head_dim)
            k, v = kv[:, :, : cfg.num_kv_heads], kv[:, :, cfg.num_kv_heads :]
            q = apply_rope(q, pos, params["rope"])
            k = apply_rope(k, pos, params["rope"])
            a = dense_attention(q, k, v, causal=True)
            x = x + (a.astype(x.dtype).reshape(1, T, -1)) @ lyr["wo"]
            x = x + swiglu(rms_norm(x, lyr["ffn_norm"], cfg.rms_norm_eps),
                           lyr["w_gate"], lyr["w_up"], lyr["w_down"])
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = x[0, -1] @ params["lm_head"]
        tokens.append(int(jnp.argmax(logits)))
    return tokens[len(prompt):]


class TestEngineCorrectness:
    def test_matches_dense_oracle(self, engine_factory):
        """Greedy paged+chunked engine == naive full-recompute transformer."""
        eng = engine_factory()
        prompt = list(range(1, 21))
        out = eng.generate([prompt], GREEDY)
        ref = oracle_generate(eng.params, eng.config.model, prompt, 6)
        assert out[0] == ref

    def test_layer_scan_unroll_exact(self, engine_factory, monkeypatch):
        """VFS_UNROLL_LAYERS=1 (transformer._layer_unroll, the r3 static-
        slice perf experiment) is semantics-identical: greedy outputs and
        chunked-prefill behavior match the rolled scan exactly."""
        prompts = [list(range(1, 30)), [5, 6, 7]]
        base = engine_factory().generate(prompts, GREEDY)
        monkeypatch.setenv("VFS_UNROLL_LAYERS", "1")
        unrolled = LLMEngine(small_config()).generate(prompts, GREEDY)
        assert list(base.values()) == list(unrolled.values())

    def test_batching_invariance(self, engine_factory):
        """A request's greedy output must not depend on its batch-mates."""
        e1 = engine_factory()
        alone = e1.generate([[5, 6, 7, 8]], GREEDY)[0]
        e2 = LLMEngine(e1.config)  # fresh caches, same seed => same weights
        together = e2.generate(
            [[5, 6, 7, 8], list(range(30, 60)), [9, 9, 9]], GREEDY
        )
        assert together[0] == alone

    def test_chunked_prefill_invariance(self, engine_factory):
        """Tiny token budget (forces many chunks) == huge budget output."""
        cfg_small = small_config(
            scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=8)
        )
        cfg_big = small_config(
            scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=512)
        )
        prompt = list(range(2, 50))
        out_small = LLMEngine(cfg_small).generate([prompt], GREEDY)[0]
        out_big = LLMEngine(cfg_big).generate([prompt], GREEDY)[0]
        assert out_small == out_big

    def test_prefill_determinism(self, engine_factory):
        """Same prompt twice -> identical greedy outputs
        (test_mini_vllm.py:299-320 idiom)."""
        eng = engine_factory()
        a = eng.generate([[3, 1, 4, 1, 5, 9, 2, 6]], GREEDY)
        b = eng.generate([[3, 1, 4, 1, 5, 9, 2, 6]], GREEDY)
        assert list(a.values())[0] == list(b.values())[0]

    def test_int8_kv_close_to_fp32(self):
        """INT8 KV greedy output stays close to fp32 (most tokens agree)."""
        cfg8 = small_config(cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="int8"))
        cfg32 = small_config()
        p = list(range(1, 25))
        sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
        t8 = LLMEngine(cfg8).generate([p], sp)[0]
        t32 = LLMEngine(cfg32).generate([p], sp)[0]
        agree = sum(a == b for a, b in zip(t8, t32))
        assert agree >= 6, f"int8 {t8} vs fp32 {t32}"


class TestEngineLifecycle:
    def test_eos_stops(self, engine_factory):
        eng = engine_factory()
        # temperature 0 on random weights rarely hits eos=0; force eos to the
        # greedy token of step 1 by generating once to learn it.
        probe = eng.generate([[11, 12, 13]], GREEDY)[0]
        eos = probe[1]
        eng2 = LLMEngine(eng.config)
        rid = eng2.add_request([11, 12, 13],
                               SamplingParams(max_new_tokens=6, temperature=0.0,
                                              eos_token_id=eos))
        req = eng2.scheduler.requests[rid]  # finished requests are popped
        while eng2.has_unfinished:
            eng2.step()
        assert req.status == RequestStatus.FINISHED_STOPPED
        assert req.output_token_ids[-1] == eos and len(req.output_token_ids) == 2

    def test_max_new_tokens_finishes(self, engine_factory):
        eng = engine_factory()
        rid = eng.add_request([1, 2, 3], GREEDY)
        req = eng.scheduler.requests[rid]  # finished requests are popped
        while eng.has_unfinished:
            eng.step()
        assert req.status == RequestStatus.FINISHED_LENGTH
        assert len(req.output_token_ids) == 6
        assert eng.kv_mgr.usage == 0.0  # everything freed

    def test_abort(self, engine_factory):
        eng = engine_factory()
        rid = eng.add_request(list(range(1, 10)), GREEDY)
        eng.step()
        assert eng.abort_request(rid)
        assert not eng.has_unfinished
        assert eng.kv_mgr.usage == 0.0

    def test_per_request_state_bounded(self, engine_factory):
        """A long-running server must not accumulate per-request history:
        arrival entries pop at first token (or abort), TTFTs live in a
        bounded window, finished requests leave the scheduler map."""
        eng = engine_factory()
        eng.generate([[1, 2, 3], [4, 5, 6]], GREEDY)
        rid = eng.add_request([7, 8, 9], GREEDY)  # abort before any step
        eng.abort_request(rid)
        assert eng._arrival == {}
        assert len(eng.ttft_seconds()) == 2
        assert all(t >= 0 for t in eng.ttft_seconds())
        assert eng.scheduler.requests == {}

    def test_prefix_cache_reuse(self, engine_factory):
        """Identical second prompt: same output, prefix hits recorded."""
        eng = engine_factory()
        p = list(range(1, 40))
        first = eng.generate([p], GREEDY)
        hits_before = eng.kv_mgr.hit_blocks
        second = eng.generate([p], GREEDY)
        assert list(first.values())[0] == list(second.values())[0]
        assert eng.kv_mgr.hit_blocks > hits_before
        assert eng.kv_mgr.hit_rate > 0

    def test_preemption_recompute(self):
        """A pool too small for two full requests still finishes both."""
        cfg = small_config(
            cache=CacheConfig(block_size=16, num_blocks=7, kv_quant="none",
                              enable_prefix_caching=False),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64,
                                      enable_preemption=True),
        )
        eng = LLMEngine(cfg)
        sp = SamplingParams(max_new_tokens=20, temperature=0.0, ignore_eos=True)
        out = eng.generate([list(range(1, 40)), list(range(40, 80))], sp)
        assert all(len(v) == 20 for v in out.values())
        assert eng.scheduler.stats.num_preempted > 0


class TestPreemptionModes:
    """Victims preempted MID-DECODE must resume their sequence, not restart
    it: kept outputs recompute as catch-up chunks (no re-sampling) under
    RECOMPUTE, and re-inject from host pages under SWAP
    (BLOG_PART3_V2.md:1589-1625).  Greedy outputs must match an
    un-preempted big-pool engine token for token (r4 fix: the old resume
    path re-sampled from the prompt end and re-emitted the sequence head)."""

    PROMPTS = [list(range(1, 40)), list(range(40, 80))]
    SP = SamplingParams(max_new_tokens=24, temperature=0.0, ignore_eos=True)

    def _cfg(self, mode):
        return small_config(
            cache=CacheConfig(block_size=16, num_blocks=7, kv_quant="none",
                              enable_prefix_caching=False),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64,
                                      enable_preemption=True,
                                      preemption_mode=mode),
        )

    @pytest.fixture(scope="class")
    def reference(self):
        big = small_config(
            cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="none",
                              enable_prefix_caching=False),
            scheduler=SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=64))
        return LLMEngine(big).generate([list(p) for p in self.PROMPTS], self.SP)

    def test_recompute_resume_exact(self, reference):
        eng = LLMEngine(self._cfg("recompute"))
        out = eng.generate([list(p) for p in self.PROMPTS], self.SP)
        assert eng.scheduler.stats.num_preempted > 0
        assert eng.scheduler.stats.num_swapped_out == 0
        for rid, toks in reference.items():
            assert out[rid] == toks

    def test_swap_resume_exact(self, reference):
        eng = LLMEngine(self._cfg("swap"))
        out = eng.generate([list(p) for p in self.PROMPTS], self.SP)
        assert eng.scheduler.stats.num_swapped_out > 0
        assert eng.scheduler.stats.num_swapped_in > 0
        for rid, toks in reference.items():
            assert out[rid] == toks

    def test_swap_recomputes_fewer_tokens(self):
        """SWAP's whole point: the victim's computed KV survives, so resume
        pays one page injection instead of an O(context) re-prefill — total
        scheduled tokens must be strictly below RECOMPUTE's on the same
        workload."""
        counts = {}
        for mode in ("recompute", "swap"):
            eng = LLMEngine(self._cfg(mode))
            eng.generate([list(p) for p in self.PROMPTS], self.SP)
            assert eng.scheduler.stats.num_preempted > 0
            counts[mode] = eng.scheduler.stats.num_scheduled_tokens
        assert counts["swap"] < counts["recompute"]

    def test_swap_in_falls_back_to_recompute_when_pool_shrunk(self):
        """A swapped victim whose pages can no longer fit (nothing running
        to free) must recompute from zero, not deadlock."""
        from vllm_from_scratch_tpu.core.kv_cache_manager import KVCacheManager
        from vllm_from_scratch_tpu.core.scheduler import Scheduler

        mgr = KVCacheManager(4, 16)
        s = Scheduler(SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=64,
                                      preemption_mode="swap"), mgr)

        class NoRoomSwapper:
            def swap_in(self, req):
                return False

            def swap_out(self, req):
                return False

        s.swapper = NoRoomSwapper()
        r = Request(req_id=0, prompt_token_ids=list(range(1, 33)),
                    sampling=SamplingParams(max_new_tokens=4, ignore_eos=True))
        r.output_token_ids = [5, 6]
        r.preempt_swapped(pages={"fake": True}, num_tokens=32)
        s.add_request(r)
        r.status = RequestStatus.WAITING
        items = s.schedule()
        # Fallback: swap state dropped, recompute-from-zero admission.
        assert r.swapped_pages is None
        assert items and items[0].request is r
        assert items[0].start_pos == 0
        # Catch-up covers prompt AND the two kept outputs.
        assert items[0].target == r.num_tokens

    def test_inflight_request_never_self_preempts(self):
        """A running decode carrying an unsynced async PLACEHOLDER must not
        self-preempt when its slot allocation fails (ADVICE r4 medium): a
        preempted-then-readmitted request would pack the -1 into a catch-up
        chunk as a real token id.  It skips the step instead; after the
        commit patches the placeholder it may preempt normally."""
        from vllm_from_scratch_tpu.core.kv_cache_manager import KVCacheManager
        from vllm_from_scratch_tpu.core.scheduler import (PLACEHOLDER,
                                                          Scheduler)

        mgr = KVCacheManager(4, 16)  # 3 usable blocks = 48 slots
        s = Scheduler(SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=64), mgr)
        r = Request(req_id=0, prompt_token_ids=list(range(1, 49)),
                    sampling=SamplingParams(max_new_tokens=8, ignore_eos=True))
        s.add_request(r)
        items = s.schedule()          # full 48-token prefill, 3 blocks
        assert items and items[0].num_new_tokens == 48
        records = s.update_async_dispatch(items)  # appends PLACEHOLDER
        assert r.output_token_ids == [PLACEHOLDER]
        assert r.req_id in s._inflight
        # Next decode needs a 4th block: pool is dry, no other victims.
        out = s.schedule()
        assert out == []
        assert r in s.running and r.status is RequestStatus.RUNNING
        assert s.stats.num_preempted == 0
        # Commit the placeholder; NOW the self-preempt may proceed.
        s.update_async_commit(records, [7])
        assert r.req_id not in s._inflight
        out = s.schedule()
        assert out == [] and r in s.waiting
        assert s.stats.num_preempted == 1
        assert PLACEHOLDER not in r.all_token_ids()

    def test_swap_in_rolls_back_on_failed_admission(self):
        """If the chunk allocation fails AFTER a successful swap_in, the
        injected device blocks must be released and the host pages restored
        (ADVICE r4 low): a WAITING request is never a preemption victim, so
        leaving them attached would permanently shrink the pool."""
        from vllm_from_scratch_tpu.core.kv_cache_manager import KVCacheManager
        from vllm_from_scratch_tpu.core.scheduler import Scheduler

        mgr = KVCacheManager(4, 16)  # 3 usable blocks
        s = Scheduler(SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=64,
                                      preemption_mode="swap"), mgr)

        class PoolSwapper:  # engine.swap_in's allocation behavior
            def swap_in(self, req):
                n = req.num_swapped_tokens // 16
                if mgr.pool.get_num_free_blocks() < n:
                    return False
                req.block_ids = list(mgr.pool.get_new_blocks(n))
                req.num_computed_tokens = req.num_swapped_tokens
                req.num_cached_blocks = 0
                req.swapped_pages = None
                req.num_swapped_tokens = 0
                return True

            def swap_out(self, req):
                return False

        s.swapper = PoolSwapper()
        pages = {"fake": True}
        r = Request(req_id=0, prompt_token_ids=list(range(1, 33)),
                    sampling=SamplingParams(max_new_tokens=24, ignore_eos=True))
        r.output_token_ids = [5] * 20        # 52 total tokens
        r.preempt_swapped(pages=pages, num_tokens=32)  # 2 blocks on host
        s.add_request(r)
        r.status = RequestStatus.WAITING
        free0 = mgr.pool.get_num_free_blocks()
        # swap_in injects 2 blocks; the 20-token catch-up chunk then needs 2
        # more but only 1 remains and nothing is running -> admission fails.
        items = s.schedule()
        assert items == []
        assert mgr.pool.get_num_free_blocks() == free0  # injection rolled back
        assert r.block_ids == [] and r.swapped_pages is pages
        assert r.num_swapped_tokens == 32
        assert r in s.waiting and s.stats.num_swapped_in == 0
        # With room freed up, the retry next step succeeds end-to-end.
        s2_free = mgr.pool.get_num_free_blocks()
        assert s2_free == 3


# ---------------------------------------------------------------- scheduler-only

class FakeKV(KVCacheManager):
    pass


def sched(max_tokens=32, max_seqs=4, chunked=True, blocks=256, **kw):
    mgr = KVCacheManager(blocks, 16)
    return Scheduler(
        SchedulerConfig(max_num_seqs=max_seqs, max_num_batched_tokens=max_tokens,
                        enable_chunked_prefill=chunked, **kw),
        mgr,
    )


def req(i, n, max_new=4):
    return Request(req_id=i, prompt_token_ids=list(range(1, n + 1)),
                   sampling=SamplingParams(max_new_tokens=max_new, ignore_eos=True))


class TestScheduler:
    def test_token_budget_respected(self):
        s = sched(max_tokens=32)
        for i in range(4):
            s.add_request(req(i, 30))
        out = s.schedule()
        assert sum(it.num_new_tokens for it in out) <= 32

    def test_chunked_prefill_step_count(self):
        """A 64-token prompt with budget 16 takes >= 4 prefill steps
        (test_mini_vllm.py:117-136 idiom, fake-model update)."""
        s = sched(max_tokens=16)
        s.add_request(req(0, 64))
        steps = 0
        while s.requests[0].is_prefill:
            out = s.schedule()
            assert out and sum(it.num_new_tokens for it in out) <= 16
            s.update(out, [7] * len(out))
            steps += 1
        assert steps >= 4

    def test_no_chunking_requires_full_fit(self):
        s = sched(max_tokens=16, chunked=False)
        s.add_request(req(0, 64))
        assert s.schedule() == []  # cannot admit: prompt > budget

    def test_max_num_seqs_cap(self):
        s = sched(max_tokens=512, max_seqs=2)
        for i in range(5):
            s.add_request(req(i, 8))
        out = s.schedule()
        assert len({it.request.req_id for it in out}) == 2

    def test_slot_mapping_in_bounds(self):
        s = sched(max_tokens=128, blocks=32)
        s.add_request(req(0, 50))
        out = s.schedule()
        for it in out:
            for slot in it.slots:
                assert 16 <= slot < 32 * 16  # not in null block, within pool

    def test_decode_phase_precedes_admission(self):
        """Running decodes get budget before new admissions."""
        s = sched(max_tokens=4, max_seqs=4)
        s.add_request(req(0, 4))
        out = s.schedule()
        s.update(out, [7])
        s.add_request(req(1, 4))
        out2 = s.schedule()
        assert out2[0].request.req_id == 0 and out2[0].num_new_tokens == 1

    def test_max_num_partial_prefills_cap(self):
        """With the cap at 1, only one prompt may be mid-chunk at a time
        (vLLM SchedulerConfig, BLOG_PART2_V2.md:1147-1198)."""
        s = sched(max_tokens=16, max_num_partial_prefills=1)
        s.add_request(req(0, 64))
        s.add_request(req(1, 64))
        out = s.schedule()
        # both need chunking; only req 0 may start
        assert [it.request.req_id for it in out] == [0]

    def test_long_prefill_threshold_lets_short_pass(self):
        """A second LONG prompt is skipped while one long partial prefill is
        in flight, but a short prompt behind it still admits."""
        s = sched(max_tokens=24, long_prefill_token_threshold=20)
        s.add_request(req(0, 64))   # long, will be chunked
        s.add_request(req(1, 64))   # long, must wait
        s.add_request(req(2, 4))    # short, fits entirely
        out = s.schedule()
        ids = [it.request.req_id for it in out]
        assert 0 in ids and 2 in ids and 1 not in ids

    def test_fairness_fcfs(self):
        s = sched(max_tokens=8, max_seqs=8)
        s.add_request(req(0, 8))
        s.add_request(req(1, 8))
        out = s.schedule()
        assert [it.request.req_id for it in out] == [0]  # budget exhausted by r0

    def test_cold_burst_holds_decodes_until_ramp_drains(self):
        """Cold-burst prefill priority: while the burst's prefill backlog
        exceeds one step's token budget, rows that finished their prefill
        are NOT scheduled for decode — they wait at exactly 1 output token
        so the whole batch enters the decode phase depth-synchronized
        (engine decode macros then run with every row live)."""
        s = sched(max_tokens=32, max_seqs=8)
        for i in range(8):
            s.add_request(req(i, 32, max_new=4))  # 8 x 32-token prompts
        saw_hold = False
        first_decode_step = None
        for step in range(64):
            out = s.schedule()
            if not out and not s.waiting:
                break
            decodes = [it for it in out if it.num_new_tokens == 1]
            finished_prefills = sum(
                1 for r in s.running if not r.is_prefill and r.output_token_ids)
            if decodes and first_decode_step is None:
                first_decode_step = step
                # every burst row enters decode depth-synchronized
                assert all(len(it.request.output_token_ids) == 1
                           for it in decodes)
            if first_decode_step is None and finished_prefills >= 2:
                assert not decodes  # hold active while backlog > budget
                saw_hold = True
            s.update(out, [7] * len(out))
        assert saw_hold and first_decode_step is not None

    def test_steady_serving_never_holds_decodes(self):
        """A mature decode row (> 1 output token) disables the cold-burst
        hold: decode keeps its per-step cadence even while a large arrival
        backlog queues (ITL must not stall behind admissions)."""
        s = sched(max_tokens=32, max_seqs=8)
        s.add_request(req(0, 16, max_new=32))
        while len(s.requests[0].output_token_ids) < 3:
            out = s.schedule()
            s.update(out, [7] * len(out))
        for i in range(1, 7):
            s.add_request(req(i, 32, max_new=4))  # 6 x 32 = 192 > budget
        out = s.schedule()
        assert any(it.num_new_tokens == 1
                   and it.request.req_id == 0 for it in out)


# ---------------------------------------------------------------- sampling stats

class TestSamplingBehavior:
    def test_temperature_spreads_support(self, engine_factory):
        """Hot sampling visits more distinct tokens than greedy
        (test_mini_vllm.py:195-211 idiom)."""
        eng = engine_factory()
        sp_hot = SamplingParams(max_new_tokens=30, temperature=2.0, ignore_eos=True)
        hot = eng.generate([[1, 2, 3]], sp_hot)
        greedy = LLMEngine(eng.config).generate(
            [[1, 2, 3]], SamplingParams(max_new_tokens=30, temperature=0.0, ignore_eos=True)
        )
        assert len(set(list(hot.values())[0])) > len(set(list(greedy.values())[0]))

    def test_top_p_narrows(self, engine_factory):
        eng = engine_factory()
        sp = SamplingParams(max_new_tokens=30, temperature=2.0, top_p=0.05, ignore_eos=True)
        narrow = eng.generate([[1, 2, 3]], sp)
        sp2 = SamplingParams(max_new_tokens=30, temperature=2.0, ignore_eos=True)
        wide = LLMEngine(eng.config).generate([[1, 2, 3]], sp2)
        assert len(set(list(narrow.values())[0])) <= len(set(list(wide.values())[0]))


class TestAsyncScheduling:
    """Async scheduling (SchedulerConfig.async_scheduling, vLLM V1's
    --async-scheduling): prefill/mixed step N+1 is scheduled and dispatched
    against placeholder tokens BEFORE step N's host sync; decode rows read
    their current token on-device from step N's output.  Emission shifts one
    step later; token streams must be identical."""

    def _run(self, cfg, async_on, prompts, sp, stagger=0):
        eng = LLMEngine(cfg)
        eng._async_ok = eng._async_ok and async_on
        outs = {}
        ids = []
        for p in prompts[:len(prompts) - stagger or None]:
            rid = eng.add_request(list(p), sp)
            outs[rid] = []
            ids.append(rid)
        steps = 0
        while eng.has_unfinished and steps < 400:
            for rid, t in eng.step():
                outs[rid].append(t)
            steps += 1
            if stagger and steps == 3:
                for p in prompts[len(prompts) - stagger:]:
                    rid = eng.add_request(list(p), sp)
                    outs[rid] = []
                    ids.append(rid)
                stagger = 0
        return [outs[r] for r in ids]

    def test_greedy_exact_vs_sync(self):
        cfg = small_config(
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=32))
        sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
        prompts = [list(range(1, 40)), [5, 6, 7], list(range(50, 75)),
                   [9, 10, 11, 12]]
        a = self._run(cfg, True, prompts, sp, stagger=2)
        b = self._run(cfg, False, prompts, sp, stagger=2)
        assert a == b
        assert all(len(o) == 8 for o in a)

    def test_eos_truncates_inflight_successor(self):
        """A request whose EOS is discovered at commit time already has a
        wasted successor token in flight — output must stop AT the EOS."""
        cfg = small_config(
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=32))
        sp0 = SamplingParams(max_new_tokens=12, temperature=0.0,
                             ignore_eos=True)
        probe = self._run(cfg, False, [[11, 12, 13], list(range(20, 60))],
                          sp0, stagger=1)[0]
        eos = probe[2]  # finish the short request on its 3rd greedy token
        sp = SamplingParams(max_new_tokens=12, temperature=0.0,
                            eos_token_id=eos)
        a = self._run(cfg, True, [[11, 12, 13], list(range(20, 60))], sp,
                      stagger=1)
        b = self._run(cfg, False, [[11, 12, 13], list(range(20, 60))], sp,
                      stagger=1)
        assert a == b
        assert a[0][-1] == eos and len(a[0]) == 3

    def test_warmup_precompiles_and_is_output_neutral(self):
        """engine.warmup() executes the serving program set on all-pad
        dummy rows; a warmed engine must produce the same tokens as a
        fresh one (pads only touch the null block)."""
        mk = lambda: LLMEngine(small_config(
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=64)))
        sp = SamplingParams(max_new_tokens=6, temperature=0.0,
                            ignore_eos=True)
        prompts = [list(range(1, 30)), [5, 6, 7]]
        warmed = mk()
        assert warmed.warmup(prompt_lens=(40,)) > 0
        a = warmed.generate([list(p) for p in prompts], sp)
        b = mk().generate([list(p) for p in prompts], sp)
        assert a == b

    def test_mixed_macro_exact_and_engaged(self):
        """The fused prefill + K-step decode macro (mixed_steps > 1) must
        engage when decode rows coexist with prefill chunks and reproduce
        the sync engine's tokens exactly (EOS handling included via the
        max_new_tokens cap)."""
        cfg = small_config(
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=32,
                                      mixed_steps=4))
        sp = SamplingParams(max_new_tokens=10, temperature=0.0,
                            ignore_eos=True)
        prompts = [list(range(1, 40)), [5, 6, 7], list(range(50, 75)),
                   [9, 10, 11]]

        def run(async_on):
            eng = LLMEngine(cfg)
            eng._async_ok = eng._async_ok and async_on
            n = {"macro": 0}
            orig = eng._dispatch_async_macro

            def wrap(*a, **k):
                r = orig(*a, **k)
                if r is not None:
                    n["macro"] += 1
                return r

            eng._dispatch_async_macro = wrap
            outs = {r: [] for r in
                    (eng.add_request(list(p), sp) for p in prompts)}
            steps = 0
            while eng.has_unfinished and steps < 300:
                for rid, t in eng.step():
                    outs[rid].append(t)
                steps += 1
            return [outs[k] for k in sorted(outs)], n["macro"]

        a, n_async = run(True)
        b, n_sync = run(False)
        assert a == b
        assert all(len(o) == 10 for o in a)
        assert n_async >= 1 and n_sync == 0

    def test_placeholder_never_enters_prefix_cache(self):
        """Block hashes must never be computed over a placeholder: serve a
        request whose outputs fill a block while async, then verify a second
        request sharing the (prompt+output) prefix hits the cache and
        reproduces the sync engine's tokens."""
        from vllm_from_scratch_tpu.core.scheduler import PLACEHOLDER

        cfg = small_config(
            scheduler=SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=32))
        eng = LLMEngine(cfg)
        sp = SamplingParams(max_new_tokens=20, temperature=0.0,
                            ignore_eos=True)
        rid = eng.add_request(list(range(1, 17)), sp)  # 16 = one full block
        req = eng.scheduler.requests[rid]
        while eng.has_unfinished:
            eng.step()
            for h in req.block_hashes:
                assert h is not None
        assert PLACEHOLDER not in req.output_token_ids
        # 16 prompt + 20 output = 36 tokens -> 2 full blocks cacheable.
        hit_req = eng.add_request(
            list(range(1, 17)) + req.output_token_ids, sp)
        hr = eng.scheduler.requests[hit_req]
        eng.scheduler.schedule()
        assert hr.num_computed_tokens >= 16  # prefix-cache hit across outputs


class TestMixedStep:
    """The fused prefill+decode step (transformer.forward_mixed): when a
    chunked prefill runs while other requests decode, ONE device call
    serves both groups and must reproduce the two-call path exactly
    (greedy).  VERDICT r2 #3's mixed ragged step."""

    def _staggered_run(self, cfg, disable_mixed):
        eng = LLMEngine(cfg)
        eng._async_ok = False  # pin the SYNC mixed path (async has its own tests)
        if disable_mixed:
            eng._mixed_ok = False
        mixed_calls = {"n": 0}
        orig = eng._run_mixed

        def counting(*a, **k):
            mixed_calls["n"] += 1
            return orig(*a, **k)

        eng._run_mixed = counting
        sp = SamplingParams(max_new_tokens=10, temperature=0.0,
                            ignore_eos=True)
        a = eng.add_request([5, 6, 7, 8], sp)
        # Let A settle into decode, then admit B whose 48-token prompt
        # chunks over several steps (budget 16) while A keeps decoding.
        outs = {a: []}
        for _ in range(4):
            for rid, t in eng.step():
                outs.setdefault(rid, []).append(t)
        b = eng.add_request(list(range(2, 50)), sp)
        outs[b] = []
        while eng.has_unfinished:
            for rid, t in eng.step():
                outs.setdefault(rid, []).append(t)
        return outs, mixed_calls["n"]

    def _cfg(self, **model_kw):
        defaults = dict(vocab_size=128, hidden_size=64, num_layers=2,
                        num_heads=4, num_kv_heads=2, max_position=256)
        defaults.update(model_kw)
        return EngineConfig(
            model=ModelConfig(**defaults),
            cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="none"),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=16,
                                      decode_steps=1),
        )

    def test_matches_two_call_path_mha(self):
        cfg = self._cfg()
        mixed, n_mixed = self._staggered_run(cfg, disable_mixed=False)
        ref, n_ref = self._staggered_run(cfg, disable_mixed=True)
        assert n_mixed > 0, "mixed path never triggered"
        assert n_ref == 0
        assert mixed == ref

    def test_matches_two_call_path_mla_moe(self):
        cfg = self._cfg(kv_lora_rank=16, qk_rope_head_dim=8,
                        qk_nope_head_dim=16, v_head_dim=16,
                        num_experts=4, top_k=2, num_shared_experts=1)
        mixed, n_mixed = self._staggered_run(cfg, disable_mixed=False)
        ref, n_ref = self._staggered_run(cfg, disable_mixed=True)
        assert n_mixed > 0, "mixed path never triggered"
        assert mixed == ref


class TestMultiStepDecode:
    """decode_steps > 1: K autoregressive iterations per jitted call
    (the TPU answer to per-step host sync; vLLM's num-scheduler-steps)."""

    def _cfg(self, K, max_new=13):
        return small_config(
            scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                      decode_steps=K),
        )

    def test_k8_matches_k1(self):
        sp = SamplingParams(max_new_tokens=13, temperature=0.0, ignore_eos=True)
        prompts = [list(range(1, 21)), [7, 8, 9], list(range(40, 70))]
        o1 = LLMEngine(self._cfg(1)).generate(prompts, sp)
        o8 = LLMEngine(self._cfg(8)).generate(prompts, sp)
        assert o1 == o8

    def test_eos_mid_macro_truncates(self):
        sp = SamplingParams(max_new_tokens=13, temperature=0.0, ignore_eos=True)
        probe = LLMEngine(self._cfg(1)).generate([list(range(1, 21))], sp)[0]
        eos = probe[5]
        first = probe.index(eos)
        sp_eos = SamplingParams(max_new_tokens=13, temperature=0.0, eos_token_id=eos)
        eng = LLMEngine(self._cfg(8))
        out = eng.generate([list(range(1, 21))], sp_eos)[0]
        assert out == probe[: first + 1]
        assert eng.kv_mgr.usage == 0.0  # blocks freed despite mid-macro finish

    def test_max_new_exact(self):
        """K not dividing max_new_tokens still stops exactly."""
        sp = SamplingParams(max_new_tokens=7, temperature=0.0, ignore_eos=True)
        eng = LLMEngine(self._cfg(4))
        out = eng.generate([[1, 2, 3]], sp)[0]
        assert len(out) == 7

    def test_failed_preallocation_rolls_back(self):
        """When a later request's K-token pre-allocation fails, the earlier
        grants must be returned to the pool (VERDICT r1 weak #7) — otherwise
        the 1-step fallback runs with exactly the over-commit that caused it."""
        cfg = small_config(
            cache=CacheConfig(block_size=16, num_blocks=6, kv_quant="none"),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64,
                                      decode_steps=48),
        )
        eng = LLMEngine(cfg)
        sp = SamplingParams(max_new_tokens=64, temperature=0.0, ignore_eos=True)
        eng.add_request(list(range(1, 17)), sp)
        eng.add_request(list(range(20, 36)), sp)
        eng.step()  # prefill both (1 block each)
        scheduled = eng.scheduler.schedule()  # decode items (+1 block each)
        assert all(it.num_new_tokens == 1 for it in scheduled)
        free_before = eng.kv_mgr.pool.get_num_free_blocks()
        blocks_before = [len(it.request.block_ids) for it in scheduled]
        # K buckets 48 -> 32, needing 1 more block per request; free_before
        # (1) covers only the first request's grant -> fallback + rollback.
        assert eng._try_multi_step(scheduled) is False
        assert eng.kv_mgr.pool.get_num_free_blocks() == free_before
        assert [len(it.request.block_ids) for it in scheduled] == blocks_before

    def test_chain_survives_staggered_finishes(self):
        """Rows with different max_new_tokens finish at different macros;
        the continuation CHAIN must carry the finished rows as masked pads
        instead of breaking (r5 B=64 host-gap fix) and tokens must match
        the K=1 engine exactly."""
        prompts = [list(range(1, 21)), [7, 8, 9], list(range(40, 70))]
        maxes = [5, 11, 23]

        def run(K):
            eng = LLMEngine(self._cfg(K))
            conts = {"n": 0}
            orig = eng._dispatch_continuation

            def counting(p):
                c = orig(p)
                if c is not None:
                    conts["n"] += 1
                return c

            eng._dispatch_continuation = counting
            ids = [eng.add_request(list(p),
                                   SamplingParams(max_new_tokens=m,
                                                  temperature=0.0,
                                                  ignore_eos=True))
                   for p, m in zip(prompts, maxes)]
            outs = {r: [] for r in ids}
            while eng.has_unfinished:
                for rid, t in eng.step():
                    outs[rid].append(t)
            assert eng.kv_mgr.usage == 0.0  # masked rows' blocks all freed
            return outs, conts["n"]

        o1, _ = run(1)
        o4, n_cont = run(4)
        assert o4 == o1
        assert [len(v) for v in o4.values()] == maxes
        # max_new spread 5..23 at K=4 needs >= 4 further macros after the
        # first — the chain kept going across the 5- and 11-token finishes.
        assert n_cont >= 3

    def test_mixed_arrivals_fall_back(self):
        """A prefill arriving between macro-steps still gets served."""
        eng = LLMEngine(self._cfg(8))
        sp = SamplingParams(max_new_tokens=16, temperature=0.0, ignore_eos=True)
        r0 = eng.add_request(list(range(1, 10)), sp)
        req0 = eng.scheduler.requests[r0]  # finished requests are popped
        eng.step()  # prefill r0
        eng.step()  # macro decode r0
        r1 = eng.add_request(list(range(30, 45)), sp)
        req1 = eng.scheduler.requests[r1]
        while eng.has_unfinished:
            eng.step()
        assert len(req0.output_token_ids) == 16
        assert len(req1.output_token_ids) == 16


class TestPriorityPolicy:
    """policy='priority' (blog scheduler BLOG_PART2.md:853-858): lower value
    = more urgent; admission order honors it and preemption victimizes the
    least urgent."""

    def _sched(self, **kw):
        mgr = KVCacheManager(kw.pop("blocks", 256), 16)
        return Scheduler(
            SchedulerConfig(max_num_seqs=kw.pop("max_seqs", 4),
                            max_num_batched_tokens=kw.pop("max_tokens", 32),
                            policy="priority", **kw),
            mgr,
        )

    def _req(self, i, n, priority):
        import time as _t

        r = Request(req_id=i, prompt_token_ids=list(range(1, n + 1)),
                    sampling=SamplingParams(max_new_tokens=4, ignore_eos=True),
                    priority=priority)
        r.arrival_time = _t.monotonic()
        return r

    def test_admission_orders_by_priority(self):
        s = self._sched(max_tokens=16)
        s.add_request(self._req(0, 16, priority=5))   # arrives first, low prio
        s.add_request(self._req(1, 16, priority=0))   # urgent
        out = s.schedule()
        assert out[0].request.req_id == 1

    def test_preemption_victimizes_lowest_priority(self):
        """_preempt_one picks the (priority, arrival)-max running request,
        never a request already scheduled (protected) this step."""
        s = self._sched(blocks=64, max_tokens=256, max_seqs=4)
        urgent, lazy = self._req(0, 32, priority=1), self._req(1, 32, priority=5)
        for r in (urgent, lazy):
            s.add_request(r)
        items = s.schedule()
        s.update(items, [7] * len(items))
        assert urgent in s.running and lazy in s.running

        ok = s._preempt_one(exclude=None, protected=set())
        assert ok
        assert lazy not in s.running and lazy in s.waiting   # victim: prio 5
        assert urgent in s.running
        assert s.stats.num_preempted == 1
        assert lazy.num_computed_tokens == 0                 # recompute mode

        # protected requests are never victimized
        ok2 = s._preempt_one(exclude=None, protected={urgent.req_id})
        assert not ok2 and urgent in s.running
