"""Engine fuzzing: random request interleavings + block-accounting invariants.

A serving engine's failure mode is state corruption under odd interleavings
(admissions racing preemptions, aborts mid-prefill, pool pressure).  This
drives the whole engine with seeded random traffic and checks conservation
invariants after every step — the strongest state-machine test in the suite.
"""

import random

import pytest

from vllm_from_scratch_tpu.core.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_from_scratch_tpu.core.engine import LLMEngine
from vllm_from_scratch_tpu.core.request import RequestStatus


def small_engine(num_blocks=24, decode_steps=1, pool_impl="auto"):
    from vllm_from_scratch_tpu.core.kv_cache_manager import KVCacheManager

    eng = LLMEngine(EngineConfig(
        model=ModelConfig(vocab_size=64, hidden_size=32, num_layers=1,
                          num_heads=2, num_kv_heads=2, max_position=256,
                          intermediate_size=32),
        cache=CacheConfig(block_size=16, num_blocks=num_blocks),
        scheduler=SchedulerConfig(max_num_seqs=3, max_num_batched_tokens=48,
                                  decode_steps=decode_steps),
    ))
    if pool_impl != "auto":
        eng.kv_mgr = KVCacheManager(num_blocks, 16, pool_impl=pool_impl)
        eng.scheduler.kv = eng.kv_mgr
    return eng


def check_invariants(eng):
    pool = eng.kv_mgr.pool
    nb = pool.num_blocks
    free = pool.get_num_free_blocks()
    # Conservation: every non-null block is either free or referenced.
    held = set()
    for req in eng.scheduler.running:
        for bid in req.block_ids:
            held.add(bid)
    # free + held can under-count shared blocks (shared prefix = one block in
    # several tables) but never OVER-count capacity:
    assert free <= nb - 1, "free count exceeds capacity"
    assert all(0 < b < nb for b in held), "held block id out of range"
    # waiting requests hold no mid-flight blocks after preemption/abort
    for req in eng.scheduler.waiting:
        if req.status is RequestStatus.WAITING:
            assert req.num_computed_tokens == 0 or req.block_ids, (
                "computed tokens without blocks")
    # usage is a sane fraction
    assert 0.0 <= eng.kv_mgr.usage <= 1.0


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("decode_steps", [1, 4])
@pytest.mark.parametrize("pool_impl", ["auto", "python"])
def test_random_traffic(seed, decode_steps, pool_impl):
    rng = random.Random(seed)
    eng = small_engine(decode_steps=decode_steps, pool_impl=pool_impl)
    live = []
    done = {}
    submitted = 0

    for step in range(120):
        r = rng.random()
        if r < 0.25 and submitted < 12:
            n = rng.randint(1, 70)
            sp = SamplingParams(
                max_new_tokens=rng.randint(1, 10),
                temperature=rng.choice([0.0, 1.0]),
                ignore_eos=rng.random() < 0.7,
            )
            rid = eng.add_request([rng.randint(1, 63) for _ in range(n)], sp)
            live.append(rid)
            submitted += 1
        elif r < 0.32 and live:
            victim = rng.choice(live)
            eng.abort_request(victim)
            live.remove(victim)
            done[victim] = "aborted"
        else:
            for rid, tok in eng.step():
                assert 0 <= tok < 64, "sampled token out of vocab"
        check_invariants(eng)

    # Drain: everything finishes, nothing wedges.
    for _ in range(400):
        if not eng.has_unfinished:
            break
        eng.step()
        check_invariants(eng)
    assert not eng.has_unfinished, "engine wedged with unfinished requests"

    # After the dust settles every block is reclaimable: the prefix cache
    # can be reset (no request holds blocks) and usage returns to 0.
    assert eng.kv_mgr.reset_prefix_cache() is True
    assert eng.kv_mgr.usage == 0.0


def test_oom_pressure_never_wedges():
    """Tiny pool + oversized demand: preemption thrashes but the engine
    still finishes everything (recompute guarantees forward progress for
    at least one request at a time)."""
    eng = small_engine(num_blocks=12)  # 11 usable blocks = 176 tokens
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
    for i in range(4):
        eng.add_request(list(range(1, 50 + i)), sp)
    for _ in range(600):
        if not eng.has_unfinished:
            break
        eng.step()
        check_invariants(eng)
    assert not eng.has_unfinished
    assert eng.kv_mgr.reset_prefix_cache() is True


def test_random_traffic_with_ngram_spec():
    """The fuzz invariants hold with n-gram speculative decoding active
    (spec steps allocate K+1 slots ahead and emit bursts)."""
    from vllm_from_scratch_tpu.core.config import SpecConfig

    rng = random.Random(3)
    eng = LLMEngine(EngineConfig(
        model=ModelConfig(vocab_size=64, hidden_size=32, num_layers=1,
                          num_heads=2, num_kv_heads=2, max_position=256,
                          intermediate_size=32),
        cache=CacheConfig(block_size=16, num_blocks=24),
        scheduler=SchedulerConfig(max_num_seqs=3, max_num_batched_tokens=48),
        spec=SpecConfig(method="ngram", num_draft_tokens=3, ngram_n=2),
    ))
    submitted = 0
    for step in range(100):
        if rng.random() < 0.3 and submitted < 8:
            n = rng.randint(1, 60)
            base = [rng.randint(1, 63) for _ in range(max(1, n // 3))]
            prompt = (base * 3)[:n] or [1]   # repetitive => proposals fire
            eng.add_request(prompt, SamplingParams(
                max_new_tokens=rng.randint(1, 8),
                temperature=rng.choice([0.0, 1.0]), ignore_eos=True))
            submitted += 1
        else:
            for rid, tok in eng.step():
                assert 0 <= tok < 64
        check_invariants(eng)
    for _ in range(300):
        if not eng.has_unfinished:
            break
        eng.step()
        check_invariants(eng)
    assert not eng.has_unfinished
    assert eng.kv_mgr.reset_prefix_cache() is True
