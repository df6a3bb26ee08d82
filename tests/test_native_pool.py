"""Native (C++) block pool == Python block pool, under randomized op traces.

The Python pool (core/block_pool.py) carries the ported reference test suite
(test_block_pool.py); here the native pool is held to bit-identical behavior
— same allocated ids, same LRU order, same cache hits, same OOM points —
over thousands of random operations, plus the KVCacheManager running on it.
"""

import hashlib
import random

import pytest

from vllm_from_scratch_tpu.core.block_pool import BlockPool

native = pytest.importorskip("vllm_from_scratch_tpu.native")
if native.load_native_pool_lib() is None:
    pytest.skip("no C++ toolchain for the native pool", allow_module_level=True)

NativeBlockPool = native.NativeBlockPool


def h(i: int) -> bytes:
    return hashlib.sha256(str(i).encode()).digest()


class TestEquivalence:
    def test_randomized_trace(self):
        rng = random.Random(0)
        N = 64
        py = BlockPool(N)
        cc = NativeBlockPool(N)
        held = []          # lists of (ids, hashes) currently allocated
        next_hash = 0

        for step in range(3000):
            op = rng.random()
            if op < 0.35:  # allocate
                k = rng.randint(1, 6)
                try:
                    ids_py = py.get_new_blocks(k)
                    ok_py = True
                except RuntimeError:
                    ok_py = False
                try:
                    ids_cc = cc.get_new_blocks(k)
                    ok_cc = True
                except RuntimeError:
                    ok_cc = False
                assert ok_py == ok_cc, f"OOM divergence at step {step}"
                if ok_py:
                    assert ids_py == ids_cc, f"alloc ids diverge at {step}"
                    hs = [h(next_hash + i) for i in range(k)]
                    next_hash += k
                    held.append((ids_py, hs))
            elif op < 0.55 and held:  # cache full blocks then free
                ids, hs = held.pop(rng.randrange(len(held)))
                nc = rng.randint(0, len(ids))
                py.cache_full_blocks(ids, hs, 0, nc)
                cc.cache_full_blocks(ids, hs, 0, nc)
                py.free_blocks(ids)
                cc.free_blocks(ids)
            elif op < 0.75:  # prefix lookup (+ touch on hit)
                probe = h(rng.randrange(max(next_hash, 1)))
                got_py = py.get_cached_block(probe)
                got_cc = cc.get_cached_block(probe)
                assert got_py == got_cc, f"cache lookup diverges at {step}"
                if got_py is not None and py.ref_cnt[got_py] == 0:
                    py.touch([got_py])
                    cc.touch([got_py])
                    held.append(([got_py], [probe]))
            elif op < 0.9 and held:  # plain free
                ids, _ = held.pop(rng.randrange(len(held)))
                py.free_blocks(ids)
                cc.free_blocks(ids)
            else:
                assert py.get_num_free_blocks() == cc.get_num_free_blocks()
                assert py.free_queue.order() == cc.lru_order(), f"LRU diverges at {step}"

        assert py.get_num_free_blocks() == cc.get_num_free_blocks()
        assert py.free_queue.order() == cc.lru_order()

    def test_null_block_pinned(self):
        cc = NativeBlockPool(8)
        assert cc.ref_count(0) == 1
        ids = cc.get_new_blocks(7)  # all but null
        assert 0 not in ids
        with pytest.raises(RuntimeError):
            cc.get_new_blocks(1)

    def test_reset_prefix_cache_contract(self):
        cc = NativeBlockPool(8)
        ids = cc.get_new_blocks(2)
        hs = [h(1), h(2)]
        cc.cache_full_blocks(ids, hs, 0, 2)
        assert cc.reset_prefix_cache() is False  # blocks still held
        cc.free_blocks(ids)
        assert cc.get_cached_block(hs[0]) == ids[0]
        assert cc.reset_prefix_cache() is True
        assert cc.get_cached_block(hs[0]) is None

    def test_lru_eviction_clears_hash(self):
        cc = NativeBlockPool(4)  # null + 3
        ids = cc.get_new_blocks(3)
        hs = [h(10), h(11), h(12)]
        cc.cache_full_blocks(ids, hs, 0, 3)
        cc.free_blocks(ids)
        again = cc.get_new_blocks(3)   # evicts all three, LRU order
        assert again == ids
        for x in hs:
            assert cc.get_cached_block(x) is None


class TestManagerOnNativePool:
    def test_engine_generate_on_native_pool(self):
        """Full engine serve loop with pool_impl='native'."""
        import jax

        from vllm_from_scratch_tpu.core.config import (
            CacheConfig, EngineConfig, ModelConfig, SamplingParams,
            SchedulerConfig,
        )
        from vllm_from_scratch_tpu.core.engine import LLMEngine
        from vllm_from_scratch_tpu.core.kv_cache_manager import KVCacheManager

        cfg = EngineConfig(
            model=ModelConfig(vocab_size=128, hidden_size=32, num_layers=1,
                              num_heads=2, num_kv_heads=2, max_position=128,
                              intermediate_size=32),
            cache=CacheConfig(block_size=16, num_blocks=32),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64),
        )
        eng = LLMEngine(cfg)
        eng.kv_mgr = KVCacheManager(32, 16, pool_impl="native")
        eng.scheduler.kv = eng.kv_mgr
        sp = SamplingParams(max_new_tokens=5, temperature=0.0, ignore_eos=True)
        out = eng.generate([[1, 2, 3, 4], [9, 8, 7]], sp)
        assert all(len(v) == 5 for v in out.values())
