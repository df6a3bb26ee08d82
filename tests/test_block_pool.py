"""Block pool / prefix cache tests.

Ports the behavioral contract of the reference suite
02_kvcache/test_block_pool_lru.py (12 cases) to the id-based pool, plus
chained-SHA-256 hashing invariants from 06's hash tests.
"""

import pytest

from vllm_from_scratch_tpu.core.block_pool import BlockPool, FreeBlockQueue
from vllm_from_scratch_tpu.core.config import SamplingParams
from vllm_from_scratch_tpu.core.hashing import (
    compute_block_hash,
    compute_block_hashes,
)
from vllm_from_scratch_tpu.core.kv_cache_manager import KVCacheManager
from vllm_from_scratch_tpu.core.request import Request


# ---------------------------------------------------------------- free queue

class TestFreeBlockQueue:
    def test_initial_order_is_id_order(self):
        q = FreeBlockQueue(5)
        assert q.order() == [0, 1, 2, 3, 4]
        assert q.num_free_blocks == 5

    def test_popleft_is_fifo_lru(self):
        q = FreeBlockQueue(4)
        assert q.popleft() == 0
        assert q.popleft() == 1
        assert q.num_free_blocks == 2

    def test_append_goes_to_tail(self):
        q = FreeBlockQueue(3)
        a = q.popleft()
        q.append(a)
        assert q.order() == [1, 2, 0]

    def test_remove_from_middle(self):
        q = FreeBlockQueue(4)
        q.remove(2)
        assert q.order() == [0, 1, 3]
        assert 2 not in q
        assert 0 in q

    def test_popleft_empty_raises(self):
        q = FreeBlockQueue(1)
        q.popleft()
        with pytest.raises(RuntimeError, match="OOM|No free"):
            q.popleft()

    def test_popleft_n(self):
        q = FreeBlockQueue(5)
        assert q.popleft_n(3) == [0, 1, 2]


# ---------------------------------------------------------------- block pool

@pytest.fixture
def pool():
    return BlockPool(num_blocks=8, enable_caching=True)


def h(i: int) -> bytes:
    return compute_block_hash(None, [i] * 4)


class TestBlockPool:
    def test_null_block_pinned(self, pool):
        assert pool.null_block == 0
        assert pool.ref_cnt[0] == 1
        assert 0 not in pool.free_queue
        # freeing everything never returns the null block
        ids = pool.get_new_blocks(pool.get_num_free_blocks())
        assert 0 not in ids

    def test_allocate_sets_refcount(self, pool):
        ids = pool.get_new_blocks(3)
        assert ids == [1, 2, 3]
        assert all(pool.ref_cnt[i] == 1 for i in ids)
        assert pool.get_num_free_blocks() == 4

    def test_oom_raises(self, pool):
        with pytest.raises(RuntimeError, match="OOM"):
            pool.get_new_blocks(8)

    def test_free_requeues_at_tail(self, pool):
        ids = pool.get_new_blocks(2)  # [1, 2]
        pool.free_blocks(ids)
        assert pool.free_queue.order() == [3, 4, 5, 6, 7, 1, 2]

    def test_lru_eviction_order(self, pool):
        """Blocks freed earliest get re-allocated (evicted) first."""
        a = pool.get_new_blocks(2)
        b = pool.get_new_blocks(2)
        pool.free_blocks(b)  # frees [3,4] first
        pool.free_blocks(a)  # then [1,2]
        pool.get_new_blocks(3)  # consume remaining fresh [5,6,7]
        assert pool.get_new_blocks(2) == b  # LRU: b before a

    def test_cache_and_hit(self, pool):
        ids = pool.get_new_blocks(2)
        pool.cache_full_blocks(ids, [h(0), h(1)], 0, 2)
        assert pool.get_cached_block(h(0)) == ids[0]
        assert pool.get_cached_block(h(1)) == ids[1]
        assert pool.get_cached_block(h(9)) is None

    def test_cached_block_survives_free_until_evicted(self, pool):
        ids = pool.get_new_blocks(1)
        pool.cache_full_blocks(ids, [h(0)], 0, 1)
        pool.free_blocks(ids)
        # still discoverable after free
        assert pool.get_cached_block(h(0)) == ids[0]
        # allocate enough to force eviction of that block
        pool.get_new_blocks(7)
        assert pool.get_cached_block(h(0)) is None

    def test_touch_revives_from_free_queue(self, pool):
        ids = pool.get_new_blocks(1)
        pool.cache_full_blocks(ids, [h(0)], 0, 1)
        pool.free_blocks(ids)
        bid = pool.get_cached_block(h(0))
        pool.touch([bid])
        assert pool.ref_cnt[bid] == 1
        assert bid not in pool.free_queue
        # refcount sharing: touch again
        pool.touch([bid])
        assert pool.ref_cnt[bid] == 2
        pool.free_blocks([bid])
        assert bid not in pool.free_queue  # still referenced once
        pool.free_blocks([bid])
        assert bid in pool.free_queue

    def test_hash_collision_copies(self, pool):
        """Two physical blocks may hold the same content hash."""
        a = pool.get_new_blocks(1)
        b = pool.get_new_blocks(1)
        pool.cache_full_blocks(a, [h(0)], 0, 1)
        pool.cache_full_blocks(b, [h(0)], 0, 1)
        assert pool.get_cached_block(h(0)) in (a[0], b[0])
        pool.free_blocks(a)
        pool.get_new_blocks(6)  # evict copy a
        assert pool.get_cached_block(h(0)) == b[0]

    def test_reset_prefix_cache(self, pool):
        ids = pool.get_new_blocks(1)
        pool.cache_full_blocks(ids, [h(0)], 0, 1)
        assert pool.reset_prefix_cache() is False  # blocks still held
        pool.free_blocks(ids)
        assert pool.reset_prefix_cache() is True
        assert pool.get_cached_block(h(0)) is None

    def test_usage(self, pool):
        assert pool.get_usage() == 0.0
        pool.get_new_blocks(7)
        assert pool.get_usage() == 1.0


# ---------------------------------------------------------------- hashing

class TestBlockHashing:
    def test_deterministic(self):
        assert compute_block_hash(None, [1, 2, 3]) == compute_block_hash(None, [1, 2, 3])

    def test_chain_dependence(self):
        """Same tokens after different prefixes hash differently
        (test_global_kv_pool.py:32-41 analogue)."""
        h1 = compute_block_hashes([1, 2, 3, 4, 5, 6, 7, 8], block_size=4)
        h2 = compute_block_hashes([9, 9, 9, 9, 5, 6, 7, 8], block_size=4)
        assert h1[1] != h2[1]  # identical 2nd block, different parent

    def test_partial_block_skipped(self):
        assert len(compute_block_hashes(list(range(10)), block_size=4)) == 2

    def test_extra_key_salts(self):
        assert compute_block_hash(None, [1, 2], "lora-a") != compute_block_hash(
            None, [1, 2], "lora-b"
        )

    def test_prefix_property(self):
        """Shared prefix => shared leading hashes."""
        a = compute_block_hashes(list(range(16)), 4)
        b = compute_block_hashes(list(range(12)) + [99, 98, 97, 96], 4)
        assert a[:3] == b[:3] and a[3] != b[3]


# ---------------------------------------------------------------- manager

def make_request(req_id, tokens, **kw):
    return Request(req_id=req_id, prompt_token_ids=list(tokens),
                   sampling=SamplingParams(**kw))


@pytest.fixture
def mgr():
    return KVCacheManager(num_blocks=32, block_size=4)


class TestKVCacheManager:
    def test_allocate_and_slot_mapping(self, mgr):
        req = make_request(0, range(10))
        new = mgr.allocate_slots(req, 10)
        assert len(new) == 3  # ceil(10/4)
        slots = mgr.slot_mapping(req, 0, 10)
        assert len(slots) == 10
        bs = mgr.block_size
        for p, s in enumerate(slots):
            assert s == req.block_ids[p // bs] * bs + p % bs
        # all slots land in allocated (non-null) blocks
        assert all(s // bs in req.block_ids for s in slots)

    def test_prefix_hit_reuses_block_ids(self, mgr):
        """Second request with the same prompt hits the cached prefix
        (test_mini_vllm.py:43-53 analogue)."""
        r1 = make_request(0, range(9))
        mgr.allocate_slots(r1, 9)
        r1.num_computed_tokens = 9
        mgr.cache_blocks(r1)
        first_ids = list(r1.block_ids)

        r2 = make_request(1, range(9))
        hits, n = mgr.get_computed_blocks(r2)
        assert n == 8  # two full blocks cached
        assert hits == first_ids[:2]
        assert mgr.hit_rate > 0

    def test_full_prompt_hit_capped(self, mgr):
        r1 = make_request(0, range(8))
        mgr.allocate_slots(r1, 8)
        r1.num_computed_tokens = 8
        mgr.cache_blocks(r1)
        r2 = make_request(1, range(8))
        hits, n = mgr.get_computed_blocks(r2)
        assert n == 4  # capped: at least 1 token must be computed

    def test_oom_returns_none(self, mgr):
        req = make_request(0, range(4 * 31))
        assert mgr.allocate_slots(req, 4 * 31) is not None
        req2 = make_request(1, range(8))
        assert mgr.allocate_slots(req2, 8) is None

    def test_free_allows_realloc(self, mgr):
        req = make_request(0, range(4 * 31))
        mgr.allocate_slots(req, 4 * 31)
        mgr.free(req)
        assert req.block_ids == []
        req2 = make_request(1, range(8))
        assert mgr.allocate_slots(req2, 8) is not None

    def test_incremental_decode_allocation(self, mgr):
        req = make_request(0, range(4))
        mgr.allocate_slots(req, 4)
        assert len(req.block_ids) == 1
        req.num_computed_tokens = 4
        assert mgr.allocate_slots(req, 1) is not None and len(req.block_ids) == 2
        req.num_computed_tokens = 5
        assert mgr.allocate_slots(req, 1) == []  # fits in existing block
