"""Paged KV-cache block pool with LRU prefix caching.

Functional equivalent of the reference's ``Block`` / ``FreeBlockQueue`` /
``BlockPool`` (ref: 02_kvcache/block_pool_lru.py:13-244) and the engine-side
``BlockAllocator`` (ref: 05_mini_vllm/mini_vllm.py:32-108), redesigned:

- Blocks are plain integer ids.  All per-block state (ref counts, hashes, LRU
  links) lives in flat arrays indexed by id — an *intrusive array-backed
  doubly-linked list* instead of per-node Python objects.  O(1) popleft /
  append / remove like the reference, but with no object churn and a layout
  that ports directly to C++.
- Hashes are 32-byte chained SHA-256 digests (see ``core.hashing``), stable
  cluster-wide — the production scheme, not seeded Python ``hash``.
- The device never sees this structure: the scheduler converts block ids into
  dense int32 block tables / slot mappings that are fed to the jitted step.

Behavioral contract kept from the reference (its tests are the spec):
- id 0 is the *null block*, pinned forever (block_pool_lru.py:118-119).
- ``get_new_blocks`` pops LRU-first and evicts any cached hash on the way out
  (block_pool_lru.py:140-178); raises on OOM.
- ``touch`` revives a cached block out of the free queue (ref++), ``free_blocks``
  re-queues at the tail *keeping the hash* so it stays reusable until evicted.
- ``reset_prefix_cache`` only succeeds when no request holds blocks
  (post-RLHF weight-swap invalidation, block_pool_lru.py:237-244).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from .hashing import BlockHash

_NULL = -1  # no-link marker in the intrusive list


class FreeBlockQueue:
    """LRU-ordered free list over integer block ids.

    Array-backed intrusive doubly-linked list: ``next_[i]`` / ``prev_[i]``
    hold block ids, with a virtual sentinel at index ``num_blocks``.  Same
    O(1) popleft (evict-oldest) / append (most-recently-freed) / remove
    (touch) contract as the reference's node-based list
    (block_pool_lru.py:31-87).
    """

    def __init__(self, num_blocks: int, initial_ids: Optional[Sequence[int]] = None):
        self._sent = num_blocks  # sentinel index
        self.next_ = [_NULL] * (num_blocks + 1)
        self.prev_ = [_NULL] * (num_blocks + 1)
        self.next_[self._sent] = self._sent
        self.prev_[self._sent] = self._sent
        self._in_queue = [False] * num_blocks
        self.num_free_blocks = 0
        for bid in initial_ids if initial_ids is not None else range(num_blocks):
            self.append(bid)

    def __contains__(self, block_id: int) -> bool:
        return self._in_queue[block_id]

    def popleft(self) -> int:
        head = self.next_[self._sent]
        if head == self._sent:
            raise RuntimeError("No free blocks available (OOM)")
        self.remove(head)
        return head

    def popleft_n(self, n: int) -> List[int]:
        return [self.popleft() for _ in range(n)]

    def append(self, block_id: int) -> None:
        assert not self._in_queue[block_id], f"block {block_id} already free"
        last = self.prev_[self._sent]
        self.next_[last] = block_id
        self.prev_[block_id] = last
        self.next_[block_id] = self._sent
        self.prev_[self._sent] = block_id
        self._in_queue[block_id] = True
        self.num_free_blocks += 1

    def append_n(self, block_ids: Sequence[int]) -> None:
        for bid in block_ids:
            self.append(bid)

    def remove(self, block_id: int) -> None:
        assert self._in_queue[block_id], f"block {block_id} not in free queue"
        p, n = self.prev_[block_id], self.next_[block_id]
        self.next_[p] = n
        self.prev_[n] = p
        self.next_[block_id] = self.prev_[block_id] = _NULL
        self._in_queue[block_id] = False
        self.num_free_blocks -= 1

    def order(self) -> List[int]:
        """LRU→MRU ids (test/debug helper; O(n))."""
        out, cur = [], self.next_[self._sent]
        while cur != self._sent:
            out.append(cur)
            cur = self.next_[cur]
        return out


class BlockPool:
    """vLLM-V1-style block pool: allocation + prefix cache + LRU eviction.

    Ref behavior source: block_pool_lru.py:90-244.  Block ids replace Block
    objects; multiple physical copies of the same content (hash collisions
    across copies) are tracked as an insertion-ordered dict of ids, mirroring
    the reference's Block-or-dict entry (block_pool_lru.py:115).
    """

    def __init__(self, num_blocks: int, enable_caching: bool = True):
        assert num_blocks > 1, "need at least the null block plus one"
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching

        self.ref_cnt = [0] * num_blocks
        self.block_hash: List[Optional[BlockHash]] = [None] * num_blocks
        self.free_queue = FreeBlockQueue(num_blocks)
        # hash -> {block_id: None} insertion-ordered set of physical copies.
        self.cached: Dict[BlockHash, Dict[int, None]] = {}

        # Null block: id 0, permanently pinned, used for padding block tables.
        self.null_block = self.free_queue.popleft()
        assert self.null_block == 0
        self.ref_cnt[0] = 1

    # ---- queries ---------------------------------------------------------

    def get_num_free_blocks(self) -> int:
        return self.free_queue.num_free_blocks

    def get_usage(self) -> float:
        """0.0–1.0 fraction of non-null blocks currently referenced."""
        total = self.num_blocks - 1
        if total <= 0:
            return 0.0
        return 1.0 - self.get_num_free_blocks() / total

    def lookup_prefix(self, block_hashes: Sequence[BlockHash]) -> List[int]:
        """Ids of the longest cached prefix (chain stops at first miss)."""
        hits: List[int] = []
        for h in block_hashes:
            bid = self.get_cached_block(h)
            if bid is None:
                break
            hits.append(bid)
        return hits

    def get_cached_block(self, block_hash: BlockHash) -> Optional[int]:
        entry = self.cached.get(block_hash)
        if not entry:
            return None
        return next(iter(entry))

    # ---- allocation ------------------------------------------------------

    def get_new_blocks(self, num_blocks: int) -> List[int]:
        """Pop LRU-first; evicts stale prefix-cache entries on the way out."""
        if num_blocks > self.get_num_free_blocks():
            raise RuntimeError(
                f"OOM: need {num_blocks} blocks, only "
                f"{self.get_num_free_blocks()} free"
            )
        ids = self.free_queue.popleft_n(num_blocks)
        for bid in ids:
            self._evict_cached(bid)
            assert self.ref_cnt[bid] == 0
            self.ref_cnt[bid] = 1
        return ids

    def _evict_cached(self, block_id: int) -> bool:
        h = self.block_hash[block_id]
        if h is None:
            return False
        self.block_hash[block_id] = None
        entry = self.cached.get(h)
        if entry is None:
            return False
        entry.pop(block_id, None)
        if not entry:
            del self.cached[h]
        return True

    def touch(self, block_ids: Sequence[int]) -> None:
        """Reuse cached blocks: ref++ and pull out of the free queue."""
        for bid in block_ids:
            if self.ref_cnt[bid] == 0 and bid != self.null_block:
                self.free_queue.remove(bid)
            self.ref_cnt[bid] += 1

    def free_blocks(self, block_ids: Sequence[int]) -> None:
        """ref--; zero-ref blocks rejoin the LRU tail, hash preserved."""
        for bid in block_ids:
            self.ref_cnt[bid] -= 1
            assert self.ref_cnt[bid] >= 0, f"double free of block {bid}"
        for bid in block_ids:
            if self.ref_cnt[bid] == 0 and bid != self.null_block:
                self.free_queue.append(bid)

    # ---- prefix cache ----------------------------------------------------

    def cache_full_blocks(
        self,
        block_ids: Sequence[int],
        block_hashes: Sequence[BlockHash],
        num_cached_blocks: int,
        num_full_blocks: int,
    ) -> None:
        """Register blocks [num_cached, num_full) in the prefix cache."""
        if not self.enable_caching or num_cached_blocks >= num_full_blocks:
            return
        for i in range(num_cached_blocks, num_full_blocks):
            bid = block_ids[i]
            if self.block_hash[bid] is not None:
                continue  # already cached (e.g. shared hit)
            h = block_hashes[i]
            self.block_hash[bid] = h
            self.cached.setdefault(h, {})[bid] = None

    def reset_prefix_cache(self) -> bool:
        """Drop every cached hash (post weight update).  Fails if blocks are
        still held by running requests (block_pool_lru.py:237-244)."""
        if self.get_num_free_blocks() < self.num_blocks - 1:
            return False
        self.cached.clear()
        for bid in range(self.num_blocks):
            self.block_hash[bid] = None
        return True
