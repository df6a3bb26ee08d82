"""Scheduler-facing KV cache manager: prefix-cache lookup + slot allocation.

Plays the role of the reference engine's ``BlockAllocator`` + the scheduler's
``_ensure_blocks`` / ``_compute_slot_mapping`` (ref: 05_mini_vllm/
mini_vllm.py:32-108, :195-219), built on the vLLM-V1-style ``BlockPool``.

Differences from the reference, on purpose:
- Prefix hits are discovered by walking the chained SHA-256 hashes through the
  pool *before* allocation (the reference allocator fuses hit/alloc in
  ``allocate(block_hash)``; splitting them lets the scheduler count cached
  tokens for scheduling decisions and for the global-pool connector).
- ``allocate_slots`` returns ``None`` instead of raising when out of blocks so
  the scheduler can preempt (blog scheduler BLOG_PART2.md:930-990).
- Blocks are freed in *reverse* order so LRU eviction drops the deepest
  suffix first and keeps shared prefixes hot (production-vLLM behavior).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .block_pool import BlockPool
from .hashing import compute_block_hash
from .request import Request


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _make_pool(num_blocks: int, enable_caching: bool, impl: str = "auto"):
    """"native" = the C++ pool (native/block_pool.cc), "python" = BlockPool,
    "auto" = native when the toolchain/library is available."""
    if impl in ("auto", "native"):
        try:
            from ..native import NativeBlockPool

            return NativeBlockPool(num_blocks, enable_caching)
        except Exception:
            if impl == "native":
                raise
    return BlockPool(num_blocks, enable_caching)


class KVCacheManager:
    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        enable_caching: bool = True,
        extra_key: Optional[str] = None,
        pool_impl: str = "auto",
    ):
        self.block_size = block_size
        self.enable_caching = enable_caching
        self.extra_key = extra_key
        self.pool = _make_pool(num_blocks, enable_caching, pool_impl)
        # Streaming-publish hook (distributed/pd.py): called as
        # (request, first_block_idx, block_ids, block_hashes) whenever fresh
        # full blocks enter the prefix cache — i.e. the moment a prefill
        # chunk completes a block, not at end of request.
        self.on_cache_blocks = None

        # prefix-cache observability (BASELINE north-star metric).
        self.query_blocks = 0
        self.hit_blocks = 0
        # delay_free support for async decode (see free()).
        self._defer_frees = False
        self._deferred: List[List[int]] = []

    # ---- metrics ----------------------------------------------------------

    @property
    def usage(self) -> float:
        return self.pool.get_usage()

    @property
    def hit_rate(self) -> float:
        return self.hit_blocks / self.query_blocks if self.query_blocks else 0.0

    # ---- hashing ----------------------------------------------------------

    def _extend_block_hashes(self, request: Request) -> None:
        """Lazily extend the request's chained hashes over its full blocks."""
        bs = self.block_size
        tokens = request.all_token_ids()
        num_full = len(tokens) // bs
        parent = request.block_hashes[-1] if request.block_hashes else None
        for i in range(len(request.block_hashes), num_full):
            parent = compute_block_hash(
                parent, tokens[i * bs : (i + 1) * bs], self.extra_key
            )
            request.block_hashes.append(parent)

    # ---- prefix cache hit path --------------------------------------------

    def get_computed_blocks(self, request: Request) -> Tuple[List[int], int]:
        """Longest cached prefix for a new request.

        Returns (hit block ids, num cached tokens).  Hits are capped one token
        short of the full prompt so there is always at least one position left
        to compute logits from.  Hit blocks are ref++'d (touch) but NOT yet
        assigned to the request — the scheduler does that once admission
        succeeds.
        """
        if not self.enable_caching:
            return [], 0
        self._extend_block_hashes(request)
        hits = self.pool.lookup_prefix(request.block_hashes)
        # Reference accounting (global_kv_pool.py:121): every block hash of
        # the lookup counts as a query, not just blocks probed until the
        # first miss — hit_rate stays comparable to reference/BASELINE.
        self.query_blocks += len(request.block_hashes)
        self.hit_blocks += len(hits)
        # Never satisfy the entire prompt from cache.
        max_hit_tokens = request.num_prompt_tokens - 1
        while hits and len(hits) * self.block_size > max_hit_tokens:
            hits.pop()
        if hits:
            self.pool.touch(hits)
        return hits, len(hits) * self.block_size

    # ---- allocation --------------------------------------------------------

    def allocate_slots(self, request: Request, num_new_tokens: int) -> Optional[List[int]]:
        """Ensure blocks exist for [num_computed, num_computed + new) tokens.

        Returns newly allocated block ids, or None if the pool can't satisfy
        the request (caller decides: skip admission or preempt a victim).
        """
        total = request.num_computed_tokens + num_new_tokens
        need = cdiv(total, self.block_size) - len(request.block_ids)
        if need <= 0:
            return []
        if need > self.pool.get_num_free_blocks():
            return None
        new_ids = self.pool.get_new_blocks(need)
        request.block_ids.extend(new_ids)
        return new_ids

    def rollback(self, request: Request, new_ids: List[int]) -> None:
        """Undo an ``allocate_slots`` grant (multi-step / spec-decode group
        pre-allocation where a *later* request's grant failed): detach the
        just-granted blocks and return them to the pool, so the fallback path
        doesn't over-commit under exactly the memory pressure that caused it.
        """
        if not new_ids:
            return
        assert request.block_ids[-len(new_ids):] == new_ids
        del request.block_ids[-len(new_ids):]
        self.pool.free_blocks(list(reversed(new_ids)))

    def free(self, request: Request) -> None:
        """Release all blocks (finish or preempt); reverse order keeps shared
        prefixes at the LRU tail longest.

        While an async decode macro-step is in flight (core/engine.py) frees
        are DEFERRED: the device may still be writing these slots, and a
        free-then-realloc would hand them to another request mid-step (the
        delay_free lifecycle of BLOG_PART2B_V2.md:760-1082)."""
        if request.block_ids:
            if self._defer_frees:
                self._deferred.append(list(reversed(request.block_ids)))
            else:
                self.pool.free_blocks(list(reversed(request.block_ids)))
        request.block_ids = []
        request.num_cached_blocks = 0

    def begin_deferred_frees(self) -> None:
        self._defer_frees = True

    def flush_deferred_frees(self) -> None:
        self._defer_frees = False
        for ids in self._deferred:
            self.pool.free_blocks(ids)
        self._deferred = []

    # ---- prefix cache publish path ------------------------------------------

    def cache_blocks(self, request: Request) -> None:
        """Register newly-filled full blocks in the prefix cache."""
        if not self.enable_caching:
            return
        self._extend_block_hashes(request)
        num_full = min(
            request.num_computed_tokens // self.block_size,
            len(request.block_hashes),
            len(request.block_ids),
        )
        if num_full > request.num_cached_blocks:
            start = request.num_cached_blocks
            self.pool.cache_full_blocks(
                request.block_ids,
                request.block_hashes,
                start,
                num_full,
            )
            request.num_cached_blocks = num_full
            if self.on_cache_blocks is not None:
                self.on_cache_blocks(
                    request, start,
                    request.block_ids[start:num_full],
                    request.block_hashes[start:num_full],
                )

    # ---- slot mapping --------------------------------------------------------

    def slot_mapping(self, request: Request, start: int, num_tokens: int) -> List[int]:
        """Physical slots for logical positions [start, start+num_tokens)
        (ref: paged_attention.py:54-64, mini_vllm.py:209-219)."""
        bs = self.block_size
        return [
            request.block_ids[p // bs] * bs + (p % bs)
            for p in range(start, start + num_tokens)
        ]

    def reset_prefix_cache(self) -> bool:
        ok = self.pool.reset_prefix_cache()
        if ok:
            self.query_blocks = 0
            self.hit_blocks = 0
        return ok
