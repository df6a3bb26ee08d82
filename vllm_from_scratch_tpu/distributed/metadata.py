"""Global KV-pool metadata server (the etcd / mooncake_master stand-in).

Equivalent of the reference's GlobalMetadataServer (ref: 06_global_prefix_cache/
global_kv_pool.py:50-210).  Per SURVEY.md §2b this host-side Python design
carries over to TPU almost unchanged — the data plane moves over DCN, but the
control plane is a lock-guarded hash -> location map either way.

- ``query_prefix`` walks the chained hashes and stops at the first miss
  (global_kv_pool.py:113-131).
- ``publish`` registers a block on a node, enforcing a per-node capacity with
  LRU eviction by last access time (:133-186).
- ``unpublish`` is the node-offline / eviction path (:165-174).
- Thread-safe by an RLock; counters give the hit-rate north-star metric.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Dict, Hashable, List, Optional, Sequence, Set, Tuple

# KV bytes per block for the flagship MLA INT8 latent cache:
# (kv_lora_rank 512 + rope 64) int8 bytes + 8 scale bytes per token, 16
# tokens per block.  (The reference's constant is MHA fp16: 32 KB+,
# global_kv_pool.py:36-43 — MLA+INT8 is the ~56x-smaller transfer the blogs
# advertise, BLOG_PART3_V2.md:1277-1289.)
BLOCK_SIZE = 16
BYTES_PER_TOKEN = (512 + 64) * 1 + 8
KV_BLOCK_BYTES = BYTES_PER_TOKEN * BLOCK_SIZE


@dataclass
class KVBlockMeta:
    """Where a block's KV lives and how hot it is (global_kv_pool.py:50-72)."""

    block_hash: Hashable
    node_id: int
    token_ids: Tuple[int, ...] = ()
    size_bytes: int = KV_BLOCK_BYTES
    created_at: float = field(default_factory=time.monotonic)
    last_access: float = field(default_factory=time.monotonic)
    access_count: int = 0


@dataclass(frozen=True)
class PoolKey:
    """Content-addressed pool key: block hash + parallel-layout coordinates.

    Port of the reference's PoolKey addressing (model@pcp@dcp@tp_rank@pp_rank
    @hash, BLOG_PART2B_V2.md:1247-1291): KV bytes are only interchangeable
    between nodes with the same model and the same TP/PP/CP shard layout, so
    the layout is part of the key — pp_rank reserved from day 1
    (BLOG_PART2B_V2.md:1259).  Frozen dataclass => hashable => usable directly
    as a GlobalMetadataServer key.
    """

    block_hash: object
    model: str = ""
    tp_rank: int = 0
    pp_rank: int = 0
    pcp_rank: int = 0
    dcp_rank: int = 0


class GlobalMetadataServer:
    def __init__(self):
        self._lock = threading.RLock()
        self._blocks: Dict[Hashable, KVBlockMeta] = {}
        self._node_blocks: Dict[int, Set[Hashable]] = {}
        self.total_queries = 0   # individual block lookups (global_kv_pool.py:121)
        self.total_hits = 0      # blocks matched across all queries

    # ---- lookup -----------------------------------------------------------

    def query_prefix(
        self, block_hashes: Sequence[Hashable]
    ) -> Tuple[int, List[KVBlockMeta]]:
        """Longest registered prefix of the hash chain; stops at first miss."""
        with self._lock:
            # Per-BLOCK lookup count (global_kv_pool.py:121), so hit_rate is a
            # true fraction <= 1, not blocks-per-call.
            self.total_queries += len(block_hashes)
            matched: List[KVBlockMeta] = []
            now = time.monotonic()
            for h in block_hashes:
                meta = self._blocks.get(h)
                if meta is None:
                    break
                meta.last_access = now
                meta.access_count += 1
                matched.append(meta)
            self.total_hits += len(matched)
            return len(matched), matched

    def get(self, block_hash: Hashable) -> Optional[KVBlockMeta]:
        with self._lock:
            return self._blocks.get(block_hash)

    # ---- registration ------------------------------------------------------

    def publish(
        self,
        block_hash: Hashable,
        node_id: int,
        token_ids: Tuple[int, ...] = (),
        size_bytes: int = KV_BLOCK_BYTES,
        max_blocks_per_node: Optional[int] = None,
    ) -> bool:
        """Register a block on a node; LRU-evict that node's coldest blocks
        when over capacity (global_kv_pool.py:133-186)."""
        with self._lock:
            existing = self._blocks.get(block_hash)
            if existing is not None:
                existing.last_access = time.monotonic()
                return False  # already in the pool (any node)
            meta = KVBlockMeta(block_hash, node_id, tuple(token_ids), size_bytes)
            self._blocks[block_hash] = meta
            self._node_blocks.setdefault(node_id, set()).add(block_hash)

            if max_blocks_per_node is not None:
                node_set = self._node_blocks[node_id]
                while len(node_set) > max_blocks_per_node:
                    coldest = min(node_set, key=lambda h: self._blocks[h].last_access)
                    self._evict(coldest)
            return True

    def unpublish(self, block_hash: Hashable) -> bool:
        """Remove a block (node offline, local eviction)."""
        with self._lock:
            if block_hash not in self._blocks:
                return False
            self._evict(block_hash)
            return True

    def unpublish_node(self, node_id: int) -> int:
        """Drop every block registered on a node (failure handling)."""
        with self._lock:
            hashes = list(self._node_blocks.get(node_id, ()))
            for h in hashes:
                self._evict(h)
            return len(hashes)

    def _evict(self, block_hash: Hashable) -> None:
        meta = self._blocks.pop(block_hash)
        self._node_blocks.get(meta.node_id, set()).discard(block_hash)

    # ---- observability ------------------------------------------------------

    @property
    def total_blocks(self) -> int:
        with self._lock:
            return len(self._blocks)

    @property
    def hit_rate(self) -> float:
        """Blocks hit per query (global_kv_pool.py:188-210)."""
        with self._lock:
            return self.total_hits / self.total_queries if self.total_queries else 0.0

    def node_stats(self) -> Dict[int, dict]:
        with self._lock:
            return {
                nid: {
                    "num_blocks": len(hs),
                    "bytes": sum(self._blocks[h].size_bytes for h in hs),
                }
                for nid, hs in self._node_blocks.items()
            }
