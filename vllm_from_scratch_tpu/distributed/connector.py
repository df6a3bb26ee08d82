"""Worker-side KV connector (Mooncake / vLLM KVConnectorBase_V1 shape).

Equivalent of the reference's MooncakeConnector (ref: 06_global_prefix_cache/
global_kv_pool.py:338-464), keeping the exact three-call API the scheduler
integrates against (SURVEY §7 stage 7):

- ``get_num_new_matched_tokens(req, hashes) -> (num_tokens, load_async)`` —
  query the metadata server, group remote hits by source node, skip blocks
  already local, submit batched transfers (:375-419).
- ``wait_for_kv(req)`` — the WAITING_FOR_REMOTE_KVS state (:421-440).
- ``publish_kv(...)`` — the request_finished callback (:442-464).
"""

from __future__ import annotations

import threading
from typing import Dict, Hashable, List, Optional, Sequence, Set, Tuple

from .metadata import GlobalMetadataServer, KV_BLOCK_BYTES, PoolKey
from .transfer import TransferEngine


class KVConnector:
    def __init__(
        self,
        node_id: int,
        metadata_server: GlobalMetadataServer,
        transfer_engine: TransferEngine,
        block_size: int = 16,
        model: str = "",
        tp_rank: int = 0,
        pp_rank: int = 0,
        pcp_rank: int = 0,
        dcp_rank: int = 0,
    ):
        self.node_id = node_id
        self.meta = metadata_server
        self.engine = transfer_engine
        self.block_size = block_size
        # Parallel-layout coordinates baked into every pool key: KV shards
        # are only reusable between nodes with identical (model, tp, pp,
        # pcp, dcp) layout (PoolKey; BLOG_PART2B_V2.md:1247-1291, 1724-1737).
        self.model = model
        self.tp_rank = tp_rank
        self.pp_rank = pp_rank
        self.pcp_rank = pcp_rank
        self.dcp_rank = dcp_rank
        self._lock = threading.Lock()
        # blocks whose KV bytes are already on this node
        self.local_blocks: Set[Hashable] = set()
        # req_id -> pending transfer ids
        self._pending: Dict[str, List[str]] = {}
        self.stats = {
            "queries": 0,
            "hits": 0,
            "transfers": 0,
            "transferred_bytes": 0,
            "local_hits": 0,
        }

    def _key(self, block_hash: Hashable) -> Hashable:
        if (not self.model and self.tp_rank == 0 and self.pp_rank == 0
                and self.pcp_rank == 0 and self.dcp_rank == 0):
            return block_hash  # default layout: raw hash (reference behavior)
        return PoolKey(block_hash, self.model, self.tp_rank, self.pp_rank,
                       self.pcp_rank, self.dcp_rank)

    # ---- scheduler-facing API ---------------------------------------------

    def get_num_new_matched_tokens(
        self, req_id: str, block_hashes: Sequence[Hashable]
    ) -> Tuple[int, bool]:
        """(matched prefix tokens available via the pool, load_async).

        load_async True => caller must hold the request in
        WAITING_FOR_REMOTE_KVS until wait_for_kv(req_id) returns.
        """
        self.stats["queries"] += 1
        num_matched, metas = self.meta.query_prefix(
            [self._key(h) for h in block_hashes]
        )
        if num_matched == 0:
            return 0, False
        self.stats["hits"] += num_matched

        # Group remote blocks by owner node; local blocks need no transfer.
        by_src: Dict[int, List[Hashable]] = {}
        with self._lock:
            for m in metas:
                if m.node_id == self.node_id or m.block_hash in self.local_blocks:
                    self.stats["local_hits"] += 1
                    continue
                by_src.setdefault(m.node_id, []).append(m.block_hash)

        if not by_src:
            return num_matched * self.block_size, False

        tids = []
        for src, hashes in by_src.items():
            tid = self.engine.submit_transfer(src, hashes)
            tids.append(tid)
            self.stats["transfers"] += 1
        with self._lock:
            self._pending[req_id] = tids
        return num_matched * self.block_size, True

    def wait_for_kv(self, req_id: str, timeout: float = 30.0) -> bool:
        """Block until every transfer for this request lands (remote KV pull)."""
        with self._lock:
            tids = self._pending.pop(req_id, [])
        ok = True
        for tid in tids:
            result = self.engine.wait(tid, timeout=timeout)
            if result is None or not result.success:
                ok = False
                continue
            self.stats["transferred_bytes"] += result.bytes_transferred
        return ok

    def publish_kv(
        self,
        block_hashes: Sequence[Hashable],
        token_ids_per_block: Optional[Sequence[Tuple[int, ...]]] = None,
        max_blocks_per_node: Optional[int] = None,
    ) -> int:
        """Register freshly computed blocks in the global pool
        (the request_finished callback)."""
        count = 0
        for i, h in enumerate(block_hashes):
            tids = token_ids_per_block[i] if token_ids_per_block else ()
            if self.meta.publish(
                self._key(h), self.node_id, tuple(tids), KV_BLOCK_BYTES,
                max_blocks_per_node,
            ):
                count += 1
            with self._lock:
                self.local_blocks.add(self._key(h))
        return count

    def mark_local(self, block_hashes: Sequence[Hashable]) -> None:
        """Record blocks whose bytes already live on this node (post-pull)."""
        with self._lock:
            self.local_blocks.update(self._key(h) for h in block_hashes)
