"""PD-disaggregated cluster simulation: prefill nodes + decode nodes sharing
a global KV pool.

Equivalent of the reference's SimulatedCluster (ref: 06_global_prefix_cache/
global_kv_pool.py:507-611): N prefill + M decode nodes, each with its own
transfer engine + connector, one shared metadata server.  Prefill cost model
0.5 ms/token (:576, A100-70B estimate).  On a TPU pod the same topology maps
to prefill host-slices and decode host-slices with DCN transfers; this
simulation is the CPU-testable contract for that control flow (SURVEY §4).
"""

from __future__ import annotations

import time
from typing import Dict, List, Tuple

from ..core.hashing import compute_block_hashes
from .connector import KVConnector
from .metadata import BLOCK_SIZE, GlobalMetadataServer
from .transfer import TransferEngine

PREFILL_MS_PER_TOKEN = 0.5  # global_kv_pool.py:576


class SimulatedCluster:
    def __init__(
        self,
        num_prefill_nodes: int = 2,
        num_decode_nodes: int = 2,
        block_size: int = BLOCK_SIZE,
        prefill_ms_per_token: float = PREFILL_MS_PER_TOKEN,
    ):
        self.block_size = block_size
        self.prefill_ms_per_token = prefill_ms_per_token
        self.meta_server = GlobalMetadataServer()
        self.prefill_nodes: List[KVConnector] = []
        self.decode_nodes: List[KVConnector] = []
        for i in range(num_prefill_nodes):
            eng = TransferEngine(node_id=i)
            self.prefill_nodes.append(
                KVConnector(i, self.meta_server, eng, block_size)
            )
        for j in range(num_decode_nodes):
            nid = num_prefill_nodes + j
            eng = TransferEngine(node_id=nid)
            self.decode_nodes.append(
                KVConnector(nid, self.meta_server, eng, block_size)
            )

    # ---- request flows --------------------------------------------------------

    def simulate_prefill(
        self, req_id: str, token_ids: List[int], prefill_node_idx: int = 0
    ) -> Tuple[int, float]:
        """query -> pull remote KV -> compute the miss -> publish.

        Returns (cached_tokens, elapsed_ms) (global_kv_pool.py:546-585).
        """
        conn = self.prefill_nodes[prefill_node_idx]
        t0 = time.monotonic()
        hashes = compute_block_hashes(token_ids, self.block_size)

        cached_tokens, load_async = conn.get_num_new_matched_tokens(req_id, hashes)
        if load_async:
            conn.wait_for_kv(req_id)
        num_cached_blocks = cached_tokens // self.block_size
        conn.mark_local(hashes[:num_cached_blocks])

        miss_tokens = len(token_ids) - cached_tokens
        if miss_tokens > 0:
            time.sleep(miss_tokens * self.prefill_ms_per_token / 1000.0)

        token_blocks = [
            tuple(token_ids[i * self.block_size : (i + 1) * self.block_size])
            for i in range(len(hashes))
        ]
        conn.publish_kv(hashes, token_blocks)
        return cached_tokens, (time.monotonic() - t0) * 1000.0

    def simulate_decode(
        self, req_id: str, token_ids: List[int], decode_node_idx: int = 0
    ) -> Tuple[int, float]:
        """Pull the prompt's KV from the pool and skip prefill entirely
        (global_kv_pool.py:587-611).  Returns (tokens_from_cache, wait_ms)."""
        conn = self.decode_nodes[decode_node_idx]
        t0 = time.monotonic()
        hashes = compute_block_hashes(token_ids, self.block_size)
        cached_tokens, load_async = conn.get_num_new_matched_tokens(req_id, hashes)
        if load_async:
            conn.wait_for_kv(req_id)
        conn.mark_local(hashes[: cached_tokens // self.block_size])
        # Tail tokens beyond full blocks ride along once the prefix is local.
        if cached_tokens == len(hashes) * self.block_size and hashes:
            cached_tokens = len(token_ids)
        return cached_tokens, (time.monotonic() - t0) * 1000.0

    # ---- observability ----------------------------------------------------------

    def stats(self) -> Dict[str, object]:
        return {
            "total_blocks": self.meta_server.total_blocks,
            "hit_rate": self.meta_server.hit_rate,
            "node_stats": self.meta_server.node_stats(),
            "prefill": [c.stats for c in self.prefill_nodes],
            "decode": [c.stats for c in self.decode_nodes],
        }
