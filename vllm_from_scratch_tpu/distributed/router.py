"""Data-parallel request router: prefix-affinity + load balancing.

The DP row of SURVEY.md §2c ("multiple engine replicas across pod slices;
request router").  Each replica is a PDWorker (engine + connector + pool);
the router picks where a request runs:

1. **Prefix affinity**: query the global metadata server for the request's
   block-hash chain; if some node owns a matched prefix, prefer the replica
   on that node — its KV is already local (zero-copy hit) and everyone
   else would pay a transfer.
2. **Load balance**: among equally-good candidates (or on a cold miss),
   pick the replica with the fewest unfinished requests.

This is the session-affinity policy production routers use in front of
PD-disaggregated pools (the reference discusses it as "M decode nodes
serve M conversations", BLOG_PART3.md:860).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence

from ..core.hashing import compute_block_hashes
from .metadata import GlobalMetadataServer
from .pd import PDWorker


class Router:
    def __init__(self, workers: Sequence[PDWorker], meta: GlobalMetadataServer):
        assert workers, "need at least one replica"
        self.workers = list(workers)
        self.meta = meta
        self._by_node: Dict[int, PDWorker] = {
            w.connector.node_id: w for w in self.workers
        }
        self.stats = {"affinity_hits": 0, "balanced": 0}

    def _load(self, w: PDWorker) -> int:
        sched = w.engine.scheduler
        return len(sched.running) + len(sched.waiting) + w.num_waiting_remote

    def pick(self, prompt_token_ids: Sequence[int]) -> PDWorker:
        """Choose the replica for a prompt (does not submit)."""
        bs = self.workers[0].engine.block_size
        hashes = compute_block_hashes(
            list(prompt_token_ids), bs,
            self.workers[0].engine.kv_mgr.extra_key,
        )
        keyed = [self.workers[0].connector._key(h) for h in hashes]
        _, metas = self.meta.query_prefix(keyed)
        owners = Counter(m.node_id for m in metas)
        if owners:
            # node owning the largest share of the matched prefix
            best_node, _ = max(
                owners.items(),
                key=lambda kv: (kv[1], -self._load(self._by_node[kv[0]])
                                if kv[0] in self._by_node else 0),
            )
            w = self._by_node.get(best_node)
            if w is not None:
                self.stats["affinity_hits"] += 1
                return w
        self.stats["balanced"] += 1
        return min(self.workers, key=self._load)

    def submit(self, prompt_token_ids: Sequence[int], sampling) -> tuple:
        """Route and submit; returns (worker, req_id)."""
        w = self.pick(prompt_token_ids)
        rid = w.engine.add_request(list(prompt_token_ids), sampling)
        return w, rid

    def step_all(self) -> List[tuple]:
        """One serving iteration across every replica; returns
        [(node_id, req_id, token)]."""
        out = []
        for w in self.workers:
            for rid, tok in w.step():
                out.append((w.connector.node_id, rid, tok))
        return out
