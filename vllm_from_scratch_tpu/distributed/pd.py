"""PD disaggregation with a REAL data plane: engine-level KV page movement.

The reference's module 06 (and our cluster.py port) simulates prefill/decode
nodes with sleep-based cost models — KV bytes never move
(global_kv_pool.py:546-611).  This module goes the rest of the way: actual
cache pages travel from the prefill engine to the decode engine, and the
decode engine generates from them.

Pieces:
- ``extract_kv_pages`` / ``inject_kv_pages`` — gather/scatter whole blocks
  (all layers, K/V/scales or latents) out of / into a serving engine's
  layer-stacked cache pytree.
- ``PageStore``     — per-node published pages (hash -> pytree), the
  object store mooncake_master fronts; thread-safe.
- ``PDWorker``      — wraps (engine, connector, store):
  * ``publish_finished(tokens)``   — after serving, push the request's full
    blocks into the pool (pages + metadata), the request_finished callback.
  * ``pull_prefix(tokens)``        — query the pool for the longest prefix,
    wait for transfers, inject the received pages into freshly allocated
    local blocks and register them in the LOCAL prefix cache — after which
    the normal serving path hits them like any local prefix (prefill
    skipped, decode reads real remote-computed KV).

Correctness contract (tests): a decode engine that pulls a published prefix
produces EXACTLY the tokens it would have produced computing the prefill
itself (same weights) — the transferred bytes are the real KV.
"""

from __future__ import annotations

import threading
from typing import Dict, Hashable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.hashing import compute_block_hashes
from .connector import KVConnector


def _block_slots(block_ids: Sequence[int], block_size: int) -> jnp.ndarray:
    ids = jnp.asarray(list(block_ids), jnp.int32)
    offs = jnp.arange(block_size, dtype=jnp.int32)
    return (ids[:, None] * block_size + offs).reshape(-1)


def _physical_slots(engine, block_ids: Sequence[int]) -> jnp.ndarray:
    """Cache-row indices of the given (virtual) blocks, in TOKEN order.

    For a cp engine the host addresses VIRTUAL blocks of ``block_size * cp``
    tokens while the cache's slot axis is sharded over "cp" with the
    interleaved split (parallel/cp_serving.py: token at virtual position p
    lives on rank ``(p // bs) % cp`` at local slot ``vb * bs + p % bs``).
    The returned indices walk that layout so extracted pages always come out
    in canonical token order, independent of the source engine's layout —
    the TP-layout transfer constraint the reference documents
    (BLOG_PART2_V2.md:322-380) handled by construction.
    """
    import numpy as np

    cp = getattr(engine.config.parallel, "cp_size", 1)
    Vbs = engine.block_size
    p = (np.asarray(list(block_ids))[:, None] * Vbs + np.arange(Vbs)).reshape(-1)
    if cp == 1:
        return jnp.asarray(p, jnp.int32)
    bs = Vbs // cp
    total_slots = jax.tree.leaves(engine.cache)[0].shape[1]
    per_rank = total_slots // cp
    vb, within = p // Vbs, p % Vbs
    rank, off = within // bs, within % bs
    return jnp.asarray(rank * per_rank + vb * bs + off, jnp.int32)


def extract_kv_pages(engine, block_ids: Sequence[int]):
    """Gather the given blocks' rows from every cache leaf.

    Cache leaves are layer-stacked ``[L, num_slots, ...]``; returns the same
    pytree with ``num_slots`` replaced by ``len(block_ids) * block_size``
    rows in canonical token order (layout-aware: cp slot interleaving is
    undone; tp head sharding is transparent under GSPMD global arrays).
    """
    slots = _physical_slots(engine, block_ids)
    return jax.tree.map(lambda leaf: leaf[:, slots], engine.cache)


def inject_kv_pages(engine, block_ids: Sequence[int], pages) -> None:
    """Scatter previously extracted pages into this engine's blocks."""
    slots = _physical_slots(engine, block_ids)
    engine.cache = jax.tree.map(
        lambda leaf, rows: leaf.at[:, slots].set(rows), engine.cache, pages
    )


# ---- per-shard page granules (PoolKey tp/pcp/dcp addressing) ----------------

def kv_shard_layout(engine) -> Tuple[int, int]:
    """(tp_shards, cp_shards) of this engine's KV-cache layout.

    Mirrors parallel/sharding.py cache_shardings: the MHA K/V cache shards
    its kv-head axis over "tp"; the MLA latent cache is head-less (tp plays
    no role in its pages; TPLA's rank-sharded form is exchanged canonically);
    the slot axis shards over "cp".  These factors decide how many PoolKey
    shard granules a block's pages split into (BLOG_PART2B_V2.md:1247-1291:
    model@pcp@dcp@tp_rank@pp_rank@hash)."""
    par = engine.config.parallel
    m = engine.config.model
    tp = 1 if m.is_mla else par.tp_size
    return tp, par.cp_size


def split_pages(pages, tp: int, cp: int, block_size: int):
    """Canonical pages -> {(tp_rank, cp_rank): shard granule}.

    tp slices the kv-head axis (axis 2 of every KVCache leaf); cp slices
    token rows (axis 1) by the interleaved split (rows reshape to
    ``[nb, cp, bs]``; rank j owns index j) — each granule is exactly the
    bytes the corresponding device shard holds, so a multi-host deployment
    transfers granules without any reshard.  ``block_size`` is the VIRTUAL
    block size (``bs * cp``)."""
    if tp == 1 and cp == 1:
        return {(0, 0): pages}
    bs = block_size // cp

    def cut(leaf, i: int, j: int):
        if cp > 1:
            L, R = leaf.shape[0], leaf.shape[1]
            leaf = leaf.reshape((L, R // (cp * bs), cp, bs) + leaf.shape[2:])
            leaf = leaf[:, :, j]
            leaf = leaf.reshape((L, -1) + leaf.shape[3:])
        if tp > 1:
            h = leaf.shape[2] // tp
            leaf = leaf[:, :, i * h:(i + 1) * h]
        return leaf

    return {
        (i, j): jax.tree.map(lambda x, i=i, j=j: cut(x, i, j), pages)
        for i in range(tp) for j in range(cp)
    }


def merge_pages(shards: Dict[Tuple[int, int], object], tp: int, cp: int,
                block_size: int):
    """Inverse of ``split_pages``: reassemble canonical pages."""
    if tp == 1 and cp == 1:
        return shards[(0, 0)]
    bs = block_size // cp

    def merge_one(*leaves):
        grid = {}
        it = iter(leaves)
        for i in range(tp):
            for j in range(cp):
                grid[(i, j)] = next(it)
        cols = []
        for j in range(cp):
            col = (grid[(0, j)] if tp == 1 else
                   jnp.concatenate([grid[(i, j)] for i in range(tp)], axis=2))
            cols.append(col)
        if cp == 1:
            return cols[0]
        # rows [nb*bs] per rank -> interleave back to [nb, cp, bs] token order
        stk = jnp.stack(cols, axis=2)                     # [L, nb*bs, cp, ...]
        L = stk.shape[0]
        stk = stk.reshape((L, -1, bs, cp) + stk.shape[3:])
        stk = stk.swapaxes(2, 3)                          # [L, nb, cp, bs, ...]
        return stk.reshape((L, -1) + stk.shape[4:])

    ordered = [shards[(i, j)] for i in range(tp) for j in range(cp)]
    return jax.tree.map(merge_one, *ordered)


class PageStore:
    """Published KV pages, addressed by pool key (node-agnostic content
    store — the mooncake object store)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._pages: Dict[Hashable, object] = {}

    def put(self, key: Hashable, pages) -> None:
        with self._lock:
            self._pages[key] = pages

    def get(self, key: Hashable):
        with self._lock:
            return self._pages.get(key)

    def drop(self, key: Hashable) -> None:
        with self._lock:
            self._pages.pop(key, None)

    def keys(self) -> List[Hashable]:
        with self._lock:
            return list(self._pages)

    def __len__(self) -> int:
        with self._lock:
            return len(self._pages)


class PDWorker:
    """A serving engine participating in the global KV pool."""

    def __init__(self, engine, connector: KVConnector, store: PageStore):
        self.engine = engine
        self.connector = connector
        self.store = store
        # Page granularity follows the engine's cache layout: one granule
        # per (tp_rank, cp_rank) shard, addressed by PoolKey coords
        # (BLOG_PART2B_V2.md:1247-1291).  Trivial layout => raw-hash keys,
        # the single-granule fast path.
        self.tp_shards, self.cp_shards = kv_shard_layout(engine)
        self._next = 0
        self._alock = threading.Lock()
        self._pending: List[dict] = []  # async submits awaiting remote KV
        self._sched_pulls: Dict[int, dict] = {}  # req_id -> handle (scheduler-native)
        self._pub_thread = None
        self._pub_q = None

    # ---- publish (prefill side / request_finished) --------------------------

    def publish_finished(self, token_ids: Sequence[int]) -> int:
        """Publish every full block of ``token_ids`` that sits in the local
        prefix cache: pages to the store, metadata to the pool."""
        eng = self.engine
        bs = eng.block_size
        hashes = compute_block_hashes(list(token_ids), bs, eng.kv_mgr.extra_key)
        pairs: List[Tuple[Hashable, int]] = []
        for i, h in enumerate(hashes):
            bid = eng.kv_mgr.pool.get_cached_block(h)
            if bid is None:
                break  # chain: later blocks depend on this one
            pairs.append((h, bid))
        if not pairs:
            return 0
        for h, bid in pairs:
            self._store_shards(h, extract_kv_pages(eng, [bid]))
        self.connector.publish_kv([h for h, _ in pairs])
        return len(pairs)

    def _shard_key(self, block_hash, tp_rank: int, cp_rank: int):
        """Pool key for one (tp, cp) shard granule of a block's pages."""
        if self.tp_shards == 1 and self.cp_shards == 1:
            return self.connector._key(block_hash)
        from .metadata import PoolKey

        c = self.connector
        return PoolKey(block_hash, c.model, tp_rank, c.pp_rank,
                       cp_rank, cp_rank)

    def _store_shards(self, block_hash, pages) -> None:
        """Split canonical pages into per-shard granules and store each
        under its PoolKey coords."""
        granules = split_pages(pages, self.tp_shards, self.cp_shards,
                               self.engine.block_size)
        for (i, j), g in granules.items():
            self.store.put(self._shard_key(block_hash, i, j), g)

    def _fetch_shards(self, block_hash):
        """Fetch every shard granule of a block; None if any is missing."""
        shards = {}
        for i in range(self.tp_shards):
            for j in range(self.cp_shards):
                g = self.store.get(self._shard_key(block_hash, i, j))
                if g is None:
                    return None
                shards[(i, j)] = g
        return merge_pages(shards, self.tp_shards, self.cp_shards,
                           self.engine.block_size)

    # ---- pull (decode side / admission) --------------------------------------

    def _fetch_prefix(self, token_ids: Sequence[int], timeout: float = 30.0):
        """Transfer-plane half of a pull (SAFE off the serving thread: only
        touches connector/metadata/store, never the engine cache).
        Returns (matched_tokens, new_hashes, new_pages)."""
        eng = self.engine
        bs = eng.block_size
        hashes = compute_block_hashes(list(token_ids), bs, eng.kv_mgr.extra_key)
        if not hashes:
            return 0, [], []

        rid = f"pull-{self._next}"
        self._next += 1
        n_tokens, load_async = self.connector.get_num_new_matched_tokens(rid, hashes)
        if n_tokens == 0:
            return 0, [], []
        if load_async and not self.connector.wait_for_kv(rid, timeout=timeout):
            return 0, [], []  # transfer failed/timed out -> recompute locally
        n_blocks = n_tokens // bs
        new_hashes, new_pages = self._collect_pages(hashes, n_blocks)
        return n_blocks * bs, new_hashes, new_pages

    def _collect_pages(self, hashes, n_blocks: int):
        """Pages for the first n_blocks hashes not already locally cached."""
        eng = self.engine
        new_hashes, new_pages = [], []
        for h in hashes[:n_blocks]:
            if eng.kv_mgr.pool.get_cached_block(h) is not None:
                continue
            pages = self._fetch_shards(h)
            if pages is None:
                break  # chain break: stop at the first unfetchable block
            new_hashes.append(h)
            new_pages.append(pages)
        return new_hashes, new_pages

    def _install_prefix(self, new_hashes, new_pages) -> None:
        """Cache-plane half of a pull — MUST run on the serving thread (the
        engine's step donates the cache arrays; concurrent injection races
        with donation)."""
        if not new_hashes:
            return
        eng = self.engine
        try:
            ids = eng.kv_mgr.pool.get_new_blocks(len(new_hashes))
        except RuntimeError:
            return  # local pool full: fall back to recompute
        for bid, pages in zip(ids, new_pages):
            inject_kv_pages(eng, [bid], pages)
        # Register + release: ref 0 but hashed => future admissions hit.
        eng.kv_mgr.pool.cache_full_blocks(ids, new_hashes, 0, len(new_hashes))
        eng.kv_mgr.pool.free_blocks(ids)
        self.connector.mark_local(new_hashes)

    def pull_prefix(self, token_ids: Sequence[int], timeout: float = 30.0) -> int:
        """Pull the longest published prefix into the LOCAL prefix cache
        (synchronous).  Returns the number of tokens made local."""
        n_tokens, new_hashes, new_pages = self._fetch_prefix(token_ids, timeout)
        self._install_prefix(new_hashes, new_pages)
        return n_tokens

    # ---- async admission (WAITING_FOR_REMOTE_KVS) -----------------------------

    def submit_async(self, prompt: Sequence[int], sampling) -> dict:
        """Non-blocking submit: the remote-prefix pull runs in a background
        thread (the request is effectively WAITING_FOR_REMOTE_KVS) while the
        engine keeps serving other traffic; the request admits on the next
        ``poll_admissions``/``step`` after the pull lands.  Returns a handle
        dict (``handle["req_id"]`` is set once admitted)."""
        handle = {"prompt": list(prompt), "sampling": sampling,
                  "ready": False, "req_id": None}
        with self._alock:
            self._pending.append(handle)

        def _work():
            # Only the transfer plane runs here; injection into the engine
            # cache is deferred to poll_admissions on the serving thread.
            try:
                _, hs, pgs = self._fetch_prefix(handle["prompt"])
                handle["fetched"] = (hs, pgs)
            except Exception:
                handle["fetched"] = ([], [])
            finally:
                handle["ready"] = True

        threading.Thread(target=_work, daemon=True).start()
        return handle

    def poll_admissions(self) -> List[int]:
        """Admit every async submit whose remote pull completed."""
        with self._alock:
            ready = [h for h in self._pending if h["ready"]]
            self._pending = [h for h in self._pending if not h["ready"]]
        ids = []
        for h in ready:
            hs, pgs = h.get("fetched", ([], []))
            self._install_prefix(hs, pgs)
            h["req_id"] = self.engine.add_request(h["prompt"], h["sampling"])
            ids.append(h["req_id"])
        return ids

    @property
    def num_waiting_remote(self) -> int:
        with self._alock:
            return len(self._pending) + len(self._sched_pulls)

    def step(self):
        """One serving iteration: admit landed pulls, then engine.step()."""
        self.poll_admissions()
        return self.engine.step()

    # ---- scheduler-native connector (core/scheduler.py Phase 0/3) -------------

    def attach(self) -> "PDWorker":
        """Make the engine's own Scheduler consult this worker at admission:
        new requests with a published remote prefix are held in
        WAITING_FOR_REMOTE_KVS (the enum finally drives the scheduler — the
        vLLM KVConnector integration, global_kv_pool.py:375-440) while the
        pull runs, then admit with the prefix already local."""
        self.engine.scheduler.connector = self
        return self

    def start_pull(self, request) -> bool:
        """Scheduler admission hook.  Synchronously queries the metadata
        server; if a remote prefix exists, kicks off the transfer + page
        fetch in a background thread and returns True (the scheduler parks
        the request in WAITING_FOR_REMOTE_KVS)."""
        eng = self.engine
        bs = eng.block_size
        hashes = compute_block_hashes(
            list(request.prompt_token_ids), bs, eng.kv_mgr.extra_key)
        if not hashes:
            return False
        rid = f"sched-pull-{request.req_id}"
        n_tokens, load_async = self.connector.get_num_new_matched_tokens(rid, hashes)
        # Anything already local (or nothing matched): admit now.
        need_fetch = any(
            eng.kv_mgr.pool.get_cached_block(h) is None
            for h in hashes[: n_tokens // bs]
        ) if n_tokens else False
        if not need_fetch:
            if load_async:
                self.connector.wait_for_kv(rid, timeout=0.0)  # drop bookkeeping
            return False
        handle = {"ready": False, "fetched": ([], [])}
        self._sched_pulls[request.req_id] = handle

        def _work():
            try:
                ok = (not load_async) or self.connector.wait_for_kv(rid)
                if ok:
                    handle["fetched"] = self._collect_pages(
                        hashes, n_tokens // bs)
            except Exception:
                pass
            finally:
                handle["ready"] = True

        threading.Thread(target=_work, daemon=True).start()
        return True

    def poll(self, request):
        """Scheduler Phase-0 hook: None while the pull is in flight; once it
        lands, install the pages into the local prefix cache (we are ON the
        serving thread here) and return the token count made local."""
        handle = self._sched_pulls.get(request.req_id)
        if handle is None:
            return 0
        if not handle["ready"]:
            return None
        del self._sched_pulls[request.req_id]
        hs, pgs = handle["fetched"]
        self._install_prefix(hs, pgs)
        request.num_remote_tokens = len(hs) * self.engine.block_size
        return request.num_remote_tokens

    # ---- streaming layerwise publish (BLOG_PART2B_V2.md:1593-1722) ------------

    def enable_streaming_publish(self) -> "PDWorker":
        """Publish blocks DURING chunked prefill instead of at request end:
        the moment a prefill chunk completes full blocks (cache_blocks), the
        serving thread extracts their pages (device gather, async dispatch)
        and a background publisher streams them through a per-block
        ``LayerwiseKVPipeline`` — layer l's granule rides the wire while
        l+1.. are still being staged, the SendingThread pattern.  Metadata
        publishes when the last layer lands, so a decode node's admission
        can hit the prefix while this node is still decoding."""
        import queue as _q

        from .transfer import LayerwiseKVPipeline

        if self._pub_thread is not None:
            return self
        self._pub_q: "_q.Queue" = _q.Queue()
        num_layers = self.engine.config.model.num_layers

        def _publisher():
            while True:
                item = self._pub_q.get()
                if item is None:
                    return
                h, pages = item
                pipe = LayerwiseKVPipeline(
                    self.connector.engine, self.connector.node_id, num_layers)
                per_block_bytes = max(
                    1, sum(x.nbytes for x in jax.tree.leaves(pages)) // num_layers)
                for l in range(num_layers):
                    granule = jax.tree.map(lambda x: x[l : l + 1], pages)
                    pipe.send_layer(l, granule, [h],
                                    bytes_per_block=per_block_bytes)
                results = pipe.wait_all()
                if all(r is not None and r.success for r in results):
                    self._store_shards(h, pages)
                    self.connector.publish_kv([h])
                self._pub_q.task_done()

        def _on_cached(request, start, bids, hashes):
            # Prompt blocks only — the PD handoff payload.  (Blocks containing
            # generated tokens are still published at request finish.)
            bs = self.engine.block_size
            for i, (bid, h) in enumerate(zip(bids, hashes)):
                if (start + i + 1) * bs <= request.num_prompt_tokens:
                    self._pub_q.put((h, extract_kv_pages(self.engine, [bid])))

        self.engine.kv_mgr.on_cache_blocks = _on_cached
        self._pub_thread = threading.Thread(target=_publisher, daemon=True)
        self._pub_thread.start()
        return self

    def flush_publishes(self, timeout: float = 10.0) -> bool:
        """Block until every queued streaming publish has landed."""
        import time as _t

        if self._pub_q is None:
            return True
        deadline = _t.monotonic() + timeout
        while _t.monotonic() < deadline:
            if self._pub_q.unfinished_tasks == 0:
                return True
            _t.sleep(0.002)
        return False

    # ---- serve ---------------------------------------------------------------

    def generate(self, prompts, sampling, publish: bool = True):
        """Pool-aware serving: pull published prefixes, generate, publish."""
        for p in prompts:
            self.pull_prefix(p)
        out = self.engine.generate(prompts, sampling)
        if publish:
            for p in prompts:
                self.publish_finished(p)
        return out
