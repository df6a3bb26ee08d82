"""PD disaggregation with REAL KV bytes (distributed/pd.py).

Stronger than the reference's module-06 simulation: the decode engine
generates from pages a different engine computed and published.  The
correctness oracle is exact: with shared weights, pulled-prefix generation
must equal cold local generation token for token.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_from_scratch_tpu.core.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_from_scratch_tpu.core.engine import LLMEngine
from vllm_from_scratch_tpu.distributed.connector import KVConnector
from vllm_from_scratch_tpu.distributed.metadata import GlobalMetadataServer
from vllm_from_scratch_tpu.distributed.pd import (
    PageStore,
    PDWorker,
    extract_kv_pages,
    inject_kv_pages,
)
from vllm_from_scratch_tpu.distributed.transfer import TransferEngine

GREEDY = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
PROMPT = list(range(1, 49))  # 3 full blocks


def make_engine(kv_quant="int8", seed=0, mla=False):
    kw = dict(vocab_size=128, hidden_size=64, num_layers=2,
              num_heads=4, num_kv_heads=4, max_position=256,
              intermediate_size=64)
    if mla:
        kw.update(kv_lora_rank=16, qk_rope_head_dim=8, qk_nope_head_dim=16,
                  v_head_dim=16)
    return LLMEngine(EngineConfig(
        model=ModelConfig(**kw),
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant=kv_quant),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=128),
        seed=seed,
    ))


@pytest.fixture
def cluster():
    meta = GlobalMetadataServer()
    store = PageStore()
    workers = []
    for node in range(2):
        eng = make_engine()  # same seed => same weights cluster-wide
        conn = KVConnector(node, meta, TransferEngine(node), 16)
        workers.append(PDWorker(eng, conn, store))
    return workers, meta, store


class TestPageMovement:
    def test_extract_inject_roundtrip(self):
        a, b = make_engine(), make_engine()
        # Serve on A so its cache has real content, cached in its prefix pool.
        a.generate([PROMPT], GREEDY)
        h = a.kv_mgr.pool  # find a cached block to move
        from vllm_from_scratch_tpu.core.hashing import compute_block_hashes

        hashes = compute_block_hashes(PROMPT, 16)
        bid = h.get_cached_block(hashes[0])
        assert bid is not None
        pages = extract_kv_pages(a, [bid])
        ids = b.kv_mgr.pool.get_new_blocks(1)
        inject_kv_pages(b, ids, pages)
        got = extract_kv_pages(b, ids)
        for x, y in zip(jax.tree.leaves(pages), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_pulled_prefix_generates_identically(self, cluster):
        """The acceptance oracle: decode-from-pulled-KV == decode-from-own-
        prefill, token for token."""
        (wa, wb), meta, store = cluster
        cold = make_engine().generate([PROMPT], GREEDY)  # ground truth

        out_a = wa.generate([PROMPT], GREEDY)            # computes + publishes
        assert meta.total_blocks > 0 and len(store) > 0

        pulled = wb.pull_prefix(PROMPT)
        assert pulled >= 32                              # >= 2 of 3 blocks
        out_b = wb.engine.generate([PROMPT], GREEDY)
        assert wb.engine.kv_mgr.hit_rate > 0             # prefill skipped
        assert list(out_b.values()) == list(cold.values())
        assert list(out_a.values()) == list(cold.values())

    def test_pull_miss_is_noop(self, cluster):
        (wa, wb), meta, store = cluster
        assert wb.pull_prefix(list(range(60, 90))) == 0

    def test_publish_then_node_restart_recompute(self, cluster):
        """Store entry vanishing (node restart) degrades to recompute."""
        (wa, wb), meta, store = cluster
        wa.generate([PROMPT], GREEDY)
        # the store loses its pages (simulated node restart)
        from vllm_from_scratch_tpu.core.hashing import compute_block_hashes

        for h in compute_block_hashes(PROMPT, 16):
            store.drop(h)
        pulled = wb.pull_prefix(PROMPT)
        assert pulled >= 0  # metadata may match, but no pages -> partial/none
        out = wb.engine.generate([PROMPT], GREEDY)       # still serves
        cold = make_engine().generate([PROMPT], GREEDY)
        assert list(out.values()) == list(cold.values())


    def test_mla_latent_pages_move(self):
        """The data plane is cache-layout agnostic: MLA latent pages
        (c/kr/scales) move and reproduce cold generation exactly."""
        meta, store = GlobalMetadataServer(), PageStore()
        wa = PDWorker(make_engine(mla=True),
                      KVConnector(0, meta, TransferEngine(0), 16), store)
        wb = PDWorker(make_engine(mla=True),
                      KVConnector(1, meta, TransferEngine(1), 16), store)
        cold = make_engine(mla=True).generate([PROMPT], GREEDY)
        wa.generate([PROMPT], GREEDY)
        assert wb.pull_prefix(PROMPT) >= 32
        out = wb.engine.generate([PROMPT], GREEDY)
        assert wb.engine.kv_mgr.hit_rate > 0
        assert list(out.values()) == list(cold.values())


class TestShardedEnginePD:
    """PD across SHARDED engines (VERDICT r2 #7; ref TP-layout constraints
    on KV transfer, BLOG_PART2_V2.md:322-380): pages publish as per-shard
    granules keyed by PoolKey (tp_rank / pcp_rank / dcp_rank coords), the
    pull side reassembles, and outputs stay exact."""

    def _sharded_engine(self, mla=False, **pkw):
        from vllm_from_scratch_tpu.core.config import ParallelConfig

        kw = dict(vocab_size=128, hidden_size=64, num_layers=2,
                  num_heads=4, num_kv_heads=4, max_position=256,
                  intermediate_size=64)
        if mla:
            kw.update(kv_lora_rank=16, qk_rope_head_dim=8,
                      qk_nope_head_dim=16, v_head_dim=16)
        return LLMEngine(EngineConfig(
            model=ModelConfig(**kw),
            cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="int8"),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=128),
            parallel=ParallelConfig(**pkw),
        ))

    def _worker(self, eng, node, meta, store):
        conn = KVConnector(node, meta, TransferEngine(node), eng.block_size)
        return PDWorker(eng, conn, store)

    def test_tp2_publish_tp2_pull_exact(self):
        """GQA cache head-sharded over tp2 on both sides: granules carry
        tp_rank coords; decode output == cold single-device output."""
        from vllm_from_scratch_tpu.distributed.metadata import PoolKey

        meta, store = GlobalMetadataServer(), PageStore()
        wa = self._worker(self._sharded_engine(tp_size=2), 0, meta, store)
        wb = self._worker(self._sharded_engine(tp_size=2), 1, meta, store)
        assert (wa.tp_shards, wa.cp_shards) == (2, 1)
        cold = make_engine().generate([PROMPT], GREEDY)

        out_a = wa.generate([PROMPT], GREEDY)
        keys = store.keys()
        assert any(isinstance(k, PoolKey) and k.tp_rank == 1 for k in keys)

        assert wb.pull_prefix(PROMPT) >= 32
        out_b = wb.engine.generate([PROMPT], GREEDY)
        assert wb.engine.kv_mgr.hit_rate > 0
        assert list(out_b.values()) == list(cold.values())
        assert list(out_a.values()) == list(cold.values())

    def test_cp2_publish_cp2_pull_exact(self):
        """MLA latent cache slot-sharded over cp2: granules carry pcp/dcp
        coords and the interleaved token order reassembles exactly."""
        from vllm_from_scratch_tpu.distributed.metadata import PoolKey

        meta, store = GlobalMetadataServer(), PageStore()
        wa = self._worker(self._sharded_engine(mla=True, cp_size=2),
                          0, meta, store)
        wb = self._worker(self._sharded_engine(mla=True, cp_size=2),
                          1, meta, store)
        assert (wa.tp_shards, wa.cp_shards) == (1, 2)
        cold = make_engine(mla=True).generate([PROMPT], GREEDY)

        wa.generate([PROMPT], GREEDY)
        keys = store.keys()
        assert any(isinstance(k, PoolKey) and k.dcp_rank == 1 for k in keys)

        assert wb.pull_prefix(PROMPT) >= 32   # one 32-token virtual block
        out = wb.engine.generate([PROMPT], GREEDY)
        assert wb.engine.kv_mgr.hit_rate > 0
        assert list(out.values()) == list(cold.values())

    def test_cp2_tp2_publish_pull_exact(self):
        """The composed layout (cp2 x tp2, MLA) round-trips too."""
        meta, store = GlobalMetadataServer(), PageStore()
        wa = self._worker(
            self._sharded_engine(mla=True, cp_size=2, tp_size=2),
            0, meta, store)
        wb = self._worker(
            self._sharded_engine(mla=True, cp_size=2, tp_size=2),
            1, meta, store)
        cold = make_engine(mla=True).generate([PROMPT], GREEDY)
        wa.generate([PROMPT], GREEDY)
        assert wb.pull_prefix(PROMPT) >= 32
        out = wb.engine.generate([PROMPT], GREEDY)
        assert list(out.values()) == list(cold.values())

    def test_split_merge_roundtrip(self):
        """split_pages/merge_pages invert for every layout factor pair."""
        from vllm_from_scratch_tpu.distributed.pd import (
            merge_pages, split_pages,
        )

        rng = np.random.RandomState(0)
        # KVCache-shaped leaves: [L, rows, H, D] + [L, rows, H] scales.
        pages = {
            "k": jnp.asarray(rng.randn(2, 64, 4, 8), jnp.float32),
            "k_scale": jnp.asarray(rng.randn(2, 64, 4), jnp.float32),
        }
        for tp, cp in [(1, 1), (2, 1), (1, 2), (2, 2), (1, 4)]:
            shards = split_pages(pages, tp, cp, block_size=16 * cp)
            assert len(shards) == tp * cp
            back = merge_pages(shards, tp, cp, block_size=16 * cp)
            for x, y in zip(jax.tree.leaves(pages), jax.tree.leaves(back)):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestAsyncAdmission:
    def test_remote_pull_overlaps_local_serving(self):
        """A request waiting on a slow remote KV pull must not block other
        traffic: a locally-submitted request finishes while the pull is in
        flight; the remote one admits afterwards with a prefix hit and
        produces the exact cold output."""
        import time as _t

        from vllm_from_scratch_tpu.distributed.transfer import (
            TransferEngine, TransferResult,
        )

        class SlowWire:
            def transfer(self, req):
                _t.sleep(0.6)
                return TransferResult(req.transfer_id, True, 100, 0.6)

        meta, store = GlobalMetadataServer(), PageStore()
        wa = PDWorker(make_engine(),
                      KVConnector(0, meta, TransferEngine(0), 16), store)
        wb = PDWorker(make_engine(),
                      KVConnector(1, meta, TransferEngine(1, backend=SlowWire()),
                                  16), store)
        cold = make_engine().generate([PROMPT], GREEDY)
        wa.generate([PROMPT], GREEDY)  # publish

        handle = wb.submit_async(PROMPT, GREEDY)           # slow remote pull
        local_id = wb.engine.add_request([99, 98, 97], GREEDY)
        local_done = None
        outputs = {}
        deadline = _t.monotonic() + 30
        while (_t.monotonic() < deadline
               and (wb.num_waiting_remote or wb.engine.has_unfinished
                    or handle["req_id"] is None
                    or len(outputs.get(handle["req_id"], [])) < 8)):
            for rid, tok in wb.step():
                outputs.setdefault(rid, []).append(tok)
                if rid == local_id and len(outputs[rid]) == 8:
                    local_done = _t.monotonic()
                    # at this moment the remote request is still pulling
                    if wb.num_waiting_remote:
                        assert handle["req_id"] is None

        assert local_done is not None
        assert handle["req_id"] is not None
        assert outputs[handle["req_id"]] == list(cold.values())[0]
        assert wb.engine.kv_mgr.hit_rate > 0


class TestRouter:
    """DP request router (SURVEY §2c DP row): prefix affinity + load balance."""

    def _cluster(self, n=3):
        meta, store = GlobalMetadataServer(), PageStore()
        workers = [
            PDWorker(make_engine(),
                     KVConnector(i, meta, TransferEngine(i), 16), store)
            for i in range(n)
        ]
        from vllm_from_scratch_tpu.distributed.router import Router

        return Router(workers, meta), workers, meta

    def test_prefix_affinity(self):
        router, workers, meta = self._cluster()
        # node 1 serves + publishes the prefix
        workers[1].generate([PROMPT], GREEDY)
        w = router.pick(PROMPT + [7, 8])
        assert w is workers[1]
        assert router.stats["affinity_hits"] == 1

    def test_cold_requests_balance_by_load(self):
        router, workers, meta = self._cluster()
        # preload node 0 with traffic
        for _ in range(3):
            workers[0].engine.add_request([1, 2, 3], GREEDY)
        w = router.pick(list(range(90, 99)))
        assert w is not workers[0]
        assert router.stats["balanced"] == 1

    def test_end_to_end_routing(self):
        router, workers, meta = self._cluster(2)
        cold = make_engine().generate([PROMPT], GREEDY)
        workers[0].generate([PROMPT], GREEDY)  # publish on node 0
        w, rid = router.submit(PROMPT, GREEDY)
        assert w is workers[0]                 # affinity: KV already local
        out = []
        for _ in range(200):
            for node, r, tok in router.step_all():
                if r == rid and w.connector.node_id == node:
                    out.append(tok)
            if len(out) >= 8:
                break
        assert out == list(cold.values())[0]
        assert w.engine.kv_mgr.hit_rate > 0    # served from the local prefix


class TestSchedulerNativeConnector:
    """The Scheduler itself consults the KV-pool connector at admission
    (VERDICT r1 #5; ref: global_kv_pool.py:375-440): fresh requests with a
    published remote prefix are parked in WAITING_FOR_REMOTE_KVS while the
    pull is in flight — other traffic keeps flowing — then admit with the
    prefix local, all through the plain ``engine.add_request / step`` API."""

    class _GatedBackend:
        """Transfer completes only when the test releases the gate."""

        def __init__(self):
            import threading

            self.gate = threading.Event()

        def transfer(self, req):
            from vllm_from_scratch_tpu.distributed.metadata import KV_BLOCK_BYTES
            from vllm_from_scratch_tpu.distributed.transfer import TransferResult

            assert self.gate.wait(20), "test gate never released"
            return TransferResult(
                req.transfer_id, True,
                len(req.block_hashes) * KV_BLOCK_BYTES, 0.0)

    def _pool_with_published_prompt(self):
        meta, store = GlobalMetadataServer(), PageStore()
        wa = PDWorker(make_engine(),
                      KVConnector(0, meta, TransferEngine(0), 16), store)
        wa.generate([PROMPT], GREEDY)  # computes + publishes
        return meta, store

    def test_holds_in_waiting_for_remote_kvs_then_admits(self):
        from vllm_from_scratch_tpu.core.request import RequestStatus

        meta, store = self._pool_with_published_prompt()
        gated = self._GatedBackend()
        wb = PDWorker(
            make_engine(),
            KVConnector(1, meta, TransferEngine(1, backend=gated), 16),
            store,
        ).attach()
        eng = wb.engine

        cold = make_engine().generate([PROMPT], GREEDY)
        rid = eng.add_request(PROMPT, GREEDY)
        local_rid = eng.add_request(list(range(90, 99)), GREEDY)
        eng.step()
        # The remote request is parked; the local one is being served.
        assert eng.scheduler.requests[rid].status is RequestStatus.WAITING_FOR_REMOTE_KVS
        assert eng.scheduler.requests[local_rid].status is RequestStatus.RUNNING
        local_req = eng.scheduler.requests[local_rid]  # popped on finish
        while not local_req.is_finished:
            eng.step()
        assert eng.scheduler.requests[rid].status is RequestStatus.WAITING_FOR_REMOTE_KVS

        gated.gate.set()  # transfer lands
        import time as _t

        out = []
        req = eng.scheduler.requests[rid]  # survives the finish-pop
        for _ in range(200):
            got = eng.step()
            if not got:
                _t.sleep(0.005)  # let the fetch thread land the pull
            out += [t for r, t in got if r == rid]
            if req.is_finished:
                break
        assert out == cold[0]
        assert req.num_remote_tokens >= 32          # 2 of 3 blocks pulled
        assert eng.kv_mgr.hit_rate > 0              # admission hit the prefix

    def test_no_remote_match_admits_immediately(self):
        from vllm_from_scratch_tpu.core.request import RequestStatus

        meta, store = GlobalMetadataServer(), PageStore()
        wb = PDWorker(make_engine(),
                      KVConnector(1, meta, TransferEngine(1), 16),
                      store).attach()
        rid = wb.engine.add_request(PROMPT, GREEDY)
        wb.engine.step()
        assert wb.engine.scheduler.requests[rid].status is RequestStatus.RUNNING


class TestStreamingPublish:
    """Layerwise streaming publish during chunked prefill (VERDICT r1 #5;
    the SendingThread pattern, BLOG_PART2B_V2.md:1593-1722): prompt blocks
    reach the pool the moment their chunk computes — a decode node's TTFT
    no longer waits for the prefill node's whole request to finish."""

    LONG_PROMPT = list(range(1, 65))  # 4 full blocks

    def _prefill_worker(self, streaming: bool):
        meta, store = GlobalMetadataServer(), PageStore()
        eng = LLMEngine(EngineConfig(
            model=ModelConfig(vocab_size=128, hidden_size=64, num_layers=2,
                              num_heads=4, num_kv_heads=4, max_position=256,
                              intermediate_size=64),
            cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="int8"),
            # small budget -> the 64-token prompt prefills over 4 chunks
            scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=16),
        ))
        wp = PDWorker(eng, KVConnector(0, meta, TransferEngine(0), 16), store)
        if streaming:
            wp.enable_streaming_publish()
        return wp, meta, store

    def _run_prefill_only(self, wp):
        """Step until the first token (prefill just completed); request keeps
        decoding afterwards (max_new_tokens not reached)."""
        sp = SamplingParams(max_new_tokens=32, temperature=0.0, ignore_eos=True)
        wp.engine.add_request(self.LONG_PROMPT, sp)
        for _ in range(50):
            if wp.engine.step():
                return
        raise AssertionError("prefill never completed")

    def test_blocks_published_mid_request(self):
        wp, meta, store = self._prefill_worker(streaming=True)
        self._run_prefill_only(wp)
        assert wp.engine.has_unfinished          # still decoding
        assert wp.flush_publishes()
        assert meta.total_blocks == 4            # all prompt blocks pooled
        assert len(store) == 4

    def test_end_publish_has_nothing_at_same_point(self):
        wp, meta, store = self._prefill_worker(streaming=False)
        self._run_prefill_only(wp)
        assert meta.total_blocks == 0 and len(store) == 0

    def test_decode_node_ttft_beats_end_publish(self):
        """While the prefill node is still mid-request, a decode node can
        already admit with the streamed prefix: its own prefill work is one
        final chunk instead of the whole prompt."""
        wp, meta, store = self._prefill_worker(streaming=True)
        self._run_prefill_only(wp)
        wp.flush_publishes()

        wd = PDWorker(make_engine(),
                      KVConnector(1, meta, TransferEngine(1), 16),
                      store).attach()
        cold = make_engine().generate([self.LONG_PROMPT], GREEDY)
        import time as _t

        rid = wd.engine.add_request(self.LONG_PROMPT, GREEDY)
        out = []
        for s in range(200):
            emitted = wd.engine.step()
            if not emitted:
                _t.sleep(0.005)  # remote pull in flight
            out += [t for r, t in emitted if r == rid]
            if rid not in wd.engine.scheduler.requests:
                break  # finished requests are popped
        assert out == cold[0]
        # Prefill at the decode node = last block + final token only.
        assert wd.engine.metrics["num_prefill_tokens"] <= 17
        # vs end-publish-only: nothing pooled -> full 64-token local prefill.
        wp2, meta2, store2 = self._prefill_worker(streaming=False)
        self._run_prefill_only(wp2)
        wd2 = PDWorker(make_engine(),
                       KVConnector(1, meta2, TransferEngine(1), 16),
                       store2).attach()
        rid2 = wd2.engine.add_request(self.LONG_PROMPT, GREEDY)
        for _ in range(200):
            emitted = wd2.engine.step()
            if not emitted:
                _t.sleep(0.005)
            if [t for r, t in emitted if r == rid2]:
                break
        assert wd2.engine.metrics["num_prefill_tokens"] >= 64
