"""Global KV pool / PD disaggregation tests — full port of the reference
suite 06 contract (06_global_prefix_cache/test_global_kv_pool.py, 34 cases):
chained hashing, metadata server (incl. 4-thread race test), transfer engine
(latency model, callbacks, concurrency), connector, and PD cluster
integration — plus failure-path tests the reference lacks (node offline,
failing backend, wait timeout)."""

import threading
import time

import pytest

from vllm_from_scratch_tpu.core.hashing import compute_block_hash, compute_block_hashes
from vllm_from_scratch_tpu.distributed.cluster import SimulatedCluster
from vllm_from_scratch_tpu.distributed.connector import KVConnector
from vllm_from_scratch_tpu.distributed.metadata import (
    BLOCK_SIZE,
    KV_BLOCK_BYTES,
    GlobalMetadataServer,
    KVBlockMeta,
)
from vllm_from_scratch_tpu.distributed.transfer import (
    LatencyModelBackend,
    TransferEngine,
    TransferRequest,
)


def hashes_of(tokens, extra_key=None):
    return compute_block_hashes(tokens, BLOCK_SIZE, extra_key)


# ---------------------------------------------------------------- hashing

class TestBlockHash:
    def test_same_tokens_same_hash(self):
        t = list(range(BLOCK_SIZE))
        assert hashes_of(t) == hashes_of(t)

    def test_different_tokens_different_hash(self):
        assert hashes_of(list(range(BLOCK_SIZE))) != hashes_of(
            list(range(BLOCK_SIZE, 2 * BLOCK_SIZE))
        )

    def test_chain_dependency(self):
        a = hashes_of(list(range(BLOCK_SIZE * 2)))
        b = hashes_of(list(range(1000, 1000 + BLOCK_SIZE)) + list(range(BLOCK_SIZE)))
        assert a[1] != b[1]

    def test_num_blocks(self):
        assert len(hashes_of(list(range(BLOCK_SIZE * 3 + 5)))) == 3

    def test_short_sequence(self):
        assert len(hashes_of(list(range(BLOCK_SIZE - 1)))) == 0

    def test_extra_key_changes_hash(self):
        t = list(range(BLOCK_SIZE))
        assert hashes_of(t, extra_key=None) != hashes_of(t, extra_key=42)


# ---------------------------------------------------------------- metadata

class TestGlobalMetadataServer:
    @pytest.fixture
    def meta(self):
        return GlobalMetadataServer()

    def test_publish_and_query(self, meta):
        hs = hashes_of(list(range(BLOCK_SIZE * 3)))
        meta.publish(hs[0], node_id=0, token_ids=tuple(range(BLOCK_SIZE)))
        n, metas = meta.query_prefix([hs[0]])
        assert n == 1 and metas[0].block_hash == hs[0]

    def test_miss_returns_zero(self, meta):
        n, metas = meta.query_prefix([b"nope"])
        assert n == 0 and metas == []

    def test_chain_miss_stops_early(self, meta):
        hs = hashes_of(list(range(BLOCK_SIZE * 4)))
        meta.publish(hs[0], 0)
        meta.publish(hs[2], 0)  # gap at hs[1]
        n, _ = meta.query_prefix(hs[:3])
        assert n == 1

    def test_total_blocks(self, meta):
        for i in range(5):
            meta.publish(i, 0)
        assert meta.total_blocks == 5

    def test_unpublish(self, meta):
        meta.publish(123, 0)
        assert meta.total_blocks == 1
        assert meta.unpublish(123)
        assert meta.total_blocks == 0

    def test_unpublish_nonexistent(self, meta):
        assert not meta.unpublish(99999)

    def test_lru_eviction(self, meta):
        MAX = 5
        for i in range(MAX + 2):
            meta.publish(i, node_id=0, max_blocks_per_node=MAX)
        assert meta.node_stats()[0]["num_blocks"] <= MAX

    def test_lru_evicts_coldest(self, meta):
        for i in range(3):
            meta.publish(i, 0, max_blocks_per_node=3)
        meta.query_prefix([0])  # touch block 0
        time.sleep(0.002)
        meta.publish(3, 0, max_blocks_per_node=3)  # must evict 1 or 2, not 0
        assert meta.get(0) is not None
        assert meta.total_blocks == 3

    def test_hit_rate_counters(self, meta):
        hs = hashes_of(list(range(BLOCK_SIZE * 2)))
        meta.publish(hs[0], 0)
        meta.query_prefix([hs[0]])
        meta.query_prefix([b"miss"])
        assert meta.total_queries == 2 and meta.total_hits == 1

    def test_concurrent_publish(self, meta):
        errors = []

        def batch(start):
            try:
                for i in range(start, start + 50):
                    meta.publish(i, node_id=i % 4)
            except Exception as e:
                errors.append(str(e))

        threads = [threading.Thread(target=batch, args=(i * 50,)) for i in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert not errors and meta.total_blocks == 200

    def test_node_stats(self, meta):
        meta.publish(1, 0)
        meta.publish(2, 0)
        meta.publish(3, 1)
        stats = meta.node_stats()
        assert stats[0]["num_blocks"] == 2 and stats[1]["num_blocks"] == 1

    def test_unpublish_node_offline(self, meta):
        """Node failure: drop everything it owned (failure-detection path)."""
        for i in range(4):
            meta.publish(i, node_id=0)
        meta.publish(9, node_id=1)
        assert meta.unpublish_node(0) == 4
        assert meta.total_blocks == 1
        assert meta.get(9) is not None


# ---------------------------------------------------------------- transfer

class TestTransferEngine:
    @pytest.fixture
    def engine(self):
        return TransferEngine(node_id=10)

    def test_submit_returns_id(self, engine):
        tid = engine.submit_transfer(src_node_id=0, block_hashes=[1, 2, 3])
        assert isinstance(tid, str) and tid

    def test_unique_transfer_ids(self, engine):
        ids = [engine.submit_transfer(0, [i]) for i in range(10)]
        assert len(set(ids)) == 10

    def test_transfer_completes(self, engine):
        tid = engine.submit_transfer(0, [1])
        result = engine.wait(tid, timeout=5.0)
        assert result is not None and result.success

    def test_bytes_transferred(self, engine):
        tid = engine.submit_transfer(0, list(range(5)))
        assert engine.wait(tid, 5.0).bytes_transferred == 5 * KV_BLOCK_BYTES

    def test_callback_called(self, engine):
        got = []
        tid = engine.submit_transfer(0, [1], callback=got.append)
        engine.wait(tid, 5.0)
        time.sleep(0.05)
        assert len(got) == 1 and got[0].transfer_id == tid

    def test_is_complete(self, engine):
        tid = engine.submit_transfer(0, [1, 2])
        engine.wait(tid, 5.0)
        assert engine.is_complete(tid)

    def test_concurrent_transfers(self, engine):
        tids = [engine.submit_transfer(i % 4, [i, i + 1]) for i in range(10)]
        results = [engine.wait(t, 10.0) for t in tids]
        assert all(r is not None and r.success for r in results)

    def test_latency_model_intra_vs_cross_rack(self):
        """Same rack (node//4) is materially faster than cross-rack.

        Asserts on the MODELED duration the backend returns, not wall
        clock: the intra/cross gap is 0.8 ms (200 us vs 1 ms reference
        constants) while sleep-scheduling jitter on a loaded CI box is
        several ms — the wall-clock form of this test flaked in r3."""
        backend = LatencyModelBackend()
        req_near = TransferRequest("a", 8, 10, [1], bytes_per_block=1024)
        req_far = TransferRequest("b", 0, 10, [1], bytes_per_block=1024)
        near = backend.transfer(req_near).elapsed_s
        far = backend.transfer(req_far).elapsed_s
        assert far > near
        assert abs((far - near) - (1e-3 - 200e-6)) < 1e-9

    def test_wait_timeout_returns_none(self):
        class Slow:
            def transfer(self, req):
                time.sleep(1.0)
                from vllm_from_scratch_tpu.distributed.transfer import TransferResult
                return TransferResult(req.transfer_id, True, 0, 1.0)

        eng = TransferEngine(node_id=0, backend=Slow(), num_workers=1)
        tid = eng.submit_transfer(1, [1])
        assert eng.wait(tid, timeout=0.05) is None
        assert eng.wait(tid, timeout=5.0) is not None

    def test_failing_backend_reports_failure(self):
        class Broken:
            def transfer(self, req):
                raise IOError("link down")

        eng = TransferEngine(node_id=0, backend=Broken(), num_workers=1)
        tid = eng.submit_transfer(1, [1])
        result = eng.wait(tid, 5.0)
        assert result is not None and not result.success
        assert "link down" in result.error
        assert eng.stats["failed"] == 1


# ---------------------------------------------------------------- connector

class TestKVConnector:
    @pytest.fixture
    def setup(self):
        meta = GlobalMetadataServer()
        src = KVConnector(0, meta, TransferEngine(node_id=0), BLOCK_SIZE)
        dst = KVConnector(1, meta, TransferEngine(node_id=1), BLOCK_SIZE)
        return meta, src, dst

    def test_miss_returns_zero(self, setup):
        _, src, _ = setup
        hs = hashes_of(list(range(BLOCK_SIZE * 2)))
        n, load_async = src.get_num_new_matched_tokens("r0", hs)
        assert n == 0 and not load_async

    def test_local_hit_no_transfer(self, setup):
        meta, src, _ = setup
        hs = hashes_of(list(range(BLOCK_SIZE * 2)))
        for h in hs:
            meta.publish(h, node_id=0)
        n, load_async = src.get_num_new_matched_tokens("r0", hs)
        assert n == len(hs) * BLOCK_SIZE and not load_async

    def test_remote_hit_triggers_transfer(self, setup):
        meta, _, dst = setup
        hs = hashes_of(list(range(BLOCK_SIZE * 3)))
        for h in hs:
            meta.publish(h, node_id=0)
        n, load_async = dst.get_num_new_matched_tokens("r1", hs)
        assert n == len(hs) * BLOCK_SIZE and load_async

    def test_wait_for_kv_completes(self, setup):
        meta, _, dst = setup
        hs = hashes_of(list(range(BLOCK_SIZE * 2)))
        for h in hs:
            meta.publish(h, node_id=0)
        _, load_async = dst.get_num_new_matched_tokens("r2", hs)
        assert load_async
        assert dst.wait_for_kv("r2", timeout=10.0)

    def test_publish_kv(self, setup):
        meta, src, _ = setup
        tokens = list(range(BLOCK_SIZE * 4))
        hs = hashes_of(tokens)
        blocks = [tuple(tokens[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]) for i in range(len(hs))]
        assert src.publish_kv(hs, blocks) == len(hs)
        assert meta.total_blocks == len(hs)

    def test_stats_tracking(self, setup):
        meta, _, dst = setup
        hs = hashes_of(list(range(BLOCK_SIZE)))
        for h in hs:
            meta.publish(h, node_id=0)
        for i in range(3):
            dst.get_num_new_matched_tokens(f"r{i}", hs)
        assert dst.stats["queries"] == 3 and dst.stats["hits"] > 0

    def test_second_pull_is_local(self, setup):
        """After pulling and marking blocks local, re-query needs no transfer."""
        meta, _, dst = setup
        hs = hashes_of(list(range(BLOCK_SIZE * 2)))
        for h in hs:
            meta.publish(h, node_id=0)
        _, load_async = dst.get_num_new_matched_tokens("r0", hs)
        assert load_async and dst.wait_for_kv("r0")
        dst.mark_local(hs)
        _, load_async2 = dst.get_num_new_matched_tokens("r1", hs)
        assert not load_async2


# ---------------------------------------------------------------- cluster

class TestSimulatedCluster:
    @pytest.fixture
    def cluster(self):
        return SimulatedCluster(num_prefill_nodes=2, num_decode_nodes=2,
                                prefill_ms_per_token=0.05)

    def test_first_request_no_cache(self, cluster):
        cached, _ = cluster.simulate_prefill("req-0", list(range(BLOCK_SIZE * 5)), 0)
        assert cached == 0

    def test_second_request_cache_hit(self, cluster):
        sys_prompt = list(range(BLOCK_SIZE * 4))
        cluster.simulate_prefill("req-0", sys_prompt + [9999], 0)
        cached, _ = cluster.simulate_prefill("req-1", sys_prompt + [10000, 10001], 0)
        assert cached >= len(sys_prompt)

    def test_cross_node_cache_sharing(self, cluster):
        tokens = list(range(BLOCK_SIZE * 6))
        cluster.simulate_prefill("req-p", tokens, 0)
        from_cache, _ = cluster.simulate_decode("req-d", tokens, 0)
        assert from_cache == len(tokens)

    def test_global_pool_grows(self, cluster):
        initial = cluster.meta_server.total_blocks
        cluster.simulate_prefill("a", list(range(BLOCK_SIZE * 3)), 0)
        cluster.simulate_prefill("b", list(range(100, 100 + BLOCK_SIZE * 3)), 1)
        assert cluster.meta_server.total_blocks > initial

    def test_hit_rate_improves(self, cluster):
        sys_prompt = list(range(BLOCK_SIZE * 4))
        for i in range(5):
            cluster.simulate_prefill(f"warm-{i}", sys_prompt + [i * 100], 0)
        hr_warm = cluster.meta_server.hit_rate
        for i in range(5, 15):
            cluster.simulate_prefill(f"hot-{i}", sys_prompt + [i * 100], 0)
        assert cluster.meta_server.hit_rate >= hr_warm

    def test_prefill_hit_saves_time(self, cluster):
        """The 258ms -> 2ms effect (BLOG_PART2B_V2.md:3893-3911), scaled."""
        tokens = list(range(BLOCK_SIZE * 8))
        _, cold_ms = cluster.simulate_prefill("cold", tokens, 0)
        _, warm_ms = cluster.simulate_prefill("warm", tokens, 0)
        assert warm_ms < cold_ms

    def test_cross_prefill_node_pull(self, cluster):
        """Node 1 pulls node 0's blocks over the (simulated) wire."""
        tokens = list(range(BLOCK_SIZE * 4))
        cluster.simulate_prefill("on-0", tokens, 0)
        cached, _ = cluster.simulate_prefill("on-1", tokens, 1)
        assert cached == BLOCK_SIZE * 4
        assert cluster.prefill_nodes[1].stats["transfers"] > 0
        assert cluster.prefill_nodes[1].stats["transferred_bytes"] > 0


class TestPoolKeyLayout:
    """PoolKey addressing (BLOG_PART2B_V2.md:1247-1291): KV is only reusable
    between nodes with identical (model, tp_rank, pp_rank) layout."""

    def test_tp_rank_isolates_entries(self):
        from vllm_from_scratch_tpu.distributed.connector import KVConnector
        from vllm_from_scratch_tpu.distributed.metadata import GlobalMetadataServer
        from vllm_from_scratch_tpu.distributed.transfer import TransferEngine

        meta = GlobalMetadataServer()
        c_tp0 = KVConnector(0, meta, TransferEngine(0), 16, model="m", tp_rank=0)
        c_tp1 = KVConnector(1, meta, TransferEngine(1), 16, model="m", tp_rank=1)
        c_tp0_b = KVConnector(2, meta, TransferEngine(2), 16, model="m", tp_rank=0)

        hs = hashes_of(list(range(32)))
        c_tp0.publish_kv(hs)
        # other tp rank: same hashes, no hit (different shard layout)
        n, _ = c_tp1.get_num_new_matched_tokens("r1", hs)
        assert n == 0
        # same layout on another node: full hit
        n, load_async = c_tp0_b.get_num_new_matched_tokens("r2", hs)
        assert n == len(hs) * 16 and load_async
        assert c_tp0_b.wait_for_kv("r2")

    def test_model_isolates_entries(self):
        from vllm_from_scratch_tpu.distributed.connector import KVConnector
        from vllm_from_scratch_tpu.distributed.metadata import GlobalMetadataServer
        from vllm_from_scratch_tpu.distributed.transfer import TransferEngine

        meta = GlobalMetadataServer()
        a = KVConnector(0, meta, TransferEngine(0), 16, model="llama")
        b = KVConnector(1, meta, TransferEngine(1), 16, model="deepseek")
        hs = hashes_of(list(range(16)))
        a.publish_kv(hs)
        n, _ = b.get_num_new_matched_tokens("r", hs)
        assert n == 0

    def test_pp_rank_field_reserved(self):
        from vllm_from_scratch_tpu.distributed.metadata import PoolKey

        k1 = PoolKey(b"h", "m", tp_rank=0, pp_rank=0)
        k2 = PoolKey(b"h", "m", tp_rank=0, pp_rank=1)
        assert k1 != k2 and hash(k1) != hash(k2)


class TestDeviceCopyBackend:
    """Real KV movement: TransferEngine with the DeviceCopyBackend device_puts
    page pytrees onto the destination node's device (the on-TPU analogue of
    the RDMA data plane; the latency model stays for behavior tests)."""

    @pytest.fixture
    def engine(self):
        import jax

        from vllm_from_scratch_tpu.distributed.transfer import (
            DeviceCopyBackend, TransferEngine,
        )

        devs = jax.devices()
        if len(devs) < 2:
            pytest.skip("needs 2 devices")
        backend = DeviceCopyBackend({0: devs[0], 1: devs[1]})
        return TransferEngine(node_id=1, backend=backend)

    def test_pages_land_on_target_device(self, engine):
        import jax
        import jax.numpy as jnp

        pages = {
            "k": jnp.arange(16 * 4 * 8, dtype=jnp.int8).reshape(16, 4, 8),
            "scale": jnp.ones((16,), jnp.float32),
        }
        tid = engine.submit_transfer(0, [b"h1", b"h2"], payload=pages)
        res = engine.wait(tid, timeout=10.0)
        assert res is not None and res.success
        assert res.bytes_transferred == sum(
            x.nbytes for x in jax.tree.leaves(pages)
        )
        target = jax.devices()[1]
        for leaf in jax.tree.leaves(res.data):
            assert target in leaf.sharding.device_set
        import numpy as np

        np.testing.assert_array_equal(
            np.asarray(res.data["k"]), np.asarray(pages["k"]))


class TestLayerwisePipeline:
    """Layerwise KV send pipelining (BLOG_PART2B_V2.md:1593-1722 pattern):
    per-layer transfers overlap the remaining layers' compute."""

    def test_overlap_beats_sequential(self):
        """With per-layer compute ~= per-layer wire time, pipelined total
        ~= compute + 1 wire hop, vs compute + L wire hops sequentially."""
        import time as _t

        from vllm_from_scratch_tpu.distributed.transfer import (
            LayerwiseKVPipeline, TransferEngine,
        )

        L, wire_s, compute_s = 6, 0.02, 0.02

        class SlowWire:
            def transfer(self, req):
                _t.sleep(wire_s)
                from vllm_from_scratch_tpu.distributed.transfer import (
                    TransferResult,
                )
                return TransferResult(req.transfer_id, True, 100, wire_s)

        eng = TransferEngine(node_id=0, backend=SlowWire(), num_workers=2)
        pipe = LayerwiseKVPipeline(eng, dst_node_id=1, num_layers=L)
        t0 = _t.monotonic()
        for l in range(L):
            _t.sleep(compute_s)          # "layer compute"
            pipe.send_layer(l, payload=None, hashes=[l])
        results = pipe.wait_all()
        pipelined = _t.monotonic() - t0

        assert all(r and r.success for r in results)
        sequential = L * (compute_s + wire_s)
        # pipelined ~= L*compute + ~1 wire; allow generous slack
        assert pipelined < sequential * 0.85, (pipelined, sequential)

    def test_in_flight_tracking(self):
        from vllm_from_scratch_tpu.distributed.transfer import (
            LatencyModelBackend, LayerwiseKVPipeline, TransferEngine,
        )

        eng = TransferEngine(node_id=0, backend=LatencyModelBackend())
        pipe = LayerwiseKVPipeline(eng, dst_node_id=5, num_layers=3)
        for l in range(3):
            pipe.send_layer(l, payload=None, hashes=[b"a", b"b"])
        pipe.wait_all()
        assert pipe.num_in_flight == 0


class TestFailureRecovery:
    """SURVEY §5 failure handling: a dead node's pool entries are dropped
    (unpublish_node) and requests fall back to recompute — no wedged state."""

    def test_node_death_falls_back_to_recompute(self):
        cluster = SimulatedCluster(num_prefill_nodes=2, num_decode_nodes=1)
        prefix = list(range(256))
        cached0, _ = cluster.simulate_prefill("r1", prefix + [1], 0)
        assert cached0 == 0  # cold

        # node 0 dies: its published blocks leave the pool
        dropped = cluster.meta_server.unpublish_node(0)
        assert dropped > 0

        # same prefix on node 1: pool miss => recompute, then re-publish
        cached1, ms1 = cluster.simulate_prefill("r2", prefix + [2], 1)
        assert cached1 == 0
        cached2, ms2 = cluster.simulate_prefill("r3", prefix + [3], 1)
        assert cached2 >= 256 - 16  # warm again from node 1's publish
        assert ms2 < ms1

    def test_transfer_timeout_reports_failure(self):
        import time as _t

        from vllm_from_scratch_tpu.distributed.transfer import TransferEngine

        class HangingWire:
            def transfer(self, req):
                _t.sleep(5.0)
                from vllm_from_scratch_tpu.distributed.transfer import (
                    TransferResult,
                )
                return TransferResult(req.transfer_id, True, 0, 5.0)

        eng = TransferEngine(node_id=0, backend=HangingWire(), num_workers=1)
        tid = eng.submit_transfer(1, [b"x"])
        assert eng.wait(tid, timeout=0.1) is None  # caller sees the timeout


class TestHostBoundaryModel:
    """DCN readiness (VERDICT r1 missing #5): the device backend knows which
    HOST each node lives on — same-host copies are plain device_puts,
    cross-host copies pay the DCN cost model (on a real pod that cost sits
    in the cross-process device_put itself)."""

    def _engine(self, dcn_latency):
        import jax

        from vllm_from_scratch_tpu.distributed.transfer import (
            DeviceCopyBackend, TransferEngine,
        )

        devs = jax.devices()
        if len(devs) < 2:
            import pytest as _pt

            _pt.skip("needs 2 devices")
        backend = DeviceCopyBackend(
            {0: devs[0], 1: devs[1]},
            node_hosts={0: 0, 1: 1},       # two different hosts
            dcn_latency_s=dcn_latency,
        )
        return TransferEngine(node_id=1, backend=backend)

    def test_cross_host_charges_dcn_cost(self):
        import time as _t

        import jax.numpy as jnp

        pages = {"k": jnp.ones((64, 64), jnp.int8)}
        eng = self._engine(dcn_latency=0.2)
        t0 = _t.monotonic()
        res = eng.wait(eng.submit_transfer(0, [b"h"], payload=pages), 10.0)
        assert res is not None and res.success
        assert _t.monotonic() - t0 >= 0.2  # the DCN hop is not free

    def test_same_host_is_fast(self):
        import time as _t

        import jax
        import jax.numpy as jnp

        from vllm_from_scratch_tpu.distributed.transfer import (
            DeviceCopyBackend, TransferEngine,
        )

        devs = jax.devices()
        backend = DeviceCopyBackend(
            {0: devs[0], 1: devs[min(1, len(devs) - 1)]},
            node_hosts={0: 0, 1: 0},       # same host: ICI/PCIe, no DCN charge
            dcn_latency_s=5.0,
        )
        eng = TransferEngine(node_id=1, backend=backend)
        pages = {"k": jnp.ones((64, 64), jnp.int8)}
        t0 = _t.monotonic()
        res = eng.wait(eng.submit_transfer(0, [b"h"], payload=pages), 10.0)
        assert res is not None and res.success
        assert _t.monotonic() - t0 < 2.0
