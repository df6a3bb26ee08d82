"""Async KV transfer engine with pluggable backends.

Equivalent of the reference's RDMA-simulating TransferEngine (ref:
06_global_prefix_cache/global_kv_pool.py:217-331), restructured for TPU:

- The **engine** (queue, worker threads, results, callbacks, wait) is
  backend-agnostic.
- ``LatencyModelBackend`` reproduces the reference's cost model exactly —
  100 Gbps, 200 us intra-rack (rack = node_id // 4, :313), 1 ms cross-rack —
  so distributed logic is testable on any machine (SURVEY §4's
  "multi-node without a cluster" idiom).
- ``DeviceCopyBackend`` moves real ``jax.Array`` pages between devices/hosts
  with ``jax.device_put`` — the DCN path on a TPU pod (ICI collectives inside
  a slice are compiled by XLA and never go through this engine).

Improvements over the reference: completion uses a Condition instead of a
100 us poll loop (:288-296), and a transfer can report failure instead of
only success.
"""

from __future__ import annotations

import itertools
import queue
import threading
import time
from dataclasses import dataclass
from typing import Callable, Dict, Hashable, List, Optional, Sequence

from .metadata import KV_BLOCK_BYTES

GBPS = 100.0                    # link bandwidth (global_kv_pool.py:233)
INTRA_RACK_LATENCY_S = 200e-6   # :234
CROSS_RACK_LATENCY_S = 1e-3     # :235
NODES_PER_RACK = 4              # rack = node_id // 4 (:313)


@dataclass
class TransferRequest:
    transfer_id: str
    src_node_id: int
    dst_node_id: int
    block_hashes: List[Hashable]
    callback: Optional[Callable] = None
    payload: object = None        # backend-specific (e.g. device buffers)
    bytes_per_block: int = KV_BLOCK_BYTES


@dataclass
class TransferResult:
    transfer_id: str
    success: bool
    bytes_transferred: int
    elapsed_s: float
    error: Optional[str] = None
    data: object = None           # backend-specific received payload


class LatencyModelBackend:
    """The reference's RDMA cost model: sleep(latency + bytes / bandwidth)."""

    def transfer(self, req: TransferRequest) -> TransferResult:
        nbytes = len(req.block_hashes) * req.bytes_per_block
        same_rack = req.src_node_id // NODES_PER_RACK == req.dst_node_id // NODES_PER_RACK
        latency = INTRA_RACK_LATENCY_S if same_rack else CROSS_RACK_LATENCY_S
        t = latency + nbytes * 8 / (GBPS * 1e9)
        time.sleep(t)
        return TransferResult(req.transfer_id, True, nbytes, t)


class DeviceCopyBackend:
    """Real data movement: device_put the payload pytree onto a target device.

    ``payload`` must be a pytree of jax.Arrays; ``target_device`` is chosen
    per dst_node_id by the mapping given at construction.

    Host topology is modeled from day 1 (the multi-host readiness VERDICT r1
    asked for): ``node_hosts`` maps node_id -> host (process) index.  Same-
    host transfers ride ICI/PCIe (the plain device_put).  Cross-host
    transfers are the DCN path: on a real multi-host deployment the
    device_put crosses processes via jax's cross-host transfer; on this
    single-process rig the copy is local, so the DCN cost model
    (bandwidth + per-message latency) is charged explicitly so scheduling /
    break-even behavior matches a real pod (the reference's RDMA layer,
    BLOG_PART2B_V2.md:3470-3676, modeled the same way)."""

    def __init__(self, node_devices: dict, node_hosts: Optional[dict] = None,
                 dcn_gbps: float = GBPS,
                 dcn_latency_s: float = CROSS_RACK_LATENCY_S):
        self.node_devices = node_devices  # node_id -> jax.Device
        self.node_hosts = node_hosts or {}  # node_id -> host/process index
        self.dcn_gbps = dcn_gbps
        self.dcn_latency_s = dcn_latency_s

    def _host(self, node_id: int):
        return self.node_hosts.get(node_id, 0)

    def transfer(self, req: TransferRequest) -> TransferResult:
        import jax

        t0 = time.monotonic()
        dev = self.node_devices[req.dst_node_id]
        moved = jax.device_put(req.payload, dev)
        jax.block_until_ready(moved)
        nbytes = sum(x.nbytes for x in jax.tree.leaves(moved))
        cross_host = self._host(req.src_node_id) != self._host(req.dst_node_id)
        if cross_host:
            # Single-process stand-in for the DCN hop: charge its cost model
            # (a real multi-process run pays this in the device_put itself).
            time.sleep(self.dcn_latency_s + nbytes * 8 / (self.dcn_gbps * 1e9))
        return TransferResult(
            req.transfer_id, True, nbytes, time.monotonic() - t0, data=moved
        )


class TransferEngine:
    def __init__(self, node_id: int, backend=None, num_workers: int = 4):
        self.node_id = node_id
        self.backend = backend or LatencyModelBackend()
        self._queue: "queue.Queue[TransferRequest]" = queue.Queue()
        self._results: Dict[str, TransferResult] = {}
        self._cond = threading.Condition()
        self._counter = itertools.count()
        self.stats = {"submitted": 0, "completed": 0, "failed": 0, "bytes": 0}
        self._workers = [
            threading.Thread(target=self._worker_loop, daemon=True)
            for _ in range(num_workers)
        ]
        for w in self._workers:
            w.start()

    # ---- submit / wait -------------------------------------------------------

    def submit_transfer(
        self,
        src_node_id: int,
        block_hashes: Sequence[Hashable],
        callback: Optional[Callable] = None,
        payload: object = None,
        bytes_per_block: int = KV_BLOCK_BYTES,
    ) -> str:
        tid = f"xfer-{self.node_id}-{next(self._counter)}"
        req = TransferRequest(
            tid, src_node_id, self.node_id, list(block_hashes), callback,
            payload, bytes_per_block,
        )
        with self._cond:
            self.stats["submitted"] += 1
        self._queue.put(req)
        return tid

    def wait(self, transfer_id: str, timeout: float = 10.0) -> Optional[TransferResult]:
        deadline = time.monotonic() + timeout
        with self._cond:
            while transfer_id not in self._results:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return None
                self._cond.wait(remaining)
            return self._results[transfer_id]

    def is_complete(self, transfer_id: str) -> bool:
        with self._cond:
            return transfer_id in self._results

    # ---- worker ---------------------------------------------------------------

    def _worker_loop(self) -> None:
        while True:
            req = self._queue.get()
            try:
                result = self.backend.transfer(req)
            except Exception as e:  # failed transfer is a result, not a crash
                result = TransferResult(req.transfer_id, False, 0, 0.0, error=str(e))
            with self._cond:
                self._results[req.transfer_id] = result
                self.stats["completed" if result.success else "failed"] += 1
                self.stats["bytes"] += result.bytes_transferred
                self._cond.notify_all()
            if req.callback is not None:
                try:
                    req.callback(result)
                except Exception:
                    pass
            self._queue.task_done()


class LayerwiseKVPipeline:
    """Per-layer KV send/recv pipelining over a TransferEngine.

    Port of the Mooncake/LMCache SendingThread pattern the reference
    documents inline (BLOG_PART2B_V2.md:1593-1722): instead of shipping a
    request's whole KV at the end of prefill, each layer's pages are
    extracted and submitted the moment that layer finishes, so the
    transfer of layer l overlaps the compute of layers l+1..L — on TPU,
    extraction is a device slice (jax async dispatch) and the wire is the
    DCN (DeviceCopyBackend) or the latency-model fake in tests.

    Usage (sender side, inside/next to the serving loop):
        pipe = LayerwiseKVPipeline(engine, dst_node, num_layers)
        for l in range(L):
            ... compute layer l ...
            pipe.send_layer(l, payload=kv_pages_of_layer_l, hashes=[...])
        pipe.wait_all()   # returns per-layer TransferResults
    """

    def __init__(self, engine: "TransferEngine", dst_node_id: int,
                 num_layers: int):
        self.engine = engine
        self.dst = dst_node_id
        self.num_layers = num_layers
        self._tids: List[Optional[str]] = [None] * num_layers
        self._t0: List[float] = [0.0] * num_layers

    def send_layer(self, layer: int, payload, hashes: Sequence[Hashable],
                   bytes_per_block: int = KV_BLOCK_BYTES) -> str:
        """Non-blocking: enqueue layer ``layer``'s pages; returns transfer id."""
        assert self._tids[layer] is None, f"layer {layer} already sent"
        self._t0[layer] = time.monotonic()
        tid = self.engine.submit_transfer(
            self.dst, hashes, payload=payload, bytes_per_block=bytes_per_block
        )
        self._tids[layer] = tid
        return tid

    def wait_all(self, timeout: float = 30.0) -> List[Optional["TransferResult"]]:
        out: List[Optional[TransferResult]] = []
        for l, tid in enumerate(self._tids):
            out.append(self.engine.wait(tid, timeout=timeout) if tid else None)
        return out

    @property
    def num_in_flight(self) -> int:
        return sum(
            1 for tid in self._tids
            if tid is not None and not self.engine.is_complete(tid)
        )
