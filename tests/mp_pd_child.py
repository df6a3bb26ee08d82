"""Prefill-node child process for the multi-process PD test.

Run as a script (spawned by tests/test_multiprocess_pd.py): builds the tiny
engine, serves the shared prompt, publishes its KV blocks into a LOCAL
metadata server + page store, then exposes both over TCP (RPCServer) and
prints ``READY <meta_port> <store_port>``.  Exits when stdin closes.

This is the process-boundary half of the reference's PD deployment: its
prefill node publishes through ZMQ/RDMA (BLOG_PART2B_V2.md:2987-3315); here
the wire is the socket RPC layer in distributed/net.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

PROMPT = list(range(3, 3 + 48))  # 3 full blocks of 16
NEW_TOKENS = 8


def tiny_engine():
    from vllm_from_scratch_tpu.core.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_from_scratch_tpu.core.engine import LLMEngine

    return LLMEngine(EngineConfig(
        model=ModelConfig(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=4, max_position=256, intermediate_size=64,
        ),
        cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="int8"),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
    ))


def main():
    from vllm_from_scratch_tpu.core.config import SamplingParams
    from vllm_from_scratch_tpu.distributed.connector import KVConnector
    from vllm_from_scratch_tpu.distributed.metadata import GlobalMetadataServer
    from vllm_from_scratch_tpu.distributed.net import RPCServer
    from vllm_from_scratch_tpu.distributed.pd import PageStore, PDWorker
    from vllm_from_scratch_tpu.distributed.transfer import TransferEngine

    eng = tiny_engine()
    meta = GlobalMetadataServer()
    store = PageStore()
    connector = KVConnector(
        node_id=0, metadata_server=meta,
        transfer_engine=TransferEngine(node_id=0),
        block_size=eng.block_size,
    )
    worker = PDWorker(eng, connector, store)
    sp = SamplingParams(max_new_tokens=NEW_TOKENS, temperature=0.0,
                        ignore_eos=True)
    out = worker.generate([PROMPT], sp)
    published = worker.publish_finished(PROMPT)
    assert published > 0, "nothing published"

    meta_srv = RPCServer(meta)
    store_srv = RPCServer(store)
    toks = ",".join(str(t) for t in next(iter(out.values())))
    print(f"READY {meta_srv.port} {store_srv.port} {toks}", flush=True)
    sys.stdin.read()  # block until the parent closes our stdin


if __name__ == "__main__":
    main()
