"""Cross-process mesh validation: the sharded step over REAL OS processes.

Every other multi-chip artifact in this repo (tests/test_parallel.py, the
driver's dryrun_multichip) runs in ONE process with N virtual devices — the
collectives never cross a process boundary.  This module runs the same
sharded forward across ``num_processes`` OS processes connected by
``jax.distributed`` (CPU backend, ``devices_per_proc`` virtual devices
each), so psum/all_gather/ppermute actually traverse the cross-process
transport — the strongest check of SCALING.md's multi-host collective
assumptions available in a single-machine environment (SURVEY §4's
"multi-node without a cluster" idiom; VERDICT r3 next-round #8).

What each worker runs on the global (dp x tp) mesh:
1. GSPMD forward of the flagship MLA+MoE model with shard_map EP (psum
   dispatch) — params replicated across processes, batch rows sharded
   over dp (which SPANS the process boundary).
2. A cp=all-devices paged-ring chunk attention (ppermute around a ring
   that crosses the process boundary) via the serving cp body.

Workers assert logits are identical across processes (process_allgather)
and match a single-process oracle computed locally from the same seed.

Entry points: ``run_multiproc()`` (parent: spawns workers, returns a result
dict) and ``python -m vllm_from_scratch_tpu.parallel.multiproc`` /
``__graft_entry__.py dryrun_multiproc``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_WORKER_ENV = "VFS_MULTIPROC_WORKER"


def _worker(coordinator: str, num_procs: int, pid: int,
            devices_per_proc: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_procs
    n_global = jax.device_count()
    assert n_global == num_procs * devices_per_proc, n_global

    from ..core.config import ModelConfig
    from ..models import transformer
    from ..models.transformer import ModelBatch

    mcfg = ModelConfig(
        vocab_size=512, hidden_size=128, num_layers=2,
        num_heads=8, num_kv_heads=8, max_position=512,
        intermediate_size=128,
        kv_lora_rank=32, qk_rope_head_dim=16, qk_nope_head_dim=32,
        v_head_dim=32,
        num_experts=8, top_k=2, num_shared_experts=1,
    )
    # dp spans the PROCESS boundary (2 procs x 4 devices -> dp=2 rows, one
    # per process; tp=4 within each process): the EP psum crosses transport.
    mesh = Mesh(
        np.asarray(jax.devices()).reshape(num_procs, devices_per_proc),
        ("dp", "tp"),
    )

    key = jax.random.PRNGKey(0)
    params_host = transformer.init_params(key, mcfg)  # same on every proc
    cache_host = transformer.init_cache(mcfg, num_blocks=16, block_size=16,
                                        kv_quant="none")

    def put_replicated(tree):
        sh = NamedSharding(mesh, P())

        def one(x):
            return jax.make_array_from_callback(
                np.shape(x), sh, lambda idx: np.asarray(x)[idx])

        return jax.tree.map(one, tree)

    params = put_replicated(params_host)
    cache = put_replicated(cache_host)

    B, T, N = 4, 16, 4
    rng = np.random.RandomState(7)
    batch_host = ModelBatch(
        tokens=rng.randint(1, 511, (B, T)).astype(np.int32),
        positions=np.tile(np.arange(T, dtype=np.int32), (B, 1)),
        slots=(np.arange(B * T, dtype=np.int32).reshape(B, T) + 16),
        block_tables=np.arange(1, 1 + B * N, dtype=np.int32).reshape(B, N),
        ctx_lens=np.full((B,), T, np.int32),
        q_lens=np.full((B,), T, np.int32),
    )

    def put_batch(tree):
        def one(x):
            sh = NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx])

        return jax.tree.map(one, tree)

    batch = put_batch(batch_host)

    fwd = jax.jit(lambda p, c, b: transformer.forward(
        p, c, b, mcfg, block_size=16, mesh=mesh, ep_dispatch="psum"))
    logits, _ = fwd(params, cache, batch)
    # Global (dp-sharded) array -> full value on every process, then a
    # host-local allgather stacks per-process copies for the agreement check.
    full = np.asarray(multihost_utils.process_allgather(logits, tiled=True))
    stack = multihost_utils.process_allgather(full, tiled=False)
    same = bool(np.array_equal(stack[0], stack[-1]))

    # Single-process oracle from the same seed (CPU, local devices only).
    oracle, _ = jax.jit(lambda p, c, b: transformer.forward(
        p, c, b, mcfg, block_size=16))(params_host, cache_host, batch_host)
    ok_fwd = bool(np.allclose(full, np.asarray(oracle),
                              atol=2e-4, rtol=2e-4))

    # ---- paged ring attention around a ring that crosses processes ------
    from ..ops.mla_attention import init_mla_cache
    from ..parallel.cp_serving import cp_mla_attention

    ring_mesh = Mesh(np.asarray(jax.devices()), ("cp",))
    H, dn, dr, r = 4, 16, 8, 32
    Tq = n_global * 2
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    qn = jax.random.normal(ks[0], (1, Tq, H, dn), jnp.float32)
    qr = jax.random.normal(ks[1], (1, Tq, H, dr), jnp.float32)
    cn = jax.random.normal(ks[2], (1 * Tq, r), jnp.float32)
    krn = jax.random.normal(ks[3], (1 * Tq, dr), jnp.float32)
    w_uk = jax.random.normal(ks[4], (H, dn, r), jnp.float32) * 0.1
    w_uv = jax.random.normal(ks[5], (H, r, 32), jnp.float32) * 0.1
    bs = 4
    Vbs = bs * n_global
    nb = -(-Tq // Vbs)
    cache_ring_host = init_mla_cache(
        num_blocks=8 * n_global, block_size=bs, kv_lora_rank=r, rope_dim=dr,
        kv_quant="none")
    slots = np.arange(Tq, dtype=np.int32) + Vbs  # skip null virtual block 0
    bt = np.arange(1, 1 + nb, dtype=np.int32)[None, :]
    ctx = np.full((1,), Tq, np.int32)

    sh_rep = NamedSharding(ring_mesh, P())
    put = lambda x: jax.make_array_from_callback(
        np.shape(x), sh_rep, lambda idx: np.asarray(x)[idx])
    cache_ring = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), NamedSharding(ring_mesh, P("cp")),
            lambda idx, x=x: np.asarray(x)[idx]),
        cache_ring_host)

    ring_fn = jax.jit(lambda *a: cp_mla_attention(
        *a, ring_mesh, block_size=bs, sm_scale=(dn + dr) ** -0.5,
        variant="ring"))
    out_ring, _ = ring_fn(put(qn), put(qr), put(cn), put(krn), cache_ring,
                          put(slots), put(bt), put(ctx), put(ctx),
                          put(w_uk), put(w_uv))
    merge_fn = jax.jit(lambda *a: cp_mla_attention(
        *a, ring_mesh, block_size=bs, sm_scale=(dn + dr) ** -0.5,
        variant="merge"))
    cache_ring2 = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), NamedSharding(ring_mesh, P("cp")),
            lambda idx, x=x: np.asarray(x)[idx]),
        cache_ring_host)
    out_merge, _ = merge_fn(put(qn), put(qr), put(cn), put(krn), cache_ring2,
                            put(slots), put(bt), put(ctx), put(ctx),
                            put(w_uk), put(w_uv))
    ring_full = np.asarray(multihost_utils.process_allgather(out_ring, tiled=True))
    merge_full = np.asarray(multihost_utils.process_allgather(out_merge, tiled=True))
    ok_ring = bool(np.allclose(ring_full, merge_full, atol=1e-4, rtol=1e-4))

    if pid == 0:
        print("MPJSON " + json.dumps({
            "processes": num_procs,
            "devices_per_process": devices_per_proc,
            "global_devices": n_global,
            "fwd_identical_across_processes": same,
            "fwd_matches_single_process_oracle": ok_fwd,
            "ring_crossproc_matches_merge": ok_ring,
            "ok": same and ok_fwd and ok_ring,
        }), flush=True)
    jax.distributed.shutdown()


def run_multiproc(num_procs: int = 2, devices_per_proc: int = 4,
                  timeout_s: float = 600.0) -> dict:
    """Spawn the workers, collect the pid-0 verdict."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = []
    for pid in range(num_procs):
        env = dict(os.environ)
        env[_WORKER_ENV] = json.dumps({
            "coordinator": coord, "num_procs": num_procs, "pid": pid,
            "devices_per_proc": devices_per_proc})
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "vllm_from_scratch_tpu.parallel.multiproc"],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    deadline = time.monotonic() + timeout_s
    outs = []
    for p in procs:
        left = max(1.0, deadline - time.monotonic())
        try:
            out, err = p.communicate(timeout=left)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            return {"ok": False, "error": "worker timeout", "stderr": err[-2000:]}
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        if rc != 0:
            return {"ok": False, "error": f"worker rc={rc}",
                    "stderr": err[-2000:]}
    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith("MPJSON "):
                return json.loads(line[len("MPJSON "):])
    return {"ok": False, "error": "no MPJSON line from workers"}


if __name__ == "__main__":
    spec = os.environ.get(_WORKER_ENV)
    if spec:
        kw = json.loads(spec)
        _worker(kw["coordinator"], kw["num_procs"], kw["pid"],
                kw["devices_per_proc"])
    else:
        print(json.dumps(run_multiproc()))
