"""Prefill-step anatomy probe at the bench_midsize shape.

bench_midsize r3 measured prefill at only ~9% MXU MFU (23.7k tok/s) while
decode sits at its bandwidth roofline — prefill is the unoptimized phase
(VERDICT r2 #3).  This probe times the pieces of ONE prefill chunk
([B, T] = 4 x 512 by default, the 2048-token scheduler chunk) as separate
jitted fori_loops, the same methodology as probe_step.py:

  full   — transformer.forward (attention + FFN + lm_head)
  attn   — layer scan applying ONLY the MLA attention block (+residual)
  ffn    — layer scan applying ONLY the MoE/FFN block (+residual)
  head   — final norm + last-position gather + lm_head

The sum vs `full` exposes fusion/materialization costs; each component vs
its FLOPs exposes which one burns the MFU.  Env knobs: B, T, CTX (history
tokens already in cache before the chunk; CTX=T means chunk==prompt),
BS (block size, default 128), TRACE=1 to dump a jax.profiler trace of the
full step to benchmarks/traces/prefill.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INNER = 8
#: comma-separated subset of full,attn,ffn,head (default all) — tunnel
#: compiles run minutes each, so re-runs select just the missing sections.
SECTIONS = os.environ.get("SECTIONS", "full,attn,ffn,head").split(",")

B = int(os.environ.get("B", "4"))
T = int(os.environ.get("T", "512"))
CTX = int(os.environ.get("CTX", str(T)))
BS = int(os.environ.get("BS", "128"))
MXU_BF16_FLOPS = 197e12


def main():
    from vllm_from_scratch_tpu.core.config import ModelConfig
    from vllm_from_scratch_tpu.models import transformer
    from vllm_from_scratch_tpu.models import mla as mla_mod
    from vllm_from_scratch_tpu.models.transformer import (
        ModelBatch, _ffn_block, split_moe_stacks, fuse_projections,
    )
    from vllm_from_scratch_tpu.models.layers import mm, rms_norm

    mcfg = ModelConfig(
        vocab_size=32000, hidden_size=1024, num_layers=12,
        num_heads=16, num_kv_heads=16, max_position=2048,
        intermediate_size=2816,
        kv_lora_rank=256, qk_rope_head_dim=32, qk_nope_head_dim=64,
        v_head_dim=64,
        num_experts=16, top_k=2, num_shared_experts=1,
        dtype="bfloat16",
    )
    L = mcfg.num_layers
    nblocks = 16384 // BS
    params = transformer.quantize_params(
        transformer.init_params(jax.random.PRNGKey(0), mcfg), mcfg, 8)
    cache = transformer.init_cache(mcfg, nblocks, BS, "int8")

    # One prefill chunk: rows 0..B-1, history CTX-T tokens, chunk T tokens.
    n_per = -(-CTX // BS)
    N = max(4, 1 << (n_per - 1).bit_length())
    tables = np.zeros((B, N), np.int32)
    tables[:, :n_per] = (np.arange(B * n_per) + 1).reshape(B, n_per)
    pos0 = CTX - T
    pos = pos0 + np.arange(T)
    slots = tables[:, pos // BS] * BS + pos % BS              # [B, T]
    # Random (per-process) token values: the axon tunnel memoizes repeated
    # executions of an identical (program, inputs) pair ACROSS processes, so
    # a re-run probing constant inputs can read back a cached result in ~30 us
    # and report absurd MFU (observed r5).  Fresh values defeat the memo;
    # same shapes still hit the compile cache.
    tok_rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    batch = ModelBatch(
        tokens=jnp.asarray(tok_rng.randint(1, 31999, (B, T)), jnp.int32),
        positions=jnp.tile(jnp.asarray(pos, jnp.int32), (B, 1)),
        slots=jnp.asarray(slots, jnp.int32),
        block_tables=jnp.asarray(tables),
        ctx_lens=jnp.full((B,), CTX, jnp.int32),
        q_lens=jnp.full((B,), T, jnp.int32),
    )
    flops_tok = 2 * 379e6  # active matmul params (bench_midsize accounting)

    # Tunnel RTT: dispatch -> scalar-fetch round trip with ~no compute.  The
    # axon link runs 1-30 ms depending on the night; every section timing
    # below subtracts it (measured r5: naive repeat-dispatch timings on this
    # tunnel can also return CACHED results for identical (program, inputs)
    # pairs — sections therefore thread a loop-carried perturbation so no
    # iteration is elidable, and are timed by ONE scalar fetch).
    _rtt_f = jax.jit(lambda x: x.sum())
    _rtt_x = jnp.ones((128,), jnp.float32)
    float(_rtt_f(_rtt_x))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(_rtt_f(_rtt_x))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    def timed(name, fn, *args, flops=None):
        """``flops`` is per ONE inner iteration (dt is per-iteration too).
        ``fn`` must return a data-dependent SCALAR."""
        f = jax.jit(fn)
        t0 = time.perf_counter()
        float(f(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(*args))
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / INNER
        note = ""
        if flops is not None:
            note = f"  {flops / dt / 1e12:6.1f} TFLOP/s = " \
                   f"{flops / dt / MXU_BF16_FLOPS * 100:4.1f}% MFU"
        print(f"{name:8s} {dt*1e3:7.2f} ms{note}   (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    # ---- full forward ----
    def full(params, cache, batch):
        def body(i, carry):
            acc, cache = carry
            b = batch._replace(
                tokens=batch.tokens + (acc.astype(jnp.int32) & 1))
            logits, cache = transformer.forward(
                params, cache, b, mcfg, block_size=BS)
            return logits.astype(jnp.float32).sum(), cache
        acc, cache = jax.lax.fori_loop(
            0, INNER, body, (jnp.zeros(()), cache))
        return acc + cache.c.astype(jnp.float32).sum() * 1e-20

    if os.environ.get("TRACE") == "1":
        f = jax.jit(full)
        jax.block_until_ready(f(params, cache, batch))
        os.makedirs("benchmarks/traces", exist_ok=True)
        with jax.profiler.trace("benchmarks/traces/prefill"):
            jax.block_until_ready(f(params, cache, batch))
        print("trace -> benchmarks/traces/prefill", flush=True)
        return

    t_full = (timed("full", full, params, cache, batch,
                    flops=B * T * flops_tok)
              if "full" in SECTIONS else 0.0)

    layers_xs, moe_stacks = split_moe_stacks(
        fuse_projections(params["layers"], mcfg), mcfg)

    # ---- attention-only layer scan ----
    def attn_only(params, cache, batch):
        h0 = params["embed"][batch.tokens]

        def layer_step(h, xs):
            layer, cache_l, li = xs
            a, cache_l = mla_mod.mla_attention_block(
                layer, cache_l, h, batch, mcfg, params["rope"], block_size=BS)
            return h + a, cache_l

        def body(i, carry):
            acc, cache = carry
            hk = h0 * (1 + acc * 1e-20)   # loop-carried: nothing elidable
            h, cache = jax.lax.scan(
                layer_step, hk, (layers_xs, cache, jnp.arange(L, dtype=jnp.int32)))
            return h.astype(jnp.float32).sum(), cache
        acc, cache = jax.lax.fori_loop(0, INNER, body, (jnp.zeros(()), cache))
        return acc + cache.c.astype(jnp.float32).sum() * 1e-20

    # attention FLOPs: projections (q_a,q_b,kv_a,wo ~ 60M params/layer... use
    # param count) + score/value (2 * B*T*ctx_mean * H * (r+dr) * 2) + q@W_UK
    # and latent@W_UV (B*T*H*(dn*r + r*dv)*2).
    dn, dr, dv, r, qr = mla_mod.mla_dims(mcfg)
    H = mcfg.num_heads
    proj = (1024 * qr + qr * H * (dn + dr) + 1024 * (r + dr) + H * dv * 1024)
    absorb = H * (dn * r + r * dv)
    ctx_mean = CTX - T / 2
    score = 2 * H * ctx_mean * (r + dr)
    attn_flops = 2 * B * T * (proj + absorb) + B * T * score * 2
    t_attn = (timed("attn", attn_only, params, cache, batch,
                    flops=attn_flops * L)
              if "attn" in SECTIONS else 0.0)

    # ---- ffn-only layer scan ----
    def ffn_only(params, cache, batch):
        h0 = params["embed"][batch.tokens]

        def layer_step(h, xs):
            layer, cache_l, li = xs
            h, _ = _ffn_block(layer, h, mcfg, mesh=None, ep_dispatch="psum",
                              moe_stacks=moe_stacks, li=li,
                              collect_counts=False)
            return h, cache_l

        def body(i, carry):
            acc, cache = carry
            hk = h0 * (1 + acc * 1e-20)
            h, cache = jax.lax.scan(
                layer_step, hk, (layers_xs, cache, jnp.arange(L, dtype=jnp.int32)))
            return h.astype(jnp.float32).sum(), cache
        acc, _ = jax.lax.fori_loop(0, INNER, body, (jnp.zeros(()), cache))
        return acc

    ffn_flops = 2 * B * T * L * (
        1024 * 16  # router gate
        + (mcfg.top_k + 1) * 3 * 1024 * 2816)  # routed top2 + shared
    t_ffn = (timed("ffn", ffn_only, params, cache, batch,
                   flops=ffn_flops)
             if "ffn" in SECTIONS else 0.0)

    # ---- final norm + last-pos gather + lm_head ----
    def head_only(params, batch):
        h0 = params["embed"][batch.tokens]

        def body(i, acc):
            x = rms_norm(h0 * (1 + acc * 1e-20), params["final_norm"],
                         mcfg.rms_norm_eps)
            last = jnp.maximum(batch.q_lens - 1, 0)
            x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
            return mm(x_last, params["lm_head"]).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, INNER, body, jnp.zeros(()))

    t_head = (timed("head", head_only, params, batch,
                    flops=2 * B * 1024 * 32000)
              if "head" in SECTIONS else 0.0)

    print(f"sum(attn+ffn+head) = {(t_attn+t_ffn+t_head)*1e3:.2f} ms "
          f"vs full {t_full*1e3:.2f} ms "
          f"(embed gather double-counted 2x, ~0)", flush=True)


if __name__ == "__main__":
    print(f"B={B} T={T} CTX={CTX} BS={BS}", flush=True)
    main()
