"""Full decode-step probe at exact bench_midsize config (forward + sample
inside a fori_loop), with quant-scope variants.  Explains the gap between
the component sum (~8.3 ms) and the engine's measured step (~12.8 ms).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INNER = 16


def main():
    from vllm_from_scratch_tpu.core.config import ModelConfig
    from vllm_from_scratch_tpu.models import transformer
    from vllm_from_scratch_tpu.models.transformer import ModelBatch
    from vllm_from_scratch_tpu.ops.sampling import SamplingState, sample

    mcfg = ModelConfig(
        vocab_size=32000, hidden_size=1024, num_layers=12,
        num_heads=16, num_kv_heads=16, max_position=2048,
        intermediate_size=2816,
        kv_lora_rank=256, qk_rope_head_dim=32, qk_nope_head_dim=64,
        v_head_dim=64,
        num_experts=16, top_k=2, num_shared_experts=1,
        dtype="bfloat16",
    )
    B = int(os.environ.get("B", "16"))
    bs, ctx = int(os.environ.get("BS", "16")), int(os.environ.get("CTX", "640"))
    nblocks = (B * 1024) // bs

    params0 = transformer.init_params(jax.random.PRNGKey(0), mcfg)

    scope = os.environ.get("SCOPE", "experts")
    if scope != "none":
        params = transformer.quantize_params(params0, mcfg, 8, scope=scope)
    else:
        params = params0
    nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
                 if hasattr(x, "dtype"))
    print(f"scope={scope} bs={bs} params {nbytes/1e6:.0f} MB", flush=True)

    cache = transformer.init_cache(mcfg, nblocks, bs, "int8")

    n_per = -(-ctx // bs)
    N = max(4, 1 << (n_per - 1).bit_length())
    tables = np.zeros((B, N), np.int32)
    tables[:, :n_per] = np.random.RandomState(0).permutation(
        nblocks - 1)[: B * n_per].reshape(B, n_per) + 1
    slots = jnp.asarray(tables[:, (ctx - 1) // bs] * bs + (ctx - 1) % bs,
                        jnp.int32)
    batch0 = ModelBatch(
        tokens=jnp.ones((B, 1), jnp.int32),
        positions=jnp.full((B, 1), ctx - 1, jnp.int32),
        slots=slots[:, None],
        block_tables=jnp.asarray(tables),
        ctx_lens=jnp.full((B,), ctx, jnp.int32),
        q_lens=jnp.ones((B,), jnp.int32),
    )
    sstate = SamplingState(
        temperature=np.zeros((B,), np.float32),
        top_p=np.ones((B,), np.float32),
        top_k=np.zeros((B,), np.int32),
    )
    key = jax.random.PRNGKey(1)

    donate = os.environ.get("DONATE") == "1"
    as_args = os.environ.get("ARGS") == "1"
    exact = os.environ.get("EXACT") == "1"
    slots_k = jnp.asarray(
        np.stack([tables[:, (ctx - 1 + k) // bs] * bs + (ctx - 1 + k) % bs
                  for k in range(INNER)], 1), jnp.int32)  # [B, INNER]
    tables_j = jnp.asarray(tables)
    pos0 = jnp.full((B,), ctx - 1, jnp.int32)

    exact2 = os.environ.get("EXACT2") == "1"  # tables/slots as traced args

    def macro_fn(params, cache, tok, batch_arg, tables_a, slots_a, pos_a):
        def body(carry, k):
            if exact2:
                cache, tok, pos = carry
                b = ModelBatch(
                    tokens=tok[:, None], positions=pos[:, None],
                    slots=slots_a[:, k][:, None], block_tables=tables_a,
                    ctx_lens=pos + 1, q_lens=jnp.ones_like(pos),
                )
            elif exact:
                cache, tok, pos = carry
                b = ModelBatch(
                    tokens=tok[:, None], positions=pos[:, None],
                    slots=slots_k[:, k][:, None], block_tables=tables_j,
                    ctx_lens=pos + 1, q_lens=jnp.ones_like(pos),
                )
            else:
                cache, tok = carry
                b = (batch_arg if as_args else batch0)._replace(
                    tokens=tok[:, None])
            logits, cache = transformer.forward(
                params, cache, b, mcfg, block_size=bs)
            tok2 = sample(logits, sstate, jax.random.fold_in(key, k))
            if exact or exact2:
                return (cache, tok2, pos + 1), tok2
            return (cache, tok2), tok2

        carry0 = (cache, tok, pos_a) if (exact or exact2) else (cache, tok)
        out = jax.lax.scan(body, carry0, jnp.arange(INNER))
        return out[1], out[0][0]

    macro = jax.jit(macro_fn, donate_argnums=(1,) if donate else ())
    print(f"donate={donate} args={as_args}", flush=True)

    tok = jnp.ones((B,), jnp.int32)
    t0 = time.perf_counter()
    toks, cache = macro(params, cache, tok, batch0, tables_j, slots_k, pos0)
    jax.block_until_ready(toks)
    print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        toks, cache = macro(params, cache, tok, batch0, tables_j, slots_k, pos0)
    jax.block_until_ready(toks)
    dt = (time.perf_counter() - t0) / iters / INNER
    print(f"full decode step: {dt*1e3:.2f} ms  -> {B/dt:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
