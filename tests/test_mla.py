"""MLA tests — port of the reference suite 04 contract
(04_mla/test_mini_mla.py, 13 cases): shapes, decode-with-cache consistency,
causal masking via future-perturbation, KV-size saving >5x — plus the
latent-absorption equivalence proof (W_UK/W_UV path == naive kv_b_proj
expansion) that the production trick relies on (BLOG_PART3_V2.md:663-671)."""

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
from vllm_from_scratch_tpu.models import transformer
from vllm_from_scratch_tpu.models.mla import (
    compare_kv_cache_size,
    init_mla_layer_params,
    mla_attention_block,
    mla_dims,
    split_kv_b,
)
from vllm_from_scratch_tpu.models.layers import rms_norm
from vllm_from_scratch_tpu.models.transformer import ModelBatch
from vllm_from_scratch_tpu.ops.mla_attention import (
    init_mla_cache,
    mla_paged_attention,
    write_mla_cache,
)
from vllm_from_scratch_tpu.ops.rotary import apply_rope, make_rope_table

BS = 16


def mla_cfg(**kw):
    d = dict(
        vocab_size=64, hidden_size=64, num_layers=1, num_heads=4, num_kv_heads=4,
        max_position=128, kv_lora_rank=16, qk_rope_head_dim=8, qk_nope_head_dim=16,
        v_head_dim=16,
    )
    d.update(kw)
    return ModelConfig(**d)


def make_batch(T, ctx, q_len, tables, start):
    pos = np.zeros((1, T), np.int32)
    pos[0, :q_len] = np.arange(start, start + q_len)
    slots = np.zeros((1, T), np.int32)
    slots[0, :q_len] = [tables[p // BS] * BS + p % BS for p in range(start, start + q_len)]
    return ModelBatch(
        tokens=np.zeros((1, T), np.int32),
        positions=pos,
        slots=slots,
        block_tables=np.asarray([tables], np.int32),
        ctx_lens=np.asarray([ctx], np.int32),
        q_lens=np.asarray([q_len], np.int32),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = mla_cfg()
    key = jax.random.PRNGKey(0)
    layer = init_mla_layer_params(key, cfg, 1, jnp.float32)
    layer = {k: v[0] for k, v in layer.items()}  # single layer slice
    layer["attn_norm"] = jnp.ones((cfg.hidden_size,))
    rope = make_rope_table(cfg.max_position, cfg.qk_rope_head_dim)
    return cfg, layer, rope


def naive_mla_reference(cfg, layer, rope, h):
    """The reference's computation (mini_mla.py:203-306): materialize k_nope
    and v from the latent via kv_b_proj over the whole sequence, then plain
    causal attention with the decoupled-RoPE concat."""
    T = h.shape[1]
    dn, dr, dv, r, _ = mla_dims(cfg)
    nh = cfg.num_heads
    x = rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    q = rms_norm(x @ layer["q_a"], layer["q_a_norm"], cfg.rms_norm_eps) @ layer["q_b"]
    q = q.reshape(1, T, nh, dn + dr)
    q_nope, q_rope = q[..., :dn], q[..., dn:]
    q_rope = apply_rope(q_rope, pos, rope)

    ckr = x @ layer["kv_a"]
    c = rms_norm(ckr[..., :r], layer["kv_norm"], cfg.rms_norm_eps)   # [1,T,r]
    kr = apply_rope(ckr[..., r:][:, :, None, :], pos, rope)[:, :, 0]  # [1,T,dr]

    kv = (c @ layer["kv_b"]).reshape(1, T, nh, dn + dv)
    k_nope, v = kv[..., :dn], kv[..., dn:]

    qf = jnp.concatenate([q_nope, q_rope], -1)                        # [1,T,nh,dn+dr]
    kf = jnp.concatenate(
        [k_nope, jnp.broadcast_to(kr[:, :, None, :], (1, T, nh, dr))], -1
    )
    scores = jnp.einsum("bthd,bshd->bhts", qf, kf) * (dn + dr) ** -0.5
    mask = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, -1)
    out = jnp.einsum("bhts,bshd->bthd", p, v)
    return (out.reshape(1, T, nh * dv)) @ layer["wo"]


class TestAbsorptionEquivalence:
    def test_latent_path_matches_naive_expansion(self, setup):
        """W_UK/W_UV absorption == materializing k_nope/v (fp32 cache)."""
        cfg, layer, rope = setup
        T = 24
        h = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.hidden_size))
        ref = naive_mla_reference(cfg, layer, rope, h)

        dn, dr, dv, r, _ = mla_dims(cfg)
        cache = init_mla_cache(8, BS, r, dr, kv_quant="none")
        batch = make_batch(T, T, T, [1, 2, 3], 0)
        out, _ = mla_attention_block(layer, cache, h, batch, cfg, rope, block_size=BS)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_int8_latent_close(self, setup):
        cfg, layer, rope = setup
        T = 24
        h = jax.random.normal(jax.random.PRNGKey(2), (1, T, cfg.hidden_size))
        ref = naive_mla_reference(cfg, layer, rope, h)
        dn, dr, dv, r, _ = mla_dims(cfg)
        cache = init_mla_cache(8, BS, r, dr, kv_quant="int8")
        batch = make_batch(T, T, T, [1, 2, 3], 0)
        out, _ = mla_attention_block(layer, cache, h, batch, cfg, rope, block_size=BS)
        denom = np.max(np.abs(np.asarray(ref))) + 1e-9
        assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) / denom < 0.05


class TestExpandedPrefill:
    """Tq >= PREFILL_EXPAND_MIN_TQ prefill takes the MHA-mode expanded path
    (ops/mla_attention.mla_prefill_expanded) — same math as absorption, ~4x
    fewer score/PV FLOPs at DeepSeek shapes (the prefill/decode split the
    reference documents at BLOG_PART3_V2.md:563-578)."""

    def test_expanded_matches_naive_expansion(self, setup):
        cfg, layer, rope = setup
        T = 96  # >= PREFILL_EXPAND_MIN_TQ -> expanded path
        h = jax.random.normal(jax.random.PRNGKey(3), (1, T, cfg.hidden_size))
        ref = naive_mla_reference(cfg, layer, rope, h)
        dn, dr, dv, r, _ = mla_dims(cfg)
        cache = init_mla_cache(12, BS, r, dr, kv_quant="none")
        batch = make_batch(T, T, T, [1, 2, 3, 4, 5, 6], 0)
        out, _ = mla_attention_block(layer, cache, h, batch, cfg, rope,
                                     block_size=BS)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_expanded_matches_absorbed_with_history(self, setup, monkeypatch):
        """Chunked prefill with history: expanded == absorbed on the SAME
        int8 cache state (both read the identical quantized latents)."""
        cfg, layer, rope = setup
        dn, dr, dv, r, _ = mla_dims(cfg)
        hist, T = 24, 64
        h = jax.random.normal(jax.random.PRNGKey(4),
                              (1, hist + T, cfg.hidden_size))
        cache = init_mla_cache(12, BS, r, dr, kv_quant="int8")
        tables = [1, 2, 3, 4, 5, 6]
        # history chunk (absorbed; Tq=24 < threshold)
        b0 = make_batch(hist, hist, hist, tables, 0)
        _, cache = mla_attention_block(layer, cache, h[:, :hist], b0, cfg,
                                       rope, block_size=BS)
        b1 = make_batch(T, hist + T, T, tables, hist)
        out_exp, _ = mla_attention_block(layer, cache, h[:, hist:], b1, cfg,
                                         rope, block_size=BS)
        monkeypatch.setenv("VFS_MLA_EXPAND_MIN_TQ", "100000")  # force absorbed
        out_abs, _ = mla_attention_block(layer, cache, h[:, hist:], b1, cfg,
                                         rope, block_size=BS)
        np.testing.assert_allclose(np.asarray(out_exp), np.asarray(out_abs),
                                   rtol=1e-4, atol=1e-5)


class TestDecodeConsistency:
    def test_prefill_vs_stepwise_decode(self, setup):
        """Full prefill output at position t == decode-one-at-a-time output
        (test_mini_mla.py:71-102 idiom), through the paged latent cache."""
        cfg, layer, rope = setup
        T = 12
        h = jax.random.normal(jax.random.PRNGKey(3), (1, T, cfg.hidden_size))
        dn, dr, dv, r, _ = mla_dims(cfg)

        cache = init_mla_cache(8, BS, r, dr, kv_quant="none")
        full, _ = mla_attention_block(
            layer, cache, h, make_batch(T, T, T, [1, 2], 0), cfg, rope, block_size=BS
        )

        cache2 = init_mla_cache(8, BS, r, dr, kv_quant="none")
        outs = []
        for t in range(T):
            o, cache2 = mla_attention_block(
                layer, cache2, h[:, t : t + 1], make_batch(1, t + 1, 1, [1, 2], t),
                cfg, rope, block_size=BS,
            )
            outs.append(np.asarray(o[0, 0]))
        np.testing.assert_allclose(
            np.stack(outs), np.asarray(full[0]), rtol=1e-4, atol=1e-5
        )

    def test_chunked_prefill_with_history(self, setup):
        cfg, layer, rope = setup
        T, split = 16, 10
        h = jax.random.normal(jax.random.PRNGKey(4), (1, T, cfg.hidden_size))
        dn, dr, dv, r, _ = mla_dims(cfg)
        cache = init_mla_cache(8, BS, r, dr, kv_quant="none")
        full, _ = mla_attention_block(
            layer, cache, h, make_batch(T, T, T, [1, 2], 0), cfg, rope, block_size=BS
        )
        cache2 = init_mla_cache(8, BS, r, dr, kv_quant="none")
        a, cache2 = mla_attention_block(
            layer, cache2, h[:, :split], make_batch(split, split, split, [1, 2], 0),
            cfg, rope, block_size=BS,
        )
        b, cache2 = mla_attention_block(
            layer, cache2, h[:, split:], make_batch(T - split, T, T - split, [1, 2], split),
            cfg, rope, block_size=BS,
        )
        np.testing.assert_allclose(np.asarray(b), np.asarray(full[:, split:]),
                                   rtol=1e-4, atol=1e-5)

    def test_future_perturbation_no_leak(self, setup):
        """Causality (test_mini_mla.py:112-131): changing future inputs leaves
        prefix outputs unchanged."""
        cfg, layer, rope = setup
        T = 10
        h = jax.random.normal(jax.random.PRNGKey(5), (1, T, cfg.hidden_size))
        h2 = h.at[:, 7:].add(3.0)
        dn, dr, dv, r, _ = mla_dims(cfg)
        c1 = init_mla_cache(8, BS, r, dr, "none")
        c2 = init_mla_cache(8, BS, r, dr, "none")
        o1, _ = mla_attention_block(layer, c1, h, make_batch(T, T, T, [1], 0), cfg, rope, block_size=BS)
        o2, _ = mla_attention_block(layer, c2, h2, make_batch(T, T, T, [1], 0), cfg, rope, block_size=BS)
        np.testing.assert_allclose(np.asarray(o1[:, :7]), np.asarray(o2[:, :7]), atol=1e-5)


class TestKVSaving:
    def test_deepseek_v2_spec(self):
        """128 heads x 128 dim vs r=512+dr=64 => 56.9x elements
        (mini_mla.py:313-362; test asserts >5x like test_mini_mla.py:134-146)."""
        r = compare_kv_cache_size(num_heads=128, head_dim=128,
                                  kv_lora_rank=512, rope_dim=64)
        assert r["mha_elems_per_token_layer"] == 32768
        assert r["mla_elems_per_token_layer"] == 576
        assert r["ratio"] > 5
        assert abs(r["ratio"] - 56.9) < 0.1

    def test_int8_latent_doubles_saving(self):
        fp16 = compare_kv_cache_size(128, 128, 512, 64)
        int8 = compare_kv_cache_size(128, 128, 512, 64, latent_elem_bytes=1)
        assert int8["ratio"] > 1.9 * fp16["ratio"]

    def test_cache_memory_layout(self):
        cache = init_mla_cache(4, BS, kv_lora_rank=16, rope_dim=8, kv_quant="int8")
        assert cache.c.shape == (64, 16) and cache.c.dtype == jnp.int8
        assert cache.kr.shape == (64, 8)
        k = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
        kr = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
        c2 = write_mla_cache(cache, k, kr, jnp.asarray([5, 6, 7], jnp.int32))
        deq = np.asarray(c2.c[5:8], np.float32) * np.asarray(c2.c_scale[5:8])[:, None]
        assert np.max(np.abs(deq - np.asarray(k))) < 0.05


class TestMLAEngine:
    def test_generate_mla(self):
        cfg = EngineConfig(
            model=mla_cfg(num_layers=2),
            cache=CacheConfig(block_size=16, num_blocks=32, kv_quant="int8"),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=32),
        )
        from vllm_from_scratch_tpu.core.engine import LLMEngine

        sp = SamplingParams(max_new_tokens=5, temperature=0.0, ignore_eos=True)
        out = LLMEngine(cfg).generate([[1, 2, 3, 4, 5], [9, 8, 7]], sp)
        assert all(len(v) == 5 for v in out.values())

    def test_mla_chunked_prefill_invariance(self):
        base = mla_cfg(num_layers=2)
        sp = SamplingParams(max_new_tokens=5, temperature=0.0, ignore_eos=True)
        from vllm_from_scratch_tpu.core.engine import LLMEngine

        prompt = list(range(2, 40))
        outs = []
        for budget in (8, 256):
            cfg = EngineConfig(
                model=base,
                cache=CacheConfig(block_size=16, num_blocks=32, kv_quant="none"),
                scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=budget),
            )
            outs.append(LLMEngine(cfg).generate([prompt], sp)[0])
        assert outs[0] == outs[1]

    def test_mla_moe_flagship(self):
        """The DeepSeek-style MLA+MoE mini model — the BASELINE.json target."""
        cfg = EngineConfig(
            model=mla_cfg(num_layers=2, intermediate_size=64, num_experts=4,
                          top_k=2, num_shared_experts=1),
            cache=CacheConfig(block_size=16, num_blocks=32, kv_quant="int8"),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=32),
        )
        from vllm_from_scratch_tpu.core.engine import LLMEngine

        sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
        out = LLMEngine(cfg).generate([[1, 2, 3, 4, 5, 6, 7, 8], [3, 1, 4]], sp)
        assert all(len(v) == 6 for v in out.values())
