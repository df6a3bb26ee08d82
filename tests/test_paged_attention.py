"""Paged-attention op tests — port of the reference suite 01 contract
(01_paged_attention/test_paged_attention.py, 9 cases): paged == dense even
with a shuffled block table, decode and prefill paths, GQA grouping — plus
INT8-quantized-KV tolerance versions (the BASELINE.json contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_from_scratch_tpu.ops.attention import (
    KVCache,
    dense_attention,
    init_kv_cache,
    paged_attention,
    write_kv_cache,
)

BS = 16  # block size


def build_cache_and_tables(key, seq_lens, Hkv, D, kv_quant, shuffle=True, num_blocks=64):
    """Write random K/V for each sequence through a (shuffled) block table."""
    cache = init_kv_cache(num_blocks, BS, Hkv, D, kv_quant=kv_quant)
    B = len(seq_lens)
    max_blocks = max(-(-s // BS) for s in seq_lens)
    rng = np.random.RandomState(0)
    # assign physical blocks (never block 0 = null); shuffled order.
    avail = list(range(1, num_blocks))
    if shuffle:
        rng.shuffle(avail)
    tables = np.zeros((B, max_blocks), np.int32)
    ks, vs = [], []
    for b, s in enumerate(seq_lens):
        nb = -(-s // BS)
        blocks = [avail.pop() for _ in range(nb)]
        tables[b, :nb] = blocks
        kkey, vkey, key = jax.random.split(key, 3)
        k = jax.random.normal(kkey, (s, Hkv, D), jnp.float32)
        v = jax.random.normal(vkey, (s, Hkv, D), jnp.float32)
        slots = jnp.asarray(
            [blocks[p // BS] * BS + p % BS for p in range(s)], jnp.int32
        )
        cache = write_kv_cache(cache, k, v, slots)
        ks.append(k)
        vs.append(v)
    return cache, jnp.asarray(tables), ks, vs


@pytest.mark.parametrize("kv_quant,tol", [("none", 1e-5), ("int8", 0.03)])
class TestPagedDecode:
    def test_decode_matches_dense(self, kv_quant, tol):
        """Single-query decode over a shuffled block table == dense attention
        (test_paged_attention.py:67-100 analogue)."""
        key = jax.random.PRNGKey(0)
        Hq = Hkv = 4
        D = 32
        seq_lens = [33, 7, 48]
        cache, tables, ks, vs = build_cache_and_tables(key, seq_lens, Hkv, D, kv_quant)
        q = jax.random.normal(jax.random.PRNGKey(1), (3, 1, Hq, D), jnp.float32)

        out = paged_attention(
            q, cache, tables, jnp.asarray(seq_lens, jnp.int32), block_size=BS
        )
        for b, s in enumerate(seq_lens):
            ref = dense_attention(
                q[b : b + 1], ks[b][None], vs[b][None], causal=False
            )
            err = np.max(np.abs(np.asarray(out[b]) - np.asarray(ref[0])))
            assert err < tol, f"seq {b}: max err {err}"

    def test_gqa_grouping(self, kv_quant, tol):
        """Hq = 2*Hkv: query groups share KV heads (paged_attention.py:81)."""
        key = jax.random.PRNGKey(2)
        Hkv, Hq, D = 2, 4, 16
        cache, tables, ks, vs = build_cache_and_tables(key, [20], Hkv, D, kv_quant)
        q = jax.random.normal(jax.random.PRNGKey(3), (1, 1, Hq, D), jnp.float32)
        out = paged_attention(q, cache, tables, jnp.asarray([20], jnp.int32), block_size=BS)
        ref = dense_attention(q, ks[0][None], vs[0][None], causal=False)
        assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < tol


@pytest.mark.parametrize("kv_quant,tol", [("none", 1e-5), ("int8", 0.05)])
class TestPagedPrefill:
    def test_prefill_causal_matches_dense(self, kv_quant, tol):
        key = jax.random.PRNGKey(4)
        Hq = Hkv = 4
        D = 32
        T = 24
        cache, tables, ks, vs = build_cache_and_tables(key, [T], Hkv, D, kv_quant)
        q = jax.random.normal(jax.random.PRNGKey(5), (1, T, Hq, D), jnp.float32)
        out = paged_attention(q, cache, tables, jnp.asarray([T], jnp.int32), block_size=BS)
        if kv_quant == "none":
            ref = dense_attention(q, ks[0][None], vs[0][None], causal=True)
            assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < tol
        else:
            # quantized: compare against dense over the dequantized cache
            ref = dense_attention(q, ks[0][None], vs[0][None], causal=True)
            assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < tol

    def test_chunked_prefill_history_mask(self, kv_quant, tol):
        """A chunk with history must equal the suffix of full prefill —
        the diagonal = S-T+1 mask (mini_mla.py:290-295 analogue)."""
        key = jax.random.PRNGKey(6)
        Hq = Hkv = 2
        D = 16
        total, chunk = 30, 10
        hist = total - chunk
        cache, tables, ks, vs = build_cache_and_tables(key, [total], Hkv, D, kv_quant)
        qfull = jax.random.normal(jax.random.PRNGKey(7), (1, total, Hq, D), jnp.float32)

        out_full = paged_attention(
            qfull, cache, tables, jnp.asarray([total], jnp.int32), block_size=BS
        )
        out_chunk = paged_attention(
            qfull[:, hist:],
            cache,
            tables,
            jnp.asarray([total], jnp.int32),
            jnp.asarray([chunk], jnp.int32),
            block_size=BS,
        )
        assert np.max(np.abs(np.asarray(out_chunk) - np.asarray(out_full[:, hist:]))) < 1e-5

    def test_future_tokens_do_not_leak(self, kv_quant, tol):
        """Perturb future tokens; prefix outputs unchanged
        (test_mini_mla.py:112-131 idiom)."""
        key = jax.random.PRNGKey(8)
        Hq = Hkv = 2
        D = 16
        T = 20
        cache, tables, ks, vs = build_cache_and_tables(key, [T], Hkv, D, kv_quant)
        q = jax.random.normal(jax.random.PRNGKey(9), (1, T, Hq, D), jnp.float32)
        out1 = paged_attention(q, cache, tables, jnp.asarray([T], jnp.int32), block_size=BS)

        # rewrite the last 5 tokens' KV with noise
        slots = jnp.asarray(
            [int(tables[0, p // BS]) * BS + p % BS for p in range(T - 5, T)], jnp.int32
        )
        noise = 100 * jax.random.normal(jax.random.PRNGKey(10), (5, Hkv, D), jnp.float32)
        cache2 = write_kv_cache(cache, noise, noise, slots)
        out2 = paged_attention(q, cache2, tables, jnp.asarray([T], jnp.int32), block_size=BS)
        np.testing.assert_allclose(
            np.asarray(out1[:, : T - 5]), np.asarray(out2[:, : T - 5]), atol=1e-6
        )


class TestWriteKV:
    def test_slot_roundtrip_int8(self):
        cache = init_kv_cache(8, BS, 2, 16, kv_quant="int8")
        k = jax.random.normal(jax.random.PRNGKey(0), (10, 2, 16), jnp.float32)
        slots = jnp.arange(32, 42, dtype=jnp.int32)  # block 2 + part of 3
        cache = write_kv_cache(cache, k, k, slots)
        deq = np.asarray(cache.k[32:42], np.float32) * np.asarray(cache.k_scale[32:42])[..., None]
        rel = np.max(np.abs(deq - np.asarray(k))) / np.max(np.abs(np.asarray(k)))
        assert rel < 0.02

    def test_pad_tokens_land_in_null_block(self):
        """Pads scatter into block 0 and never corrupt real slots."""
        cache = init_kv_cache(8, BS, 2, 16, kv_quant="none")
        real = jnp.ones((4, 2, 16), jnp.float32)
        cache = write_kv_cache(cache, real, real, jnp.arange(16, 20, dtype=jnp.int32))
        pads = 99 * jnp.ones((4, 2, 16), jnp.float32)
        cache = write_kv_cache(cache, pads, pads, jnp.zeros(4, jnp.int32))
        np.testing.assert_array_equal(np.asarray(cache.k[16:20]), np.asarray(real))
        assert float(cache.k[0, 0, 0]) == 99.0

    def test_unquantized_cache_passthrough(self):
        cache = init_kv_cache(4, BS, 1, 8, kv_quant="none")
        assert not cache.quantized
        k = jnp.full((2, 1, 8), 3.14, jnp.float32)
        cache = write_kv_cache(cache, k, k, jnp.asarray([17, 18], jnp.int32))
        np.testing.assert_allclose(np.asarray(cache.k[17]), 3.14, atol=1e-6)


class TestPaddedBatch:
    def test_padded_rows_are_inert(self):
        """Rows with ctx_len=0 produce finite garbage and real rows are exact."""
        key = jax.random.PRNGKey(11)
        cache, tables, ks, vs = build_cache_and_tables(key, [12], 2, 16, "none")
        q = jax.random.normal(jax.random.PRNGKey(12), (2, 1, 2, 16), jnp.float32)
        tables2 = jnp.concatenate([tables, jnp.zeros_like(tables)], axis=0)
        out = paged_attention(
            q, cache, tables2, jnp.asarray([12, 0], jnp.int32), block_size=BS
        )
        ref = dense_attention(q[:1], ks[0][None], vs[0][None], causal=False)
        assert np.max(np.abs(np.asarray(out[0]) - np.asarray(ref[0]))) < 1e-5
        assert np.all(np.isfinite(np.asarray(out[1])))

    def test_jit_compiles_once_per_shape(self):
        calls = {"n": 0}

        def f(q, cache, tables, ctx):
            calls["n"] += 1
            return paged_attention(q, cache, tables, ctx, block_size=BS)

        jf = jax.jit(f, static_argnames=())
        cache = init_kv_cache(8, BS, 2, 16)
        q = jnp.zeros((2, 1, 2, 16))
        t = jnp.zeros((2, 2), jnp.int32)
        jf(q, cache, t, jnp.asarray([1, 1], jnp.int32))
        jf(q, cache, t, jnp.asarray([5, 2], jnp.int32))  # new lengths, same shapes
        assert calls["n"] == 1
