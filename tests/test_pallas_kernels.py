"""Pallas kernel equivalence tests (interpret mode on CPU).

The XLA paths (ops.attention.paged_attention, ops.mla_attention.
mla_paged_attention) are themselves verified against dense oracles in
test_paged_attention.py / test_mla.py; here we assert the Pallas kernels
reproduce the XLA paths bit-tightly, for decode (Tq=1) and history-aware
chunked prefill, quantized INT8 and float caches, over shuffled block
tables — the reference's equivalence idiom (test_paged_attention.py:67-100)
applied one level down.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_from_scratch_tpu.ops import attention as att
from vllm_from_scratch_tpu.ops import mla_attention as mla
from vllm_from_scratch_tpu.ops.pallas import (
    mla_paged_attention_pallas,
    paged_attention_pallas,
)
from tests.test_paged_attention import build_cache_and_tables

BS = 16


def assert_close_scaled(out, ref):
    """Kernel == oracle within 1% of the output scale: real-Mosaic f32
    matmuls run as bf16 passes, so low-order bits differ from the XLA path;
    tiling/indexing bugs error at O(100%) and are still caught."""
    out, ref = np.asarray(out), np.asarray(ref)
    tol = max(2e-5, 1e-2 * float(np.max(np.abs(ref))))
    np.testing.assert_allclose(out, ref, atol=tol)


def xla_paged_attention(q, cache, tables, ctx, q_lens, sm_scale):
    """The pure-XLA path, with the Pallas dispatch forced off."""
    os.environ["VFS_PALLAS"] = "0"
    try:
        return att.paged_attention(
            q, cache, tables, ctx, q_lens, block_size=BS, sm_scale=sm_scale
        )
    finally:
        del os.environ["VFS_PALLAS"]


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
@pytest.mark.parametrize("gqa", [1, 2])
class TestPagedAttentionKernel:
    def _run(self, kv_quant, gqa, Tq, q_lens, seq_lens):
        Hkv, D = 4, 32
        Hq = Hkv * gqa
        key = jax.random.PRNGKey(0)
        cache, tables, _, _ = build_cache_and_tables(key, seq_lens, Hkv, D, kv_quant)
        B = len(seq_lens)
        q = jax.random.normal(jax.random.PRNGKey(1), (B, Tq, Hq, D), jnp.float32)
        ctx = jnp.asarray(seq_lens, jnp.int32)
        ql = jnp.asarray(q_lens, jnp.int32)
        sm = D ** -0.5

        ref = xla_paged_attention(q, cache, tables, ctx, ql, sm)
        out = paged_attention_pallas(
            q, cache.k, cache.v, cache.k_scale, cache.v_scale,
            tables, ctx, ql, block_size=BS, sm_scale=sm, interpret=None,
        )
        # Compare only real query rows (pad rows are unconstrained).
        for b in range(B):
            n = int(q_lens[b])
            assert_close_scaled(np.asarray(out)[b, :n], np.asarray(ref)[b, :n])

    def test_decode(self, kv_quant, gqa):
        self._run(kv_quant, gqa, Tq=1, q_lens=[1, 1, 1], seq_lens=[33, 7, 48])

    def test_chunked_prefill(self, kv_quant, gqa):
        """Last-8-token chunk with history (q_len < ctx_len), ragged q_lens."""
        self._run(kv_quant, gqa, Tq=8, q_lens=[8, 3, 5], seq_lens=[33, 17, 48])

    def test_full_prefill(self, kv_quant, gqa):
        self._run(kv_quant, gqa, Tq=16, q_lens=[16, 16, 16], seq_lens=[16, 16, 16])


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
class TestMLAKernel:
    def _run(self, kv_quant, Tq, q_lens, seq_lens):
        H, dn, dr, r, dv = 4, 32, 16, 32, 32
        key = jax.random.PRNGKey(0)
        B = len(seq_lens)
        num_blocks = 64
        cache = mla.init_mla_cache(num_blocks, BS, r, dr, kv_quant=kv_quant)

        rng = np.random.RandomState(0)
        avail = list(range(1, num_blocks))
        rng.shuffle(avail)
        max_blocks = max(-(-s // BS) for s in seq_lens)
        tables = np.zeros((B, max_blocks), np.int32)
        for b, s in enumerate(seq_lens):
            nb = -(-s // BS)
            blocks = [avail.pop() for _ in range(nb)]
            tables[b, :nb] = blocks
            ck, kk, key = jax.random.split(key, 3)
            c = jax.random.normal(ck, (s, r), jnp.float32)
            kr = jax.random.normal(kk, (s, dr), jnp.float32)
            slots = jnp.asarray(
                [blocks[p // BS] * BS + p % BS for p in range(s)], jnp.int32
            )
            cache = mla.write_mla_cache(cache, c, kr, slots)

        qn = jax.random.normal(jax.random.PRNGKey(1), (B, Tq, H, dn), jnp.float32)
        qr = jax.random.normal(jax.random.PRNGKey(2), (B, Tq, H, dr), jnp.float32)
        w_uk = jax.random.normal(jax.random.PRNGKey(3), (H, dn, r), jnp.float32) * 0.1
        w_uv = jax.random.normal(jax.random.PRNGKey(4), (H, r, dv), jnp.float32) * 0.1
        ctx = jnp.asarray(seq_lens, jnp.int32)
        ql = jnp.asarray(q_lens, jnp.int32)
        sm = (dn + dr) ** -0.5
        tables = jnp.asarray(tables)

        os.environ["VFS_PALLAS"] = "0"
        try:
            ref = mla.mla_paged_attention(
                qn, qr, cache, tables, ctx, ql, w_uk, w_uv,
                block_size=BS, sm_scale=sm,
            )
        finally:
            del os.environ["VFS_PALLAS"]

        q_l = jnp.einsum("bthd,hdr->bthr", qn, w_uk)
        latent = mla_paged_attention_pallas(
            q_l, qr, cache.c, cache.kr, cache.c_scale, cache.kr_scale,
            tables, ctx, ql, block_size=BS, sm_scale=sm, interpret=None,
        )
        out = jnp.einsum("bthr,hrv->bthv", latent, w_uv)
        for b in range(B):
            n = int(q_lens[b])
            assert_close_scaled(np.asarray(out)[b, :n], np.asarray(ref)[b, :n])

    def test_decode(self, kv_quant):
        self._run(kv_quant, Tq=1, q_lens=[1, 1, 1], seq_lens=[33, 7, 48])

    def test_chunked_prefill(self, kv_quant):
        self._run(kv_quant, Tq=8, q_lens=[8, 3, 5], seq_lens=[33, 17, 48])


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
def test_kv_write_kernel_matches_xla(kv_quant):
    """Fused quantize+scatter write == the XLA write path; untouched rows
    keep their bytes (in-place aliasing)."""
    from vllm_from_scratch_tpu.ops.attention import init_kv_cache, write_kv_cache
    from vllm_from_scratch_tpu.ops.pallas.kv_write import write_kv_cache_pallas

    cache = init_kv_cache(8, BS, 4, 32, kv_quant=kv_quant)
    k = jax.random.normal(jax.random.PRNGKey(0), (10, 4, 32))
    v = jax.random.normal(jax.random.PRNGKey(1), (10, 4, 32))
    slots = jnp.asarray([17, 30, 31, 45, 46, 47, 48, 90, 91, 100], jnp.int32)
    ref = write_kv_cache(cache, k, v, slots)
    kq, vq, ks, vs = write_kv_cache_pallas(
        cache.k, cache.v, cache.k_scale, cache.v_scale, k, v, slots,
        interpret=None,
    )
    np.testing.assert_array_equal(np.asarray(ref.k), np.asarray(kq))
    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(vq))
    np.testing.assert_allclose(np.asarray(ref.k_scale), np.asarray(ks), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.v_scale), np.asarray(vs), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(kq[0]), np.asarray(cache.k[0]))


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
def test_tiled_prefill_matches_xla(kv_quant):
    """Query-row tiling (R > tile_r) with causal chunk skipping == XLA path."""
    Hkv, G, D = 2, 2, 32
    Hq = Hkv * G
    seq_lens = [96, 64, 33]
    key = jax.random.PRNGKey(0)
    cache, tables, _, _ = build_cache_and_tables(
        key, seq_lens, Hkv, D, kv_quant, num_blocks=64)
    B = len(seq_lens)
    Tq = 96
    q_lens = [96, 48, 20]
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Tq, Hq, D), jnp.float32)
    ctx = jnp.asarray(seq_lens, jnp.int32)
    ql = jnp.asarray(q_lens, jnp.int32)
    sm = D ** -0.5

    ref = xla_paged_attention(q, cache, tables, ctx, ql, sm)
    out = paged_attention_pallas(
        q, cache.k, cache.v, cache.k_scale, cache.v_scale,
        tables, ctx, ql, block_size=BS, sm_scale=sm,
        tile_r=64,  # R = 96*2 = 192 -> 3 tiles
        interpret=None,
    )
    for b in range(B):
        n = int(q_lens[b])
        assert_close_scaled(np.asarray(out)[b, :n], np.asarray(ref)[b, :n])


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
def test_mla_tiled_prefill_matches_xla(kv_quant):
    """MLA query-row tiling (R > tile_r) == XLA path."""
    H, dn, dr, r, dv = 4, 32, 16, 32, 32
    key = jax.random.PRNGKey(0)
    seq_lens = [96, 64]
    B = len(seq_lens)
    num_blocks = 64
    cache = mla.init_mla_cache(num_blocks, BS, r, dr, kv_quant=kv_quant)
    rng = np.random.RandomState(0)
    avail = list(range(1, num_blocks))
    rng.shuffle(avail)
    max_blocks = max(-(-s // BS) for s in seq_lens)
    tables = np.zeros((B, max_blocks), np.int32)
    for b, s_len in enumerate(seq_lens):
        nb = -(-s_len // BS)
        blocks = [avail.pop() for _ in range(nb)]
        tables[b, :nb] = blocks
        ck, kk, key = jax.random.split(key, 3)
        cache = mla.write_mla_cache(
            cache,
            jax.random.normal(ck, (s_len, r), jnp.float32),
            jax.random.normal(kk, (s_len, dr), jnp.float32),
            jnp.asarray([blocks[p // BS] * BS + p % BS for p in range(s_len)],
                        jnp.int32),
        )
    Tq, q_lens = 96, [96, 40]
    qn = jax.random.normal(jax.random.PRNGKey(1), (B, Tq, H, dn), jnp.float32)
    qr = jax.random.normal(jax.random.PRNGKey(2), (B, Tq, H, dr), jnp.float32)
    w_uk = jax.random.normal(jax.random.PRNGKey(3), (H, dn, r)) * 0.1
    w_uv = jax.random.normal(jax.random.PRNGKey(4), (H, r, dv)) * 0.1
    ctx = jnp.asarray(seq_lens, jnp.int32)
    ql = jnp.asarray(q_lens, jnp.int32)
    sm = (dn + dr) ** -0.5
    tables = jnp.asarray(tables)

    os.environ["VFS_PALLAS"] = "0"
    try:
        ref = mla.mla_paged_attention(qn, qr, cache, tables, ctx, ql,
                                      w_uk, w_uv, block_size=BS, sm_scale=sm)
    finally:
        del os.environ["VFS_PALLAS"]

    q_l = jnp.einsum("bthd,hdr->bthr", qn, w_uk)
    latent = mla_paged_attention_pallas(
        q_l, qr, cache.c, cache.kr, cache.c_scale, cache.kr_scale,
        tables, ctx, ql, block_size=BS, sm_scale=sm, tile_r=128,  # R=384 -> 3 tiles
        interpret=None,
    )
    out = jnp.einsum("bthr,hrv->bthv", latent, w_uv)
    for b in range(B):
        n = int(q_lens[b])
        assert_close_scaled(np.asarray(out)[b, :n], np.asarray(ref)[b, :n])
