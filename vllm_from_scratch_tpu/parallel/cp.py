"""Sequence / context parallelism: CP prefill (all-gather) and ring attention.

The reference documents both but implements neither (SURVEY.md §2c):
PCP/DCP context parallel for MLA long context — sequence split across
devices, All-Gather of KV (BLOG_PART3_V2.md:709-768) — and ring attention
only as the Ascend kernel name ``npu_ring_mla`` (BLOG_PART3_V2.md:676-681).
TPU-natively both are shard_map programs whose collectives ride ICI:

- ``cp_prefill_attention`` — v2 of the long-context roadmap: queries stay
  sequence-sharded, K/V shards are ``all_gather``ed (cheap for MLA latents:
  (r+dr) bytes/token instead of 2*Hkv*D), each device computes its slice of
  the causal attention with global-position masks.
- ``ring_attention``       — v3: K/V never materialize globally.  Each of
  the N devices holds 1/N of the KV; shards rotate around the ICI ring via
  ``ppermute`` while a flash online-softmax accumulator merges partial
  results.  Peak memory is O(S/N), enabling >HBM sequences.

Both are exact (match dense causal attention to fp tolerance) — verified in
tests/test_parallel.py against the ops.attention.dense_attention oracle on
a virtual 8-device mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = -1e30


def _partial_attention(q, k, v, q_off, kv_off, sm_scale):
    """Masked scores + un-normalized flash stats for one (q-shard, kv-shard).

    q: [B, Sq, Hkv, G, D], k/v: [B, Sk, Hkv, D].  Returns (m, e_sum, acc):
    m [B,Hkv,G,Sq,1] row max, e_sum same shape, acc [B,Sq,Hkv,G,D].
    """
    Sq, Sk = q.shape[1], k.shape[1]
    s = jnp.einsum("btkgd,bskd->bkgts", q, k.astype(jnp.float32)) * sm_scale
    q_pos = q_off + jnp.arange(Sq)[:, None]
    kv_pos = kv_off + jnp.arange(Sk)[None, :]
    mask = (kv_pos <= q_pos)[None, None, None]          # [1,1,1,Sq,Sk]
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30 / 2)
    e = jnp.where(mask, jnp.exp(s - m), 0.0)
    e_sum = jnp.sum(e, axis=-1, keepdims=True)
    acc = jnp.einsum("bkgts,bskd->btkgd", e, v.astype(jnp.float32))
    return m, e_sum, acc


def cp_prefill_attention(
    q: jax.Array,   # [B, S, Hq, D] — S sharded over ``axis``
    k: jax.Array,   # [B, S, Hkv, D]
    v: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    *,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Sequence-parallel causal prefill attention (KV all-gather variant)."""
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    sm = sm_scale if sm_scale is not None else D ** -0.5

    def local(qs, ks, vs):
        n = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        Sq = qs.shape[1]
        kg = jax.lax.all_gather(ks, axis, axis=1, tiled=True)   # [B, S, Hkv, D]
        vg = jax.lax.all_gather(vs, axis, axis=1, tiled=True)
        qf = qs.astype(jnp.float32).reshape(B, Sq, Hkv, G, D)
        m, e_sum, acc = _partial_attention(qf, kg, vg, me * Sq, 0, sm)
        out = acc / jnp.maximum(e_sum, 1e-30).transpose(0, 3, 1, 2, 4)
        return out.reshape(B, Sq, Hq, D)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(q, k, v)


def ring_attention(
    q: jax.Array,   # [B, S, Hq, D] — S sharded over ``axis``
    k: jax.Array,   # [B, S, Hkv, D]
    v: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    *,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Exact causal attention with ring-rotated KV shards (flash merge).

    Communication: N-1 ppermute rounds of the local KV shard over the ICI
    ring, overlapped with each round's partial attention by XLA's async
    collectives.  Memory: O(S/N) per device.
    """
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    sm = sm_scale if sm_scale is not None else D ** -0.5

    def local(qs, ks, vs):
        n = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        Sq = qs.shape[1]
        qf = qs.astype(jnp.float32).reshape(B, Sq, Hkv, G, D)
        q_off = me * Sq

        perm = [(j, (j + 1) % n) for j in range(n)]

        def step(carry, i):
            k_cur, v_cur, m, l, acc = carry
            # After i rotations we hold the shard originally on rank me - i.
            src = (me - i) % n
            mi, ei, acci = _partial_attention(qf, k_cur, v_cur, q_off, src * Sq, sm)
            m_new = jnp.maximum(m, mi)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(mi - m_new)
            l = l * alpha + ei * beta
            acc = (
                acc * alpha.transpose(0, 3, 1, 2, 4)
                + acci * beta.transpose(0, 3, 1, 2, 4)
            )
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return (k_nxt, v_nxt, m_new, l, acc), None

        m0 = jnp.full((B, Hkv, G, Sq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, Hkv, G, Sq, 1), jnp.float32)
        acc0 = jnp.zeros((B, Sq, Hkv, G, D), jnp.float32)
        (k_fin, v_fin, m, l, acc), _ = jax.lax.scan(
            step, (ks, vs, m0, l0, acc0), jnp.arange(n)
        )
        out = acc / jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2, 4)
        return out.reshape(B, Sq, Hq, D)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(q, k, v)


def ulysses_attention(
    q: jax.Array,   # [B, S, Hq, D] — S sharded over ``axis``
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    *,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """DeepSpeed-Ulysses sequence parallelism: all_to_all swaps the sharded
    axis from sequence to heads, each device computes FULL-sequence attention
    for Hq/N heads, and a second all_to_all swaps back.  (Absent from the
    reference — SURVEY.md §2c lists it as the optional CP alternative.)
    Requires Hq % axis_size == 0 and Hkv % axis_size == 0.
    """
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    sm = sm_scale if sm_scale is not None else D ** -0.5

    def local(qs, ks, vs):
        n = jax.lax.axis_size(axis)
        # seq-sharded [B, S/n, H, D] -> head-sharded [B, S, H/n, D]
        def to_heads(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)

        qh, kh, vh = to_heads(qs), to_heads(ks), to_heads(vs)
        Hq_l = qh.shape[2]
        Hkv_l = kh.shape[2]
        qf = qh.astype(jnp.float32).reshape(B, S, Hkv_l, Hq_l // Hkv_l, D)
        m, e_sum, acc = _partial_attention(qf, kh, vh, 0, 0, sm)
        out = (acc / jnp.maximum(e_sum, 1e-30).transpose(0, 3, 1, 2, 4)).reshape(
            B, S, Hq_l, D
        )
        # head-sharded back to seq-sharded
        return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2, tiled=True)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(q, k, v)
