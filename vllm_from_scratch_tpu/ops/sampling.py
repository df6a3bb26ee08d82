"""Vectorized sampling: temperature / top-k / top-p / greedy, all inside jit.

The reference samples per-request in a Python loop with torch.multinomial
(ref: 05_mini_vllm/mini_vllm.py:592-634).  On TPU the whole batch samples in
one fused pass: nucleus filtering via a sorted-cumsum mask (same math as the
reference's top-p) and Gumbel-max instead of multinomial — argmax(logits + G)
draws exactly one sample from softmax(logits) without building a CDF.
Greedy requests (temperature == 0) select via jnp.where, so mixed batches
need no host branching.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingState(NamedTuple):
    """Per-request sampling params, padded to the batch bucket."""

    temperature: jax.Array  # [B] f32; 0 => greedy
    top_p: jax.Array        # [B] f32; 1 => disabled
    top_k: jax.Array        # [B] i32; 0 => disabled


def make_sampling_state(requests, pad_to: int) -> "SamplingState":
    """Build padded arrays from Request objects (pads are greedy)."""
    import numpy as np

    B = pad_to
    temp = np.zeros((B,), np.float32)
    top_p = np.ones((B,), np.float32)
    top_k = np.zeros((B,), np.int32)
    for i, r in enumerate(requests):
        temp[i] = r.sampling.temperature
        top_p[i] = r.sampling.top_p
        top_k[i] = r.sampling.top_k
    return SamplingState(jnp.asarray(temp), jnp.asarray(top_p), jnp.asarray(top_k))


def top_p_top_k_mask(logits: jax.Array, top_p: jax.Array, top_k: jax.Array) -> jax.Array:
    """Mask (True = keep) implementing nucleus + top-k filtering per row.

    Nucleus rule matches the reference (mini_vllm.py:619-630): sort descending,
    keep tokens while the cumulative probability *before* them is < top_p
    (the first token crossing the threshold is kept).
    """
    B, V = logits.shape
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cum_before = cum - probs
    keep_p = cum_before < top_p[:, None]                      # [B, V] in sorted order
    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]
    keep_k = jnp.where(top_k[:, None] > 0, ranks < top_k[:, None], True)
    keep_sorted = keep_p & keep_k
    keep_sorted = keep_sorted.at[:, 0].set(True)              # always keep the argmax
    # Map the rank-space mask back to vocab space via the threshold logit:
    # a token is kept iff its logit >= the smallest kept sorted logit.
    num_keep = jnp.sum(keep_sorted, axis=-1)                  # [B]
    thresh = jnp.take_along_axis(sorted_logits, (num_keep - 1)[:, None], axis=-1)
    return logits >= thresh


def sampling_mode(sampling_params) -> str:
    """Static fast-path classification for a batch (host-side).

    "greedy": every request is temperature 0 -> pure argmax, no sort, no
    gumbel (the [B, V] sort otherwise costs ~2 ms/step at V=32k on v5e —
    it cannot be elided when the state is a runtime array).
    "free": no request needs top-p/top-k filtering -> gumbel without sort.
    "full": the general path."""
    if all(sp.temperature <= 0.0 for sp in sampling_params):
        return "greedy"
    if all(sp.top_p >= 1.0 and sp.top_k == 0 for sp in sampling_params):
        return "free"
    return "full"


def sample(
    logits: jax.Array,      # [B, V]
    state: SamplingState,
    key: jax.Array,
    mode: str = "full",
) -> jax.Array:
    """Draw one token per row.  Returns [B] int32.

    ``mode`` is a STATIC fast-path hint (see sampling_mode); "full" is
    always correct."""
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if mode == "greedy":
        return greedy

    is_greedy = state.temperature <= 0.0
    temp = jnp.where(is_greedy, 1.0, state.temperature)
    scaled = logits / temp[:, None]
    if mode == "free":
        filtered = scaled
    else:
        keep = top_p_top_k_mask(scaled, state.top_p, state.top_k)
        filtered = jnp.where(keep, scaled, -jnp.inf)

    gumbel = jax.random.gumbel(key, (B, V), dtype=jnp.float32)
    sampled = jnp.argmax(filtered + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(is_greedy, greedy, sampled)


def filtered_probs(logits: jax.Array, state: SamplingState) -> jax.Array:
    """The post-filter categorical distribution each request samples from.

    logits [B, V] or [B, T, V] (state broadcasts over T).  Greedy rows
    (temperature 0) become one-hot at the argmax, which makes rejection
    sampling degenerate to exact greedy verification.
    """
    squeeze = logits.ndim == 2
    if squeeze:
        logits = logits[:, None, :]
    B, T, V = logits.shape
    is_greedy = state.temperature <= 0.0
    temp = jnp.where(is_greedy, 1.0, state.temperature)
    scaled = (logits / temp[:, None, None]).reshape(B * T, V)
    keep = top_p_top_k_mask(
        scaled,
        jnp.repeat(state.top_p, T),
        jnp.repeat(state.top_k, T),
    )
    probs = jax.nn.softmax(jnp.where(keep, scaled, -jnp.inf), axis=-1)
    onehot = jax.nn.one_hot(jnp.argmax(logits.reshape(B * T, V), -1), V, dtype=jnp.float32)
    probs = jnp.where(jnp.repeat(is_greedy, T)[:, None], onehot, probs).reshape(B, T, V)
    return probs[:, 0] if squeeze else probs


def sample_with_probs(
    logits: jax.Array, state: SamplingState, key: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Sample and also return the post-filter categorical distribution
    (needed by speculative decoding's rejection sampler)."""
    return sample(logits, state, key), filtered_probs(logits, state)
