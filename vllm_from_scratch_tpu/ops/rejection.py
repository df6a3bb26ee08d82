"""Distribution-exact rejection sampling for speculative decoding.

Equivalent of the reference's blog-only rejection samplers: the
distribution-exact variant with residual max(0, p-q) resampling + bonus
token (ref: BLOG_PART2_V2.md:983-1023) and the batched Triton-port
(BLOG_PART2.md:1288-1329), as ONE vectorized jitted function — no per-request
loop, no per-position Python.

Guarantee (Leviathan et al.): for each position, emitted tokens are
distributed exactly as the target distribution p, regardless of the draft
distribution q.  Greedy targets degenerate to "accept while the draft
matches argmax(p), then emit argmax(p)" via one-hot p.

Shapes: drafts [B, K] with draft probs q [B, K, V]; target probs p
[B, K+1, V] (one per draft position plus the bonus position).  Returns
(tokens [B, K+1], num_accepted [B]): row b's valid output is
tokens[b, :num_accepted[b]+1] — num_accepted drafts followed by one
corrected/bonus token.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rejection_sample(
    draft_tokens: jax.Array,  # [B, K] int32
    draft_probs: jax.Array,   # [B, K, V] f32 (the distribution drafts were sampled from)
    target_probs: jax.Array,  # [B, K+1, V] f32
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    B, K = draft_tokens.shape
    V = draft_probs.shape[-1]
    k_u, k_res, k_bonus = jax.random.split(key, 3)

    # Accept tests: u_i < p(d_i) / q(d_i), all positions at once.
    p_d = jnp.take_along_axis(
        target_probs[:, :K], draft_tokens[..., None], axis=-1
    )[..., 0]                                                   # [B, K]
    q_d = jnp.take_along_axis(
        draft_probs, draft_tokens[..., None], axis=-1
    )[..., 0]                                                   # [B, K]
    u = jax.random.uniform(k_u, (B, K))
    accept = u * jnp.maximum(q_d, 1e-10) < p_d                  # [B, K]

    # First rejection index; K if everything accepted.
    all_accepted = jnp.all(accept, axis=-1)
    first_reject = jnp.argmin(accept, axis=-1)                  # [B]
    num_accepted = jnp.where(all_accepted, K, first_reject)     # [B]

    # Residual distribution at the first rejected position: max(0, p - q).
    idx = jnp.minimum(num_accepted, K - 1)                      # safe gather index
    p_j = jnp.take_along_axis(target_probs, idx[:, None, None], axis=1)[:, 0]  # [B, V]
    q_j = jnp.take_along_axis(draft_probs, idx[:, None, None], axis=1)[:, 0]
    residual = jnp.maximum(p_j - q_j, 0.0)
    res_sum = jnp.sum(residual, axis=-1, keepdims=True)
    # Degenerate residual (p == q exactly): fall back to p itself.
    residual = jnp.where(res_sum > 1e-9, residual / jnp.maximum(res_sum, 1e-9), p_j)

    gumbel_r = jax.random.gumbel(k_res, (B, V))
    corrected = jnp.argmax(jnp.log(jnp.maximum(residual, 1e-30)) + gumbel_r, -1)

    gumbel_b = jax.random.gumbel(k_bonus, (B, V))
    bonus = jnp.argmax(
        jnp.log(jnp.maximum(target_probs[:, K], 1e-30)) + gumbel_b, -1
    )
    final = jnp.where(all_accepted, bonus, corrected).astype(jnp.int32)  # [B]

    # Emit drafts then the final token at position num_accepted.
    out = jnp.where(
        jnp.arange(K + 1)[None, :] < num_accepted[:, None],
        jnp.pad(draft_tokens, ((0, 0), (0, 1))),
        0,
    )
    out = out.at[jnp.arange(B), num_accepted].set(final)
    return out.astype(jnp.int32), num_accepted.astype(jnp.int32)


def propose_ngram(tokens, n: int, k: int):
    """Prompt-lookup drafting (vLLM's ngram speculator): find the most
    recent earlier occurrence of the last ``n`` tokens and propose the ``k``
    tokens that followed it.  Returns a list of k ints, or None if the
    suffix never occurred before (or history is too short).

    Host-side — runs on the request's token ids while the device is busy;
    the proposals become a one-hot draft distribution for the exact
    rejection sampler (q = delta => accept prob = p_target(d)).  The match
    scan is vectorized over numpy windows (n is 2-3), so the per-step host
    cost stays O(len) at C speed even for long prompts."""
    import numpy as np

    t = np.asarray(list(tokens), dtype=np.int64)
    L = int(t.shape[0])
    if L <= n:
        return None
    suffix = t[L - n:]
    W = L - n                       # candidate starts (i == W is the suffix)
    match = np.ones(W, dtype=bool)
    for j in range(n):
        match &= t[j:j + W] == suffix[j]
    idx = np.nonzero(match)[0]
    if idx.size == 0:
        return None
    i = int(idx[-1])                # most recent earlier occurrence
    cont = [int(c) for c in t[i + n : i + n + k]]
    while len(cont) < k:            # pad short continuations by repeating
        cont.append(cont[-1])
    return cont
