"""EPLB — expert-parallel load balancing.

The reference notes EPLB as the production answer to skewed expert load
under EP (BLOG_PART3_V2.md:185-187) without implementing it.  Under EP,
each rank owns a contiguous slice of experts; hot experts clustering on one
rank serializes the all_to_all/grouped-GEMM step.  EPLB measures per-expert
token counts and re-assigns experts to ranks so the hottest rank's load is
minimized, then physically permutes the expert weight stacks so each rank
still owns a contiguous [E/n] slice.

Pieces:
- ``count_expert_load``   — token counts per expert from router ids.
- ``balance``             — greedy LPT (longest-processing-time) packing of
  experts onto ranks; returns a permutation ``perm`` where ``perm[i]`` is
  the expert placed at physical slot i (slots [r*E/n, (r+1)*E/n) live on
  rank r).
- ``apply_permutation``   — permutes the [E, ...] expert weight stacks and
  returns the logical->physical ``expert_map`` (int32 [E]) the router output
  must be passed through.

Exactness: routing through ``expert_map`` with permuted weights is the
identity transformation on the layer's output (tested).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def count_expert_load(topk_ids, num_experts: int) -> np.ndarray:
    """Token-assignment counts per expert.  topk_ids: [T, K] int."""
    return np.bincount(np.asarray(topk_ids).reshape(-1), minlength=num_experts)


def balance(loads: np.ndarray, num_ranks: int) -> np.ndarray:
    """Greedy LPT packing: heaviest experts first onto the lightest rank.

    Returns perm [E] int32: physical slot i holds logical expert perm[i].
    Each rank gets exactly E/num_ranks experts (capacity-constrained LPT).
    """
    E = len(loads)
    per_rank = E // num_ranks
    assert per_rank * num_ranks == E
    order = np.argsort(-np.asarray(loads, np.float64), kind="stable")
    rank_load = np.zeros(num_ranks)
    rank_members: list = [[] for _ in range(num_ranks)]
    for e in order:
        # lightest rank that still has a free slot
        candidates = [r for r in range(num_ranks) if len(rank_members[r]) < per_rank]
        r = min(candidates, key=lambda r: (rank_load[r], r))
        rank_members[r].append(int(e))
        rank_load[r] += loads[e]
    perm = np.concatenate([np.asarray(m, np.int32) for m in rank_members])
    return perm


def apply_permutation(moe_params: Dict, perm: np.ndarray) -> Tuple[Dict, jnp.ndarray]:
    """Physically permute expert stacks; return (params, expert_map).

    ``expert_map[logical_id] = physical_slot`` — route() output ids must be
    mapped through it.  Works on float or QuantizedLinear expert stacks with
    any number of leading stack axes before the [E] axis... the expert axis
    is assumed to be the leading axis of each stack ([E, D, F]) or the second
    axis for layer-stacked weights ([L, E, D, F]).
    """
    from ..models.layers import QuantizedLinear

    perm = np.asarray(perm, np.int64)
    E = len(perm)

    def permute(w):
        def pick_axis(x):
            return 0 if x.shape[0] == E else 1

        if isinstance(w, QuantizedLinear):
            return QuantizedLinear(
                jnp.take(w.q, perm, axis=pick_axis(w.q)),
                jnp.take(w.scale, perm, axis=pick_axis(w.scale)),
            )
        return jnp.take(w, perm, axis=pick_axis(w))

    out = dict(moe_params)
    for k in ("w_gate", "w_up", "w_down"):
        out[k] = permute(moe_params[k])

    expert_map = jnp.asarray(np.argsort(perm).astype(np.int32))  # logical -> slot
    return out, expert_map


def permute_layered(moe_params: Dict, idx: np.ndarray) -> Dict:
    """Per-layer physical re-arrangement of layer-stacked expert weights.

    ``idx`` [L, E]: new physical slot (l, i) receives the weights currently
    at physical slot (l, idx[l, i]).  Applies to the [L, E, ...] stacks
    (w_gate/w_up/w_down, float or QuantizedLinear); gate/shared/expert_map
    entries are left untouched (the caller owns the logical->slot map).
    """
    from ..models.layers import QuantizedLinear

    idx = jnp.asarray(idx, jnp.int32)

    def take(w):
        if isinstance(w, QuantizedLinear):
            return QuantizedLinear(take(w.q), take(w.scale))
        expand = idx.reshape(idx.shape + (1,) * (w.ndim - 2))
        return jnp.take_along_axis(w, expand, axis=1)

    out = dict(moe_params)
    for k in ("w_gate", "w_up", "w_down"):
        out[k] = take(moe_params[k])
    return out


def max_rank_load(loads: np.ndarray, perm: np.ndarray, num_ranks: int) -> float:
    E = len(perm)
    per_rank = E // num_ranks
    slot_loads = np.asarray(loads)[perm]
    return float(max(slot_loads[r * per_rank:(r + 1) * per_rank].sum()
                     for r in range(num_ranks)))
