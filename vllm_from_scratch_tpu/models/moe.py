"""Mixture-of-Experts: TopK / DeepSeek GroupedTopK routing + grouped GEMM.

Equivalent of the reference MoE stack (ref: 03_moe/mini_moe.py):
- ``top_k_routing``        <- TopKRouter (mini_moe.py:43-78): softmax -> topk
  -> renormalize; Switch-Transformer aux loss E * sum(usage * mean_prob) with
  usage from the top-1 one-hot.
- ``grouped_top_k_routing``<- GroupedTopKRouter (mini_moe.py:81-175), DeepSeek
  V2/V3: per-group topk_group scores summed into a group score, best
  top_k//topk_group groups selected, their top experts gathered globally,
  renormalized.  Fully vectorized — the reference's double Python loop over
  (group, k) becomes two take_along_axis gathers.
- ``moe_ffn``              <- MoELayer (mini_moe.py:182-288).  The reference
  dispatches with a per-expert Python loop (O(E) kernel launches, the thing
  its own blog flags as needing a grouped GEMM — BLOG_PART3_V2.md:189-221).
  Here tokens are **sorted by expert id and pushed through
  ``jax.lax.ragged_dot``** — XLA's grouped-GEMM primitive, which tiles the
  per-expert segments onto the MXU.  This is the "token-sort + segment GEMM"
  design SURVEY.md §2b calls for, with no capacity factor and no token drops
  (exactness matches the reference contract).

Expert parallelism (shard_map all_to_all over the `expert` mesh axis) builds
on these same functions — see parallel/ep.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import dequantize_linear, mm


class RouterOutput(NamedTuple):
    weights: jax.Array   # [T, K] normalized routing weights
    ids: jax.Array       # [T, K] expert ids
    aux_loss: jax.Array  # scalar load-balance loss (unscaled)


def _aux_loss(probs: jax.Array, top1_ids: jax.Array, num_experts: int) -> jax.Array:
    """Switch-Transformer load-balance loss (mini_moe.py:70-76)."""
    usage = jnp.mean(jax.nn.one_hot(top1_ids, num_experts, dtype=jnp.float32), axis=0)
    mean_prob = jnp.mean(probs.astype(jnp.float32), axis=0)
    return num_experts * jnp.sum(usage * mean_prob)


def top_k_routing(gate_logits: jax.Array, top_k: int) -> RouterOutput:
    """Standard TopK routing.  gate_logits: [T, E]."""
    probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    topk_probs, topk_ids = jax.lax.top_k(probs, top_k)
    weights = topk_probs / (jnp.sum(topk_probs, axis=-1, keepdims=True) + 1e-9)
    return RouterOutput(weights, topk_ids.astype(jnp.int32),
                        _aux_loss(probs, topk_ids[:, 0], gate_logits.shape[-1]))


def grouped_top_k_routing(
    gate_logits: jax.Array, top_k: int, num_groups: int, topk_group: int
) -> RouterOutput:
    """DeepSeek grouped routing.  gate_logits: [T, E], E % num_groups == 0,
    top_k % topk_group == 0."""
    T, E = gate_logits.shape
    assert E % num_groups == 0 and top_k % topk_group == 0
    experts_per_group = E // num_groups
    num_selected_groups = top_k // topk_group

    probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    grouped = probs.reshape(T, num_groups, experts_per_group)

    # Per-group candidate experts and the group's representative score.
    g_vals, g_local = jax.lax.top_k(grouped, topk_group)       # [T, G, kg]
    group_scores = jnp.sum(g_vals, axis=-1)                    # [T, G]
    _, sel_groups = jax.lax.top_k(group_scores, num_selected_groups)  # [T, Gs]

    # Gather the selected groups' local candidate ids -> global expert ids.
    sel_local = jnp.take_along_axis(
        g_local, sel_groups[:, :, None], axis=1
    )                                                          # [T, Gs, kg]
    global_ids = (sel_groups[:, :, None] * experts_per_group + sel_local).reshape(T, top_k)
    cand_probs = jnp.take_along_axis(probs, global_ids, axis=-1)  # [T, K]
    weights = cand_probs / (jnp.sum(cand_probs, axis=-1, keepdims=True) + 1e-9)
    return RouterOutput(weights, global_ids.astype(jnp.int32),
                        _aux_loss(probs, global_ids[:, 0], E))


def route(gate_logits: jax.Array, top_k: int, num_groups: int = 1,
          topk_group: int = 1) -> RouterOutput:
    if num_groups > 1:
        return grouped_top_k_routing(gate_logits, top_k, num_groups, topk_group)
    return top_k_routing(gate_logits, top_k)


# ---------------------------------------------------------------- expert GEMM

def expert_ffn(x_sorted, group_sizes, w_gate, w_up, w_down, layer_idx=None):
    """Dispatch the per-expert SwiGLU GEMMs.

    INT8 expert weights on TPU take the Pallas fused kernel
    (ops/pallas/moe_gemm.py — dequant stays in the matmul epilogue, 1.15x
    over dequantize+ragged_dot on v5e); float weights (and CPU) use XLA's
    ragged_dot, which is at parity for bf16.

    ``layer_idx``: weights are LAYER-STACKED [L, E, ...] and this (traced)
    index selects the layer inside the kernel — the lax.scan never slices
    the stacks (see fused_moe_pallas's docstring for why that matters)."""
    from ..models.layers import QuantizedLinear, QuantizedLinear4
    from ..ops.pallas import use_pallas

    fusable = isinstance(w_gate, QuantizedLinear) or (
        # INT4 fuses only in the kernel's half-split packings (in-register
        # nibble unpack, no interleave); "pair"-packed weights fall back.
        isinstance(w_gate, QuantizedLinear4) and w_gate.layout == "half_in"
    )
    if fusable and use_pallas():
        from ..ops.pallas.moe_gemm import fused_moe_pallas

        return fused_moe_pallas(x_sorted, group_sizes, w_gate, w_up, w_down,
                                layer_idx=layer_idx)
    if layer_idx is not None:  # XLA fallback: slice the stacks
        w_gate, w_up, w_down = jax.tree.map(
            lambda a: a[layer_idx], (w_gate, w_up, w_down))
    wg = dequantize_linear(w_gate, x_sorted.dtype)
    wu = dequantize_linear(w_up, x_sorted.dtype)
    wd = dequantize_linear(w_down, x_sorted.dtype)
    return grouped_expert_ffn(x_sorted.astype(wg.dtype), group_sizes, wg, wu, wd)


def grouped_expert_ffn(
    x_sorted: jax.Array,      # [M, D] tokens sorted by expert id
    group_sizes: jax.Array,   # [E] tokens per expert
    w_gate: jax.Array,        # [E, D, F]
    w_up: jax.Array,          # [E, D, F]
    w_down: jax.Array,        # [E, F, D]
) -> jax.Array:
    """SwiGLU experts as three grouped GEMMs (per-expert segments on the MXU)."""
    g = jax.lax.ragged_dot(x_sorted, w_gate, group_sizes)
    u = jax.lax.ragged_dot(x_sorted, w_up, group_sizes)
    h = jax.nn.silu(g) * u
    return jax.lax.ragged_dot(h, w_down, group_sizes)


def moe_ffn(
    x: jax.Array,             # [T, D]
    gate_w: jax.Array,        # [D, E] router gate
    w_gate: jax.Array,        # [E, D, F]
    w_up: jax.Array,
    w_down: jax.Array,
    *,
    top_k: int,
    num_groups: int = 1,
    topk_group: int = 1,
    shared: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,  # (wg, wu, wd)
    aux_loss_coeff: float = 0.01,
    expert_mask: Optional[jax.Array] = None,  # [E] bool — EP local-expert slice
    expert_offset=None,       # int/traced — first global expert id held locally
    num_global_experts: Optional[int] = None,  # E_global when weights are a local slice
    expert_map: Optional[jax.Array] = None,    # [E] logical->physical slot (EPLB)
    layer_idx: Optional[jax.Array] = None,     # weights layer-stacked [L, E, ...]
) -> Tuple[jax.Array, jax.Array]:
    """Full MoE layer: route -> sort -> grouped GEMM -> weighted scatter-add.

    Returns (out [T, D], aux_loss * coeff).  Two EP forms (SimulatedEPMoELayer
    semantics, mini_moe.py:295-359 — caller owns the cross-rank reduction):
    - ``expert_mask`` [E] bool with full weight arrays: masked-out assignments
      contribute zero.
    - ``expert_offset`` + ``num_global_experts`` with *local slice* weight
      arrays [E_local, ...]: the form shard_map uses, where each rank holds
      only its experts (parallel/ep.py).  ``gate_w`` stays global [D, E].
    """
    T, D = x.shape
    E_global = num_global_experts or gate_w.shape[-1]
    q0 = getattr(w_gate, "q", None)
    if q0 is None:                    # INT4 carries its packed array as .q4
        q0 = getattr(w_gate, "q4", w_gate)
    E_local = q0.shape[1] if layer_idx is not None else q0.shape[0]
    r = route(x @ gate_w, top_k, num_groups, topk_group)

    K = r.ids.shape[1]
    flat_ids = r.ids.reshape(T * K)
    flat_w = r.weights.reshape(T * K)
    if expert_map is not None:
        # EPLB (parallel/eplb.py): router ids are logical; weights are laid
        # out in load-balanced physical slots.
        flat_ids = expert_map[flat_ids]
    if expert_offset is not None:
        # Shift global ids into the local slice; park non-local assignments at
        # id E_local (sorted last) with zero weight — group_sizes only counts
        # 0..E_local-1, so they land in ragged_dot's zero-filled tail.
        local_ids = flat_ids - expert_offset
        is_local = (local_ids >= 0) & (local_ids < E_local)
        flat_w = jnp.where(is_local, flat_w, 0.0)
        flat_ids = jnp.where(is_local, local_ids, E_local)
    elif expert_mask is not None:
        local = expert_mask[flat_ids]
        flat_w = jnp.where(local, flat_w, 0.0)
        flat_ids = jnp.where(local, flat_ids, E_local)

    order = jnp.argsort(flat_ids)                      # stable
    token_idx = order // K                             # source token per slot
    sorted_ids = flat_ids[order]
    group_sizes = jnp.bincount(sorted_ids, length=E_local)

    x_rep = x[token_idx]                               # [M, D] sorted by expert
    y = expert_ffn(x_rep, group_sizes, w_gate, w_up, w_down,
                   layer_idx=layer_idx)
    y = y * flat_w[order][:, None].astype(y.dtype)

    out = jnp.zeros((T, D), y.dtype).at[token_idx].add(y)
    if shared is not None:
        out = out + shared_expert_ffn(x, shared)
    return out.astype(x.dtype), r.aux_loss * aux_loss_coeff


def shared_expert_ffn(x: jax.Array, shared) -> jax.Array:
    """Dense shared-expert SwiGLU.  ``shared`` is (wg, wu, wd) or the
    fused 2-tuple ([wg|wu], wd) produced by transformer.fuse_projections —
    one matmul instead of two for the same-input gate/up pair."""
    if len(shared) == 2:
        wgu, wd = shared
        gu = mm(x, wgu)
        F = gu.shape[-1] // 2
        return mm(jax.nn.silu(gu[..., :F]) * gu[..., F:], wd)
    wg, wu, wd = shared
    return mm(jax.nn.silu(mm(x, wg)) * mm(x, wu), wd)


def init_moe_params(key, hidden: int, intermediate: int, num_experts: int,
                    num_shared_experts: int = 0, dtype=jnp.float32) -> dict:
    """Stacked expert weights [E, ...] ready for ragged_dot / scan."""
    ks = jax.random.split(key, 5)
    E, D, F = num_experts, hidden, intermediate
    p = {
        "gate": (0.02 * jax.random.normal(ks[0], (D, E))).astype(dtype),
        "w_gate": (0.02 * jax.random.normal(ks[1], (E, D, F))).astype(dtype),
        "w_up": (0.02 * jax.random.normal(ks[2], (E, D, F))).astype(dtype),
        "w_down": (0.02 * jax.random.normal(ks[3], (E, F, D))).astype(dtype),
    }
    if num_shared_experts > 0:
        sk = jax.random.split(ks[4], 3)
        Fs = F * num_shared_experts
        p["shared"] = (
            (0.02 * jax.random.normal(sk[0], (D, Fs))).astype(dtype),
            (0.02 * jax.random.normal(sk[1], (D, Fs))).astype(dtype),
            (0.02 * jax.random.normal(sk[2], (Fs, D))).astype(dtype),
        )
    return p
