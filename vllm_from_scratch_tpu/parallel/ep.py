"""Expert parallelism via shard_map over the "tp" mesh axis.

The explicit-collective half of the parallel design (see sharding.py): the
reference simulates EP with a local-expert loop and leaves the AllReduce as
a comment (ref: 03_moe/mini_moe.py:295-359); here each rank holds
E/tp experts (weights sharded on the expert axis), computes its slice with
``moe_ffn(expert_offset=...)``, and a ``psum`` over "tp" — riding ICI —
combines the partial token outputs.  Activations stay replicated over "tp"
(token-sharded all_to_all dispatch is a later bandwidth optimization; with
replicated activations the psum is the entire communication).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.config import ModelConfig
from ..models.layers import QuantizedLinear, QuantizedLinear4
from ..models.moe import moe_ffn


def _expert_spec(w):
    """Partition spec for an expert weight stack [E, in, out] — handles the
    weight-only-INT8 form (QuantizedLinear: q [E,in,out], scale [E,out]) and
    the INT4 form (QuantizedLinear4: packed q4 [E,*,*], scale [E,out]; the
    spec pytree must carry the SAME aux (in_dim, layout) or the shard_map
    treedefs won't match)."""
    if isinstance(w, QuantizedLinear):
        return QuantizedLinear(P("tp", None, None), P("tp", None))
    if isinstance(w, QuantizedLinear4):
        return QuantizedLinear4(P("tp", None, None), P("tp", None),
                                w.in_dim, w.layout)
    return P("tp", None, None)


def ep_moe_ffn(
    x: jax.Array,          # [T, D] (rows sharded over "dp")
    moe_params: dict,      # per-layer slice: gate [D,E], w_* [E,D,F] sharded on "tp"
    cfg: ModelConfig,
    mesh: Mesh,
    *,
    expert_map=None,       # [E] int32 logical->physical slot (EPLB), replicated
) -> jax.Array:
    """MoE layer under EP: local grouped GEMM + psum("tp").  Returns [T, D].

    The shared expert (if any) is NOT computed here — it is dense and runs
    under plain GSPMD in the caller.  ``expert_map`` remaps the router's
    logical ids onto the load-balanced physical slot layout the expert
    stacks were permuted into (parallel/eplb.py).
    """
    import jax.numpy as jnp

    tp = mesh.shape["tp"]
    E_local = cfg.num_experts // tp
    assert E_local * tp == cfg.num_experts, "num_experts must divide tp_size"
    wg, wu, wd = moe_params["w_gate"], moe_params["w_up"], moe_params["w_down"]
    if expert_map is None:
        expert_map = jnp.arange(cfg.num_experts, dtype=jnp.int32)

    def local_fn(xs, gate, emap, wg, wu, wd):
        offset = jax.lax.axis_index("tp") * E_local
        out, _aux = moe_ffn(
            xs, gate, wg, wu, wd,
            top_k=cfg.top_k, num_groups=cfg.num_groups, topk_group=cfg.topk_group,
            expert_offset=offset, num_global_experts=cfg.num_experts,
            aux_loss_coeff=cfg.aux_loss_coeff,
            expert_map=emap,
        )
        return jax.lax.psum(out, "tp")

    # Token rows shard over "dp" when the mesh has one; on a ("cp", "tp")
    # mesh they replicate over "cp" (each cp rank computes the full MoE —
    # activations are tiny next to the cp-sharded KV).
    row = "dp" if "dp" in mesh.shape else None
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(row, None),             # tokens: dp rows, replicated over tp
            P(),                      # router gate: replicated
            P(),                      # expert_map: replicated
            _expert_spec(wg),         # expert slices (float or int8+scale)
            _expert_spec(wu),
            _expert_spec(wd),
        ),
        out_specs=P(row, None),
        check_vma=False,
    )
    return fn(x, moe_params["gate"], expert_map, wg, wu, wd)


def ep_moe_ffn_a2a(
    x: jax.Array,          # [T, D] tokens, sharded over "tp" rows
    moe_params: dict,
    cfg: ModelConfig,
    mesh: Mesh,
    *,
    capacity_factor: float = 0.0,  # 0 => exact (C = T_local*K, no drops)
    expert_map=None,               # [E] int32 logical->physical slot (EPLB)
) -> jax.Array:
    """Token-sharded EP with all_to_all dispatch (the bandwidth-optimal form).

    The psum variant above replicates activations over "tp" and reduces
    outputs; here tokens stay sharded: each rank routes its own T/n tokens,
    sends each (token, expert) assignment to the expert's owner rank via
    ``all_to_all``, computes its local experts' grouped GEMM over what it
    received, and a second ``all_to_all`` returns results to the senders —
    the NCCL All2All pattern the reference documents (BLOG_PART3_V2.md:
    262-287), compiled onto ICI.

    Capacity: each (src, dst) rank pair carries at most C assignments.
    C = T_local*K (capacity_factor=0) is exact — no token ever drops; a
    positive factor sets C = ceil(T_local*K/n * factor) (standard
    capacity-factor semantics: overflow assignments are dropped, their
    routing weight lost).  Returns [T, D] sharded like x; the shared expert
    and aux loss are the caller's (same contract as ep_moe_ffn).
    """
    import jax.numpy as jnp

    from ..models.moe import expert_ffn, route

    n = mesh.shape["tp"]
    E = cfg.num_experts
    E_local = E // n
    assert E_local * n == E, "num_experts must divide tp_size"
    K = cfg.top_k

    wg, wu, wd = moe_params["w_gate"], moe_params["w_up"], moe_params["w_down"]

    # Token rows must divide the tp axis; pad with zero rows (they route
    # somewhere and compute garbage for themselves only — sliced off below).
    T0 = x.shape[0]
    pad = (-T0) % n
    if pad:
        import jax.numpy as _jnp

        x = _jnp.pad(x, ((0, pad), (0, 0)))

    if expert_map is None:
        expert_map = jnp.arange(E, dtype=jnp.int32)

    def local_fn(xs, gate, emap, wg, wu, wd):
        T_l, D = xs.shape
        M = T_l * K
        C = M if capacity_factor <= 0 else max(1, -(-int(M * capacity_factor) // n))

        r = route(xs @ gate, K, cfg.num_groups, cfg.topk_group)
        flat_ids = emap[r.ids.reshape(M)]      # global PHYSICAL expert slots
        flat_w = r.weights.reshape(M)
        token_idx = jnp.arange(M, dtype=jnp.int32) // K
        dest = flat_ids // E_local             # owner rank per assignment
        local_eid = flat_ids % E_local

        # Position of each assignment within its destination's send slots.
        onehot = (dest[:, None] == jnp.arange(n)[None, :]).astype(jnp.int32)
        pos = jnp.take_along_axis(
            jnp.cumsum(onehot, axis=0) - 1, dest[:, None], axis=1
        )[:, 0]                                # [M]
        keep = pos < C

        send_x = jnp.zeros((n, C, D), xs.dtype)
        send_eid = jnp.full((n, C), E_local, jnp.int32)   # E_local = pad/invalid
        # Dropped assignments scatter out of bounds and are discarded by
        # mode="drop" (NOT clipped — a clip would corrupt slot C-1).
        p_k = jnp.where(keep, pos, C)
        send_x = send_x.at[dest, p_k].set(xs[token_idx], mode="drop")
        send_eid = send_eid.at[dest, p_k].set(local_eid, mode="drop")

        # Exchange: recv[j] = what rank j sent to me.
        recv_x = jax.lax.all_to_all(send_x, "tp", split_axis=0, concat_axis=0, tiled=True)
        recv_eid = jax.lax.all_to_all(send_eid, "tp", split_axis=0, concat_axis=0, tiled=True)

        # Local experts' grouped GEMM over everything received.
        rx = recv_x.reshape(n * C, D)
        re = recv_eid.reshape(n * C)
        order = jnp.argsort(re)
        group_sizes = jnp.bincount(re[order], length=E_local)
        y = expert_ffn(rx[order], group_sizes, wg, wu, wd)
        y_unsorted = jnp.zeros_like(y).at[order].set(y)
        y_back = y_unsorted.reshape(n, C, D)

        # Return trip: back[j] = my sent rows' results, at send positions.
        back = jax.lax.all_to_all(y_back, "tp", split_axis=0, concat_axis=0, tiled=True)

        # Dropped rows gather slot 0 but with zero weight.
        contrib = back[dest, jnp.where(keep, pos, 0)] * jnp.where(keep, flat_w, 0.0)[:, None]
        out = jnp.zeros((T_l, D), jnp.float32).at[token_idx].add(
            contrib.astype(jnp.float32)
        )
        return out.astype(xs.dtype)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("tp", None),             # tokens SHARDED over tp
            P(),
            P(),                       # expert_map: replicated
            _expert_spec(wg),
            _expert_spec(wu),
            _expert_spec(wd),
        ),
        out_specs=P("tp", None),
        check_vma=False,
    )
    out = fn(x, moe_params["gate"], expert_map, wg, wu, wd)
    return out[:T0] if pad else out
