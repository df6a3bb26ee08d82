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

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.config import ModelConfig
from ..models.layers import QuantizedLinear
from ..models.moe import moe_ffn


def _expert_spec(w):
    """Partition spec for an expert weight stack [E, in, out] — handles the
    weight-only-INT8 form (QuantizedLinear: q [E,in,out], scale [E,out])."""
    if isinstance(w, QuantizedLinear):
        return QuantizedLinear(P("tp", None, None), P("tp", None))
    return P("tp", None, None)


def ep_moe_ffn(
    x: jax.Array,          # [T, D] (rows sharded over "dp")
    moe_params: dict,      # per-layer slice: gate [D,E], w_* [E,D,F] sharded on "tp"
    cfg: ModelConfig,
    mesh: Mesh,
) -> jax.Array:
    """MoE layer under EP: local grouped GEMM + psum("tp").  Returns [T, D].

    The shared expert (if any) is NOT computed here — it is dense and runs
    under plain GSPMD in the caller.
    """
    tp = mesh.shape["tp"]
    E_local = cfg.num_experts // tp
    assert E_local * tp == cfg.num_experts, "num_experts must divide tp_size"
    wg, wu, wd = moe_params["w_gate"], moe_params["w_up"], moe_params["w_down"]

    def local_fn(xs, gate, wg, wu, wd):
        offset = jax.lax.axis_index("tp") * E_local
        out, _aux = moe_ffn(
            xs, gate, wg, wu, wd,
            top_k=cfg.top_k, num_groups=cfg.num_groups, topk_group=cfg.topk_group,
            expert_offset=offset, num_global_experts=cfg.num_experts,
            aux_loss_coeff=cfg.aux_loss_coeff,
        )
        return jax.lax.psum(out, "tp")

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("dp", None),            # tokens: dp rows, replicated over tp
            P(),                      # router gate: replicated
            _expert_spec(wg),         # expert slices (float or int8+scale)
            _expert_spec(wu),
            _expert_spec(wd),
        ),
        out_specs=P("dp", None),
        check_vma=False,
    )
    return fn(x, moe_params["gate"], wg, wu, wd)
