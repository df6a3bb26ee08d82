"""Device mesh + GSPMD shardings: DP x TP (with EP riding the TP axis).

The reference documents NCCL TP/EP and leaves the collectives as comments
(ref: BLOG_PART2_V2.md:322-380 TP KV sharding; 03_moe/mini_moe.py:356-357 EP
AllReduce).  TPU-natively, parallelism is *declared*, not programmed
(SNIPPETS.md [3] pattern; the scaling-book recipe):

- a 2-D logical mesh ``("dp", "tp")`` over the chips;
- ``NamedSharding`` annotations on the param / KV-cache / batch pytrees
  (Megatron-style: attention heads and FFN columns on "tp", row-parallel
  outputs reduced by the compiler-inserted psum over ICI);
- ``jax.jit`` compiles the step with those shardings; XLA places the
  collectives.

Expert parallelism is the one explicitly-programmed collective: experts are
sharded over "tp" and the MoE layer runs under ``shard_map`` — each rank
computes its local expert slice (moe.moe_ffn with expert_offset) and a
``psum`` over "tp" plays the role of the reference's missing AllReduce.
Activations stay replicated over "tp" inside the layer, so no all_to_all is
required for correctness; token-sharded all_to_all dispatch is a later
bandwidth optimization.

KV cache sharding: MHA K/V pages on the kv-head axis over "tp"
(BLOG_PART2_V2.md:322-380's per-rank KV shards, block table global); the MLA
latent cache is head-less and replicated (the TPLA alternative is noted in
PAPERS.md).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ModelConfig, ParallelConfig


def make_mesh(parallel: ParallelConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if parallel.cp_size > 1 and parallel.pp_size > 1:
        # Pipeline stages x context x data x tensor parallelism: "pp" and
        # "cp" are manual axes of the pipeline shard_map (parallel/pp.py
        # runs the cp attention body directly — a shard_map cannot nest),
        # "dp"/"tp" stay GSPMD auto axes (batch rows / attention heads
        # shard exactly as in the plain paths).  Layer axis over pp, cache
        # slot axis over cp.  Size-1 axes degenerate cleanly.
        n = (parallel.pp_size * parallel.cp_size * parallel.dp_size
             * parallel.tp_size)
        assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
        dev = np.asarray(devices[:n]).reshape(
            parallel.pp_size, parallel.cp_size, parallel.dp_size,
            parallel.tp_size)
        return Mesh(dev, ("pp", "cp", "dp", "tp"))
    if parallel.cp_size > 1:
        # Context parallelism (parallel/cp_serving.py): ("dp", "cp", "tp")
        # mesh — batch rows shard over "dp", the cache's slot axis over
        # "cp", q_b/wo heads over "tp" within each (dp, cp) rank (ref sizes
        # PCP/DCP alongside TP, BLOG_PART3_V2.md:709-768).  Size-1 axes
        # degenerate cleanly.
        n = parallel.dp_size * parallel.cp_size * parallel.tp_size
        assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
        dev = np.asarray(devices[:n]).reshape(
            parallel.dp_size, parallel.cp_size, parallel.tp_size)
        return Mesh(dev, ("dp", "cp", "tp"))
    if parallel.pp_size > 1:
        # Pipeline stages x data x tensor parallelism: ("pp", "dp", "tp").
        # The pipeline schedule is manual over "pp" (shard_map axis_names);
        # "dp" and "tp" stay GSPMD auto axes inside each stage, so batch
        # rows and attention heads / FFN columns shard exactly as in the
        # plain DPxTP path.  Size-1 axes degenerate cleanly.
        n = parallel.pp_size * parallel.dp_size * parallel.tp_size
        assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
        dev = np.asarray(devices[:n]).reshape(
            parallel.pp_size, parallel.dp_size, parallel.tp_size)
        return Mesh(dev, ("pp", "dp", "tp"))
    n = parallel.dp_size * parallel.tp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(parallel.dp_size, parallel.tp_size)
    return Mesh(dev, ("dp", "tp"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def param_shardings(cfg: ModelConfig, mesh: Mesh, mla_kv: str = "replicated",
                    with_expert_map: bool = False) -> dict:
    """NamedSharding pytree matching models.transformer.init_params.

    Megatron TP layout; every per-layer array keeps its leading [L] axis
    unsharded (the scan axis).
    """
    rep = _ns(mesh)
    if cfg.is_mla:
        layers = {
            "attn_norm": rep,
            "q_a": rep,                     # [L, H, qr] small; replicate
            "q_a_norm": rep,
            "q_b": _ns(mesh, None, None, "tp"),   # heads on out dim
            "kv_a": (
                _ns(mesh, None, None, "tp") if mla_kv == "tpla" else rep
            ),                               # TPLA: latent rank r on "tp"
            "kv_norm": (
                _ns(mesh, None, "tp") if mla_kv == "tpla" else rep
            ),
            "kv_b": (
                _ns(mesh, None, "tp", None)  # TPLA: contract-over-r -> psum
                if mla_kv == "tpla"
                else _ns(mesh, None, None, "tp")  # per-head expansion
            ),
            "wo": _ns(mesh, None, "tp", None),    # row-parallel -> psum
        }
    else:
        layers = {
            "attn_norm": rep,
            "wq": _ns(mesh, None, None, "tp"),    # [L, H, Hq*D] col-parallel
            "wkv": _ns(mesh, None, None, "tp"),
            "wo": _ns(mesh, None, "tp", None),    # row-parallel -> psum
        }
    layers["ffn_norm"] = rep
    if cfg.is_moe:
        layers["moe"] = {
            "gate": rep,                          # router gate replicated
            "w_gate": _ns(mesh, None, "tp", None, None),  # [L, E, D, F] experts on tp
            "w_up": _ns(mesh, None, "tp", None, None),
            "w_down": _ns(mesh, None, "tp", None, None),
        }
        if with_expert_map:
            layers["moe"]["expert_map"] = rep     # [L, E] EPLB logical->slot
        if cfg.num_shared_experts > 0:
            layers["moe"]["shared"] = (
                _ns(mesh, None, None, "tp"),      # [L, D, Fs] col-parallel
                _ns(mesh, None, None, "tp"),
                _ns(mesh, None, "tp", None),      # row-parallel
            )
    else:
        layers["w_gate"] = _ns(mesh, None, None, "tp")
        layers["w_up"] = _ns(mesh, None, None, "tp")
        layers["w_down"] = _ns(mesh, None, "tp", None)
    return {
        "embed": rep,
        "layers": layers,
        "final_norm": rep,
        "lm_head": _ns(mesh, None, "tp"),         # vocab col-parallel
        "rope": rep,
    }


def cache_shardings(cfg: ModelConfig, mesh: Mesh, mla_kv: str = "replicated"):
    """Sharding pytree for the layer-stacked KV cache."""
    from ..ops.attention import KVCache
    from ..ops.mla_attention import MLACache

    if cfg.is_mla:
        rep = _ns(mesh)
        if mla_kv == "tpla":
            # [L, slots, r]: latent rank sharded -> KV bytes/chip / tp.
            return MLACache(c=_ns(mesh, None, None, "tp"), kr=rep,
                            c_scale=rep, kr_scale=rep)
        return MLACache(c=rep, kr=rep, c_scale=rep, kr_scale=rep)
    return KVCache(
        k=_ns(mesh, None, None, "tp", None),      # [L, slots, Hkv, D]
        v=_ns(mesh, None, None, "tp", None),
        k_scale=_ns(mesh, None, None, "tp"),
        v_scale=_ns(mesh, None, None, "tp"),
    )


def batch_shardings(mesh: Mesh):
    """ModelBatch rows sharded over dp; per-row metadata likewise."""
    from ..models.transformer import ModelBatch

    row = _ns(mesh, "dp")
    grid = _ns(mesh, "dp", None)
    return ModelBatch(
        tokens=grid, positions=grid, slots=grid,
        block_tables=grid, ctx_lens=row, q_lens=row,
    )


def pp_param_shardings(params: dict, mesh: Mesh, cfg: ModelConfig = None,
                       mla_kv: str = "replicated") -> dict:
    """Pipeline-stage layout: every layer-stacked array shards its leading
    [L] axis over "pp".  On a 2-D (pp, tp) mesh the Megatron tp layout
    composes on the remaining axes (param_shardings with "pp" prepended in
    place of the unsharded [L] entry); embed/lm_head/norms/rope follow
    their plain-TP specs."""
    if cfg is not None and mesh.shape.get("tp", 1) > 1:
        with_emap = cfg.is_moe and "expert_map" in params["layers"].get("moe", {})
        base = param_shardings(cfg, mesh, mla_kv, with_expert_map=with_emap)

        def prepend_pp(ns: NamedSharding) -> NamedSharding:
            spec = list(ns.spec)
            rest = spec[1:] if spec else []
            return NamedSharding(mesh, P("pp", *rest))

        base["layers"] = jax.tree.map(
            prepend_pp, base["layers"],
            is_leaf=lambda x: isinstance(x, NamedSharding),
        )
        return base
    rep = _ns(mesh)
    stage = _ns(mesh, "pp")
    return {
        k: (jax.tree.map(lambda _: stage, v) if k == "layers" else
            jax.tree.map(lambda _: rep, v))
        for k, v in params.items()
    }


def _quant_aware(spec_tree: dict, params: dict) -> dict:
    """Expand float-weight NamedShardings over quantized leaves.

    ``param_shardings`` describes the float layout; a checkpoint-restored
    tree may hold QuantizedLinear/QuantizedLinear4 leaves whose scale array
    has one fewer axis (the contracted input axis, -2, is reduced away), so
    applying the weight spec as a pytree prefix would hand the scale a
    wrong-rank PartitionSpec.  Emit matching (q_spec, scale_spec) pairs
    instead, like parallel/ep.py's _expert_spec does."""
    from ..models.layers import QuantizedLinear, QuantizedLinear4

    def fix(sharding, leaf):
        if not isinstance(leaf, (QuantizedLinear, QuantizedLinear4)):
            return sharding
        q = leaf.q if isinstance(leaf, QuantizedLinear) else leaf.q4
        mesh, spec = sharding.mesh, sharding.spec
        full = list(spec) + [None] * (q.ndim - len(spec))
        q_s = NamedSharding(mesh, P(*full))
        scale_s = NamedSharding(mesh, P(*(full[:-2] + [full[-1]])))
        if isinstance(leaf, QuantizedLinear4):
            return QuantizedLinear4(q_s, scale_s, leaf.in_dim, leaf.layout)
        return QuantizedLinear(q_s, scale_s)

    return jax.tree.map(fix, spec_tree, params)


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh,
                 mla_kv: str = "replicated") -> dict:
    if "pp" in mesh.shape:
        specs = pp_param_shardings(params, mesh, cfg, mla_kv)
        if mesh.shape.get("tp", 1) > 1:
            specs = _quant_aware(specs, params)
        # (1-D pp: pp_param_shardings maps per-array inside quantized leaves
        # too, and q and scale both keep the leading [L] stage axis.)
        return jax.device_put(params, specs)
    if "cp" in mesh.shape:
        if mesh.shape.get("tp", 1) > 1:
            # cp x tp: the Megatron tp layout applies within each cp rank
            # (specs mention only "tp", so every array replicates over
            # "cp"); the KV cache is what shards over "cp" (shard_cache).
            with_emap = (cfg.is_moe
                         and "expert_map" in params["layers"].get("moe", {}))
            specs = _quant_aware(
                param_shardings(cfg, mesh, mla_kv,
                                with_expert_map=with_emap), params)
            return jax.device_put(params, specs)
        # 1-D cp: params replicate on every cp rank.
        rep = _ns(mesh)
        return jax.device_put(params, jax.tree.map(lambda _: rep, params))
    with_emap = cfg.is_moe and "expert_map" in params["layers"].get("moe", {})
    specs = _quant_aware(
        param_shardings(cfg, mesh, mla_kv, with_expert_map=with_emap), params
    )
    return jax.device_put(params, specs)


def shard_cache(cache, cfg: ModelConfig, mesh: Mesh,
                mla_kv: str = "replicated"):
    if "pp" in mesh.shape:
        if "cp" in mesh.shape:
            from ..ops.attention import KVCache
            from ..ops.mla_attention import MLACache

            # pp x cp: layer axis over "pp", slot axis over "cp"
            # (parallel/pp.py's composed manual region).
            if cfg.is_mla:
                return jax.device_put(cache, MLACache(
                    c=_ns(mesh, "pp", "cp", None),
                    kr=_ns(mesh, "pp", "cp", None),
                    c_scale=_ns(mesh, "pp", "cp"),
                    kr_scale=_ns(mesh, "pp", "cp"),
                ))
            tp = "tp" if mesh.shape.get("tp", 1) > 1 else None
            return jax.device_put(cache, KVCache(
                k=_ns(mesh, "pp", "cp", tp, None),
                v=_ns(mesh, "pp", "cp", tp, None),
                k_scale=_ns(mesh, "pp", "cp", tp),
                v_scale=_ns(mesh, "pp", "cp", tp),
            ))
        if mesh.shape.get("tp", 1) > 1:
            # Stage-shard the [L] axis AND keep the tp head/latent layout.
            base = cache_shardings(cfg, mesh, mla_kv)

            def prepend_pp(ns):
                rest = list(ns.spec)[1:]
                return NamedSharding(mesh, P("pp", *rest))

            return jax.device_put(cache, jax.tree.map(prepend_pp, base))
        stage = _ns(mesh, "pp")
        return jax.device_put(cache, jax.tree.map(lambda _: stage, cache))
    if "cp" in mesh.shape:
        from ..ops.attention import KVCache
        from ..ops.mla_attention import MLACache

        # [L, slots, ...]: the SLOT axis shards over cp (virtual blocks,
        # parallel/cp_serving.py); GQA kv-heads additionally shard over tp.
        if cfg.is_mla:
            return jax.device_put(cache, MLACache(
                c=_ns(mesh, None, "cp", None), kr=_ns(mesh, None, "cp", None),
                c_scale=_ns(mesh, None, "cp"), kr_scale=_ns(mesh, None, "cp"),
            ))
        tp = "tp" if mesh.shape.get("tp", 1) > 1 else None
        return jax.device_put(cache, KVCache(
            k=_ns(mesh, None, "cp", tp, None),
            v=_ns(mesh, None, "cp", tp, None),
            k_scale=_ns(mesh, None, "cp", tp),
            v_scale=_ns(mesh, None, "cp", tp),
        ))
    return jax.device_put(cache, cache_shardings(cfg, mesh, mla_kv))
