"""MoE tests — port of the reference suite 03 contract
(03_moe/test_mini_moe.py, 19 cases): SwiGLU-vs-manual oracle, router
invariants, grouped routing constraints, shared experts, aux loss, EP — plus
the grouped-GEMM-vs-loop oracle and the EP AllReduce identity the reference
only leaves as a comment (mini_moe.py:356-357)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_from_scratch_tpu.core.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_from_scratch_tpu.models.moe import (
    grouped_expert_ffn,
    grouped_top_k_routing,
    init_moe_params,
    moe_ffn,
    top_k_routing,
)


def softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


class TestExpert:
    def test_swiglu_matches_manual(self):
        """Expert == down(silu(gate(x)) * up(x)) (test_mini_moe.py:27-34)."""
        key = jax.random.PRNGKey(0)
        p = init_moe_params(key, hidden=16, intermediate=32, num_experts=1)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 16))
        out = grouped_expert_ffn(x, jnp.array([5]), p["w_gate"], p["w_up"], p["w_down"])
        g = np.asarray(x) @ np.asarray(p["w_gate"][0])
        u = np.asarray(x) @ np.asarray(p["w_up"][0])
        manual = (g / (1 + np.exp(-g)) * u) @ np.asarray(p["w_down"][0])
        np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-4, atol=1e-5)


class TestTopKRouter:
    def setup_method(self, _):
        self.logits = jax.random.normal(jax.random.PRNGKey(2), (32, 8))

    def test_shapes_and_ranges(self):
        r = top_k_routing(self.logits, top_k=2)
        assert r.weights.shape == (32, 2) and r.ids.shape == (32, 2)
        assert np.all(np.asarray(r.ids) >= 0) and np.all(np.asarray(r.ids) < 8)

    def test_weights_normalized_and_sorted(self):
        r = top_k_routing(self.logits, top_k=3)
        np.testing.assert_allclose(np.asarray(r.weights).sum(-1), 1.0, atol=1e-5)
        w = np.asarray(r.weights)
        assert np.all(w[:, 0] >= w[:, 1]) and np.all(w[:, 1] >= w[:, 2])

    def test_ids_distinct(self):
        r = top_k_routing(self.logits, top_k=4)
        ids = np.asarray(r.ids)
        assert all(len(set(row)) == 4 for row in ids)

    def test_aux_loss_balanced_is_one(self):
        """Uniform router -> aux loss ~= 1.0 (its minimum for balanced load)."""
        logits = jnp.zeros((1024, 8))
        r = top_k_routing(logits, top_k=2)
        # usage concentrates on top-1 = expert 0 (ties), but mean_prob uniform:
        # E * sum(usage * 1/E) = 1 regardless of tie-breaks.
        assert abs(float(r.aux_loss) - 1.0) < 1e-4

    def test_aux_loss_penalizes_collapse(self):
        logits = jnp.zeros((256, 8)).at[:, 3].set(10.0)  # everything -> expert 3
        r = top_k_routing(logits, top_k=2)
        assert float(r.aux_loss) > 4.0


class TestGroupedTopKRouter:
    def test_candidates_within_selected_groups(self):
        """With G=4 groups and 2 selected, every expert id must fall into
        exactly 2 distinct groups per token (mini_moe.py:129-163 contract)."""
        logits = jax.random.normal(jax.random.PRNGKey(3), (64, 16))
        r = grouped_top_k_routing(logits, top_k=4, num_groups=4, topk_group=2)
        ids = np.asarray(r.ids)  # [64, 4]
        groups = ids // 4
        for row in groups:
            assert len(set(row)) == 2  # top_k//topk_group selected groups

    def test_normalization(self):
        logits = jax.random.normal(jax.random.PRNGKey(4), (16, 16))
        r = grouped_top_k_routing(logits, top_k=4, num_groups=4, topk_group=2)
        np.testing.assert_allclose(np.asarray(r.weights).sum(-1), 1.0, atol=1e-5)

    def test_degenerate_single_group_equals_topk(self):
        logits = jax.random.normal(jax.random.PRNGKey(5), (16, 8))
        a = grouped_top_k_routing(logits, top_k=2, num_groups=1, topk_group=2)
        b = top_k_routing(logits, top_k=2)
        assert set(map(tuple, np.asarray(a.ids))) == set(map(tuple, np.asarray(b.ids)))
        np.testing.assert_allclose(
            np.sort(np.asarray(a.weights)), np.sort(np.asarray(b.weights)), atol=1e-5
        )

    def test_picks_strongest_group(self):
        """Boost one group's logits -> it must always be selected."""
        logits = jax.random.normal(jax.random.PRNGKey(6), (32, 16))
        logits = logits.at[:, 8:12].add(5.0)  # group 2 of 4
        r = grouped_top_k_routing(logits, top_k=4, num_groups=4, topk_group=2)
        assert np.all(np.any(np.asarray(r.ids) // 4 == 2, axis=-1))


class TestMoELayer:
    def _naive_moe(self, x, p, top_k):
        """Per-expert loop oracle (the reference's dispatch,
        mini_moe.py:260-283)."""
        xn = np.asarray(x, np.float64)
        probs = softmax_np(xn @ np.asarray(p["gate"], np.float64))
        E = probs.shape[-1]
        order = np.argsort(-probs, -1)[:, :top_k]
        topw = np.take_along_axis(probs, order, -1)
        topw = topw / (topw.sum(-1, keepdims=True) + 1e-9)
        out = np.zeros_like(xn)
        for e in range(E):
            for t in range(xn.shape[0]):
                ks = np.where(order[t] == e)[0]
                if len(ks) == 0:
                    continue
                g = xn[t] @ np.asarray(p["w_gate"][e], np.float64)
                u = xn[t] @ np.asarray(p["w_up"][e], np.float64)
                y = (g / (1 + np.exp(-g)) * u) @ np.asarray(p["w_down"][e], np.float64)
                out[t] += y * topw[t, ks[0]]
        return out

    def test_grouped_gemm_matches_loop_oracle(self):
        key = jax.random.PRNGKey(7)
        p = init_moe_params(key, hidden=16, intermediate=32, num_experts=4)
        x = jax.random.normal(jax.random.PRNGKey(8), (12, 16))
        out, aux = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"], top_k=2)
        ref = self._naive_moe(x, p, top_k=2)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)

    def test_shared_expert_adds(self):
        key = jax.random.PRNGKey(9)
        p = init_moe_params(key, 16, 32, num_experts=4, num_shared_experts=2)
        x = jax.random.normal(jax.random.PRNGKey(10), (6, 16))
        with_shared, _ = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"],
                                 top_k=2, shared=p["shared"])
        without, _ = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"], top_k=2)
        wg, wu, wd = p["shared"]
        manual = np.asarray(jax.nn.silu(x @ wg) * (x @ wu) @ wd)
        np.testing.assert_allclose(
            np.asarray(with_shared) - np.asarray(without), manual, rtol=1e-3, atol=1e-4
        )

    def test_aux_loss_scaled(self):
        key = jax.random.PRNGKey(11)
        p = init_moe_params(key, 16, 32, num_experts=4)
        x = jax.random.normal(jax.random.PRNGKey(12), (6, 16))
        _, aux1 = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"],
                          top_k=2, aux_loss_coeff=0.01)
        _, aux2 = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"],
                          top_k=2, aux_loss_coeff=0.02)
        np.testing.assert_allclose(float(aux2), 2 * float(aux1), rtol=1e-5)

    def test_jit_compatible(self):
        key = jax.random.PRNGKey(13)
        p = init_moe_params(key, 16, 32, num_experts=4)
        f = jax.jit(lambda x: moe_ffn(x, p["gate"], p["w_gate"], p["w_up"],
                                      p["w_down"], top_k=2)[0])
        x = jax.random.normal(jax.random.PRNGKey(14), (6, 16))
        np.testing.assert_allclose(
            np.asarray(f(x)),
            np.asarray(moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"], top_k=2)[0]),
            rtol=1e-5, atol=1e-6,
        )


class TestExpertParallel:
    def test_allreduce_identity(self):
        """sum over EP ranks of local-expert outputs == full MoE output —
        the reduction the reference leaves as a comment (mini_moe.py:356-357)."""
        key = jax.random.PRNGKey(15)
        E, ep_size = 8, 4
        p = init_moe_params(key, 16, 32, num_experts=E)
        x = jax.random.normal(jax.random.PRNGKey(16), (10, 16))
        full, _ = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"], top_k=2)
        acc = jnp.zeros_like(full)
        for rank in range(ep_size):
            mask = jnp.zeros((E,), bool).at[rank * 2 : rank * 2 + 2].set(True)
            local, _ = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"],
                               top_k=2, expert_mask=mask)
            acc = acc + local
        np.testing.assert_allclose(np.asarray(acc), np.asarray(full), rtol=1e-4, atol=1e-5)

    def test_local_slice_only_uses_local_experts(self):
        """Zeroing non-local expert weights must not change the local output."""
        key = jax.random.PRNGKey(17)
        p = init_moe_params(key, 16, 32, num_experts=4)
        x = jax.random.normal(jax.random.PRNGKey(18), (6, 16))
        mask = jnp.array([True, True, False, False])
        local, _ = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"],
                           top_k=2, expert_mask=mask)
        zeroed = {k: (v.at[2:].set(0.0) if k != "gate" else v) for k, v in p.items()}
        local2, _ = moe_ffn(x, zeroed["gate"], zeroed["w_gate"], zeroed["w_up"],
                            zeroed["w_down"], top_k=2, expert_mask=mask)
        np.testing.assert_allclose(np.asarray(local), np.asarray(local2), atol=1e-5)


class TestMoEEngine:
    def test_generate_with_moe(self):
        """End-to-end: MoE engine generates deterministically."""
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=128, hidden_size=32, num_layers=2,
                              num_heads=2, num_kv_heads=2, max_position=128,
                              intermediate_size=64, num_experts=4, top_k=2,
                              num_shared_experts=1),
            cache=CacheConfig(block_size=16, num_blocks=32, kv_quant="int8"),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64),
        )
        from vllm_from_scratch_tpu.core.engine import LLMEngine

        eng = LLMEngine(cfg)
        sp = SamplingParams(max_new_tokens=5, temperature=0.0, ignore_eos=True)
        out = eng.generate([[1, 2, 3, 4, 5, 6, 7], [9, 8, 7]], sp)
        assert all(len(v) == 5 for v in out.values())
        out2 = LLMEngine(cfg).generate([[1, 2, 3, 4, 5, 6, 7], [9, 8, 7]], sp)
        assert out == out2

    def test_grouped_routing_engine(self):
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=64, hidden_size=32, num_layers=1,
                              num_heads=2, num_kv_heads=2, max_position=128,
                              intermediate_size=32, num_experts=8, top_k=4,
                              num_groups=4, topk_group=2),
            cache=CacheConfig(block_size=16, num_blocks=16, kv_quant="none"),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64),
        )
        from vllm_from_scratch_tpu.core.engine import LLMEngine

        out = LLMEngine(cfg).generate(
            [[5, 4, 3]], SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
        )
        assert len(out[0]) == 4


class TestEPLB:
    """Expert-parallel load balancing (BLOG_PART3_V2.md:185-187): rebalanced
    placement is a pure layout change and reduces the hottest rank's load."""

    def test_balance_reduces_max_rank_load(self):
        import numpy as np

        from vllm_from_scratch_tpu.parallel.eplb import balance, max_rank_load

        loads = np.array([100, 90, 5, 3, 80, 2, 1, 1])  # hot experts clustered
        perm = balance(loads, num_ranks=4)
        assert sorted(perm.tolist()) == list(range(8))
        contiguous = max_rank_load(loads, np.arange(8), 4)   # [100,90],[5,3]...
        balanced = max_rank_load(loads, perm, 4)
        assert balanced < contiguous
        assert balanced <= 110  # LPT pairs ~100+small, 90+small

    def test_permuted_weights_plus_map_is_identity(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vllm_from_scratch_tpu.models.moe import init_moe_params, moe_ffn
        from vllm_from_scratch_tpu.parallel.eplb import (
            apply_permutation, balance, count_expert_load,
        )

        E, D, F, T, K = 8, 16, 32, 64, 2
        p = init_moe_params(jax.random.PRNGKey(0), D, F, E)
        x = jax.random.normal(jax.random.PRNGKey(1), (T, D), jnp.float32)
        ref, _ = moe_ffn(x, p["gate"], p["w_gate"], p["w_up"], p["w_down"], top_k=K)

        from vllm_from_scratch_tpu.models.moe import route

        loads = count_expert_load(np.asarray(route(x @ p["gate"], K).ids), E)
        perm = balance(loads, num_ranks=4)
        p2, emap = apply_permutation(p, perm)
        out, _ = moe_ffn(x, p["gate"], p2["w_gate"], p2["w_up"], p2["w_down"],
                         top_k=K, expert_map=emap)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_layer_stacked_and_quantized_stacks(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vllm_from_scratch_tpu.models.layers import quantize_linear
        from vllm_from_scratch_tpu.parallel.eplb import apply_permutation

        L, E, D, F = 3, 8, 4, 8
        w = jax.random.normal(jax.random.PRNGKey(0), (L, E, D, F))
        p = {"w_gate": w, "w_up": w, "w_down": quantize_linear(w)}
        perm = np.array([7, 6, 5, 4, 3, 2, 1, 0])
        p2, emap = apply_permutation(p, perm)
        np.testing.assert_array_equal(np.asarray(p2["w_gate"][:, 0]),
                                      np.asarray(w[:, 7]))
        assert int(emap[7]) == 0
        np.testing.assert_array_equal(np.asarray(p2["w_down"].q[:, 0]),
                                      np.asarray(quantize_linear(w).q[:, 7]))


class TestFusedMoEKernel:
    """Pallas fused expert kernel (interpret mode) == the ragged_dot path,
    float and int8, skewed/empty expert groups."""

    def _data(self, E=8, D=32, F=64, M=50):
        import jax
        import jax.numpy as jnp

        from vllm_from_scratch_tpu.models.moe import init_moe_params

        p = init_moe_params(jax.random.PRNGKey(0), D, F, E)
        x = jax.random.normal(jax.random.PRNGKey(1), (M, D), jnp.float32)
        gs = jnp.asarray([7, 0, 13, 5, 0, 11, 9, 5], jnp.int32)
        return p, x, gs

    def test_float_matches_ragged(self):
        import jax.numpy as jnp
        import numpy as np

        from vllm_from_scratch_tpu.models.moe import grouped_expert_ffn
        from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas

        p, x, gs = self._data()
        ref = grouped_expert_ffn(x, gs, p["w_gate"], p["w_up"], p["w_down"])
        out = fused_moe_pallas(x, gs, p["w_gate"], p["w_up"], p["w_down"],
                               tile_m=8, interpret=None)
        # Tolerance scales with output magnitude: real Mosaic f32 matmuls
        # (bf16-pass based) differ from XLA in low-order bits.
        tol = max(2e-5, 2e-2 * float(np.max(np.abs(np.asarray(ref)))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)

    def test_int8_matches_dequant_ragged(self):
        import jax.numpy as jnp
        import numpy as np

        from vllm_from_scratch_tpu.models.layers import (
            dequantize_linear, quantize_linear,
        )
        from vllm_from_scratch_tpu.models.moe import grouped_expert_ffn
        from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas

        p, x, gs = self._data()
        q = {k: quantize_linear(p[k]) for k in ("w_gate", "w_up", "w_down")}
        ref = grouped_expert_ffn(
            x, gs,
            dequantize_linear(q["w_gate"], jnp.float32),
            dequantize_linear(q["w_up"], jnp.float32),
            dequantize_linear(q["w_down"], jnp.float32),
        )
        out = fused_moe_pallas(x, gs, q["w_gate"], q["w_up"], q["w_down"],
                               tile_m=8, interpret=None)
        tol = max(2e-5, 2e-2 * float(np.max(np.abs(np.asarray(ref)))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)

    def _int4_pack(self, p):
        from vllm_from_scratch_tpu.models.layers import (
            quantize_linear4_half_in, quantize_linear4_half_out,
        )

        return {
            "w_gate": quantize_linear4_half_in(p["w_gate"]),
            "w_up": quantize_linear4_half_in(p["w_up"]),
            "w_down": quantize_linear4_half_out(p["w_down"]),
        }

    def test_int4_matches_dequant_ragged(self):
        """Fused INT4 (in-kernel nibble unpack, half-split packings) == XLA
        dequantize + ragged_dot (VERDICT r2 weak #6)."""
        import jax.numpy as jnp
        import numpy as np

        from vllm_from_scratch_tpu.models.layers import dequantize_linear
        from vllm_from_scratch_tpu.models.moe import grouped_expert_ffn
        from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas

        p, x, gs = self._data()
        q = self._int4_pack(p)
        ref = grouped_expert_ffn(
            x, gs,
            dequantize_linear(q["w_gate"], jnp.float32),
            dequantize_linear(q["w_up"], jnp.float32),
            dequantize_linear(q["w_down"], jnp.float32),
        )
        out = fused_moe_pallas(x, gs, q["w_gate"], q["w_up"], q["w_down"],
                               tile_m=8, interpret=None)
        tol = max(2e-5, 2e-2 * float(np.max(np.abs(np.asarray(ref)))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)

    def test_int4_layer_stacked_in_kernel_select(self):
        """Layer-stacked [L, E, ...] INT4 stacks with the scalar-prefetched
        layer index — the engine's scan path."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vllm_from_scratch_tpu.models.layers import dequantize_linear
        from vllm_from_scratch_tpu.models.moe import (
            grouped_expert_ffn, init_moe_params,
        )
        from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas

        E, D, F, M, L = 8, 32, 64, 50, 3
        stacks = [init_moe_params(jax.random.PRNGKey(i), D, F, E)
                  for i in range(L)]
        p = jax.tree.map(lambda *xs: jnp.stack(xs), *stacks)
        q = self._int4_pack(p)
        x = jax.random.normal(jax.random.PRNGKey(9), (M, D), jnp.float32)
        gs = jnp.asarray([7, 0, 13, 5, 0, 11, 9, 5], jnp.int32)
        for li in (0, 2):
            ref = grouped_expert_ffn(
                x, gs,
                dequantize_linear(q["w_gate"], jnp.float32)[li],
                dequantize_linear(q["w_up"], jnp.float32)[li],
                dequantize_linear(q["w_down"], jnp.float32)[li],
            )
            out = fused_moe_pallas(
                x, gs, q["w_gate"], q["w_up"], q["w_down"],
                layer_idx=jnp.asarray(li), tile_m=8, interpret=None)
            tol = max(2e-5, 2e-2 * float(np.max(np.abs(np.asarray(ref)))))
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=tol)

    def test_int4_half_layouts_roundtrip(self):
        """half_in / half_out packings dequantize to the same values as the
        generic pair packing (same 4-bit grid, different placement)."""
        import jax
        import numpy as np

        from vllm_from_scratch_tpu.models.layers import (
            dequantize_linear, quantize_linear4, quantize_linear4_half_in,
            quantize_linear4_half_out,
        )

        w = jax.random.normal(jax.random.PRNGKey(3), (6, 16, 8))
        a = dequantize_linear(quantize_linear4(w), np.float32)
        b = dequantize_linear(quantize_linear4_half_in(w), np.float32)
        c = dequantize_linear(quantize_linear4_half_out(w), np.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)

    def test_moe_align_positions(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vllm_from_scratch_tpu.ops.pallas.moe_gemm import moe_align

        x = jax.random.normal(jax.random.PRNGKey(0), (10, 4))
        gs = jnp.asarray([3, 0, 7], jnp.int32)
        x_pad, pos, tile_expert = moe_align(x, gs, tile_m=4)
        np.testing.assert_array_equal(np.asarray(pos),
                                      [0, 1, 2, 4, 5, 6, 7, 8, 9, 10])
        np.testing.assert_array_equal(np.asarray(x_pad)[np.asarray(pos)],
                                      np.asarray(x))
        # tiles: expert0 pads to 4 (tile 0), expert2 pads to 8 (tiles 1-2)
        assert tile_expert[0] == 0 and tile_expert[1] == 2 and tile_expert[2] == 2


class TestMosaicConstraintShapes:
    """Regression cases for Mosaic tiling constraints (VERDICT r1 #2; the
    F-block 128-divisibility bug of commit 3800cdd was caught by a benchmark,
    not a test).  Interpret-mode on CPU; REAL Mosaic when the suite runs with
    VFS_TPU_REAL_DEVICE=1 (interpret=None resolves by backend)."""

    def _check(self, E, D, F, M, bits=8, **kw):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vllm_from_scratch_tpu.models.layers import (
            dequantize_linear, quantize_linear, quantize_linear4_half_in,
            quantize_linear4_half_out,
        )
        from vllm_from_scratch_tpu.models.moe import (
            grouped_expert_ffn, init_moe_params,
        )
        from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas

        p = init_moe_params(jax.random.PRNGKey(0), D, F, E)
        if bits == 4:
            q = {"w_gate": quantize_linear4_half_in(p["w_gate"]),
                 "w_up": quantize_linear4_half_in(p["w_up"]),
                 "w_down": quantize_linear4_half_out(p["w_down"])}
        else:
            q = {k: quantize_linear(p[k]) for k in ("w_gate", "w_up", "w_down")}
        x = jax.random.normal(jax.random.PRNGKey(1), (M, D), jnp.float32)
        per = [M // E] * E
        per[0] += M - sum(per)
        gs = jnp.asarray(per, jnp.int32)
        ref = grouped_expert_ffn(
            x, gs,
            dequantize_linear(q["w_gate"], jnp.float32),
            dequantize_linear(q["w_up"], jnp.float32),
            dequantize_linear(q["w_down"], jnp.float32),
        )
        out = fused_moe_pallas(x, gs, q["w_gate"], q["w_up"], q["w_down"], **kw)
        # Magnitude-scaled tolerance (real-Mosaic f32 matmul rounding).
        tol = max(2e-4, 2e-2 * float(np.max(np.abs(np.asarray(ref)))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol)

    def test_odd_f_no_128_divisor(self):
        """F=320: no 128-multiple divides it -> full-dim F block (legal)."""
        self._check(E=4, D=256, F=320, M=24)

    def test_f_2816_the_3800cdd_shape(self):
        """F=2816 = 128*22 (non-pow2): blocked F must pick a legal divisor."""
        self._check(E=4, D=256, F=2816, M=24)

    def test_decode_sized_batch_default_tiles(self):
        """M=24 decode-sized batch exercises the adaptive tile_m=32 path."""
        self._check(E=8, D=256, F=512, M=24)

    def test_large_m_default_tiles(self):
        """M past the decode threshold exercises tile_m=128."""
        self._check(E=4, D=128, F=384, M=512)

    def test_int4_midsize_f_shape(self):
        """INT4 half-split packings at the midsize F=2816: packed D/2=128
        rows (sublane dim) + blocked F; in-register nibble unpack on real
        Mosaic when TPU-gated."""
        self._check(E=4, D=256, F=2816, M=24, bits=4)

    def test_int4_odd_f_full_block(self):
        """INT4 with F=320 (no 128-divisor -> full-dim F block)."""
        self._check(E=4, D=256, F=320, M=24, bits=4)
