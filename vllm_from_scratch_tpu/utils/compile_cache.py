"""Persistent XLA compile cache for serving/bench processes.

The engine's warmup precompiles ~36 bucketed programs; over the axon
remote-compile tunnel that costs ~200 s warm and ~500 s cold per process
(benchmarks/RESULTS.md r3).  A production server restart must not re-pay
compiles it paid yesterday — vLLM solves this with torch.compile /
CUDA-graph caches (ref: BLOG_PART3_V2.md:1630-1645, capture-cost
discussion); the JAX analogue is the persistent compilation cache, which
stores serialized PJRT executables keyed by (HLO, compile options,
backend).  Tests already use it (tests/conftest.py); this helper brings
the same cache to bench/serving entry points.

If the backend's PJRT client can't serialize executables (some plugin
transports), jax degrades to a warning and compiles as before — enabling
the cache is never worse than not.
"""

import os


def enable_persistent_cache(cache_dir: str = None) -> str:
    """Enable the JAX persistent compile cache.  Call AFTER importing jax
    but before the first compilation.  Returns the cache directory used.

    Env overrides: VFS_JAX_CACHE_DIR (set to "0" to disable;
    VFS_JAX_CACHE_FORCE=1 enables even on the axon backend).
    """
    import jax

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cache_dir = os.environ.get(
        "VFS_JAX_CACHE_DIR",
        cache_dir or os.path.join(repo_root, ".jax_cache"))
    if cache_dir == "0":
        return ""
    # The axon remote-compile tunnel cannot serialize executables: the
    # cache writes nothing, adds ~10 s per compile, and intermittently
    # hangs a trivial jit for minutes (measured r5 host).  The tunnel's
    # remote-compile server keeps its own HLO cache, so cross-process
    # warm starts come for free there; only local backends (cpu tests,
    # real local TPUs) benefit from the JAX persistent cache.
    if os.environ.get("VFS_JAX_CACHE_FORCE") != "1":
        try:
            if jax.devices()[0].platform == "axon":
                return ""
        except Exception:
            pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # Only the jit-level executable cache: XLA-level entries ("all") store
    # machine-feature-specific AOT code on CPU (SIGILL risk on another
    # host); the executable cache alone removes the recompiles we care
    # about.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    return cache_dir
