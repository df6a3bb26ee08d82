"""Test harness: force the CPU backend with 8 virtual devices.

Unit tests run on any machine (no TPU needed), and multi-chip sharding tests
run against a virtual 8-device mesh — the test strategy SURVEY.md §4 calls
for.  Real-device runs: set VFS_TPU_REAL_DEVICE=1 before pytest.

Note: env vars are not enough here.  The session's sitecustomize registers
the axon TPU-tunnel PJRT plugin and calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
overriding JAX_PLATFORMS.  We must update the jax config back *after* import
but *before* any backend initializes — conftest import time is exactly that
window.
"""

import os

if not os.environ.get("VFS_TPU_REAL_DEVICE"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    # Persistent compile cache: engine tests compile many (batch, chunk,
    # table) buckets; caching them across runs cuts suite wall time ~3-4x
    # after the first pass (VERDICT r1 #9).  Safe default mode only (the
    # "all" XLA-cache mode stores machine-specific CPU AOT code).
    cache_dir = os.environ.get(
        "VFS_JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    if cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # No XLA-level entries: on CPU those are machine-feature-specific
        # AOT code (loud warnings + potential SIGILL on a different host).
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
