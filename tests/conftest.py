"""Test harness: force the CPU backend with 8 virtual devices.

Unit tests run on any machine (no TPU needed), and multi-chip sharding tests
run against a virtual 8-device mesh — the test strategy SURVEY.md §4 calls
for.  Real-device runs: set VFS_TPU_REAL_DEVICE=1 before pytest.
"""

import os

if not os.environ.get("VFS_TPU_REAL_DEVICE"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
