"""TPU-gated engine e2e: real-Mosaic generate == CPU generate, exact tokens.

Part of the once-per-round on-chip pass (CLAUDE.md):

    VFS_TPU_REAL_DEVICE=1 python -m pytest tests/test_tpu_engine_e2e.py -q

The per-kernel equivalence tests (test_pallas_kernels, test_moe) check each
Pallas op against its XLA oracle on real Mosaic; this test closes the gap
VERDICT r2 #10 named — an ENGINE regression (bucketing, scan staging,
cache donation, async pipeline) that every kernel test would miss.  The
CPU reference runs in a subprocess (one process holds one backend).

Exactness rationale: the child runs f32 activations under matmul
precision "highest", so cross-backend rounding is ~1e-6 relative — far
below the ~1e-2 top-2 logit gaps of a random-init 1000-vocab — while the
regression class this exists for (wrong slot mapping, stale cache,
misindexed layer, async-chain corruption) corrupts logits at O(1).  (The
original bf16 child flaked in r3 on a near-tie argmax flip; see
tpu_e2e_child.py's docstring.)
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("VFS_TPU_REAL_DEVICE"),
    reason="real-TPU gated (VFS_TPU_REAL_DEVICE=1)",
)

HERE = os.path.dirname(os.path.abspath(__file__))


def test_engine_generate_matches_cpu():
    import jax

    assert jax.default_backend() != "cpu", "gated run must see the real TPU"

    from tests.tpu_e2e_child import build_and_generate

    tpu_out = build_and_generate()

    env = dict(os.environ)
    env.pop("VFS_TPU_REAL_DEVICE", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "tpu_e2e_child.py")],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(HERE),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    cpu_out = None
    for line in proc.stdout.splitlines():
        if line.startswith("E2EJSON "):
            cpu_out = json.loads(line[len("E2EJSON "):])
    assert cpu_out is not None, proc.stdout[-2000:]
    cpu_out = {int(k): v for k, v in cpu_out.items()}
    assert tpu_out == cpu_out
