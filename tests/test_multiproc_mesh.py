"""Cross-process mesh validation (parallel/multiproc.py).

The one place collectives actually cross an OS-process boundary: 2
jax.distributed processes x 4 virtual CPU devices run the GSPMD forward
(EP psum over a dp-spanning mesh) and the paged ring attention (ppermute
around a process-crossing ring).  Everything else in the suite uses one
process's virtual devices — this is the strongest available check of the
multi-host collective path SCALING.md models (SURVEY §4 "multi-node
without a cluster"; VERDICT r3 #8).
"""

from vllm_from_scratch_tpu.parallel.multiproc import run_multiproc


def test_two_process_mesh_forward_and_ring():
    result = run_multiproc(num_procs=2, devices_per_proc=4)
    assert result.get("ok"), result
    assert result["fwd_identical_across_processes"]
    assert result["fwd_matches_single_process_oracle"]
    assert result["ring_crossproc_matches_merge"]
    assert result["global_devices"] == 8
