"""Smoke tests for the runnable walkthroughs (demo.py) — the reference's
__main__ suites are part of its surface, so ours must not rot."""

import pytest

from vllm_from_scratch_tpu import demo


@pytest.mark.parametrize("section", ["paged", "prefix", "moe", "mla", "pd",
                                     "eplb", "pd_sched", "cp", "mixed"])
def test_demo_section_runs(section, capsys):
    demo.SECTIONS[section]()
    out = capsys.readouterr().out
    assert "==" in out  # printed its banner and didn't crash
