"""benchmarks/phases.py plumbing: the per-phase programs build, run, and
report every phase the reference archives (test/WAFR_fig8.py:8-12).

Tiny shapes (N=16, M=2, A=4 — the test_kuka_solver.py config, so the solve
executable is already in the persistent CPU cache) and a 2-long chain: this
checks program construction and result structure, not speed.
"""

from __future__ import annotations

import pytest

from benchmarks.phases import REFERENCE_PHASE_MS, phases_result


@pytest.mark.slow
def test_phases_report_structure():
    r = phases_result(core="auto", pallas_riccati=False, k_chain=2, reps=2,
                      num_time_steps=16, m_blocks=2, num_alpha=4)
    assert r["metric"] == "kuka_n64_phase_total_ms_per_iter"
    phases = r["extra"]["phases"]
    assert set(phases) == set(REFERENCE_PHASE_MS)
    for name, p in phases.items():
        assert p["ours_ms_per_iter"] >= 0.0
        assert p["reference_ms_per_solve"] == REFERENCE_PHASE_MS[name]
    assert r["value"] >= 0.0
    assert r["extra"]["ours_x6_iters_ms"] >= r["value"]
