"""Golden-anchored convergence semantics for the canonical WAFR Kuka solve.

scripts/gen_convergence_golden.py archives, for a fixed seed set of the
reference's benchmark problem (Kuka EE, N=64, 16 alphas, M=4 and M=1 —
examples/WAFR_iLQR_examples.cu:140-227), the converged cost, iteration count
and J/alpha traces on the CPU backend.  Re-running a case here must reproduce
them: a drift in converged J or in the accepted-alpha pattern means the
SOLVER SEMANTICS changed (cost weights, defect handling, z-window, rho
schedule...), which the round-over-round perf numbers would silently absorb
(VERDICT r4 weak #6).

Tolerances: same backend + same code must land on the same fixed point; we
allow tiny fp slack for XLA version/layout drift but pin iters and alphas
exactly.
"""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "benchmarks", "artifacts",
                      "convergence_golden.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="golden file missing — run scripts/gen_convergence_golden.py",
)


def _golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["kuka_ee_n64_m4_seed0",
                                  "kuka_ee_n64_m1_seed0"])
def test_golden_case_reproduces(name):
    import sys

    sys.path.insert(0, os.path.join(HERE, ".."))
    from scripts.gen_convergence_golden import run_case

    g = _golden()["cases"][name]
    r = run_case(g["m_blocks"], g["seed"])

    assert r["iters"] == g["iters"], (name, r["iters"], g["iters"])
    assert r["alpha_trace"] == g["alpha_trace"], name
    np.testing.assert_allclose(r["J_final"], g["J_final"], rtol=1e-4,
                               err_msg=name)
    np.testing.assert_allclose(np.asarray(r["J_trace"]),
                               np.asarray(g["J_trace"]), rtol=1e-3,
                               err_msg=name)


def test_golden_file_sane():
    """Fast tier: the archived golden file itself is self-consistent —
    costs drop monotonically to J_final, alpha indices are in range."""
    g = _golden()
    assert g["cases"], "empty golden file"
    for name, c in g["cases"].items():
        jt = np.asarray(c["J_trace"], np.float64)
        assert jt[0] == pytest.approx(c["J0"], rel=1e-6)
        assert jt[-1] == pytest.approx(c["J_final"], rel=1e-3), name
        # accepted-J trace is non-increasing (solver restores on reject)
        assert np.all(np.diff(jt) <= 1e-3 * np.maximum(jt[:-1], 1.0)), name
        assert c["J_final"] < c["J0"], name
        # -1 marks a rejected iteration (no alpha passed the z-window /
        # defect tests) — legitimate; accepted entries index the 16 alphas
        assert all(-1 <= a < 16 for a in c["alpha_trace"]), name
        assert 1 <= c["iters"] <= g["max_iter"], name
