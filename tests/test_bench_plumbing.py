"""bench.py must ALWAYS emit its one JSON line — the rounds 2/3 lesson.

The driver gives `python bench.py` an unknown kill deadline; rounds 2 and 3
both produced a null/absent artifact because stage hangs (dead tunnel compile
helper) stacked past it.  These tests pin the plumbing invariants that make
that impossible again:

  * under a tiny PDDP_BENCH_BUDGET the process still prints a well-formed
    final JSON line (with value=null and the skip bookkeeping) and exits 0
    well inside the budget's order of magnitude;
  * the generation-aware VMEM ceiling and the fused-Riccati "did it actually
    engage" probe (ADVICE r3) behave on the CPU/interpret backend.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_bench_emits_json_under_tiny_budget():
    # No stages requested, 1-second budget: preflight runs (and fails on the
    # CPU backend by design), every stage is skipped, and the final line must
    # still be valid JSON with the headline keys.
    env = dict(os.environ)
    env["PDDP_BENCH_STAGES"] = ""
    env["PDDP_BENCH_BUDGET"] = "1"
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(ROOT),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing"
    out = json.loads(lines[-1])
    assert out["metric"] == "kuka_n64_mpc_solves_per_s"
    assert set(out) >= {"metric", "value", "unit", "vs_baseline", "extra"}
    # CPU backend -> preflight refuses -> no LIVE device value; the headline
    # falls back to the freshest cached on-chip latency measurement and says
    # so (rounds 2-3 produced value=null here, which the artifact's readers
    # flagged as its biggest weakness)
    from benchmarks import stage_cache

    if any(stage_cache.get(n) for n in
           ("latency", "latency_pallas", "latency_priccati")):
        assert out["value"] is not None
        assert out["extra"]["latency_headline_path"].startswith("cached:")
        assert "stage cache" in out["extra"]["headline_source"]
    else:
        assert out["value"] is None

    for name in out["extra"].get("cached_stage_results", []):
        entry = out["extra"][f"{name}_cached"]
        assert {"result", "utc", "git_rev", "backend"} <= set(entry)
        assert entry["backend"] != "cpu"
        assert stage_cache.get(name) == entry


@pytest.mark.slow
def test_bench_worker_preflight_refuses_cpu():
    # Requesting a real stage on the CPU test backend: the device worker's
    # preflight must refuse (no CPU numbers in a TPU artifact), the retry
    # loop must respect the budget, and the final line must still be JSON.
    env = dict(os.environ)
    env["PDDP_BENCH_STAGES"] = "latency"
    env["PDDP_BENCH_BUDGET"] = "90"
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=280, env=env, cwd=str(ROOT),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads([ln for ln in proc.stdout.splitlines() if ln.strip()][-1])
    # no LIVE number: either a clearly-labelled cached headline or null
    if out["value"] is not None:
        assert out["extra"]["latency_headline_path"].startswith("cached:")
    assert out["extra"].get("device_unreachable") is True
    assert "latency" in out["extra"].get("stages_skipped", [])


def test_stage_cache_round_trip(tmp_path, monkeypatch):
    from benchmarks import stage_cache

    monkeypatch.setattr(stage_cache, "PATH", str(tmp_path / "sc.json"))
    stage_cache.record("latency", {"solves_per_s": 123.0}, backend="tpu")
    entry = stage_cache.get("latency")
    assert entry["result"] == {"solves_per_s": 123.0}
    assert entry["backend"] == "tpu"
    assert entry["utc"].endswith("Z")
    # CPU results must be refused — a TPU artifact must not inherit them
    stage_cache.record("latency", {"solves_per_s": 9.0}, backend="cpu")
    assert stage_cache.get("latency")["result"] == {"solves_per_s": 123.0}


def test_vmem_limit_is_generation_aware():
    from parallel_ddp_tpu.ops.tpu_limits import pallas_vmem_limit_bytes

    lim = pallas_vmem_limit_bytes()
    # on the test CPU backend the fallback is the 128 MiB-class ceiling
    assert lim == 100 * 2**20
    # and it can never exceed the ceiling the kernels were tuned with
    assert lim <= 100 * 2**20


def test_fused_riccati_active_probe():
    from parallel_ddp_tpu.ops.pallas_riccati import fused_riccati_active
    from parallel_ddp_tpu.presets import kuka_ee

    cfg = kuka_ee().cfg
    assert fused_riccati_active(cfg, 14, 7) is True
    # past the lane tile the factory falls back -> probe must say so
    assert fused_riccati_active(cfg, 14, 7, mb=2048) is False
    # a state dim past the VMEM working-set gate also falls back (a 10-dof
    # URDF plant: per-step channel slabs exceed the 13 MiB single-instance
    # budget, ops/pallas_riccati.py _build)
    assert fused_riccati_active(cfg, 20, 9) is False


def test_latency_guard_refuses_jitter_dominated_walls():
    # the chained-latency protocol must refuse to turn tunnel noise into a
    # solves/s number (r5: a loaded tunnel once recorded 1e6 solves/s)
    from benchmarks.latency import resolvable

    assert resolvable(0.1, 0.001)          # 100 ms chain, 1 ms jitter: fine
    assert not resolvable(0.002, 0.001)    # within 3x jitter: refuse
    assert not resolvable(-0.003, 0.001)   # RTT swallowed the chain: refuse
    assert not resolvable(40e-6, 1e-6)     # below the absolute floor: refuse
    assert resolvable(60e-6, 1e-6)
