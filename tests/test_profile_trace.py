"""Unit tests for benchmarks/profile_trace.py's phase attribution — the
in-solve algTrace analog (reference per-phase timing arrays,
/root/reference/DDPHelpers/DDPWrappers.cuh:54-105).

The TPU-side trace run needs a device; these tests pin the pure logic that
turns (trace event busy-times, optimized HLO text) into the per-phase table:
direct source_file mapping, called-computation phase inheritance for
metadata-less fusions, module-event exclusion, and the async-copy bucket.
"""

from collections import Counter

from benchmarks.profile_trace import _hlo_source_map, phase_breakdown

HLO = """\
HloModule jit_solve, is_scheduled=true

%fused_computation.7 (p0: f32[4,14]) -> f32[4,14] {
  %p0 = f32[4,14] parameter(0)
  ROOT %add.1 = f32[4,14] add(%p0, %p0), metadata={op_name="jit(solve)/add" source_file="/repo/parallel_ddp_tpu/parallel/backward.py" source_line=10}
}

%fused_computation.9 (p0: f32[4,7]) -> f32[4,7] {
  %p0.1 = f32[4,7] parameter(0)
  %mul.2 = f32[4,7] multiply(%p0.1, %p0.1), metadata={source_file="/repo/parallel_ddp_tpu/models/kuka/soa.py" source_line=5}
  ROOT %sub.2 = f32[4,7] subtract(%mul.2, %p0.1), metadata={source_file="/repo/parallel_ddp_tpu/models/kuka/soa.py" source_line=6}
}

ENTRY %main (a: f32[4,14], b: f32[4,7]) -> f32[4,14] {
  %a = f32[4,14] parameter(0)
  %b = f32[4,7] parameter(1)
  %fusion.1 = f32[4,14] fusion(%a), kind=kLoop, calls=%fused_computation.7, metadata={source_file="/repo/parallel_ddp_tpu/parallel/backward.py" source_line=12}
  %fusion.2 = f32[4,7] fusion(%b), kind=kLoop, calls=%fused_computation.9
  ROOT %exp.1 = f32[4,14] exponential(%fusion.1), metadata={source_file="/repo/parallel_ddp_tpu/solver.py" source_line=99}
}
"""


def test_source_map_direct_and_inherited():
    smap = _hlo_source_map(HLO)
    # direct metadata
    assert smap["fusion.1"] == "bp"
    assert smap["exp.1"] == "nis"
    # no own metadata -> inherits majority phase of the called computation
    assert smap["fusion.2"] == "derivs"
    # members of fused computations attribute too
    assert smap["add.1"] == "bp"


def test_phase_breakdown_buckets_copies_and_drops_module_events():
    events = Counter({
        # event names on the TPU op lines are the full instruction text
        "%fusion.1 = f32[4,14] fusion(%a), kind=kLoop": 4_000_000,   # 4 us
        "%fusion.2 = f32[4,7] fusion(%b)": 2_000_000,
        "%exp.1 = f32[4,14] exponential(%fusion.1)": 1_000_000,
        "jit_solve(123456)": 50_000_000,        # module event: excluded
        "%copy-start.3 = ...": 3_000_000,       # async copy bucket
        "%mystery.op = f32[] add(...)": 800_000,  # -> unattributed
    })
    out = phase_breakdown(events, HLO, solves=2)
    assert out["bp"] == 2.0          # 4 us over 2 solves
    assert out["derivs"] == 1.0
    assert out["nis"] == 0.5
    assert out["copies"] == 1.5
    assert out["unattributed"] == 0.4
    assert out["unattributed_top"][0][0] == "mystery.op"
    # the module event must appear in NO bucket
    total = sum(v for k, v in out.items()
                if k not in ("unattributed_top",))
    assert total < 6.0
