"""Profile-validate the roofline's dispatch model against a real trace.

benchmarks/roofline.py estimates the dispatch count of the headline solve from
the optimized HLO's ENTRY instruction list — an acknowledged FLOOR for loopy
programs (the solver's while-loop body re-dispatches per iteration).  This
tool captures an actual `jax.profiler` trace of K warm solves, counts the
device-side events in the XSpace protobuf, and reports the measured
dispatches-per-solve next to the roofline estimate, so the launch-floor
claims rest on a real profile instead of a static guess (VERDICT r2 item 7).

The XSpace (.xplane.pb) is parsed with a ~60-line protobuf wire-format walker
instead of the tensorboard profiler plugin (not installed here): we only need
plane/line names, event counts, event durations and the event-name table.
Schema: tsl/profiler/protobuf/xplane.proto (XSpace.planes=1; XPlane.name=2,
.lines=3, .event_metadata=4; XLine.name=2, .events=4; XEvent.metadata_id=1,
.duration_ps=3; XEventMetadata map entry value.name=2).

Run: python benchmarks/profile_trace.py [--solves K] [--out artifact.json]
On CPU backends it still runs (the host plane validates the parser); the
dispatch comparison is only meaningful against the TPU device plane.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import sys
import tempfile
from collections import Counter

sys.path.insert(0, ".")


# ---------------- minimal protobuf wire-format walker ----------------

def _varint(buf, i):
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        f, w = tag >> 3, tag & 7
        if w == 0:
            v, i = _varint(buf, i)
        elif w == 1:
            v, i = buf[i:i + 8], i + 8
        elif w == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif w == 5:
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {w} at byte {i}")
        yield f, w, v


def parse_xspace(data: bytes):
    """XSpace bytes -> [{name, lines:[{name, n_events, busy_ps}],
    event_names: Counter, event_busy_ps: {name: ps}}] (one dict per XPlane)."""
    planes = []
    for f, w, v in _fields(data):
        if f != 1 or w != 2:
            continue
        plane = {"name": "", "lines": [], "event_names": Counter(),
                 "event_busy_ps": Counter()}
        meta_names = {}
        for pf, pw, pv in _fields(v):
            if pf == 2 and pw == 2:
                plane["name"] = pv.decode("utf-8", "replace")
            elif pf == 4 and pw == 2:
                # map<int64, XEventMetadata> entry: key=1, value=2
                k, name = None, ""
                for mf, mw, mv in _fields(pv):
                    if mf == 1 and mw == 0:
                        k = mv
                    elif mf == 2 and mw == 2:
                        for ef, ew, ev in _fields(mv):
                            if ef == 2 and ew == 2:
                                name = ev.decode("utf-8", "replace")
                if k is not None:
                    meta_names[k] = name
            elif pf == 3 and pw == 2:
                line = {"name": "", "n_events": 0, "busy_ps": 0, "_mids": []}
                for lf, lw, lv in _fields(pv):
                    if lf == 2 and lw == 2:
                        line["name"] = lv.decode("utf-8", "replace")
                    elif lf == 4 and lw == 2:
                        line["n_events"] += 1
                        dur, mid = 0, None
                        for ef, ew, ev in _fields(lv):
                            if ef == 1 and ew == 0:
                                mid = ev
                            elif ef == 3 and ew == 0:
                                dur = ev
                        if mid is not None:
                            line["_mids"].append((mid, dur))
                        line["busy_ps"] += dur
                plane["lines"].append(line)
        for line in plane["lines"]:
            for mid, dur in line.pop("_mids"):
                nm = meta_names.get(mid, f"#{mid}")
                plane["event_names"][nm] += 1
                plane["event_busy_ps"][nm] += dur
        planes.append(plane)
    return planes


# ---------------- phase attribution ----------------

# source-file → solver phase (the reference's per-phase timing vocabulary:
# bp/fs/sim/nis arrays, DDPWrappers.cuh:54-105).  Fusions are attributed by
# their root op's source_file in the optimized HLO metadata — no named_scope
# annotations needed, so the production executable (and its compile cache
# entry) is byte-identical to what users run.
_PHASE_OF_FILE = (
    ("parallel/backward.py", "bp"),
    ("ops/pallas_riccati.py", "bp"),
    ("ops/linalg.py", "bp"),
    ("parallel/forward.py", "forward"),
    ("ops/pallas_rollout.py", "forward"),
    ("models/", "derivs"),
    ("ops/pallas_rbd.py", "derivs"),
    ("ops/integrators.py", "derivs"),
    ("costs/", "cost"),
    ("solver.py", "nis"),
    ("mpc/", "nis"),
)


def _phase_of(src: str) -> str:
    for frag, ph in _PHASE_OF_FILE:
        if frag in src:
            return ph
    return "other"


def _hlo_source_map(hlo_text: str) -> dict:
    """Optimized-HLO instruction name -> phase bucket.

    Two attribution levels: an instruction with its own source_file metadata
    maps directly; a fusion/call WITHOUT one (the compiler drops metadata on
    many fusion roots — ~half the device busy time in the r5 traces) inherits
    the majority phase of the computation it `calls=`, whose member
    instructions usually kept their metadata."""
    import re
    from collections import Counter, defaultdict

    instr = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s")
    header = re.compile(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->")
    src_re = re.compile(r"source_file=\"([^\"]+)\"")
    calls_re = re.compile(r"calls=%?([\w.\-]+)")

    direct = {}          # instr name -> phase (own metadata)
    calls = {}           # instr name -> called computation name
    members = defaultdict(Counter)   # computation name -> member phase votes
    comp = None
    for line in hlo_text.splitlines():
        h = header.match(line)
        if h and line.rstrip().endswith("{"):
            comp = h.group(1)
            continue
        m = instr.match(line)
        if not m:
            continue
        name = m.group(1)
        s = src_re.search(line)
        if s:
            ph = _phase_of(s.group(1))
            direct[name] = ph
            if comp is not None:
                members[comp][ph] += 1
        else:
            c = calls_re.search(line)
            if c:
                calls[name] = c.group(1)

    out = dict(direct)
    for name, comp_name in calls.items():
        votes = members.get(comp_name)
        if name not in out and votes:
            out[name] = votes.most_common(1)[0][0]
    return out


def phase_breakdown(event_busy_ps: Counter, hlo_text: str, solves: int):
    """Join trace event busy-times with the HLO source map -> per-phase
    device-busy µs per solve (the algTrace per-phase analog, in-solve)."""
    smap = _hlo_source_map(hlo_text)
    buckets: Counter = Counter()
    unattributed = 0
    un_top: Counter = Counter()
    for name, ps in event_busy_ps.items():
        # TPU op-line event metadata names are the full HLO instruction TEXT
        # ("%fusion.12 = f32[...] fusion(...)"): the instruction name is the
        # first token, minus the leading '%'
        key = name.split(" ", 1)[0].lstrip("%")
        if key.startswith("jit_"):
            # whole-program module event (e.g. "jit_solve(...)"): the SUM of
            # everything else on the plane, not a component — excluding it is
            # what makes the buckets add up to ~one solve's busy time
            continue
        if key.startswith(("copy-start", "copy-done", "copy.")) or key == "copy":
            # async HBM copies (while-loop buffer movement) — a real phase of
            # their own, invisible in any source_file
            buckets["copies"] += ps
            continue
        ph = smap.get(key)
        if ph is None:
            unattributed += ps
            un_top[key] += ps
            continue
        buckets[ph] += ps
    out = {ph: round(ps / 1e6 / solves, 1) for ph, ps in buckets.items()}
    out["unattributed"] = round(unattributed / 1e6 / solves, 1)
    # diagnostics: where the unattributed time actually sits
    out["unattributed_top"] = [
        [k, round(ps / 1e6 / solves, 1)] for k, ps in un_top.most_common(6)]
    return out


# ---------------- the measurement ----------------

def profile_headline(solves: int = 8, iters: int = 6, core: str = "auto",
                     pallas_riccati: bool = False):
    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.presets import ee_goal, kuka_ee
    from parallel_ddp_tpu.solver import make_ilqr_solver

    prob = kuka_ee(core=core)
    cfg = dataclasses.replace(prob.cfg, max_iter=iters, tol_cost=0.0,
                              pallas_riccati=pallas_riccati)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    n = cfg.num_time_steps
    goal = ee_goal([0.0, -0.55, 0.35])
    x0 = jnp.zeros((n, 14), jnp.float32)
    u0 = jnp.zeros((n, 7), jnp.float32)

    # Lower + compile ONCE and trace that exact executable.  Tracing via
    # `solver(...)` uses the jit cache's own executable, whose fusion
    # numbering can differ from a separately re-lowered compile — the HLO
    # source-map join below then attributes nothing (early-r5 artifacts hit
    # exactly that: phase_busy_us_per_solve == {"unattributed": ...}).
    low = solver.lower(x0, u0, goal, None, initial_rollout=True)
    comp = low.compile()

    # warm up outside the trace
    out = comp(x0, u0, goal, None)
    jax.block_until_ready(out.J)

    tmp = tempfile.mkdtemp(prefix="pddp_trace_")
    jax.profiler.start_trace(tmp)
    for _ in range(solves):
        out = comp(x0, u0, goal, None)
        jax.block_until_ready(out.J)
    jax.profiler.stop_trace()

    pbs = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        return {"error": f"no xplane.pb under {tmp}"}
    with open(pbs[0], "rb") as f:
        planes = parse_xspace(f.read())

    # device plane: TPU if present, else the busiest non-host plane, else host
    def plane_summary(p):
        lines = {
            l["name"]: {"n_events": l["n_events"],
                        "busy_us": round(l["busy_ps"] / 1e6, 1)}
            for l in p["lines"] if l["n_events"]
        }
        # the op-granularity line is the dispatch analog; a module/step line
        # counts whole-program executions and would understate it
        op_lines = [v for k, v in lines.items() if "Ops" in k or "ops" in k]
        n_ev = (sum(v["n_events"] for v in op_lines) if op_lines
                else sum(l["n_events"] for l in p["lines"]))
        busy = (sum(v["busy_us"] for v in op_lines) * 1e6 if op_lines
                else sum(l["busy_ps"] for l in p["lines"]))
        return {
            "plane": p["name"],
            "n_events": n_ev,
            "busy_us": busy / 1e6,
            "lines": lines,
            "top_ops": p["event_names"].most_common(12),
        }

    device, device_raw = None, None
    for p in planes:
        if "TPU" in p["name"] and p["lines"]:
            if device is None or (sum(l["n_events"] for l in p["lines"]) >
                                  device["n_events"]):
                device, device_raw = plane_summary(p), p
    if device is None:
        cands = [(plane_summary(p), p) for p in planes if p["lines"]]
        cands.sort(key=lambda s: -s[0]["n_events"])
        if cands:
            device, device_raw = cands[0]
        else:
            device = {"plane": "none", "n_events": 0,
                      "busy_us": 0.0, "top_ops": []}

    device["solves"] = solves
    device["dispatches_per_solve"] = round(device["n_events"] / solves, 1)
    device["busy_us_per_solve"] = round(device["busy_us"] / solves, 1)
    device["backend"] = jax.default_backend()
    device["core"] = core
    device["pallas_riccati"] = pallas_riccati

    # the roofline's static floor for the same program, for the delta row
    from benchmarks.roofline import CHIPS, _kernel_count

    nk = _kernel_count(comp)

    # in-solve per-phase device time (VERDICT r4 next #7): attribute each
    # device event's busy time to a solver phase via the optimized HLO's
    # source_file metadata — the algTrace bp/fs/sim/nis analog measured
    # INSIDE the production one-jit solve, not as separate programs
    if device_raw is not None:
        try:
            device["phase_busy_us_per_solve"] = phase_breakdown(
                device_raw["event_busy_ps"], comp.as_text(), solves)
        except Exception as e:  # noqa: BLE001 — attribution is best-effort
            device["phase_busy_us_per_solve"] = {"error": repr(e)[:200]}
    chip = "v5e" if device["backend"] == "tpu" else "cpu"
    device["roofline_kernels_est"] = nk
    device["roofline_launch_floor_us"] = round(
        nk * CHIPS[chip]["launch"] * 1e6, 1)
    device["measured_launch_floor_us"] = round(
        device["n_events"] / solves * CHIPS[chip]["launch"] * 1e6, 1)
    device["est_vs_measured"] = (
        round(nk / device["dispatches_per_solve"], 3)
        if device["dispatches_per_solve"] else None)
    return device


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--solves", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--out", default=None,
                    help="also write the result JSON to this path")
    ap.add_argument("--core", default="auto",
                    choices=["auto", "soa", "rbd", "pallas"])
    ap.add_argument("--priccati", action="store_true",
                    help="profile the fused Pallas block-Riccati path")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize pins "
                         "jax_platforms explicitly, so JAX_PLATFORMS=cpu in "
                         "the environment is ignored — see tests/conftest.py)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = profile_headline(solves=args.solves, iters=args.iters,
                           core=args.core, pallas_riccati=args.priccati)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps(res))
