"""Speed-of-light (roofline) analysis of the flagship programs.

The reference's performance story is wall-clock tables (WAFR_iLQR_examples.cu:
122-227); it never relates them to hardware limits.  Here each headline
program is lowered once and XLA's own cost model (`compiled.cost_analysis()`)
reports its FLOPs and HBM traffic; against the chip's peak FLOP/s and memory
bandwidth that gives the speed-of-light time

    t_sol = max(flops / peak_flops, bytes / hbm_bw)    (per dispatch)

plus a dispatch-floor estimate n_kernels * t_launch for latency-bound
programs (the iLQR step is hundreds of TINY ops: at N=64, n=14 the whole
Riccati sweep moves ~100 KB, so the bound that matters is the launch floor,
not the MXU).  On a TPU backend the measured time is reported as % of the
larger bound; off-TPU only the static analysis is printed.

Run: python benchmarks/roofline.py [latency batched rbd]
"""

from __future__ import annotations

import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, ".")

# chip model: (peak fp32-accumulate MXU FLOP/s, HBM bytes/s, per-kernel launch s)
# v5e: 197 TFLOP/s bf16 (~98 fp32-acc), 819 GB/s HBM.  Launch overhead ~2 us
# per dispatched kernel is the empirical TPU figure (pallas_guide).
CHIPS = {
    "v5e": dict(flops=98e12, hbm=819e9, launch=2e-6),
    "v5p": dict(flops=229e12, hbm=2765e9, launch=2e-6),
    "cpu": dict(flops=1e11, hbm=50e9, launch=5e-7),
}


def _kernel_count(compiled) -> int:
    """Dispatched-computation estimate: instruction count of the ENTRY
    computation of the optimized HLO (each top-level instruction is roughly
    one device dispatch after fusion).  Control-flow body computations are
    NOT counted (a while-loop's body re-dispatches per iteration), so this
    is a floor for loopy programs."""
    try:
        txt = compiled.as_text()
    except Exception:
        return 0
    n = 0
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            s = line.strip()
            # instruction definitions look like "%name = type op(...)";
            # skip parameters/constants and tuple/copy plumbing — those are
            # not device dispatches (a while-loop entry is mostly
            # get-tuple-element glue around the while op)
            if " = " in s and not s.startswith("//"):
                if any(f"{op}(" in s for op in
                       ("parameter", "constant", "tuple", "get-tuple-element",
                        "bitcast", "copy")):
                    continue
                n += 1
    return max(n, 1)


def analyze(name: str, lowered, chip: str, measured_s: float | None = None,
            per: int = 1):
    comp = lowered.compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    hw = CHIPS[chip]
    t_flops = flops / hw["flops"]
    t_mem = byts / hw["hbm"]
    nk = _kernel_count(comp)
    t_launch = nk * hw["launch"]
    t_sol = max(t_flops, t_mem)
    bound = ("launch" if t_launch > t_sol else
             ("memory" if t_mem >= t_flops else "compute"))
    out = {
        "program": name,
        "chip": chip,
        "gflops": flops / 1e9,
        "mbytes": byts / 1e6,
        "kernels_est": nk,
        "t_sol_us": t_sol * 1e6,
        "t_launch_floor_us": t_launch * 1e6,
        "bound": bound,
    }
    if measured_s is not None:
        out["measured_us"] = measured_s * 1e6
        out["pct_of_sol"] = 100.0 * max(t_sol, t_launch) / measured_s
        if per > 1:
            out["measured_us_per_item"] = measured_s * 1e6 / per
    return out


def _measure(fn, args, reps=10):
    from benchmarks.measure import rtt_corrected_median_s

    return rtt_corrected_median_s(fn, args, reps=reps)


def _trace_validation(kernels_est: int) -> dict:
    """The 'validated against trace' row (VERDICT r2 item 7): compare the
    static ENTRY-instruction dispatch floor against the per-solve device
    event count measured by benchmarks/profile_trace.py on a real chip
    (archived at benchmarks/artifacts/profile_trace_*.json)."""
    import glob
    import os

    arts = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts", "profile_trace_*.json")))
    if not arts:
        return {}
    with open(arts[-1]) as f:
        t = json.load(f)
    if "dispatches_per_solve" not in t:
        return {}
    return {
        "trace_validation": {
            "artifact": os.path.basename(arts[-1]),
            "backend": t.get("backend"),
            "measured_dispatches_per_solve": t["dispatches_per_solve"],
            "static_floor_kernels": kernels_est,
            "floor_coverage": (round(kernels_est /
                                     t["dispatches_per_solve"], 3)
                               if t["dispatches_per_solve"] else None),
            "measured_device_busy_us_per_solve": t.get("busy_us_per_solve"),
        }
    }


def main(stages):
    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.presets import ee_goal, kuka_ee
    from parallel_ddp_tpu.solver import make_ilqr_solver

    backend = jax.default_backend()
    chip = "v5e" if backend == "tpu" else "cpu"
    on_tpu = backend == "tpu"
    results = []

    prob = kuka_ee()
    goal = ee_goal([0.0, -0.55, 0.35])
    n = prob.cfg.num_time_steps

    if "latency" in stages:
        cfg = dataclasses.replace(prob.cfg, max_iter=6, tol_cost=0.0)
        solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
        x0 = jnp.zeros((n, 14), jnp.float32)
        u0 = jnp.zeros((n, 7), jnp.float32)
        low = solver.lower(x0, u0, goal, None, initial_rollout=True)
        meas = (_measure(lambda a, b: solver(a, b, goal, None,
                                             initial_rollout=True), (x0, u0))
                if on_tpu else None)
        r = analyze("kuka_ee_n64_6iter_solve", low, chip, meas)
        r.update(_trace_validation(r["kernels_est"]))
        results.append(r)

    if "batched" in stages:
        from jax.sharding import Mesh

        from parallel_ddp_tpu.parallel.sharding import make_batched_solver

        B = 256
        cfg = dataclasses.replace(prob.cfg, max_iter=6, tol_cost=0.0)
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        bsolve = make_batched_solver(prob.plant, prob.cost, cfg, mesh)
        x0s = jnp.zeros((B, n, 14), jnp.float32)
        u0s = jnp.zeros((B, n, 7), jnp.float32)
        goals = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + np.shape(a)), goal
        )
        low = bsolve.lower(x0s, u0s, goals)
        meas = (_measure(lambda a, b: bsolve(a, b, goals), (x0s, u0s), reps=5)
                if on_tpu else None)
        results.append(
            analyze(f"kuka_ee_batched_b{B}", low, chip, meas, per=B)
        )

    if "rbd" in stages:
        from parallel_ddp_tpu.models.kuka.soa import KukaSoA
        from parallel_ddp_tpu.models.kuka.rbd import KukaRBD

        B = 4096
        core = KukaSoA() if on_tpu else KukaRBD(ee_type=1, gravity=9.81)
        f = jax.jit(jax.vmap(core.forward_dynamics))
        xs = jnp.zeros((B, 14), jnp.float32)
        us = jnp.zeros((B, 7), jnp.float32)
        low = f.lower(xs, us)
        meas = _measure(f, (xs, us)) if on_tpu else None
        results.append(analyze(f"rbd_dynamics_b{B}", low, chip, meas, per=B))

    for r in results:
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main(sys.argv[1:] or ["latency", "batched", "rbd"])
