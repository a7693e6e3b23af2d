"""Driver benchmark: ONE JSON line with the framework's three headline metrics.

  1. latency      — warm-started Kuka N=64 EE solve rate (vs the reference's
                    ~97 Hz MPC replan rate, test/WAFR_fig8.py:7);
  2. batched      — scenario-batched solves/s per chip (BASELINE.json's own
                    scale-out metric; benchmarks/scaling.py);
  3. fig8         — closed-loop figure-8 avg EE tracking error from the fused
                    device loop (vs 0.0878 m, test/WAFR_fig8.py:5-6;
                    benchmarks/fig8.py --device-loop semantics).

Primary metric stays the round-1 headline (latency solves/s) for cross-round
comparability; the other two land in "extra" so the driver artifact records
them (VERDICT r1 next-round items 3 and 4).

MEASUREMENT INTEGRITY on the axon dev TPU (a remote chip behind a ~24 ms
network tunnel): in a fresh process dispatches are pipelined and
`block_until_ready` acknowledges locally — timing those measures enqueue, not
execution.  Every stage therefore (1) forces one result read, which flips the
process into synchronous mode where every dispatch waits for true remote
completion, (2) measures the tunnel RTT with a trivial kernel, and
(3) subtracts the RTT from wall times (batched stage additionally chains K
solves inside one program so the RTT amortizes over K*B solves).
"""

import dataclasses
import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

BASELINE_SOLVES_PER_S = 97.0  # reference: median 10.29 ms/solve (WAFR_fig8.py:7)
N_ITERS_PER_SOLVE = 6
REPS = 20


def latency_stage():
    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.presets import ee_goal, kuka_ee
    from parallel_ddp_tpu.solver import make_ilqr_solver

    prob = kuka_ee()
    # fixed iteration count (tol_cost=0 disables the early exit so every solve
    # does the same work, like a time-budgeted MPC solve at steady state)
    cfg = dataclasses.replace(prob.cfg, max_iter=N_ITERS_PER_SOLVE, tol_cost=0.0)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)

    rng = np.random.default_rng(0)
    n = cfg.num_time_steps
    goal = ee_goal([0.0, -0.55, 0.35])

    xs = [jnp.asarray(rng.normal(0, 0.3, (n, 14)).astype(np.float32))
          for _ in range(REPS)]
    us = [jnp.asarray(rng.normal(0, 1.0, (n, 7)).astype(np.float32))
          for _ in range(REPS)]

    # compile + switch the process into synchronous (honest) dispatch mode by
    # reading one result
    out = solver(xs[0], us[0], goal, initial_rollout=True)
    _ = float(out.J)

    # tunnel round-trip time via a trivial kernel
    triv = jax.jit(lambda z: z + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(triv(z))
    rtts = []
    for _ in range(12):
        t0 = time.perf_counter()
        jax.block_until_ready(triv(z))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        out = solver(xs[i], us[i], goal, initial_rollout=True)
        jax.block_until_ready(out.J)
        times.append(time.perf_counter() - t0)

    med = float(np.median(times))
    per_solve = max(med - rtt, 1e-6)
    return 1.0 / per_solve, per_solve * 1e3


def main():
    extra = {}

    solves_per_s = None
    try:
        solves_per_s, per_solve_ms = latency_stage()
        extra["latency_per_solve_ms"] = round(per_solve_ms, 3)
    except Exception:
        traceback.print_exc()

    try:
        from benchmarks.scaling import batched_result

        batched = batched_result(batches=(256,), iters=N_ITERS_PER_SOLVE, reps=6)
        extra["batched_solves_per_s_per_chip"] = batched["value"]
        extra["batched_vs_baseline"] = batched["vs_baseline"]
        extra["batched_detail"] = batched["extra"]
    except Exception:
        traceback.print_exc()

    try:
        from benchmarks.timedyn import microbench_result

        dyn = microbench_result(batch=4096, reps=8)
        extra["rbd_ns_per_eval"] = dyn["extra"]
    except Exception:
        traceback.print_exc()

    try:
        from benchmarks.fig8 import device_loop_result

        fig8 = device_loop_result(duration=10.0, reps=1, iters=N_ITERS_PER_SOLVE)
        extra["fig8_avg_ee_tracking_error_m"] = fig8["value"]
        extra["fig8_vs_baseline_0.0878m"] = fig8["vs_baseline"]
        extra["fig8_ok_rate"] = fig8["extra"]["ok_rate"]
        extra["fig8_per_control_step_ms"] = fig8["extra"]["per_control_step_ms"]
    except Exception:
        traceback.print_exc()

    value = round(solves_per_s, 2) if solves_per_s is not None else None
    print(
        json.dumps(
            {
                "metric": "kuka_n64_mpc_solves_per_s",
                "value": value,
                "unit": "solves/s (6-iter warm EE solve, N=64, M=4, 16 alphas; "
                        "RTT-corrected sync timing)",
                "vs_baseline": (round(value / BASELINE_SOLVES_PER_S, 3)
                                if value is not None else None),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
