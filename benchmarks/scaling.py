"""Scenario-batched solve throughput — the scale-out metric (BASELINE.json:
"DDP solves/s per chip", config 5: thousands of warm-started MPC scenarios).

Batches B independent Kuka EE solves (vmap over scenarios, sharded over the
available device mesh) and reports solves/s at each batch size.  On a multi-
host pod slice the same `make_batched_solver` shards the scenario axis over
ICI/DCN with no code change (parallel/sharding.py); on this 1-chip dev box it
measures per-chip throughput and the driver's dryrun_multichip validates the
sharded compilation on a virtual 8-device mesh.

Run: python benchmarks/scaling.py [--batches 16,64,256] [--iters 6]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# Model FLOPs of ONE 6-iter N=64 Kuka EE solve, from XLA's own cost model
# (benchmarks/roofline.py `latency` stage: compiled.cost_analysis()["flops"]).
# Used to convert measured solves/s into MFU against the chip's fp32-accum
# peak (roofline.CHIPS) — the scale-out stage's honesty metric (VERDICT r4
# weak #2: 1955 solves/s sounds big, 0.1% MFU tells the truth).
MODEL_FLOPS_PER_SOLVE_6ITER = 62.4e6


def batched_result(batches=(16, 64, 256), iters=6, reps=10, k_chain=8,
                   core="auto", bf16=False, pallas_riccati=False):
    """Scenario-batched throughput -> bench dict (importable from bench.py so
    the BASELINE 'solves/s per chip' metric lands in the driver artifact).

    `core` selects the Kuka derivative-stage implementation: "auto" = fused
    XLA scalar-channel SoA; "pallas" = the fused Pallas RBD dynamics +
    21-tangent Jacobian kernels on the solver's derivative stage
    (ops/pallas_rbd.py).  bench.py measures both and records the winner —
    under scenario-vmap each solve's 63-sample derivative batch occupies 6%
    of the kernels' native 1024-lane tile, so which path wins at a given
    scenario batch is an empirical question the artifact should answer.

    `bf16` turns on the reduced-precision forward path (SolverConfig
    bf16_rollout + bf16_cost: bf16 compute / fp32 accumulation in the rollout
    and cost stages, Riccati pinned fp32) — the throughput study of
    config.cuh:72-75 done right; tests/test_bf16.py is the oracle gate.

    `pallas_riccati` fuses the backward sweep into one Pallas kernel per rho
    attempt (ops/pallas_riccati.py).  Under scenario-vmap the kernel gains a
    leading batch grid dimension; whether the fused sweep still beats the
    scan at B=256 (where XLA already has lane-filling batch work) is exactly
    the empirical question the bench artifact should answer."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from parallel_ddp_tpu.presets import ee_goal, kuka_ee
    from parallel_ddp_tpu.solver import make_ilqr_solver
    from parallel_ddp_tpu.utils import aot

    prob = kuka_ee(core=core)
    cfg = dataclasses.replace(prob.cfg, max_iter=iters, tol_cost=0.0,
                              bf16_rollout=bf16, bf16_cost=bf16,
                              pallas_riccati=pallas_riccati)
    rng = np.random.default_rng(0)
    n = cfg.num_time_steps
    goal1 = ee_goal([0.0, -0.55, 0.35])

    # Timing protocol for the remote-tunnel TPU (see bench.py): chain K
    # batched solves inside ONE program and end the measurement with a real
    # result read — per-solve = (wall - RTT) / (K * B).  Neither
    # block_until_ready nor a prior "sync-mode" read is trustworthy for a
    # fresh executable here.

    def rtt_read():
        triv = jax.jit(lambda z: z + 1.0)
        z = jnp.zeros((8, 128), jnp.float32)
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            _ = np.asarray(triv(z))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    results = {}
    for b in batches:
        goals = {k: jnp.tile(np.asarray(v)[None], (b, 1))
                 for k, v in goal1.items()}

        def build(goals=goals):
            solver = make_ilqr_solver(prob.plant, prob.cost, cfg)

            @jax.jit
            def prog(x0s, u0s):
                def body(c, i):
                    out = jax.vmap(
                        lambda x0, u0, g_ee, g_xt: solver(
                            x0, u0, {"ee_goal": g_ee, "x_target": g_xt},
                            initial_rollout=True),
                    )(c, u0s, goals["ee_goal"], goals["x_target"])
                    return c + out.J[:, None, None] * 1e-9, out.J
                c, js = lax.scan(body, x0s,
                                 jnp.arange(k_chain, dtype=jnp.float32))
                return js

            return prog

        x0s = jnp.asarray(rng.normal(0, 0.3, (b, n, 14)).astype(np.float32))
        u0s = jnp.asarray(rng.normal(0, 1.0, (b, n, 7)).astype(np.float32))
        # AOT: skip the per-process trace when a valid export exists
        prog, _from_aot = aot.cached_program(
            f"batched-{core}-b{b}-k{k_chain}-i{iters}-bf{int(bf16)}"
            f"-pr{int(pallas_riccati)}", build, (x0s, u0s), src=__file__)
        _ = np.asarray(prog(x0s, u0s))  # compile + first read
        r = rtt_read()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(prog(x0s, u0s))
            ts.append(time.perf_counter() - t0)
        med = max(float(np.median(ts)) - r, 1e-9)
        results[b] = {
            "solves_per_s": round(b * k_chain / med, 1),
            "per_solve_us": round(med / (b * k_chain) * 1e6, 1),
        }
        print(f"B={b}: {results[b]}", file=sys.stderr, flush=True)

    best = max(v["solves_per_s"] for v in results.values())
    # MFU: fraction of the chip's fp32-accumulate peak the measured
    # throughput represents at the solve's model FLOP count
    from benchmarks.roofline import CHIPS

    chip = CHIPS["v5e" if jax.default_backend() == "tpu" else "cpu"]
    flops_per_solve = MODEL_FLOPS_PER_SOLVE_6ITER * (iters / 6.0)
    extra = {"core": core, "bf16": bf16,
             "pallas_riccati": pallas_riccati,
             "model_flops_per_solve": flops_per_solve,
             "mfu_pct": round(
                 100.0 * best * flops_per_solve / chip["flops"], 3),
             **results}
    if pallas_riccati:
        # did the fused sweep actually engage, or did the shape gate fall
        # back to the XLA scan? (artifact must not mislabel a fallback run)
        from parallel_ddp_tpu.ops.pallas_riccati import fused_riccati_active

        extra["fused_riccati_active"] = fused_riccati_active(cfg, 14, 7)
    return {
        "metric": "kuka_n64_batched_solves_per_s_per_chip",
        "value": best,
        "unit": f"solves/s ({iters}-iter warm EE solve, batched scenarios, "
                f"core={core}, bf16={bf16}, priccati={pallas_riccati})",
        "vs_baseline": round(best / 97.0, 1),
        "extra": extra,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,64,256")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    print(json.dumps(batched_result(
        tuple(int(s) for s in args.batches.split(",")),
        iters=args.iters, reps=args.reps,
    )))


if __name__ == "__main__":
    main()
