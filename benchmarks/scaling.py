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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,64,256")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.parallel.sharding import make_batched_solver, make_mesh
    from parallel_ddp_tpu.presets import ee_goal, kuka_ee

    prob = kuka_ee()
    cfg = dataclasses.replace(prob.cfg, max_iter=args.iters, tol_cost=0.0)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    n = cfg.num_time_steps
    goal1 = ee_goal([0.0, -0.55, 0.35])

    # force synchronous dispatch + measure the tunnel RTT (see bench.py)
    triv = jax.jit(lambda z: z + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    _ = float(triv(z)[0, 0])

    def rtt():
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(triv(z))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    results = {}
    for b in [int(s) for s in args.batches.split(",")]:
        solver_b = make_batched_solver(prob.plant, prob.cost, cfg, mesh)
        x0s = jnp.asarray(rng.normal(0, 0.3, (b, n, 14)).astype(np.float32))
        u0s = jnp.asarray(rng.normal(0, 1.0, (b, n, 7)).astype(np.float32))
        goals = {k: jnp.tile(np.asarray(v)[None], (b, 1)) for k, v in goal1.items()}
        out = solver_b(x0s, u0s, goals)
        jax.block_until_ready(out.J)
        r = rtt()
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = solver_b(x0s, u0s, goals)
            jax.block_until_ready(out.J)
            ts.append(time.perf_counter() - t0)
        med = max(float(np.median(ts)) - r, 1e-9)
        results[b] = {
            "solves_per_s": round(b / med, 1),
            "batch_wall_ms": round(med * 1e3, 3),
        }
        print(f"B={b}: {results[b]}", file=sys.stderr, flush=True)

    best = max(r["solves_per_s"] for r in results.values())
    print(json.dumps({
        "metric": "kuka_n64_batched_solves_per_s_per_chip",
        "value": best,
        "unit": f"solves/s ({args.iters}-iter warm EE solve, batched scenarios)",
        "vs_baseline": round(best / 97.0, 1),
        "extra": results,
    }))


if __name__ == "__main__":
    main()
