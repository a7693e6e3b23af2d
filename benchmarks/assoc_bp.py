"""Associative-scan vs block-parallel backward pass at long horizons.

VERDICT r1 stretch item 9: does the EXACT log-depth associative-scan Riccati
(SolverConfig.bp_assoc_scan) beat the vmapped-block serial scan at N=256+?
The block pass does N/M serial steps of tiny ops (latency-bound); the assoc
pass does log2(N) rounds of batched (N, 14, 14) solves/matmuls (bandwidth/
MXU-bound) plus one vmapped extraction — the classic depth-vs-work trade.

Protocol: K backward passes chained inside one jitted program, one result
read, RTT-corrected (see bench.py docstring).

Run: python benchmarks/assoc_bp.py [--horizons 64,256,1024] [--m-blocks 4]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", default="64,256,1024")
    ap.add_argument("--m-blocks", type=int, default=4)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--chain", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from parallel_ddp_tpu.config import SolverConfig
    from parallel_ddp_tpu.parallel.backward import backward_pass

    n, m = 14, 7
    rng = np.random.default_rng(0)

    triv = jax.jit(lambda z: z + 1.0)
    zz = jnp.zeros((8, 128), jnp.float32)

    def rtt():
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(triv(zz))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def data(N):
        AB = jnp.asarray(rng.normal(0, 0.2, (N - 1, n, n + m)).astype(np.float32))
        Hs = np.einsum("kij,klj->kil",
                       rng.normal(0, 0.3, (N, n + m, n + m)),
                       rng.normal(0, 0.3, (N, n + m, n + m)))
        H = jnp.asarray((Hs + 0.5 * np.eye(n + m)).astype(np.float32))
        g = jnp.asarray(rng.normal(0, 1.0, (N, n + m)).astype(np.float32))
        zN = jnp.zeros((N, n), jnp.float32)
        zP = jnp.zeros((N, n, n), jnp.float32)
        return AB, H, g, zP, zN

    results = {}
    for N in [int(s) for s in args.horizons.split(",")]:
        row = {}
        for mode in ("block", "assoc"):
            cfg = SolverConfig(
                num_time_steps=N, total_time=1.0,
                m_blocks_b=(1 if mode == "assoc" else args.m_blocks),
                m_blocks_f=1, num_alpha=2, state_reg=False,
                bp_assoc_scan=(mode == "assoc"),
            )
            AB, H, g, zP, zN = data(N)
            rho = jnp.asarray(10.0, jnp.float32)
            one = jnp.asarray(1.0, jnp.float32)

            @jax.jit
            def prog(AB, H, g, zP, zN):
                def body(c, _):
                    out = backward_pass(cfg, AB + c * 1e-12, H, g, zP, zN,
                                        zN, zN, zN, rho, one)
                    return c + out.dJexp[0] * 1e-12, None
                c, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                None, length=args.chain)
                return c

            _ = float(prog(AB, H, g, zP, zN))  # compile + sync mode
            r = rtt()
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(prog(AB, H, g, zP, zN))
                ts.append(time.perf_counter() - t0)
            per_bp_us = max(float(np.median(ts)) - r, 1e-9) / args.chain * 1e6
            row[mode] = round(per_bp_us, 1)
            print(f"N={N} {mode}: {per_bp_us:.1f} us/backward-pass",
                  file=sys.stderr, flush=True)
        row["speedup_assoc"] = round(row["block"] / row["assoc"], 2)
        results[N] = row

    best_n = max(results, key=lambda k: results[k]["speedup_assoc"])
    print(json.dumps({
        "metric": "assoc_scan_bp_speedup",
        "value": results[best_n]["speedup_assoc"],
        "unit": f"x vs {args.m_blocks}-block serial backward pass (best at N={best_n})",
        "extra": {str(k): v for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
