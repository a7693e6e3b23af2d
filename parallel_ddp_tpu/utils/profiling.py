"""Tracing / profiling utilities (SURVEY.md §5).

The reference records wall-clock deltas around each solver phase into output
arrays (DDPWrappers.cuh:23,54-105) and aggregates them into median/avg/std/
min/max tables (WAFR_iLQR_examples.cu:122-227); online it appends per-solve
(J, alpha, timings) into an `algTrace` struct (MPCHelpers.cuh:51-56).

Here the production solve is ONE fused program (no phase boundaries to time),
so profiling is explicit:

  * `phase_times` compiles each phase separately and times it on-device —
    the per-phase table for performance work;
  * `timing_stats` is the median/avg/std/min/max aggregator;
  * `AlgTrace` collects per-solve (J, iters, alpha trace, wall time) series
    from repeated solves or MPC steps — the `algTrace` analog.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def timing_stats(samples_s) -> Dict[str, float]:
    """median/avg/std/min/max in milliseconds (printAllTimingStats analog)."""
    a = np.asarray(samples_s) * 1e3
    return {
        "median_ms": float(np.median(a)),
        "avg_ms": float(np.mean(a)),
        "std_ms": float(np.std(a)),
        "min_ms": float(np.min(a)),
        "max_ms": float(np.max(a)),
    }


def _time_fn(fn, args, reps: int, warmup: int = 3):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return ts


def phase_times(plant, cost, cfg, x, u, goal, weights=None, reps: int = 20):
    """Per-phase on-device timing table for one solver configuration.

    Compiles derivative recompute (nextIterationSetup), backward pass, and
    forward pass (sweep + rollout + cost/defect) as standalone programs and
    times each; returns {phase: timing_stats}.  Mirrors the reference's
    bpTime/sweepTime/simTime/nisTime breakdown (DDPWrappers.cuh:54-105)."""
    from parallel_ddp_tpu.config import CostWeights
    from parallel_ddp_tpu.ops.integrators import make_step, make_step_jacobian
    from parallel_ddp_tpu.parallel.backward import backward_pass
    from parallel_ddp_tpu.parallel.forward import forward_pass
    from parallel_ddp_tpu.solver import _derivatives

    w = weights if weights is not None else CostWeights()
    n = plant.n_state
    x = jnp.asarray(x, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    step_fn = make_step(plant, cfg.integrator, cfg.dt)
    step_jac = make_step_jacobian(plant, cfg.integrator, cfg.dt)
    alphas = cfg.alphas()
    stage = lambda xk, uk, k: cost.stage(xk, uk, k, goal, w)

    out: Dict[str, Dict[str, float]] = {}
    with jax.default_matmul_precision("highest"):
        derivs = jax.jit(
            lambda x, u: _derivatives(cfg, step_jac, cost.quad, x, u, goal, w)
        )
        AB, H, g = derivs(x, u)
        out["next_iter_setup"] = timing_stats(_time_fn(derivs, (x, u), reps))

        zeros_n = jnp.zeros((cfg.num_time_steps, n), jnp.float32)
        zeros_nn = jnp.zeros((cfg.num_time_steps, n, n), jnp.float32)
        bp = jax.jit(
            lambda AB, H, g: backward_pass(
                cfg, AB, H, g, zeros_nn, zeros_n, zeros_n, x, x,
                jnp.float32(cfg.rho_init), jnp.float32(1.0),
            )
        )
        bp_out = bp(AB, H, g)
        out["backward_pass"] = timing_stats(_time_fn(bp, (AB, H, g), reps))

        fp = jax.jit(
            lambda K, du, ApBK, Bdu: forward_pass(
                cfg, step_fn, stage, x, u, zeros_n, K, du, ApBK, Bdu, x, alphas
            )
        )
        fp_args = (bp_out.K, bp_out.du, bp_out.ApBK, bp_out.Bdu)
        fp(*fp_args)
        out["forward_pass"] = timing_stats(_time_fn(fp, fp_args, reps))
    return out


@dataclasses.dataclass
class AlgTrace:
    """Per-solve series collector (the reference's algTrace, MPCHelpers.cuh:51-56)."""

    J: List[float] = dataclasses.field(default_factory=list)
    iters: List[int] = dataclasses.field(default_factory=list)
    alpha_idx: List[int] = dataclasses.field(default_factory=list)
    wall_s: List[float] = dataclasses.field(default_factory=list)
    accepted: List[bool] = dataclasses.field(default_factory=list)

    def record_solve(self, out, wall_s: Optional[float] = None):
        """Append one SolveOutput."""
        self.J.append(float(out.J))
        self.iters.append(int(out.iters))
        at = np.asarray(out.alpha_trace)
        good = at[at >= 0]
        self.alpha_idx.append(int(good[-1]) if good.size else -1)
        if wall_s is not None:
            self.wall_s.append(wall_s)

    def record_mpc(self, info, wall_s: Optional[float] = None):
        """Append one MPCStepInfo."""
        self.J.append(float(info.J))
        self.iters.append(int(info.iters))
        self.accepted.append(bool(info.accepted))
        if wall_s is not None:
            self.wall_s.append(wall_s)

    def summary(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if self.wall_s:
            out["solve"] = timing_stats(self.wall_s)
        if self.J:
            out["J_final_median"] = float(np.median(self.J))
            out["iters_median"] = float(np.median(self.iters))
        if self.accepted:
            out["accept_rate"] = float(np.mean(self.accepted))
        return out
