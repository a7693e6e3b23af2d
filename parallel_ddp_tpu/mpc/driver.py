"""Warm-started receding-horizon MPC driver (MPCHelpers.cuh).

Device-resident solver state (x, u, K, P, p, d) persists across solves — the
reference's GPUVars warm start.  Each control step:

  1. shift: roll every trajectory array left by the elapsed plant time
     (zero-order-hold the tail) — shiftAndCopy (MPCHelpers.cuh:425-471);
  2. re-rollout: overwrite the first shooting interval (or the full horizon)
     by open-loop simulation from the *measured* state xActual —
     rolloutMPC (MPCHelpers.cuh:523-563, FULL_ROLLOUT switch);
  3. solve: a fixed-iteration-budget iLQR solve warm-started from the shifted
     state.  The reference enforces a wall-clock budget with host checks
     between phases (USE_MAX_SOLVER_TIME, MPCHelpers.cuh:916-1001); on TPU the
     budget is a fixed `max_iter` chosen from the measured per-iteration
     latency, keeping the whole solve in one compiled program;
  4. accept: on a failed solve (no iteration accepted) keep executing the
     shifted stale plan; after `solves_to_reset` consecutive failures zero
     u/K/P/p for a cold restart (MPCHelpers.cuh:752-774, 610, 668).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parallel_ddp_tpu.config import CostWeights, SolverConfig
from parallel_ddp_tpu.costs.base import CostModel
from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.ops.integrators import make_step
from parallel_ddp_tpu.solver import make_ilqr_solver, open_loop_rollout


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """MPC options (config.cuh MPC group + MPCHelpers constants)."""

    max_iters_per_solve: int = 6      # the 10 ms budget analog
    # FULL_ROLLOUT: re-sim the whole horizon (vs first block only) each warm
    # start.  The reference's MPC default is 1 (MPCHelpers.cuh:37-38) and it is
    # what makes the loop robust: a full rollout restores dynamic feasibility
    # (zero defects) every solve, so a disturbance can never trap the line
    # search behind the max-defect acceptance test.
    full_rollout: bool = True
    solves_to_reset: int = 10         # SOLVES_TO_RESET (MPCHelpers.cuh:610)
    max_shift_steps: Optional[int] = None  # clamp on warm-start shift
    # online solves must ENFORCE the defect bound; only the offline warm-up
    # ignores it (the reference passes ignoreFirstDefectFlag=0 per solve,
    # LCMHelpers.cuh:242 — accepting large-defect candidates online publishes
    # dynamically infeasible trajectories and destabilizes the loop)
    ignore_defect_online: bool = False
    # the reference's reset zeroes x/u/KT/P/p (MPCHelpers.cuh:610,668) — safe
    # only for a gravity-compensated plant (zero torque = hold still).  Default
    # here: restart the SOLVER (zero P/p, rho back to rho_init) but keep
    # executing the last feasible plan.
    zero_controls_on_reset: bool = False


class MPCState(NamedTuple):
    x: jnp.ndarray
    u: jnp.ndarray
    K: jnp.ndarray
    P: jnp.ndarray
    p: jnp.ndarray
    d: jnp.ndarray
    t0: jnp.ndarray      # plant time of x[0] (seconds)
    fails: jnp.ndarray   # consecutive failed solves


class MPCStepInfo(NamedTuple):
    J: jnp.ndarray
    iters: jnp.ndarray
    accepted: jnp.ndarray
    shift_steps: jnp.ndarray
    max_defect: jnp.ndarray
    ok: jnp.ndarray = None  # accepted OR converged (not a real failure)


def _shift(a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """a[k] <- a[min(k+s, N-1)] (ZOH tail fill, shiftAndCopy semantics)."""
    n = a.shape[0]
    idx = jnp.minimum(jnp.arange(n) + s, n - 1)
    return jnp.take(a, idx, axis=0)


class MPCController:
    """Builds the jitted MPC step for a (plant, cost, solver config) triple."""

    def __init__(
        self,
        plant: Plant,
        cost: CostModel,
        cfg: SolverConfig,
        mpc_cfg: MPCConfig = MPCConfig(),
    ):
        self.plant = plant
        self.cost = cost
        self.cfg = cfg
        self.mpc = mpc_cfg
        solver_cfg = dataclasses.replace(
            cfg, max_iter=mpc_cfg.max_iters_per_solve
        )
        self._solver = make_ilqr_solver(plant, cost, solver_cfg)
        self._step_fn = make_step(plant, cfg.integrator, cfg.dt)
        self._jit_step = jax.jit(self._mpc_step)
        self._init_solvers: dict = {}  # warmup_iters -> compiled solver
        # wall-clock budget model: measured per-iteration latency (ms).  The
        # reference checks gettimeofday between phases (USE_MAX_SOLVER_TIME,
        # MPCHelpers.cuh:916-1001); a compiled TPU loop can't read the clock,
        # so a time budget becomes a traced iteration cap time/per_iter —
        # see step(time_limit_ms=...).  Calibrated from live solves as a
        # two-parameter fit wall = overhead + per_iter*iters over the MINIMUM
        # observed wall per iteration count: the min rejects one-off spikes
        # (mid-loop recompiles, scheduler hiccups) that would otherwise
        # permanently ratchet the iteration cap down, and separating the fixed
        # dispatch overhead keeps a large per-solve overhead (e.g. a remote
        # device tunnel) from masquerading as per-iteration cost.
        self.per_iter_ms: Optional[float] = None
        self.overhead_ms: float = 0.0  # fixed per-solve dispatch/transport cost
        self._timing_min_ms: dict = {}  # iters -> min observed solve wall (ms)

    def _warmup_solver(self, warmup_iters: int):
        """Cached full-convergence solver for cold starts (shared by the
        single and fleet init paths)."""
        solver = self._init_solvers.get(warmup_iters)
        if solver is None:
            warm_cfg = dataclasses.replace(self.cfg, max_iter=warmup_iters)
            solver = make_ilqr_solver(self.plant, self.cost, warm_cfg)
            self._init_solvers[warmup_iters] = solver
        return solver

    def init_state(self, x_actual, t0: float = 0.0, goal=None,
                   weights: Optional[CostWeights] = None,
                   warmup_iters: int = 50) -> MPCState:
        """Cold-start: full-convergence solve from the measured state (the
        reference's warm-start solve with infinite budget,
        LCM_fig8_examples.cu:261-262)."""
        n_steps = self.cfg.num_time_steps
        x0 = jnp.tile(jnp.asarray(x_actual, jnp.float32)[None], (n_steps, 1))
        u0 = jnp.zeros((n_steps, self.plant.n_ctrl), jnp.float32)
        out = self._warmup_solver(warmup_iters)(
            x0, u0, goal, weights, initial_rollout=True
        )
        return MPCState(
            x=out.x, u=out.u, K=out.K, P=out.P, p=out.p, d=out.d,
            t0=jnp.asarray(t0, jnp.float32), fails=jnp.asarray(0, jnp.int32),
        )

    def _warm_start(self, st: MPCState, x_actual, s):
        x = _shift(st.x, s)
        u = _shift(st.u, s)
        k_mat = _shift(st.K, s)
        p_mat = _shift(st.P, s)
        p_vec = _shift(st.p, s)

        # re-rollout from the measured state with the shifted open-loop
        # controls (rolloutMPC, MPCHelpers.cuh:523-563)
        n_roll = (
            self.cfg.num_time_steps if self.mpc.full_rollout else self.cfg.n_blocks_f
        )

        def body(x_cur, u_k):
            x_next = self._step_fn(x_cur, u_k)
            return x_next, x_next

        x_last, x_sim = jax.lax.scan(body, x_actual, u[: n_roll - 1])
        x = x.at[0].set(x_actual).at[1:n_roll].set(x_sim)

        if self.mpc.full_rollout or self.cfg.m_blocks_f == 1:
            # the whole horizon is one contiguous simulation: zero defects
            d = jnp.zeros_like(st.d)
        else:
            # shifting moves the old defects off the (fixed) block boundaries
            d = _shift(st.d, s)
            # boundaries that landed in the ZOH tail (k + s >= N-1) repeat the
            # final state on both sides, so the shifted defect reads zero while
            # the true defect there is step(x[N-1], u[N-1]) - x[N-1] (the tail
            # state is generally not an equilibrium); understating it would let
            # the line search accept dynamically infeasible plans
            n_steps = self.cfg.num_time_steps
            d_tail = self._step_fn(x[n_steps - 1], u[n_steps - 1]) - x[n_steps - 1]
            bidx = (jnp.arange(1, self.cfg.m_blocks_f) * self.cfg.n_blocks_f) - 1
            in_tail = bidx + s >= n_steps - 1
            d = d.at[bidx].set(
                jnp.where(in_tail[:, None], d_tail[None, :], d[bidx])
            )
            # the first boundary's defect is known exactly because block 0 was
            # just re-simulated from the measured state: one more step vs the
            # stored next-block start.  Written LAST: the exact value must win
            # over the tail approximation above (bidx includes this boundary)
            b0 = self.cfg.n_blocks_f - 1
            d = d.at[b0].set(self._step_fn(x_last, u[b0]) - x[b0 + 1])
        return x, u, k_mat, p_mat, p_vec, d

    def _mpc_step(self, st: MPCState, x_actual, t_now, goal, weights, iter_limit):
        dt = self.cfg.dt
        s_f = (t_now - st.t0) / dt
        s = jnp.floor(s_f).astype(jnp.int32)  # MPCHelpers.cuh:875
        s = jnp.clip(s, 0, self.cfg.num_time_steps - 1)
        if self.mpc.max_shift_steps is not None:
            s = jnp.minimum(s, self.mpc.max_shift_steps)
        t0_new = st.t0 + s.astype(jnp.float32) * dt

        x_w, u_w, k_w, pm_w, pv_w, d_w = self._warm_start(st, x_actual, s)

        out = self._solver(
            x_w, u_w, goal, weights,
            P0=pm_w, p0=pv_w, d0=d_w,
            initial_rollout=False,
            ignore_first_defect=self.mpc.ignore_defect_online,
            iter_limit=iter_limit,
        )
        accepted = jnp.any(out.alpha_trace[1:] >= 0)

        # failure handling (storeVarsGPU_MPC, MPCHelpers.cuh:752-774).  A solve
        # that accepted nothing because there was nothing to improve
        # (out.converged), or whose candidates were feasible but rejected by
        # the z-window (out.last_feasible), is a SUCCESS — a stabilized loop
        # rejects almost every re-solve by construction, and counting those as
        # failures drove the periodic reset that destabilized gravity-loaded
        # plants.  Real failure = no candidate kept cost non-increasing with
        # defects in bound (NaNs, infeasible warm start).
        ok = accepted | out.converged | out.last_feasible

        def pick(new, old):
            return jnp.where(accepted, new, old)

        fails = jnp.where(ok, 0, st.fails + 1).astype(jnp.int32)
        reset = fails >= self.mpc.solves_to_reset
        fails = jnp.where(reset, 0, fails)

        def maybe_zero(arr):
            if self.mpc.zero_controls_on_reset:
                return jnp.where(reset, jnp.zeros_like(arr), arr)
            return arr

        x_n = pick(out.x, x_w)
        u_n = maybe_zero(pick(out.u, u_w))
        k_n = maybe_zero(pick(out.K, k_w))
        pm_n = jnp.where(reset, jnp.zeros_like(pm_w), pick(out.P, pm_w))
        pv_n = jnp.where(reset, jnp.zeros_like(pv_w), pick(out.p, pv_w))
        d_n = pick(out.d, d_w)

        new_state = MPCState(
            x=x_n, u=u_n, K=k_n, P=pm_n, p=pv_n, d=d_n, t0=t0_new, fails=fails
        )
        info = MPCStepInfo(
            J=out.J, iters=out.iters, accepted=accepted,
            shift_steps=s, max_defect=out.max_defect, ok=ok,
        )
        return new_state, info

    def _resolve_iter_limit(self, iter_limit: Optional[int],
                            time_limit_ms: Optional[float]) -> jnp.ndarray:
        """Fold the live iterLimit/timeLimit solver params (lcmt_solver_params,
        LCMHelpers.cuh:213) into one traced iteration cap.  A wall-clock budget
        maps through the measured per-iteration latency (self.per_iter_ms)."""
        cap = self.mpc.max_iters_per_solve
        if iter_limit is not None:
            cap = min(cap, int(iter_limit))
        if time_limit_ms is not None and self.per_iter_ms:
            budget = time_limit_ms - self.overhead_ms
            cap = min(cap, max(1, int(budget / self.per_iter_ms)))
        return jnp.asarray(max(1, cap), jnp.int32)

    def warmup(self, st: MPCState, goal, weights: Optional[CostWeights] = None):
        """Force-compile the MPC step before entering a real-time loop (a live
        loop that compiles on its first solve runs the plant open-loop for the
        whole compile time)."""
        w = weights if weights is not None else CostWeights()
        out = self._jit_step(
            st, st.x[0], st.t0, goal, w,
            jnp.asarray(self.mpc.max_iters_per_solve, jnp.int32),
        )
        jax.block_until_ready(out[0].x)

    def calibrate_timing(self, solve_ms: float, iters: int):
        """Record a measured (solve wall time, iterations executed) pair to
        build the per-iteration latency model used by time_limit_ms budgets.

        Callers must measure wall time around a SYNCED solve (read a result
        first) or the async-dispatch wall under-measures.  With samples at two
        or more distinct iteration counts the fixed per-solve overhead is
        separated out by a two-point secant over the per-count minima; with
        one count, wall/iters is the (conservative) fallback."""
        if iters <= 0:
            return
        prev = self._timing_min_ms.get(iters)
        if prev is None or solve_ms < prev:
            self._timing_min_ms[iters] = solve_ms
        pts = sorted(self._timing_min_ms.items())
        if len(pts) >= 2:
            (i_lo, w_lo), (i_hi, w_hi) = pts[0], pts[-1]
            slope = (w_hi - w_lo) / (i_hi - i_lo)
            if slope > 0:
                self.per_iter_ms = slope
                self.overhead_ms = max(0.0, w_lo - slope * i_lo)
                return
        self.per_iter_ms = min(w / i for i, w in pts)
        self.overhead_ms = 0.0

    def init_state_batch(self, x_actuals, t0s, goals,
                         weights: Optional[CostWeights] = None,
                         warmup_iters: int = 50) -> MPCState:
        """Cold-start a FLEET: one vmapped full-convergence solve over the
        scenario axis.  x_actuals (B, n_state), t0s (B,), goals a pytree with
        leading B on every leaf.  Returns an MPCState whose leaves carry the
        scenario axis — shard it over a 'dp' mesh for scale-out
        (parallel/sharding.py semantics)."""
        n_steps = self.cfg.num_time_steps
        xa = jnp.asarray(x_actuals, jnp.float32)
        x0 = jnp.tile(xa[:, None], (1, n_steps, 1))
        u0 = jnp.zeros((xa.shape[0], n_steps, self.plant.n_ctrl), jnp.float32)
        solver = self._warmup_solver(warmup_iters)
        w = weights if weights is not None else CostWeights()
        out = jax.vmap(
            lambda x, u, g: solver(x, u, g, w, initial_rollout=True)
        )(x0, u0, goals)
        b = xa.shape[0]
        return MPCState(
            x=out.x, u=out.u, K=out.K, P=out.P, p=out.p, d=out.d,
            t0=jnp.asarray(t0s, jnp.float32).reshape(b),
            fails=jnp.zeros((b,), jnp.int32),
        )

    def step_batch(self, sts: MPCState, x_actuals, t_nows, goals,
                   weights: Optional[CostWeights] = None,
                   iter_limit: Optional[int] = None,
                   time_limit_ms: Optional[float] = None):
        """One warm-started budgeted MPC period for a FLEET of scenarios —
        the BASELINE scale-out axis at the MPC level: thousands of
        warm-started controllers advance in one program (weights and the
        iteration cap are shared; state/measurement/clock/goal carry the
        scenario axis)."""
        if not hasattr(self, "_jit_step_batch"):
            self._jit_step_batch = jax.jit(
                jax.vmap(self._mpc_step, in_axes=(0, 0, 0, 0, None, None))
            )
        w = weights if weights is not None else CostWeights()
        return self._jit_step_batch(
            sts, jnp.asarray(x_actuals, jnp.float32),
            jnp.asarray(t_nows, jnp.float32), goals, w,
            self._resolve_iter_limit(iter_limit, time_limit_ms),
        )

    def step(self, st: MPCState, x_actual, t_now, goal,
             weights: Optional[CostWeights] = None,
             iter_limit: Optional[int] = None,
             time_limit_ms: Optional[float] = None):
        """One MPC re-solve: shift + warm start + budgeted solve.

        x_actual: measured state; t_now: plant clock (s); goal/weights/
        iter_limit/time_limit_ms may change every call without recompiling
        (the reference's GOAL/COST_PARAMS/SOLVER_PARAMS channels,
        LCMHelpers.cuh:204-214)."""
        w = weights if weights is not None else CostWeights()
        return self._jit_step(
            st, jnp.asarray(x_actual, jnp.float32), jnp.asarray(t_now, jnp.float32),
            goal, w, self._resolve_iter_limit(iter_limit, time_limit_ms),
        )
