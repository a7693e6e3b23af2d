"""Pick-and-place task family (LCM_pickNPlace_examples.cu:40-135).

The reference's goal handler is a small state machine driven by arm status:

  * hold a target at (x, y, 0.1) with x ~ U(0.4, 0.6), y ~ U(0.35, 0.75),
    alternating sides of the table (updateGoal, :77-81);
  * when the arm settles — EE error norm < E_NORM_LIM and joint velocity norm
    < V_NORM_LIM (evNorm, exampleUtils.cuh:87-91) — pick the next waypoint and
    publish: the new goal (lcmt_target_twist), a solver-params message with
    clearVars=1 and a 10x time budget for the re-plan transient, and the
    default cost set (:103-121);
  * when close to the goal (eNorm < 2*E_NORM_LIM), switch to the stiffer
    "close" cost set Q_EE1 75 / QF_EE1 500 for precise settling (:123-126);
  * once moving toward the new goal (eNorm < 0.95 * eNormMax), restore the
    normal MPC solver limits with useCostShift=1 (:128-133).

Two implementations:
  * `PickAndPlaceGoalNode` — the runtime-plane node publishing over the bus
    (GOAL / SOLVER_PARAMS / COST_PARAMS channels), drop-in alongside
    MPCLoopNode / TrajRunnerNode / SimulatorNode;
  * `make_pick_place_device_loop` — the fully fused on-device variant: MPC
    controller + plant + the waypoint state machine inside ONE jitted
    `lax.scan` (zero host round-trips per control step — required on the
    axon tunnel where any host read costs a full RTT).
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, List, NamedTuple, Optional, Tuple

import numpy as np

from parallel_ddp_tpu.config import CostWeights

# cost sets (LCM_pickNPlace_examples.cu:12-27); SMALL = 0 there
_PNP_BASE = dict(
    q_ee1=25.0, q_ee2=0.0, qf_ee1=250.0, qf_ee2=0.0,
    r_ee=0.001, q_xdee=10.0, qf_xdee=10.0, q_xee=0.0, qf_xee=0.0,
)


def default_weights() -> CostWeights:
    return CostWeights(**_PNP_BASE)


def close_weights() -> CostWeights:
    """Stiffer settle weights (_Q_EE1_CLOSE 75 / _QF_EE1_CLOSE 500)."""
    return CostWeights(**{**_PNP_BASE, "q_ee1": 75.0, "qf_ee1": 500.0})


@dataclasses.dataclass(frozen=True)
class PickAndPlaceConfig:
    e_norm_lim: float = 0.10        # E_NORM_LIM (:9)
    v_norm_lim: float = 0.10        # V_NORM_LIM (:10)
    iter_limit: int = 10
    time_limit_ms: float = 10.0
    x_range: Tuple[float, float] = (0.4, 0.6)    # randX (:19)
    y_range: Tuple[float, float] = (0.35, 0.75)  # randY, sign alternates (:20)
    z: float = 0.1                               # z always 0.1 (:73)
    replan_time_factor: float = 10.0             # time*10 on goal switch (:113)


def sample_waypoints(cfg: PickAndPlaceConfig, n: int,
                     rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """(n, 3) alternating-side waypoint sequence (updateGoal semantics)."""
    rng = rng or np.random.default_rng(0)
    xs = rng.uniform(*cfg.x_range, size=n)
    ys = rng.uniform(*cfg.y_range, size=n) * np.where(np.arange(n) % 2, -1.0, 1.0)
    return np.stack([xs, ys, np.full(n, cfg.z)], axis=-1).astype(np.float32)


class WaypointRecord(NamedTuple):
    goal: np.ndarray
    t_set: float        # plant time when the goal became active
    t_settled: Optional[float]  # plant time when e/v norms dropped below limits


class PickAndPlaceGoalNode:
    """Bus-plane goal sequencer (LCM_PickAndPlaceGoal_Handler analog)."""

    def __init__(self, bus, ee_pos_fn: Callable[[np.ndarray], np.ndarray],
                 cfg: PickAndPlaceConfig = PickAndPlaceConfig(),
                 rng: Optional[np.random.Generator] = None,
                 n_pos: int = 7):
        from parallel_ddp_tpu.runtime.pubsub import Channels

        self.bus = bus
        self.ee_pos_fn = ee_pos_fn
        self.cfg = cfg
        self.rng = rng or np.random.default_rng(0)
        self.n_pos = n_pos
        self.side = False
        self.goal = self._sample_goal()
        self.e_norm_max = 0.0
        self.close_sent = False
        self.vars_sent = True
        self.records: List[WaypointRecord] = [WaypointRecord(self.goal, 0.0, None)]
        self._channels = Channels
        bus.subscribe(Channels.STATUS)

    def _sample_goal(self) -> np.ndarray:
        x = self.rng.uniform(*self.cfg.x_range)
        y = self.rng.uniform(*self.cfg.y_range) * (-1.0 if self.side else 1.0)
        self.side = not self.side
        return np.asarray([x, y, self.cfg.z], np.float32)

    def _ev_norm(self, status) -> Tuple[float, float]:
        """EE position error and joint-velocity norms (evNorm,
        exampleUtils.cuh:87-91)."""
        ee = np.asarray(self.ee_pos_fn(status.q))[:3]
        e_norm = float(np.linalg.norm(ee - self.goal))
        v_norm = float(np.linalg.norm(status.qd))
        return e_norm, v_norm

    def _publish_goal(self, utime: float):
        from parallel_ddp_tpu.runtime import messages as msg

        twist = np.concatenate([self.goal, np.zeros(3, np.float32)])
        self.bus.publish(self._channels.GOAL,
                         msg.Goal(msg.Goal.MODE_EE_TWIST, twist).pack())

    def _publish_solver_params(self, clear_vars: bool, cost_shift: int,
                               time_factor: float = 1.0):
        from parallel_ddp_tpu.runtime import messages as msg

        self.bus.publish(
            self._channels.SOLVER_PARAMS,
            msg.SolverParams(
                iter_limit=self.cfg.iter_limit,
                time_limit_ms=self.cfg.time_limit_ms * time_factor,
                clear_vars=clear_vars,
                cost_shift=cost_shift,
            ).pack(),
        )

    def _publish_cost(self, w: CostWeights):
        from parallel_ddp_tpu.runtime import messages as msg

        self.bus.publish(self._channels.COST_PARAMS, msg.CostParams(w).pack())

    def handle_status(self, status) -> None:
        """One state-machine step (handleStatus, LCM_pickNPlace_examples.cu:96-134)."""
        e_norm, v_norm = self._ev_norm(status)

        if e_norm < self.cfg.e_norm_lim and v_norm < self.cfg.v_norm_lim:
            # settled: record, advance to a new waypoint, trigger a re-plan
            self.records[-1] = self.records[-1]._replace(t_settled=status.utime)
            self.goal = self._sample_goal()
            self.records.append(WaypointRecord(self.goal, status.utime, None))
            e_norm, _ = self._ev_norm(status)
            self.e_norm_max = e_norm
            self.close_sent = False
            self.vars_sent = False
            self._publish_goal(status.utime)
            self._publish_solver_params(
                clear_vars=True, cost_shift=0,
                time_factor=self.cfg.replan_time_factor,
            )
            self._publish_cost(default_weights())
        elif not self.close_sent and e_norm < 2.0 * self.cfg.e_norm_lim:
            self.close_sent = True
            self._publish_cost(close_weights())
        elif not self.vars_sent and e_norm < 0.95 * self.e_norm_max:
            self.vars_sent = True
            self._publish_solver_params(clear_vars=False, cost_shift=1)

    def run(self, stop: threading.Event, poll_s: float = 0.0005):
        from parallel_ddp_tpu.runtime import messages as msg

        while not stop.is_set():
            m = self.bus.poll_new(self._channels.STATUS)
            if not m:
                time.sleep(poll_s)
                continue
            self.handle_status(msg.Status.unpack(m[0]))

    def settle_times(self) -> List[float]:
        """Per-waypoint settle durations (plant seconds) for completed waypoints."""
        return [
            r.t_settled - r.t_set for r in self.records if r.t_settled is not None
        ]


class PickPlaceLoopResult(NamedTuple):
    x: "np.ndarray"          # (T, n_state) plant state per control step
    e_norm: "np.ndarray"     # (T,) EE error norm to the active goal
    v_norm: "np.ndarray"     # (T,)
    wp_idx: "np.ndarray"     # (T,) active waypoint per step
    waypoints_done: "np.ndarray"  # scalar: waypoints settled


def make_pick_place_device_loop(
    ctrl,
    waypoints: np.ndarray,
    cfg: PickAndPlaceConfig = PickAndPlaceConfig(),
    sim_rate_hz: float = 1000.0,
    control_period_s: float = 0.01,
    sim_integrator: int = 1,
):
    """Fused on-device pick-and-place: MPC + plant + waypoint state machine in
    one jitted scan.  `ctrl` is an MPCController over the Kuka EE cost;
    `waypoints` is (K, 3) from `sample_waypoints`.

    The goal switch and cost-set switch become `jnp.where` selections inside
    the loop (close weights when eNorm < 2*E_NORM_LIM — the device analog of
    the close-cost publish), so the whole task runs without host round-trips.
    Returns run(st, x0, t0, n_steps_static) -> PickPlaceLoopResult."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from parallel_ddp_tpu.mpc.device_loop import get_hardware_controls_jax
    from parallel_ddp_tpu.ops.integrators import make_step

    plant = ctrl.plant
    n_pos = plant.n_pos
    wps = np.asarray(waypoints, np.float32)          # trace-time constant
    K = wps.shape[0]
    sim_dt = 1.0 / sim_rate_hz
    substeps = max(1, int(round(control_period_s * sim_rate_hz)))
    sim_step = make_step(plant, sim_integrator, sim_dt)
    w_def = default_weights()
    w_close = close_weights()
    # numpy, NOT jnp: a jnp scalar made here (outside any trace) is a
    # committed device-array constant baked into the jitted loop — the
    # pathological-dispatch pattern tests/test_no_device_constants.py guards
    # against (its ndim>0 check misses 0-d captures)
    it_cap = np.int32(min(cfg.iter_limit, ctrl.mpc.max_iters_per_solve))

    def one_control_step(carry, _):
        st, x_sim, t, wp_i = carry
        goal_xyz = jnp.take(jnp.asarray(wps), jnp.minimum(wp_i, K - 1), axis=0)
        goal = {
            "ee_goal": jnp.concatenate([goal_xyz, jnp.zeros(3, jnp.float32)]),
            "x_target": jnp.zeros(2 * n_pos, jnp.float32),
        }

        ee = plant.ee_pos(x_sim[:n_pos])[:3]
        e_norm = jnp.linalg.norm(ee - goal_xyz)
        v_norm = jnp.linalg.norm(x_sim[n_pos:])

        # close-cost swap (the device analog of the COST_PARAMS publish)
        use_close = e_norm < 2.0 * cfg.e_norm_lim
        w = jax.tree_util.tree_map(
            lambda a, b: jnp.where(use_close, a, b),
            jax.tree_util.tree_map(jnp.asarray, w_close),
            jax.tree_util.tree_map(jnp.asarray, w_def),
        )

        st, info = ctrl._mpc_step(st, x_sim, t, goal, w, it_cap)

        def substep(c, _):
            x, tt = c
            u = get_hardware_controls_jax(
                st.x, st.u, st.K, st.t0, ctrl.cfg.dt, tt, x, True
            )
            return (sim_step(x, u), tt + sim_dt), None

        (x_sim, t), _ = lax.scan(substep, (x_sim, t), None, length=substeps)

        # settle test advances the waypoint (the GOAL publish analog)
        ee2 = plant.ee_pos(x_sim[:n_pos])[:3]
        e2 = jnp.linalg.norm(ee2 - goal_xyz)
        v2 = jnp.linalg.norm(x_sim[n_pos:])
        settled = jnp.logical_and(e2 < cfg.e_norm_lim, v2 < cfg.v_norm_lim)
        wp_next = jnp.where(settled, jnp.minimum(wp_i + 1, K), wp_i)

        return (st, x_sim, t, wp_next), (x_sim, e_norm, v_norm, wp_i)

    def run(st, x0, t0, n_steps: int) -> PickPlaceLoopResult:
        x0 = jnp.asarray(x0, jnp.float32)
        (st_f, _, _, wp_f), (xs, es, vs, wis) = lax.scan(
            one_control_step,
            (st, x0, jnp.asarray(t0, jnp.float32), jnp.asarray(0, jnp.int32)),
            None,
            length=n_steps,
        )
        return PickPlaceLoopResult(xs, es, vs, wis, wp_f)

    return jax.jit(run, static_argnames=("n_steps",))
