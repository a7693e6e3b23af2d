"""Plant simulator + lockstep closed-loop MPC harness.

Two modes, mirroring the reference:
  * `PlantSimulator` — a stand-alone stepped simulator with substeps
    (kukaLCMSimulator / LCM_Simulator_Handler, LCMHelpers.cuh:418-524);
  * `run_lockstep_mpc` — deterministic in-process closed loop: advance the
    plant by a fixed control period per solve, exactly the reference's
    `testMPC_lockstep` (WAFR_MPC_examples.cu:105-238), used for benchmarking
    and tracking-error metrics without a comms plane.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parallel_ddp_tpu.config import CostWeights
from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.mpc.controls import TrajHandoff, get_hardware_controls
from parallel_ddp_tpu.mpc.driver import MPCController, MPCState
from parallel_ddp_tpu.ops.integrators import make_step


class PlantSimulator:
    """Integrate the true plant at a control rate with substeps."""

    def __init__(self, plant: Plant, rate_hz: float = 1000.0, substeps: int = 1,
                 integrator: int = 3):
        self.plant = plant
        self.dt = 1.0 / rate_hz
        self.substeps = substeps
        step = make_step(plant, integrator, self.dt / substeps)

        def multi(x, u):
            def body(xc, _):
                return step(xc, u), None

            return jax.lax.scan(body, x, None, length=substeps)[0]

        self._step = jax.jit(multi)
        # compile eagerly: a live simulator must not stall on its first tick
        self._step(
            jnp.zeros(plant.n_state, jnp.float32), jnp.zeros(plant.n_ctrl, jnp.float32)
        ).block_until_ready()

    def step(self, x: np.ndarray, u: np.ndarray) -> np.ndarray:
        return np.asarray(self._step(jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32)))


class LockstepResult(NamedTuple):
    t: np.ndarray          # (T,)
    x: np.ndarray          # (T, n_state) plant states
    u: np.ndarray          # (T, n_ctrl) applied controls
    J: np.ndarray          # (S,) solve costs
    accepted: np.ndarray   # (S,) solve successes
    solve_times: np.ndarray  # (S,) wall seconds per MPC step


def run_lockstep_mpc(
    controller: MPCController,
    sim: PlantSimulator,
    x_start: np.ndarray,
    duration: float,
    goal_fn: Callable[[float], object],
    control_period: float = 0.01,
    weights: Optional[CostWeights] = None,
    use_feedback: bool = True,
) -> LockstepResult:
    """Closed loop: every `control_period` run one MPC solve; between solves the
    trajectory runner applies u - K dx at the simulator rate."""
    import time as _time

    x = np.asarray(x_start, np.float32)
    t = 0.0
    st: MPCState = controller.init_state(x, t0=0.0, goal=goal_fn(0.0), weights=weights)

    ts, xs, us, js, accs, wall = [], [], [], [], [], []
    steps_per_solve = max(1, int(round(control_period / sim.dt)))
    n_solves = int(duration / control_period)

    for s_i in range(n_solves):
        t0 = _time.perf_counter()
        st, info = controller.step(st, x, t, goal_fn(t), weights)
        jax.block_until_ready(st.x)
        wall.append(_time.perf_counter() - t0)
        js.append(float(info.J))
        accs.append(bool(info.accepted))

        traj = TrajHandoff(
            x=np.asarray(st.x), u=np.asarray(st.u), K=np.asarray(st.K),
            t0=float(st.t0), dt=controller.cfg.dt,
        )
        for _ in range(steps_per_solve):
            u_out, ok = get_hardware_controls(traj, t, x, use_feedback=use_feedback)
            if not ok:
                u_out = np.zeros(controller.plant.n_ctrl, np.float32)
            ts.append(t)
            xs.append(x.copy())
            us.append(u_out.copy())
            x = sim.step(x, u_out)
            t += sim.dt

    return LockstepResult(
        t=np.asarray(ts), x=np.asarray(xs), u=np.asarray(us),
        J=np.asarray(js), accepted=np.asarray(accs), solve_times=np.asarray(wall),
    )
