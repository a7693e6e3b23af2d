"""Device-resident closed-loop MPC: controller + plant fused in one program.

The reference's lockstep MPC test runs solver and simulated plant in-process,
alternating solve and integrate (testMPC_lockstep, WAFR_MPC_examples.cu:105-238).
Here the ENTIRE loop — warm-start shift, budgeted iLQR re-solve, kHz
trajectory-runner control law, plant integration, tracking-error metric — is
one `lax.scan` under `jit`: zero host round-trips for the whole experiment,
results read once at the end.

This matters twice on TPU: (a) it is how a TPU-native stack should co-simulate
(the host is only an I/O plane); (b) on this development environment the TPU
is reached over a ~24 ms network tunnel, so any per-step host read would
benchmark the network, not the framework.

The per-control-step goal stream (e.g. the WAFR figure-8 path) is passed as an
array argument, so moving goals do not recompile.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from parallel_ddp_tpu.config import CostWeights
from parallel_ddp_tpu.mpc.driver import MPCController, MPCState
from parallel_ddp_tpu.ops.integrators import make_step


class DeviceLoopResult(NamedTuple):
    x: jnp.ndarray          # (T, n_state) plant state at each control step end
    ee_err: jnp.ndarray     # (T,) EE xyz tracking error (if plant has ee_pos)
    J: jnp.ndarray          # (T,) solve cost
    accepted: jnp.ndarray   # (T,) bool
    ok: jnp.ndarray         # (T,) accepted or converged/feasible
    state: MPCState         # final device-resident solver state


def get_hardware_controls_jax(traj_x, traj_u, traj_K, t0, dt, t, x_meas,
                              use_feedback: bool = True):
    """Traceable twin of mpc/controls.get_hardware_controls: index the
    trajectory by wall clock, FOH on x, ZOH on u/K, u = u_k - K_k (x - x_ref)
    (getHardwareControls, MPCHelpers.cuh:817-858).  Clamps at the trajectory
    end instead of failing loudly (the fused loop replans every step, so the
    end is never reached in normal operation)."""
    n = traj_x.shape[0]
    rel = (t - t0) / dt
    ind = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, n - 2)
    frac = jnp.clip(rel - ind.astype(rel.dtype), 0.0, 1.0)
    x_ref = (1.0 - frac) * traj_x[ind] + frac * traj_x[ind + 1]
    u = traj_u[ind]
    if use_feedback:
        u = u - traj_K[ind] @ (x_meas - x_ref)
    return u


def make_device_mpc_loop(
    ctrl: MPCController,
    sim_rate_hz: float = 1000.0,
    control_period_s: float = 0.01,
    sim_integrator: int = 1,
    use_feedback: bool = True,
):
    """Build run(state, x0, t0, goals, weights) -> DeviceLoopResult.

    goals: goal pytree with a leading (T,) axis — goal[i] is active during
    control step i (the figure-8 goal handler pattern,
    LCM_fig8_examples.cu:140-190).  T control steps of `control_period_s`,
    each containing round(control_period * sim_rate) plant substeps."""
    plant = ctrl.plant
    sim_dt = 1.0 / sim_rate_hz
    substeps = max(1, int(round(control_period_s * sim_rate_hz)))
    sim_step = make_step(plant, sim_integrator, sim_dt)
    has_ee = plant.ee_pos is not None
    n_pos = plant.n_pos

    def one_control_step(w, carry, goal):
        st, x_sim, t = carry

        st, info = ctrl._mpc_step(
            st, x_sim, t, goal, w,
            jnp.asarray(ctrl.mpc.max_iters_per_solve, jnp.int32),
        )

        def substep(c, _):
            x, tt = c
            u = get_hardware_controls_jax(
                st.x, st.u, st.K, st.t0, ctrl.cfg.dt, tt, x, use_feedback
            )
            return (sim_step(x, u), tt + sim_dt), None

        (x_sim, t), _ = lax.scan(substep, (x_sim, t), None, length=substeps)

        if has_ee:
            ee = plant.ee_pos(x_sim[:n_pos])[:3]
            tgt = goal["ee_goal"][:3] if isinstance(goal, dict) else goal[:3]
            err = jnp.linalg.norm(ee - tgt)
        else:
            err = jnp.linalg.norm(x_sim - (goal if not isinstance(goal, dict)
                                           else goal["x_target"]))
        out = (x_sim, err, info.J, info.accepted, info.ok)
        return (st, x_sim, t), out

    def run(st: MPCState, x0, t0, goals, weights: Optional[CostWeights] = None):
        w = weights if weights is not None else CostWeights()
        x0 = jnp.asarray(x0, jnp.float32)
        (st_f, _, _), (xs, errs, js, accs, oks) = lax.scan(
            lambda c, g: one_control_step(w, c, g),
            (st, x0, jnp.asarray(t0, jnp.float32)),
            goals,
        )
        return DeviceLoopResult(xs, errs, js, accs, oks, st_f)

    return jax.jit(run)
