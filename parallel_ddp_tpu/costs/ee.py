"""End-effector pose cost family (cost_arm.cuh:204-390).

cost(k) = eeCost + 0.5*R_EE*|u|^2 (non-terminal) + nominal-state regularizer
          [+ joint pos/vel/torque limit penalties]

  eeCost = 0.5 * sum_i w_i(k) * (eePos_i - goal_i)^2   (+ EE-velocity terms)
           with w = (Q_EE1 xyz, Q_EE2 rpy) running / (QF_EE1, QF_EE2) for
           k >= N-1-final_cost_shift (cost_arm.cuh:206-222)
  smooth-abs option: eeCost -> sqrt(2*eeCost + a^2) - a (cost_arm.cuh:218-221)
  nominal state: 0.5*(Q_xEE*|q - qt|^2 + Q_xdEE*|qd - qdt|^2), terminal switches
           on k == N-1 (cost_arm.cuh:256-263)
  limit penalties: quadPen(v, limit) = 0.5*max(|v|-limit, 0)^2 scaled by
           Q_PL/Q_VL/R_TL (cost_arm.cuh:66-93)

Gradient matches `costGrad`/`deeCost` exactly (cost_arm.cuh:224-254, 317-389);
the Hessian uses the reference's Gauss-Newton form H_qq = deePos^T @ deePos —
deliberately UNWEIGHTED, reproducing the commented-out `*factor` in
cost_arm.cuh:358,366 — plus the diagonal nominal/control/limit second derivatives.

The EE Jacobian deePos = d(eePos)/dq comes from `jax.jacfwd` of the plant's
forward kinematics; the EE velocity is eeVel = deePos(q) @ qd, which is the
correct twist for all six components (the reference's rpy eeVel derivatives are
broken, README.md:38 — we implement the exact ones).

goal pytree: {"ee_goal": (6,), "x_target": (n_state,)}  (x_target ignored when
q_xee = qf_xee = q_xdee = qf_xdee = 0).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from parallel_ddp_tpu.config import CostWeights
from parallel_ddp_tpu.costs.base import CostModel


def _quad_pen(v, limit):
    """0.5*max(|v|-limit,0)^2 and its first/second derivatives (cost_arm.cuh:66-77)."""
    delta = jnp.abs(v) - limit
    active = delta > 0
    pen = jnp.where(active, 0.5 * delta * delta, 0.0)
    dpen = jnp.where(active, jnp.sign(v) * delta, 0.0)
    d2pen = jnp.where(active, 1.0, 0.0)
    return pen, dpen, d2pen


def ee_cost(
    ee_pos: Callable,
    n_pos: int,
    n_ctrl: int,
    num_time_steps: int,
    use_smooth_abs: bool = False,
    smooth_abs_alpha: float = 0.2,
    use_ee_vel: bool = False,
    use_limits: bool = False,
    pos_limits: Optional[jnp.ndarray] = None,
    vel_limits: Optional[jnp.ndarray] = None,
    torque_limits: Optional[jnp.ndarray] = None,
    final_cost_shift: int = 0,
) -> CostModel:
    """Build the EE cost model around a forward-kinematics map q -> (6,) pose."""

    nf = num_time_steps - 1
    n_state = 2 * n_pos
    dee = jax.jacfwd(ee_pos)  # (6, n_pos)

    def _ee_weights(k, w: CostWeights, goal=None):
        # final-cost-shift (USE_COST_SHIFT, cost_arm.cuh:206-222): terminal EE
        # weights switch on `cost_shift` steps before the horizon end.  A LIVE
        # (traced) value in the goal pytree overrides the static default, so
        # lcmt_solver_params-style useCostShift updates apply per-solve without
        # recompiling (LCMHelpers.cuh:213).
        shift = final_cost_shift
        if isinstance(goal, dict) and "cost_shift" in goal:
            shift = goal["cost_shift"]
        terminal = k >= nf - shift
        w_pos = jnp.where(
            terminal,
            jnp.concatenate([jnp.full((3,), w.qf_ee1), jnp.full((3,), w.qf_ee2)]),
            jnp.concatenate([jnp.full((3,), w.q_ee1), jnp.full((3,), w.q_ee2)]),
        )
        w_vel = jnp.where(
            terminal,
            jnp.concatenate([jnp.full((3,), w.qf_eev1), jnp.full((3,), w.qf_eev2)]),
            jnp.concatenate([jnp.full((3,), w.q_eev1), jnp.full((3,), w.q_eev2)]),
        )
        return w_pos, w_vel

    def _vel_goal(goal):
        """EE-velocity goal (zero unless a twist goal provides one — the fixed
        version of handleGoalEE's slot-reuse, LCMHelpers.cuh:195-197)."""
        if isinstance(goal, dict) and "ee_vel_goal" in goal:
            return goal["ee_vel_goal"]
        return 0.0

    def _ee_terms(x, k, goal, w):
        q, qd = x[:n_pos], x[n_pos:]
        ee = ee_pos(q)
        delta = ee - goal["ee_goal"]
        w_pos, w_vel = _ee_weights(k, w, goal)
        quad = jnp.sum(w_pos * delta * delta)
        if use_ee_vel:
            jac = dee(q)
            eev = jac @ qd - _vel_goal(goal)
            quad = quad + jnp.sum(w_vel * eev * eev)
        return 0.5 * quad, delta, w_pos, w_vel

    def _limit_terms(x, u, w, level):
        """Sum of quadPen penalties (level 0) or their grad diag (1) / hess diag (2)."""
        q, qd = x[:n_pos], x[n_pos:]
        pq, dq_, d2q = _quad_pen(q, pos_limits)
        pv, dv, d2v = _quad_pen(qd, vel_limits)
        pt, dt_, d2t = _quad_pen(u, torque_limits)
        if level == 0:
            return w.q_pl * jnp.sum(pq) + w.q_vl * jnp.sum(pv) + w.r_tl * jnp.sum(pt)
        if level == 1:
            return jnp.concatenate([w.q_pl * dq_, w.q_vl * dv, w.r_tl * dt_])
        return jnp.concatenate([w.q_pl * d2q, w.q_vl * d2v, w.r_tl * d2t])

    def _nominal_weights(k, w: CostWeights):
        terminal = k == nf
        qq = jnp.where(terminal, w.qf_xee, w.q_xee)
        qqd = jnp.where(terminal, w.qf_xdee, w.q_xdee)
        return qq, qqd

    def stage(x, u, k, goal, w: CostWeights):
        ee_c, _, _, _ = _ee_terms(x, k, goal, w)
        if use_smooth_abs:
            a = smooth_abs_alpha
            ee_c = jnp.sqrt(2.0 * ee_c + a * a) - a
        rk = jnp.where(k == nf, 0.0, w.r_ee)
        cost = ee_c + 0.5 * rk * jnp.sum(u * u)
        qq, qqd = _nominal_weights(k, w)
        dxt = x - goal["x_target"]
        cost = cost + 0.5 * (
            qq * jnp.sum(dxt[:n_pos] ** 2) + qqd * jnp.sum(dxt[n_pos:] ** 2)
        )
        if use_limits:
            cost = cost + _limit_terms(x, u, w, 0)
        return cost

    def quad(x, u, k, goal, w: CostWeights):
        q, qd = x[:n_pos], x[n_pos:]
        ee_c, delta, w_pos, w_vel = _ee_terms(x, k, goal, w)
        jac = dee(q)  # (6, n_pos)

        # gradient of the EE term w.r.t. x (cost_arm.cuh:224-254)
        g_ee_q = (w_pos * delta) @ jac  # (n_pos,)
        g_ee_qd = jnp.zeros((n_pos,))
        if use_ee_vel:
            eev = jac @ qd - _vel_goal(goal)
            # d(eeVel)/dq via jacfwd of q -> dee(q) @ qd, d(eeVel)/dqd = jac
            deev_dq = jax.jacfwd(lambda qq_: dee(qq_) @ qd)(q)  # (6, n_pos)
            g_ee_q = g_ee_q + (w_vel * eev) @ deev_dq
            g_ee_qd = (w_vel * eev) @ jac
        g_ee_x = jnp.concatenate([g_ee_q, g_ee_qd])
        if use_smooth_abs:
            a = smooth_abs_alpha
            g_ee_x = g_ee_x / jnp.sqrt(2.0 * ee_c + a * a)

        qq, qqd = _nominal_weights(k, w)
        dxt = x - goal["x_target"]
        g_nom = jnp.concatenate([qq * dxt[:n_pos], qqd * dxt[n_pos:]])
        rk = jnp.where(k == nf, 0.0, w.r_ee)
        g_u = rk * u
        g = jnp.concatenate([g_ee_x + g_nom, g_u])
        if use_limits:
            g = g + _limit_terms(x, u, w, 1)

        # Gauss-Newton Hessian: UNWEIGHTED J^T J in the q (or full-x with EE vel)
        # block (cost_arm.cuh:347-380 with `*factor` commented out)
        h = jnp.zeros((n_state + n_ctrl, n_state + n_ctrl))
        if use_ee_vel:
            deev_dq = jax.jacfwd(lambda qq_: dee(qq_) @ qd)(q)
            jpv = jnp.block(
                [[jac, jnp.zeros((6, n_pos))], [deev_dq, jac]]
            )  # (12, n_state)
            h = h.at[:n_state, :n_state].set(jpv.T @ jpv)
        else:
            h = h.at[:n_pos, :n_pos].set(jac.T @ jac)
        diag_nom = jnp.concatenate(
            [jnp.full((n_pos,), qq), jnp.full((n_pos,), qqd), jnp.full((n_ctrl,), rk)]
        )
        h = h + jnp.diag(diag_nom)
        if use_limits:
            h = h + jnp.diag(_limit_terms(x, u, w, 2))
        return h, g

    return CostModel(name="ee_cost", stage=stage, quad=quad)


# Kuka iiwa-14 limits (cost_arm.cuh:12-25, safety factor 0.8 applied).
# Numpy on purpose: these are captured by jitted cost closures, and captured
# DEVICE arrays hit the axon tunnel's pathological dispatch path (config.py).
import numpy as _np

KUKA_POS_LIMITS = _np.asarray(
    [2.96705972839, 2.09439510239, 2.96705972839, 2.09439510239, 2.96705972839,
     2.09439510239, 3.05432619099], _np.float32
) * 0.8
KUKA_VEL_LIMITS = _np.asarray(
    [1.483529, 1.483529, 1.745329, 1.308996, 2.268928, 2.356194, 2.356194],
    _np.float32
) * 0.8
KUKA_TORQUE_LIMITS = _np.full((7,), 300.0, _np.float32) * 0.8
