"""Plant protocol.

The reference's plant contract (dynamics_pend.cuh:4-9): every plant provides
`dynamics` (joint accelerations) and `dynamicsGradient` (d qdd / d [x;u]).
Here a plant is a small frozen dataclass of pure functions; the gradient defaults
to `jax.jacfwd` of the dynamics — for closed-form plants XLA traces this to the
same analytic expressions the reference hand-derives, at zero runtime cost.
Plants with kinematics (the arm) additionally expose end-effector position /
velocity maps used by the EE cost family.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Plant:
    """A second-order plant: state x = [q; qd], control u, qdd = dynamics(x, u).

    Attributes:
      name: plant id.
      n_pos: number of generalized coordinates (NUM_POS).
      n_ctrl: number of controls (CONTROL_SIZE).
      dynamics: (x:(2*n_pos,), u:(n_ctrl,)) -> qdd:(n_pos,).
      dynamics_jac: optional hand-written (x, u) -> dqdd:(n_pos, 2*n_pos+n_ctrl);
        defaults to jacfwd of `dynamics`.
      ee_pos: optional (q:(n_pos,)) -> (6,) end-effector pose [xyz, rpy]
        (dynamics_arm.cuh:1879-1926).
      ee_vel: optional (x:(2*n_pos,)) -> (6,) end-effector twist.
      rho_init_default: per-plant default regularizer (config.cuh:24-58).
      max_defect_default: per-plant default defect bound.
      alpha_base_default / num_alpha_default: per-plant line-search defaults.
    """

    name: str
    n_pos: int
    n_ctrl: int
    dynamics: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    dynamics_jac: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None
    ee_pos: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    ee_vel: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    rho_init_default: float = 1.0
    max_defect_default: float = 1.0
    alpha_base_default: float = 0.75
    num_alpha_default: int = 32
    # Optional BATCHED discrete-Jacobian factory: (integrator, dt) ->
    # ab(xs:(B, n_state), us:(B, n_ctrl)) -> (B, n_state, n_state + n_ctrl).
    # When set, the solver's derivative stage calls it on the whole time axis at
    # once instead of vmapping the per-sample jacfwd — the hook that routes the
    # fused Pallas RBD kernels (ops/pallas_rbd.py) onto the production path.
    batched_step_jac: Optional[Callable[[int, float], Callable]] = None
    # Optional FUSED multiple-shooting rollout factory:
    # (integrator, dt, num_time_steps, m_blocks_f, num_alpha) ->
    # fused(x_swept, u, K, du, xp, alphas) -> (x_next_all, u_new_all),
    # or None if the shape doesn't fit the kernel's lane/VMEM budget.
    # Routes the whole forward simulation through ONE kernel per solve instead
    # of a per-step dispatch chain (ops/pallas_rollout.py — the reference's
    # fused forwardSimKern, fpHelpers.cuh:223-301).
    fused_rollout: Optional[
        Callable[[int, float, int, int, int], Callable]
    ] = None

    def __hash__(self):
        return hash((self.name, self.n_pos, self.n_ctrl))

    def __eq__(self, other):
        return isinstance(other, Plant) and (self.name, self.n_pos, self.n_ctrl) == (
            other.name,
            other.n_pos,
            other.n_ctrl,
        )

    @property
    def n_state(self) -> int:
        return 2 * self.n_pos

    def qdd_jacobian(self) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        """d qdd / d [x; u] as an (n_pos, n_state + n_ctrl) matrix.

        The reference's `dynamicsGradient` contract (dynamics_pend.cuh:40-52).
        """
        if self.dynamics_jac is not None:
            return self.dynamics_jac

        def jac(x, u):
            dx, du = jax.jacfwd(self.dynamics, argnums=(0, 1))(x, u)
            return jnp.concatenate([dx, du], axis=1)

        return jac
