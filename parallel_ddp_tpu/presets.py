"""Ready-made (plant, cost, config) problem setups mirroring the reference examples.

These correspond to the benchmark configs in BASELINE.json and the example
binaries in the reference (examples/WAFR_iLQR_examples.cu, LCM_fig8_examples.cu).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from parallel_ddp_tpu.config import CostWeights, SolverConfig
from parallel_ddp_tpu.costs.base import CostModel
from parallel_ddp_tpu.costs.ee import (
    KUKA_POS_LIMITS,
    KUKA_TORQUE_LIMITS,
    KUKA_VEL_LIMITS,
    ee_cost,
)
from parallel_ddp_tpu.costs.joint import (
    cartpole_cost,
    joint_cost,
    pendulum_cost,
    quadrotor_cost,
)
from parallel_ddp_tpu.models import cartpole, pendulum, quadrotor
from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.models.kuka import kuka, kuka_params


class Problem(NamedTuple):
    plant: Plant
    cost: CostModel
    cfg: SolverConfig


def pendulum_swingup(num_time_steps=128, total_time=4.0, m_blocks=4, num_alpha=16):
    cfg = SolverConfig(
        num_time_steps=num_time_steps, total_time=total_time,
        m_blocks_b=m_blocks, m_blocks_f=m_blocks, num_alpha=num_alpha,
        alpha_base=0.75, integrator=3, rho_init=10.0,
    )
    return Problem(pendulum(), pendulum_cost(num_time_steps), cfg)


def cartpole_swingup(num_time_steps=128, total_time=4.0, m_blocks=4, num_alpha=32):
    cfg = SolverConfig(
        num_time_steps=num_time_steps, total_time=total_time,
        m_blocks_b=m_blocks, m_blocks_f=m_blocks, num_alpha=num_alpha,
        alpha_base=0.75, integrator=3, rho_init=10.0, max_defect_size=0.75,
    )
    return Problem(cartpole(), cartpole_cost(num_time_steps), cfg)


def quadrotor_task(num_time_steps=128, total_time=4.0, m_blocks=4, num_alpha=16):
    cfg = SolverConfig(
        num_time_steps=num_time_steps, total_time=total_time,
        m_blocks_b=m_blocks, m_blocks_f=m_blocks, num_alpha=num_alpha,
        alpha_base=0.5, integrator=3, rho_init=1.0,
    )
    return Problem(quadrotor(), quadrotor_cost(num_time_steps), cfg)


def kuka_joint(num_time_steps=64, total_time=0.5, m_blocks=4, num_alpha=16,
               integrator=1, mpc_mode=False):
    """Kuka N=64 joint-space problem — the WAFR benchmark scale (config.cuh:43-58)."""
    plant = kuka(kuka_params(mpc_mode=mpc_mode))
    cfg = SolverConfig(
        num_time_steps=num_time_steps, total_time=total_time,
        m_blocks_b=m_blocks, m_blocks_f=m_blocks, num_alpha=num_alpha,
        alpha_base=0.5, integrator=integrator, rho_init=12.5,
    )
    return Problem(plant, joint_cost("kuka_joint", num_time_steps, 7, 7), cfg)


def kuka_ee(num_time_steps=64, total_time=0.5, m_blocks=4, num_alpha=16,
            integrator=1, mpc_mode=True, use_smooth_abs=False, use_limits=False,
            use_ee_vel=False):
    """Kuka EE-pose tracking problem (the MPC figure-8 config; EE_COST=1,
    examples/LCM_fig8_examples.cu)."""
    plant = kuka(kuka_params(mpc_mode=mpc_mode))
    cfg = SolverConfig(
        num_time_steps=num_time_steps, total_time=total_time,
        m_blocks_b=m_blocks, m_blocks_f=m_blocks, num_alpha=num_alpha,
        alpha_base=0.5, integrator=integrator, rho_init=12.5,
        ee_cost=True, use_smooth_abs=use_smooth_abs, use_limits=use_limits,
    )
    cost = ee_cost(
        plant.ee_pos, 7, 7, num_time_steps,
        use_smooth_abs=use_smooth_abs,
        smooth_abs_alpha=cfg.smooth_abs_alpha,
        use_ee_vel=use_ee_vel,
        use_limits=use_limits,
        pos_limits=KUKA_POS_LIMITS,
        vel_limits=KUKA_VEL_LIMITS,
        torque_limits=KUKA_TORQUE_LIMITS,
    )
    return Problem(plant, cost, cfg)


def ee_goal(xyz, rpy=(0.0, 0.0, 0.0), x_target=None):
    """Goal pytree for the EE cost family."""
    return {
        "ee_goal": jnp.concatenate([jnp.asarray(xyz, jnp.float32),
                                    jnp.asarray(rpy, jnp.float32)]),
        "x_target": (jnp.zeros((14,), jnp.float32) if x_target is None
                     else jnp.asarray(x_target, jnp.float32)),
    }


def figure8_ee_goals(t, total_period=10.0, center=(0.0, -0.55, 0.35),
                     width=0.4, height=0.24):
    """Figure-8 EE goal at time(s) t (the WAFR/ICRA hardware task,
    examples/LCM_fig8_examples.cu — a lemniscate in the y-z plane in front of
    the arm; dimensions from the papers' ~0.8 m x 0.5 m figure)."""
    t = np.asarray(t)
    phase = 2.0 * np.pi * (t / total_period)
    x = center[0] + width * np.sin(phase)
    z = center[2] + height * np.sin(2.0 * phase)
    y = np.full_like(x, center[1])
    return np.stack([x, y, z], axis=-1)
