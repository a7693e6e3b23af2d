"""Kuka iiwa-14 Plant wrapper (PLANT == 4 in the reference, config.cuh:43-58)."""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp

from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.models.kuka.rbd import KukaRBD
from parallel_ddp_tpu.models.kuka.soa import KukaSoA


@dataclasses.dataclass(frozen=True)
class KukaParams:
    ee_type: int = 1
    gravity: float = 9.81  # 0.0 reproduces MPC_MODE gravity-comp (dynamics_arm.cuh:42-46)
    # scalar-channel (structure-of-arrays) dynamics core: identical math to the
    # spatial-algebra rbd.py (cross-validated in tests) but fuses into ~10x
    # fewer XLA kernels — the solve is kernel-launch-bound on TPU (soa.py docstring)
    soa: bool = True


@functools.lru_cache(maxsize=8)
def _rbd(ee_type: int, gravity: float, soa: bool):
    return (KukaSoA if soa else KukaRBD)(ee_type=ee_type, gravity=gravity)


def kuka_params(mpc_mode: bool = False, ee_type: int = 1) -> KukaParams:
    return KukaParams(ee_type=ee_type, gravity=0.0 if mpc_mode else 9.81)


def kuka(params: KukaParams | None = None) -> Plant:
    params = params or KukaParams()
    rbd = _rbd(params.ee_type, params.gravity, params.soa)

    def dynamics(x, u):
        return rbd.forward_dynamics(x, u)

    def ee_pos(q):
        return rbd.ee_pose(q)

    def ee_vel(x):
        return rbd.ee_velocity(x)

    return Plant(
        name=f"kuka_ee{params.ee_type}_g{params.gravity:g}{'_soa' if params.soa else ''}",
        n_pos=7,
        n_ctrl=7,
        dynamics=dynamics,
        ee_pos=ee_pos,
        ee_vel=ee_vel,
        rho_init_default=12.5,
        max_defect_default=1.0,
        alpha_base_default=0.5,
        num_alpha_default=16,
    )
