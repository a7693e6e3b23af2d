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
    # Dynamics core selection — identical math (cross-validated in tests),
    # different trace structure:
    #   "soa"  scalar-channel unrolled core (soa.py): fuses into ~10x fewer XLA
    #          kernels — the solve is kernel-LAUNCH-bound on TPU, so this is
    #          the TPU production core.  Its jacfwd graph is pathological for
    #          the XLA *CPU* pipeline (one N=8 solve: 482 s compile; a single
    #          step Jacobian alone >570 s measured).
    #   "rbd"  spatial-algebra vector core (rbd.py): small jnp matmuls; CPU
    #          step-Jacobian compiles in ~11 s.  The CPU/test/dryrun core.
    #   "pallas" per-sample ops as "soa"/"rbd" (TPU/other), but the solver's
    #          derivative stage (the AB Jacobians over the whole horizon) runs
    #          through the fused Pallas RBD kernels (ops/pallas_rbd.py
    #          make_kuka_ab_pallas): one dynamics + one Jacobian kernel per
    #          Butcher stage for the entire time batch.
    #   "auto" soa on TPU, rbd elsewhere.
    core: str = "auto"

    def resolved_core(self) -> str:
        return resolve_core(self.core, allow_pallas=True)


def resolve_core(core: str, allow_pallas: bool = False) -> str:
    """Shared backend-selection policy: 'auto' = the scalar-channel core on
    TPU, the vector core elsewhere (used by KukaParams AND urdf_plant so the
    two never drift)."""
    allowed = {"auto", "soa", "rbd"} | ({"pallas"} if allow_pallas else set())
    if core not in allowed:
        raise ValueError(f"unknown core {core!r}; expected one of {sorted(allowed)}")
    if core != "auto":
        return core
    import jax

    return "soa" if jax.default_backend() == "tpu" else "rbd"


@functools.lru_cache(maxsize=8)
def _rbd(ee_type: int, gravity: float, core: str):
    return (KukaSoA if core == "soa" else KukaRBD)(ee_type=ee_type, gravity=gravity)


def kuka_params(mpc_mode: bool = False, ee_type: int = 1,
                core: str = "auto") -> KukaParams:
    return KukaParams(ee_type=ee_type, gravity=0.0 if mpc_mode else 9.81, core=core)


def kuka(params: KukaParams | None = None) -> Plant:
    params = params or KukaParams()
    core = params.resolved_core()
    batched_step_jac = None
    fused_rollout = None
    if core == "pallas":
        from parallel_ddp_tpu.ops.pallas_rbd import make_kuka_ab_pallas
        from parallel_ddp_tpu.ops.pallas_rollout import make_kuka_fused_rollout

        import jax

        # per-sample ops (rollouts, EE kinematics) keep the per-backend core;
        # the batched derivative stage AND the multiple-shooting forward sim
        # route through the fused Pallas kernels
        per_sample = "soa" if jax.default_backend() == "tpu" else "rbd"
        rbd = _rbd(params.ee_type, params.gravity, per_sample)

        def batched_step_jac(integrator, dt, _p=params):
            return make_kuka_ab_pallas(_p.ee_type, _p.gravity, integrator, dt)

        def fused_rollout(integrator, dt, num_time_steps, m_blocks_f,
                          num_alpha, _p=params):
            # off-TPU there is nothing to fuse (no dispatch cost to save and
            # interpret-mode would crawl); the XLA scan path is used instead.
            # Correctness of the kernel itself is covered in interpret mode
            # by tests/test_pallas_rollout.py.
            if jax.default_backend() != "tpu":
                return None
            return make_kuka_fused_rollout(
                _p.ee_type, _p.gravity, integrator, dt,
                num_time_steps, m_blocks_f, num_alpha,
            )

    else:
        rbd = _rbd(params.ee_type, params.gravity, core)

    def dynamics(x, u):
        return rbd.forward_dynamics(x, u)

    def ee_pos(q):
        return rbd.ee_pose(q)

    def ee_vel(x):
        return rbd.ee_velocity(x)

    return Plant(
        name=f"kuka_ee{params.ee_type}_g{params.gravity:g}_{core}",
        n_pos=7,
        n_ctrl=7,
        dynamics=dynamics,
        ee_pos=ee_pos,
        ee_vel=ee_vel,
        rho_init_default=12.5,
        max_defect_default=1.0,
        alpha_base_default=0.5,
        num_alpha_default=16,
        batched_step_jac=batched_step_jac,
        fused_rollout=fused_rollout,
    )
