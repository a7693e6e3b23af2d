"""The FULL kernel-path solver under sp horizon sharding (VERDICT r4 #8).

The production TPU program routes the derivative stage through the fused
Pallas RBD dynamics+Jacobian kernels, the forward rollout through the fused
Pallas rollout kernel, and (optionally) the backward sweep through the fused
Pallas Riccati kernel.  On a real pod that whole composition runs INSIDE the
sp shard_map chunks with boundary collectives around it — this test executes
exactly that program on the virtual 8-CPU mesh (kernels in interpret mode)
and cross-checks J against the dp-batched vector-core solve of the same
problem.

`slow`: the RBD Jacobian kernel body is a ~10^5-op unrolled scalar-channel
graph; the XLA:CPU pipeline needs tens of minutes to compile it inside the
sharded solver (the TPU pipeline handles it in seconds — this cost is an
artifact of the CPU test backend, see models/kuka/model.py core='auto').
__graft_entry__.py::dryrun_multichip carries the cheap subset (fused Riccati
under sp) so the driver-run validation stays fast.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_ddp_tpu.parallel.sharding import make_batched_solver, make_mesh
from parallel_ddp_tpu.parallel.sp import make_sp_solver
from parallel_ddp_tpu.presets import ee_goal, kuka_ee

pytestmark = pytest.mark.slow


def test_sp_kernel_path_matches_dp():
    prob = kuka_ee(num_time_steps=8, m_blocks=2, num_alpha=2)
    cfg = dataclasses.replace(prob.cfg, max_iter=1)
    n = cfg.num_time_steps
    x0 = jnp.zeros((n, 14), jnp.float32)
    u0 = jnp.zeros((n, 7), jnp.float32)
    goal = ee_goal([0.3, -0.5, 0.4])

    # vector-core dp solve = the cross-check oracle
    mesh = make_mesh(2)
    solve_dp = make_batched_solver(prob.plant, prob.cost, cfg, mesh)
    goals = {k: jnp.tile(v[None], (2, 1)) for k, v in goal.items()}
    out_dp = solve_dp(jnp.tile(x0[None], (2, 1, 1)),
                      jnp.tile(u0[None], (2, 1, 1)), goals)
    j_ref = float(out_dp.J[0])

    # kernel-path sp solve: Pallas RBD + rollout + Riccati inside shard_map
    prob_k = kuka_ee(num_time_steps=8, m_blocks=2, num_alpha=2, core="pallas")
    cfg_k = dataclasses.replace(prob_k.cfg, max_iter=1, pallas_riccati=True)
    sp_mesh = make_mesh(2, axis_names=("sp",))
    sp_solver = make_sp_solver(prob_k.plant, prob_k.cost, cfg_k, sp_mesh)
    out_sp = sp_solver(x0, u0, goal, initial_rollout=True)
    jax.block_until_ready(out_sp)

    assert bool(jnp.isfinite(out_sp.J))
    np.testing.assert_allclose(float(out_sp.J), j_ref, rtol=1e-2)
