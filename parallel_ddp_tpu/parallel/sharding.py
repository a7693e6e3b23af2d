"""Multi-chip scale-out: scenario batching over a device mesh.

The reference scales across machines with LCM pub/sub (one solver process per
box, LCMHelpers.cuh); the TPU-native model is data-parallel *scenario batching*:
thousands of warm-started MPC problems vmapped into one program and sharded
over a `jax.sharding.Mesh` ('dp' axis), with XLA inserting any needed
collectives over ICI.  See BASELINE.json config 5.

Mesh convention: axis 'dp' shards independent scenarios; axis 'sp' is reserved
for horizon (shooting-block) sharding of a single large problem — this
workload's sequence-parallel analog (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parallel_ddp_tpu.config import CostWeights, SolverConfig
from parallel_ddp_tpu.costs.base import CostModel
from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.solver import make_ilqr_solver


def make_mesh(n_devices: Optional[int] = None, axis_names=("dp",)) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def make_batched_solver(
    plant: Plant,
    cost: CostModel,
    cfg: SolverConfig,
    mesh: Mesh,
    batch_axis: str = "dp",
    initial_rollout: bool = True,
):
    """Return solve_batch(x0s, u0s, goals, weights) with the scenario axis
    sharded over `batch_axis`.

    x0s: (B, N, n), u0s: (B, N, m), goals: pytree with leading B on each leaf.
    Each scenario is an independent warm-startable solve with ZERO
    cross-scenario communication, so the partitioning is stated manually with
    shard_map (local vmap per device) rather than left to the GSPMD
    partitioner: sharding-annotated vmap over a while_loop let the partitioner
    replicate the loop carry, turning the embarrassingly-parallel batch into
    per-iteration all-gathers (10x wall time at dp=8 on the virtual mesh —
    benchmarks/mesh_scaling.py caught it; shard_map makes zero-collective a
    structural guarantee, not a partitioner mood).
    """
    solver = make_ilqr_solver(plant, cost, cfg)
    S = mesh.shape[batch_axis]

    def _local(x0s_l, u0s_l, goals_l, weights):
        return jax.vmap(
            lambda x0, u0, g: solver(
                x0, u0, g, weights, initial_rollout=initial_rollout
            )
        )(x0s_l, u0s_l, goals_l)

    shard_b = P(batch_axis)
    rep = P()

    def solve_batch(x0s, u0s, goals, weights: Optional[CostWeights] = None):
        if x0s.shape[0] % S:
            raise ValueError(
                f"batch {x0s.shape[0]} not divisible by the "
                f"'{batch_axis}' axis size {S}"
            )
        w = weights if weights is not None else CostWeights()
        goal_spec = jax.tree_util.tree_map(lambda _: shard_b, goals)
        w_spec = jax.tree_util.tree_map(lambda _: rep, w)
        out_spec = jax.tree_util.tree_map(
            lambda _: shard_b, jax.eval_shape(_local, x0s, u0s, goals, w)
        )
        fn = jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(shard_b, shard_b, goal_spec, w_spec),
            out_specs=out_spec,
            check_vma=False,
        )
        return fn(jnp.asarray(x0s), jnp.asarray(u0s), goals, w)

    return jax.jit(solve_batch)
