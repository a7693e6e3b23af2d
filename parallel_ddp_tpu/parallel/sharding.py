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
    Each scenario is an independent warm-startable solve; XLA partitions the
    vmapped program across the mesh with no cross-scenario communication.
    """
    solver = make_ilqr_solver(plant, cost, cfg)

    def _one(x0, u0, goal, weights):
        return solver(
            x0, u0, goal, weights, initial_rollout=initial_rollout
        )

    batched = jax.vmap(_one, in_axes=(0, 0, 0, None))

    shard_b = NamedSharding(mesh, P(batch_axis))
    rep = NamedSharding(mesh, P())

    def solve_batch(x0s, u0s, goals, weights: Optional[CostWeights] = None):
        w = weights if weights is not None else CostWeights()
        x0s = jax.device_put(x0s, shard_b)
        u0s = jax.device_put(u0s, shard_b)
        goals = jax.tree_util.tree_map(lambda a: jax.device_put(a, shard_b), goals)
        return batched(x0s, u0s, goals, w)

    return jax.jit(solve_batch)
