"""Cost model protocol.

A cost model provides the running/terminal cost and its (state+control) gradient and
Hessian at one knot point — the reference's per-plant `costFunc` / `costGrad` contract
(cost_pend.cuh:27-55, cost_arm.cuh:126-390).  `k` is the knot index; terminal behavior
switches on k == N-1 inside the functions (N is baked in at construction).  `goal` is an
opaque pytree interpreted by the specific model (joint-space: goal state xg; EE: the
6-D pose goal + optional nominal state target).  `w: CostWeights` is traced, so weight
updates never recompile (the reference's LCM-tunable weights, LCMHelpers.cuh:204-214).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

from parallel_ddp_tpu.config import CostWeights


@dataclasses.dataclass(frozen=True)
class CostModel:
    """stage(x, u, k, goal, w) -> scalar;  quad(x, u, k, goal, w) -> (H, g).

    H is (n_state+n_ctrl, n_state+n_ctrl), g is (n_state+n_ctrl,), blocks ordered
    [x; u] (the reference's H/g layout, config.cuh:207-222).
    """

    name: str
    stage: Callable[[jnp.ndarray, jnp.ndarray, Any, Any, CostWeights], jnp.ndarray]
    quad: Callable[[jnp.ndarray, jnp.ndarray, Any, Any, CostWeights], tuple]

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, CostModel) and self.name == other.name
