"""parallel_ddp_tpu — a TPU-native parallel DDP/iLQR trajectory-optimization and MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of plancherb1/parallel-DDP
(WAFR 2018 / ICRA 2019): parallel iLQR with a block-parallel backward pass, multiple-shooting
forward pass with defect handling, batched parallel line search, warm-started real-time MPC,
analytic plants (pendulum, cart-pole, quadrotor) and the Kuka iiwa-14 arm with full rigid-body
dynamics and analytic gradients, Euler/Midpoint/RK3 integrators, and joint-space /
end-effector-pose cost families.

Design stance (TPU-first, not a port):
  * the whole solver iteration runs inside one `jit` with `lax.while_loop` outer iterations —
    no host round-trips (the reference's per-phase kernel launches + host line-search scan,
    DDPWrappers.cuh:52-114, become a single compiled program);
  * line-search alphas, shooting blocks and backward-pass blocks are `vmap` axes (the
    reference's CUDA grid dims, fpHelpers.cuh:366, bpHelpers.cuh:492);
  * the forward "sweep" linear recurrence is a `lax.associative_scan` (log-depth in the
    horizon instead of the reference's serial loop, fpHelpers.cuh:17-53);
  * scenario batching scales over a `jax.sharding.Mesh` via shard_map/psum instead of
    LCM pub/sub (LCMHelpers.cuh).
"""

import os as _os

import jax as _jax

# NOTE: importing this package adjusts two PROCESS-GLOBAL JAX settings (matmul
# precision, compilation cache).  Both are skipped if the user configured them
# first, and both can be disabled wholesale with PARALLEL_DDP_TPU_NO_CONFIG=1.
if _os.environ.get("PARALLEL_DDP_TPU_NO_CONFIG", "0") != "1":
    # Every matrix in this workload is tiny (<= 14x14 state blocks, 7x7 mass
    # matrices): on TPU the MXU's default one-pass-bf16 fp32 matmul (~8e-3
    # relative error) destroys the Riccati/RBD numerics that iLQR convergence
    # semantics depend on, while costing nothing at these dims — throughput
    # comes from batching over (alpha, shooting-block, scenario) axes, not from
    # bf16.  (The solver entries also scope this locally; the global default
    # protects user-written rollout/cost code composed with ours.)
    if _jax.config.jax_default_matmul_precision is None:
        _jax.config.update("jax_default_matmul_precision", "highest")

    # The unrolled scalar-channel dynamics (models/kuka/soa.py) trade compile
    # time for a ~500x execution speedup; a full solver program takes ~10 min
    # to build.  Cache compiled executables across processes so that cost is
    # paid once (written under ~/.cache, override with PARALLEL_DDP_TPU_CACHE).
    if not _jax.config.jax_compilation_cache_dir:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "PARALLEL_DDP_TPU_CACHE",
                _os.path.expanduser("~/.cache/parallel_ddp_tpu/xla"),
            ),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from parallel_ddp_tpu.config import (
    SolverConfig,
    CostWeights,
    SolveOutput,
)
from parallel_ddp_tpu.constraints import (
    ALConfig,
    ALMPCController,
    BoxConstraints,
    solve_al,
)
from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.solver import ilqr_solve, make_ilqr_solver

__version__ = "0.1.0"

__all__ = [
    "SolverConfig",
    "CostWeights",
    "SolveOutput",
    "Plant",
    "ilqr_solve",
    "make_ilqr_solver",
    "BoxConstraints",
    "ALConfig",
    "ALMPCController",
    "solve_al",
]
