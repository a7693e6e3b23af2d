"""Solver configuration and runtime-tunable cost weights.

The reference configures everything at compile time through preprocessor defines
(config.cuh:21-237).  Here the split is explicit:

  * `SolverConfig` — static, hashable options that shape the compiled program
    (horizon, block counts, integrator, line-search width ...).  Passed as a static
    argument to `jit`; changing one triggers a (cached) recompile, exactly like
    recompiling the reference with different `#define`s.
  * `CostWeights` — runtime-tunable scalars traced into the program (the reference's
    18 LCM-updatable cost weights, cost_arm.cuh:96-123, LCMHelpers.cuh:204-214).
    Updating them does NOT recompile.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static solver options (mirrors config.cuh option groups; defaults match it).

    Attributes:
      num_time_steps: N knot points (config.cuh:133-135; Kuka default 64).
      total_time: horizon length in seconds; dt = total_time / (N - 1) (config.cuh:136).
      m_blocks_b: parallel backward-pass time blocks M_BLOCKS_B (config.cuh:90-93).
      m_blocks_f: multiple-shooting forward intervals M_BLOCKS_F (config.cuh:92-94).
      num_alpha: simultaneous line-search step sizes (config.cuh:113-115).
      alpha_base: alphas are alpha_base**i (nisInitHelpers.cuh:829).
      integrator: 1 Euler, 2 Midpoint, 3 RK3 (config.cuh:78-80).
      max_iter: iteration cap (config.cuh:83).
      tol_cost: fractional cost-decrease exit tolerance (config.cuh:85-87).
      use_exp_red / exp_red_min / exp_red_max: z-test window for the line search
        (config.cuh:116-122, fpHelpers.cuh:399).
      use_max_defect / max_defect_size: multiple-shooting defect acceptance test
        (config.cuh:123-126).
      alpha_best_switch: True = take the best improving alpha, False = first
        improving alpha (config.cuh:82, fpHelpers.cuh:403-407).
      state_reg: Tassa state regularization (True) vs plain Huu += rho (False)
        (config.cuh:98, bpHelpers.cuh:52-62).
      rho_init/rho_max/rho_min/rho_factor: regularizer schedule (config.cuh:99-104).
      ignore_max_rho_exit: keep iterating at rho_max instead of exiting
        (config.cuh:105-107).
      max_bp_retries: cap on rho-retry attempts inside one backward pass.  The
        reference loops unboundedly (bpHelpers.cuh:489-515); a compiled
        while_loop gets a safety bound.
      linear_transform_switch: transport block-boundary p through P*dx
        (config.cuh:81, bpHelpers.cuh:16-34).
      use_smooth_abs / smooth_abs_alpha: smooth-L1 EE cost (config.cuh:174-176,
        cost_arm.cuh:121-123,218-221).
      use_limits: joint pos/vel/torque quadratic penalties (config.cuh:171-173,
        cost_arm.cuh:33-94).
      ee_cost: end-effector cost family instead of joint-space (config.cuh:165-167).
      slq: forward pass rolls the *linearized* dynamics (runSLQ_GPU,
        DDPWrappers.cuh:365-482).  Forces m_blocks_f == 1 semantics.
    """

    num_time_steps: int = 64
    total_time: float = 0.5
    m_blocks_b: int = 4
    m_blocks_f: int = 4
    num_alpha: int = 16
    alpha_base: float = 0.5
    integrator: int = 3
    max_iter: int = 100
    tol_cost: float = 0.0001
    use_exp_red: bool = True
    exp_red_min: float = 0.05
    exp_red_max: float = 1.25
    use_max_defect: bool = True
    max_defect_size: float = 1.0
    alpha_best_switch: bool = True
    state_reg: bool = True
    rho_init: float = 12.5
    rho_max: float = 1e7
    rho_min: float = 0.01
    rho_factor: float = 1.25
    ignore_max_rho_exit: bool = True
    max_bp_retries: int = 40
    linear_transform_switch: bool = True
    use_smooth_abs: bool = False
    smooth_abs_alpha: float = 0.2
    use_limits: bool = False
    ee_cost: bool = False
    slq: bool = False
    # central finite differences for the discrete dynamics Jacobian instead of
    # AD (USE_FINITE_DIFF, nisInitHelpers.cuh:138-243)
    use_finite_diff: bool = False
    fd_eps: float = 1e-4
    # EXACT log-depth backward pass via associative-scan Riccati instead of the
    # reference's stale-boundary block approximation (parallel/backward.py
    # _assoc_attempt).  TPU-first alternative to m_blocks_b; requires plain
    # regularization (state_reg=False) because Tassa state-reg does not fold
    # into the scan elements.
    bp_assoc_scan: bool = False
    # lax.scan unroll factor for the serial per-step loops (backward Riccati
    # block sweep, shooting-block rollout).  Higher = fewer loop-boundary
    # dispatches but a bigger program; 4 measured best at round-1 shapes —
    # re-tune on hardware with benchmarks/latency.py when shapes change.
    scan_unroll: int = 4
    # Reduced-precision FORWARD path (config.cuh:72-75 done right: the
    # reference's fp16 toggle is declared broken there; here bf16 applies only
    # to stages the oracle suite certifies, each with fp32 accumulation, and
    # the Riccati recursion stays pinned at fp32 "highest" matmul precision —
    # see solver.py:143-147 for why it must).  Single-program solver path.
    #   bf16_rollout: the multiple-shooting forward simulation computes in
    #     bfloat16 (states/controls cast per step; the scalar-channel RBD core
    #     keeps weak-typed constants so channel math stays bf16) and its
    #     matmuls run at the MXU's native one-pass bf16 precision.  The
    #     trajectory handed back is fp32.  Takes precedence over the fused
    #     Pallas rollout (which is an fp32 kernel).
    #   bf16_cost: per-step stage costs evaluate on bf16-cast states with the
    #     per-alpha total accumulated in fp32.  NOTE bf16's ~3e-3 relative
    #     noise sits above the default tol_cost=1e-4 convergence test — use
    #     for fixed-iteration throughput solves, not tolerance-exit solves.
    bf16_rollout: bool = False
    bf16_cost: bool = False
    # fuse the whole block-parallel backward sweep into ONE Pallas kernel per
    # rho attempt (the backPassKern twin, ops/pallas_riccati.py) instead of
    # the vmapped lax.scan — removes the per-step dispatch overhead that
    # dominates the backward pass on the latency path.  Falls back to the XLA
    # scan automatically when the shape exceeds the kernel's lane/VMEM budget.
    pallas_riccati: bool = False

    @property
    def dt(self) -> float:
        return self.total_time / (self.num_time_steps - 1)

    @property
    def n_blocks_b(self) -> int:
        return self.num_time_steps // self.m_blocks_b

    @property
    def n_blocks_f(self) -> int:
        return self.num_time_steps // self.m_blocks_f

    def __post_init__(self):
        if self.num_time_steps % self.m_blocks_b != 0:
            raise ValueError("num_time_steps must be divisible by m_blocks_b")
        if self.num_time_steps % self.m_blocks_f != 0:
            raise ValueError("num_time_steps must be divisible by m_blocks_f")
        if self.integrator not in (1, 2, 3):
            raise ValueError("integrator must be 1 (Euler), 2 (Midpoint) or 3 (RK3)")
        if self.bp_assoc_scan and self.state_reg:
            raise ValueError(
                "bp_assoc_scan requires state_reg=False (plain Huu += rho I "
                "regularization folds into the scan elements; Tassa state-reg "
                "does not)"
            )
        if self.bp_assoc_scan and self.pallas_riccati:
            raise ValueError(
                "bp_assoc_scan and pallas_riccati are mutually exclusive "
                "backward-pass strategies"
            )

    def alphas(self, dtype=None):
        """Line-search step sizes alpha_i = alpha_base**i (nisInitHelpers.cuh:829).

        Returned as a NUMPY array: jit-captured *device* arrays take a
        pathologically slow execution path on the axon TPU tunnel (~25 ms per
        dispatch, sticky for the process) while numpy constants embed as HLO
        literals.  See tests/test_no_device_constants.py."""
        import numpy as _np

        return _np.power(
            _np.asarray(self.alpha_base, _np.float32),
            _np.arange(self.num_alpha, dtype=_np.float32),
        )


class CostWeights(NamedTuple):
    """Runtime-tunable cost weights (defaults: cost_arm.cuh:96-120, cost_pend.cuh:20-23).

    Joint-space family: q1 (position), q2 (velocity), r (control), qf1/qf2 (terminal).
    EE family: q_ee1/q_ee2 (xyz / rpy), qf_* terminal, *_eev* EE velocity,
    r_ee control, q_xdee/qf_xdee nominal joint-velocity regularizer,
    q_xee/qf_xee nominal joint-position regularizer.
    Limit penalties: q_pl/q_vl/r_tl (cost_arm.cuh:26-30).
    """

    # joint-space
    q1: float = 0.1
    q2: float = 0.001
    r: float = 0.0001
    qf1: float = 1000.0
    qf2: float = 1000.0
    # end-effector
    q_ee1: float = 0.1
    q_ee2: float = 0.0
    qf_ee1: float = 1000.0
    qf_ee2: float = 0.0
    q_eev1: float = 0.0
    q_eev2: float = 0.0
    qf_eev1: float = 0.0
    qf_eev2: float = 0.0
    r_ee: float = 0.0001
    q_xdee: float = 0.1
    qf_xdee: float = 1000.0
    q_xee: float = 0.0
    qf_xee: float = 0.0
    # limit penalties
    q_pl: float = 100.0
    q_vl: float = 100.0
    r_tl: float = 100.0


class SolveOutput(NamedTuple):
    """Result of one iLQR solve (the reference's x0/u0 writeback + Jout/alphaOut
    traces + exit diagnostics, DDPWrappers.cuh:125-135, nisInitHelpers.cuh:738-764)."""

    x: jnp.ndarray          # (N, n_state) accepted trajectory
    u: jnp.ndarray          # (N, n_ctrl) accepted controls
    K: jnp.ndarray          # (N, n_ctrl, n_state) feedback gains
    d: jnp.ndarray          # (N, n_state) multiple-shooting defects
    P: jnp.ndarray          # (N, n_state, n_state) cost-to-go Hessians
    p: jnp.ndarray          # (N, n_state) cost-to-go gradients
    J: jnp.ndarray          # scalar final cost
    iters: jnp.ndarray      # iterations executed
    J_trace: jnp.ndarray    # (max_iter+1,) cost per iteration (Jout)
    alpha_trace: jnp.ndarray  # (max_iter+1,) accepted alpha index, -1 = rejected
    rho: jnp.ndarray        # final regularizer
    max_defect: jnp.ndarray  # final max defect
    converged: jnp.ndarray = None  # last iteration saw < tol_cost improvement
                                   # available (accepted or not)
    last_feasible: jnp.ndarray = None  # last line search had some candidate
                                       # with J non-increasing and defect in
                                       # bound (rejection = conservatism)
    defect_trace: jnp.ndarray = None  # (max_iter+1,) accepted max-L1 defect
                                      # per iteration (defectKern metric,
                                      # fpHelpers.cuh:94-111, archived per
                                      # iteration for convergence anchoring)
