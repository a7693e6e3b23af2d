"""iLQR solve driver — the whole algorithm inside one `jit` (DDPWrappers.cuh:8-138).

One compiled program replaces the reference's host-orchestrated loop of kernel
launches: `lax.while_loop` carries the full solver state; each iteration is
  backward pass (with rho-retry)  ->  forward sweep + multiple-shooting rollout +
  parallel line search  ->  accept/reject + rho schedule  ->  next-iteration
  derivative recompute.
Exit conditions match acceptRejectTraj* (nisInitHelpers.cuh:487-592): fractional
cost decrease below tol_cost, iteration cap, or (optionally) rho_max.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from parallel_ddp_tpu.config import CostWeights, SolveOutput, SolverConfig
from parallel_ddp_tpu.costs.base import CostModel
from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.ops.integrators import (
    make_step,
    make_step_jacobian,
    make_step_jacobian_fd,
)
from parallel_ddp_tpu.parallel.backward import backward_pass
from parallel_ddp_tpu.parallel.forward import forward_pass, line_search


class _Carry(NamedTuple):
    x: Any
    u: Any
    d: Any
    xp: Any        # accepted trajectory of the previous iteration
    xp2: Any       # trajectory at which Pp/pp were computed
    Pp: Any
    pp: Any
    AB: Any
    H: Any
    g: Any
    P: Any
    p: Any
    K: Any
    du: Any
    prevJ: Any
    rho: Any
    drho: Any
    ignore_defect: Any
    it: Any
    done: Any
    converged: Any
    feasible: Any
    J_trace: Any
    alpha_trace: Any
    defect_trace: Any
    max_defect: Any


def _derivatives(cfg, step_jac, cost_quad, x, u, goal, w):
    """Next-iteration setup: AB/H/g at the accepted trajectory, vmapped over time
    (integratorGradientKern + costGradientHessianKern, nisInitHelpers.cuh:245-279).

    `step_jac` is either a per-sample jac (vmapped here) or an already-batched
    (N-1, n)-in (N-1, n, n+m)-out function (Plant.batched_step_jac — the Pallas
    RBD production path); the latter is marked with `_is_batched`."""
    if getattr(step_jac, "_is_batched", False):
        AB = step_jac(x[:-1], u[:-1])
    else:
        AB = jax.vmap(step_jac)(x[:-1], u[:-1])
    ks = jnp.arange(cfg.num_time_steps)
    H, g = jax.vmap(lambda xk, uk, k: cost_quad(xk, uk, k, goal, w))(x, u, ks)
    return AB, H, g


def _total_cost(cfg, cost_stage, x, u, goal, w):
    ks = jnp.arange(cfg.num_time_steps)
    return jnp.sum(jax.vmap(lambda xk, uk, k: cost_stage(xk, uk, k, goal, w))(x, u, ks))


def open_loop_rollout(cfg: SolverConfig, step_fn, x0_state, u):
    """Multiple-shooting open-loop rollout from block-start states in x (loadVars*
    initial `forwardSimKern` rollout, nisInitHelpers.cuh:643).  Returns (x, d)."""
    N, M, Nf = cfg.num_time_steps, cfg.m_blocks_f, cfg.n_blocks_f
    n = x0_state.shape[-1]
    x_blk = x0_state.reshape(M, Nf, n)
    u_blk = u.reshape(M, Nf, -1)

    def sim(x0, u_b):
        def body(xc, uk):
            xn = step_fn(xc, uk)
            return xn, xn

        _, xs = lax.scan(body, x0, u_b)
        return xs

    x_next = jax.vmap(sim)(x_blk[:, 0], u_blk)  # (M, Nf, n)
    x_new = jnp.concatenate([x_blk[:, :1], x_next[:, :-1]], axis=1).reshape(N, n)
    d = jnp.zeros((N, n), x0_state.dtype)
    if M > 1:
        bidx = (jnp.arange(M - 1) + 1) * Nf - 1
        d = d.at[bidx].set(x_next[:-1, -1] - x_blk[1:, 0])
    return x_new, d


def make_ilqr_solver(plant: Plant, cost: CostModel, cfg: SolverConfig):
    """Build the jitted solve function for a (plant, cost, config) triple.

    Returns solve(x0, u0, goal, weights, *, P0=None, p0=None, d0=None,
                  initial_rollout=False, ignore_first_defect=False) -> SolveOutput.
    """
    step_fn = make_step(plant, cfg.integrator, cfg.dt)
    if cfg.use_finite_diff:
        step_jac = make_step_jacobian_fd(plant, cfg.integrator, cfg.dt, cfg.fd_eps)
    elif plant.batched_step_jac is not None:
        step_jac = plant.batched_step_jac(cfg.integrator, cfg.dt)
        step_jac._is_batched = True
    else:
        step_jac = make_step_jacobian(plant, cfg.integrator, cfg.dt)
    # fused single-kernel forward simulation (forwardSimKern twin) when the
    # plant ships one and the shape fits; None keeps the XLA scan path.
    # bf16_rollout takes precedence: the Pallas kernel is fp32.
    fused_sim = None
    if (plant.fused_rollout is not None and not cfg.slq
            and cfg.m_blocks_f > 0 and not cfg.bf16_rollout):
        fused_sim = plant.fused_rollout(
            cfg.integrator, cfg.dt, cfg.num_time_steps, cfg.m_blocks_f,
            cfg.num_alpha,
        )
    # reduced-precision forward stages (config.py bf16_* knobs): bf16 compute
    # with fp32 hand-back; the enclosing "highest" context still governs the
    # derivative stage and the Riccati recursion
    step_fn_fwd = step_fn
    if cfg.bf16_rollout:
        def step_fn_fwd(x, u, _f=step_fn):
            with jax.default_matmul_precision("default"):
                xn = _f(x.astype(jnp.bfloat16), u.astype(jnp.bfloat16))
            return xn.astype(jnp.float32)
    alphas = cfg.alphas()

    def solve(
        x0,
        u0,
        goal,
        weights: Optional[CostWeights] = None,
        P0=None,
        p0=None,
        d0=None,
        initial_rollout: bool = False,
        ignore_first_defect: bool = False,
        iter_limit=None,
    ) -> SolveOutput:
        # The Riccati recursion is severely ill-conditioned (min eig(Huu) ~ R =
        # 1e-4 vs entries ~1e3 on the Kuka): TPU MXU's default bf16 matmul
        # precision makes Huu numerically indefinite and the whole pass fail.
        # These are tiny matrices — full fp32 costs nothing here.
        with jax.default_matmul_precision("highest"):
            return _solve_impl(
                x0, u0, goal, weights, P0, p0, d0, initial_rollout,
                ignore_first_defect, iter_limit,
            )

    def _solve_impl(
        x0, u0, goal, weights, P0, p0, d0, initial_rollout, ignore_first_defect,
        iter_limit,
    ) -> SolveOutput:
        w = weights if weights is not None else CostWeights()
        N = cfg.num_time_steps
        n, m = plant.n_state, plant.n_ctrl
        dtype = jnp.asarray(x0).dtype
        x0 = jnp.asarray(x0, dtype)
        u0 = jnp.asarray(u0, dtype)

        stage = lambda xk, uk, k: cost.stage(xk, uk, k, goal, w)
        if cfg.bf16_cost:
            # bf16 stage evaluation, fp32 accumulation: the wrapper returns
            # fp32 so every jnp.sum over stages accumulates at full precision
            def stage(xk, uk, k, _s=stage):
                with jax.default_matmul_precision("default"):
                    v = _s(xk.astype(jnp.bfloat16), uk.astype(jnp.bfloat16), k)
                return v.astype(jnp.float32)

        # live iteration budget (lcmt_solver_params iterLimit applied per-solve
        # without recompiling, LCMHelpers.cuh:213; cfg.max_iter stays the static
        # trace bound that sizes the J/alpha traces)
        if iter_limit is None:
            it_cap = jnp.asarray(cfg.max_iter, jnp.int32)
        else:
            it_cap = jnp.clip(
                jnp.asarray(iter_limit, jnp.int32), 1, cfg.max_iter
            )

        if initial_rollout:
            x_init, d_init = open_loop_rollout(cfg, step_fn, x0, u0)
        else:
            x_init = x0
            d_init = d0 if d0 is not None else jnp.zeros((N, n), dtype)
        P_init = P0 if P0 is not None else jnp.zeros((N, n, n), dtype)
        p_init = p0 if p0 is not None else jnp.zeros((N, n), dtype)

        AB, H, g = _derivatives(cfg, step_jac, cost.quad, x_init, u0, goal, w)
        # J0 through the same (possibly bf16-wrapped) stage the line search
        # uses, so J comparisons across iterations are apples-to-apples
        ks0 = jnp.arange(N)
        J0 = jnp.sum(jax.vmap(stage)(x_init, u0, ks0))
        # epsilon bump so a zero first update does not instantly "converge"
        # (initAlgGPU, nisInitHelpers.cuh:392-395)
        prevJ = J0 + 2.0 * cfg.tol_cost

        J_trace = jnp.full((cfg.max_iter + 1,), jnp.nan, dtype).at[0].set(J0)
        alpha_trace = (
            jnp.full((cfg.max_iter + 1,), -2, jnp.int32)
            .at[0]
            .set(0 if initial_rollout else -1)
        )
        d0_metric = jnp.max(jnp.sum(jnp.abs(d_init), axis=-1))
        defect_trace = (
            jnp.full((cfg.max_iter + 1,), jnp.nan, dtype).at[0].set(d0_metric)
        )

        carry0 = _Carry(
            x=x_init,
            u=u0,
            d=d_init,
            xp=x_init,
            xp2=x_init,
            Pp=P_init,
            pp=p_init,
            AB=AB,
            H=H,
            g=g,
            P=P_init,
            p=p_init,
            K=jnp.zeros((N, m, n), dtype),
            du=jnp.zeros((N, m), dtype),
            prevJ=prevJ,
            rho=jnp.asarray(cfg.rho_init, dtype),
            drho=jnp.asarray(1.0, dtype),
            ignore_defect=jnp.asarray(bool(ignore_first_defect)),
            it=jnp.asarray(1, jnp.int32),
            done=jnp.asarray(False),
            converged=jnp.asarray(False),
            feasible=jnp.asarray(True),
            J_trace=J_trace,
            alpha_trace=alpha_trace,
            defect_trace=defect_trace,
            max_defect=jnp.asarray(0.0, dtype),
        )

        def body(c: _Carry) -> _Carry:
            # BACKWARD PASS (with rho retry) ------------------------------------
            bp = backward_pass(
                cfg, c.AB, c.H, c.g, c.Pp, c.pp, c.d, c.x, c.xp2, c.rho, c.drho
            )
            bp_dead = bp.fail  # retries exhausted: exit like the maxRho path

            # FORWARD PASS ------------------------------------------------------
            ro = forward_pass(
                cfg, step_fn_fwd, stage, c.x, c.u, c.d, bp.K, bp.du,
                bp.ApBK, bp.Bdu, c.xp, alphas, fused_sim=fused_sim,
            )
            ls = line_search(
                cfg, ro.J, ro.max_defect, alphas, bp.dJexp, c.prevJ, c.ignore_defect
            )

            # ACCEPT / REJECT + rho schedule (acceptRejectTrajGPU,
            # nisInitHelpers.cuh:487-518) ---------------------------------------
            accept = jnp.logical_and(ls.accept, ~bp_dead)
            x_new = jnp.where(accept, ro.x[ls.alpha_idx], c.x)
            u_new = jnp.where(accept, ro.u[ls.alpha_idx], c.u)
            d_new = jnp.where(accept, ro.d[ls.alpha_idx], c.d)

            f = jnp.asarray(cfg.rho_factor, c.rho.dtype)
            drho_acc = jnp.minimum(bp.drho / f, 1.0 / f)
            rho_acc = jnp.maximum(bp.rho * drho_acc, cfg.rho_min)
            drho_rej = jnp.maximum(bp.drho * f, f)
            rho_rej = jnp.minimum(bp.rho * drho_rej, cfg.rho_max)
            rho_new = jnp.where(accept, rho_acc, rho_rej)
            drho_new = jnp.where(accept, drho_acc, drho_rej)

            dJ_frac = ls.dJ / c.prevJ
            prevJ_new = jnp.where(accept, ls.J, c.prevJ)

            J_trace = c.J_trace.at[c.it].set(jnp.where(accept, ls.J, c.prevJ))
            alpha_trace = c.alpha_trace.at[c.it].set(
                jnp.where(accept, ls.alpha_idx, -1).astype(jnp.int32)
            )
            d_metric = jnp.max(jnp.sum(jnp.abs(d_new), axis=-1))
            defect_trace = c.defect_trace.at[c.it].set(d_metric)

            # "converged": an accepted step improved by less than tol, OR a
            # rejected step where even the best candidate had nothing to gain —
            # the warm-started MPC solve distinguishes this from real failure.
            # The rejected branch is bounded from BELOW too: a strongly negative
            # best_dJ_frac (every candidate increased cost — possibly J -> inf)
            # is a genuine failure, not convergence, and must feed the MPC
            # failure counter (SOLVES_TO_RESET, MPCHelpers.cuh:610).
            converged = jnp.where(
                accept,
                dJ_frac < cfg.tol_cost,
                jnp.abs(ls.best_dJ_frac) < cfg.tol_cost,
            )

            done = jnp.logical_and(accept, dJ_frac < cfg.tol_cost)
            if not cfg.ignore_max_rho_exit:
                done = jnp.logical_or(
                    done, jnp.logical_and(~accept, rho_new >= cfg.rho_max)
                )
            done = jnp.logical_or(done, bp_dead)
            done = jnp.logical_or(done, c.it >= it_cap)

            # NEXT ITERATION SETUP (runs accept or reject, like the reference:
            # nextIterationSetupGPU recomputes at the restored trajectory too) ---
            AB_new, H_new, g_new = _derivatives(
                cfg, step_jac, cost.quad, x_new, u_new, goal, w
            )

            return _Carry(
                x=x_new,
                u=u_new,
                d=d_new,
                xp=x_new,
                xp2=c.xp,
                Pp=bp.P,
                pp=bp.p,
                AB=AB_new,
                H=H_new,
                g=g_new,
                P=bp.P,
                p=bp.p,
                K=bp.K,
                du=bp.du,
                prevJ=prevJ_new,
                rho=rho_new,
                drho=drho_new,
                ignore_defect=ls.ignore_defect,
                it=c.it + 1,
                done=done,
                converged=converged,
                feasible=ls.any_feasible,
                J_trace=J_trace,
                alpha_trace=alpha_trace,
                defect_trace=defect_trace,
                max_defect=jnp.where(accept, ls.max_defect, c.max_defect),
            )

        final = lax.while_loop(lambda c: ~c.done, body, carry0)

        return SolveOutput(
            x=final.x,
            u=final.u,
            K=final.K,
            d=final.d,
            P=final.P,
            p=final.p,
            J=final.prevJ,
            iters=final.it - 1,
            J_trace=final.J_trace,
            alpha_trace=final.alpha_trace,
            rho=final.rho,
            max_defect=final.max_defect,
            converged=final.converged,
            last_feasible=final.feasible,
            defect_trace=final.defect_trace,
        )

    return jax.jit(solve, static_argnames=("initial_rollout", "ignore_first_defect"))


def ilqr_solve(
    plant: Plant,
    cost: CostModel,
    cfg: SolverConfig,
    x0,
    u0,
    goal,
    weights: Optional[CostWeights] = None,
    **kwargs,
) -> SolveOutput:
    """One-shot convenience wrapper around `make_ilqr_solver`."""
    return make_ilqr_solver(plant, cost, cfg)(x0, u0, goal, weights, **kwargs)
