"""Cross-chip horizon ('sp') sharding of one iLQR solve — shard_map + collectives.

The reference's central contribution is splitting the TIME axis into parallel
blocks: `M_BLOCKS_B` stale-boundary Riccati blocks in the backward pass
(backPassKern<<<M_BLOCKS_B,...>>>, bpHelpers.cuh:356-420) and `M_BLOCKS_F`
multiple-shooting intervals in the forward pass (forwardSimKern, fpHelpers.cuh:
223-275) — all within ONE GPU.  This module is the cross-CHIP version: the
horizon is sharded over the mesh's 'sp' axis, each device owns a contiguous
chunk of time blocks, and the block-boundary couplings become ICI collectives:

  * backward-pass block seeds (prev-iteration Pp/pp at the next block's start,
    FORCE_PARALLEL semantics bpHelpers.cuh:369) -> `lax.ppermute` of each
    chunk's FIRST element to the left neighbor;
  * the forward sweep's linear recurrence e_{k+1} = (A-BK) e_k + c_k
    (fpHelpers.cuh:17-53) -> local associative scans composed across devices by
    an `all_gather` of per-chunk prefix transforms (a distributed associative
    scan: log-depth within a chunk, one gather across chunks);
  * multiple-shooting defects at chunk boundaries (fpHelpers.cuh:253-258) ->
    `ppermute` of the neighboring chunk's swept block-start states;
  * cost / expected-reduction / defect-norm reductions (costKern, defectKern,
    computeExpRed) -> `psum` / `pmax` over 'sp';
  * the accept/reject + rho-schedule + line-search logic runs REPLICATED on
    every device (all inputs are post-psum, so all devices take identical
    branches — the SPMD analog of the reference's host-side scan,
    fpHelpers.cuh:395-408).

The math is identical to the single-program solver (solver.py): the per-step
Riccati recursion is literally the same `make_riccati_step` closure, so an
'sp'-sharded solve matches the single-device solve to fp32 roundoff
(asserted in tests/test_sp.py on an 8-device CPU mesh).

Requirements: mesh has an 'sp' axis of size S with m_blocks_b % S == 0 and
m_blocks_f % S == 0 (each device owns whole blocks of both kinds).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parallel_ddp_tpu.config import CostWeights, SolveOutput, SolverConfig
from parallel_ddp_tpu.costs.base import CostModel
from parallel_ddp_tpu.models.base import Plant
from parallel_ddp_tpu.ops.integrators import (
    make_step,
    make_step_jacobian,
    make_step_jacobian_fd,
)
from parallel_ddp_tpu.parallel import forward
from parallel_ddp_tpu.parallel.backward import make_riccati_step, run_block
from parallel_ddp_tpu.parallel.forward import line_search


def _from_right(x, axis: str, size: int):
    """Each device receives its RIGHT neighbor's value (device i <- i+1);
    the last device receives zeros.  One hop over ICI."""
    perm = [(i, i - 1) for i in range(1, size)]
    return lax.ppermute(x, axis, perm)


def _p_any(flag, axis: str):
    """Replicated logical-or over the mesh axis."""
    return lax.psum(flag.astype(jnp.int32), axis) > 0


def _make_solve_local(
    plant: Plant,
    cost: CostModel,
    cfg: SolverConfig,
    S: int,
    axis: str,
):
    """Build the PER-DEVICE solve body (chunk-local arrays in, chunk-local
    arrays + replicated scalars out) shared by make_sp_solver (one solve) and
    make_batched_sp_solver (dp x sp).  Returns
    solve_local(x0_l, u0_l, goal, w, initial_rollout)."""
    N = cfg.num_time_steps
    Nl = N // S                       # time steps per device
    Mb_l = cfg.m_blocks_b // S        # backward blocks per device
    Mf_l = cfg.m_blocks_f // S        # shooting blocks per device
    Nb = cfg.n_blocks_b
    Nf = cfg.n_blocks_f
    n, m = plant.n_state, plant.n_ctrl
    nf = N - 1

    step_fn = make_step(plant, cfg.integrator, cfg.dt)
    # production-kernel selection: the SAME policy as the single-program solver
    # (solver.py:114-128) — chunk-local batches are still batches, so the
    # Pallas RBD derivative stage and the fused forward-sim kernel apply
    # per-device unchanged
    batched_jac = None
    if cfg.use_finite_diff:
        step_jac = make_step_jacobian_fd(plant, cfg.integrator, cfg.dt, cfg.fd_eps)
    elif plant.batched_step_jac is not None:
        batched_jac = plant.batched_step_jac(cfg.integrator, cfg.dt)
        step_jac = None
    else:
        step_jac = make_step_jacobian(plant, cfg.integrator, cfg.dt)
    alphas = cfg.alphas()
    A = alphas.shape[0]

    if cfg.slq:
        raise NotImplementedError("SLQ is single-shooting; use the unsharded solver")

    # fused single-kernel forward simulation over the chunk's (alpha, block)
    # grid (forwardSimKern twin, ops/pallas_rollout.py): per-device shapes
    # (Nl, Mf_l) replace (N, M); the true-horizon-end mask is passed traced
    fused_sim = None
    if plant.fused_rollout is not None and Mf_l > 0:
        fused_sim = plant.fused_rollout(cfg.integrator, cfg.dt, Nl, Mf_l, A)

    # ---------------- per-device local helpers ----------------

    def _local_ks(dev):
        return dev * Nl + jnp.arange(Nl)

    def _derivs_local(x_l, u_l, ks, goal, w):
        """AB (padded to Nl rows; global row N-1 zeroed), H, g — block-local
        (integratorGradientKern / costGradientHessianKern, nisInitHelpers.cuh)."""
        if batched_jac is not None:
            AB_l = batched_jac(x_l, u_l)   # Pallas RBD production path
        else:
            AB_l = jax.vmap(step_jac)(x_l, u_l)
        AB_l = jnp.where((ks == nf)[:, None, None], 0.0, AB_l)
        H_l, g_l = jax.vmap(lambda xk, uk, k: cost.quad(xk, uk, k, goal, w))(
            x_l, u_l, ks
        )
        return AB_l, H_l, g_l

    def _cost_local(x_l, u_l, ks, goal, w):
        return jnp.sum(
            jax.vmap(lambda xk, uk, k: cost.stage(xk, uk, k, goal, w))(x_l, u_l, ks)
        )

    def _open_loop_rollout_local(dev, x_l, u_l):
        """Multiple-shooting open-loop rollout, chunk-local blocks; the chunk-
        boundary defect needs the right neighbor's first block-start state
        (solver.open_loop_rollout distributed; nisInitHelpers.cuh:643)."""
        x_blk = x_l.reshape(Mf_l, Nf, n)
        u_blk = u_l.reshape(Mf_l, Nf, m)

        def sim(x0, u_b):
            def body(xc, uk):
                xn = step_fn(xc, uk)
                return xn, xn

            _, xs = lax.scan(body, x0, u_b)
            return xs

        x_next = jax.vmap(sim)(x_blk[:, 0], u_blk)          # (Mf_l, Nf, n)
        x_new = jnp.concatenate([x_blk[:, :1], x_next[:, :-1]], axis=1)
        x_new = x_new.reshape(Nl, n)

        # defects: internal boundaries local; the chunk's last boundary vs the
        # right neighbor's first block start (ppermute)
        right_start = _from_right(x_blk[0, 0], axis, S)      # (n,)
        next_starts = jnp.concatenate([x_blk[1:, 0], right_start[None]], axis=0)
        d_bnd = x_next[:, -1] - next_starts                  # (Mf_l, n)
        is_last_dev = dev == S - 1
        last_mask = jnp.arange(Mf_l) == Mf_l - 1
        d_bnd = jnp.where(
            jnp.logical_and(is_last_dev, last_mask)[:, None], 0.0, d_bnd
        )
        d_l = jnp.zeros((Nl, n), x_l.dtype)
        d_l = d_l.at[(jnp.arange(Mf_l) + 1) * Nf - 1].set(d_bnd)
        return x_new, d_l

    def _backward_sp(dev, rstep, AB_l, H_l, g_l, Pp_l, pp_l, d_l, x_l, xp2_l,
                     rho0, drho0):
        """Block-parallel backward pass with cross-chip boundary seeds
        (backward.backward_pass distributed; bpHelpers.cuh:336-517)."""
        dtype = x_l.dtype
        is_last_dev = dev == S - 1

        # seeds for each local block: the NEXT block's first Pp/pp (+ linear
        # transform through the state change, linearXfrmOrLoad bpHelpers.cuh:16-34);
        # the chunk's last block seeds from the right neighbor's chunk start —
        # one ppermute of (P, p, x, xp2)[0]
        Pp_blk = Pp_l.reshape(Mb_l, Nb, n, n)
        pp_blk = pp_l.reshape(Mb_l, Nb, n)
        x_blk = x_l.reshape(Mb_l, Nb, n)
        xp2_blk = xp2_l.reshape(Mb_l, Nb, n)

        rP, rp, rx, rxp2 = _from_right(
            (Pp_blk[0, 0], pp_blk[0, 0], x_blk[0, 0], xp2_blk[0, 0]), axis, S
        )
        seeds_P = jnp.concatenate([Pp_blk[1:, 0], rP[None]], axis=0)   # (Mb_l, n, n)
        seeds_p = jnp.concatenate([pp_blk[1:, 0], rp[None]], axis=0)
        seeds_x = jnp.concatenate([x_blk[1:, 0], rx[None]], axis=0)
        seeds_xp2 = jnp.concatenate([xp2_blk[1:, 0], rxp2[None]], axis=0)
        if cfg.linear_transform_switch:
            seeds_p = seeds_p + jnp.einsum(
                "bij,bj->bi", seeds_P, seeds_x - seeds_xp2
            )
        # the globally-final block uses the terminal expansion instead
        # (bpHelpers.cuh:361-367)
        P_term = H_l[-1, :n, :n]
        p_term = g_l[-1, :n]
        final_mask = jnp.logical_and(is_last_dev, jnp.arange(Mb_l) == Mb_l - 1)
        seeds_P = jnp.where(final_mask[:, None, None], P_term[None], seeds_P)
        seeds_p = jnp.where(final_mask[:, None], p_term[None], seeds_p)

        AB_blk = AB_l.reshape(Mb_l, Nb, n, n + m)
        H_blk = H_l.reshape(Mb_l, Nb, n + m, n + m)
        g_blk = g_l.reshape(Mb_l, Nb, n + m)
        d_blk = d_l.reshape(Mb_l, Nb, n)
        k_blk = _local_ks(dev).reshape(Mb_l, Nb)

        pallas_bp = None
        if cfg.pallas_riccati:
            # fused single-kernel chunk sweep (ops/pallas_riccati.py); the
            # TRACED chunk-local k_blk flows straight into the kernel's masks
            from parallel_ddp_tpu.ops.pallas_riccati import (
                make_riccati_block_call,
            )
            pallas_bp = make_riccati_block_call(cfg, n, m, mb=Mb_l)

        if pallas_bp is not None:
            def attempt(rho):
                outs = pallas_bp(
                    rho, seeds_P, seeds_p, AB_blk, H_blk, g_blk, d_blk, k_blk
                )
                dJexp = lax.psum(outs[6], axis)
                fail = _p_any(outs[7], axis)
                return outs[:6] + (dJexp, fail)
        else:
            def attempt(rho):
                outs = jax.vmap(
                    lambda sP, sp_, ab, Hb, gb, db, kb: run_block(
                        rstep, rho, sP, sp_, ab, Hb, gb, db, kb,
                        unroll=cfg.scan_unroll,
                    )
                )(seeds_P, seeds_p, AB_blk, H_blk, g_blk, d_blk, k_blk)
                P_o, p_o, K_o, du_o, ApBK_o, Bdu_o, dj_o, fail_o = outs
                flat = lambda a: a.reshape((Nl,) + a.shape[2:])
                dJexp = lax.psum(jnp.sum(dj_o, axis=(0, 1)), axis)
                fail = _p_any(jnp.any(fail_o), axis)
                return (
                    flat(P_o), flat(p_o), flat(K_o), flat(du_o),
                    flat(ApBK_o), flat(Bdu_o), dJexp, fail,
                )

        def retry_cond(state):
            _, fail, rho, drho, tries = state
            return jnp.logical_and(fail, tries < cfg.max_bp_retries)

        def retry_body(state):
            _, _, rho, drho, tries = state
            drho = jnp.maximum(drho * cfg.rho_factor, cfg.rho_factor)
            rho = jnp.minimum(rho * drho, cfg.rho_max)
            out = attempt(rho)
            return (out[:7], out[7], rho, drho, tries + 1)

        first = attempt(rho0)
        init = (first[:7], first[7], rho0, drho0, jnp.asarray(0))
        res, fail, rho, drho, _ = lax.while_loop(retry_cond, retry_body, init)
        return res, fail, rho, drho

    def _sweep_sp(dev, ApBK_l, Bdu_l, d_l, x_l):
        """Distributed forward sweep: local associative scans + one all_gather
        of per-chunk prefix transforms (forward.forward_sweep distributed;
        fpHelpers.cuh:17-53)."""
        ks = _local_ks(dev)
        on_boundary = jnp.logical_and((ks + 1) % Nf == 0, ks < nf)
        c = (
            -np.asarray(alphas)[None, :, None] * Bdu_l[:, None, :]
            + jnp.where(on_boundary[:, None], d_l, 0.0)[:, None, :]
        )  # (Nl, A, n)

        combine = forward.sweep_combine
        # local inclusive scan over ALL Nl steps (the globally-final step's
        # entry is never consumed: e at global N-1 comes from step N-2)
        Mscan, Vscan = lax.associative_scan(combine, (ApBK_l, c))

        # per-chunk total transform -> exclusive cross-chunk prefix.
        # all_gather is the block-boundary CTG exchange of SURVEY §5.
        Mg = lax.all_gather(Mscan[-1], axis)   # (S, n, n)
        Vg = lax.all_gather(Vscan[-1], axis)   # (S, A, n)
        eyeM = jnp.broadcast_to(jnp.eye(n, dtype=x_l.dtype), (n, n))
        zeroV = jnp.zeros((A, n), x_l.dtype)
        prefixes_M = [eyeM]
        prefixes_V = [zeroV]
        for i in range(1, S):  # S is tiny (mesh axis size); unrolled at trace time
            pm, pv = combine(
                (prefixes_M[i - 1], prefixes_V[i - 1]), (Mg[i - 1], Vg[i - 1])
            )
            prefixes_M.append(pm)
            prefixes_V.append(pv)
        pm = lax.dynamic_index_in_dim(jnp.stack(prefixes_M), dev, keepdims=False)
        pv = lax.dynamic_index_in_dim(jnp.stack(prefixes_V), dev, keepdims=False)

        # e entering local step k:  k=0 -> chunk-start value pv;
        # k>0 -> local scan up to k-1 composed with the chunk prefix
        _, Vloc = combine((pm, pv), (Mscan[:-1], Vscan[:-1]))
        e_at = jnp.concatenate([pv[None], Vloc], axis=0)       # (Nl, A, n)
        return x_l[None] + jnp.transpose(e_at, (1, 0, 2))      # (A, Nl, n)

    def _rollout_sp(dev, x_swept, u_l, K_l, du_l, xp_l, goal, w):
        """Multiple-shooting rollout + cost/defect reductions, chunk-local blocks
        (forward.multiple_shooting_rollout distributed; fpHelpers.cuh:223-328)."""
        dtype = x_swept.dtype
        is_last_dev = dev == S - 1
        u_blk = u_l.reshape(Mf_l, Nf, m)
        K_blk = K_l.reshape(Mf_l, Nf, m, n)
        du_blk = du_l.reshape(Mf_l, Nf, m)
        xp_blk = xp_l.reshape(Mf_l, Nf, n)
        k_blk = _local_ks(dev).reshape(Mf_l, Nf)

        if fused_sim is not None:
            # one kernel for the chunk's whole (alpha, block) grid; only the
            # LAST device's final step is the horizon end -> traced mask
            x_next_all, u_new_all = fused_sim(
                x_swept, u_l, K_l, du_l, xp_l, jnp.asarray(alphas, dtype),
                skip_mask=(k_blk == nf),
            )
        else:
            sim_block = forward.make_sim_block(
                step_fn, nf, unroll=cfg.scan_unroll
            )

            def sim_all_blocks(alpha, xs_a):
                x0s = xs_a.reshape(Mf_l, Nf, n)[:, 0]
                return jax.vmap(sim_block, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                    alpha, x0s, u_blk, K_blk, du_blk, xp_blk, k_blk
                )

            x_next_all, u_new_all = jax.vmap(sim_all_blocks)(
                jnp.asarray(alphas, dtype), x_swept
            )  # (A, Mf_l, Nf, n/m)

        xs_blk = x_swept.reshape(A, Mf_l, Nf, n)
        x_cand = jnp.concatenate(
            [xs_blk[:, :, :1], x_next_all[:, :, :-1]], axis=2
        ).reshape(A, Nl, n)
        u_cand = u_new_all.reshape(A, Nl, m)

        # defects: internal boundaries local; chunk-final boundary vs the right
        # neighbor's swept chunk-start states (per alpha) — one ppermute
        right_swept0 = _from_right(xs_blk[:, 0, 0], axis, S)   # (A, n)
        next_starts = jnp.concatenate(
            [xs_blk[:, 1:, 0], right_swept0[:, None]], axis=1
        )                                                       # (A, Mf_l, n)
        d_bnd = x_next_all[:, :, -1] - next_starts              # (A, Mf_l, n)
        last_mask = jnp.arange(Mf_l) == Mf_l - 1
        drop = jnp.logical_and(is_last_dev, last_mask)
        d_bnd = jnp.where(drop[None, :, None], 0.0, d_bnd)
        d_cand = jnp.zeros((A, Nl, n), dtype)
        d_cand = d_cand.at[:, (jnp.arange(Mf_l) + 1) * Nf - 1].set(d_bnd)
        loc_max = jnp.max(
            jnp.where(drop[None, :], 0.0, jnp.sum(jnp.abs(d_bnd), axis=-1)),
            axis=-1,
        )
        max_defect = lax.pmax(loc_max, axis)                    # (A,) replicated

        ks = _local_ks(dev)
        J_loc = jax.vmap(
            lambda xa, ua: jnp.sum(
                jax.vmap(lambda xk, uk, k: cost.stage(xk, uk, k, goal, w))(
                    xa, ua, ks
                )
            )
        )(x_cand, u_cand)
        J = lax.psum(J_loc, axis)                               # (A,) replicated
        return x_cand, u_cand, d_cand, J, max_defect

    # ---------------- the sharded solve ----------------

    def solve_local(x0_l, u0_l, goal, w, initial_rollout: bool):
        dev = lax.axis_index(axis)
        dtype = x0_l.dtype
        ks = _local_ks(dev)
        rstep = make_riccati_step(cfg, n, m, dtype)

        if initial_rollout:
            x_l, d_l = _open_loop_rollout_local(dev, x0_l, u0_l)
        else:
            x_l = x0_l
            d_l = jnp.zeros((Nl, n), dtype)
        u_l = u0_l
        P_l = jnp.zeros((Nl, n, n), dtype)
        p_l = jnp.zeros((Nl, n), dtype)

        AB_l, H_l, g_l = _derivs_local(x_l, u_l, ks, goal, w)
        J0 = lax.psum(_cost_local(x_l, u_l, ks, goal, w), axis)
        prevJ = J0 + 2.0 * cfg.tol_cost

        J_trace = jnp.full((cfg.max_iter + 1,), jnp.nan, dtype).at[0].set(J0)
        alpha_trace = (
            jnp.full((cfg.max_iter + 1,), -2, jnp.int32)
            .at[0].set(0 if initial_rollout else -1)
        )
        d0_metric = lax.pmax(jnp.max(jnp.sum(jnp.abs(d_l), axis=-1)), axis)
        defect_trace = (
            jnp.full((cfg.max_iter + 1,), jnp.nan, dtype).at[0].set(d0_metric)
        )

        carry0 = dict(
            x=x_l, u=u_l, d=d_l, xp=x_l, xp2=x_l,
            Pp=P_l, pp=p_l, AB=AB_l, H=H_l, g=g_l,
            P=P_l, p=p_l,
            K=jnp.zeros((Nl, m, n), dtype), du=jnp.zeros((Nl, m), dtype),
            prevJ=prevJ,
            rho=jnp.asarray(cfg.rho_init, dtype), drho=jnp.asarray(1.0, dtype),
            ignore_defect=jnp.asarray(False),
            it=jnp.asarray(1, jnp.int32),
            done=jnp.asarray(False), converged=jnp.asarray(False),
            feasible=jnp.asarray(True),
            J_trace=J_trace, alpha_trace=alpha_trace,
            defect_trace=defect_trace,
            max_defect=jnp.asarray(0.0, dtype),
        )

        def body(c):
            (P_o, p_o, K_o, du_o, ApBK_o, Bdu_o, dJexp), bp_fail, rho_a, drho_a = (
                _backward_sp(
                    dev, rstep, c["AB"], c["H"], c["g"], c["Pp"], c["pp"],
                    c["d"], c["x"], c["xp2"], c["rho"], c["drho"],
                )
            )
            bp_dead = bp_fail

            if cfg.m_blocks_f > 1:
                x_swept = _sweep_sp(dev, ApBK_o, Bdu_o, c["d"], c["x"])
            else:
                x_swept = jnp.broadcast_to(c["x"][None], (A, Nl, n))
            xc, uc, dc, J, max_d = _rollout_sp(
                dev, x_swept, c["u"], K_o, du_o, c["xp"], goal, w
            )
            ls = line_search(
                cfg, J, max_d, jnp.asarray(alphas, dtype), dJexp,
                c["prevJ"], c["ignore_defect"],
            )

            accept = jnp.logical_and(ls.accept, ~bp_dead)
            x_new = jnp.where(accept, xc[ls.alpha_idx], c["x"])
            u_new = jnp.where(accept, uc[ls.alpha_idx], c["u"])
            d_new = jnp.where(accept, dc[ls.alpha_idx], c["d"])

            f = jnp.asarray(cfg.rho_factor, dtype)
            drho_acc = jnp.minimum(drho_a / f, 1.0 / f)
            rho_acc = jnp.maximum(rho_a * drho_acc, cfg.rho_min)
            drho_rej = jnp.maximum(drho_a * f, f)
            rho_rej = jnp.minimum(rho_a * drho_rej, cfg.rho_max)
            rho_new = jnp.where(accept, rho_acc, rho_rej)
            drho_new = jnp.where(accept, drho_acc, drho_rej)

            dJ_frac = ls.dJ / c["prevJ"]
            prevJ_new = jnp.where(accept, ls.J, c["prevJ"])
            J_trace = c["J_trace"].at[c["it"]].set(
                jnp.where(accept, ls.J, c["prevJ"])
            )
            alpha_trace = c["alpha_trace"].at[c["it"]].set(
                jnp.where(accept, ls.alpha_idx, -1).astype(jnp.int32)
            )
            d_metric = lax.pmax(
                jnp.max(jnp.sum(jnp.abs(d_new), axis=-1)), axis
            )
            defect_trace = c["defect_trace"].at[c["it"]].set(d_metric)

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
            done = jnp.logical_or(done, c["it"] >= cfg.max_iter)

            AB_n, H_n, g_n = _derivs_local(x_new, u_new, ks, goal, w)

            return dict(
                x=x_new, u=u_new, d=d_new, xp=x_new, xp2=c["xp"],
                Pp=P_o, pp=p_o, AB=AB_n, H=H_n, g=g_n,
                P=P_o, p=p_o, K=K_o, du=du_o,
                prevJ=prevJ_new, rho=rho_new, drho=drho_new,
                ignore_defect=ls.ignore_defect,
                it=c["it"] + 1, done=done, converged=converged,
                feasible=ls.any_feasible,
                J_trace=J_trace, alpha_trace=alpha_trace,
                defect_trace=defect_trace,
                max_defect=jnp.where(accept, ls.max_defect, c["max_defect"]),
            )

        final = lax.while_loop(lambda c: ~c["done"], body, carry0)

        return SolveOutput(
            x=final["x"], u=final["u"], K=final["K"], d=final["d"],
            P=final["P"], p=final["p"], J=final["prevJ"],
            iters=final["it"] - 1,
            J_trace=final["J_trace"], alpha_trace=final["alpha_trace"],
            rho=final["rho"], max_defect=final["max_defect"],
            converged=final["converged"], last_feasible=final["feasible"],
            defect_trace=final["defect_trace"],
        )

    return solve_local


def make_sp_solver(
    plant: Plant,
    cost: CostModel,
    cfg: SolverConfig,
    mesh: Mesh,
    axis: str = "sp",
):
    """Build solve(x0, u0, goal, weights, initial_rollout=True) with the horizon
    sharded over `axis`.  Returns globally-shaped SolveOutput (time-axis arrays
    carry an 'sp' sharding; scalars are replicated)."""
    S = mesh.shape[axis]
    if cfg.m_blocks_b % S or cfg.m_blocks_f % S:
        raise ValueError(
            f"m_blocks_b={cfg.m_blocks_b} and m_blocks_f={cfg.m_blocks_f} "
            f"must both be divisible by the '{axis}' axis size {S}"
        )
    if cfg.slq:
        raise NotImplementedError("SLQ is single-shooting; use the unsharded solver")

    _solve_local = _make_solve_local(plant, cost, cfg, S, axis)

    sharded = P(axis)
    rep = P()
    out_specs = SolveOutput(
        x=sharded, u=sharded, K=sharded, d=sharded, P=sharded, p=sharded,
        J=rep, iters=rep, J_trace=rep, alpha_trace=rep, rho=rep,
        max_defect=rep, converged=rep, last_feasible=rep, defect_trace=rep,
    )

    def solve(x0, u0, goal, weights: Optional[CostWeights] = None,
              initial_rollout: bool = True) -> SolveOutput:
        w = weights if weights is not None else CostWeights()
        goal_spec = jax.tree_util.tree_map(lambda _: rep, goal)
        w_spec = jax.tree_util.tree_map(lambda _: rep, w)
        fn = jax.shard_map(
            functools.partial(_solve_local, initial_rollout=initial_rollout),
            mesh=mesh,
            in_specs=(sharded, sharded, goal_spec, w_spec),
            out_specs=out_specs,
            check_vma=False,
        )
        with jax.default_matmul_precision("highest"):
            return fn(jnp.asarray(x0), jnp.asarray(u0), goal, w)

    return jax.jit(solve, static_argnames=("initial_rollout",))


def make_batched_sp_solver(
    plant: Plant,
    cost: CostModel,
    cfg: SolverConfig,
    mesh: Mesh,
    batch_axis: str = "dp",
    axis: str = "sp",
):
    """2-D mesh scale-out: scenarios sharded over `batch_axis` AND each solve's
    horizon sharded over `axis` — the combined form of parallel/sharding.py's
    scenario batching and this module's horizon sharding.  Every device owns
    (B / dp) scenarios x (N / sp) time steps; the per-scenario solves run in
    lockstep under a local vmap and the horizon couplings ride 'sp'
    collectives exactly as in make_sp_solver.

    solve_batch(x0s (B, N, n), u0s (B, N, m), goals (leading B on each leaf),
    weights) -> SolveOutput with leading scenario axis."""
    S = mesh.shape[axis]
    if cfg.m_blocks_b % S or cfg.m_blocks_f % S:
        raise ValueError(
            f"m_blocks_b={cfg.m_blocks_b} and m_blocks_f={cfg.m_blocks_f} "
            f"must both be divisible by the '{axis}' axis size {S}"
        )
    # reuse the full sp solver machinery: rebuild the local solve body by
    # calling make_sp_solver's internals through a single-scenario closure
    sp_solver_local = _make_solve_local(plant, cost, cfg, S, axis)

    b_sharded = P(batch_axis, axis)       # (B, N, ...) scenario x time
    b_only = P(batch_axis)
    rep = P()
    out_specs = SolveOutput(
        x=b_sharded, u=b_sharded, K=b_sharded, d=b_sharded, P=b_sharded,
        p=b_sharded, J=b_only, iters=b_only, J_trace=b_only,
        alpha_trace=b_only, rho=b_only, max_defect=b_only,
        converged=b_only, last_feasible=b_only, defect_trace=b_only,
    )

    def solve_batch(x0s, u0s, goals, weights: Optional[CostWeights] = None,
                    initial_rollout: bool = True) -> SolveOutput:
        w = weights if weights is not None else CostWeights()
        goal_spec = jax.tree_util.tree_map(lambda _: b_only, goals)
        w_spec = jax.tree_util.tree_map(lambda _: rep, w)

        def local(x_l, u_l, goals_l, w_l):
            return jax.vmap(
                lambda x, u, g: sp_solver_local(x, u, g, w_l, initial_rollout)
            )(x_l, u_l, goals_l)

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(b_sharded, b_sharded, goal_spec, w_spec),
            out_specs=out_specs,
            check_vma=False,
        )
        with jax.default_matmul_precision("highest"):
            return fn(jnp.asarray(x0s), jnp.asarray(u0s), goals, w)

    return jax.jit(solve_batch, static_argnames=("initial_rollout",))
