"""Block-parallel backward pass (bpHelpers.cuh).

The horizon is split into `m_blocks_b` time blocks swept *in parallel* (a stale-
information / iterated-consensus Riccati: non-final blocks seed their boundary
cost-to-go from the PREVIOUS iteration's values Pp/pp — the reference's
FORCE_PARALLEL semantics, bpHelpers.cuh:356-420, config.cuh:95).  Each block is a
serial `lax.scan` back in time; blocks are a `vmap` axis (the reference's
`backPassKern<<<M_BLOCKS_B, (8,7)>>>`).

Per step (bpHelpers.cuh:37-334), with V_{k+1} = (P, p) the cost-to-go quadratic:
  p~   = p + P @ d_k                      on multiple-shooting defect boundaries
  Hxx += A'PA    Hxu += A'PB              (P unregularized)
  Hux += B'P+A   Huu += B'P+B             (P+ = P + rho*I; Tassa STATE_REG — the
                                           asymmetry is deliberate, bpHelpers.cuh:54-66)
  K = Huu^-1 Hux    du = Huu^-1 gu        (via Cholesky; PD failure -> rho retry)
  P' = Hxx + K'HuuK - HxuK - K'Hux        (bpHelpers.cuh:222-276)
  p' = gx + K'Huu du - Hxu du - K'gu
  ApBK = A - BK     Bdu = B du            (forward-sweep vars, bpHelpers.cuh:278-312)
  dJexp += (du . gu, du . Huu du)         (bpHelpers.cuh:314-334)

The reference inverts Huu by Gauss-Jordan/adjugate (bpHelpers.cuh:96-204) and
flags non-PD failures; here Huu is factorized by Cholesky — NaN in the factor is
the PD test — and failure triggers the same rho-increase retry
(backwardPassGPU, bpHelpers.cuh:483-517) in an outer `lax.while_loop`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from parallel_ddp_tpu.config import SolverConfig
from parallel_ddp_tpu.ops.linalg import chol_solve_unrolled


class BackwardPassResult(NamedTuple):
    P: jnp.ndarray      # (N, n, n) cost-to-go Hessian at each step
    p: jnp.ndarray      # (N, n) cost-to-go gradient
    K: jnp.ndarray      # (N, m, n) feedback gains (row N-1 zero)
    du: jnp.ndarray     # (N, m) feedforward steps (row N-1 zero)
    ApBK: jnp.ndarray   # (N, n, n) A - B@K
    Bdu: jnp.ndarray    # (N, n) B@du
    dJexp: jnp.ndarray  # (2,) expected-reduction terms (sum du.gu, sum du.Huu.du)
    fail: jnp.ndarray   # bool: any Huu factorization failed
    rho: jnp.ndarray    # regularizer after retries
    drho: jnp.ndarray


def make_riccati_step(cfg: SolverConfig, n: int, m: int, dtype):
    """Build the per-step Riccati/DDP recursion (bpHelpers.cuh:37-334) shared by
    the single-program backward pass below and the cross-chip 'sp'-sharded one
    (parallel/sp.py).  Returns step(rho, (P, p), (ab, Hk, gk, dk, k)) ->
    ((P', p'), per-step outputs)."""
    nf = cfg.num_time_steps - 1
    n_blocks_f = cfg.n_blocks_f
    eye_m = jnp.eye(m, dtype=dtype)

    def step(rho, carry, inputs):
        P, p = carry
        ab, Hk, gk, dk, k = inputs
        is_terminal = k == nf

        A = ab[:, :n]
        B = ab[:, n:]

        # defect coupling on shooting boundaries (bpHelpers.cuh:67-81)
        on_defect = jnp.logical_and((k + 1) % n_blocks_f == 0, k < nf)
        use_d = jnp.logical_and(cfg.m_blocks_f > 1, on_defect)
        p_t = p + jnp.where(use_d, P @ dk, jnp.zeros_like(p))

        # H' = H + [A B]^T P~ [A B] assembled with THREE dots instead of eight
        # (each batched dot is a separate TPU kernel; the backward scan is the
        # solve's dominant latency).  Tassa STATE_REG asymmetry (bpHelpers.cuh:
        # 54-66): x-rows see P, u-rows see P + rho*I — and P_reg@ab = Pab +
        # rho*ab, so the regularized product is free.
        Pab = P @ ab                       # (n, n+m)
        if cfg.state_reg:
            Pab_u = Pab + rho * ab         # P_reg @ [A B]
            G_x = A.T @ Pab                # (n, n+m)
            G_u = B.T @ Pab_u              # (m, n+m)
            Hq = Hk + jnp.concatenate([G_x, G_u], axis=0)
        else:
            G = ab.T @ Pab                 # (n+m, n+m)
            Hq = Hk + G
            Hq = Hq.at[n:, n:].add(rho * eye_m)
        Hxx = Hq[:n, :n]
        Hxu = Hq[:n, n:]
        Hux = Hq[n:, :n]
        Huu = Hq[n:, n:]
        gq = gk + ab.T @ p_t
        gx = gq[:n]
        gu = gq[n:]

        # PD test + solve via fully-unrolled Cholesky (ops/linalg.py — the
        # reference's Gauss-Jordan + pivot test, bpHelpers.cuh:96-204, in the
        # square-root form README.md:40 wishlists; unrolled because the
        # batched LAPACK-style factorization was the backward pass's single
        # largest launch-latency cost on TPU)
        Huu_safe = Huu + jnp.where(is_terminal, 1.0, 0.0) * eye_m
        rhs = jnp.concatenate([Hux, gu[:, None]], axis=-1)
        sol, pd_ok = chol_solve_unrolled(Huu_safe, rhs)
        fail_k = jnp.logical_and(~pd_ok, ~is_terminal)
        Kk = sol[:, :n]
        duk = sol[:, n]

        if cfg.state_reg:
            # Huu @ sol = rhs, so sol^T @ rhs = sol^T Huu sol: one dot yields
            # [K^T Huu K | K^T Huu du; ...] and K^T@[Hux|gu] comes with it
            StZ = sol.T @ rhs              # (n+1, n+1): sol^T Huu sol
            HxuS = Hxu @ sol               # (n, n+1): [Hxu K | Hxu du]
            P_new = Hxx + StZ[:n, :n] - HxuS[:, :n] - (sol[:, :n].T @ Hux)
            p_new = gx + StZ[:n, n] - HxuS[:, n] - sol[:, :n].T @ gu
        else:
            HxuS = Hxu @ sol
            P_new = Hxx - HxuS[:, :n]
            p_new = gx - HxuS[:, n]

        BS = B @ sol                        # (n, n+1): [B K | B du] in one dot
        ApBKk = A - BS[:, :n]
        Bduk = BS[:, n]

        # terminal "step" (k == N-1, final block only): emit the seed untouched
        zero_K = jnp.zeros_like(Kk)
        zero_du = jnp.zeros_like(duk)
        Kk = jnp.where(is_terminal, zero_K, Kk)
        duk = jnp.where(is_terminal, zero_du, duk)
        P_out = jnp.where(is_terminal, P, P_new)
        p_out = jnp.where(is_terminal, p, p_new)
        ApBKk = jnp.where(is_terminal, jnp.zeros_like(ApBKk), ApBKk)
        Bduk = jnp.where(is_terminal, jnp.zeros_like(Bduk), Bduk)
        dj = jnp.where(
            is_terminal,
            jnp.zeros((2,), dtype),
            jnp.stack([duk @ gu, duk @ (Huu @ duk)]),
        )

        # V emitted at index k is the CTG at step k; carry V for step k-1
        return (P_out, p_out), (P_out, p_out, Kk, duk, ApBKk, Bduk, dj, fail_k)

    return step


def run_block(step, rho, seed_P, seed_p, ab_b, H_b, g_b, d_b, k_b, unroll=4):
    """Serial Riccati sweep of one time block, k descending (the in-kernel time
    recursion of backPassKern, bpHelpers.cuh:369-418)."""
    # scan over reversed step order
    xs = (ab_b[::-1], H_b[::-1], g_b[::-1], d_b[::-1], k_b[::-1])
    # unroll: fewer loop-boundary kernels; the block length is short (Nb =
    # N/M_BLOCKS_B = 16 at the WAFR config) and each step is tiny, so loop
    # overhead is a large fraction of the backward pass's wall time
    (_, _), outs = lax.scan(
        lambda c, i: step(rho, c, i), (seed_P, seed_p), xs, unroll=unroll
    )
    # un-reverse to ascending k
    return jax.tree_util.tree_map(lambda a: a[::-1], outs)


def _assoc_attempt(cfg, step, AB_pad, H, g, d, rho):
    """EXACT log-depth backward pass via an associative scan (bp_assoc_scan).

    The reference parallelizes the Riccati recursion by an APPROXIMATION —
    stale prev-iteration boundary values between M_BLOCKS_B blocks
    (bpHelpers.cuh:356-420).  On TPU the recursion can instead be computed
    EXACTLY in O(log N) depth: each LQR step is a linear-fractional map on the
    value-function quadratic V(x) = 0.5 x'Px + p'x, the family

        P_i = J + F' P (I + C P)^{-1} F
        p_i = eta + F' (I + P C)^{-1} (p + P z)

    is closed under composition, and the composition rule is associative
    (Sarkka & Garcia-Fernandez, "Temporal Parallelization of Bayesian
    Smoothers", IEEE TAC 2021, Lemma 8 — adapted to this sign convention and
    verified against the serial pass in tests/test_assoc_bp.py).  A suffix
    `lax.associative_scan` over the per-step elements yields every V_k, after
    which gains/feedforwards are extracted by ONE vmapped application of the
    same per-step math used by the serial pass.

    Shooting defects enter exactly as affine dynamics offsets (z_k = d_k on
    block boundaries — for a quadratic V, grad V(x + d) = P x + (p + P d), the
    reference's p~ = p + P d coupling, bpHelpers.cuh:67-81).

    Requires plain regularization (state_reg=False): Tassa state
    regularization makes the pullback P-dependent in a way that does not fold
    into the cost, while Huu += rho I is just R~ = R + rho I."""
    N = cfg.num_time_steps
    nf = N - 1
    n = AB_pad.shape[-2]
    m = AB_pad.shape[-1] - n
    dtype = H.dtype
    eye_m = jnp.eye(m, dtype=dtype)
    eye_n = jnp.eye(n, dtype=dtype)

    A = AB_pad[:nf, :, :n]
    B = AB_pad[:nf, :, n:]
    Q = H[:nf, :n, :n]
    Mx = H[:nf, :n, n:]
    R = H[:nf, n:, n:]
    gx = g[:nf, :n]
    gu = g[:nf, n:]

    # affine offsets: the shooting defect at block boundaries
    k = jnp.arange(nf)
    on_boundary = jnp.logical_and(
        cfg.m_blocks_f > 1, (k + 1) % cfg.n_blocks_f == 0
    )
    c = jnp.where(on_boundary[:, None], d[:nf], 0.0)

    # per-step elements, R~ = R + rho I factorized once per step
    R_reg = R + rho * eye_m
    rhs = jnp.concatenate(
        [jnp.swapaxes(Mx, -1, -2), jnp.swapaxes(B, -1, -2), gu[:, :, None]],
        axis=-1,
    )
    sol, pd_ok = jax.vmap(chol_solve_unrolled)(R_reg, rhs)  # (nf, m, n+n+1)
    RiMt = sol[:, :, :n]          # R~^{-1} M'
    RiBt = sol[:, :, n:2 * n]     # R~^{-1} B'
    Rigu = sol[:, :, -1]          # R~^{-1} gu
    F = A - jnp.einsum("kij,kjl->kil", B, RiMt)
    C = jnp.einsum("kij,kjl->kil", B, RiBt)
    J = Q - jnp.einsum("kij,kjl->kil", Mx, RiMt)
    z = c - jnp.einsum("kij,kj->ki", B, Rigu)
    eta = gx - jnp.einsum("kij,kj->ki", Mx, Rigu)

    def combine(ei, ej):
        """Compose: ei earlier in time, ej later (verified associative)."""
        Fi, zi, Ci, Ji, etai = ei
        Fj, zj, Cj, Jj, etaj = ej
        # D = Fj (I + Ci Jj)^{-1};  E = Fi' (I + Jj Ci)^{-1}
        ICJ = eye_n + jnp.einsum("...ij,...jl->...il", Ci, Jj)
        IJC = eye_n + jnp.einsum("...ij,...jl->...il", Jj, Ci)
        D = jnp.swapaxes(
            jnp.linalg.solve(jnp.swapaxes(ICJ, -1, -2),
                             jnp.swapaxes(Fj, -1, -2)), -1, -2)
        E = jnp.swapaxes(
            jnp.linalg.solve(jnp.swapaxes(IJC, -1, -2), Fi), -1, -2)
        F12 = jnp.einsum("...ij,...jl->...il", D, Fi)
        z12 = jnp.einsum("...ij,...j->...i",
                         D, zi - jnp.einsum("...ij,...j->...i", Ci, etaj)) + zj
        C12 = jnp.einsum("...ij,...jl,...ml->...im", D, Ci, Fj) + Cj
        eta12 = jnp.einsum("...ij,...j->...i",
                           E, etaj + jnp.einsum("...ij,...j->...i", Jj, zi)) + etai
        J12 = jnp.einsum("...ij,...jl,...lm->...im", E, Jj, Fi) + Ji
        return (F12, z12, C12, J12, eta12)

    # suffix products: G_k = e_k o e_{k+1} o ... o e_{nf-1}.  With
    # reverse=True the scan hands the operator (accumulated-later, earlier),
    # so flip the arguments into combine's (earlier, later) convention.
    Gs = lax.associative_scan(
        lambda a, b: combine(b, a), (F, z, C, J, eta), reverse=True
    )

    # V_k = G_k applied to the terminal expansion (bpHelpers.cuh:361-367)
    P_term = H[nf, :n, :n]
    p_term = g[nf, :n]

    def apply_elem(e):
        Fk, zk, Ck, Jk, etak = e
        Pk = Jk + Fk.T @ P_term @ jnp.linalg.solve(eye_n + Ck @ P_term, Fk)
        pk = etak + Fk.T @ jnp.linalg.solve(
            eye_n + P_term @ Ck, p_term + P_term @ zk
        )
        return Pk, pk

    P_all, p_all = jax.vmap(apply_elem)(Gs)               # (nf, ...) = V_0..V_{nf-1}
    # carry for step k is V_{k+1}; the terminal row consumes V_term itself
    P_next = jnp.concatenate([P_all[1:], P_term[None], P_term[None]], axis=0)
    p_next = jnp.concatenate([p_all[1:], p_term[None], p_term[None]], axis=0)

    ks = jnp.arange(N)
    outs = jax.vmap(
        lambda Pn, pn, ab, Hk, gk, dk, kk: step(rho, (Pn, pn), (ab, Hk, gk, dk, kk))
    )(P_next[:N], p_next[:N], AB_pad, H, g, d, ks)
    (_, _), (P_o, p_o, K_o, du_o, ApBK_o, Bdu_o, dj_o, fail_o) = outs
    fail = jnp.logical_or(jnp.any(fail_o), jnp.any(~pd_ok))
    return (
        P_o, p_o, K_o, du_o, ApBK_o, Bdu_o,
        jnp.sum(dj_o, axis=0), fail,
    )


def backward_pass(
    cfg: SolverConfig,
    AB: jnp.ndarray,    # (N-1, n, n+m)
    H: jnp.ndarray,     # (N, n+m, n+m)
    g: jnp.ndarray,     # (N, n+m)
    Pp: jnp.ndarray,    # (N, n, n) previous-iteration CTG (block boundary seeds)
    pp: jnp.ndarray,    # (N, n)
    d: jnp.ndarray,     # (N, n) defects
    x: jnp.ndarray,     # (N, n) current trajectory
    xp2: jnp.ndarray,   # (N, n) trajectory at which Pp/pp were computed
    rho0: jnp.ndarray,
    drho0: jnp.ndarray,
) -> BackwardPassResult:
    """Full backward pass with the rho-retry loop (backwardPassGPU, bpHelpers.cuh:483-517)."""
    N = cfg.num_time_steps
    Mb = cfg.m_blocks_b
    Nb = cfg.n_blocks_b
    n = x.shape[-1]
    m = AB.shape[-1] - n
    dtype = x.dtype
    nf = N - 1

    # pad AB with a zero row at k = N-1 so every block has Nb uniform steps
    AB_pad = jnp.concatenate([AB, jnp.zeros((1, n, n + m), dtype)], axis=0)

    step = make_riccati_step(cfg, n, m, dtype)

    if cfg.bp_assoc_scan:
        # exact log-depth associative-scan Riccati — no block approximation,
        # no stale boundary seeds (see _assoc_attempt)
        def attempt(rho):
            return _assoc_attempt(cfg, step, AB_pad, H, g, d, rho)
    else:
        # block seeds
        ks_last = (jnp.arange(Mb) + 1) * Nb - 1      # last step index of each block
        seed_idx = jnp.minimum(ks_last + 1, nf)      # CTG index seeding the block

        def make_seed(b):
            s = seed_idx[b]
            is_final = b == Mb - 1
            # final block: terminal expansion V[N-1] = (Hxx, gx) (bpHelpers.cuh:361-367)
            P_term = H[nf, :n, :n]
            p_term = g[nf, :n]
            # other blocks: previous-iteration CTG at the boundary, optionally
            # transported through the state change (linearXfrmOrLoad, bpHelpers.cuh:16-34)
            P_seed = Pp[s]
            p_seed = pp[s]
            if cfg.linear_transform_switch:
                dx = x[s] - xp2[s]
                p_seed = p_seed + P_seed @ dx
            P0 = jnp.where(is_final, P_term, P_seed)
            p0 = jnp.where(is_final, p_term, p_seed)
            return P0, p0

        seeds_P, seeds_p = jax.vmap(make_seed)(jnp.arange(Mb))

        # reshape per-step arrays into (Mb, Nb, ...)
        AB_blk = AB_pad.reshape(Mb, Nb, n, n + m)
        H_blk = H.reshape(Mb, Nb, n + m, n + m)
        g_blk = g.reshape(Mb, Nb, n + m)
        d_blk = d.reshape(Mb, Nb, n)
        k_blk = jnp.arange(N).reshape(Mb, Nb)

        pallas_bp = None
        if cfg.pallas_riccati:
            # fused single-kernel sweep (backPassKern twin, ops/pallas_riccati.py);
            # None (shape past the lane/VMEM budget) keeps the XLA scan path
            from parallel_ddp_tpu.ops.pallas_riccati import (
                make_riccati_block_call,
            )
            pallas_bp = make_riccati_block_call(cfg, n, m)

        if pallas_bp is not None:
            def attempt(rho):
                return pallas_bp(
                    rho, seeds_P, seeds_p, AB_blk, H_blk, g_blk, d_blk, k_blk
                )
        else:
            def attempt(rho):
                outs = jax.vmap(
                    lambda sP, sp_, ab, Hb, gb, db, kb: run_block(
                        step, rho, sP, sp_, ab, Hb, gb, db, kb,
                        unroll=cfg.scan_unroll,
                    )
                )(seeds_P, seeds_p, AB_blk, H_blk, g_blk, d_blk, k_blk)
                P_o, p_o, K_o, du_o, ApBK_o, Bdu_o, dj_o, fail_o = outs
                flat = lambda a: a.reshape((N,) + a.shape[2:])
                return (
                    flat(P_o),
                    flat(p_o),
                    flat(K_o),
                    flat(du_o),
                    flat(ApBK_o),
                    flat(Bdu_o),
                    jnp.sum(dj_o, axis=(0, 1)),
                    jnp.any(fail_o),
                )

    # rho-retry loop (backwardPassGPU, bpHelpers.cuh:489-515) with a safety cap
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
    (res, fail, rho, drho, _) = lax.while_loop(retry_cond, retry_body, init)
    P_o, p_o, K_o, du_o, ApBK_o, Bdu_o, dJexp = res
    return BackwardPassResult(P_o, p_o, K_o, du_o, ApBK_o, Bdu_o, dJexp, fail, rho, drho)
