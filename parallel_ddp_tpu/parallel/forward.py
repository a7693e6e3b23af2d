"""Forward pass: sweep, multiple-shooting rollout, cost, defects, line search
(fpHelpers.cuh).

TPU-first structure:
  * the forward SWEEP's linear recurrence
        e_{k+1} = (A_k - B_k K_k) e_k + (-alpha * B_k du_k + d_k on boundaries)
    (fpHelpers.cuh:17-53) is a `lax.associative_scan` — log-depth batched
    matmuls instead of the reference's serial horizon loop, with the matrix
    prefix products shared across all line-search alphas;
  * the multiple-shooting ROLLOUT is a `lax.scan` within each shooting interval,
    `vmap`ped over (alpha, shooting block) — the reference's 2-D kernel grid
    `forwardSimKern<<<(M_BLOCKS_F, NUM_ALPHA)>>>` (fpHelpers.cuh:277-301);
  * per-alpha COST and DEFECT reductions (costKern/defectKern,
    fpHelpers.cuh:94-198) are plain vmapped reductions;
  * the LINE SEARCH over alphas (fpHelpers.cuh:395-408) is a masked argmax.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from parallel_ddp_tpu.config import SolverConfig


def sweep_combine(a, b):
    """Associative composition of affine sweep elements (M, V): e' = M e + V,
    V batched over alphas.  Shared by the single-program sweep below and the
    'sp' horizon-sharded sweep (parallel/sp.py) — the two MUST stay the same
    math (tests/test_sp.py asserts bit-parity between the paths)."""
    m1, v1 = a
    m2, v2 = b
    return (
        jnp.einsum("...ij,...jk->...ik", m2, m1),
        jnp.einsum("...ij,...aj->...ai", m2, v1) + v2,
    )


def make_sim_block(step_fn: Callable, nf: int, unroll: int = 4):
    """Per-(alpha, shooting-block) nonlinear rollout body (forwardSimInner,
    fpHelpers.cuh:223-275): u_k = u_k - alpha*du_k - K_k (x_k - xp_k), then
    integrate; the horizon's very last step (k == nf) is never simulated
    (fpHelpers.cuh:235).  Shared by multiple_shooting_rollout and the 'sp'
    horizon-sharded rollout (parallel/sp.py)."""

    def sim_block(alpha, x0, u_b, K_b, du_b, xp_b, k_b):
        def body(x_cur, inp):
            u_k, K_k, du_k, xp_k, k = inp
            u_new = u_k - alpha * du_k - K_k @ (x_cur - xp_k)
            skip = k == nf
            u_new = jnp.where(skip, u_k, u_new)
            x_next = step_fn(x_cur, u_new)
            x_next = jnp.where(skip, x_cur, x_next)
            return x_next, (x_next, u_new)

        _, (x_next_s, u_new_s) = lax.scan(
            body, x0, (u_b, K_b, du_b, xp_b, k_b), unroll=unroll
        )
        return x_next_s, u_new_s  # (Nf, n), (Nf, m)

    return sim_block


def forward_sweep(
    cfg: SolverConfig,
    ApBK: jnp.ndarray,   # (N, n, n)
    Bdu: jnp.ndarray,    # (N, n)
    d: jnp.ndarray,      # (N, n)
    x: jnp.ndarray,      # (N, n) accepted trajectory
    xp: jnp.ndarray,     # (N, n) previous trajectory (x == xp in this design;
                         #        kept as an argument for parity/clarity)
    alphas: jnp.ndarray,  # (A,)
) -> jnp.ndarray:
    """x_swept per alpha: (A, N, n).

    The sweep correction e obeys e_0 = 0, e_{k+1} = ApBK_k e_k + c_k(alpha) with
    c_k = -alpha*Bdu_k + 1{defect boundary}(k) d_k  (fpHelpers.cuh:24-41; the
    reference computes x(new)-x(old) against xp, which equals x here because the
    candidate buffers are re-broadcast from the accepted trajectory each
    iteration, nisInitHelpers.cuh:269-276)."""
    N = cfg.num_time_steps
    n = x.shape[-1]
    A = alphas.shape[0]
    k = jnp.arange(N - 1)
    on_boundary = jnp.logical_and((k + 1) % cfg.n_blocks_f == 0, k < N - 1)
    # c: (N-1, A, n)
    c = (
        -alphas[None, :, None] * Bdu[:-1, None, :]
        + jnp.where(on_boundary[:, None], d[:-1], 0.0)[:, None, :]
    )
    mats = ApBK[:-1]  # (N-1, n, n)

    _, e = lax.associative_scan(sweep_combine, (mats, c))
    # e[k] = e_{k+1}; prepend e_0 = 0
    e_full = jnp.concatenate([jnp.zeros((1, A, n), x.dtype), e], axis=0)  # (N, A, n)
    return x[None] + jnp.transpose(e_full, (1, 0, 2))


class RolloutResult(NamedTuple):
    x: jnp.ndarray      # (A, N, n) candidate trajectories
    u: jnp.ndarray      # (A, N, m) candidate controls
    d: jnp.ndarray      # (A, N, n) candidate defects (nonzero on boundaries)
    J: jnp.ndarray      # (A,) total cost
    max_defect: jnp.ndarray  # (A,) max over boundaries of the L1 defect norm


def multiple_shooting_rollout(
    cfg: SolverConfig,
    step_fn: Callable,
    stage_cost: Callable,   # (x, u, k) -> scalar (goal/weights closed over)
    x_swept: jnp.ndarray,   # (A, N, n)
    u: jnp.ndarray,         # (N, m)
    K: jnp.ndarray,         # (N, m, n)
    du: jnp.ndarray,        # (N, m)
    xp: jnp.ndarray,        # (N, n)
    alphas: jnp.ndarray,    # (A,)
    fused_sim: Optional[Callable] = None,
) -> RolloutResult:
    """Simulate all (alpha, shooting block) pairs (forwardSimInner, fpHelpers.cuh:223-275).

    Within block b, starting from the swept block-start state:
        u_k = u_k - alpha*du_k - K_k (x_k - xp_k)      (computeControlKT, :200-221)
        x_{k+1} = step(x_k, u_k)
    The simulated state at a block's final step becomes the defect
    d = x_sim - x_swept[next block start] instead of overwriting it (:253-258).
    """
    N = cfg.num_time_steps
    M = cfg.m_blocks_f
    Nf = cfg.n_blocks_f
    n = x_swept.shape[-1]
    m = u.shape[-1]
    A = alphas.shape[0]
    nf = N - 1

    u_blk = u.reshape(M, Nf, m)
    K_blk = K.reshape(M, Nf, m, n)
    du_blk = du.reshape(M, Nf, m)
    xp_blk = xp.reshape(M, Nf, n)
    k_blk = jnp.arange(N).reshape(M, Nf)

    if fused_sim is not None:
        # one kernel for the whole (alpha, block) grid (forwardSimKern twin)
        x_next_all, u_new_all = fused_sim(x_swept, u, K, du, xp, alphas)
    else:
        sim_block = make_sim_block(step_fn, nf, unroll=cfg.scan_unroll)

        # vmap over blocks, then alphas
        def sim_all_blocks(alpha, xs_a):
            x0s = xs_a.reshape(M, Nf, n)[:, 0]  # swept block starts
            return jax.vmap(sim_block, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                alpha, x0s, u_blk, K_blk, du_blk, xp_blk, k_blk
            )

        x_next_all, u_new_all = jax.vmap(sim_all_blocks)(alphas, x_swept)
    # x_next_all: (A, M, Nf, n); u_new_all: (A, M, Nf, m)

    xs_blk = x_swept.reshape(A, M, Nf, n)
    # candidate trajectory: block starts from sweep, interior from sim
    x_cand_blk = jnp.concatenate([xs_blk[:, :, :1], x_next_all[:, :, :-1]], axis=2)
    x_cand = x_cand_blk.reshape(A, N, n)
    # the final block's last simulated state IS x[N-1]: block M-1 step Nf-2
    # already landed in x_cand via x_next_all[:, -1, Nf-2] -> index N-1.  ✓
    u_cand = u_new_all.reshape(A, N, m)

    # defects: block b < M-1 final step vs next block's swept start
    if M > 1:
        d_boundary = x_next_all[:, :-1, -1] - xs_blk[:, 1:, 0]  # (A, M-1, n)
        d_cand = jnp.zeros((A, N, n), x_swept.dtype)
        bidx = (jnp.arange(M - 1) + 1) * Nf - 1
        d_cand = d_cand.at[:, bidx].set(d_boundary)
        # max-abs defect metric (defectKern, fpHelpers.cuh:94-111: max over
        # boundaries of the per-boundary L1 norm)
        max_defect = jnp.max(jnp.sum(jnp.abs(d_boundary), axis=-1), axis=-1)
    else:
        d_cand = jnp.zeros((A, N, n), x_swept.dtype)
        max_defect = jnp.zeros((A,), x_swept.dtype)

    # total cost per alpha (costKern, fpHelpers.cuh:130-198)
    ks = jnp.arange(N)
    J = jax.vmap(
        lambda xa, ua: jnp.sum(jax.vmap(stage_cost)(xa, ua, ks))
    )(x_cand, u_cand)

    return RolloutResult(x_cand, u_cand, d_cand, J, max_defect)


def slq_rollout(
    cfg: SolverConfig,
    stage_cost: Callable,
    x: jnp.ndarray,
    u: jnp.ndarray,
    K: jnp.ndarray,
    du: jnp.ndarray,
    ApBK: jnp.ndarray,
    Bdu: jnp.ndarray,
    xp: jnp.ndarray,
    alphas: jnp.ndarray,
) -> RolloutResult:
    """SLQ forward pass: roll the LINEARIZED dynamics (forwardSimSLQInner,
    fpHelpers.cuh:573-632).  x_{k+1} += ApBK dx_k - alpha Bdu_k;
    u_k -= alpha du_k + K_k dx_k; no defects (single shooting)."""
    N = cfg.num_time_steps
    A = alphas.shape[0]
    n = x.shape[-1]
    d_zero = jnp.zeros_like(x)
    x_cand = forward_sweep(cfg, ApBK, Bdu, d_zero, x, xp, alphas)
    dx = x_cand - xp[None]
    u_cand = (
        u[None]
        - alphas[:, None, None] * du[None]
        - jnp.einsum("kmn,akn->akm", K, dx)
    )
    ks = jnp.arange(N)
    J = jax.vmap(
        lambda xa, ua: jnp.sum(jax.vmap(stage_cost)(xa, ua, ks))
    )(x_cand, u_cand)
    return RolloutResult(
        x_cand, u_cand, jnp.zeros((A, N, n), x.dtype), J, jnp.zeros((A,), x.dtype)
    )


class LineSearchResult(NamedTuple):
    accept: jnp.ndarray      # bool
    alpha_idx: jnp.ndarray   # int (0 if rejected)
    J: jnp.ndarray           # selected cost (prevJ if rejected)
    dJ: jnp.ndarray          # cost reduction (-1 style if rejected)
    z: jnp.ndarray           # expected-reduction ratio
    max_defect: jnp.ndarray  # selected defect
    ignore_defect: jnp.ndarray  # updated flag
    best_dJ_frac: jnp.ndarray  # max (prevJ - J)/prevJ over alphas, pre-tests;
                               # a rejected step with this < tol_cost means
                               # "already converged", not "failed"
    any_feasible: jnp.ndarray  # some candidate kept J non-increasing AND the
                               # defect in bound — a rejection is then z-test
                               # conservatism, not solver breakdown


def line_search(
    cfg: SolverConfig,
    J: jnp.ndarray,           # (A,)
    max_defect: jnp.ndarray,  # (A,)
    alphas: jnp.ndarray,      # (A,)
    dJexp: jnp.ndarray,       # (2,)
    prevJ: jnp.ndarray,
    ignore_defect: jnp.ndarray,
) -> LineSearchResult:
    """Accept the best (or first) alpha passing the J/z/defect tests
    (forwardSimGPU line-search scan, fpHelpers.cuh:395-408)."""
    cdJ = prevJ - J
    j_ok = cdJ >= 0.0
    expected = alphas * dJexp[0] + 0.5 * alphas * alphas * dJexp[1]
    z = cdJ / expected
    if cfg.use_exp_red:
        z_ok = jnp.logical_and(z > cfg.exp_red_min, z < cfg.exp_red_max)
    else:
        z_ok = jnp.ones_like(j_ok)
    if cfg.m_blocks_f > 1 and cfg.use_max_defect:
        d_ok = jnp.logical_or(ignore_defect, max_defect < cfg.max_defect_size)
    else:
        d_ok = jnp.ones_like(j_ok)
    valid = j_ok & z_ok & d_ok

    accept = jnp.any(valid)
    if cfg.alpha_best_switch:
        score = jnp.where(valid, cdJ, -jnp.inf)
        idx = jnp.argmax(score)
    else:
        idx = jnp.argmax(valid)  # first valid
    idx = jnp.where(accept, idx, 0)

    sel_d = max_defect[idx]
    new_ignore = jnp.where(
        jnp.logical_and(accept, sel_d < cfg.max_defect_size),
        jnp.zeros_like(ignore_defect),
        ignore_defect,
    )
    return LineSearchResult(
        accept=accept,
        alpha_idx=idx,
        J=jnp.where(accept, J[idx], prevJ),
        dJ=jnp.where(accept, cdJ[idx], -jnp.ones_like(prevJ)),
        z=jnp.where(accept, z[idx], jnp.zeros_like(prevJ)),
        max_defect=sel_d,
        ignore_defect=new_ignore,
        best_dJ_frac=jnp.max(cdJ) / jnp.maximum(prevJ, jnp.finfo(J.dtype).tiny),
        any_feasible=jnp.any(j_ok & d_ok),
    )


def forward_pass(
    cfg: SolverConfig,
    step_fn: Callable,
    stage_cost: Callable,
    x: jnp.ndarray,
    u: jnp.ndarray,
    d: jnp.ndarray,
    K: jnp.ndarray,
    du: jnp.ndarray,
    ApBK: jnp.ndarray,
    Bdu: jnp.ndarray,
    xp: jnp.ndarray,
    alphas: jnp.ndarray,
    fused_sim: Optional[Callable] = None,
) -> RolloutResult:
    """Sweep (if multiple shooting) + rollout for every alpha."""
    if cfg.slq:
        return slq_rollout(cfg, stage_cost, x, u, K, du, ApBK, Bdu, xp, alphas)
    if cfg.m_blocks_f > 1:
        x_swept = forward_sweep(cfg, ApBK, Bdu, d, x, xp, alphas)
    else:
        x_swept = jnp.broadcast_to(x[None], (alphas.shape[0],) + x.shape)
    return multiple_shooting_rollout(
        cfg, step_fn, stage_cost, x_swept, u, K, du, xp, alphas,
        fused_sim=fused_sim,
    )
