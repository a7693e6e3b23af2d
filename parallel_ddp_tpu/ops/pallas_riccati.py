"""Fused Pallas block-Riccati backward sweep — the backPassKern twin.

The reference's backward pass is ONE persistent CUDA kernel per block grid:
each block sweeps its time slice serially in shared memory, all matrix temps
staged on-chip (backPassKern, bpHelpers.cuh:336-420).  The XLA path
(parallel/backward.py run_block) expresses the same recursion as a `lax.scan`
whose every step dispatches a handful of small-matrix kernels — on the
latency-bound single-solve path those dispatches dominate the backward pass's
wall time (the same pathology the fused Pallas rollout removed from the
forward pass, ops/pallas_rollout.py).  This module fuses the whole sweep into
one Pallas kernel:

  * grid = (Nb,) time steps, iterated oldest-emitted-last: a TPU Pallas grid
    executes sequentially on the core, which is exactly what a recursion
    needs; the cost-to-go carry (P, p) lives in VMEM scratch across grid
    steps, the per-step inputs (AB, H, g, d, masks) are streamed HBM->VMEM by
    the BlockSpec pipeline (auto double-buffered), and the per-step outputs
    stream back.
  * lanes = shooting blocks: every (8, 128) f32 tile holds one scalar channel
    of all M_BLOCKS_B parallel block sweeps (the reference's gridDim.x).  The
    latency path has M=4 of 1024 lanes live — occupancy is irrelevant there,
    dispatch count is everything, same trade the fused rollout makes.
  * channel-tile math: matrices are Python lists of lane tiles and every
    matmul unrolls to VPU multiply-adds (the models/kuka/soa.py discipline) —
    formula-for-formula the same recursion as parallel/backward.py
    make_riccati_step (bpHelpers.cuh:37-334), including the Tassa STATE_REG
    asymmetry, defect coupling on shooting boundaries, the terminal-step
    pass-through, and the Cholesky PD test (ops/linalg.py loop structure,
    verbatim on tiles).

Exactness is tested against the XLA block path in tests/test_pallas_riccati.py
(same math, different accumulation order in the matmuls -> allclose, not
bitwise).  Opt-in via SolverConfig.pallas_riccati; the rho-retry while_loop
(backwardPassGPU, bpHelpers.cuh:483-517) wraps this kernel unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_ddp_tpu.ops import tpu_limits

_SUB, _LANE = 8, 128
_TILE = _SUB * _LANE

# VMEM guard (bytes): per-step in/out slabs are double-buffered by the grid
# pipeline; seeds + carry are resident.  Refuse shapes past ~13 MB so callers
# keep the XLA scan path instead of failing at compile time.  This is
# intentionally NOT the compiler ceiling below (tpu_limits.py): it is the
# conservative SINGLE-INSTANCE working-set gate, sized so that a
# scenario-vmapped caller (which multiplies the working set by its batch grid
# pipelining) still fits under the raised ceiling.
_VMEM_BUDGET = 13 * 1024 * 1024


def _mm(A, B):
    """Tile-matrix product: [[tile]] (a x b) @ (b x c) -> (a x c)."""
    a, b = len(A), len(B)
    c = len(B[0])
    out = []
    for i in range(a):
        row = []
        for j in range(c):
            acc = A[i][0] * B[0][j]
            for k in range(1, b):
                acc = acc + A[i][k] * B[k][j]
            row.append(acc)
        out.append(row)
    return out


def _mv(A, v):
    """Tile-matrix @ tile-vector: (a x b) @ (b,) -> (a,)."""
    out = []
    for i in range(len(A)):
        acc = A[i][0] * v[0]
        for k in range(1, len(v)):
            acc = acc + A[i][k] * v[k]
        out.append(acc)
    return out


def _T(A):
    return [[A[i][j] for i in range(len(A))] for j in range(len(A[0]))]


def _chol_solve_tiles(M_, rhs, eps=0.0):
    """ops/linalg.py chol_solve_unrolled, verbatim loop structure on lane
    tiles: M_ [[tile]] (d x d) SPD, rhs [[tile]] (d x r).  Returns
    (X (d x r), ok tile bool) — failed pivots clamped to 1 so X stays finite,
    callers gate on ok (the rho-retry contract, bpHelpers.cuh:483-517)."""
    d = len(M_)
    r = len(rhs[0])
    l_ch = [[None] * d for _ in range(d)]
    ok = None
    for j in range(d):
        acc = M_[j][j]
        for k in range(j):
            acc = acc - l_ch[j][k] * l_ch[j][k]
        pos = acc > eps
        ok = pos if ok is None else jnp.logical_and(ok, pos)
        l_ch[j][j] = jnp.sqrt(jnp.where(pos, acc, 1.0))
        inv = 1.0 / l_ch[j][j]
        for i in range(j + 1, d):
            a2 = M_[i][j]
            for k in range(j):
                a2 = a2 - l_ch[i][k] * l_ch[j][k]
            l_ch[i][j] = a2 * inv

    z = [None] * d
    for i in range(d):
        row = []
        for c in range(r):
            acc = rhs[i][c]
            for k in range(i):
                acc = acc - l_ch[i][k] * z[k][c]
            row.append(acc / l_ch[i][i])
        z[i] = row
    y = [None] * d
    for i in reversed(range(d)):
        row = []
        for c in range(r):
            acc = z[i][c]
            for k in range(i + 1, d):
                acc = acc - l_ch[k][i] * y[k][c]
            row.append(acc / l_ch[i][i])
        y[i] = row
    return y, ok


def _riccati_kernel(n, m, state_reg, use_defect,
                    seedP_ref, seedp_ref, rho_ref,
                    ab_ref, H_ref, g_ref, d_ref, msk_ref,
                    P_out, p_out, K_out, du_out, ApBK_out, Bdu_out,
                    dj_out, fail_out,
                    Pc, pc):
    """One Riccati step on all block lanes (bpHelpers.cuh:37-334; mirrors
    parallel/backward.py make_riccati_step line for line)."""
    nm = n + m
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        Pc[:] = seedP_ref[:]
        pc[:] = seedp_ref[:]

    # per-LANE regularizer tile: under scenario lane-packing (see
    # make_riccati_block_call's custom_vmap rule) each lane can belong to a
    # different scenario mid-rho-retry, so rho is data, not a scalar
    rho = rho_ref[0]
    P = [[Pc[i * n + j] for j in range(n)] for i in range(n)]
    p = [pc[i] for i in range(n)]
    ab = [[ab_ref[0, i * nm + j] for j in range(nm)] for i in range(n)]
    Hk = [[H_ref[0, i * nm + j] for j in range(nm)] for i in range(nm)]
    gk = [g_ref[0, i] for i in range(nm)]
    term = msk_ref[0, 0]       # 1.0 where k == N-1 (and on padding lanes)
    is_term = term > 0.5
    A_m = [row[:n] for row in ab]
    B_m = [row[n:] for row in ab]

    # defect coupling on shooting boundaries (bpHelpers.cuh:67-81)
    if use_defect:
        dfct = msk_ref[0, 1]   # 1.0 where (k+1) % n_blocks_f == 0 and k < N-1
        dk = [d_ref[0, i] for i in range(n)]
        Pd = _mv(P, dk)
        p_t = [p[i] + dfct * Pd[i] for i in range(n)]
    else:
        p_t = p

    # H' = H + [A B]^T P~ [A B]; Tassa STATE_REG asymmetry: x-rows see P,
    # u-rows see P + rho*I (bpHelpers.cuh:54-66)
    Pab = _mm(P, ab)                                        # n x nm
    if state_reg:
        Pab_u = [[Pab[i][j] + rho * ab[i][j] for j in range(nm)]
                 for i in range(n)]
        G_x = _mm(_T(A_m), Pab)                             # n x nm
        G_u = _mm(_T(B_m), Pab_u)                           # m x nm
        Hq = [[Hk[i][j] + (G_x[i][j] if i < n else G_u[i - n][j])
               for j in range(nm)] for i in range(nm)]
    else:
        G = _mm(_T(ab), Pab)                                # nm x nm
        Hq = [[Hk[i][j] + G[i][j] for j in range(nm)] for i in range(nm)]
        for i in range(m):
            Hq[n + i][n + i] = Hq[n + i][n + i] + rho
    Hxx = [row[:n] for row in Hq[:n]]
    Hxu = [row[n:] for row in Hq[:n]]
    Hux = [row[:n] for row in Hq[n:]]
    Huu = [row[n:] for row in Hq[n:]]
    gq = _mv(_T(ab), p_t)
    gq = [gk[i] + gq[i] for i in range(nm)]
    gx = gq[:n]
    gu = gq[n:]

    # PD test + solve (ops/linalg.py on tiles); terminal rows get Huu + I so
    # the clamp never fires there (make_riccati_step Huu_safe)
    Huu_s = [[Huu[i][j] + (term if i == j else 0.0) for j in range(m)]
             for i in range(m)]
    rhs = [Hux[i] + [gu[i]] for i in range(m)]              # m x (n+1)
    sol, ok = _chol_solve_tiles(Huu_s, rhs)
    fail_k = jnp.where(jnp.logical_or(ok, is_term), 0.0, 1.0)
    K = [row[:n] for row in sol]
    du = [row[n] for row in sol]

    if state_reg:
        # Huu @ sol = rhs -> sol^T rhs = sol^T Huu sol (make_riccati_step:110-115)
        StZ = _mm(_T(sol), rhs)                             # (n+1) x (n+1)
        HxuS = _mm(Hxu, sol)                                # n x (n+1)
        KtHux = _mm(_T(K), Hux)                             # n x n
        Ktgu = _mv(_T(K), gu)
        P_new = [[Hxx[i][j] + StZ[i][j] - HxuS[i][j] - KtHux[i][j]
                  for j in range(n)] for i in range(n)]
        p_new = [gx[i] + StZ[i][n] - HxuS[i][n] - Ktgu[i] for i in range(n)]
    else:
        HxuS = _mm(Hxu, sol)
        P_new = [[Hxx[i][j] - HxuS[i][j] for j in range(n)] for i in range(n)]
        p_new = [gx[i] - HxuS[i][n] for i in range(n)]

    BS = _mm(B_m, sol)                                      # n x (n+1)

    # terminal "step": emit the seed untouched, zero gains (bpHelpers.cuh:361-367)
    zero = term * 0.0
    dj0 = zero
    dj1 = zero
    Huu_du = _mv(Huu, du)
    for i in range(m):
        dj0 = dj0 + du[i] * gu[i]
        dj1 = dj1 + du[i] * Huu_du[i]
    dj_out[0, 0] = jnp.where(is_term, zero, dj0)
    dj_out[0, 1] = jnp.where(is_term, zero, dj1)
    fail_out[0, 0] = fail_k
    for i in range(n):
        for j in range(n):
            v = jnp.where(is_term, P[i][j], P_new[i][j])
            Pc[i * n + j] = v
            P_out[0, i * n + j] = v
            ApBK_out[0, i * n + j] = jnp.where(
                is_term, zero, A_m[i][j] - BS[i][j]
            )
        v = jnp.where(is_term, p[i], p_new[i])
        pc[i] = v
        p_out[0, i] = v
        Bdu_out[0, i] = jnp.where(is_term, zero, BS[i][n])
    for i in range(m):
        du_out[0, i] = jnp.where(is_term, zero, du[i])
        for j in range(n):
            K_out[0, i * n + j] = jnp.where(is_term, zero, K[i][j])


@functools.lru_cache(maxsize=16)
def _build(n: int, m: int, nb: int, state_reg: bool, use_defect: bool,
           interpret: bool):
    nm = n + m
    c_in = n * nm + nm * nm + nm + n + 2
    c_out = 2 * n * n + 3 * n + m * n + m + 3
    c_res = 2 * (n * n + n) + 1  # seeds + the resident per-lane rho tile
    vmem = (2 * (c_in + c_out) + c_res) * _TILE * 4
    if vmem > _VMEM_BUDGET:
        return None

    vstep = lambda c: pl.BlockSpec(
        (1, c, _SUB, _LANE), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    vfull = lambda c: pl.BlockSpec(
        (c, _SUB, _LANE), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
    )
    sdt = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    return pl.pallas_call(
        functools.partial(_riccati_kernel, n, m, state_reg, use_defect),
        grid=(nb,),
        in_specs=[
            vfull(n * n), vfull(n),                       # seeds
            vfull(1),                                     # per-lane rho
            vstep(n * nm), vstep(nm * nm), vstep(nm), vstep(n), vstep(2),
        ],
        out_specs=(
            vstep(n * n), vstep(n), vstep(m * n), vstep(m),
            vstep(n * n), vstep(n), vstep(2), vstep(1),
        ),
        out_shape=(
            sdt((nb, n * n, _SUB, _LANE)), sdt((nb, n, _SUB, _LANE)),
            sdt((nb, m * n, _SUB, _LANE)), sdt((nb, m, _SUB, _LANE)),
            sdt((nb, n * n, _SUB, _LANE)), sdt((nb, n, _SUB, _LANE)),
            sdt((nb, 2, _SUB, _LANE)), sdt((nb, 1, _SUB, _LANE)),
        ),
        scratch_shapes=[
            pltpu.VMEM((n * n, _SUB, _LANE), jnp.float32),
            pltpu.VMEM((n, _SUB, _LANE), jnp.float32),
        ],
        interpret=interpret,
        # headroom for the scenario-vmapped batch grid dimension (see
        # ops/pallas_rollout.py); generation-aware — ops/tpu_limits.py
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=tpu_limits.pallas_vmem_limit_bytes()),
    )


def _to_lanes(a, lanes):
    """(..., L) -> (..., 8, 128): pad the lane axis up to one tile."""
    pad = _TILE - lanes
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
        )
    return a.reshape(a.shape[:-1] + (_SUB, _LANE))


def make_riccati_block_call(cfg, n: int, m: int, mb: int | None = None,
                            interpret: bool | None = None):
    """Factory for the fused backward-sweep attempt (parallel/backward.py).

        bp(rho, seeds_P (Mb,n,n), seeds_p (Mb,n), AB_blk (Mb,Nb,n,n+m),
           H_blk (Mb,Nb,n+m,n+m), g_blk (Mb,Nb,n+m), d_blk (Mb,Nb,n),
           k_blk (Mb,Nb) global step indices — TRACED, so the 'sp'
           horizon-sharded solver's lax.axis_index-dependent chunk indices
           work unchanged)
          -> (P (Mb*Nb,n,n), p, K, du, ApBK, Bdu, dJexp (2,), fail bool)

    — the same contract as the vmapped run_block attempt it replaces
    (backPassKern semantics, bpHelpers.cuh:336-420).  `mb` is the number of
    block lanes (default cfg.m_blocks_b; the sp solver passes its chunk-local
    count).  Returns None when the shape exceeds the lane tile or the VMEM
    budget, so callers keep the XLA scan path.

    SCENARIO BATCHING: `bp` carries a custom_vmap rule that packs a jax.vmap
    scenario axis INTO the lane tile instead of letting Pallas replicate the
    grid.  Default batching would pad Mb lanes up to the 1024-lane tile per
    scenario (256x padding at Mb=4) and multiply that by B grid programs —
    20+ GB of HBM at B=256, the OOM that killed the batched_priccati bench.
    Packed, B=256 x Mb=4 fills the tile exactly: full VPU occupancy, 256x
    less memory, one grid pass.  Scenarios beyond one tile split into
    ceil(B/(1024/Mb)) full-lane groups (only the last group pads).  The
    kernel takes rho per lane, so per-scenario rho-retry states coexist."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Mb = cfg.m_blocks_b if mb is None else mb
    Nb = cfg.n_blocks_b
    if Mb > _TILE:
        return None
    use_defect = cfg.m_blocks_f > 1
    call = _build(n, m, Nb, cfg.state_reg, use_defect, bool(interpret))
    if call is None:
        return None
    nm = n + m
    nf = cfg.num_time_steps - 1

    def _lanes(rho_l, seeds_P, seeds_p, AB_l, H_l, g_l, d_l, k_l):
        """Lane-level core: every input lane-major with L <= _TILE lanes
        (rho_l (L,), seeds (L,n,n)/(L,n), per-step (L,Nb,...), k_l (L,Nb)).
        Returns per-lane outputs ((L,Nb,...) arrays, dJ (L,2), fail (L,))."""
        L = seeds_P.shape[0]

        def _stream(a, c):
            # (L, Nb, ...) -> (Nb, c, 8, 128): trailing dims to channels,
            # reverse time (the sweep runs k descending within each block,
            # the same reversal run_block applies), lanes to the tile
            t = jnp.transpose(a.reshape(L, Nb, c)[:, ::-1], (1, 2, 0))
            return _to_lanes(t.astype(jnp.float32), L)

        # step-index masks; padding lanes are marked terminal so their
        # clamped Cholesky never reports failure and they emit zeros/carry
        term = (k_l == nf).astype(jnp.float32)                   # (L, Nb)
        dfct = jnp.logical_and(
            (k_l + 1) % cfg.n_blocks_f == 0, k_l < nf
        ).astype(jnp.float32)
        msk = jnp.stack([term, dfct], axis=-1)                   # (L, Nb, 2)
        msk = jnp.transpose(msk[:, ::-1], (1, 2, 0))             # (Nb, 2, L)
        if L < _TILE:
            pad = jnp.zeros((Nb, 1, _TILE - L), jnp.float32)
            msk = jnp.concatenate(
                [msk, jnp.concatenate([pad + 1.0, pad], axis=1)], axis=-1
            )
        msk_tiles = msk.reshape(Nb, 2, _SUB, _LANE)

        seedP_t = _to_lanes(
            jnp.transpose(seeds_P.reshape(L, n * n), (1, 0)).astype(
                jnp.float32), L)
        seedp_t = _to_lanes(
            jnp.transpose(seeds_p, (1, 0)).astype(jnp.float32), L)
        rho_t = _to_lanes(rho_l.astype(jnp.float32).reshape(1, L), L)
        outs = call(
            seedP_t, seedp_t, rho_t,
            _stream(AB_l, n * nm), _stream(H_l, nm * nm),
            _stream(g_l, nm), _stream(d_l, n),
            msk_tiles,
        )
        P_t, p_t, K_t, du_t, ApBK_t, Bdu_t, dj_t, fail_t = outs

        def unstream(t, c, tail):
            # (Nb, c, 8, 128) -> (L, Nb) + tail: lanes back out, un-reverse
            flat = t.reshape(Nb, c, _TILE)[:, :, :L]
            blk = jnp.transpose(flat, (2, 0, 1))[:, ::-1]   # (L, Nb, c)
            return blk.reshape((L, Nb) + tail)

        dj = jnp.transpose(
            jnp.sum(dj_t.reshape(Nb, 2, _TILE)[:, :, :L], axis=0))   # (L, 2)
        fail = jnp.any(fail_t.reshape(Nb, 1, _TILE)[:, 0, :L] > 0.5,
                       axis=0)                                       # (L,)
        return (
            unstream(P_t, n * n, (n, n)),
            unstream(p_t, n, (n,)),
            unstream(K_t, m * n, (m, n)),
            unstream(du_t, m, (m,)),
            unstream(ApBK_t, n * n, (n, n)),
            unstream(Bdu_t, n, (n,)),
            dj,
            fail,
        )

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def bp(rho, seeds_P, seeds_p, AB_blk, H_blk, g_blk, d_blk, k_blk):
        dtype = AB_blk.dtype
        rho_l = jnp.broadcast_to(jnp.reshape(rho, (1,)), (Mb,))
        outs = _lanes(rho_l, seeds_P, seeds_p, AB_blk, H_blk, g_blk, d_blk,
                      k_blk)
        P, p, K, du, ApBK, Bdu, dj, fail = outs
        flat = lambda a: a.reshape((Mb * Nb,) + a.shape[2:]).astype(dtype)
        return (
            flat(P), flat(p), flat(K), flat(du), flat(ApBK), flat(Bdu),
            jnp.sum(dj, axis=0).astype(dtype), jnp.any(fail),
        )

    @bp.def_vmap
    def _bp_vmap(axis_size, in_batched, *args):
        B = axis_size
        rho, seeds_P, seeds_p, AB_blk, H_blk, g_blk, d_blk, k_blk = (
            a if bat else jnp.broadcast_to(a, (B,) + jnp.shape(a))
            for a, bat in zip(args, in_batched)
        )
        dtype = AB_blk.dtype
        rho_s = jnp.reshape(rho, (B,)).astype(jnp.float32)
        L = B * Mb

        if L <= _TILE:
            pk = lambda a: a.reshape((L,) + a.shape[2:])
            outs = _lanes(jnp.repeat(rho_s, Mb), pk(seeds_P), pk(seeds_p),
                          pk(AB_blk), pk(H_blk), pk(g_blk), pk(d_blk),
                          pk(k_blk))
        else:
            # full-lane groups of gb scenarios; only the last group pads,
            # with its padding lanes marked terminal (k = nf) -> inert
            gb = _TILE // Mb
            G = -(-B // gb)
            pad_b = G * gb - B

            def pad_s(a, fill=0.0):
                widths = [(0, pad_b)] + [(0, 0)] * (a.ndim - 1)
                return jnp.pad(a, widths, constant_values=fill)

            grp = lambda a: a.reshape((G, gb * Mb) + a.shape[2:])
            rho_g = jnp.repeat(pad_s(rho_s), Mb).reshape(G, gb * Mb)
            outs = jax.vmap(_lanes)(
                rho_g, grp(pad_s(seeds_P)), grp(pad_s(seeds_p)),
                grp(pad_s(AB_blk)), grp(pad_s(H_blk)), grp(pad_s(g_blk)),
                grp(pad_s(d_blk)), grp(pad_s(k_blk, fill=nf)),
            )
            outs = tuple(
                a.reshape((G * gb * Mb,) + a.shape[2:])[:L] for a in outs
            )

        P, p, K, du, ApBK, Bdu, dj, fail = outs
        unpack = lambda a: a.reshape(
            (B, Mb * Nb) + a.shape[2:]).astype(dtype)
        res = (
            unpack(P), unpack(p), unpack(K), unpack(du), unpack(ApBK),
            unpack(Bdu),
            jnp.sum(dj.reshape(B, Mb, 2), axis=1).astype(dtype),
            jnp.any(fail.reshape(B, Mb), axis=1),
        )
        return res, (True,) * 8

    return bp


def fused_riccati_active(cfg, n: int, m: int, mb: int | None = None) -> bool:
    """True when a `pallas_riccati=True` solve at this shape actually engages
    the fused kernel; False means make_riccati_block_call fell back to the
    XLA scan path (lane tile or _VMEM_BUDGET exceeded).  Benchmarks record
    this next to 'pallas+riccati'-labelled numbers so the artifact cannot
    silently mislabel a fallback run (ADVICE r3)."""
    return make_riccati_block_call(cfg, n, m, mb=mb) is not None
