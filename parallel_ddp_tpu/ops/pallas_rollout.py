"""Fused Pallas multiple-shooting rollout — the forwardSimKern twin.

The reference's forward simulation is ONE fused CUDA kernel over the grid
(shooting block, alpha): per step compute the feedback control and integrate
the full Kuka RBD, entirely in shared memory (forwardSimKern,
fpHelpers.cuh:223-301).  The XLA path (forward.multiple_shooting_rollout)
expresses the same math as a `lax.scan` whose every step dispatches a handful
of kernels — on the latency-bound single-solve path those dispatches ARE the
forward-sim wall time.  This module is the true TPU twin: one Pallas kernel
rolls a whole shooting block for every (block, alpha) lane, the scalar-channel
RBD (models/kuka/soa.py) plus the integrator staged through VMEM like the
reference stages through shared memory.

Layout: lanes = (alpha, block) pairs flattened alpha-major into one (8, 128)
f32 tile (A*M <= 1024 — the WAFR config uses 64 of 1024 lanes; occupancy is
irrelevant on the latency path, dispatch count is everything).  Per-step
inputs (u, K, du, xp) are (Nf, 126, 8, 128) VMEM slabs indexed by the in-kernel
`fori_loop` — VMEM use is ~Nf * 0.5 MB, so Nf <= 24 fits comfortably; the
factory refuses larger blocks (callers fall back to the XLA path).

Exactness: channel math is identical to the XLA path (same soa core, same
integrator formulas, same skip-the-last-step masking), verified elementwise in
tests/test_pallas_rollout.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_ddp_tpu.models.kuka import soa
from parallel_ddp_tpu.ops import tpu_limits

NJ = 7
NS = 14
_SUB, _LANE = 8, 128
_TILE = _SUB * _LANE
# VMEM guard: per-step input slab is (NJ + NJ*NS + NJ + NS) = 126 channels
_C_IN = NJ + NJ * NS + NJ + NS
MAX_NB = 24


def _xdot_channels(cc, xs, us):
    """d[x]/dt channels: [qd, qdd] (ops/integrators.py _xdot)."""
    qdd = soa.qdd_channels(cc, list(xs[:NJ]), list(xs[NJ:]), list(us))
    return list(xs[NJ:]) + list(qdd)


def _step_channels(cc, integrator, dt, xs, us):
    """One integrator step on channels — formula-for-formula the XLA
    make_step (ops/integrators.py:38-67)."""
    k1 = _xdot_channels(cc, xs, us)
    if integrator == 1:
        return [x + dt * k for x, k in zip(xs, k1)]
    if integrator == 2:
        xm = [x + 0.5 * dt * k for x, k in zip(xs, k1)]
        k2 = _xdot_channels(cc, xm, us)
        return [x + dt * k for x, k in zip(xs, k2)]
    if integrator == 3:
        x2 = [x + 0.5 * dt * k for x, k in zip(xs, k1)]
        k2 = _xdot_channels(cc, x2, us)
        x3 = [x + dt * (2.0 * b - a) for x, a, b in zip(xs, k1, k2)]
        k3 = _xdot_channels(cc, x3, us)
        return [
            x + (dt / 6.0) * (a + 4.0 * b + c)
            for x, a, b, c in zip(xs, k1, k2, k3)
        ]
    raise ValueError(f"unknown integrator {integrator}")


def _rollout_kernel(cc, integrator, dt, nb,
                    x0_ref, sin_ref, alpha_ref, skip_ref,
                    xout_ref, uout_ref):
    alpha = alpha_ref[0]

    def body(t, carry):
        xs = [carry[i] for i in range(NS)]
        slab = sin_ref[t]                       # (126, 8, 128) VMEM read
        u_nom = [slab[i] for i in range(NJ)]
        du = [slab[NJ + NJ * NS + i] for i in range(NJ)]
        xp = [slab[NJ + NJ * NS + NJ + i] for i in range(NS)]
        skip = skip_ref[t, 0] > 0.5             # (8, 128) bool: k == N-1

        # u = u_nom - alpha*du - K (x - xp)   (computeControlKT, fp:200-221)
        dx = [xs[j] - xp[j] for j in range(NS)]
        u_new = []
        for i in range(NJ):
            fb = slab[NJ + i * NS] * dx[0]
            for j in range(1, NS):
                fb = fb + slab[NJ + i * NS + j] * dx[j]
            un = u_nom[i] - alpha * du[i] - fb
            # the horizon's very last step is never simulated (fp:235)
            u_new.append(jnp.where(skip, u_nom[i], un))

        x_next = _step_channels(cc, integrator, dt, xs, u_new)
        x_next = [jnp.where(skip, xs[i], x_next[i]) for i in range(NS)]
        xout_ref[t] = jnp.stack(x_next)
        uout_ref[t] = jnp.stack(u_new)
        return jnp.stack(x_next)

    jax.lax.fori_loop(0, nb, body, x0_ref[:])


@functools.lru_cache(maxsize=8)
def _build(ee_type: int, gravity: float, integrator: int, dt: float,
           nb: int, interpret: bool):
    cc = soa._consts(ee_type, gravity)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rollout_kernel, cc, integrator, dt, nb),
        out_shape=(
            jax.ShapeDtypeStruct((nb, NS, _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, NJ, _SUB, _LANE), jnp.float32),
        ),
        in_specs=[vspec] * 4,
        out_specs=(vspec, vspec),
        interpret=interpret,
        # scenario-vmap prepends a batch grid dimension whose double-buffered
        # per-step slabs (~18 MB at B=256) exceed Mosaic's default 16 MB
        # scoped-vmem cap — raise the ceiling (generation-aware, tpu_limits.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=tpu_limits.pallas_vmem_limit_bytes()),
    )


def _to_lanes(a, n_lanes):
    """(..., L) -> (..., 8, 128), zero-padding L up to one tile."""
    pad = _TILE - n_lanes
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
        )
    return a.reshape(a.shape[:-1] + (_SUB, _LANE))


def make_kuka_fused_rollout(ee_type: int, gravity: float, integrator: int,
                            dt: float, num_time_steps: int, m_blocks_f: int,
                            num_alpha: int, interpret: bool = False):
    """Factory for the solver hook (Plant.fused_rollout):

        fused(x_swept (A,N,n), u (N,m), K (N,m,n), du (N,m), xp (N,n),
              alphas (A,)) -> (x_next_all (A,M,Nf,n), u_new_all (A,M,Nf,m))

    Returns None when the shape doesn't fit the kernel's lane/VMEM budget —
    block longer than MAX_NB, or num_alpha * m_blocks_f lanes past one tile —
    so callers keep the XLA scan path.

    `skip_mask` (call-time, optional): (M, Nf) mask of steps that must not be
    simulated.  Defaults to the static global-horizon mask {k == N-1}.  The
    'sp' horizon-sharded solver (parallel/sp.py) passes a TRACED chunk-local
    mask instead — there N/M above are the per-device chunk shape and only the
    LAST device's final step is the true horizon end, which depends on
    lax.axis_index and so cannot be baked in at trace time.

    SCENARIO BATCHING: the kernel call carries a custom_vmap rule that packs
    a jax.vmap scenario axis INTO the lane tile (same design as
    ops/pallas_riccati.py): default batching would stream each scenario's
    per-step slabs padded from A*M = 64 lanes up to 1024 (16x waste, ~8 GB of
    HBM traffic at B=256); packed, 16 scenarios share each full tile."""
    N = num_time_steps
    M = m_blocks_f
    nf_steps = N // M  # Nf
    if N % M or nf_steps > MAX_NB or num_alpha * M > _TILE:
        return None
    call = _build(ee_type, gravity, integrator, dt, nf_steps, interpret)
    nf_idx = N - 1
    L = num_alpha * M  # (alpha, block) lanes per scenario

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def packed_core(x0_l, sin_l, al_l, skip_l):
        """Lane-level kernel call: x0_l (NS, L), sin_l (Nf, C, L), al_l (1, L),
        skip_l (Nf, 1, L) -> (xout (Nf, NS, L), uout (Nf, NJ, L))."""
        xout, uout = call(
            _to_lanes(x0_l, L), _to_lanes(sin_l, L),
            _to_lanes(al_l, L), _to_lanes(skip_l, L),
        )
        unt = lambda t, c: t.reshape(nf_steps, c, _TILE)[:, :, :L]
        return unt(xout, NS), unt(uout, NJ)

    @packed_core.def_vmap
    def _packed_vmap(axis_size, in_batched, *args):
        B = axis_size
        x0_l, sin_l, al_l, skip_l = (
            a if bat else jnp.broadcast_to(a, (B,) + jnp.shape(a))
            for a, bat in zip(args, in_batched)
        )
        gs = max(1, min(_TILE // L, B))   # scenarios per full-lane group
        G = -(-B // gs)
        pad_b = G * gs - B

        def grp(a, fill):
            # (B, ..., L) -> (G, ..., gs*L): pad the scenario axis (inert
            # lanes: skip=1 everywhere), group, fold scenarios into lanes
            if pad_b:
                widths = [(0, pad_b)] + [(0, 0)] * (a.ndim - 1)
                a = jnp.pad(a, widths, constant_values=fill)
            a = a.reshape((G, gs) + a.shape[1:])
            a = jnp.moveaxis(a, 1, -2)
            return a.reshape(a.shape[:-2] + (gs * L,))

        def one_group(x0g, sing, alg, skipg):
            Lg = gs * L
            xout, uout = call(
                _to_lanes(x0g, Lg), _to_lanes(sing, Lg),
                _to_lanes(alg, Lg), _to_lanes(skipg, Lg),
            )
            unt = lambda t, c: t.reshape(nf_steps, c, _TILE)[:, :, :Lg]
            return unt(xout, NS), unt(uout, NJ)

        xo, uo = jax.vmap(one_group)(
            grp(x0_l, 0.0), grp(sin_l, 0.0), grp(al_l, 0.0), grp(skip_l, 1.0)
        )

        def ungrp(a):
            # (G, Nf, c, gs*L) -> (B, Nf, c, L)
            a = a.reshape(a.shape[:-1] + (gs, L))
            a = jnp.moveaxis(a, -2, 1)
            return a.reshape((G * gs,) + a.shape[2:])[:B]

        return (ungrp(xo), ungrp(uo)), (True, True)

    def fused(x_swept, u, K, du, xp, alphas, skip_mask=None):
        A = alphas.shape[0]
        assert A * M == L, f"alphas changed shape: {A}*{M} != {L}"
        f32 = jnp.float32

        def per_step(blk, c):
            """(M, Nf, c) block-major -> (Nf, c, L) lane channels (lane =
            a*M + b; values are alpha-independent, broadcast over a)."""
            t_maj = jnp.transpose(blk.reshape(M, nf_steps, c), (1, 2, 0))
            t_rep = jnp.broadcast_to(
                t_maj[:, :, None, :], (nf_steps, c, A, M)
            )
            return t_rep.reshape(nf_steps, c, L)

        u_blk = u.reshape(M, nf_steps, NJ)
        K_blk = K.reshape(M, nf_steps, NJ * NS)
        du_blk = du.reshape(M, nf_steps, NJ)
        xp_blk = xp.reshape(M, nf_steps, NS)
        sin = jnp.concatenate(
            [per_step(u_blk, NJ), per_step(K_blk, NJ * NS),
             per_step(du_blk, NJ), per_step(xp_blk, NS)], axis=1
        ).astype(f32)                                    # (Nf, 126, L)

        if skip_mask is None:
            ks = np.arange(M)[:, None] * nf_steps + np.arange(nf_steps)[None, :]
            skip_mask = jnp.asarray((ks == nf_idx).astype(np.float32))  # (M, Nf)
        skip = per_step(skip_mask.astype(f32)[:, :, None], 1)

        x0_l = jnp.transpose(
            x_swept.reshape(A, M, nf_steps, NS)[:, :, 0], (2, 0, 1)
        ).reshape(NS, L).astype(f32)                     # (NS, L)
        al_l = jnp.broadcast_to(
            alphas.astype(f32)[:, None], (A, M)
        ).reshape(1, L)

        xout, uout = packed_core(x0_l, sin, al_l, skip)

        def from_lanes(flat, c):                         # (Nf, c, L) lane-major
            return jnp.transpose(
                flat.reshape(nf_steps, c, A, M), (2, 3, 0, 1)
            )

        x_next_all = from_lanes(xout, NS)                # (A, M, Nf, NS)
        u_new_all = from_lanes(uout, NJ)                 # (A, M, Nf, NJ)
        return x_next_all.astype(x_swept.dtype), u_new_all.astype(u.dtype)

    return fused
