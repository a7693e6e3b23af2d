"""Pallas TPU kernels for the batched Kuka rigid-body dynamics hot path.

The scalar-channel RBD core (models/kuka/soa.py) is a pure elementwise
dataflow, so the SAME code runs verbatim inside a Pallas kernel: this module
stages a whole batch tile of the RNEA + CRBA + Cholesky chain through VMEM in
ONE kernel — zero HBM round-trips for the ~2k intermediates (the XLA-fused
version crosses ~400 fusion boundaries).  This is the TPU twin of the
reference's single fused CUDA RBD kernel staged through shared memory
(dynamics_arm.cuh:2095-2163, shared-memory budget at :2098-2118).

Layout: each per-joint scalar channel is exactly one native (8, 128) f32 VMEM
tile, i.e. 1024 batch samples per kernel invocation with zero padding waste
(a (TILE, 1) column layout pads the lane dim 128x and OOMs scoped VMEM).
Callers pass any batch size; the wrapper pads/reshapes to (nb, ch, 8, 128)
tiles and vmaps (Pallas lifts the vmap into a grid dimension).

Used for large scenario-batched evaluation (the scale-out path); the jitted
XLA path remains the default inside the solver (identical math, and the solver
fuses the dynamics into its rollout scans).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_ddp_tpu.models.kuka import soa

N_JOINTS = 7
_SUB, _LANE = 8, 128
_TILE_B = _SUB * _LANE  # 1024 samples per kernel call


def _qdd_kernel(cc, x_ref, u_ref, out_ref):
    q = [x_ref[i] for i in range(N_JOINTS)]
    qd = [x_ref[N_JOINTS + i] for i in range(N_JOINTS)]
    tau = [u_ref[i] for i in range(N_JOINTS)]
    qdd = soa.qdd_channels(cc, q, qd, tau)
    for i in range(N_JOINTS):
        out_ref[i] = qdd[i]


def _jac_kernel(cc, x_ref, u_ref, out_ref, qdd_ref):
    """d qdd / d [x; u] per sample, channels (7*21, 8, 128), PLUS the primal
    qdd (7, 8, 128) — the linearization point's forward value comes for free
    from jax.linearize, so integrator stages that need both (Midpoint/RK3)
    launch ONE kernel instead of two.

    jax.linearize shares the primal RNEA/CRBA work across all 21 tangents; the
    tangent applications are elementwise too, so the whole Jacobian stays in
    VMEM."""
    xs = [x_ref[i] for i in range(2 * N_JOINTS)]
    us = [u_ref[i] for i in range(N_JOINTS)]

    def f(*chans):
        q, qd, tau = chans[:7], chans[7:14], chans[14:21]
        return soa.qdd_channels(cc, list(q), list(qd), list(tau))

    qdd, f_lin = jax.linearize(f, *(xs + us))
    for i in range(N_JOINTS):
        qdd_ref[i] = qdd[i]
    zero = xs[0] * 0.0
    one = zero + 1.0
    for j in range(3 * N_JOINTS):
        tangents = [one if i == j else zero for i in range(3 * N_JOINTS)]
        col = f_lin(*tangents)
        for i in range(N_JOINTS):
            out_ref[i * 3 * N_JOINTS + j] = col[i]


@functools.lru_cache(maxsize=8)
def _build(ee_type: int, gravity: float, interpret: bool):
    cc = soa._consts(ee_type, gravity)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    # vmem_limit_bytes: headroom for the scenario-vmapped batch grid dim
    # (see ops/pallas_rollout.py); generation-aware — ops/tpu_limits.py
    from parallel_ddp_tpu.ops.tpu_limits import pallas_vmem_limit_bytes

    params = pltpu.CompilerParams(vmem_limit_bytes=pallas_vmem_limit_bytes())
    qdd_call = pl.pallas_call(
        functools.partial(_qdd_kernel, cc),
        out_shape=jax.ShapeDtypeStruct((N_JOINTS, _SUB, _LANE), jnp.float32),
        in_specs=[vspec, vspec],
        out_specs=vspec,
        interpret=interpret,
        compiler_params=params,
    )
    jac_call = pl.pallas_call(
        functools.partial(_jac_kernel, cc),
        out_shape=(
            jax.ShapeDtypeStruct(
                (N_JOINTS * 3 * N_JOINTS, _SUB, _LANE), jnp.float32
            ),
            jax.ShapeDtypeStruct((N_JOINTS, _SUB, _LANE), jnp.float32),
        ),
        in_specs=[vspec, vspec],
        out_specs=(vspec, vspec),
        interpret=interpret,
        compiler_params=params,
    )
    return qdd_call, jac_call


def _to_tiles(a):
    """(B, C) -> (nb, C, 8, 128) channel tiles (pads B up to a 1024 multiple)."""
    b, c = a.shape
    nb = -(-b // _TILE_B)
    pad = nb * _TILE_B - b
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, c), a.dtype)])
    # (nb*1024, C) -> (nb, 8, 128, C) -> (nb, C, 8, 128)
    return a.reshape(nb, _SUB, _LANE, c).transpose(0, 3, 1, 2)


def _from_tiles(t, b, tail):
    """(nb, C, 8, 128) -> (b,) + tail with C = prod(tail)."""
    nb, c = t.shape[0], t.shape[1]
    out = t.transpose(0, 2, 3, 1).reshape(nb * _TILE_B, c)[:b]
    return out.reshape((b,) + tail)


def _run(call, x, u, tail):
    xt = _to_tiles(jnp.asarray(x, jnp.float32))
    ut = _to_tiles(jnp.asarray(u, jnp.float32))
    out = jax.vmap(call)(xt, ut) if xt.shape[0] > 1 else call(xt[0], ut[0])[None]
    return _from_tiles(out, x.shape[0], tail)


def _run_pair(call, x, u, tail1, tail2):
    """As _run for a two-output pallas_call (jac + primal qdd)."""
    b = x.shape[0]
    xt = _to_tiles(jnp.asarray(x, jnp.float32))
    ut = _to_tiles(jnp.asarray(u, jnp.float32))
    if xt.shape[0] > 1:
        o1, o2 = jax.vmap(call)(xt, ut)
    else:
        o1, o2 = call(xt[0], ut[0])
        o1, o2 = o1[None], o2[None]
    return _from_tiles(o1, b, tail1), _from_tiles(o2, b, tail2)


@functools.lru_cache(maxsize=8)
def _packed_entry_points(ee_type: int, gravity: float, interpret: bool):
    """custom_vmap-wrapped kernel entries: a jax.vmap scenario axis is
    FLATTENED into the sample batch (which _to_tiles already lane-packs into
    full 1024-lane tiles) instead of Pallas replicating the grid per scenario
    with each scenario's 63-sample batch padded 16x (the HBM/occupancy
    pathology fixed for the other kernels too — see ops/pallas_riccati.py
    make_riccati_block_call docstring)."""
    from jax.custom_batching import custom_vmap

    qdd_call, jac_call = _build(ee_type, gravity, interpret)

    @custom_vmap
    def qdd(x, u):
        return _run(qdd_call, x, u, (N_JOINTS,))

    @qdd.def_vmap
    def _qdd_vmap(axis_size, in_batched, x, u):
        B = axis_size
        x, u = (a if bat else jnp.broadcast_to(a, (B,) + jnp.shape(a))
                for a, bat in zip((x, u), in_batched))
        s = x.shape[1]
        out = _run(qdd_call, x.reshape(B * s, x.shape[-1]),
                   u.reshape(B * s, u.shape[-1]), (N_JOINTS,))
        return out.reshape(B, s, N_JOINTS), True

    @custom_vmap
    def jac_qdd(x, u):
        return _run_pair(jac_call, x, u, (N_JOINTS, 3 * N_JOINTS), (N_JOINTS,))

    @jac_qdd.def_vmap
    def _jac_vmap(axis_size, in_batched, x, u):
        B = axis_size
        x, u = (a if bat else jnp.broadcast_to(a, (B,) + jnp.shape(a))
                for a, bat in zip((x, u), in_batched))
        s = x.shape[1]
        J, q = _run_pair(jac_call, x.reshape(B * s, x.shape[-1]),
                         u.reshape(B * s, u.shape[-1]),
                         (N_JOINTS, 3 * N_JOINTS), (N_JOINTS,))
        return (J.reshape(B, s, N_JOINTS, 3 * N_JOINTS),
                q.reshape(B, s, N_JOINTS)), (True, True)

    return qdd, jac_qdd


def kuka_qdd_pallas(x, u, ee_type: int = 1, gravity: float = 9.81,
                    interpret: bool | None = None):
    """Batched forward dynamics qdd (B, 7), one fused Pallas kernel per 1024-batch tile.

    x: (B, 14); u: (B, 7).  interpret=None auto-selects interpreter mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qdd, _ = _packed_entry_points(ee_type, float(gravity), bool(interpret))
    return qdd(x, u)


def kuka_qdd_jac_pallas(x, u, ee_type: int = 1, gravity: float = 9.81,
                        interpret: bool | None = None):
    """Batched dynamics Jacobian d qdd / d [x; u]: (B, 7, 21), one kernel per tile
    (the reference's hand-derived dynamicsGradient, dynamics_arm.cuh:2165-2289)."""
    return kuka_jac_qdd_pallas(x, u, ee_type, gravity, interpret)[0]


def kuka_jac_qdd_pallas(x, u, ee_type: int = 1, gravity: float = 9.81,
                        interpret: bool | None = None):
    """Batched (jacobian (B, 7, 21), primal qdd (B, 7)) from ONE fused kernel —
    the primal is the linearization point jax.linearize evaluates anyway."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, jac_qdd = _packed_entry_points(ee_type, float(gravity), bool(interpret))
    return jac_qdd(x, u)


def make_ab_composer(fdyn, fjac, integrator: int, dt: float, ns: int, nj: int,
                     fboth=None):
    """Compose batched stage dynamics/Jacobians into the discrete AB = [A | B].

    Generic Butcher-stage chain rule (the maps the reference hand-writes in
    integrators.cuh:40-233), independent of what produces the stage values:
      fdyn(x:(B, ns), u:(B, nj)) -> xdot:(B, ns)
      fjac(x, u) -> d xdot / d [x; u]:(B, ns, ns + nj)
      fboth (optional): (x, u) -> (xdot, F) fused — stages needing both the
        value and the Jacobian at the same point use it (the Pallas path's
        jac kernel computes the primal anyway via jax.linearize).
    The stage compositions are (B, ns, ns) x (B, ns, ns+nj) batched matmuls —
    MXU work when B is the whole time axis.
    """
    if fboth is None:
        def fboth(x, u):
            return fdyn(x, u), fjac(x, u)
    # numpy, NOT jnp: these are built at closure-construction time, outside any
    # trace — jnp here would bake committed device arrays into every jitted
    # consumer (the sticky-sync-mode pitfall tests/test_no_device_constants.py
    # guards against); numpy constants become safe HLO literals.
    E = np.concatenate(
        [np.eye(ns, dtype=np.float32), np.zeros((ns, nj), np.float32)], axis=1
    )  # d x / d [x; u]
    U = np.concatenate(
        [np.zeros((nj, ns), np.float32), np.eye(nj, dtype=np.float32)], axis=1
    )  # d u / d [x; u]

    def chain(F, Dx):
        # d f(xs, u) / d [x; u] = F_x @ (d xs / d [x; u]) + F_u @ (d u / d [x; u])
        return jnp.einsum("bij,bjk->bik", F[:, :, :ns], Dx) + F[:, :, ns:] @ U

    def ab(x, u):
        if integrator == 1:  # Euler (integrators.cuh:40-53)
            return E + dt * fjac(x, u)
        if integrator == 2:  # Midpoint (integrators.cuh:84-120)
            k1, Dk1 = fboth(x, u)
            xm = x + (0.5 * dt) * k1
            Dk2 = chain(fjac(xm, u), E + (0.5 * dt) * Dk1)
            return E + dt * Dk2
        if integrator == 3:  # RK3 (integrators.cuh:159-233, exact stage points)
            k1, Dk1 = fboth(x, u)
            x2 = x + (0.5 * dt) * k1
            k2, F2 = fboth(x2, u)
            Dk2 = chain(F2, E + (0.5 * dt) * Dk1)
            x3 = x + dt * (2.0 * k2 - k1)
            Dk3 = chain(fjac(x3, u), E + dt * (2.0 * Dk2 - Dk1))
            return E + (dt / 6.0) * (Dk1 + 4.0 * Dk2 + Dk3)
        raise ValueError(f"unknown integrator {integrator}")

    return ab


def make_kuka_ab_pallas(ee_type: int, gravity: float, integrator: int, dt: float,
                        interpret: bool | None = None):
    """Batched discrete-dynamics Jacobian AB = [A | B] via the fused Pallas kernels.

    Returns ab(x:(B, 14), u:(B, 7)) -> (B, 14, 21): one Pallas dynamics + one
    Pallas Jacobian kernel call per Butcher stage over the WHOLE batch, chained
    by `make_ab_composer` — the production wiring of the kernels for the
    solver's derivative stage (integratorGradientKern, nisInitHelpers.cuh:
    245-279), where the time axis supplies the batch.
    """
    ns, nj = 2 * N_JOINTS, N_JOINTS

    def _lift_jac(J, b):
        # F = d xdot / d [x; u]: rows [qd; qdd] -> [[0 I 0]; [J_qdd]], (B, 14, 21)
        top = jnp.zeros((b, nj, ns + nj), J.dtype)
        top = top.at[:, :, nj:ns].set(jnp.eye(nj, dtype=J.dtype))
        return jnp.concatenate([top, J], axis=1)

    def fdyn(x, u):
        # continuous xdot = [qd; qdd], batched
        qdd = kuka_qdd_pallas(x, u, ee_type, gravity, interpret)
        return jnp.concatenate([x[:, nj:], qdd], axis=1)

    def fjac(x, u):
        J = kuka_qdd_jac_pallas(x, u, ee_type, gravity, interpret)
        return _lift_jac(J, x.shape[0])

    def fboth(x, u):
        # one fused kernel: Jacobian + the primal qdd it linearized around
        J, qdd = kuka_jac_qdd_pallas(x, u, ee_type, gravity, interpret)
        xdot = jnp.concatenate([x[:, nj:], qdd], axis=1)
        return xdot, _lift_jac(J, x.shape[0])

    return make_ab_composer(fdyn, fjac, integrator, dt, ns, nj, fboth=fboth)
