"""Kuka iiwa-14 rigid-body dynamics oracle tests.

The reference validates its hand-derived RBD against finite differences
(test/testDynGrad.cu) — here the oracle is stronger: an independent
Lagrangian-mechanics implementation (mass matrix from the kinetic-energy
Hessian, bias from AD of the energies), derived purely from the kinematics +
spatial inertias with no shared code with the CRBA/RNEA under test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallel_ddp_tpu.models.kuka.rbd import KukaRBD, N_JOINTS

RBD = KukaRBD(ee_type=1, gravity=9.81)
# Oracle constants in float64: the energy-difference oracle suffers fp32
# cancellation (~5e-3 abs on O(1) mass entries); the CRBA/RNEA under test stays
# fp32 and is compared against the f64 truth.
with jax.enable_x64():
    RBD64 = KukaRBD(ee_type=1, gravity=9.81, dtype=jnp.float64)


def _f64(*arrays):
    with jax.enable_x64():
        return tuple(jnp.asarray(np.asarray(a), jnp.float64) for a in arrays)


def _link_spatial_velocities(q, qd):
    """Local-frame spatial velocities [w; v] per link via AD of the frames."""
    def frames_flat(qq):
        rs, ps = RBD64.link_frames(qq)
        return rs, ps

    (rs, ps), (drs, dps) = jax.jvp(frames_flat, (q,), (qd,))
    out = []
    for i in range(N_JOINTS):
        w_world_skew = drs[i] @ rs[i].T
        w_world = jnp.stack(
            [w_world_skew[2, 1], w_world_skew[0, 2], w_world_skew[1, 0]]
        )
        w_l = rs[i].T @ w_world
        v_l = rs[i].T @ dps[i]
        out.append(jnp.concatenate([w_l, v_l]))
    return jnp.stack(out)


def _kinetic(q, qd):
    sv = _link_spatial_velocities(q, qd)
    return 0.5 * jnp.sum(jnp.einsum("ki,kij,kj->k", sv, RBD64.i_spatial, sv))


def _potential(q):
    """g * sum_i (m_lin * p_z + (R @ (m c))_z), built from the same spatial
    inertias (including the reference's link-7 mass quirk)."""
    rs, ps = RBD64.link_frames(q)
    m_lin = RBD64.i_spatial[:, 5, 5]
    # m*c vector from the coupling block: I[:3, 3:] = m * skew(c)
    mc = jnp.stack(
        [
            jnp.stack(
                [
                    RBD64.i_spatial[i, 2, 4],
                    RBD64.i_spatial[i, 0, 5],
                    RBD64.i_spatial[i, 1, 3],
                ]
            )
            for i in range(N_JOINTS)
        ]
    )
    z_com_mass = m_lin * ps[:, 2] + jnp.einsum("kij,kj->ki", rs, mc)[:, 2]
    return RBD64.gravity * jnp.sum(z_com_mass)


def lagrangian_dynamics(x, u):
    q, qd = x[:N_JOINTS], x[N_JOINTS:]
    m_mat = jax.hessian(_kinetic, argnums=1)(q, qd)
    # bias = d/dt (dT/dqd) |_{qdd=0} - dT/dq + dV/dq
    dT_dqd = jax.grad(_kinetic, argnums=1)
    dtdt = jax.jvp(lambda qq: dT_dqd(qq, qd), (q,), (qd,))[1]
    bias = dtdt - jax.grad(_kinetic, argnums=0)(q, qd) + jax.grad(_potential)(q)
    return jnp.linalg.solve(m_mat, u - bias)


def rand_states(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(0, 1.0, (n, 7)).astype(np.float32)
    qd = rng.normal(0, 2.0, (n, 7)).astype(np.float32)
    u = rng.normal(0, 50.0, (n, 7)).astype(np.float32)
    return q, qd, u


def test_mass_matrix_symmetric_pd():
    q, qd, _ = rand_states(4, seed=1)
    for i in range(4):
        _, m = RBD.bias_and_mass(jnp.asarray(q[i]), jnp.asarray(qd[i]))
        m = np.asarray(m)
        np.testing.assert_allclose(m, m.T, atol=1e-5)
        assert np.all(np.linalg.eigvalsh(m) > 0)


def _mass_from_energy(q64):
    """T is exactly quadratic in qd: M_ij = T(e_i + e_j) - T(e_i) - T(e_j).

    Runs in float64 (matches the CRBA f64 result to 1e-14) so the fp32
    implementation under test is compared against near-exact truth."""
    e = np.eye(N_JOINTS)
    t = lambda v: float(_kinetic(q64, jnp.asarray(v, q64.dtype)))
    ti = [t(e[i]) for i in range(N_JOINTS)]
    m = np.zeros((N_JOINTS, N_JOINTS))
    for i in range(N_JOINTS):
        m[i, i] = 2 * ti[i]
        for j in range(i + 1, N_JOINTS):
            m[i, j] = m[j, i] = t(e[i] + e[j]) - ti[i] - ti[j]
    return m


def test_mass_matrix_vs_lagrangian():
    q, qd, _ = rand_states(2, seed=2)
    for i in range(2):
        _, m = RBD.bias_and_mass(jnp.asarray(q[i]), jnp.asarray(qd[i]))
        with jax.enable_x64():
            (q64,) = _f64(q[i])
            m_l = _mass_from_energy(q64)
        np.testing.assert_allclose(np.asarray(m), m_l, rtol=1e-3, atol=5e-4)


def test_bias_vs_lagrangian():
    """RNEA bias vs d/dt(dT/dqd) - dT/dq + dV/dq with first-order AD only."""
    q, qd, _ = rand_states(2, seed=3)
    for i in range(2):
        c_rnea, _ = RBD.bias_and_mass(jnp.asarray(q[i]), jnp.asarray(qd[i]))
        with jax.enable_x64():
            qq, qqd = _f64(q[i], qd[i])
            dT_dqd = jax.grad(_kinetic, argnums=1)
            dtdt = jax.jvp(lambda z: dT_dqd(z, qqd), (qq,), (qqd,))[1]
            c_l = (
                dtdt
                - jax.grad(_kinetic, argnums=0)(qq, qqd)
                + jax.grad(_potential)(qq)
            )
        np.testing.assert_allclose(
            np.asarray(c_rnea), np.asarray(c_l), rtol=1e-3, atol=1e-3
        )


def test_inverse_forward_roundtrip():
    q, qd, _ = rand_states(3, seed=4)
    rng = np.random.default_rng(5)
    for i in range(3):
        qdd = jnp.asarray(rng.normal(0, 3.0, 7).astype(np.float32))
        tau = RBD.inverse_dynamics(jnp.asarray(q[i]), jnp.asarray(qd[i]), qdd)
        x = jnp.concatenate([jnp.asarray(q[i]), jnp.asarray(qd[i])])
        qdd_back = RBD.forward_dynamics(x, tau)
        np.testing.assert_allclose(np.asarray(qdd_back), np.asarray(qdd), rtol=1e-3, atol=1e-3)


def test_static_gravity_torque():
    """At rest, tau = dV/dq exactly (gravity compensation)."""
    q, _, _ = rand_states(2, seed=6)
    for i in range(2):
        tau = RBD.inverse_dynamics(jnp.asarray(q[i]), jnp.zeros(7), jnp.zeros(7))
        with jax.enable_x64():
            (qq,) = _f64(q[i])
            g_ad = jax.grad(_potential)(qq)
        np.testing.assert_allclose(np.asarray(tau), np.asarray(g_ad), rtol=1e-3, atol=1e-3)


def test_ee_pose_home():
    """Straight-up arm at q = 0: EE on the base z-axis at the summed link
    offsets + flange (iiwa14.urdf origins + EE_ON_LINK_Z = 0.0635)."""
    ee = np.asarray(RBD.ee_pose(jnp.zeros(7)))
    total_z = 0.1575 + 0.2025 + 0.2045 + 0.2155 + 0.1845 + 0.2155 + 0.081 + 0.0635
    np.testing.assert_allclose(ee[:3], [0.0, 0.0, total_z], atol=1e-5)


def test_ee_velocity_matches_fd():
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(0, 1.0, 7).astype(np.float32))
    qd = jnp.asarray(rng.normal(0, 1.0, 7).astype(np.float32))
    x = jnp.concatenate([q, qd])
    eev = np.asarray(RBD.ee_velocity(x))
    eps = 1e-3
    fd = (np.asarray(RBD.ee_pose(q + eps * qd)) - np.asarray(RBD.ee_pose(q - eps * qd))) / (
        2 * eps
    )
    np.testing.assert_allclose(eev, fd, rtol=2e-2, atol=2e-3)


def test_dynamics_jacobian_finite_diff():
    """testDynGrad.cu analog: fp32 jacfwd of qdd vs f64 central differences.

    The FD oracle must run in f64: on O(100) accelerations, fp32 central
    differences carry ~1% noise — larger than the errors being hunted."""
    from parallel_ddp_tpu.models.kuka import kuka

    plant = kuka()
    jac = jax.jit(plant.qdd_jacobian())
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(0, 1.0, 14).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 50.0, 7).astype(np.float32))
    a = np.asarray(jac(x, u))
    eps = 1e-6
    cols = []
    with jax.enable_x64():
        x64, u64 = _f64(x, u)
        dyn = lambda xx, uu: np.asarray(RBD64.forward_dynamics(xx, uu))
        for i in range(14):
            dx = np.zeros(14)
            dx[i] = eps
            cols.append((dyn(x64 + dx, u64) - dyn(x64 - dx, u64)) / (2 * eps))
        for j in range(7):
            duv = np.zeros(7)
            duv[j] = eps
            cols.append((dyn(x64, u64 + duv) - dyn(x64, u64 - duv)) / (2 * eps))
    fd = np.stack(cols, 1)
    np.testing.assert_allclose(a, fd, rtol=1e-3, atol=1e-2)
