"""SoA (scalar-channel) Kuka core vs the spatial-algebra implementation.

rbd.KukaRBD is itself oracle-tested against an independent float64 Lagrangian
implementation (test_kuka.py); here the production SoA core (soa.py) is checked
against it on dynamics, mass matrix, bias, kinematics and batch semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallel_ddp_tpu.models.kuka.rbd import KukaRBD
from parallel_ddp_tpu.models.kuka.soa import KukaSoA


@pytest.fixture(scope="module", params=[(1, 9.81), (1, 0.0), (2, 9.81)])
def pair(request):
    ee_type, g = request.param
    return KukaRBD(ee_type=ee_type, gravity=g), KukaSoA(ee_type=ee_type, gravity=g)


def _states(n, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1.0, (n, 14)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 50.0, (n, 7)).astype(np.float32))
    return x, u


def test_forward_dynamics_matches(pair):
    rbd, soa = pair
    x, u = _states(8, 0)
    ref = jax.vmap(rbd.forward_dynamics)(x, u)
    got = soa.forward_dynamics(x, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-2)


def test_bias_and_mass_match(pair):
    rbd, soa = pair
    x, _ = _states(4, 1)
    c1, m1 = jax.vmap(rbd.bias_and_mass)(x[:, :7], x[:, 7:])
    c2, m2 = soa.bias_and_mass(x[:, :7], x[:, 7:])
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-4, atol=1e-4)


def test_kinematics_match(pair):
    rbd, soa = pair
    x, _ = _states(4, 2)
    ee1 = jax.vmap(rbd.ee_pose)(x[:, :7])
    ee2 = soa.ee_pose(x[:, :7])
    np.testing.assert_allclose(np.asarray(ee2), np.asarray(ee1), rtol=1e-5, atol=1e-5)
    ev1 = jax.vmap(rbd.ee_velocity)(x)
    ev2 = soa.ee_velocity(x)
    np.testing.assert_allclose(np.asarray(ev2), np.asarray(ev1), rtol=1e-4, atol=1e-4)


def test_batch_semantics():
    """Single sample, (B,) batch and (B1,B2) batch all agree (no vmap needed)."""
    soa = KukaSoA()
    x, u = _states(6, 3)
    batched = soa.forward_dynamics(x, u)
    single = jnp.stack([soa.forward_dynamics(x[i], u[i]) for i in range(6)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-5, atol=1e-4)
    two_d = soa.forward_dynamics(x.reshape(2, 3, 14), u.reshape(2, 3, 7))
    np.testing.assert_allclose(np.asarray(two_d.reshape(6, 7)),
                               np.asarray(batched), rtol=1e-6, atol=1e-6)


def test_jacfwd_through_soa():
    """d qdd / d (x, u) via jacfwd of the SoA core matches the spatial core's."""
    rbd, soa = KukaRBD(), KukaSoA()
    x, u = _states(2, 4)

    def jac(f, xi, ui):
        dx, du = jax.jacfwd(f, argnums=(0, 1))(xi, ui)
        return jnp.concatenate([dx, du], axis=1)

    for i in range(2):
        j1 = jac(rbd.forward_dynamics, x[i], u[i])
        j2 = jac(soa.forward_dynamics, x[i], u[i])
        np.testing.assert_allclose(np.asarray(j2), np.asarray(j1),
                                   rtol=5e-3, atol=0.5)
