"""Cost-derivative oracle tests — the testCostGrad.cu analog.

The reference checks its hand-derived EE cost gradient/Hessian against finite
differences (testCostGrad.cu:5-26); here the oracle is jax.grad/jax.hessian of
the stage cost, which the hand-structured `quad` must match (gradient exactly;
Hessian in the Gauss-Newton sense for the EE block)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallel_ddp_tpu.config import CostWeights
from parallel_ddp_tpu.costs.ee import (
    KUKA_POS_LIMITS,
    KUKA_TORQUE_LIMITS,
    KUKA_VEL_LIMITS,
    ee_cost,
)
from parallel_ddp_tpu.costs.joint import joint_cost
from parallel_ddp_tpu.models.kuka import kuka

N = 16
W = CostWeights(q_ee1=10.0, q_ee2=0.1, qf_ee1=500.0, qf_ee2=1.0,
                r_ee=0.001, q_xdee=0.5, qf_xdee=20.0, q_xee=0.2, qf_xee=2.0)
GOAL = {
    "ee_goal": jnp.asarray([0.3, -0.4, 0.5, 0.0, 0.0, 0.0], jnp.float32),
    "x_target": jnp.asarray(np.linspace(-0.3, 0.3, 14), jnp.float32),
}


def _rand(seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 0.7, 14).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 30.0, 7).astype(np.float32))
    return x, u


def _check_grad(cost, x, u, k, rtol=2e-3, atol=2e-3):
    h, g = cost.quad(x, u, k, GOAL, W)
    gx_ad = jax.grad(lambda xx: cost.stage(xx, u, k, GOAL, W))(x)
    gu_ad = jax.grad(lambda uu: cost.stage(x, uu, k, GOAL, W))(u)
    g_ad = np.concatenate([np.asarray(gx_ad), np.asarray(gu_ad)])
    scale = max(1.0, float(np.abs(g_ad).max()))
    np.testing.assert_allclose(np.asarray(g), g_ad, rtol=rtol, atol=atol * scale)
    # Hessian must at least be symmetric PSD-structured
    np.testing.assert_allclose(np.asarray(h), np.asarray(h).T, atol=1e-3)
    return h


@pytest.mark.parametrize("k", [0, 7, N - 1])
@pytest.mark.parametrize("opts", [
    dict(),
    dict(use_smooth_abs=True),
    dict(use_ee_vel=True),
    dict(use_limits=True),
])
def test_ee_cost_gradient_matches_ad(k, opts):
    plant = kuka()
    w_vel = W._replace(q_eev1=0.5, q_eev2=0.01, qf_eev1=5.0, qf_eev2=0.1) \
        if opts.get("use_ee_vel") else W
    cost = ee_cost(plant.ee_pos, 7, 7, N,
                   pos_limits=KUKA_POS_LIMITS, vel_limits=KUKA_VEL_LIMITS,
                   torque_limits=KUKA_TORQUE_LIMITS, **opts)
    x, u = _rand(k + 1)
    h, g = cost.quad(x, u, k, GOAL, w_vel)
    gx_ad = jax.grad(lambda xx: cost.stage(xx, u, k, GOAL, w_vel))(x)
    gu_ad = jax.grad(lambda uu: cost.stage(x, uu, k, GOAL, w_vel))(u)
    g_ad = np.concatenate([np.asarray(gx_ad), np.asarray(gu_ad)])
    scale = max(1.0, float(np.abs(g_ad).max()))
    np.testing.assert_allclose(np.asarray(g), g_ad, rtol=2e-3, atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h).T, atol=1e-2)


@pytest.mark.parametrize("k", [0, N - 1])
def test_joint_cost_quad_is_exact(k):
    """Joint-space quadratic cost: quad() must equal the true AD grad/Hessian."""
    cost = joint_cost("kuka_joint", N, 7, 7)
    x, u = _rand(k + 10)
    goal = jnp.asarray(np.linspace(-0.5, 0.5, 14), jnp.float32)
    h, g = cost.quad(x, u, k, goal, W)
    z = jnp.concatenate([x, u])

    def stage_z(zz):
        return cost.stage(zz[:14], zz[14:], k, goal, W)

    g_ad = jax.grad(stage_z)(z)
    h_ad = jax.hessian(stage_z)(z)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ad), rtol=1e-5, atol=1e-4)
