"""Cross-chip horizon ('sp') sharding equivalence (parallel/sp.py).

The sp-sharded solve is the SAME math as the single-program solver — the
boundary couplings just travel over mesh collectives (ppermute / all_gather /
psum) instead of staying in one address space — so on the 8-device CPU mesh it
must reproduce the single-device solve to fp32 roundoff.  This is the
cross-chip analog of the reference's FORCE_PARALLEL CPU-vs-GPU bit-comparability
check (config.cuh:95, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_ddp_tpu.parallel.sharding import make_mesh
from parallel_ddp_tpu.parallel.sp import make_sp_solver
from parallel_ddp_tpu.presets import cartpole_swingup, pendulum_swingup
from parallel_ddp_tpu.solver import make_ilqr_solver


def _goal(prob, x_target):
    return jnp.asarray(x_target, jnp.float32)


@pytest.mark.parametrize("sp_size", [2, 4, 8])
def test_sp_matches_single_device_pendulum(sp_size):
    prob = pendulum_swingup(num_time_steps=64, m_blocks=8, num_alpha=8)
    cfg = dataclasses.replace(prob.cfg, max_iter=12)
    goal = _goal(prob, [np.pi, 0.0])
    x0 = jnp.zeros((cfg.num_time_steps, 2), jnp.float32)
    u0 = jnp.zeros((cfg.num_time_steps, 1), jnp.float32)

    ref = make_ilqr_solver(prob.plant, prob.cost, cfg)(
        x0, u0, goal, initial_rollout=True
    )
    mesh = make_mesh(sp_size, axis_names=("sp",))
    out = make_sp_solver(prob.plant, prob.cost, cfg, mesh)(
        x0, u0, goal, initial_rollout=True
    )

    np.testing.assert_allclose(out.J, ref.J, rtol=1e-5)
    assert int(out.iters) == int(ref.iters)
    np.testing.assert_allclose(out.x, ref.x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out.u, ref.u, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.J_trace), np.asarray(ref.J_trace), rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out.alpha_trace), np.asarray(ref.alpha_trace)
    )


def test_sp_matches_single_device_cartpole():
    """Second plant family + different block/alpha shape through the sp path."""
    prob = cartpole_swingup(num_time_steps=32, m_blocks=4, num_alpha=8)
    cfg = dataclasses.replace(prob.cfg, max_iter=8)
    goal = _goal(prob, [0.0, np.pi, 0.0, 0.0])
    x0 = jnp.zeros((cfg.num_time_steps, 4), jnp.float32)
    u0 = jnp.zeros((cfg.num_time_steps, 1), jnp.float32)

    ref = make_ilqr_solver(prob.plant, prob.cost, cfg)(
        x0, u0, goal, initial_rollout=True
    )
    mesh = make_mesh(4, axis_names=("sp",))
    out = make_sp_solver(prob.plant, prob.cost, cfg, mesh)(
        x0, u0, goal, initial_rollout=True
    )
    np.testing.assert_allclose(out.J, ref.J, rtol=1e-5)
    np.testing.assert_allclose(out.x, ref.x, rtol=1e-4, atol=1e-4)


def test_sp_rejects_nondivisible_blocks():
    prob = pendulum_swingup(num_time_steps=64, m_blocks=4, num_alpha=4)
    mesh = make_mesh(8, axis_names=("sp",))
    with pytest.raises(ValueError):
        make_sp_solver(prob.plant, prob.cost, prob.cfg, mesh)


def test_sp_matches_single_device_kuka():
    """Flagship model through the collective path: a small-N Kuka EE solve
    sharded over 'sp' must match the single-device solve (vector core on CPU,
    see models/kuka/model.py)."""
    import dataclasses as dc

    from parallel_ddp_tpu.presets import ee_goal, kuka_ee

    prob = kuka_ee(num_time_steps=16, m_blocks=2, num_alpha=4)
    cfg = dc.replace(prob.cfg, max_iter=6)
    goal = ee_goal([0.3, -0.3, 0.9])
    x0 = jnp.zeros((16, 14), jnp.float32)
    u0 = jnp.zeros((16, 7), jnp.float32)

    ref = make_ilqr_solver(prob.plant, prob.cost, cfg)(
        x0, u0, goal, initial_rollout=True
    )
    mesh = make_mesh(2, axis_names=("sp",))
    out = make_sp_solver(prob.plant, prob.cost, cfg, mesh)(
        x0, u0, goal, initial_rollout=True
    )
    np.testing.assert_allclose(out.J, ref.J, rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(out.alpha_trace), np.asarray(ref.alpha_trace)
    )
    np.testing.assert_allclose(out.x, ref.x, rtol=1e-3, atol=1e-3)


def test_batched_sp_2d_mesh_matches_single_device():
    """dp x sp 2-D mesh: scenarios sharded over 'dp', each solve's horizon
    sharded over 'sp' — every scenario must match its single-device solve."""
    import numpy as _np
    from jax.sharding import Mesh
    from parallel_ddp_tpu.parallel.sp import make_batched_sp_solver

    prob = pendulum_swingup(num_time_steps=32, m_blocks=4, num_alpha=4)
    cfg = dataclasses.replace(prob.cfg, max_iter=8)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "sp"))

    B = 4
    rng = _np.random.default_rng(3)
    x0s = jnp.zeros((B, 32, 2), jnp.float32)
    u0s = jnp.asarray(rng.normal(0, 0.1, (B, 32, 1)).astype(_np.float32))
    goals = jnp.asarray(
        _np.stack([[_np.pi * (0.5 + 0.1 * i), 0.0] for i in range(B)]),
        jnp.float32,
    )

    out = make_batched_sp_solver(prob.plant, prob.cost, cfg, mesh)(
        x0s, u0s, goals, initial_rollout=True
    )
    assert out.x.shape == (B, 32, 2)

    ref_solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    for i in range(B):
        ref = ref_solver(x0s[i], u0s[i], goals[i], initial_rollout=True)
        np.testing.assert_allclose(out.J[i], ref.J, rtol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(out.alpha_trace[i]), np.asarray(ref.alpha_trace)
        )
        np.testing.assert_allclose(out.x[i], ref.x, rtol=1e-3, atol=1e-3)
