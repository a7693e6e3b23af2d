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


@pytest.mark.slow
def test_sp_matches_single_device_kuka_production_shape():
    """Flagship production shape (the reference's default, config.cuh:43-58):
    Kuka EE N=64 / M=4 / A=16 sharded over sp=4 must match the single-device
    solve — the shape the bench runs, not a toy."""
    import dataclasses as dc

    from parallel_ddp_tpu.presets import ee_goal, kuka_ee

    prob = kuka_ee(num_time_steps=64, m_blocks=4, num_alpha=16)
    cfg = dc.replace(prob.cfg, max_iter=4)
    goal = ee_goal([0.3, -0.3, 0.9])
    x0 = jnp.zeros((64, 14), jnp.float32)
    u0 = jnp.zeros((64, 7), jnp.float32)

    ref = make_ilqr_solver(prob.plant, prob.cost, cfg)(
        x0, u0, goal, initial_rollout=True
    )
    mesh = make_mesh(4, axis_names=("sp",))
    out = make_sp_solver(prob.plant, prob.cost, cfg, mesh)(
        x0, u0, goal, initial_rollout=True
    )
    np.testing.assert_allclose(out.J, ref.J, rtol=1e-4)
    assert int(out.iters) == int(ref.iters)
    np.testing.assert_array_equal(
        np.asarray(out.alpha_trace), np.asarray(ref.alpha_trace)
    )
    np.testing.assert_allclose(out.x, ref.x, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out.u, ref.u, rtol=1e-3, atol=1e-2)


def test_sp_routes_batched_step_jac():
    """Plant.batched_step_jac must be consulted by the sp path (the Pallas RBD
    production hook): inject a batched jac that records being traced and
    assert identical results to the per-sample-AD sp solve."""
    import dataclasses as dc

    from parallel_ddp_tpu.ops.integrators import make_step_jacobian

    prob = pendulum_swingup(num_time_steps=32, m_blocks=4, num_alpha=4)
    cfg = dataclasses.replace(prob.cfg, max_iter=8)
    goal = _goal(prob, [np.pi, 0.0])
    x0 = jnp.zeros((32, 2), jnp.float32)
    u0 = jnp.zeros((32, 1), jnp.float32)
    mesh = make_mesh(4, axis_names=("sp",))

    ref = make_sp_solver(prob.plant, prob.cost, cfg, mesh)(
        x0, u0, goal, initial_rollout=True
    )

    used = []

    def batched_factory(integrator, dt):
        per = make_step_jacobian(prob.plant, integrator, dt)

        def ab(xs, us):
            used.append(xs.shape)
            return jax.vmap(per)(xs, us)

        return ab

    plant_b = dc.replace(
        prob.plant, name=prob.plant.name + "_batchedjac",
        batched_step_jac=batched_factory,
    )
    out = make_sp_solver(plant_b, prob.cost, cfg, mesh)(
        x0, u0, goal, initial_rollout=True
    )
    assert used and used[0][0] == 32 // 4  # chunk-local batch of Nl rows
    np.testing.assert_allclose(out.J, ref.J, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out.alpha_trace), np.asarray(ref.alpha_trace)
    )
    np.testing.assert_allclose(out.x, ref.x, rtol=1e-5, atol=1e-5)


def test_sp_routes_fused_rollout():
    """Plant.fused_rollout must be consulted by the sp path and handed the
    chunk-local TRACED skip mask (only the LAST device's final step is the
    horizon end): inject a hook that mirrors the solver's exact XLA math,
    record what it receives, and assert exact equality with the plain sp
    solve.  (Kernel-level chunk-mask correctness of the real Pallas hook is
    tests/test_pallas_rollout.py::test_fused_rollout_chunk_skip_mask.)"""
    import dataclasses as dc

    from parallel_ddp_tpu.ops.integrators import make_step
    from parallel_ddp_tpu.presets import ee_goal, kuka_ee

    prob = kuka_ee(num_time_steps=16, m_blocks=4, num_alpha=4)
    cfg = dc.replace(prob.cfg, max_iter=3)
    goal = ee_goal([0.3, -0.3, 0.9])
    x0 = jnp.zeros((16, 14), jnp.float32)
    u0 = jnp.zeros((16, 7), jnp.float32)
    mesh = make_mesh(2, axis_names=("sp",))

    ref = make_sp_solver(prob.plant, prob.cost, cfg, mesh)(
        x0, u0, goal, initial_rollout=True
    )

    calls = []

    def fused_factory(integrator, dt, Nl, Mf_l, A):
        step_fn = make_step(prob.plant, integrator, dt)
        Nf = Nl // Mf_l

        def fused(x_swept, u, K, du, xp, alphas, skip_mask=None):
            calls.append(
                (x_swept.shape, None if skip_mask is None else skip_mask.shape)
            )
            n, m = x_swept.shape[-1], u.shape[-1]
            u_blk = u.reshape(Mf_l, Nf, m)
            K_blk = K.reshape(Mf_l, Nf, m, n)
            du_blk = du.reshape(Mf_l, Nf, m)
            xp_blk = xp.reshape(Mf_l, Nf, n)
            s_blk = skip_mask.reshape(Mf_l, Nf)

            def sim_block(alpha, x0b, u_b, K_b, du_b, xp_b, s_b):
                def body(xc, inp):
                    u_k, K_k, du_k, xp_k, s = inp
                    u_new = u_k - alpha * du_k - K_k @ (xc - xp_k)
                    u_new = jnp.where(s, u_k, u_new)
                    xn = step_fn(xc, u_new)
                    xn = jnp.where(s, xc, xn)
                    return xn, (xn, u_new)

                _, (xs, us) = jax.lax.scan(
                    body, x0b, (u_b, K_b, du_b, xp_b, s_b)
                )
                return xs, us

            def sim_all(alpha, xs_a):
                x0s = xs_a.reshape(Mf_l, Nf, n)[:, 0]
                return jax.vmap(sim_block, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                    alpha, x0s, u_blk, K_blk, du_blk, xp_blk, s_blk
                )

            return jax.vmap(sim_all)(alphas, x_swept)

        return fused

    plant_f = dc.replace(
        prob.plant, name=prob.plant.name + "_fusedhook",
        fused_rollout=fused_factory,
    )
    out = make_sp_solver(plant_f, prob.cost, cfg, mesh)(
        x0, u0, goal, initial_rollout=True
    )
    # the hook was consulted, with per-device (A, Nl, n) states and an
    # (Mf_l, Nf) skip mask
    assert calls and calls[0][0] == (4, 8, 14) and calls[0][1] == (2, 4)
    np.testing.assert_allclose(out.J, ref.J, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out.alpha_trace), np.asarray(ref.alpha_trace)
    )
    np.testing.assert_allclose(out.x, ref.x, rtol=1e-5, atol=1e-5)
