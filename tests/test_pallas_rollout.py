"""Fused Pallas multiple-shooting rollout vs the XLA scan path.

The kernel (ops/pallas_rollout.py) must produce the SAME candidate
trajectories and controls as forward.multiple_shooting_rollout built on the
scalar-channel core — same channel math, same integrator formulas, same
skip-the-last-step masking (forwardSimKern semantics, fpHelpers.cuh:223-301).
Run in interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_ddp_tpu.config import SolverConfig
from parallel_ddp_tpu.models.kuka.soa import KukaSoA
from parallel_ddp_tpu.ops.integrators import make_step
from parallel_ddp_tpu.ops.pallas_rollout import MAX_NB, make_kuka_fused_rollout
from parallel_ddp_tpu.parallel.forward import make_sim_block


def _xla_rollout(step_fn, N, M, x_swept, u, K, du, xp, alphas):
    Nf = N // M
    n, m = x_swept.shape[-1], u.shape[-1]
    sim_block = make_sim_block(step_fn, N - 1)
    u_blk = u.reshape(M, Nf, m)
    K_blk = K.reshape(M, Nf, m, n)
    du_blk = du.reshape(M, Nf, m)
    xp_blk = xp.reshape(M, Nf, n)
    k_blk = jnp.arange(N).reshape(M, Nf)

    def sim_all(alpha, xs_a):
        x0s = xs_a.reshape(M, Nf, n)[:, 0]
        return jax.vmap(sim_block, in_axes=(None, 0, 0, 0, 0, 0, 0))(
            alpha, x0s, u_blk, K_blk, du_blk, xp_blk, k_blk
        )

    return jax.vmap(sim_all)(alphas, x_swept)


@pytest.mark.parametrize("integrator", [
    1,
    pytest.param(2, marks=pytest.mark.slow),
    pytest.param(3, marks=pytest.mark.slow),
])
def test_fused_rollout_matches_xla(integrator):
    from parallel_ddp_tpu.models.kuka import kuka, kuka_params

    N, M, A = 4, 2, 3  # tiny: interpret mode is per-op python, uncached
    # per-sample core MUST be the scalar-channel one (the kernel inlines it)
    soa = KukaSoA(ee_type=1, gravity=9.81)
    plant = dataclasses.replace(
        kuka(kuka_params(core="rbd")), dynamics=soa.forward_dynamics,
        name="kuka_soa_test",
    )
    cfg = SolverConfig(num_time_steps=N, total_time=0.1, m_blocks_b=M,
                       m_blocks_f=M, num_alpha=A, integrator=integrator)
    step_fn = make_step(plant, integrator, cfg.dt)

    rng = np.random.default_rng(0)
    x_swept = jnp.asarray(rng.normal(0, 0.4, (A, N, 14)), jnp.float32)
    u = jnp.asarray(rng.normal(0, 2.0, (N, 7)), jnp.float32)
    K = jnp.asarray(rng.normal(0, 0.2, (N, 7, 14)), jnp.float32)
    du = jnp.asarray(rng.normal(0, 0.5, (N, 7)), jnp.float32)
    xp = jnp.asarray(rng.normal(0, 0.4, (N, 14)), jnp.float32)
    alphas = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)

    x_ref, u_ref = _xla_rollout(step_fn, N, M, x_swept, u, K, du, xp, alphas)

    fused = make_kuka_fused_rollout(1, 9.81, integrator, cfg.dt, N, M, A,
                                    interpret=True)
    assert fused is not None
    x_f, u_f = fused(x_swept, u, K, du, xp, alphas)

    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_rollout_shape_guards():
    # block too long for the VMEM budget -> factory declines (XLA fallback)
    assert make_kuka_fused_rollout(1, 9.81, 1, 0.01, 64, 1, 16) is None
    assert make_kuka_fused_rollout(1, 9.81, 1, 0.01, 64, 2, 16) is None  # Nf=32
    # too many (alpha, block) lanes for one tile -> decline, not a trace error
    assert make_kuka_fused_rollout(1, 9.81, 1, 0.01, 64, 4, 280) is None
    assert make_kuka_fused_rollout(1, 9.81, 1, 0.01, 64, 4, 16,
                                   interpret=True) is not None  # Nf=16
    assert MAX_NB >= 16


@pytest.mark.slow
def test_fused_rollout_chunk_skip_mask():
    """Chunk-local traced skip mask (the 'sp' horizon-sharded use,
    parallel/sp.py): a chunk that does NOT contain the horizon's final step
    must simulate every step, and a chunk that does must skip exactly that
    step — compared against the XLA scan with the same per-step skip flags."""
    integrator = 2
    N, M, A = 4, 2, 3
    soa = KukaSoA(ee_type=1, gravity=9.81)
    dt = 0.025
    from parallel_ddp_tpu.models.base import Plant

    plant = Plant(name="kuka_soa_mask_test", n_pos=7, n_ctrl=7,
                  dynamics=soa.forward_dynamics)
    step_fn = make_step(plant, integrator, dt)

    rng = np.random.default_rng(1)
    x_swept = jnp.asarray(rng.normal(0, 0.4, (A, N, 14)), jnp.float32)
    u = jnp.asarray(rng.normal(0, 2.0, (N, 7)), jnp.float32)
    K = jnp.asarray(rng.normal(0, 0.2, (N, 7, 14)), jnp.float32)
    du = jnp.asarray(rng.normal(0, 0.5, (N, 7)), jnp.float32)
    xp = jnp.asarray(rng.normal(0, 0.4, (N, 14)), jnp.float32)
    alphas = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)

    fused = make_kuka_fused_rollout(1, 9.81, integrator, dt, N, M, A,
                                    interpret=True)

    def xla_with_skip(skip):
        """XLA scan honoring explicit per-step skip flags (the solver's
        make_sim_block with k==nf replaced by the flag)."""
        Nf = N // M

        def sim_block(alpha, x0, u_b, K_b, du_b, xp_b, s_b):
            def body(xc, inp):
                u_k, K_k, du_k, xp_k, s = inp
                u_new = u_k - alpha * du_k - K_k @ (xc - xp_k)
                u_new = jnp.where(s, u_k, u_new)
                xn = step_fn(xc, u_new)
                return jnp.where(s, xc, xn), (jnp.where(s, xc, xn), u_new)

            _, (xs, us) = jax.lax.scan(body, x0, (u_b, K_b, du_b, xp_b, s_b))
            return xs, us

        u_blk = u.reshape(M, Nf, 7)
        K_blk = K.reshape(M, Nf, 7, 14)
        du_blk = du.reshape(M, Nf, 7)
        xp_blk = xp.reshape(M, Nf, 14)
        s_blk = skip.reshape(M, Nf)

        def sim_all(alpha, xs_a):
            x0s = xs_a.reshape(M, Nf, 14)[:, 0]
            return jax.vmap(sim_block, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                alpha, x0s, u_blk, K_blk, du_blk, xp_blk, s_blk
            )

        return jax.vmap(sim_all)(alphas, x_swept)

    # interior chunk: no step skipped
    mask_none = jnp.zeros((M, N // M), bool)
    x_f, u_f = fused(x_swept, u, K, du, xp, alphas, skip_mask=mask_none)
    x_r, u_r = xla_with_skip(mask_none)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_r),
                               rtol=2e-5, atol=2e-5)

    # final chunk: the last step is the horizon end
    mask_last = jnp.zeros((M, N // M), bool).at[-1, -1].set(True)
    x_f, u_f = fused(x_swept, u, K, du, xp, alphas, skip_mask=mask_last)
    x_r, u_r = xla_with_skip(mask_last)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_r),
                               rtol=2e-5, atol=2e-5)
    # and the masked entries really froze / passed through
    np.testing.assert_allclose(np.asarray(u_f[:, -1, -1]),
                               np.asarray(jnp.broadcast_to(u[-1], (A, 7))),
                               rtol=1e-6)


@pytest.mark.parametrize("batch", [
    3,
    pytest.param(200, marks=pytest.mark.slow),
])
def test_fused_rollout_scenario_vmap_packed(batch):
    """jax.vmap over scenarios routes through the kernel's custom_vmap rule
    (ops/pallas_rollout.py packed_core): scenarios are packed into the lane
    tile (batch=3 -> one group; batch=200 with L=6 lanes/scenario and
    gs=170 scenarios/group -> two groups, padded tail).  Per-scenario results
    must match the unbatched call."""
    integrator = 1
    N, M, A = 4, 2, 3
    dt = 0.025
    fused = make_kuka_fused_rollout(1, 9.81, integrator, dt, N, M, A,
                                    interpret=True)
    assert fused is not None

    rng = np.random.default_rng(5)
    B = batch
    x_swept = jnp.asarray(rng.normal(0, 0.4, (B, A, N, 14)), jnp.float32)
    u = jnp.asarray(rng.normal(0, 2.0, (B, N, 7)), jnp.float32)
    K = jnp.asarray(rng.normal(0, 0.2, (B, N, 7, 14)), jnp.float32)
    du = jnp.asarray(rng.normal(0, 0.5, (B, N, 7)), jnp.float32)
    xp = jnp.asarray(rng.normal(0, 0.4, (B, N, 14)), jnp.float32)
    alphas = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)

    x_b, u_b = jax.vmap(
        lambda xs, uu, kk, dd, xpp: fused(xs, uu, kk, dd, xpp, alphas)
    )(x_swept, u, K, du, xp)

    for i in (0, B // 2, B - 1):
        x_r, u_r = fused(x_swept[i], u[i], K[i], du[i], xp[i], alphas)
        np.testing.assert_allclose(np.asarray(x_b[i]), np.asarray(x_r),
                                   rtol=2e-5, atol=2e-5, err_msg=f"x[{i}]")
        np.testing.assert_allclose(np.asarray(u_b[i]), np.asarray(u_r),
                                   rtol=2e-5, atol=2e-5, err_msg=f"u[{i}]")
