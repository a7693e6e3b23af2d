"""Fused Pallas block-Riccati sweep vs the XLA scan path.

The kernel (ops/pallas_riccati.py) must produce the SAME backward-pass
results as the vmapped lax.scan block sweep (parallel/backward.py run_block)
— same recursion (bpHelpers.cuh:37-334), same Tassa STATE_REG asymmetry, same
defect coupling, terminal pass-through and PD test; only the matmul
accumulation order differs (sequential tile FMAs vs XLA dots), so allclose
not bitwise.  Run in interpret mode on CPU."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from parallel_ddp_tpu.config import SolverConfig
from parallel_ddp_tpu.parallel.backward import backward_pass
from parallel_ddp_tpu.presets import pendulum_swingup
from parallel_ddp_tpu.solver import make_ilqr_solver


def _synthetic(cfg, n, m, seed=0):
    rng = np.random.default_rng(seed)
    N = cfg.num_time_steps
    nm = n + m
    f32 = np.float32
    AB = rng.normal(0, 0.3, (N - 1, n, nm)).astype(f32)
    C = rng.normal(0, 0.3, (N, nm, nm)).astype(f32)
    H = np.einsum("kij,klj->kil", C, C) + np.eye(nm, dtype=f32)
    g = rng.normal(0, 0.5, (N, nm)).astype(f32)
    Cp = rng.normal(0, 0.3, (N, n, n)).astype(f32)
    Pp = np.einsum("kij,klj->kil", Cp, Cp) + np.eye(n, dtype=f32)
    pp = rng.normal(0, 0.5, (N, n)).astype(f32)
    d = rng.normal(0, 0.1, (N, n)).astype(f32)
    x = rng.normal(0, 0.5, (N, n)).astype(f32)
    xp2 = x + rng.normal(0, 0.05, (N, n)).astype(f32)
    return tuple(jnp.asarray(a) for a in (AB, H, g, Pp, pp, d, x, xp2))


@pytest.mark.parametrize("state_reg", [True, False])
@pytest.mark.parametrize("m_blocks_f", [1, 2])
def test_pallas_backward_matches_xla(state_reg, m_blocks_f):
    cfg = SolverConfig(num_time_steps=16, total_time=0.5, m_blocks_b=4,
                       m_blocks_f=m_blocks_f, num_alpha=4,
                       state_reg=state_reg)
    n, m = 3, 2
    args = _synthetic(cfg, n, m)
    rho0 = jnp.asarray(1.0, jnp.float32)
    drho0 = jnp.asarray(1.0, jnp.float32)

    ref = backward_pass(cfg, *args, rho0, drho0)
    cfg_p = dataclasses.replace(cfg, pallas_riccati=True)
    out = backward_pass(cfg_p, *args, rho0, drho0)

    assert not bool(ref.fail) and not bool(out.fail)
    for name in ("P", "p", "K", "du", "ApBK", "Bdu", "dJexp"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5, err_msg=name)


def test_pallas_riccati_solver_equivalence():
    """Full pendulum solve with the fused sweep matches the XLA path: same
    accept/reject decisions, same trajectory within float-reassociation noise."""
    prob = pendulum_swingup(num_time_steps=32, total_time=1.5,
                            m_blocks=2, num_alpha=8)
    cfg = dataclasses.replace(prob.cfg, max_iter=12)
    goal = jnp.asarray([np.pi, 0.0])
    x0 = jnp.zeros((32, 2))
    u0 = jnp.zeros((32, 1))

    ref = make_ilqr_solver(prob.plant, prob.cost, cfg)(
        x0, u0, goal, initial_rollout=True)
    out = make_ilqr_solver(
        prob.plant, prob.cost,
        dataclasses.replace(cfg, pallas_riccati=True),
    )(x0, u0, goal, initial_rollout=True)

    np.testing.assert_array_equal(
        np.asarray(out.alpha_trace), np.asarray(ref.alpha_trace))
    np.testing.assert_allclose(
        float(out.J), float(ref.J), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.x), np.asarray(ref.x), rtol=1e-3, atol=1e-4)


def test_pallas_riccati_scenario_vmap_equivalence():
    """Scenario-vmapped solves through the fused sweep (the batched-throughput
    path, benchmarks/scaling.py pallas_riccati=True): jax.vmap adds a leading
    batch grid dimension to the pallas_call; results must match per-sample
    solves exactly (same program, batched dispatch)."""
    import jax

    prob = pendulum_swingup(num_time_steps=16, total_time=1.0,
                            m_blocks=2, num_alpha=4)
    cfg = dataclasses.replace(prob.cfg, max_iter=4, pallas_riccati=True)
    solver = make_ilqr_solver(prob.plant, prob.cost, cfg)
    goal = jnp.asarray([np.pi, 0.0], jnp.float32)

    rng = np.random.default_rng(3)
    B = 3
    x0 = jnp.asarray(rng.normal(0, 0.2, (B, 16, 2)).astype(np.float32))
    u0 = jnp.asarray(rng.normal(0, 0.5, (B, 16, 1)).astype(np.float32))

    out = jax.vmap(
        lambda x, u: solver(x, u, goal, initial_rollout=True))(x0, u0)
    for i in range(B):
        ref = solver(x0[i], u0[i], goal, initial_rollout=True)
        np.testing.assert_allclose(
            float(out.J[i]), float(ref.J), rtol=1e-5, err_msg=f"J[{i}]")
        np.testing.assert_allclose(
            np.asarray(out.x[i]), np.asarray(ref.x), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("batch,m_blocks_b,n_steps", [
    (3, 4, 16),      # packed single tile: L = 12 lanes
    # L = 1280 > 1024: two full-lane groups, last one padded
    pytest.param(5, 256, 512, marks=pytest.mark.slow),
])
def test_riccati_lane_packed_vmap_matches_per_sample(batch, m_blocks_b,
                                                     n_steps):
    """The custom_vmap rule packs the scenario axis into the kernel's lane
    tile (ops/pallas_riccati.py make_riccati_block_call docstring) — the
    batched-throughput path that OOMed HBM under default grid-replication
    batching.  Per-scenario results must match the unbatched call bitwise-ish
    (same kernel math, same lanes, different tile placement -> allclose)."""
    import jax

    from parallel_ddp_tpu.ops.pallas_riccati import make_riccati_block_call

    n, m = 3, 2
    cfg = SolverConfig(num_time_steps=n_steps, total_time=0.5,
                       m_blocks_b=m_blocks_b, m_blocks_f=2, num_alpha=4)
    Mb, Nb = cfg.m_blocks_b, cfg.n_blocks_b
    bp = make_riccati_block_call(cfg, n, m)
    assert bp is not None

    rng = np.random.default_rng(7)
    f32 = np.float32
    B = batch
    nm = n + m
    C = rng.normal(0, 0.3, (B, Mb, Nb, nm, nm)).astype(f32)
    H = np.einsum("bqkij,bqklj->bqkil", C, C) + np.eye(nm, dtype=f32)
    args = (
        jnp.asarray(rng.uniform(0.5, 2.0, (B,)).astype(f32)),          # rho
        jnp.asarray(np.einsum(
            "bqij,bqlj->bqil",
            rng.normal(0, 0.3, (B, Mb, n, n)).astype(f32),
            rng.normal(0, 0.3, (B, Mb, n, n)).astype(f32))
            + np.eye(n, dtype=f32)),                                    # seeds_P
        jnp.asarray(rng.normal(0, 0.5, (B, Mb, n)).astype(f32)),        # seeds_p
        jnp.asarray(rng.normal(0, 0.3, (B, Mb, Nb, n, nm)).astype(f32)),
        jnp.asarray(H),
        jnp.asarray(rng.normal(0, 0.5, (B, Mb, Nb, nm)).astype(f32)),
        jnp.asarray(rng.normal(0, 0.1, (B, Mb, Nb, n)).astype(f32)),
        jnp.broadcast_to(
            jnp.arange(Mb * Nb, dtype=jnp.int32).reshape(Mb, Nb),
            (B, Mb, Nb)),                                               # k_blk
    )

    batched = jax.vmap(bp)(*args)
    for i in range(B):
        ref = bp(*(a[i] for a in args))
        for name, a, b in zip(
                ("P", "p", "K", "du", "ApBK", "Bdu", "dJexp", "fail"),
                ref, (o[i] for o in batched)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-6,
                err_msg=f"{name}[{i}]")


def test_pallas_riccati_sp_sharded_equivalence():
    """The fused sweep inside the 'sp' horizon-sharded solver (chunk-local
    TRACED step indices flowing into the kernel's masks) matches the
    single-device XLA solve on the 4-way CPU mesh."""
    from parallel_ddp_tpu.parallel.sharding import make_mesh
    from parallel_ddp_tpu.parallel.sp import make_sp_solver

    prob = pendulum_swingup(num_time_steps=64, m_blocks=8, num_alpha=8)
    cfg = dataclasses.replace(prob.cfg, max_iter=8)
    goal = jnp.asarray([np.pi, 0.0], jnp.float32)
    x0 = jnp.zeros((64, 2), jnp.float32)
    u0 = jnp.zeros((64, 1), jnp.float32)

    ref = make_ilqr_solver(prob.plant, prob.cost, cfg)(
        x0, u0, goal, initial_rollout=True)
    mesh = make_mesh(4, axis_names=("sp",))
    out = make_sp_solver(
        prob.plant, prob.cost,
        dataclasses.replace(cfg, pallas_riccati=True), mesh,
    )(x0, u0, goal, initial_rollout=True)

    np.testing.assert_array_equal(
        np.asarray(out.alpha_trace), np.asarray(ref.alpha_trace))
    np.testing.assert_allclose(float(out.J), float(ref.J), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.x), np.asarray(ref.x), rtol=1e-3, atol=1e-4)
