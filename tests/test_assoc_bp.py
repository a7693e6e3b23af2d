"""Associative-scan Riccati backward pass (bp_assoc_scan) vs the serial sweep.

The assoc-scan pass is EXACT (no stale-boundary approximation), so with one
block (m_blocks_b=1, where the reference recursion is also exact) both paths
must agree to fp32 roundoff on every output — P, p, K, du, ApBK, Bdu, dJexp —
and a full solve must follow the same iterate sequence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_ddp_tpu.config import SolverConfig
from parallel_ddp_tpu.parallel.backward import backward_pass
from parallel_ddp_tpu.presets import pendulum_swingup
from parallel_ddp_tpu.solver import make_ilqr_solver


def _random_lqr_data(rng, N, n, m, m_blocks_f=1):
    AB = jnp.asarray(rng.normal(0, 0.4, (N - 1, n, n + m)).astype(np.float32))
    # SPD-ish cost blocks
    Hs = []
    for _ in range(N):
        a = rng.normal(0, 0.4, (n + m, n + m))
        Hs.append(a @ a.T + 0.5 * np.eye(n + m))
    H = jnp.asarray(np.stack(Hs).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1.0, (N, n + m)).astype(np.float32))
    d = jnp.zeros((N, n), jnp.float32)
    if m_blocks_f > 1:
        nf_blk = N // m_blocks_f
        bidx = (np.arange(m_blocks_f - 1) + 1) * nf_blk - 1
        d = d.at[bidx].set(
            jnp.asarray(rng.normal(0, 0.1, (len(bidx), n)).astype(np.float32))
        )
    return AB, H, g, d


@pytest.mark.parametrize("m_blocks_f", [1, 4])
def test_assoc_backward_matches_serial(m_blocks_f):
    N, n, m = 32, 4, 2
    rng = np.random.default_rng(7)
    AB, H, g, d = _random_lqr_data(rng, N, n, m, m_blocks_f)

    base = dict(num_time_steps=N, total_time=1.0, m_blocks_b=1,
                m_blocks_f=m_blocks_f, num_alpha=4, state_reg=False)
    cfg_serial = SolverConfig(**base)
    cfg_assoc = SolverConfig(**base, bp_assoc_scan=True)

    Pp = jnp.zeros((N, n, n), jnp.float32)
    pp = jnp.zeros((N, n), jnp.float32)
    x = jnp.zeros((N, n), jnp.float32)
    rho = jnp.asarray(1.0, jnp.float32)
    drho = jnp.asarray(1.0, jnp.float32)

    ref = backward_pass(cfg_serial, AB, H, g, Pp, pp, d, x, x, rho, drho)
    out = backward_pass(cfg_assoc, AB, H, g, Pp, pp, d, x, x, rho, drho)

    assert not bool(ref.fail) and not bool(out.fail)
    np.testing.assert_allclose(out.P, ref.P, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out.p, ref.p, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(out.K, ref.K, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out.du, ref.du, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(out.ApBK, ref.ApBK, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out.Bdu, ref.Bdu, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(out.dJexp, ref.dJexp, rtol=1e-3)


def test_assoc_solver_matches_serial_pendulum():
    """Full solve: assoc-scan backward vs serial backward, identical iterates."""
    prob = pendulum_swingup(num_time_steps=64, m_blocks=1, num_alpha=8)
    base = dataclasses.replace(prob.cfg, state_reg=False, max_iter=10,
                               m_blocks_f=4, m_blocks_b=1)
    cfg_assoc = dataclasses.replace(base, bp_assoc_scan=True)
    goal = jnp.asarray([np.pi, 0.0])
    x0 = jnp.zeros((64, 2), jnp.float32)
    u0 = jnp.zeros((64, 1), jnp.float32)

    ref = make_ilqr_solver(prob.plant, prob.cost, base)(
        x0, u0, goal, initial_rollout=True
    )
    out = make_ilqr_solver(prob.plant, prob.cost, cfg_assoc)(
        x0, u0, goal, initial_rollout=True
    )
    np.testing.assert_array_equal(
        np.asarray(out.alpha_trace), np.asarray(ref.alpha_trace)
    )
    np.testing.assert_allclose(out.J, ref.J, rtol=1e-4)
    np.testing.assert_allclose(out.x, ref.x, rtol=1e-3, atol=1e-3)


def test_assoc_requires_plain_reg():
    with pytest.raises(ValueError):
        SolverConfig(bp_assoc_scan=True, state_reg=True)
