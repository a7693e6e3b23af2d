"""Pick-and-place goal sequencing (LCM_pickNPlace_examples.cu:40-135 analog)
and the new message schemas / goal modes."""

import numpy as np
import pytest

from parallel_ddp_tpu.config import CostWeights
from parallel_ddp_tpu.runtime import messages as msg
from parallel_ddp_tpu.runtime.nodes import ee_goal_to_pytree
from parallel_ddp_tpu.runtime.pubsub import Channels, PubSub
from parallel_ddp_tpu.tasks.pick_and_place import (
    PickAndPlaceConfig,
    PickAndPlaceGoalNode,
    close_weights,
    default_weights,
    sample_waypoints,
)

PORT = 7811


def _wait_new(spy, channel, timeout=2.0):
    """Deadline-poll for a new message (UDP multicast delivery is async)."""
    import time
    deadline = time.time() + timeout
    while time.time() < deadline:
        m = spy.poll_new(channel)
        if m is not None:
            return m
        time.sleep(0.002)
    return None


def test_new_message_roundtrips():
    ch = msg.CommandHardware(1.25, np.arange(7, dtype=np.float32),
                             np.ones(7, np.float32),
                             np.arange(6, dtype=np.float32))
    out = msg.unpack_any(ch.pack())
    assert isinstance(out, msg.CommandHardware)
    np.testing.assert_array_equal(out.q_ref, ch.q_ref)
    np.testing.assert_array_equal(out.wrench, ch.wrench)

    cr = msg.ControllerReference(2.0, *[np.full(7, i, np.float32) for i in range(4)])
    out = msg.unpack_any(cr.pack())
    assert isinstance(out, msg.ControllerReference)
    np.testing.assert_array_equal(out.u_nominal, np.full(7, 3, np.float32))

    tw = msg.Goal(msg.Goal.MODE_EE_TWIST,
                  np.asarray([0.5, -0.4, 0.1, 0.0, 0.1, 0.0], np.float32))
    out = msg.unpack_any(tw.pack())
    assert out.mode == msg.Goal.MODE_EE_TWIST


def test_ee_goal_to_pytree_modes():
    pose = ee_goal_to_pytree(msg.Goal(0, np.arange(6, dtype=np.float32)))
    np.testing.assert_array_equal(pose["ee_goal"], np.arange(6))

    joint = ee_goal_to_pytree(msg.Goal(1, np.arange(14, dtype=np.float32)))
    np.testing.assert_array_equal(joint["x_target"], np.arange(14))

    twist = ee_goal_to_pytree(
        msg.Goal(2, np.asarray([0.5, -0.4, 0.1, 0.2, 0.0, 0.0], np.float32))
    )
    np.testing.assert_allclose(twist["ee_goal"][:3], [0.5, -0.4, 0.1], rtol=1e-6)
    np.testing.assert_array_equal(twist["ee_goal"][3:], 0.0)  # rpy NOT velocity
    np.testing.assert_allclose(twist["ee_vel_goal"][:3], [0.2, 0.0, 0.0], rtol=1e-6)


def test_sample_waypoints_alternates_sides():
    wps = sample_waypoints(PickAndPlaceConfig(), 6)
    assert wps.shape == (6, 3)
    assert np.all(wps[:, 2] == np.float32(0.1))
    signs = np.sign(wps[:, 1])
    assert np.all(signs[::2] == signs[0])
    assert np.all(signs[1::2] == -signs[0])


def test_pick_and_place_state_machine():
    """Drive the approach -> close -> settle -> re-plan sequence and check the
    published messages (goal switch + clearVars/10x-budget params + cost sets,
    LCM_pickNPlace_examples.cu:103-133)."""
    bus = PubSub(port=PORT)
    spy = PubSub(port=PORT)
    for ch in (Channels.GOAL, Channels.SOLVER_PARAMS, Channels.COST_PARAMS):
        spy.subscribe(ch)
    import time
    time.sleep(0.05)

    # fake FK: the "EE" is just the first three joint coordinates, so the test
    # can place the arm anywhere without inverse kinematics
    node = PickAndPlaceGoalNode(
        bus, lambda q: np.asarray(q[:3], np.float32),
        PickAndPlaceConfig(e_norm_lim=0.10, v_norm_lim=0.10, iter_limit=7,
                           time_limit_ms=5.0),
        rng=np.random.default_rng(42),
    )
    g0 = node.goal.copy()
    far_q = np.zeros(7, np.float32)
    qd0 = np.zeros(7, np.float32)

    # far away: nothing published
    node.handle_status(msg.Status(0.0, far_q, qd0))
    assert _wait_new(spy, Channels.COST_PARAMS, timeout=0.2) is None

    # within 2x the settle band: the stiffer "close" cost set goes out once
    close_q = np.concatenate([g0 + 0.15 / np.sqrt(3.0), np.zeros(4)]).astype(np.float32)
    node.handle_status(msg.Status(0.5, close_q, qd0))
    m = _wait_new(spy, Channels.COST_PARAMS)
    assert m is not None
    w = msg.CostParams.unpack(m[0]).weights
    assert w.q_ee1 == pytest.approx(75.0) and w.qf_ee1 == pytest.approx(500.0)
    node.handle_status(msg.Status(0.6, close_q, qd0))
    assert _wait_new(spy, Channels.COST_PARAMS, timeout=0.2) is None  # sent only once

    # settled: new goal on the other side + clearVars params with 10x budget +
    # default cost set
    settle_q = np.concatenate([g0, np.zeros(4)]).astype(np.float32)
    node.handle_status(msg.Status(1.0, settle_q, qd0))
    gm = _wait_new(spy, Channels.GOAL)
    assert gm is not None
    new_goal = msg.Goal.unpack(gm[0])
    assert new_goal.mode == msg.Goal.MODE_EE_TWIST
    assert np.sign(new_goal.value[1]) != np.sign(g0[1])  # alternated side
    pm = msg.SolverParams.unpack(_wait_new(spy, Channels.SOLVER_PARAMS)[0])
    assert pm.clear_vars and pm.iter_limit == 7
    assert pm.time_limit_ms == pytest.approx(50.0)  # 10x re-plan budget
    cm = msg.CostParams.unpack(_wait_new(spy, Channels.COST_PARAMS)[0])
    assert cm.weights.q_ee1 == pytest.approx(25.0)
    assert node.settle_times() == [1.0]

    # moving toward the new goal (eNorm dropped below 0.95*eNormMax): normal
    # solver params restored with useCostShift on
    toward = 0.5 * (np.asarray(new_goal.value[:3]) + g0)
    node.handle_status(
        msg.Status(1.5, np.concatenate([toward, np.zeros(4)]).astype(np.float32), qd0)
    )
    pm2 = msg.SolverParams.unpack(_wait_new(spy, Channels.SOLVER_PARAMS)[0])
    assert not pm2.clear_vars and pm2.cost_shift == 1
    assert pm2.time_limit_ms == pytest.approx(5.0)

    bus.close()
    spy.close()


def test_cost_shift_live():
    """goal['cost_shift'] switches the terminal EE weights on earlier without
    recompiling (USE_COST_SHIFT, cost_arm.cuh:206-222)."""
    import jax.numpy as jnp

    from parallel_ddp_tpu.costs.ee import ee_cost

    n = 8
    fake_ee = lambda q: jnp.concatenate([q[:3], jnp.zeros(3)])
    cost = ee_cost(fake_ee, 7, 7, n)
    w = CostWeights(q_ee1=1.0, qf_ee1=100.0, q_ee2=0.0, qf_ee2=0.0,
                    r_ee=0.0, q_xdee=0.0, qf_xdee=0.0)
    x = jnp.ones(14)
    u = jnp.zeros(7)
    base = {"ee_goal": jnp.zeros(6), "x_target": jnp.zeros(14)}
    c_run = float(cost.stage(x, u, n - 2, dict(base, cost_shift=jnp.asarray(0)), w))
    c_shift = float(cost.stage(x, u, n - 2, dict(base, cost_shift=jnp.asarray(1)), w))
    c_term = float(cost.stage(x, u, n - 1, dict(base, cost_shift=jnp.asarray(0)), w))
    assert c_shift == pytest.approx(c_term)      # k = N-2 now uses QF
    assert c_shift == pytest.approx(100.0 * c_run)


def test_default_and_close_weight_sets():
    d, c = default_weights(), close_weights()
    assert (d.q_ee1, d.qf_ee1, d.r_ee) == (25.0, 250.0, 0.001)
    assert (c.q_ee1, c.qf_ee1) == (75.0, 500.0)
    assert c.q_xdee == d.q_xdee == 10.0


@pytest.mark.slow
def test_pick_place_device_loop_smoke():
    """Fused on-device pick-and-place (controller + plant + waypoint state
    machine in one scan) builds and advances waypoints on a tiny Kuka config."""
    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.mpc.driver import MPCConfig, MPCController
    from parallel_ddp_tpu.presets import kuka_ee
    from parallel_ddp_tpu.tasks.pick_and_place import (
        default_weights,
        make_pick_place_device_loop,
    )

    prob = kuka_ee(num_time_steps=8, m_blocks=2, num_alpha=2)
    ctrl = MPCController(prob.plant, prob.cost, prob.cfg,
                         MPCConfig(max_iters_per_solve=2))
    # near-home waypoints with generous settle bands so a short loop finishes
    wps = np.asarray([[0.1, 0.1, 1.2], [0.1, -0.1, 1.2]], np.float32)
    cfg = PickAndPlaceConfig(e_norm_lim=0.35, v_norm_lim=2.0)
    loop = make_pick_place_device_loop(ctrl, wps, cfg, sim_rate_hz=200.0,
                                       control_period_s=0.05)
    x0 = np.zeros(14, np.float32)
    goal0 = {"ee_goal": np.concatenate([wps[0], np.zeros(3)]).astype(np.float32),
             "x_target": np.zeros(14, np.float32)}
    st = ctrl.init_state(x0, t0=0.0, goal=goal0, weights=default_weights(),
                         warmup_iters=10)
    res = loop(st, x0, 0.0, 25)
    jax.block_until_ready(res.x)
    assert np.all(np.isfinite(np.asarray(res.x)))
    assert np.all(np.isfinite(np.asarray(res.e_norm)))
    # the EE starts ~0.2 m from waypoint 0 (home EE is at z=1.3245): the loop
    # must settle it and advance
    assert int(np.asarray(res.waypoints_done)) >= 1
    wi = np.asarray(res.wp_idx)
    assert wi[0] == 0 and wi[-1] >= 1
