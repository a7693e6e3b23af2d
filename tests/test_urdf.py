"""URDF front-end tests (models/urdf.py).

Oracles, strongest first:
  1. an INDEPENDENT textbook double-pendulum model (axis=y chain parsed from
     URDF vs hand-written closed-form M/C/g) — catches axis-alignment and
     frame-composition errors at machine precision;
  2. round-trip against the hardcoded iiwa-14 constants (params.build_constants,
     themselves oracle-tested against a float64 Lagrangian in test_kuka.py);
  3. structural invariants on a deliberately nasty 3-DoF chain (axes y/x/z,
     inertia products, inertial-origin rpy, fixed mass-carrying bracket
     mid-chain, fixed tool joint at the tip): symmetric PD mass matrix,
     inverse-dynamics/forward-dynamics consistency, energy conservation;
  4. the loaded plant solves end-to-end through the block-parallel iLQR stack.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_ddp_tpu.models.kuka import params as kp
from parallel_ddp_tpu.models.kuka.rbd import KukaRBD
from parallel_ddp_tpu.models.urdf import IIWA14_URDF as IIWA_URDF
from parallel_ddp_tpu.models.urdf import load_urdf, urdf_plant

ARM3_URDF = """
<robot name="arm3">
  <link name="base"/>
  <link name="l1">
    <inertial><origin xyz="0.0 0.05 0.1" rpy="0.2 -0.1 0.3"/><mass value="2.0"/>
      <inertia ixx="0.02" ixy="0.001" ixz="-0.002" iyy="0.03" iyz="0.003" izz="0.015"/></inertial>
  </link>
  <link name="bracket">
    <inertial><origin xyz="0.01 0 0.02"/><mass value="0.5"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.0008"/></inertial>
  </link>
  <link name="l2">
    <inertial><origin xyz="0.0 0.0 0.12" rpy="0 0.1 0"/><mass value="1.5"/>
      <inertia ixx="0.015" ixy="0" ixz="0.001" iyy="0.012" iyz="0" izz="0.008"/></inertial>
  </link>
  <link name="l3">
    <inertial><origin xyz="0 0 0.05"/><mass value="0.8"/>
      <inertia ixx="0.004" ixy="0" ixz="0" iyy="0.004" iyz="0" izz="0.002"/></inertial>
  </link>
  <link name="tool">
    <inertial><origin xyz="0 0 0.03"/><mass value="0.3"/>
      <inertia ixx="0.0005" ixy="0" ixz="0" iyy="0.0005" iyz="0" izz="0.0003"/></inertial>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="2.0" velocity="2.0" effort="50"/>
  </joint>
  <joint name="jb" type="fixed">
    <parent link="l1"/><child link="bracket"/>
    <origin xyz="0 0.02 0.25" rpy="0.1 0 0"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="bracket"/><child link="l2"/>
    <origin xyz="0 0 0.05" rpy="0 0.3 0"/><axis xyz="1 0 0"/>
    <limit lower="-2.5" upper="2.5" velocity="2.0" effort="40"/>
  </joint>
  <joint name="j3" type="continuous">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0 0 0.3"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="jt" type="fixed">
    <parent link="l3"/><child link="tool"/>
    <origin xyz="0 0.01 0.12" rpy="0 0 0.4"/>
  </joint>
</robot>
"""


def test_double_pendulum_matches_textbook_dynamics():
    """Independent closed-form oracle: planar double pendulum hung from
    (0,0,1), both joints about +y, point masses at the link tips."""
    m1, m2, l1, l2, g = 1.3, 0.7, 0.9, 0.6, 9.81
    urdf = f"""
    <robot name="dpend">
      <link name="base"/>
      <link name="l1"><inertial><origin xyz="0 0 {-l1}"/><mass value="{m1}"/>
        <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/></inertial></link>
      <link name="l2"><inertial><origin xyz="0 0 {-l2}"/><mass value="{m2}"/>
        <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/></inertial></link>
      <joint name="j1" type="continuous">
        <parent link="base"/><child link="l1"/>
        <origin xyz="0 0 1.0"/><axis xyz="0 1 0"/></joint>
      <joint name="j2" type="continuous">
        <parent link="l1"/><child link="l2"/>
        <origin xyz="0 0 {-l1}"/><axis xyz="0 1 0"/></joint>
    </robot>
    """
    rbd = load_urdf(urdf).rbd(gravity=g)

    def analytic(q, qd, tau):
        q1, q2 = q
        m_mat = np.array(
            [
                [(m1 + m2) * l1**2 + m2 * l2**2 + 2 * m2 * l1 * l2 * np.cos(q2),
                 m2 * l2**2 + m2 * l1 * l2 * np.cos(q2)],
                [m2 * l2**2 + m2 * l1 * l2 * np.cos(q2), m2 * l2**2],
            ]
        )
        cor = np.array(
            [-m2 * l1 * l2 * np.sin(q2) * (2 * qd[0] * qd[1] + qd[1] ** 2),
             m2 * l1 * l2 * np.sin(q2) * qd[0] ** 2]
        )
        grav = np.array(
            [(m1 + m2) * g * l1 * np.sin(q1) + m2 * g * l2 * np.sin(q1 + q2),
             m2 * g * l2 * np.sin(q1 + q2)]
        )
        return np.linalg.solve(m_mat, tau - cor - grav)

    rng = np.random.default_rng(2)
    for _ in range(5):
        q = rng.normal(0, 1.5, 2)
        qd = rng.normal(0, 1.0, 2)
        tau = rng.normal(0, 3.0, 2)
        qdd = np.asarray(
            rbd.forward_dynamics(jnp.asarray(np.r_[q, qd], jnp.float32),
                                 jnp.asarray(tau, jnp.float32))
        )
        np.testing.assert_allclose(qdd, analytic(q, qd, tau), rtol=2e-4, atol=2e-4)


def test_iiwa_round_trip():
    """Parsing the shipped iiwa14.urdf reproduces the hardcoded constants."""
    arm = load_urdf(IIWA_URDF)
    assert arm.n == 7 and arm.joint_names[0] == "joint_1"
    r_t, p_t, i_sp, _, _ = kp.build_constants(ee_type=0)
    np.testing.assert_allclose(arm.r_tree, r_t, atol=1e-7)
    np.testing.assert_allclose(arm.p_tree, p_t, atol=0)
    np.testing.assert_allclose(arm.i_spatial[:6], i_sp[:6], atol=0)
    # link 7: the reference bakes I_O = diag(.0055,.0055,.005) where the URDF
    # numbers give diag(.00548,.00548,.005) — a 2e-5 rounding in the baked value
    np.testing.assert_allclose(arm.i_spatial[6], i_sp[6], atol=3e-5)
    # limits surface for the cost limit penalties (cost_arm.cuh:12-25)
    np.testing.assert_allclose(arm.pos_upper[1], 2.09439510239, rtol=1e-9)
    assert float(arm.effort_limit[0]) == 300.0

    ref = KukaRBD(ee_type=0, gravity=9.81)
    ours = arm.rbd(gravity=9.81)
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = jnp.asarray(rng.normal(0, 1.0, 14), jnp.float32)
        u = jnp.asarray(rng.normal(0, 50.0, 7), jnp.float32)
        qdd_u = np.asarray(ours.forward_dynamics(x, u))
        qdd_r = np.asarray(ref.forward_dynamics(x, u))
        scale = 1.0 + np.abs(qdd_r).max()
        assert np.abs(qdd_u - qdd_r).max() / scale < 5e-3  # link-7 rounding
        np.testing.assert_allclose(
            np.asarray(ours.ee_pose(x[:7])), np.asarray(ref.ee_pose(x[:7])),
            atol=1e-5,
        )


def test_generic_arm_invariants():
    """Nasty 3-DoF chain: SPD mass matrix, ID(FD)=id, energy conservation."""
    arm = load_urdf(ARM3_URDF)
    assert arm.n == 3 and arm.joint_names == ("j1", "j2", "j3")
    # tool frame folded into ee offset/rotation
    np.testing.assert_allclose(arm.ee_offset, [0.0, 0.01, 0.12], atol=1e-7)
    assert abs(float(arm.ee_rot[0, 0]) - np.cos(0.4)) < 1e-6

    rbd = arm.rbd(gravity=9.81)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, 3), jnp.float32)
    qd = jnp.asarray(rng.normal(0, 1, 3), jnp.float32)
    u = jnp.asarray(rng.normal(0, 5, 3), jnp.float32)

    _, m_mat = rbd.bias_and_mass(q, qd)
    m_np = np.asarray(m_mat)
    np.testing.assert_allclose(m_np, m_np.T, atol=1e-6)
    assert np.linalg.eigvalsh(m_np).min() > 0

    x = jnp.concatenate([q, qd])
    qdd = rbd.forward_dynamics(x, u)
    tau = np.asarray(rbd.inverse_dynamics(q, qd, qdd))
    np.testing.assert_allclose(tau, np.asarray(u), rtol=1e-4, atol=1e-4)

    # undriven, zero-gravity RK4 roll: kinetic energy is conserved (f64 —
    # the fp32 drift floor would hide real frame-composition bugs)
    with jax.enable_x64():
        rbd0 = arm.rbd(gravity=0.0, dtype=jnp.float64)

        def energy(xx):
            _, m0 = rbd0.bias_and_mass(xx[:3], xx[3:])
            return float(xx[3:] @ (m0 @ xx[3:])) * 0.5

        def f(xx):
            return jnp.concatenate(
                [xx[3:], rbd0.forward_dynamics(xx, jnp.zeros(3, jnp.float64))]
            )

        xx = jnp.asarray(
            np.concatenate([np.asarray(q), np.asarray(qd)]), jnp.float64
        )
        e0 = energy(xx)
        h = 1e-3

        def step(s):
            k1 = f(s)
            k2 = f(s + h / 2 * k1)
            k3 = f(s + h / 2 * k2)
            k4 = f(s + h * k3)
            return s + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

        step = jax.jit(step)
        for _ in range(200):
            xx = step(xx)
        assert abs(energy(xx) - e0) / e0 < 1e-9


def test_branching_needs_tip():
    urdf = ARM3_URDF.replace(
        "</robot>",
        '<link name="extra"/><joint name="jx" type="fixed">'
        '<parent link="l1"/><child link="extra"/></joint></robot>',
    )
    with pytest.raises(AssertionError, match="branches"):
        load_urdf(urdf)
    arm = load_urdf(urdf, tip="tool")
    assert arm.n == 3


def test_offchain_fixed_mass_is_lumped():
    """tip='l3' makes the (mass-carrying) tool an off-chain fixed subtree;
    the dynamics must EXACTLY match the tip='tool' load, where the same tool
    is folded as a trailing chain joint — off-chain mass is not dropped."""
    full = load_urdf(ARM3_URDF)                 # chain runs through the tool
    cut = load_urdf(ARM3_URDF, tip="l3")        # tool hangs off the chain
    np.testing.assert_allclose(cut.i_spatial, full.i_spatial, atol=1e-12)
    np.testing.assert_allclose(cut.ee_offset, np.zeros(3), atol=0)  # tip = l3

    rbd_a, rbd_b = full.rbd(gravity=9.81), cut.rbd(gravity=9.81)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, 6), jnp.float32)
    u = jnp.asarray(rng.normal(0, 5, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rbd_a.forward_dynamics(x, u)),
        np.asarray(rbd_b.forward_dynamics(x, u)), atol=1e-6,
    )


def test_moving_branch_errors_unless_frozen():
    urdf = ARM3_URDF.replace(
        "</robot>",
        '<link name="finger"><inertial><origin xyz="0 0 0.02"/>'
        '<mass value="0.2"/><inertia ixx="0.0001" ixy="0" ixz="0" '
        'iyy="0.0001" iyz="0" izz="0.0001"/></inertial></link>'
        '<joint name="jf" type="revolute"><parent link="l2"/>'
        '<child link="finger"/><origin xyz="0 0.03 0.1"/>'
        '<axis xyz="0 0 1"/><limit lower="-1" upper="1" velocity="1" '
        'effort="5"/></joint></robot>',
    )
    with pytest.raises(ValueError, match="moving joint 'jf'"):
        load_urdf(urdf, tip="tool")
    frozen = load_urdf(urdf, tip="tool", freeze_branches=True)
    # frozen finger = the identical URDF with jf declared fixed
    fixed = load_urdf(urdf.replace('name="jf" type="revolute"',
                                   'name="jf" type="fixed"'), tip="tool")
    np.testing.assert_allclose(frozen.i_spatial, fixed.i_spatial, atol=1e-12)


CARTPOLE_URDF = """
<robot name="cartpole">
  <link name="base"/>
  <link name="cart">
    <inertial><mass value="10.0"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/></inertial>
  </link>
  <link name="pole">
    <inertial><origin xyz="0 0 -0.5"/><mass value="1.0"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/></inertial>
  </link>
  <joint name="slide" type="prismatic">
    <parent link="base"/><child link="cart"/>
    <axis xyz="1 0 0"/>
    <limit lower="-5" upper="5" velocity="10" effort="100"/>
  </joint>
  <joint name="hinge" type="continuous">
    <parent link="cart"/><child link="pole"/>
    <axis xyz="0 1 0"/>
  </joint>
</robot>
"""


def test_prismatic_cartpole_matches_analytic():
    """Prismatic-joint support, oracle = the hand-derived cart-pole model
    (models/cartpole.py, dynamics_cart.cuh:28-43): a prismatic-x cart plus a
    revolute-y pole must reproduce it to machine precision (theta measured
    oppositely: theta_urdf = -theta_analytic)."""
    from parallel_ddp_tpu.models.cartpole import _dynamics as analytic

    arm = load_urdf(CARTPOLE_URDF)
    assert arm.joint_types == "pr"
    assert float(arm.pos_upper[0]) == 5.0  # prismatic limit surfaced
    rbd = arm.rbd(gravity=9.81)
    rng = np.random.default_rng(0)
    for _ in range(6):
        x = rng.normal(0, 1.0, 4)
        u = rng.normal(0, 5.0, 1)
        qdd_a = np.asarray(analytic(jnp.asarray(x, jnp.float32),
                                    jnp.asarray(u, jnp.float32)))
        xu = jnp.asarray(np.r_[x[0], -x[1], x[2], -x[3]], jnp.float32)
        qdd_u = np.asarray(
            rbd.forward_dynamics(xu, jnp.asarray([u[0], 0.0], jnp.float32))
        )
        np.testing.assert_allclose(np.r_[qdd_u[0], -qdd_u[1]], qdd_a,
                                   rtol=2e-4, atol=2e-4)


def test_prismatic_energy_and_id_fd():
    """SCARA-like r-p-r chain: SPD mass matrix, ID(FD)=id, f64 energy
    conservation — the same invariants as the revolute chain."""
    urdf = """
    <robot name="scara">
      <link name="base"/>
      <link name="l1"><inertial><origin xyz="0.1 0 0"/><mass value="2.0"/>
        <inertia ixx="0.002" ixy="0" ixz="0" iyy="0.02" iyz="0" izz="0.02"/></inertial></link>
      <link name="l2"><inertial><origin xyz="0 0 -0.1"/><mass value="1.0"/>
        <inertia ixx="0.005" ixy="0" ixz="0" iyy="0.005" iyz="0" izz="0.001"/></inertial></link>
      <link name="l3"><inertial><origin xyz="0.05 0 0"/><mass value="0.5"/>
        <inertia ixx="0.0005" ixy="0" ixz="0" iyy="0.002" iyz="0" izz="0.002"/></inertial></link>
      <joint name="j1" type="revolute"><parent link="base"/><child link="l1"/>
        <origin xyz="0 0 0.3"/><axis xyz="0 0 1"/>
        <limit lower="-3" upper="3" velocity="3" effort="30"/></joint>
      <joint name="j2" type="prismatic"><parent link="l1"/><child link="l2"/>
        <origin xyz="0.2 0 0"/><axis xyz="0 0 -1"/>
        <limit lower="0" upper="0.3" velocity="1" effort="50"/></joint>
      <joint name="j3" type="continuous"><parent link="l2"/><child link="l3"/>
        <origin xyz="0 0 -0.15"/><axis xyz="0 0 1"/></joint>
    </robot>
    """
    arm = load_urdf(urdf)
    assert arm.joint_types == "rpr"
    rbd = arm.rbd(gravity=9.81)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(0, 0.5, 3), jnp.float32)
    qd = jnp.asarray(rng.normal(0, 0.5, 3), jnp.float32)
    u = jnp.asarray(rng.normal(0, 3.0, 3), jnp.float32)

    _, m_mat = rbd.bias_and_mass(q, qd)
    m_np = np.asarray(m_mat)
    np.testing.assert_allclose(m_np, m_np.T, atol=1e-6)
    assert np.linalg.eigvalsh(m_np).min() > 0

    x = jnp.concatenate([q, qd])
    tau = np.asarray(rbd.inverse_dynamics(q, qd, rbd.forward_dynamics(x, u)))
    np.testing.assert_allclose(tau, np.asarray(u), rtol=1e-4, atol=1e-4)

    with jax.enable_x64():
        rbd0 = arm.rbd(gravity=0.0, dtype=jnp.float64)

        def f(xx):
            return jnp.concatenate(
                [xx[3:], rbd0.forward_dynamics(xx, jnp.zeros(3, jnp.float64))]
            )

        def energy(xx):
            _, m0 = rbd0.bias_and_mass(xx[:3], xx[3:])
            return float(xx[3:] @ (m0 @ xx[3:])) * 0.5

        h = 1e-3
        xx = jnp.asarray(np.concatenate([np.asarray(q), np.asarray(qd)]),
                         jnp.float64)
        e0 = energy(xx)

        def step(s):
            k1 = f(s)
            k2 = f(s + h / 2 * k1)
            k3 = f(s + h / 2 * k2)
            k4 = f(s + h * k3)
            return s + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

        step = jax.jit(step)
        for _ in range(200):
            xx = step(xx)
        assert abs(energy(xx) - e0) / max(e0, 1e-9) < 1e-8


@pytest.mark.slow
def test_urdf_problem_preset_ee():
    """urdf_problem wires the arm + EE cost (URDF limits) into a Problem that
    reaches an EE goal (gravity=0: the reference's MPC-mode convention)."""
    from parallel_ddp_tpu.presets import ee_goal, urdf_problem
    from parallel_ddp_tpu.solver import ilqr_solve

    prob = urdf_problem(ARM3_URDF, ee=True, gravity=0.0, use_limits=True,
                        num_time_steps=16, total_time=0.8, m_blocks=2,
                        num_alpha=8)
    goal_xyz = [0.224, -0.015, 0.8]
    out = ilqr_solve(prob.plant, prob.cost, prob.cfg,
                     jnp.zeros((16, 6)), jnp.zeros((16, 3)),
                     ee_goal(goal_xyz, n_state=6), initial_rollout=True)
    ee = np.asarray(prob.plant.ee_pos(out.x[-1][:3])[:3])
    assert np.linalg.norm(ee - np.asarray(goal_xyz)) < 0.1
    assert float(out.max_defect) < 0.1


@pytest.mark.slow
def test_urdf_plant_solves():
    """The loaded arm runs end-to-end through the block-parallel iLQR stack."""
    from parallel_ddp_tpu.config import SolverConfig
    from parallel_ddp_tpu.costs.joint import joint_cost
    from parallel_ddp_tpu.solver import ilqr_solve

    plant = urdf_plant(ARM3_URDF, gravity=9.81,
                       rho_init_default=5.0, num_alpha_default=4)
    cfg = SolverConfig(
        num_time_steps=16, total_time=0.8, m_blocks_b=2, m_blocks_f=2,
        num_alpha=4, alpha_base=0.5, integrator=3, rho_init=5.0, max_iter=30,
    )
    cost = joint_cost("arm3_joint", cfg.num_time_steps, 3, 3)
    goal = jnp.asarray([0.6, -0.4, 0.8, 0.0, 0.0, 0.0], jnp.float32)
    x0 = jnp.zeros((16, 6), jnp.float32)
    u0 = jnp.zeros((16, 3), jnp.float32)
    out = ilqr_solve(plant, cost, cfg, x0, u0, goal, initial_rollout=True)
    assert bool(jnp.isfinite(out.J))
    assert float(out.max_defect) < 0.1
    qf = np.asarray(out.x[-1][:3])
    assert np.abs(qf - np.asarray(goal[:3])).max() < 0.15, qf


def test_flipped_axis_equivalence():
    """axis = -a describes the same joint with q measured oppositely:
    qdd_a(q, u) == -qdd_{-a}(-q, -u).  Exercises both branches of the
    axis-to-z alignment (generic minimal rotation AND the antiparallel
    pi-rotation special case)."""

    def urdf(axis):
        return f"""
        <robot name="p"><link name="base"/>
          <link name="l1"><inertial><origin xyz="0.3 0 -0.7"/><mass value="1.3"/>
            <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/></inertial></link>
          <joint name="j1" type="continuous"><parent link="base"/><child link="l1"/>
            <origin xyz="0 0 1"/><axis xyz="{axis}"/></joint></robot>"""

    rng = np.random.default_rng(0)
    for ax_pos, ax_neg in (("0 1 0", "0 -1 0"), ("0 0 1", "0 0 -1")):
        rbd_p = load_urdf(urdf(ax_pos)).rbd(gravity=9.81)
        rbd_n = load_urdf(urdf(ax_neg)).rbd(gravity=9.81)
        for _ in range(3):
            x = jnp.asarray(rng.normal(0, 1, 2), jnp.float32)
            u = jnp.asarray(rng.normal(0, 2, 1), jnp.float32)
            qp = float(rbd_p.forward_dynamics(x, u)[0])
            qn = float(rbd_n.forward_dynamics(-x, -u)[0])
            np.testing.assert_allclose(qp, -qn, rtol=1e-5, atol=1e-5)


def test_generic_soa_matches_rbd():
    """The scalar-channel core (SerialArmSoA — the TPU production trace
    structure) matches the spatial-algebra core for generic chains,
    including prismatic joints and a rotated tool frame."""
    rng = np.random.default_rng(0)
    for urdf in (ARM3_URDF, CARTPOLE_URDF):
        arm = load_urdf(urdf)
        n = arm.n
        rbd = arm.rbd(gravity=9.81)
        soa = arm.soa(gravity=9.81)
        for _ in range(4):
            x = jnp.asarray(rng.normal(0, 0.8, 2 * n), jnp.float32)
            u = jnp.asarray(rng.normal(0, 4.0, n), jnp.float32)
            qa = np.asarray(rbd.forward_dynamics(x, u))
            qb = np.asarray(soa.forward_dynamics(x, u))
            scale = 1.0 + np.abs(qa).max()
            assert np.abs(qa - qb).max() / scale < 1e-5
            np.testing.assert_allclose(np.asarray(soa.ee_pose(x[:n])),
                                       np.asarray(rbd.ee_pose(x[:n])),
                                       atol=1e-5)
        # batched without vmap (the SoA contract)
        xs = jnp.asarray(rng.normal(0, 0.5, (16, 2 * n)), jnp.float32)
        us = jnp.asarray(rng.normal(0, 2.0, (16, n)), jnp.float32)
        qb = np.asarray(soa.forward_dynamics(xs, us))
        qa = np.asarray(jax.vmap(rbd.forward_dynamics)(xs, us))
        np.testing.assert_allclose(qb, qa, rtol=1e-4, atol=1e-4)
