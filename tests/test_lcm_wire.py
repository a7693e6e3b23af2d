"""LCM wire-format interop (runtime/lcm_wire.py).

Three layers of evidence that the bytes are real LCM:
  1. type fingerprints: every base hash must equal the constant lcm-gen
     emitted into the reference's generated headers (the reference repo ships
     them, e.g. /root/reference/lcmtypes/drake/lcmt_iiwa_status.hpp:250) —
     the fingerprint is what a generated-binding peer checks first;
  2. hand-packed golden bytes for full messages (big-endian fields in
     declaration order after the 8-byte fingerprint);
  3. datagram framing goldens (LC02 short header) + LC03 fragmentation
     round-trip, the exact udpm layout lcm-spy parses.
"""

import struct

import numpy as np
import pytest

from parallel_ddp_tpu.config import CostWeights
from parallel_ddp_tpu.runtime import lcm_wire as lw
from parallel_ddp_tpu.runtime.messages import (
    Command,
    CommandHardware,
    ControllerReference,
    CostParams,
    Goal,
    SolverParams,
    Status,
    Trajectory,
)

# constants from the reference's generated headers (lcm-gen output):
# lcmtypes/{drake,kuka}/lcmt_*.hpp, the `uint64_t hash = 0x...LL` line of each
# _computeHash
GOLDEN_BASE_HASHES = {
    "drake.lcmt_iiwa_command": 0x6EE3E3B9C640A99A,
    "drake.lcmt_iiwa_command_hardware": 0x824CF99DC1A2D574,
    "drake.lcmt_iiwa_status": 0xF8B7DC0214255E51,
    "drake.lcmt_trajectory_d": 0x709C790D6CD0610A,
    "drake.lcmt_trajectory_f": 0x8FB839BD5C6031EE,
    "kuka.lcmt_cost_params": 0xA680EC9F586F2671,
    "kuka.lcmt_robot_controller_reference": 0x29AFDE258CE9263B,
    "kuka.lcmt_solver_params": 0xD006B8FACF346777,
    "kuka.lcmt_target_position": 0x254D6DFCE88BC9E2,
    "kuka.lcmt_target_twist": 0x14ACB148BC06ACE6,
}


def test_all_fingerprints_match_lcm_gen():
    ours = {t.full_name: t.base_hash for t in lw.ALL_TYPES}
    assert ours == GOLDEN_BASE_HASHES
    # registered fingerprint = base rotated left by one (no nested structs)
    for t in lw.ALL_TYPES:
        b = t.base_hash
        assert t.fingerprint == (((b << 1) & ((1 << 64) - 1)) | (b >> 63))


def test_target_position_golden_bytes():
    """Hand-packed kuka.lcmt_target_position: fingerprint, int64 utime,
    float position[7], float velocity[7], all big-endian."""
    q = np.arange(1, 8, dtype=np.float32)
    qd = np.arange(8, 15, dtype=np.float32)
    buf = lw.TARGET_POSITION.encode(dict(utime=123456789, position=q,
                                         velocity=qd))
    base = GOLDEN_BASE_HASHES["kuka.lcmt_target_position"]
    fp = ((base << 1) & ((1 << 64) - 1)) | (base >> 63)
    golden = struct.pack(">Qq", fp, 123456789)
    golden += struct.pack(">7f", *q) + struct.pack(">7f", *qd)
    assert buf == golden


def test_solver_params_golden_bytes():
    buf = lw.solver_params_to_lcm(SolverParams(6, 10.0, True, 2))
    base = GOLDEN_BASE_HASHES["kuka.lcmt_solver_params"]
    fp = ((base << 1) & ((1 << 64) - 1)) | (base >> 63)
    golden = struct.pack(">Qqiiii", fp, 0, 6, 10, 1, 2)
    assert buf == golden


def test_iiwa_status_golden_layout():
    """Variable-dim golden: num_joints then 7 double arrays of that length."""
    s = Status(1.5, np.ones(7, np.float32), 2 * np.ones(7, np.float32),
               3 * np.ones(7, np.float32))
    buf = lw.status_to_lcm(s)
    base = GOLDEN_BASE_HASHES["drake.lcmt_iiwa_status"]
    fp = ((base << 1) & ((1 << 64) - 1)) | (base >> 63)
    golden = struct.pack(">Qqi", fp, 1_500_000, 7)
    golden += struct.pack(">7d", *([1.0] * 7))   # position_measured
    golden += struct.pack(">7d", *([2.0] * 7))   # velocity_estimated
    golden += struct.pack(">7d", *([0.0] * 7))   # position_commanded
    golden += struct.pack(">7d", *([0.0] * 7))   # position_ipo
    golden += struct.pack(">7d", *([3.0] * 7))   # torque_measured
    golden += struct.pack(">7d", *([0.0] * 7)) * 2  # commanded, external
    assert buf == golden


def test_wrong_fingerprint_rejected():
    s = Status(0.0, np.zeros(7, np.float32), np.zeros(7, np.float32))
    buf = lw.status_to_lcm(s)
    with pytest.raises(ValueError):
        lw.IIWA_COMMAND.decode(buf)


@pytest.mark.parametrize("msg,enc,dec", [
    (Status(2.25, np.arange(7, dtype=np.float32),
            -np.arange(7, dtype=np.float32), np.ones(7, np.float32)),
     lw.status_to_lcm, lw.status_from_lcm),
    (Command(1.0, np.arange(7, dtype=np.float32),
             np.ones(7, np.float32)),
     lw.command_to_lcm, lw.command_from_lcm),
    (CommandHardware(1.0, np.ones(7, np.float32),
                     np.arange(7, dtype=np.float32),
                     np.arange(6, dtype=np.float32)),
     lw.command_hardware_to_lcm, lw.command_hardware_from_lcm),
    (SolverParams(9, 25.0, False, 1),
     lw.solver_params_to_lcm, lw.solver_params_from_lcm),
    (ControllerReference(0.5, np.ones(7, np.float32),
                         2 * np.ones(7, np.float32),
                         3 * np.ones(7, np.float32),
                         4 * np.ones(7, np.float32)),
     lw.controller_reference_to_lcm, lw.controller_reference_from_lcm),
])
def test_roundtrip(msg, enc, dec):
    out = dec(enc(msg))
    for f, v in vars(msg).items():
        got = getattr(out, f)
        if isinstance(v, np.ndarray):
            np.testing.assert_allclose(got, v, rtol=1e-6)
        else:
            assert got == pytest.approx(v, rel=1e-6), f


def test_cost_params_roundtrip():
    w = CostWeights(q1=1.0, q2=2.0, r=3.0, qf1=4.0, qf2=5.0, q_ee1=6.0,
                    q_ee2=7.0, qf_ee1=8.0, qf_ee2=9.0, q_eev1=10.0,
                    q_eev2=11.0, qf_eev1=12.0, qf_eev2=13.0, r_ee=14.0,
                    q_xdee=15.0, qf_xdee=16.0, q_xee=17.0, qf_xee=18.0)
    out = lw.cost_params_from_lcm(lw.cost_params_to_lcm(CostParams(w)))
    # the 18 wire fields round-trip; the 3 limit weights keep defaults
    d = CostWeights()
    for name in w._fields:
        want = getattr(d if name in ("q_pl", "q_vl", "r_tl") else w, name)
        assert getattr(out.weights, name) == pytest.approx(want), name


def test_goal_joint_and_twist():
    g = Goal(Goal.MODE_JOINT, np.arange(14, dtype=np.float32))
    out = lw.goal_from_lcm(lw.goal_to_lcm(g))
    assert out.mode == Goal.MODE_JOINT
    np.testing.assert_allclose(out.value, g.value)

    g2 = Goal(Goal.MODE_EE_TWIST, np.asarray([1, 2, 3, 4, 5, 6], np.float32))
    out2 = lw.goal_from_lcm(lw.goal_to_lcm(g2))
    assert out2.mode == Goal.MODE_EE_TWIST
    np.testing.assert_allclose(out2.value, g2.value)

    # EE-pose mode rides the twist layout (the reference has one EE goal
    # message and copies velocity into the rpy slots, LCMHelpers.cuh:195-197)
    g3 = Goal(Goal.MODE_EE_POSE, np.asarray([1, 2, 3, 0.1, 0.2, 0.3],
                                            np.float32))
    out3 = lw.goal_from_lcm(lw.goal_to_lcm(g3))
    assert out3.mode == Goal.MODE_EE_TWIST
    np.testing.assert_allclose(out3.value, g3.value, rtol=1e-6)


@pytest.mark.parametrize("byte_sizes", [True, False])
def test_trajectory_roundtrip(byte_sizes):
    rng = np.random.default_rng(0)
    n, nx, nu = 16, 14, 7
    t = Trajectory(1.25, 0.01,
                   rng.normal(size=(n, nx)).astype(np.float32),
                   rng.normal(size=(n, nu)).astype(np.float32),
                   rng.normal(size=(n, nu, nx)).astype(np.float32))
    buf = lw.trajectory_to_lcm(t, byte_sizes=byte_sizes)
    v = lw.TRAJECTORY_F.decode(buf)
    pad = 4 if byte_sizes else 1  # the reference's byte-count quirk
    assert v["u_size"] == n * nu * pad
    out = lw.trajectory_from_lcm(buf, nx, nu, t.dt,
                                 n=n if byte_sizes else None)
    assert out.t0 == pytest.approx(t.t0)
    np.testing.assert_allclose(out.x, t.x, rtol=1e-6)
    np.testing.assert_allclose(out.u, t.u, rtol=1e-6)
    np.testing.assert_allclose(out.K, t.K, rtol=1e-6)


def test_is_lcm_detection():
    s = Status(0.0, np.zeros(7, np.float32), np.zeros(7, np.float32))
    assert lw.is_lcm(lw.status_to_lcm(s)) is lw.IIWA_STATUS
    assert lw.is_lcm(s.pack()) is None  # native format


def test_frame_short_golden():
    pkt = lw.frame_short(7, "IIWA_STATUS", b"\xAA\xBB")
    assert pkt == struct.pack(">II", 0x4C433032, 7) + b"IIWA_STATUS\0\xaa\xbb"


def test_frame_fragmentation_roundtrip():
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    frags = lw.frame_datagrams(42, "TRAJ_CHANNEL", payload)
    assert len(frags) > 1
    assert all(len(f) <= lw.MAX_DATAGRAM for f in frags)
    # fragment headers carry the LC03 magic
    for f in frags:
        assert struct.unpack_from(">I", f)[0] == lw.MAGIC_LONG
    reasm = {}
    done = None
    for f in frags:
        done = lw.parse_datagram(f, reasm) or done
    assert done == ("TRAJ_CHANNEL", payload)

    # small payloads stay short
    [one] = lw.frame_datagrams(1, "GOAL_CHANNEL", b"xyz")
    assert lw.parse_datagram(one, {}) == ("GOAL_CHANNEL", b"xyz")
