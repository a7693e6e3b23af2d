"""Kuka iiwa-14 rigid-body dynamics in spatial algebra (JAX).

Replaces the reference's 2.3 kLoC hand-parallelized "Joint Space Inversion
Algorithm" (dynamics_arm.cuh:71-2289): mass matrix via the Composite Rigid Body
Algorithm, bias torques via RNEA with the gravity-as-base-acceleration trick
(the reference's `+GRAVITY` on the z linear acceleration, dynamics_arm.cuh:1362),
qdd = M^{-1} (tau - C).  The analytic gradient d qdd / d (x, u) is `jax.jacfwd`
through this function — traced once and fused by XLA, mathematically identical
to the reference's hand-derived dM/dTwist/dJdotV/dWb/dTau chains
(dynamics_arm.cuh:2165-2289).

Spatial vector convention: motion [omega; v], force [n; f], all quantities in
link-local frames; revolute joints about local z (S = e3 in the angular slot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from parallel_ddp_tpu.models.kuka import params as kp

N_JOINTS = 7


def _skew(v):
    return jnp.array(
        [
            [0.0, -v[2], v[1]],
            [v[2], 0.0, -v[0]],
            [-v[1], v[0], 0.0],
        ]
    )


def _rot_z(q):
    c, s = jnp.cos(q), jnp.sin(q)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _joint_rots(q):
    c, s = jnp.cos(q), jnp.sin(q)
    z = jnp.zeros_like(q)
    o = jnp.ones_like(q)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )  # (7, 3, 3)


def _xform_motion(r_cl, p_cl, w, v):
    """Motion vector from parent to child frame.

    Child frame pose in parent: rotation r_cl (child axes in parent), origin p_cl.
    omega_c = R^T omega_p;  v_c = R^T (v_p + omega_p x p)."""
    w_c = r_cl.T @ w
    v_c = r_cl.T @ (v + jnp.cross(w, p_cl))
    return w_c, v_c


def _xform_force_to_parent(r_cl, p_cl, n, f):
    """Force vector from child to parent frame (dual of _xform_motion)."""
    f_p = r_cl @ f
    n_p = r_cl @ n + jnp.cross(p_cl, f_p)
    return n_p, f_p


class SerialArmRBD:
    """Spatial-algebra RBD for ANY serial chain of revolute and/or prismatic
    joints acting about/along local z.

    Constants are (n,3,3) fixed parent->child rotations, (n,3) joint origins,
    (n,6,6) spatial inertias at the link frames, and a (3,) end-effector offset
    in the last link frame — exactly the quantities a URDF provides (see
    models/urdf.py, the reference README's roadmap item README.md:41).
    joint_types: string of 'r' (revolute, S = e3 angular) / 'p' (prismatic,
    S = e3 linear); default all-revolute.
    """

    def __init__(self, r_tree, p_tree, i_spatial, ee_offset, gravity,
                 dtype=jnp.float32, ee_rot=None, joint_types=None):
        # numpy, not device arrays: these constants are captured by jitted
        # closures, and captured device arrays hit the axon TPU tunnel's slow
        # dispatch path (see config.py alphas docstring)
        np_dtype = np.dtype(dtype)
        self.r_tree = np.asarray(r_tree, np_dtype)
        self.p_tree = np.asarray(p_tree, np_dtype)
        self.i_spatial = np.asarray(i_spatial, np_dtype)
        self.ee_offset = np.asarray(ee_offset, np_dtype)
        # tip-frame orientation in the last link frame (URDF tool frames)
        self.ee_rot = (np.eye(3, dtype=np_dtype) if ee_rot is None
                       else np.asarray(ee_rot, np_dtype))
        self.gravity = gravity
        self.dtype = dtype
        self.n = int(self.r_tree.shape[0])
        self.joint_types = joint_types or "r" * self.n
        assert len(self.joint_types) == self.n and set(self.joint_types) <= {
            "r", "p"
        }, self.joint_types

    # ---------- kinematics ----------

    def link_frames(self, q):
        """World pose of each link frame: (R (n,3,3), p (n,3))."""
        rz = _joint_rots(q)
        rs, ps = [], []
        r_w = jnp.eye(3, dtype=q.dtype)
        p_w = jnp.zeros(3, dtype=q.dtype)
        e3 = jnp.array([0.0, 0.0, 1.0], q.dtype)
        for i in range(self.n):
            if self.joint_types[i] == "r":
                # joint rotation about child z
                r_l = self.r_tree[i] @ rz[i]
                p_w = p_w + r_w @ self.p_tree[i]
            else:
                # prismatic: translate along child z, rotation fixed
                r_l = self.r_tree[i]
                p_w = p_w + r_w @ (self.p_tree[i] + self.r_tree[i] @ (e3 * q[i]))
            r_w = r_w @ r_l
            rs.append(r_w)
            ps.append(p_w)
        return jnp.stack(rs), jnp.stack(ps)

    def ee_pose(self, q):
        """(6,) end-effector [xyz, rpy]; rpy extracted like the reference
        (atan2(R21,R22), atan2(-R20, sqrt(R21^2+R22^2)), atan2(R10,R00)),
        dynamics_arm.cuh:1890-1895."""
        rs, ps = self.link_frames(q)
        pos = ps[-1] + rs[-1] @ self.ee_offset
        r = rs[-1] @ self.ee_rot
        roll = jnp.arctan2(r[2, 1], r[2, 2])
        pitch = jnp.arctan2(-r[2, 0], jnp.sqrt(r[2, 1] ** 2 + r[2, 2] ** 2))
        yaw = jnp.arctan2(r[1, 0], r[0, 0])
        return jnp.concatenate([pos, jnp.stack([roll, pitch, yaw])])

    def ee_velocity(self, x):
        """(6,) EE [linear velocity; rpy rates] = d(ee_pose)/dt (exact — the
        reference's rpy rates are broken, README.md:38)."""
        q, qd = x[: self.n], x[self.n :]
        return jax.jvp(self.ee_pose, (q,), (qd,))[1]

    # ---------- dynamics ----------

    def _local_xforms(self, q):
        """Per-joint (r_cl (n,3,3), p_cl (n,3)): child link frame pose in the
        parent frame.  Revolute: rotation about child z.  Prismatic: fixed
        rotation, origin translated along child z by q."""
        rz = _joint_rots(q)
        if "p" not in self.joint_types:
            r_cl = jnp.einsum("kij,kjl->kil", self.r_tree, rz)
            return r_cl, self.p_tree
        e3 = jnp.array([0.0, 0.0, 1.0], q.dtype)
        r_rows, p_rows = [], []
        for i in range(self.n):
            if self.joint_types[i] == "r":
                r_rows.append(self.r_tree[i] @ rz[i])
                p_rows.append(jnp.asarray(self.p_tree[i]))
            else:
                r_rows.append(jnp.asarray(self.r_tree[i]))
                p_rows.append(self.p_tree[i] + self.r_tree[i] @ (e3 * q[i]))
        return jnp.stack(r_rows), jnp.stack(p_rows)

    def bias_and_mass(self, q, qd):
        """(C (7,), M (7,7)): RNEA bias (Coriolis + gravity) and CRBA mass matrix."""
        dtype = q.dtype
        r_cl, p_cl = self._local_xforms(q)

        # --- forward sweep: velocities and bias accelerations ---
        ws, vs, dws, dvs = [], [], [], []
        w = jnp.zeros(3, dtype)
        v = jnp.zeros(3, dtype)
        dw = jnp.zeros(3, dtype)
        dv = jnp.array([0.0, 0.0, self.gravity], dtype)  # -g base acceleration trick
        e3 = jnp.array([0.0, 0.0, 1.0], dtype)
        for i in range(self.n):
            w, v = _xform_motion(r_cl[i], p_cl[i], w, v)
            dw, dv = _xform_motion(r_cl[i], p_cl[i], dw, dv)
            # velocity-product acceleration crm(v_i) @ (S qd_i)  (qdd = 0)
            sqd = e3 * qd[i]
            if self.joint_types[i] == "r":
                # S angular: [w;v] x* [sqd;0] = [w x sqd; v x sqd]
                dw = dw + jnp.cross(w, sqd)
                dv = dv + jnp.cross(v, sqd)
                w = w + sqd
            else:
                # S linear: [w;v] x* [0;sqd] = [0; w x sqd]
                dv = dv + jnp.cross(w, sqd)
                v = v + sqd
            ws.append(w)
            vs.append(v)
            dws.append(dw)
            dvs.append(dv)

        # --- per-link bias forces: f = I a + v x* (I v) ---
        fs = []
        for i in range(self.n):
            ii = self.i_spatial[i]
            mv = jnp.concatenate([ws[i], vs[i]])
            ma = jnp.concatenate([dws[i], dvs[i]])
            iv = ii @ mv
            fa = ii @ ma
            # spatial force cross product v x* f: n' = w x n + v x f ; f' = w x f
            n_c = jnp.cross(ws[i], iv[:3]) + jnp.cross(vs[i], iv[3:])
            f_c = jnp.cross(ws[i], iv[3:])
            fs.append(fa + jnp.concatenate([n_c, f_c]))

        # --- backward sweep: bias torques ---
        c_out = [None] * self.n
        n_acc = jnp.zeros(3, dtype)
        f_acc = jnp.zeros(3, dtype)
        for i in reversed(range(self.n)):
            n_tot = fs[i][:3] + n_acc
            f_tot = fs[i][3:] + f_acc
            # S^T f: angular z (revolute) or linear z (prismatic)
            c_out[i] = n_tot[2] if self.joint_types[i] == "r" else f_tot[2]
            n_acc, f_acc = _xform_force_to_parent(r_cl[i], p_cl[i], n_tot, f_tot)
        c_vec = jnp.stack(c_out)

        # --- CRBA: composite inertias then M ---
        ic = [self.i_spatial[i] for i in range(self.n)]
        for i in reversed(range(1, self.n)):
            # transform Ic_i into parent frame: X^F Ic X^M
            r, p = r_cl[i], p_cl[i]
            px = _skew(p)
            # motion transform child<-parent as 6x6: [[R^T, R^T px^T...]] — build
            # the parent<-child force/motion pair explicitly
            xm = jnp.block([[r.T, jnp.zeros((3, 3), dtype)], [-r.T @ px, r.T]])
            # parent inertia contribution = X_motion^T Ic X_motion
            ic[i - 1] = ic[i - 1] + xm.T @ ic[i] @ xm

        m_rows = []
        # S_i in own frame (e3 angular or linear); propagate F = Ic_i S_i
        # down to ancestors, projecting on each ancestor's own S_j
        for i in range(self.n):
            col = 2 if self.joint_types[i] == "r" else 5
            f6 = ic[i][:, col]  # Ic_i @ S_i
            m_i = [jnp.zeros((), dtype)] * self.n
            m_i[i] = f6[col]
            n_f, f_f = f6[:3], f6[3:]
            for j in reversed(range(i)):
                n_f, f_f = _xform_force_to_parent(r_cl[j + 1], p_cl[j + 1], n_f, f_f)
                m_i[j] = n_f[2] if self.joint_types[j] == "r" else f_f[2]
            m_rows.append(jnp.stack(m_i))
        m_low = jnp.stack(m_rows)  # row i holds M[i, j] for j <= i
        m_mat = jnp.tril(m_low) + jnp.tril(m_low, -1).T
        return c_vec, m_mat

    def forward_dynamics(self, x, u):
        """qdd = M^{-1} (u - C) (dynamics_arm.cuh:2095-2163)."""
        q, qd = x[: self.n], x[self.n :]
        c_vec, m_mat = self.bias_and_mass(q, qd)
        chol = jnp.linalg.cholesky(m_mat)
        return jax.scipy.linalg.cho_solve((chol, True), u - c_vec)

    def inverse_dynamics(self, q, qd, qdd):
        """tau = M qdd + C (for testing)."""
        c_vec, m_mat = self.bias_and_mass(q, qd)
        return m_mat @ qdd + c_vec


class KukaRBD(SerialArmRBD):
    """SerialArmRBD bound to the iiwa-14 constants (params.build_constants)."""

    def __init__(self, ee_type: int = 1, gravity: float = 9.81, dtype=jnp.float32):
        r_tree, p_tree, i_sp, ee_off, grav = kp.build_constants(ee_type, gravity)
        super().__init__(r_tree, p_tree, i_sp, ee_off, grav, dtype=dtype)
