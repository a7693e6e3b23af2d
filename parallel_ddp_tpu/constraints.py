"""Augmented-Lagrangian constrained DDP — the reference's CONSTRAINTS_ON hook,
implemented.

The reference reserves a constraint switch and never implements it
(`CONSTRAINTS_ON ... not fully implemented yet`, config.cuh:177-179; its cost
family offers only soft quadratic limit PENALTIES, cost_arm.cuh:33-94, which
bound nothing).  Here the standard PHR augmented Lagrangian runs around the
existing solver: inequality constraints c(x, u) <= 0 enter the stage cost as

    phi(c; lam, mu) = lam c + (mu/2) c^2        if  lam + mu c > 0   (active)
                    = -lam^2 / (2 mu)           otherwise            (inactive)

with the multipliers updated between full solves, lam <- max(0, lam + mu c).
The multipliers and penalty weight ride the goal pytree as TRACED leaves, so
the outer loop never recompiles the solver — the same mechanism that makes the
18 cost weights live-tunable (costs/base.py).  Box bounds have constant
+/-identity constraint Jacobians, so the penalty's exact gradient/Hessian
blocks are written directly (diagonal adds) instead of via AD.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from parallel_ddp_tpu.costs.base import CostModel


@dataclasses.dataclass(frozen=True)
class BoxConstraints:
    """Component-wise bounds; None leaves that side unbounded.

    u bounds apply at every non-terminal step (the terminal control is never
    executed); x bounds apply at every step."""

    n_state: int
    n_ctrl: int
    u_min: Optional[np.ndarray] = None
    u_max: Optional[np.ndarray] = None
    x_min: Optional[np.ndarray] = None
    x_max: Optional[np.ndarray] = None

    def __post_init__(self):
        for name, v, d in (("u_min", self.u_min, self.n_ctrl),
                           ("u_max", self.u_max, self.n_ctrl),
                           ("x_min", self.x_min, self.n_state),
                           ("x_max", self.x_max, self.n_state)):
            if v is not None:
                arr = np.asarray(v, np.float32).reshape(d)
                object.__setattr__(self, name, arr)

    @property
    def n_c(self) -> int:
        n = 0
        n += self.n_ctrl if self.u_min is not None else 0
        n += self.n_ctrl if self.u_max is not None else 0
        n += self.n_state if self.x_min is not None else 0
        n += self.n_state if self.x_max is not None else 0
        assert n > 0, "BoxConstraints with no bounds"
        return n

    def residuals(self, x, u, terminal):
        """c (n_c,): positive = violated.  Control rows are masked out at the
        terminal step (never executed, fpHelpers.cuh:235 analog)."""
        cs = []
        u_on = jnp.where(terminal, 0.0, 1.0)
        if self.u_min is not None:
            cs.append((self.u_min - u) * u_on)
        if self.u_max is not None:
            cs.append((u - self.u_max) * u_on)
        if self.x_min is not None:
            cs.append(self.x_min - x)
        if self.x_max is not None:
            cs.append(x - self.x_max)
        return jnp.concatenate(cs)

    def clip_u(self, u):
        """Hard-clip a control to the box — the execution-side guard the
        reference sketches and comments out (`clip`, MPCHelpers.cuh:473-501).
        With the AL keeping the PLAN near-feasible, this is a tiny correction
        rather than a fight with the optimizer."""
        if self.u_min is not None:
            u = jnp.maximum(u, self.u_min)
        if self.u_max is not None:
            u = jnp.minimum(u, self.u_max)
        return u

    def jac_blocks(self):
        """Rows of dc/d[x; u] as (sign, offset) per constraint group, used to
        scatter the penalty grad/Hess into the (n_state+n_ctrl) layout."""
        n, m = self.n_state, self.n_ctrl
        blocks = []
        if self.u_min is not None:
            blocks.append((-1.0, n, m, True))
        if self.u_max is not None:
            blocks.append((+1.0, n, m, True))
        if self.x_min is not None:
            blocks.append((-1.0, 0, n, False))
        if self.x_max is not None:
            blocks.append((+1.0, 0, n, False))
        return blocks


def _phi(c, lam, mu):
    """PHR penalty, elementwise."""
    active = lam + mu * c > 0.0
    return jnp.where(
        active, lam * c + 0.5 * mu * c * c, -(lam * lam) / (2.0 * mu)
    )


def al_cost(base: CostModel, con: BoxConstraints, nf: int) -> CostModel:
    """Wrap a cost model with the AL penalty.  The wrapped goal pytree is
    {"base": <original goal>, "lam": (N, n_c), "mu": scalar} — all traced."""

    def stage(x, u, k, goal, w):
        c = con.residuals(x, u, k == nf)
        return base.stage(x, u, k, goal["base"], w) + jnp.sum(
            _phi(c, goal["lam"][k], goal["mu"])
        )

    def quad(x, u, k, goal, w):
        h, g = base.quad(x, u, k, goal["base"], w)
        lam_k = goal["lam"][k]
        mu = goal["mu"]
        c = con.residuals(x, u, k == nf)
        dphi = jnp.maximum(lam_k + mu * c, 0.0)      # d phi / d c
        active = (dphi > 0.0).astype(x.dtype)
        # box rows: dc/dz = sign * e_i  ->  grad += sign * dphi,
        # Hess += mu * active on the diagonal (exact, not Gauss-Newton)
        u_on = jnp.where(k == nf, 0.0, 1.0)
        off = 0
        for sign, z0, width, is_u in con.jac_blocks():
            seg = slice(off, off + width)
            scale = u_on if is_u else 1.0
            g = g.at[z0:z0 + width].add(sign * dphi[seg] * scale)
            h_diag = mu * active[seg] * scale
            h = h.at[jnp.arange(z0, z0 + width),
                     jnp.arange(z0, z0 + width)].add(h_diag)
            off += width
        return h, g

    return CostModel(name=f"{base.name}_al", stage=stage, quad=quad)


@dataclasses.dataclass(frozen=True)
class ALConfig:
    max_outer: int = 10
    tol_violation: float = 1e-3
    mu_init: float = 10.0
    mu_factor: float = 5.0
    mu_max: float = 1e6
    lam_max: float = 1e6


def solve_al(plant, cost, cfg, x0, u0, goal, con: BoxConstraints,
             al: ALConfig = ALConfig(), weights=None,
             initial_rollout: bool = True):
    """Constrained solve: outer multiplier updates around the jitted inner
    iLQR (one compile total — lam/mu are traced goal leaves).

    Returns (out, info) where out is the final inner SolveOutput and info
    holds per-outer max violations, the multipliers, and the outer count."""
    from parallel_ddp_tpu.solver import make_ilqr_solver

    nf = cfg.num_time_steps - 1
    solver = make_ilqr_solver(plant, al_cost(cost, con, nf), cfg)

    # numpy, NOT jnp: an eagerly-created jnp.arange closed over by the jit
    # below is a captured device constant — the pathological tunnel-dispatch
    # pattern (tests/test_no_device_constants.py)
    ks = np.arange(cfg.num_time_steps)

    @jax.jit
    def traj_residuals(x, u):
        return jax.vmap(lambda xk, uk, k: con.residuals(xk, uk, k == nf))(
            x, u, ks
        )

    lam = jnp.zeros((cfg.num_time_steps, con.n_c), jnp.float32)
    mu = jnp.asarray(al.mu_init, jnp.float32)
    x_cur, u_cur = x0, u0
    viols = []
    out = None
    rollout = initial_rollout
    warm = {}
    for _ in range(al.max_outer):
        wrapped = {"base": goal, "lam": lam, "mu": mu}
        out = solver(x_cur, u_cur, wrapped, weights,
                     initial_rollout=rollout, **warm)
        c = traj_residuals(out.x, out.u)
        viol = float(jnp.max(jnp.maximum(c, 0.0)))
        viols.append(viol)
        if viol < al.tol_violation:
            break
        lam = jnp.clip(jnp.maximum(lam + mu * c, 0.0), 0.0, al.lam_max)
        mu = jnp.minimum(mu * al.mu_factor, al.mu_max)
        # warm start the next outer solve from this one's FULL solver state —
        # x/u alone would silently zero the multiple-shooting defects and the
        # CTG seeds (the driver threads P0/p0/d0 through for the same reason,
        # mpc/driver.py)
        x_cur, u_cur = out.x, out.u
        warm = {"P0": out.P, "p0": out.p, "d0": out.d}
        rollout = False
    # out.J includes the AL penalty terms; report the BASE cost of the final
    # trajectory separately (that is the number comparable to an
    # unconstrained solve)
    base_J = float(jnp.sum(jax.vmap(
        lambda xk, uk, k: cost.stage(xk, uk, k, goal,
                                     weights if weights is not None
                                     else _default_weights())
    )(out.x, out.u, ks)))
    info = {"violations": viols, "lam": lam, "mu": float(mu),
            "outer_iters": len(viols), "base_J": base_J}
    return out, info


def _default_weights():
    from parallel_ddp_tpu.config import CostWeights

    return CostWeights()


class ALMPCController:
    """Real-time constrained MPC: the warm-started MPC driver with hard box
    bounds enforced by a persistent augmented Lagrangian.

    Standard real-time AL practice: ONE multiplier update per control period
    (the solver is warm, so the (x, u, lam) triple co-converges across
    periods), multipliers time-shifted with the rest of the warm-start state
    (shiftAndCopy semantics, MPCHelpers.cuh:425-471), penalty weight mu held
    fixed.  Wraps mpc.driver.MPCController rather than modifying it: lam/mu
    ride the goal pytree exactly like the offline solve_al, so the driver,
    its state layout, and its compiled step are untouched."""

    def __init__(self, plant, cost, cfg, mpc_cfg, con: BoxConstraints,
                 mu: float = 50.0, lam_max: float = 1e6):
        from parallel_ddp_tpu.mpc.driver import MPCController

        nf = cfg.num_time_steps - 1
        self.con = con
        self.cfg = cfg
        self.mu = jnp.asarray(mu, jnp.float32)
        self.lam_max = lam_max
        self.ctrl = MPCController(plant, al_cost(cost, con, nf), cfg, mpc_cfg)
        # numpy: a jnp.arange here would be a jit-captured device constant in
        # the per-period update (the ~25 ms sticky slow-dispatch path)
        ks = np.arange(cfg.num_time_steps)
        n_steps = cfg.num_time_steps
        dt = cfg.dt
        max_shift = mpc_cfg.max_shift_steps

        @jax.jit
        def shift_lam(lam, st_t0, t_now):
            # the driver's own warm-start shift (mpc/driver.py _mpc_step:
            # s = clip(floor((t_now - t0)/dt), 0, N-1), optional clamp) so the
            # multipliers stay aligned with the shifted trajectory the solve
            # actually sees
            s = jnp.clip(
                jnp.floor((t_now - st_t0) / dt).astype(jnp.int32),
                0, n_steps - 1,
            )
            if max_shift is not None:
                s = jnp.minimum(s, max_shift)
            idx = jnp.minimum(jnp.arange(n_steps) + s, n_steps - 1)
            return jnp.take(lam, idx, axis=0)

        @jax.jit
        def update_lam(lam, x, u, mu_):
            c = jax.vmap(lambda xk, uk, k: con.residuals(xk, uk, k == nf))(
                x, u, ks
            )
            return jnp.clip(jnp.maximum(lam + mu_ * c, 0.0), 0.0, lam_max)

        self._shift_lam = shift_lam
        self._update_lam = update_lam

    def zero_lam(self):
        return jnp.zeros((self.cfg.num_time_steps, self.con.n_c), jnp.float32)

    def wrap_goal(self, goal, lam, mu=None):
        return {"base": goal, "lam": lam,
                "mu": self.mu if mu is None else mu}

    def init_state(self, x_actual, t0=0.0, goal=None, weights=None,
                   lam=None, **kw):
        lam = self.zero_lam() if lam is None else lam
        st = self.ctrl.init_state(x_actual, t0=t0,
                                  goal=self.wrap_goal(goal, lam),
                                  weights=weights, **kw)
        return st, lam

    def step(self, st, lam, x_actual, t_now, goal, weights=None, **kw):
        """One constrained MPC period: shift multipliers with the horizon,
        budgeted solve, one PHR multiplier update from the new plan.

        Returns (state, lam, info)."""
        lam_s = self._shift_lam(lam, st.t0, jnp.asarray(t_now, jnp.float32))
        st2, info = self.ctrl.step(st, x_actual, t_now,
                                   self.wrap_goal(goal, lam_s), weights, **kw)
        lam2 = self._update_lam(lam_s, st2.x, st2.u, self.mu)
        return st2, lam2, info
