"""Trajectory / solver-state checkpointing.

The reference has no file checkpointing; its persistence analog is the
warm-start state (x, u, KT, P, p, d) kept device-resident across MPC solves
and the serialized `lcmt_trajectory` messages exchanged between processes
(SURVEY.md §5 checkpoint/resume).  This module adds the file form: save/load
an MPCState or SolveOutput as a single .npz so a controller can resume a
warm-started loop across process restarts (and so experiments are
reproducible artifacts).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from parallel_ddp_tpu.mpc.driver import MPCState

_MPC_FIELDS = ("x", "u", "K", "P", "p", "d", "t0", "fails")


def save_mpc_state(path: str, st: MPCState) -> None:
    np.savez_compressed(
        path, **{f: np.asarray(getattr(st, f)) for f in _MPC_FIELDS}
    )


def load_mpc_state(path: str) -> MPCState:
    data = np.load(path)
    return MPCState(
        x=jnp.asarray(data["x"]), u=jnp.asarray(data["u"]),
        K=jnp.asarray(data["K"]), P=jnp.asarray(data["P"]),
        p=jnp.asarray(data["p"]), d=jnp.asarray(data["d"]),
        t0=jnp.asarray(data["t0"]), fails=jnp.asarray(data["fails"]),
    )


def save_solution(path: str, out) -> None:
    """Persist a SolveOutput (x, u, K and traces) as .npz."""
    np.savez_compressed(
        path,
        x=np.asarray(out.x), u=np.asarray(out.u), K=np.asarray(out.K),
        P=np.asarray(out.P), p=np.asarray(out.p), d=np.asarray(out.d),
        J=np.asarray(out.J), J_trace=np.asarray(out.J_trace),
        alpha_trace=np.asarray(out.alpha_trace),
    )


def load_warm_start(path: str):
    """Load (x, u, K, P, p, d) suitable for warm-starting a solve."""
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in ("x", "u", "K", "P", "p", "d")}
