"""ctypes binding to the native UDP-multicast pub/sub bus (native/ddprt.cpp).

The reference's communication plane is LCM over UDP multicast with
latest-wins subscriptions (LCMHelpers.cuh); this is the same topology with the
same channel vocabulary.  Default group/port are LCM's defaults, so a
multi-machine setup (solver box <-> robot box) works identically.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
# repo layout (and editable installs) find the lib next to the package; a
# site-packages install points at its build with PDDP_NATIVE_LIB
_LIB_PATH = os.environ.get(
    "PDDP_NATIVE_LIB",
    os.path.abspath(os.path.join(_LIB_DIR, "libddprt.so")),
)


class Channels:
    """Channel names (LCMHelpers.cuh:23-28)."""

    GOAL = "GOAL_CHANNEL"
    TRAJ = "TRAJ_CHANNEL"
    COMMAND = "IIWA_COMMAND"
    STATUS = "IIWA_STATUS"
    STATUS_FILTERED = "IIWA_STATUS_FILTERED"
    COST_PARAMS = "COST_PARAMS_CHANNEL"
    SOLVER_PARAMS = "SOLVER_PARAMS_CHANNEL"


def _load_lib() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _LIB_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ps_create.restype = ctypes.c_void_p
    lib.ps_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.ps_destroy.argtypes = [ctypes.c_void_p]
    lib.ps_subscribe.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ps_publish.restype = ctypes.c_int
    lib.ps_publish.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.ps_poll.restype = ctypes.c_int
    lib.ps_poll.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.tr_create.restype = ctypes.c_void_p
    lib.tr_destroy.argtypes = [ctypes.c_void_p]
    lib.tr_set_traj.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_double, ctypes.c_double,
    ]
    lib.tr_get_control.restype = ctypes.c_int
    lib.tr_get_control.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.ps_now.restype = ctypes.c_double
    return lib


_lib: Optional[ctypes.CDLL] = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load_lib()
    return _lib


class PubSub:
    """Named-channel pub/sub with latest-wins delivery.

    wire="native" publishes the compact native framing; wire="lcm" publishes
    real LCM udpm datagrams (magic LC02/LC03, runtime/lcm_wire.py), making the
    bus a first-class peer of lcm-spy / Drake / the iiwa driver — the
    reference's plane (LCMHelpers.cuh:23-28).  RECEIVING auto-detects both
    framings regardless of this flag, so mixed fleets interoperate.  Default
    group/port are LCM's defaults."""

    def __init__(self, group: str = "239.255.76.67", port: int = 7667,
                 ttl: int = 0, loopback: bool = True, wire: str = "native"):
        if wire not in ("native", "lcm"):
            raise ValueError(f"wire must be 'native' or 'lcm', got {wire!r}")
        self.wire = wire
        self._lib = lib()
        self._h = self._lib.ps_create(group.encode(), port, ttl, int(loopback),
                                      1 if wire == "lcm" else 0)
        if not self._h:
            raise RuntimeError("failed to create multicast pub/sub bus")
        self._seen: dict = {}

    def close(self):
        if self._h:
            self._lib.ps_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def subscribe(self, channel: str):
        self._lib.ps_subscribe(self._h, channel.encode())

    def publish(self, channel: str, payload: bytes):
        rc = self._lib.ps_publish(self._h, channel.encode(), payload, len(payload))
        if rc != 0:
            raise RuntimeError(f"publish to {channel} failed (payload {len(payload)}B)")

    def poll(self, channel: str, max_len: int = 65000) -> Optional[Tuple[bytes, float]]:
        """Latest message on channel or None (never blocks)."""
        buf = ctypes.create_string_buffer(max_len)
        t = ctypes.c_double()
        seq = ctypes.c_uint64()
        n = self._lib.ps_poll(self._h, channel.encode(), buf, max_len,
                              ctypes.byref(t), ctypes.byref(seq))
        if n < 0:
            return None
        return buf.raw[:n], t.value

    def poll_new(self, channel: str, max_len: int = 65000):
        """Latest message only if it is new since the last poll_new call."""
        buf = ctypes.create_string_buffer(max_len)
        t = ctypes.c_double()
        seq = ctypes.c_uint64()
        n = self._lib.ps_poll(self._h, channel.encode(), buf, max_len,
                              ctypes.byref(t), ctypes.byref(seq))
        if n < 0:
            return None
        if self._seen.get(channel) == seq.value:
            return None
        self._seen[channel] = seq.value
        return buf.raw[:n], t.value


class NativeTrajRunner:
    """GIL-free trajectory store + control evaluator (native/ddprt.cpp tr_*)."""

    def __init__(self, n_state: int, n_ctrl: int):
        self._lib = lib()
        self._h = self._lib.tr_create()
        self.n_state = n_state
        self.n_ctrl = n_ctrl

    def __del__(self):
        try:
            if self._h:
                self._lib.tr_destroy(self._h)
        except Exception:
            pass

    def set_traj(self, x: np.ndarray, u: np.ndarray, K: np.ndarray,
                 t0: float, dt: float):
        x = np.ascontiguousarray(x, np.float32)
        u = np.ascontiguousarray(u, np.float32)
        K = np.ascontiguousarray(K, np.float32)
        n = x.shape[0]
        fp = ctypes.POINTER(ctypes.c_float)
        self._lib.tr_set_traj(
            self._h, n, self.n_state, self.n_ctrl,
            x.ctypes.data_as(fp), u.ctypes.data_as(fp), K.ctypes.data_as(fp),
            t0, dt,
        )

    def get_control(self, t: float, x_meas: np.ndarray,
                    use_feedback: bool = True) -> Tuple[np.ndarray, int]:
        """Returns (u, rc): rc 0 ok, 1 past trajectory end, 2 no trajectory."""
        x_meas = np.ascontiguousarray(x_meas, np.float32)
        u_out = np.zeros(self.n_ctrl, np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        rc = self._lib.tr_get_control(
            self._h, t, x_meas.ctypes.data_as(fp), u_out.ctypes.data_as(fp),
            int(use_feedback),
        )
        return u_out, rc
