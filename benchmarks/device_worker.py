"""Run the bench's device stages sequentially in ONE process — one tunnel
client.

WHY ONE PROCESS.  The dev TPU's tunnel serves one client at a time and was
observed to wedge for ~20 minutes after a heavy client exits; a bench that
spawns a fresh client per stage (rounds 2-4a) therefore loses most stages to
grant churn.  This worker initializes the client once, runs every requested
stage in order, and streams one result line per stage:

    @@STAGE@@ <name> <json>

so the parent (bench.py) collects completed stages incrementally and can
kill a wedged worker without losing what already landed.  Progress/diagnostic
text goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(name: str, payload: dict) -> None:
    print(f"@@STAGE@@ {name} {json.dumps(payload)}", flush=True)


class _Heartbeat:
    """Prints a liveness line to stdout every `period` s while a stage runs,
    so the parent's inactivity watchdog (bench.py run_device_worker) does not
    mistake a cold trace/compile — minutes of silence by nature — for a
    wedged tunnel (r4 lost the fig8 stage exactly this way).  Beats stop
    after `cap` seconds: past the stage's own nominal budget the parent
    SHOULD time the worker out, so a true wedge stays bounded."""

    def __init__(self, name: str, period: float = 45.0, cap: float = 420.0):
        self._stop = threading.Event()
        self._t = threading.Thread(
            target=self._run, args=(name, period, cap), daemon=True)
        self._t.start()

    def _run(self, name, period, cap):
        t0 = time.monotonic()
        while not self._stop.wait(period):
            el = time.monotonic() - t0
            if el > cap:
                return
            print(f"[worker] heartbeat: {name} running {el:.0f}s",
                  flush=True)

    def stop(self):
        self._stop.set()


def main() -> None:
    stages = sys.argv[1:]

    import jax
    import jax.numpy as jnp

    z = jnp.zeros((8, 128), jnp.float32) + 1.0
    backend = jax.default_backend()
    # a cpu backend here means the accelerator plugin failed to initialize
    # and jax fell back — the stages would record CPU numbers in a TPU
    # artifact (and burn their budgets on XLA:CPU compiles)
    ok = float(z.sum()) == 1024.0 and backend != "cpu"
    emit("preflight", {"ok": ok, "backend": backend})
    if not ok:
        return

    from benchmarks.stages import CANONICAL, NOMINAL_S

    for name in stages:
        fn = CANONICAL.get(name)
        if fn is None:
            emit(name, {"error": f"unknown stage {name!r}"})
            continue
        t0 = time.monotonic()
        hb = _Heartbeat(name, cap=0.9 * NOMINAL_S.get(name, 420.0))
        try:
            r = fn()
            r["_stage_wall_s"] = round(time.monotonic() - t0, 1)
            emit(name, r)
        except Exception as e:  # noqa: BLE001 — one stage must not kill the rest
            print(f"[worker] stage {name} failed: {e!r}", file=sys.stderr,
                  flush=True)
            emit(name, {"error": repr(e)[-500:]})
        finally:
            hb.stop()


if __name__ == "__main__":
    main()
