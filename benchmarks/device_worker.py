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
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(name: str, payload: dict) -> None:
    print(f"@@STAGE@@ {name} {json.dumps(payload)}", flush=True)


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

    from benchmarks.stages import CANONICAL

    for name in stages:
        fn = CANONICAL.get(name)
        if fn is None:
            emit(name, {"error": f"unknown stage {name!r}"})
            continue
        t0 = time.monotonic()
        try:
            r = fn()
            r["_stage_wall_s"] = round(time.monotonic() - t0, 1)
            emit(name, r)
        except Exception as e:  # noqa: BLE001 — one stage must not kill the rest
            print(f"[worker] stage {name} failed: {e!r}", file=sys.stderr,
                  flush=True)
            emit(name, {"error": repr(e)[-500:]})


if __name__ == "__main__":
    main()
