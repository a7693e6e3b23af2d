"""Pre-trace and pre-compile the bench-stage programs into the caches.

Two caches, two costs removed:
  * the AOT export cache (parallel_ddp_tpu/utils/aot.py) — skips the
    minutes-of-Python per-process TRACE of the big Kuka programs;
  * the persistent XLA executable cache (parallel_ddp_tpu/__init__.py:44) —
    skips the compile (the B=256 batched solver is a ~1 h build through the
    remote compile helper).

This tool simply runs every bench stage (benchmarks/stages.py CANONICAL — the
exact configurations bench.py measures) with no deadline, in ONE process (the
tunnel punishes client churn).  Run it whenever the tunnel is healthy but
BENCH stages time out, and always after the last code change of a round
(any source edit invalidates the AOT entries by design):

    python scripts/warm_compile_cache.py [latency batched ...]

Each argument names a bench stage; default warms everything bench.py runs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import stage_cache  # noqa: E402
from benchmarks.stages import CANONICAL, ORDER  # noqa: E402


def warm(stage: str):
    import jax

    fn = CANONICAL.get(stage)
    if fn is None:
        raise SystemExit(f"unknown stage {stage!r}; known: {ORDER}")
    t0 = time.perf_counter()
    try:
        r = fn()
    except Exception as e:  # noqa: BLE001 — one stage must not kill the rest
        print(f"[warm] {stage}: FAILED after "
              f"{time.perf_counter() - t0:.1f}s: {e!r}"[:500], flush=True)
        return
    wall = time.perf_counter() - t0
    backend = jax.default_backend()
    print(f"[warm] {stage}: ok in {wall:.1f}s (backend={backend})",
          flush=True)
    # a warm run IS a full on-chip measurement of the exact stage code —
    # record it so the stage cache's "freshest" entry is never older than
    # the last warm pass (stage_cache.record refuses CPU backends itself)
    if isinstance(r, dict) and "error" not in r:
        r["_stage_wall_s"] = round(wall, 1)
        try:
            stage_cache.record(stage, r, backend)
        except Exception as e:  # noqa: BLE001 — recording is best-effort
            print(f"[warm] stage-cache record failed for {stage}: {e}",
                  flush=True)


if __name__ == "__main__":
    for s in (sys.argv[1:] or ORDER):
        warm(s)
