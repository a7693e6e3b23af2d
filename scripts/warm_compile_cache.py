"""Pre-compile the bench-stage programs into the persistent XLA cache.

The driver bench (bench.py) gives each stage a hard subprocess timeout so a
dead tunnel can't eat the whole benchmark budget.  The flip side: a FIRST
compile of the big programs (the B=256 batched solver is a ~10-minute build
even locally, models/kuka/soa.py docstring) can exceed a stage budget and the
stage records nothing.  This tool runs the same program constructions with NO
deadline, so their executables land in jax_compilation_cache_dir
(parallel_ddp_tpu/__init__.py:44) and the next bench invocation loads them in
seconds.  Run it whenever the tunnel is healthy but BENCH stages time out:

    python scripts/warm_compile_cache.py [latency latency_pallas ... ]

Each argument names a bench stage; default warms everything bench.py runs.
"""

import sys
import time

sys.path.insert(0, ".")

STAGES = [
    "latency", "latency_pallas", "latency_priccati",
    "batched", "batched_pallas", "batched_priccati", "batched_bf16",
    "rbd", "fig8", "fig8_priccati",
]


def warm(stage: str):
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    if stage.startswith("latency"):
        from benchmarks.latency import latency_result

        core = "pallas" if "pallas" in stage or "priccati" in stage else "auto"
        latency_result(reps=1, core=core,
                       pallas_riccati="priccati" in stage)
    elif stage.startswith("batched"):
        from benchmarks.scaling import batched_result

        batched_result(batches=(256,), iters=6, reps=1,
                       core="pallas" if "pallas" in stage or "priccati" in stage
                       else "auto",
                       bf16=stage == "batched_bf16",
                       pallas_riccati="priccati" in stage)
    elif stage == "rbd":
        from benchmarks.timedyn import microbench_result

        microbench_result(batch=4096, reps=1, scan=256)
    elif stage.startswith("fig8"):
        from benchmarks.fig8 import device_loop_result

        # duration/settle must match bench.py's stage exactly: the track-phase
        # program shape depends on n_track = duration/control_period, so a
        # short warm run would populate the cache with the WRONG program
        # (ADVICE r3 #4)
        device_loop_result(duration=10.0, reps=1, iters=6,
                           core="pallas" if "priccati" in stage else "auto",
                           pallas_riccati="priccati" in stage)
    else:
        raise SystemExit(f"unknown stage {stage!r}")
    print(f"[warm] {stage}: ok in {time.perf_counter() - t0:.1f}s "
          f"(backend={jax.default_backend()})", flush=True)


if __name__ == "__main__":
    for s in (sys.argv[1:] or STAGES):
        warm(s)
