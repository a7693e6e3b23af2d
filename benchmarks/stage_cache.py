"""Timestamped cache of the last successful on-chip result per bench stage.

The dev TPU sits behind a tunnel that flaps (r2: down the whole bench window;
r3: stage timeouts; r4: down/up on a minutes scale).  When the driver bench
can't run a stage live, the honest fallback is the last measurement the SAME
stage code produced on the real chip — stamped with when and at which commit
— rather than hand-edited constants (the r2 mechanism this replaces).
bench.py records every successful device-stage result here and attaches
entries for stages it had to skip, clearly labelled `<stage>_cached`.

The file lives in benchmarks/artifacts/ and is committed, so provenance
survives the round boundary.
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile
import time

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "artifacts", "stage_cache.json")


def _git_rev() -> str | None:
    try:
        r = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10)
        return r.stdout.strip() or None
    except Exception:  # noqa: BLE001 — provenance field only
        return None


def load_all() -> dict:
    try:
        with open(PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def get(stage: str) -> dict | None:
    return load_all().get(stage)


def record(stage: str, result: dict, backend: str) -> None:
    """Merge one stage's fresh on-chip result into the cache (atomic write).
    CPU-backend results are refused — a TPU artifact must never inherit a
    CPU number."""
    if backend == "cpu":
        return
    data = load_all()
    # normalize through a JSON round-trip: stage results built in-process can
    # carry int dict keys (e.g. scaling.py's per-B results), which the final
    # sort_keys dump cannot order against str keys
    result = json.loads(json.dumps(result))
    data[stage] = {
        "result": result,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_rev": _git_rev(),
        "backend": backend,
    }
    os.makedirs(os.path.dirname(PATH), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(PATH))
    with os.fdopen(fd, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, PATH)
