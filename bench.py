"""Driver benchmark: ONE JSON line with the framework's headline metrics.

  1. latency      — warm-started Kuka N=64 EE solve rate (vs the reference's
                    ~97 Hz MPC replan rate, test/WAFR_fig8.py:7);
  2. batched      — scenario-batched solves/s per chip (BASELINE.json's own
                    scale-out metric; benchmarks/scaling.py);
  3. rbd          — Pallas-vs-XLA RBD hot-path ns/eval at the kernels' design
                    batch (benchmarks/timedyn.py);
  4. fig8         — closed-loop figure-8 avg EE tracking error from the fused
                    device loop (vs 0.0878 m, test/WAFR_fig8.py:5-6).

Primary metric stays the round-1 headline (latency solves/s) for cross-round
comparability; the rest land in "extra" (VERDICT r1 items 3/4/weak-6).

ROBUSTNESS (why this file is mostly plumbing).  Rounds 2-4a each lost part or
all of their artifact to the environment: r2 a dead device tunnel, r3 stage
timeouts stacking past the driver's kill deadline, r4a per-stage subprocesses
re-TRACING the minutes-long Kuka programs (executable caching can't skip
Python tracing) plus a tunnel that wedges ~20 min after a heavy client exits.
The invariants now:

  * GLOBAL DEADLINE.  bench.py finishes — including printing the final JSON
    line — within PDDP_BENCH_BUDGET seconds (default 840) no matter what the
    tunnel does.
  * ONE DEVICE CLIENT.  All device stages run inside a single worker process
    (benchmarks/device_worker.py) that streams one result line per stage; the
    parent enforces per-stage inactivity deadlines and kills a wedged worker
    without losing the stages that already landed.  (The tunnel serves one
    client at a time and punishes client churn.)
  * NO PER-PROCESS RE-TRACING.  The worker's stage programs load from the AOT
    export cache (parallel_ddp_tpu/utils/aot.py) + the persistent executable
    cache, both pre-populated by scripts/warm_compile_cache.py.
  * WARM FIRST, then BREADTH FIRST.  Stages whose AOT exports are valid run
    before any cold stage (a cold stage's multi-minute trace+compile must
    never starve already-cached programs); within each group
    benchmarks/stages.py ORDER lands one number per metric family before any
    family's kernel-path variants, and the first latency-family stage is
    pinned to the head of the cold group so the headline lands earliest.
  * The convergence stage is a CPU-backend numerics metric — it runs
    CONCURRENTLY in its own process (it never touches the tunnel).
  * HONEST FALLBACK.  A stage that could not run live gets the last on-chip
    result of the same stage code attached, stamped utc + git rev
    (benchmarks/stage_cache.py) — never presented as a live number.

MEASUREMENT INTEGRITY (see stage code): each stage forces one result read
(flips the process into synchronous dispatch where timings mean true remote
completion), measures the tunnel RTT with a trivial kernel, and subtracts it.
Both the latency and batched stages chain K data-dependent solves inside ONE
program so the RTT (and its jitter) amortizes over K (resp. K*B) solves —
timing a single ~1.6 ms solve behind a ~25 ms tunnel RTT is jitter-dominated
(r4's 0.544 ms "headline" was that protocol's luck; the chained protocol,
r5, is reproducible).  A residual-vs-jitter guard refuses to record when the
tunnel is too loaded to resolve the chain (benchmarks/latency.py).
"""

import json
import os
import queue
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchmarks import stage_cache
from benchmarks.stages import NOMINAL_S, ORDER

BASELINE_SOLVES_PER_S = 97.0  # reference: median 10.29 ms/solve (WAFR_fig8.py:7)

# Total self-imposed wall-clock budget (s).  The driver's own kill deadline is
# unknown; r3 showed it is near ~1000 s, so default comfortably under it.
BUDGET_S = float(os.environ.get("PDDP_BENCH_BUDGET", "840"))
RESERVE_S = 20.0  # kept back for collecting convergence + printing the line
MIN_STAGE_S = 45.0  # below this a device stage can't even load from cache
# client init + preflight kernel normally lands in ~20 s; a wedged tunnel
# hangs interpreter startup itself, so this is the wedge detector
FIRST_LINE_S = 240.0

_CONVERGENCE = """
import jax
jax.config.update("jax_platforms", "cpu")  # numerics metric: chip-independent
import sys, json
sys.path.insert(0, {root!r})
from benchmarks.convergence import convergence_result
print("@@RESULT@@" + json.dumps(convergence_result(trials=12)))
"""

_T0 = time.monotonic()

# stage -> predicate over AOT-export basenames (benchmarks/{latency,scaling,
# timedyn,fig8}.py naming).  Used ONLY to order warm stages before cold ones;
# a drifted name just loses the ordering hint, never skips a stage.
_AOT_HINT = {
    "latency": lambda n: n.startswith("latency-chain") and "-auto-pr0" in n,
    "latency_pallas": (
        lambda n: n.startswith("latency-chain") and "-pallas-pr0" in n),
    "latency_priccati": (
        lambda n: n.startswith("latency-chain") and "-pallas-pr1" in n),
    "batched": lambda n: n.startswith("batched-auto-") and "-bf0-pr0" in n,
    "batched_pallas": (
        lambda n: n.startswith("batched-pallas-") and "-bf0-pr0" in n),
    "batched_priccati": (
        lambda n: n.startswith("batched-pallas-") and "-pr1" in n),
    "batched_bf16": lambda n: n.startswith("batched-auto-") and "-bf1" in n,
    "rbd": lambda n: n.startswith("timedyn-"),
    "fig8": lambda n: n.startswith("fig8loop-auto-pr0"),
    "fig8_priccati": lambda n: n.startswith("fig8loop-pallas-pr1"),
}


def _warm_stages() -> set:
    """Stages with at least one VALID (current source digest, TPU backend)
    AOT export — their per-process trace cost is already paid, so the worker
    runs them before any cold stage can burn the remaining budget."""
    try:
        import importlib.metadata

        from parallel_ddp_tpu.utils import aot

        d = aot._aot_dir()
        digest = aot._source_digest()
        # aot.load also requires the jax version to match; check it here too
        # (without importing jax in the parent) so a post-upgrade run doesn't
        # order every stage as "warm" (ADVICE r4 #3)
        jax_version = importlib.metadata.version("jax")
        # per-benchmark caller digests (aot entries are also keyed by the
        # source of the module that built them — utils/aot.py `src=`)
        bdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks")
        callers = {
            pfx: aot._caller_digest(os.path.join(bdir, mod))
            for pfx, mod in (("latency", "latency.py"),
                             ("batched", "scaling.py"),
                             ("timedyn", "timedyn.py"),
                             ("fig8loop", "fig8.py"))
        }
        names = []
        for fn in os.listdir(d):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(d, fn)) as f:
                    meta = json.load(f)
            except (OSError, ValueError):
                continue
            want_caller = next((dg for pfx, dg in callers.items()
                                if fn.startswith(pfx)), None)
            if meta.get("src_digest") == digest and \
                    meta.get("backend") != "cpu" and \
                    meta.get("jax_version") == jax_version and \
                    (want_caller is None
                     or meta.get("caller_digest") == want_caller):
                names.append(fn[:-len(".json")])
        return {s for s, pred in _AOT_HINT.items()
                if any(pred(n) for n in names)}
    except Exception:  # noqa: BLE001 — ordering hint only
        return set()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _parse_result(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("@@RESULT@@"):
            return json.loads(line[len("@@RESULT@@"):])
    return None


def _reader(stream, q):
    try:
        for line in stream:
            q.put(line)
    except Exception:  # noqa: BLE001 — worker died; the queue just ends
        pass
    q.put(None)


def run_device_worker(pending, results, extra):
    """One worker attempt: run `pending` stages in one process, collecting
    incremental results.  Returns 'done' | 'wedged' | 'preflight_failed' |
    'budget'."""
    root = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.join(root, "benchmarks",
                                            "device_worker.py"), *pending],
        stdout=subprocess.PIPE, stderr=None, text=True,
    )
    q: queue.Queue = queue.Queue()
    threading.Thread(target=_reader, args=(proc.stdout, q),
                     daemon=True).start()

    def kill():
        try:
            proc.kill()
        except OSError:
            pass

    status = "done"
    saw_preflight = False
    idx = 0  # index into pending = the stage we're currently waiting on
    while True:
        if not saw_preflight:
            deadline = min(FIRST_LINE_S, _remaining() - RESERVE_S)
        elif idx < len(pending):
            deadline = min(NOMINAL_S.get(pending[idx], 420.0),
                           _remaining() - RESERVE_S)
        else:
            deadline = 5.0  # all stages reported; wait briefly for exit
        if deadline <= 0:
            status = "budget"
            kill()
            break
        try:
            line = q.get(timeout=deadline)
        except queue.Empty:
            waiting = "preflight" if not saw_preflight else (
                pending[idx] if idx < len(pending) else "exit")
            print(f"[bench] worker: no output for {deadline:.0f}s while "
                  f"waiting on {waiting} (tunnel wedged?) — killing",
                  file=sys.stderr)
            status = "wedged" if not saw_preflight or idx < len(pending) \
                else "done"
            kill()
            break
        if line is None:  # worker exited
            if not saw_preflight:
                status = "preflight_failed"
            break
        if not line.startswith("@@STAGE@@"):
            continue
        try:
            _tag, name, payload = line.split(" ", 2)
            r = json.loads(payload)
        except ValueError:
            continue
        if name == "preflight":
            saw_preflight = True
            if not r.get("ok"):
                print("[bench] worker preflight failed "
                      f"(backend={r.get('backend')})", file=sys.stderr)
                status = "preflight_failed"
                kill()
                break
            extra["backend"] = r["backend"]
            continue
        if idx < len(pending) and name == pending[idx]:
            idx += 1
        if "error" in r:
            print(f"[bench] stage {name}: {r['error']}", file=sys.stderr)
            continue
        results[name] = r
        try:
            stage_cache.record(name, r, extra.get("backend", "unknown"))
        except Exception as e:  # noqa: BLE001 - recording must not kill a run
            print(f"[bench] stage-cache record failed for {name}: {e}",
                  file=sys.stderr)
    try:
        proc.wait(timeout=5)
    except subprocess.TimeoutExpired:
        kill()
    return status


def main():
    stages_env = os.environ.get("PDDP_BENCH_STAGES",
                                ",".join(ORDER) + ",convergence")
    want = {s.strip() for s in stages_env.split(",")}
    want_device = [s for s in ORDER if s in want]
    warm = _warm_stages()
    if warm:
        # warm-first: a cold stage's multi-minute trace+compile must never
        # starve stages whose programs are already cached.  Within the cold
        # group the first latency-family stage is pinned to the head so a
        # squeezed budget still lands the headline family's base number
        # (ADVICE r4 #4).
        cold = [s for s in want_device if s not in warm]
        lat = [s for s in cold if s.startswith("latency")]
        if lat:
            cold = [lat[0]] + [s for s in cold if s != lat[0]]
        want_device = [s for s in want_device if s in warm] + cold
        print(f"[bench] warm stages first: {[s for s in want_device if s in warm]}",
              file=sys.stderr)
    extra = {}
    value = None
    skipped = []

    root = os.path.dirname(os.path.abspath(__file__))

    # convergence: CPU backend, never touches the tunnel — run it
    # concurrently with the whole device pipeline and collect at the end
    conv_proc = None
    if "convergence" in want:
        conv_proc = subprocess.Popen(
            [sys.executable, "-c", _CONVERGENCE.format(root=root)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )

    # device stages: one worker client; retry on preflight flaps while the
    # budget still allows at least one stage
    results = {}
    attempts = 0
    while want_device and attempts < 3:
        pending = [s for s in want_device if s not in results]
        if not pending:
            break
        if _remaining() < MIN_STAGE_S + RESERVE_S:
            break
        attempts += 1
        status = run_device_worker(pending, results, extra)
        if status in ("done", "budget"):
            break
        if status == "wedged":
            # a wedge outlasts any in-budget retry window (observed ~20 min);
            # salvage what landed and let the stage cache cover the rest
            break
        # preflight_failed: transient flap — brief sleep, then retry
        print(f"[bench] worker attempt {attempts} failed preflight; retrying",
              file=sys.stderr)
        time.sleep(min(30.0, max(_remaining() - RESERVE_S, 0)))
    if not results and want_device:
        extra.setdefault("device_unreachable", True)

    # ---- fold stage results into the artifact ----
    r = results.get("latency")
    if r:
        value = r["solves_per_s"]
        extra["latency_xla_solves_per_s"] = r["solves_per_s"]
        extra["latency_per_solve_ms"] = r["per_solve_ms"]
        extra["latency_headline_path"] = "xla"

    r = results.get("latency_pallas")
    if r:
        extra["latency_pallas_solves_per_s"] = r["solves_per_s"]
        extra["latency_pallas_per_solve_ms"] = r["per_solve_ms"]
        if value is None or value < r["solves_per_s"]:
            value = r["solves_per_s"]
            extra["latency_per_solve_ms"] = r["per_solve_ms"]
            extra["latency_headline_path"] = "pallas"

    r = results.get("latency_priccati")
    if r:
        extra["latency_priccati_solves_per_s"] = r["solves_per_s"]
        extra["latency_priccati_per_solve_ms"] = r["per_solve_ms"]
        extra["latency_priccati_fused_active"] = r.get("fused_riccati_active")
        if value is None or value < r["solves_per_s"]:
            value = r["solves_per_s"]
            extra["latency_per_solve_ms"] = r["per_solve_ms"]
            extra["latency_headline_path"] = "pallas+riccati"

    batched_best = None
    r = results.get("batched")
    if r:
        extra["batched_solves_per_s_per_chip"] = r["value"]
        extra["batched_vs_baseline"] = r["vs_baseline"]
        extra["batched_detail"] = r["extra"]
        batched_best = ("xla", r["value"])

    r = results.get("rbd")
    if r:
        extra["rbd_ns_per_eval"] = r["value"]
        extra["rbd_detail"] = r["extra"]

    r = results.get("fig8")
    if r:
        extra["fig8_avg_ee_tracking_error_m"] = r["value"]
        extra["fig8_vs_baseline_0.0878m"] = r["vs_baseline"]
        extra["fig8_ok_rate"] = r["extra"]["ok_rate"]
        extra["fig8_per_control_step_ms"] = r["extra"]["per_control_step_ms"]

    r = results.get("batched_pallas")
    if r:
        extra["batched_pallas_solves_per_s_per_chip"] = r["value"]
        extra["batched_pallas_detail"] = r["extra"]
        if batched_best is None or batched_best[1] < r["value"]:
            batched_best = ("pallas", r["value"])

    r = results.get("batched_priccati")
    if r:
        extra["batched_priccati_solves_per_s_per_chip"] = r["value"]
        extra["batched_priccati_detail"] = r["extra"]
        extra["batched_priccati_fused_active"] = r["extra"].get(
            "fused_riccati_active")
        if batched_best is None or batched_best[1] < r["value"]:
            batched_best = ("pallas+riccati", r["value"])

    r = results.get("batched_bf16")
    if r:
        # reduced-precision throughput study (VERDICT r2 item 8).  NOT a
        # candidate for batched_headline_path — a reduced-precision number
        # must not masquerade as an fp32-equivalent one (ADVICE r3 #1).
        extra["batched_bf16_reduced_precision_solves_per_s_per_chip"] = (
            r["value"])
        extra["batched_bf16_detail"] = r["extra"]
    if batched_best is not None:
        # best FULL-PRECISION production path (bf16 recorded separately)
        extra["batched_headline_path"] = batched_best[0]

    r = results.get("fig8_priccati")
    if r:
        extra["fig8_priccati_avg_ee_tracking_error_m"] = r["value"]
        extra["fig8_priccati_ok_rate"] = r["extra"]["ok_rate"]
        extra["fig8_priccati_per_control_step_ms"] = (
            r["extra"]["per_control_step_ms"])
        extra["fig8_priccati_fused_active"] = r["extra"].get(
            "fused_riccati_active")

    if conv_proc is not None:
        # BASELINE.json's third metric: iters to 1% of final cost (numerics
        # parity with the reference's convergence semantics, not chip speed).
        # Started before the device stages; give it whatever budget is left.
        try:
            out, _ = conv_proc.communicate(
                timeout=max(_remaining() - RESERVE_S / 2, 5.0))
            r = _parse_result(out)
            if isinstance(r, dict):
                extra["iters_to_1pct_cost_median"] = r["value"]
                extra["iters_to_1pct_detail"] = r["extra"]
        except subprocess.TimeoutExpired:
            conv_proc.kill()
            print("[bench] convergence: still running at the global deadline",
                  file=sys.stderr)
            skipped.append("convergence")

    if value is None:
        # No latency-family stage ran live (tunnel down/wedged).  Rather than
        # a null headline (rounds 2-3), fall back to the FRESHEST (newest utc)
        # cached on-chip measurement across the latency-family stages — never
        # the fastest, which could resurrect a pre-fix inflated number from an
        # older rev (ADVICE r4 #1).  Among entries recorded at the same utc
        # (one bench run records all three within seconds), the fastest of
        # those contemporaries is the same choice a live run would make.
        # The headline_source field and the *_cached provenance block make
        # the cached origin unmissable.  A live run always takes precedence.
        cands = []
        for name in ("latency", "latency_pallas", "latency_priccati"):
            c = stage_cache.get(name)
            if c and isinstance(c.get("result"), dict):
                v = c["result"].get("solves_per_s")
                if v is not None:
                    cands.append((c.get("utc") or "", name, v, c))
        if cands:
            import datetime

            def _ts(s):
                try:
                    return datetime.datetime.strptime(
                        s, "%Y-%m-%dT%H:%M:%SZ").timestamp()
                except ValueError:
                    return 0.0

            newest = max(_ts(c[0]) for c in cands)
            # contemporaries: entries within the same bench/warm pass.  One
            # pass records the three latency stages minutes apart — up to
            # ~20 min when a variant's executable compiles cold — so
            # minute-equality is too tight: it would select the newest stage
            # alone (whichever happened to run last) instead of the fastest
            # of the pass.
            same_run = [c for c in cands if newest - _ts(c[0]) < 3600.0]
            _, name, v, c = max(same_run, key=lambda t: t[2])
            value = v
            extra["latency_headline_path"] = f"cached:{name}"
            extra["latency_per_solve_ms"] = c["result"].get("per_solve_ms")
            extra[f"{name}_cached"] = c
            extra["headline_source"] = (
                f"stage cache ({c.get('utc')}, rev {c.get('git_rev')}) — "
                "no live latency stage this run")

    skipped += [s for s in want_device if s not in results]
    if skipped:
        extra["stages_skipped"] = skipped
    # stages that produced no live result this run: attach the last on-chip
    # measurement of the same stage code, labelled with its utc + git rev
    attached = []
    for name in (s for s in want_device if s not in results):
        c = stage_cache.get(name)
        if c is not None:
            extra[f"{name}_cached"] = c
            attached.append(name)
    if attached:
        extra["cached_stage_results"] = attached

    print(
        json.dumps(
            {
                "metric": "kuka_n64_mpc_solves_per_s",
                "value": round(value, 2) if value is not None else None,
                "unit": "solves/s (6-iter warm EE solve, N=64, M=4, 16 alphas; "
                        "64-chained serial solves, RTT-amortized)",
                "vs_baseline": (round(value / BASELINE_SOLVES_PER_S, 3)
                                if value is not None else None),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
