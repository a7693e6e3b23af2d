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

ROBUSTNESS (why this file is mostly plumbing): rounds 2 and 3 both lost their
artifact to the environment — r2 to a dead device tunnel, r3 to stage
timeouts stacking past the driver's own kill deadline (BENCH_r03.json
rc=124).  The invariants now are:

  * GLOBAL DEADLINE.  bench.py finishes — including printing the final JSON
    line — within PDDP_BENCH_BUDGET seconds (default 840) no matter what the
    tunnel does.  Every stage gets min(its nominal cap, time remaining minus
    a reserve); stages that don't fit are skipped with a note in `extra`.
  * EVERY stage runs in its own SUBPROCESS with a hard timeout.  The dev TPU
    is a remote chip behind a tunnel whose compile helper can die
    independently of the chip: a stage whose program is not in the
    persistent compile cache then blocks forever inside PJRT (observed:
    >45 min, zero CPU).  Subprocesses also keep the one-client-at-a-time
    discipline the tunnel's grant model requires.
  * BREADTH FIRST.  Each metric family (latency, batched, rbd, fig8) lands
    one number before any family gets its kernel-path variants, so a squeezed
    budget still produces a complete artifact.
  * The convergence stage is a CPU-backend numerics metric — it runs
    CONCURRENTLY with the device stages (it never touches the tunnel) and is
    collected at the end.
  * If no device stage lands, `extra` carries the last driver-identical
    on-chip measurements as clearly-labelled provenance constants.

MEASUREMENT INTEGRITY (see stage code): each stage forces one result read
(flips the process into synchronous dispatch where timings mean true remote
completion), measures the tunnel RTT with a trivial kernel, and subtracts it;
the batched stage additionally chains K solves inside one program so the RTT
amortizes over K*B solves.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_SOLVES_PER_S = 97.0  # reference: median 10.29 ms/solve (WAFR_fig8.py:7)

# Total self-imposed wall-clock budget (s).  The driver's own kill deadline is
# unknown; r3 showed it is near ~1000 s, so default comfortably under it.
BUDGET_S = float(os.environ.get("PDDP_BENCH_BUDGET", "840"))
RESERVE_S = 20.0  # kept back for collecting convergence + printing the line
MIN_STAGE_S = 45.0  # below this a device stage can't even load from cache
INTER_STAGE_SLEEP_S = 5.0  # let the tunnel grant cycle between clients

# last driver-identical on-chip measurements (TPU v5e).  Provenance constants
# ONLY — attached, clearly labelled, when the tunnel is down at bench time.
LAST_MEASURED_ON_CHIP = {
    "latency_solves_per_s": 422.1,    # 2026-08-19, XLA path, this round
    "batched_solves_per_s_per_chip": 1954.0,
    "fig8_avg_ee_tracking_error_m": 0.0547,
}

_PREFLIGHT = """
import sys, json
sys.path.insert(0, {root!r})
import jax, jax.numpy as jnp
z = jnp.zeros((8, 128)) + 1.0
# a cpu backend here means the accelerator plugin failed to initialize and jax
# fell back — the stages would burn their full timeouts on XLA:CPU compiles of
# TPU-sized programs and record CPU numbers in a TPU artifact
print("@@RESULT@@" + json.dumps({{
    "ok": float(z.sum()) == 1024.0 and jax.default_backend() != "cpu",
    "backend": jax.default_backend()}}))
"""

_LATENCY = """
import sys, json
sys.path.insert(0, {root!r})
from benchmarks.latency import latency_result
print("@@RESULT@@" + json.dumps(latency_result(core={core!r},
                                               pallas_riccati={priccati})))
"""

_BATCHED = """
import sys, json
sys.path.insert(0, {root!r})
from benchmarks.scaling import batched_result
print("@@RESULT@@" + json.dumps(batched_result(batches=(256,), iters=6, reps=6,
                                               core={core!r}, bf16={bf16},
                                               pallas_riccati={priccati})))
"""

_TIMEDYN = """
import sys, json
sys.path.insert(0, {root!r})
from benchmarks.timedyn import microbench_result
# scan=256: the Pallas kernels are ~3-12 ns/eval, so a 32-chain's device time
# (~0.4 ms) drowns in tunnel-RTT jitter and the corrected value can go
# negative; 256 chained evals x 4096 batch puts every path's device time well
# above the jitter floor.
print("@@RESULT@@" + json.dumps(microbench_result(batch=4096, reps=8, scan=256)))
"""

_FIG8 = """
import sys, json
sys.path.insert(0, {root!r})
from benchmarks.fig8 import device_loop_result
print("@@RESULT@@" + json.dumps(device_loop_result(duration=10.0, reps=1, iters=6,
                                                   core={core!r},
                                                   pallas_riccati={priccati})))
"""

_CONVERGENCE = """
import jax
jax.config.update("jax_platforms", "cpu")  # numerics metric: chip-independent
import sys, json
sys.path.insert(0, {root!r})
from benchmarks.convergence import convergence_result
print("@@RESULT@@" + json.dumps(convergence_result(trials=12)))
"""

_T0 = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _parse_result(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("@@RESULT@@"):
            return json.loads(line[len("@@RESULT@@"):])
    return None


def run_stage(name: str, code: str, timeout_s: float, **fmt):
    root = os.path.dirname(os.path.abspath(__file__))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code.format(root=root, **fmt)],
            capture_output=True, text=True, timeout=timeout_s,
        )
        r = _parse_result(proc.stdout)
        if r is None:
            print(f"[bench] stage {name}: no result (rc={proc.returncode})\n"
                  f"{proc.stderr[-2000:]}", file=sys.stderr)
        return r
    except subprocess.TimeoutExpired:
        print(f"[bench] stage {name}: timed out after {timeout_s:.0f}s "
              "(likely an uncached program + dead remote compile helper)",
              file=sys.stderr)
        return "TIMEOUT"
    except Exception as e:  # noqa: BLE001 - a failed stage must not kill the artifact
        print(f"[bench] stage {name}: {e}", file=sys.stderr)
    return None


def main():
    stages_env = os.environ.get(
        "PDDP_BENCH_STAGES",
        "latency,latency_pallas,latency_priccati,batched,rbd,fig8,"
        "batched_pallas,batched_priccati,batched_bf16,fig8_priccati,"
        "convergence",
    )
    want = {s.strip() for s in stages_env.split(",")}
    extra = {}
    value = None
    timeouts = 0  # consecutive; 2 in a row = tunnel dead, skip the rest
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

    def stage(name, code, nominal_s, **fmt):
        nonlocal timeouts
        if timeouts >= 2:
            print(f"[bench] skipping {name}: two consecutive stage timeouts "
                  "(tunnel likely dead)", file=sys.stderr)
            skipped.append(name)
            return None
        budget = min(nominal_s, _remaining() - RESERVE_S)
        if budget < MIN_STAGE_S:
            print(f"[bench] skipping {name}: {_remaining():.0f}s left of the "
                  f"{BUDGET_S:.0f}s global budget", file=sys.stderr)
            skipped.append(name)
            return None
        r = run_stage(name, code, budget, **fmt)
        time.sleep(min(INTER_STAGE_SLEEP_S, max(_remaining() - RESERVE_S, 0)))
        if r == "TIMEOUT":
            timeouts += 1
            return None
        if r is not None:
            timeouts = 0
        return r

    # Preflight: a trivial kernel must run end-to-end quickly, else the
    # device/tunnel is down and every stage would burn its full timeout.
    # The tunnel FLAPS (observed: down for one 180 s probe, back the next),
    # so a failed probe retries while budget allows — losing every device
    # stage to one transient beats nothing, but retrying beats both.
    pf = None
    for attempt in range(3):
        pf = run_stage("preflight", _PREFLIGHT,
                       min(180.0, max(_remaining() - RESERVE_S, MIN_STAGE_S)))
        if isinstance(pf, dict) and pf.get("ok"):
            break
        # leave enough to run at least one device stage after a late success
        if _remaining() < MIN_STAGE_S * 2 + RESERVE_S:
            break
        print(f"[bench] preflight attempt {attempt + 1} failed; retrying",
              file=sys.stderr)
        time.sleep(min(30.0, max(_remaining() - RESERVE_S, 0)))
    if not (isinstance(pf, dict) and pf.get("ok")):
        print("[bench] preflight failed — device/tunnel unavailable; "
              "device stages skipped", file=sys.stderr)
        want &= {"convergence"}
        extra["device_unreachable"] = True
    else:
        extra["backend"] = pf["backend"]

    if "latency" in want:
        r = stage("latency", _LATENCY, 600, core="auto", priccati=False)
        if r:
            value = r["solves_per_s"]
            extra["latency_xla_solves_per_s"] = r["solves_per_s"]
            extra["latency_per_solve_ms"] = r["per_solve_ms"]
            extra["latency_headline_path"] = "xla"

    if "latency_pallas" in want:
        # same solve with the fused Pallas forward-sim + derivative kernels
        # (kuka core='pallas'; ops/pallas_rollout.py) — recorded next to the
        # XLA number; the headline takes the best production path that RAN
        r = stage("latency_pallas", _LATENCY, 420, core="pallas",
                  priccati=False)
        if r:
            extra["latency_pallas_solves_per_s"] = r["solves_per_s"]
            extra["latency_pallas_per_solve_ms"] = r["per_solve_ms"]
            if value is None or value < r["solves_per_s"]:
                value = r["solves_per_s"]
                extra["latency_per_solve_ms"] = r["per_solve_ms"]
                extra["latency_headline_path"] = "pallas"

    if "latency_priccati" in want:
        # fully-fused config: Pallas forward sim + derivatives + the fused
        # block-Riccati backward sweep (ops/pallas_riccati.py) — records
        # whether fusing the backward pass beats the scan_unroll-tuned XLA
        # sweep (VERDICT r2 item 9)
        r = stage("latency_priccati", _LATENCY, 420, core="pallas",
                  priccati=True)
        if r:
            extra["latency_priccati_solves_per_s"] = r["solves_per_s"]
            extra["latency_priccati_per_solve_ms"] = r["per_solve_ms"]
            extra["latency_priccati_fused_active"] = r.get(
                "fused_riccati_active")
            if value is None or value < r["solves_per_s"]:
                value = r["solves_per_s"]
                extra["latency_per_solve_ms"] = r["per_solve_ms"]
                extra["latency_headline_path"] = "pallas+riccati"

    # breadth first: one number per family before any family's variants
    batched_best = None
    if "batched" in want:
        r = stage("batched", _BATCHED, 600, core="auto", bf16=False,
                  priccati=False)
        if r:
            extra["batched_solves_per_s_per_chip"] = r["value"]
            extra["batched_vs_baseline"] = r["vs_baseline"]
            extra["batched_detail"] = r["extra"]
            batched_best = ("xla", r["value"])

    if "rbd" in want:
        r = stage("rbd", _TIMEDYN, 420)
        if r:
            extra["rbd_ns_per_eval"] = r["value"]
            extra["rbd_detail"] = r["extra"]

    if "fig8" in want:
        r = stage("fig8", _FIG8, 600, core="auto", priccati=False)
        if r:
            extra["fig8_avg_ee_tracking_error_m"] = r["value"]
            extra["fig8_vs_baseline_0.0878m"] = r["vs_baseline"]
            extra["fig8_ok_rate"] = r["extra"]["ok_rate"]
            extra["fig8_per_control_step_ms"] = r["extra"]["per_control_step_ms"]

    if "batched_pallas" in want:
        # same metric through the fused Pallas RBD derivative stage
        # (kuka core='pallas'); recorded next to the XLA-core number so the
        # artifact states which production path wins (VERDICT r1 weak #6)
        r = stage("batched_pallas", _BATCHED, 420, core="pallas", bf16=False,
                  priccati=False)
        if r:
            extra["batched_pallas_solves_per_s_per_chip"] = r["value"]
            extra["batched_pallas_detail"] = r["extra"]
            if batched_best is None or batched_best[1] < r["value"]:
                batched_best = ("pallas", r["value"])

    if "batched_priccati" in want:
        # fully-fused config under scenario-vmap: does the fused block-Riccati
        # kernel still win when XLA already has B=256 lane-filling batch work?
        r = stage("batched_priccati", _BATCHED, 420, core="pallas",
                  bf16=False, priccati=True)
        if r:
            extra["batched_priccati_solves_per_s_per_chip"] = r["value"]
            extra["batched_priccati_detail"] = r["extra"]
            extra["batched_priccati_fused_active"] = r["extra"].get(
                "fused_riccati_active")
            if batched_best is None or batched_best[1] < r["value"]:
                batched_best = ("pallas+riccati", r["value"])

    if "batched_bf16" in want:
        # reduced-precision throughput study (VERDICT r2 item 8): bf16
        # rollout+cost with fp32 accumulation, Riccati pinned fp32
        # (config.cuh:72-75 done right; tests/test_bf16.py is the oracle gate).
        # NOT a candidate for batched_headline_path — a reduced-precision
        # number must not masquerade as an fp32-equivalent one (ADVICE r3 #1).
        r = stage("batched_bf16", _BATCHED, 420, core="auto", bf16=True,
                  priccati=False)
        if r:
            extra["batched_bf16_reduced_precision_solves_per_s_per_chip"] = (
                r["value"])
            extra["batched_bf16_detail"] = r["extra"]
    if batched_best is not None:
        # best FULL-PRECISION production path (bf16 recorded separately above)
        extra["batched_headline_path"] = batched_best[0]

    if "fig8_priccati" in want:
        # same closed loop on the fully-fused solver path (tracking error must
        # hold while the per-step solve cost drops)
        r = stage("fig8_priccati", _FIG8, 420, core="pallas", priccati=True)
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

    if skipped:
        extra["stages_skipped"] = skipped
    if value is None and extra.get("backend") is None:
        # nothing device-side landed: attach clearly-labelled provenance
        extra["last_measured_on_chip"] = LAST_MEASURED_ON_CHIP

    print(
        json.dumps(
            {
                "metric": "kuka_n64_mpc_solves_per_s",
                "value": round(value, 2) if value is not None else None,
                "unit": "solves/s (6-iter warm EE solve, N=64, M=4, 16 alphas; "
                        "RTT-corrected sync timing)",
                "vs_baseline": (round(value / BASELINE_SOLVES_PER_S, 3)
                                if value is not None else None),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
