"""WAFR figure-8 closed-loop MPC benchmark (test/WAFR_fig8.py baseline numbers).

Reproduces the reference experiment (examples/LCM_fig8_examples.cu): a Kuka
iiwa-14 tracks a 10 s figure-8 EE path under warm-started receding-horizon
iLQR (N=64, 0.5 s horizon, M=4, 16 alphas, EE cost, gravity-compensated
plant).  Metrics:
  * avg EE tracking error over the figure-8 (baseline 0.0878 m, WAFR_fig8.py:5-6)
  * solve wall time (baseline median 10.29 ms, WAFR_fig8.py:7)

Phases, like the reference goal handler (LCM_fig8_examples.cu:140-190):
  1. settle: drive to the fig-8 start until eNorm < 0.05 and |qd| < 0.05;
  2. track: error accumulates while the goal moves along the exact 200-point
     reference path.

Run: python benchmarks/fig8.py [--duration 10] [--control-period 0.01]
     python benchmarks/fig8.py --device-loop     # fully fused on-device loop

Two modes:
  * host loop (default): solver on device, trajectory runner + plant on host —
    the real deployment topology.  NOTE: on the remote-tunnel dev TPU every
    per-step host read costs ~24 ms of network RTT, so host-loop wall times
    there measure the tunnel, not the framework.
  * --device-loop: controller + plant fused in ONE program
    (mpc/device_loop.py, the reference's testMPC_lockstep analog) — results
    read once at the end; this is the number that reflects the hardware.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def device_loop_result(duration=10.0, reps=1, control_period=0.01,
                       sim_rate=1000.0, iters=6, settle_time=4.0,
                       core="auto", pallas_riccati=False, chunk=100):
    """Fused device-loop fig-8 tracking run -> bench dict (importable from
    bench.py so the tracking-error metric lands in the driver artifact).

    `core`/`pallas_riccati` pick the solver kernel path (same knobs as
    benchmarks/latency.py) so the closed-loop number can ride whichever
    production path the latency stages crowned."""
    import types

    args = types.SimpleNamespace(
        duration=duration, reps=reps, control_period=control_period,
        sim_rate=sim_rate, iters=iters, settle_time=settle_time,
        core=core, pallas_riccati=pallas_riccati, chunk=chunk,
    )
    return _run_device_loop(args)


def run_device_loop(args):
    print(json.dumps(_run_device_loop(args)))


def _run_device_loop(args):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.mpc.device_loop import make_device_mpc_loop
    from parallel_ddp_tpu.mpc.driver import MPCConfig, MPCController
    from parallel_ddp_tpu.presets import fig8_weights, figure8_goal, kuka_ee

    from parallel_ddp_tpu.utils import aot

    core = getattr(args, "core", "auto")
    pric = getattr(args, "pallas_riccati", False)
    prob = kuka_ee(mpc_mode=True, core=core)
    cfg = dataclasses.replace(prob.cfg, pallas_riccati=pric)
    ctrl = MPCController(
        prob.plant, prob.cost, cfg, MPCConfig(max_iters_per_solve=args.iters)
    )

    # CHUNKED EXECUTION (VERDICT r4 next #1).  The experiment is run as
    # ceil(T/chunk) calls of ONE chunk-shaped program instead of a single
    # T-step scan: (a) settle and track become the same program shape, so one
    # AOT export + one compile covers the whole experiment (the old
    # settle/track pair compiled two multi-minute programs); (b) a result
    # read lands between chunks — each doubles as a liveness heartbeat line
    # on stdout, so bench.py's inactivity watchdog can't reap a healthy run
    # mid-scan; (c) a wedged tunnel loses one chunk, not the experiment.
    chunk = max(1, int(getattr(args, "chunk", 100) or 100))
    _loop_fn = None  # ONE jitted program object reused across every chunk
    # (a fresh jax.jit wrapper per chunk would re-trace/re-load each call)

    def loop_for(example_args):
        nonlocal _loop_fn
        if _loop_fn is not None:
            return _loop_fn

        def build():
            return make_device_mpc_loop(
                ctrl, sim_rate_hz=args.sim_rate,
                control_period_s=args.control_period, sim_integrator=1,
            )

        name = (f"fig8loop-{core}-pr{int(pric)}-i{args.iters}"
                f"-sr{args.sim_rate:g}-cp{args.control_period:g}-c{chunk}")
        _loop_fn, _ = aot.cached_program(name, build, example_args,
                                         src=__file__)
        return _loop_fn

    x_init = np.zeros(14, np.float32)
    x_init[1], x_init[3], x_init[5] = np.pi / 4, -np.pi / 4, np.pi / 4
    w = fig8_weights()

    def goals_for(times):
        xyz = np.stack([figure8_goal(t, args.duration)[0] for t in times])
        g = np.concatenate([xyz, np.zeros_like(xyz)], axis=1).astype(np.float32)
        return {
            "ee_goal": g,
            "x_target": np.tile(x_init, (len(times), 1)).astype(np.float32),
        }

    n_settle = int(round(args.settle_time / args.control_period))
    n_track = int(round(args.duration * args.reps / args.control_period))
    goals_settle = goals_for(np.zeros(n_settle))
    goals_track = goals_for(
        (np.arange(n_track) + 1) * args.control_period)

    st = ctrl.init_state(x_init, t0=0.0, goal=jax.tree_util.tree_map(
        lambda a: jnp.asarray(a[0]), goals_settle), weights=w)

    # tunnel RTT via a trivial kernel: each chunk's result read pays one RTT
    # that is the network's, not the chip's — subtract it per timed chunk
    triv = jax.jit(lambda z: z + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(triv(z))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(triv(z))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    def run_phase(tag, st, x, t, goals, timed):
        """Run one phase chunk-by-chunk; returns (st, x, t, errs, oks, xs,
        device_wall_s).  A short tail is padded up to a full chunk (same
        program shape) and its outputs discarded."""
        n = len(goals["ee_goal"])
        errs, oks, xs = [], [], []
        wall = 0.0
        x = jnp.asarray(x, jnp.float32)
        for i in range(0, n, chunk):
            seg = {k: a[i:i + chunk] for k, a in goals.items()}
            m = len(seg["ee_goal"])
            if m < chunk:  # pad the tail chunk; extra outputs discarded
                seg = {k: np.concatenate(
                    [a, np.repeat(a[-1:], chunk - m, axis=0)])
                    for k, a in seg.items()}
            seg = {k: jnp.asarray(a) for k, a in seg.items()}
            fn = loop_for((st, x, np.float32(t), seg, w))
            t0 = time.perf_counter()
            res = fn(st, x, np.float32(t), seg, w)
            jax.block_until_ready(res.ee_err)
            wall += time.perf_counter() - t0 - (rtt if timed else 0.0)
            st, x = res.state, res.x[m - 1]
            t += m * args.control_period
            errs.append(np.asarray(res.ee_err)[:m])
            oks.append(np.asarray(res.ok)[:m])
            xs.append(np.asarray(res.x)[:m])
            print(f"[fig8] {tag} chunk {i // chunk + 1}/{-(-n // chunk)} "
                  f"err={float(errs[-1][-1]):.4f}", flush=True)
        return st, x, t, np.concatenate(errs), np.concatenate(oks), \
            np.concatenate(xs), wall

    # settle phase compiles the chunk program and flips the process into
    # synchronous dispatch (every chunk ends in a result read), so the track
    # phase below is timed against a warm executable
    st, x, t, errs_s, _, _, _ = run_phase(
        "settle", st, x_init, 0.0, goals_settle, timed=False)
    st, x, t, errors, accepts, xs_track, wall = run_phase(
        "track", st, x, t, goals_track, timed=True)

    avg_err = float(np.mean(errors))
    solve_ms = wall * 1000.0 / n_track
    if getattr(args, "save_log", None):
        # experiment log for the plotting script (the reference archives its
        # runs as comments + 3-D matplotlib plots, test/WAFR_fig8.py:5-12;
        # ours saves the raw series for examples/plot_fig8.py)
        ee_xyz = np.asarray(
            jax.vmap(lambda x: prob.plant.ee_pos(x[:7]))(jnp.asarray(xs_track))
        )[:, :3]
        times = (args.settle_time
                 + (np.arange(n_track) + 1) * args.control_period)
        np.savez(
            args.save_log,
            t=times, ee_xyz=ee_xyz,
            goal_xyz=np.asarray(goals_track["ee_goal"])[:, :3],
            ee_err=errors, ok=accepts,
            per_control_step_ms=solve_ms,
        )
    result = {
        "metric": "kuka_fig8_avg_ee_tracking_error",
        "value": round(avg_err, 4),
        "unit": "m (10s fig8, N=64, M=4, 16 alphas, %d iters/solve, device loop)"
                % args.iters,
        "vs_baseline": round(0.0878 / max(avg_err, 1e-9), 3),
        "extra": {
            "mode": "device_loop",
            "per_control_step_ms": round(solve_ms, 3),
            "baseline_solve_ms": 10.29,
            "ok_rate": round(float(np.mean(accepts)), 3),
            "max_err_m": round(float(np.max(errors)), 4),
            "settle_final_err_m": round(float(errs_s[-1]), 4),
            "chunk": chunk,
            "rtt_ms": round(rtt * 1e3, 2),
        },
    }
    if getattr(args, "pallas_riccati", False):
        # record whether the fused backward sweep actually engaged (vs the
        # silent XLA-scan fallback) so the artifact labels are trustworthy
        from parallel_ddp_tpu.ops.pallas_riccati import fused_riccati_active

        result["extra"]["fused_riccati_active"] = fused_riccati_active(
            cfg, 14, 7)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=10.0, help="fig8 period (s)")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--control-period", type=float, default=0.01)
    ap.add_argument("--sim-rate", type=float, default=1000.0)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--settle-time", type=float, default=4.0)
    ap.add_argument("--device-loop", action="store_true")
    ap.add_argument("--core", default="auto",
                    choices=["auto", "soa", "rbd", "pallas"])
    ap.add_argument("--pallas-riccati", action="store_true",
                    dest="pallas_riccati")
    ap.add_argument("--save-log", default=None, metavar="PATH.npz",
                    help="save the tracking-run series for examples/plot_fig8.py"
                         " (device-loop mode)")
    args = ap.parse_args()

    if args.device_loop:
        run_device_loop(args)
        return

    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.config import CostWeights
    from parallel_ddp_tpu.mpc.driver import MPCConfig, MPCController
    from parallel_ddp_tpu.mpc.simulator import PlantSimulator
    from parallel_ddp_tpu.mpc.controls import TrajHandoff, get_hardware_controls
    from parallel_ddp_tpu.presets import fig8_weights, figure8_goal, kuka_ee

    prob = kuka_ee(mpc_mode=True, core=args.core)
    import dataclasses as _dc
    cfg = _dc.replace(prob.cfg, pallas_riccati=args.pallas_riccati)
    ctrl = MPCController(
        prob.plant, prob.cost, cfg, MPCConfig(max_iters_per_solve=args.iters)
    )
    sim = PlantSimulator(prob.plant, rate_hz=args.sim_rate, integrator=1)
    ee_pos = jax.jit(prob.plant.ee_pos)

    x_init = np.zeros(14, np.float32)
    x_init[1], x_init[3], x_init[5] = np.pi / 4, -np.pi / 4, np.pi / 4  # workspace center
    x_target = jnp.asarray(x_init)

    w_settle = fig8_weights()._replace(r_ee=0.001)
    w_track = fig8_weights()

    def goal_pytree(xyz):
        return {
            "ee_goal": jnp.concatenate(
                [jnp.asarray(xyz, jnp.float32), jnp.zeros(3, jnp.float32)]
            ),
            "x_target": x_target,
        }

    start_xyz, _ = figure8_goal(0.0, args.duration)

    x = x_init.copy()
    t = 0.0
    st = ctrl.init_state(x, t0=0.0, goal=goal_pytree(start_xyz), weights=w_settle)

    steps_per_solve = max(1, int(round(args.control_period * args.sim_rate)))

    def control_loop(st, x, t, weights, goal_xyz):
        t0 = time.perf_counter()
        st, info = ctrl.step(st, x, t, goal_pytree(goal_xyz), weights)
        jax.block_until_ready(st.x)
        wall = time.perf_counter() - t0
        traj = TrajHandoff(np.asarray(st.x), np.asarray(st.u), np.asarray(st.K),
                           float(st.t0), ctrl.cfg.dt)
        for _ in range(steps_per_solve):
            u, ok = get_hardware_controls(traj, t, x)
            if not ok:
                u = np.zeros(7, np.float32)
            x = sim.step(x, u)
            t += sim.dt
        return st, x, t, wall, bool(info.accepted)

    # ---- phase 1: settle at the fig-8 start ----
    settle_deadline = args.settle_time
    while t < settle_deadline:
        st, x, t, _, _ = control_loop(st, x, t, w_settle, start_xyz)
        ee = np.asarray(ee_pos(jnp.asarray(x[:7])))[:3]
        e_norm = np.linalg.norm(ee - start_xyz)
        v_norm = np.linalg.norm(x[7:])
        if e_norm < 0.05 and v_norm < 0.05:
            break
    ee = np.asarray(ee_pos(jnp.asarray(x[:7])))[:3]
    print(f"settled at t={t:.2f}s eNorm={np.linalg.norm(ee - start_xyz):.4f}",
          file=sys.stderr)

    # ---- phase 2: track the moving figure-8 ----
    t_zero = t
    errors, walls, accepts = [], [], []
    total = args.duration * args.reps
    while t - t_zero < total:
        tau = t - t_zero
        goal_xyz, _ = figure8_goal(tau, args.duration)
        st, x, t, wall, acc = control_loop(st, x, t, w_track, goal_xyz)
        walls.append(wall)
        accepts.append(acc)
        # error at the *end* of this control period against the goal there
        tau2 = t - t_zero
        g2, _ = figure8_goal(tau2, args.duration)
        ee = np.asarray(ee_pos(jnp.asarray(x[:7])))[:3]
        errors.append(np.linalg.norm(ee - g2))

    avg_err = float(np.mean(errors))
    med_solve_ms = float(np.median(walls) * 1000)
    result = {
        "metric": "kuka_fig8_avg_ee_tracking_error",
        "value": round(avg_err, 4),
        "unit": "m (10s fig8, N=64, M=4, 16 alphas, %d iters/solve)" % args.iters,
        "vs_baseline": round(0.0878 / max(avg_err, 1e-9), 3),
        "extra": {
            "median_solve_ms": round(med_solve_ms, 2),
            "baseline_solve_ms": 10.29,
            "accept_rate": round(float(np.mean(accepts)), 3),
            "max_err_m": round(float(np.max(errors)), 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
