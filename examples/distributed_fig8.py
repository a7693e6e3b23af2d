"""Distributed Kuka figure-8 MPC over the multicast bus — the reference's
online control stack (examples/LCM_fig8_examples.cu, SURVEY.md call-stack 3.3).

Four concurrent loops exchanging messages over UDP multicast, any subset of
which can run on different machines:

  solver    MPCLoopNode     — per STATUS: warm-started budgeted iLQR, publish TRAJ
  runner    TrajRunnerNode  — per STATUS: u = u_k - K (x - x_ref) (native C++), publish COMMAND
  plant     SimulatorNode   — integrate RBD at --sim-rate, publish STATUS
  goal      (this script)   — publish the moving figure-8 GOAL + live cost weights

Run: python examples/distributed_fig8.py [--duration 10] [--port 7790]

NOTE: on the remote-tunnel dev TPU each solve pays ~24 ms of network RTT; run
on a host with local accelerators for production rates (or see
benchmarks/fig8.py --device-loop for the fused on-device variant).
"""

import argparse
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--port", type=int, default=7790)
    ap.add_argument("--sim-rate", type=float, default=250.0)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--settle-time", type=float, default=4.0)
    ap.add_argument("--wire", default="native", choices=["native", "lcm"],
                    help="bus framing: native, or real LCM udpm datagrams "
                         "(interop with lcm-spy/Drake peers)")
    ap.add_argument("--core", default="auto",
                    choices=["auto", "soa", "rbd", "pallas"],
                    help="Kuka dynamics core for the solver node "
                         "(models/kuka/model.py)")
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="archive run metrics (solver Hz, runner Hz, command "
                         "jitter, tracking error) as a JSON artifact")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.mpc.driver import MPCConfig, MPCController
    from parallel_ddp_tpu.presets import fig8_weights, figure8_goal, kuka_ee
    from parallel_ddp_tpu.runtime import messages as msg
    from parallel_ddp_tpu.runtime.nodes import (
        MPCLoopNode,
        SimulatorNode,
        TrajRunnerNode,
    )
    from parallel_ddp_tpu.runtime.pubsub import Channels, PubSub

    prob = kuka_ee(mpc_mode=True, core=args.core)
    ctrl = MPCController(prob.plant, prob.cost, prob.cfg,
                         MPCConfig(max_iters_per_solve=args.iters))

    x_init = np.zeros(14, np.float32)
    x_init[1], x_init[3], x_init[5] = np.pi / 4, -np.pi / 4, np.pi / 4
    w = fig8_weights()
    x_target = jnp.asarray(x_init)

    def goal_to_pytree(g: msg.Goal):
        return {"ee_goal": jnp.asarray(g.value), "x_target": x_target}

    start_xyz, _ = figure8_goal(0.0, args.duration)
    goal0 = msg.Goal(
        0, np.concatenate([start_xyz, np.zeros(3)]).astype(np.float32))

    bus_solver = PubSub(port=args.port, wire=args.wire)
    bus_runner = PubSub(port=args.port, wire=args.wire)
    bus_sim = PubSub(port=args.port, wire=args.wire)
    bus_goal = PubSub(port=args.port, wire=args.wire)

    node_solver = MPCLoopNode(ctrl, bus_solver, goal_to_pytree, goal0, weights=w)
    # pre-compile the node's EXACT solve program before going live (a loop
    # that compiles on its first status runs the plant open-loop meanwhile)
    node_solver.warmup(x_init)
    node_runner = TrajRunnerNode(14, 7, bus_runner)
    node_sim = SimulatorNode(prob.plant, bus_sim, x_init,
                             rate_hz=args.sim_rate, integrator=1, realtime=True)

    ee_pos = jax.jit(prob.plant.ee_pos)
    stop = threading.Event()
    threads = [
        threading.Thread(target=node_solver.run, args=(stop,), daemon=True),
        threading.Thread(target=node_runner.run, args=(stop,), daemon=True),
        threading.Thread(target=node_sim.run, args=(stop,), daemon=True),
    ]
    for t in threads:
        t.start()

    # goal loop (runs in this thread): settle, then trace the figure-8
    t0 = time.perf_counter()
    errors = []
    tracking = False
    t_track0 = None
    while True:
        now = time.perf_counter() - t0
        if not tracking:
            if now >= args.settle_time:
                tracking = True
                t_track0 = now
            xyz = start_xyz
        else:
            tau = now - t_track0
            if tau > args.duration:
                break
            xyz, _ = figure8_goal(tau, args.duration)
        bus_goal.publish(Channels.GOAL, msg.pack_msg(msg.Goal(
            0, np.concatenate([xyz, np.zeros(3)]).astype(np.float32)),
            bus_goal.wire))
        if tracking:
            ee = np.asarray(ee_pos(jnp.asarray(node_sim.x[:7])))[:3]
            errors.append(float(np.linalg.norm(ee - xyz)))
        time.sleep(0.02)

    stop.set()
    for t in threads:
        t.join(timeout=5)
    for b in (bus_solver, bus_runner, bus_sim, bus_goal):
        b.close()

    print(f"solves={node_solver.solve_count} fails={node_solver.fail_count} "
          f"commands={node_runner.command_count}")
    if errors:
        print(f"avg EE tracking error: {np.mean(errors):.4f} m "
              f"(reference baseline 0.0878 m)")

    # archive the online-stack health metrics (the numbers the reference
    # reads off lcm-spy + the WAFR_fig8.py:5-12 archive discipline)
    wall = time.perf_counter() - t0
    trace = node_solver.solve_trace
    stamps = np.asarray(node_runner.command_stamps)
    gaps_ms = np.diff(stamps) * 1e3 if stamps.size > 1 else np.array([])
    solve_ms = np.asarray([s[1] for s in trace]) if trace else np.array([])
    report = {
        "metric": "distributed_fig8_stack",
        "backend": __import__("jax").default_backend(),
        "wire": args.wire,
        "duration_s": round(wall, 2),
        "solver": {
            "solves": node_solver.solve_count,
            "fails": node_solver.fail_count,
            "hz": round(len(trace) / wall, 1) if trace else 0.0,
            "solve_ms_median": (round(float(np.median(solve_ms)), 2)
                                if solve_ms.size else None),
            "solve_ms_max": (round(float(solve_ms.max()), 2)
                             if solve_ms.size else None),
        },
        "runner": {
            "commands": node_runner.command_count,
            "overruns": node_runner.overrun_count,
            "hz": (round(stamps.size / wall, 1) if stamps.size else 0.0),
            "jitter_ms_std": (round(float(gaps_ms.std()), 3)
                              if gaps_ms.size else None),
            "gap_ms_p99": (round(float(np.percentile(gaps_ms, 99)), 2)
                           if gaps_ms.size else None),
        },
        "avg_ee_tracking_error_m": (round(float(np.mean(errors)), 4)
                                    if errors else None),
        "vs_baseline_0.0878m": (round(float(np.mean(errors)) / 0.0878, 3)
                                if errors else None),
    }
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
