"""Distributed Kuka pick-and-place over the multicast bus — the reference's
(unfinished) LCM_pickNPlace_examples.cu, completed: the goal-sequencing state
machine (:60-135) drives the full four-loop online stack and reports
per-waypoint settle times.

  solver    MPCLoopNode            — per STATUS: budgeted warm iLQR, publish TRAJ;
                                     consumes GOAL / COST_PARAMS / SOLVER_PARAMS live
  runner    TrajRunnerNode         — per STATUS: u = u_k - K (x - x_ref), publish COMMAND
  plant     SimulatorNode          — integrate arm RBD, publish STATUS
  goal      PickAndPlaceGoalNode   — settle detection (eNorm/vNorm), waypoint
                                     sequencing, close/default cost swaps,
                                     clearVars re-plan triggers

Run: python examples/pick_n_place.py [--duration 30] [--port 7795]

Use --device-loop for the fused on-device variant (controller + plant +
state machine in one jitted scan — the TPU production path).
"""

import argparse
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def run_device_loop(args):
    import jax

    from parallel_ddp_tpu.mpc.driver import MPCConfig, MPCController
    from parallel_ddp_tpu.presets import kuka_ee
    from parallel_ddp_tpu.tasks.pick_and_place import (
        PickAndPlaceConfig,
        default_weights,
        make_pick_place_device_loop,
        sample_waypoints,
    )

    prob = kuka_ee(mpc_mode=True)
    ctrl = MPCController(prob.plant, prob.cost, prob.cfg,
                         MPCConfig(max_iters_per_solve=args.iters))
    cfg = PickAndPlaceConfig()
    wps = sample_waypoints(cfg, args.waypoints, np.random.default_rng(args.seed))

    x_init = np.zeros(14, np.float32)
    x_init[1], x_init[3], x_init[5] = np.pi / 4, -np.pi / 4, np.pi / 4
    goal0 = {"ee_goal": np.concatenate([wps[0], np.zeros(3)]).astype(np.float32),
             "x_target": np.zeros(14, np.float32)}
    st = ctrl.init_state(x_init, t0=0.0, goal=goal0, weights=default_weights())

    loop = make_pick_place_device_loop(ctrl, wps, cfg,
                                       control_period_s=args.control_period)
    n_steps = int(args.duration / args.control_period)
    t0 = time.perf_counter()
    res = loop(st, x_init, 0.0, n_steps)
    jax.block_until_ready(res.x)
    wall = time.perf_counter() - t0

    wi = np.asarray(res.wp_idx)
    done = int(np.asarray(res.waypoints_done))
    # settle time per waypoint = contiguous run length of each index
    settle = [
        float(np.sum(wi == k)) * args.control_period for k in range(done)
    ]
    print(f"device loop: {n_steps} control steps in {wall:.2f}s wall "
          f"({n_steps / wall:.0f} Hz)")
    print(f"waypoints settled: {done}/{len(wps)}")
    for k, s in enumerate(settle):
        print(f"  waypoint {k} {wps[k].round(3).tolist()}: settled in {s:.2f} s")
    if settle:
        print(f"median settle time: {np.median(settle):.2f} s")


def run_distributed(args):
    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.mpc.driver import MPCConfig, MPCController
    from parallel_ddp_tpu.presets import kuka_ee
    from parallel_ddp_tpu.runtime import messages as msg
    from parallel_ddp_tpu.runtime.nodes import (
        MPCLoopNode,
        SimulatorNode,
        TrajRunnerNode,
        ee_goal_to_pytree,
    )
    from parallel_ddp_tpu.runtime.pubsub import PubSub
    from parallel_ddp_tpu.tasks.pick_and_place import (
        PickAndPlaceConfig,
        PickAndPlaceGoalNode,
        default_weights,
    )

    prob = kuka_ee(mpc_mode=True)
    ctrl = MPCController(prob.plant, prob.cost, prob.cfg,
                         MPCConfig(max_iters_per_solve=args.iters))
    cfg = PickAndPlaceConfig()

    x_init = np.zeros(14, np.float32)
    x_init[1], x_init[3], x_init[5] = np.pi / 4, -np.pi / 4, np.pi / 4
    w = default_weights()

    bus_solver = PubSub(port=args.port)
    bus_runner = PubSub(port=args.port)
    bus_sim = PubSub(port=args.port)
    bus_goal = PubSub(port=args.port)

    goal_node = PickAndPlaceGoalNode(
        bus_goal, jax.jit(prob.plant.ee_pos), cfg,
        rng=np.random.default_rng(args.seed),
    )
    goal0 = msg.Goal(
        msg.Goal.MODE_EE_TWIST,
        np.concatenate([goal_node.goal, np.zeros(3)]).astype(np.float32),
    )

    node_solver = MPCLoopNode(ctrl, bus_solver, ee_goal_to_pytree, goal0, weights=w)
    # pre-compile the node's EXACT solve program (cost_shift treedef included)
    node_solver.warmup(x_init)
    node_runner = TrajRunnerNode(14, 7, bus_runner)
    node_sim = SimulatorNode(prob.plant, bus_sim, x_init,
                             rate_hz=args.sim_rate, integrator=1, realtime=True)

    stop = threading.Event()
    threads = [
        threading.Thread(target=node_solver.run, args=(stop,), daemon=True),
        threading.Thread(target=node_runner.run, args=(stop,), daemon=True),
        threading.Thread(target=node_sim.run, args=(stop,), daemon=True),
        threading.Thread(target=goal_node.run, args=(stop,), daemon=True),
    ]
    for t in threads:
        t.start()

    time.sleep(args.duration)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    for b in (bus_solver, bus_runner, bus_sim, bus_goal):
        b.close()

    settles = goal_node.settle_times()
    print(f"solves={node_solver.solve_count} fails={node_solver.fail_count} "
          f"commands={node_runner.command_count}")
    print(f"waypoints settled: {len(settles)}")
    for k, s in enumerate(settles):
        print(f"  waypoint {k}: settled in {s:.2f} s (plant time)")
    if settles:
        print(f"median settle time: {np.median(settles):.2f} s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--port", type=int, default=7795)
    ap.add_argument("--sim-rate", type=float, default=250.0)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--waypoints", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--control-period", type=float, default=0.01)
    ap.add_argument("--device-loop", action="store_true",
                    help="fused on-device variant (recommended on TPU)")
    args = ap.parse_args()
    if args.device_loop:
        run_device_loop(args)
    else:
        run_distributed(args)


if __name__ == "__main__":
    main()
