"""Standalone plant simulator process for the multicast bus.

The reference runs its plant as a separate process: either the Drake Kuka
simulation (launched by utils/runDrakeSim.sh:1-3) or the in-repo
`kukaLCMSimulator` (examples/kukaLCMSimulator.cu:52-69), both speaking
IIWA_STATUS / IIWA_COMMAND over LCM.  This is that process for this
framework: a SimulatorNode integrating the chosen plant at --rate with
--substeps, publishing STATUS and consuming COMMAND on the same bus the
solver / trajectory-runner / goal processes use — so the full distributed
stack can be launched as genuinely separate OS processes (one per terminal or
machine) instead of the threads examples/distributed_fig8.py uses.

Run: python examples/run_simulator.py [--plant kuka|pendulum|cartpole]
     [--port 7667] [--rate 500] [--substeps 2] [--mpc-mode]
"""

import argparse
import signal
import sys
import threading

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plant", default="kuka",
                    choices=["kuka", "pendulum", "cartpole"])
    ap.add_argument("--port", type=int, default=7667)
    ap.add_argument("--group", default="239.255.76.67")
    ap.add_argument("--rate", type=float, default=500.0)
    ap.add_argument("--substeps", type=int, default=2)
    ap.add_argument("--duration", type=float, default=0.0,
                    help="seconds to run; 0 = until interrupted")
    ap.add_argument("--mpc-mode", action="store_true",
                    help="gravity-compensated Kuka (the reference's MPC_MODE)")
    ap.add_argument("--x0", default="",
                    help="comma-separated initial state (default: plant home)")
    ap.add_argument("--device", default="cpu", choices=["cpu", "accel"],
                    help="cpu (default: the plant-in-the-loop process is host "
                         "work, like the reference's double-precision host "
                         "simulator, LCMHelpers.cuh:418-524) or accel to keep "
                         "whatever accelerator backend jax picks")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        # env vars are not enough here: the axon sitecustomize pins the
        # platform list with an explicit config.update, which only another
        # explicit update (before first backend use) can override
        jax.config.update("jax_platforms", "cpu")

    from parallel_ddp_tpu.runtime.nodes import SimulatorNode
    from parallel_ddp_tpu.runtime.pubsub import PubSub

    if args.plant == "kuka":
        from parallel_ddp_tpu.models.kuka.model import kuka, kuka_params

        plant = kuka(kuka_params(mpc_mode=args.mpc_mode))
        x0 = np.zeros(14, np.float32)
        x0[1], x0[3], x0[5] = np.pi / 4, -np.pi / 4, np.pi / 4
    elif args.plant == "pendulum":
        from parallel_ddp_tpu.models.pendulum import pendulum

        plant = pendulum()
        x0 = np.zeros(2, np.float32)
    else:
        from parallel_ddp_tpu.models.cartpole import cartpole

        plant = cartpole()
        x0 = np.zeros(4, np.float32)

    if args.x0:
        x0 = np.asarray([float(v) for v in args.x0.split(",")], np.float32)

    bus = PubSub(group=args.group, port=args.port)
    node = SimulatorNode(plant, bus, x0, rate_hz=args.rate,
                         substeps=args.substeps)
    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    if args.duration > 0:
        threading.Timer(args.duration, stop.set).start()
    print(f"simulating {args.plant} at {args.rate:g} Hz x{args.substeps} "
          f"substeps on {args.group}:{args.port} (ctrl-C to stop)")
    node.run(stop)
    print(f"simulator stopped at t={node.t:.3f}s, "
          f"x={np.array2string(node.x, precision=3)}")


if __name__ == "__main__":
    main()
