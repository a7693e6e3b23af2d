"""Bus spy — live channel monitor for the multicast runtime plane.

The reference inspects its LCM traffic with `lcm-spy` (launched by
utils/runDrakeLCMSpy.sh:1) plus four hand-written channel printers
(LCMHelpers.cuh:286-416).  This is the same tool for this framework's bus:
subscribe to every known channel (or a --channels subset), decode whatever
arrives with the self-describing message registry, and print a once-a-second
table of per-channel rate, payload size, and a one-line summary of the latest
message — so a multi-process stack (examples/distributed_fig8.py,
examples/pick_n_place.py) can be watched from a fifth terminal, possibly on a
different machine (same multicast group/port).

Run: python examples/bus_spy.py [--port 7667] [--duration 0 (= forever)]
     [--channels IIWA_STATUS,TRAJ_CHANNEL]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _summ(v) -> str:
    """One line: message type + the fields a human wants to glance at."""
    import parallel_ddp_tpu.runtime.messages as msg

    def arr(a, k=3):
        a = np.asarray(a).ravel()
        head = ", ".join(f"{x:+.3f}" for x in a[:k])
        return f"[{head}{', …' if a.size > k else ''}]"

    if isinstance(v, msg.Status):
        return f"Status      t={v.utime:.3f} q={arr(v.q)} qd={arr(v.qd)}"
    if isinstance(v, msg.Command):
        return f"Command     t={v.utime:.3f} tau={arr(v.tau)}"
    if isinstance(v, msg.CommandHardware):
        return (f"CommandHW   t={v.utime:.3f} q={arr(v.q_ref)} tau={arr(v.tau)}"
                f" wrench={arr(v.wrench if v.wrench is not None else np.zeros(6))}")
    if isinstance(v, msg.ControllerReference):
        return f"CtrlRef     t={v.utime:.3f} q={arr(v.q_des)} u={arr(v.u_nominal)}"
    if isinstance(v, msg.Trajectory):
        return (f"Trajectory  t0={v.t0:.3f} dt={v.dt:.4f} N={v.x.shape[0]}"
                f" x0={arr(v.x[0])}")
    if isinstance(v, msg.Goal):
        mode = {v.MODE_JOINT: "joint", v.MODE_EE_POSE: "ee-pose",
                v.MODE_EE_TWIST: "ee-twist"}.get(v.mode, v.mode)
        return f"Goal        mode={mode} value={arr(v.value, 6)}"
    if isinstance(v, msg.CostParams):
        w = v.weights
        return f"CostParams  q_ee1={w.q_ee1:g} q_ee2={w.q_ee2:g} r={w.r:g}"
    if isinstance(v, msg.SolverParams):
        return (f"SolverParams iters={v.iter_limit} time_ms={v.time_limit_ms}"
                f" clear={v.clear_vars} shift={v.cost_shift}")
    return type(v).__name__


def main():
    from parallel_ddp_tpu.runtime import messages as msg
    from parallel_ddp_tpu.runtime.pubsub import Channels, PubSub

    all_channels = [Channels.STATUS, Channels.STATUS_FILTERED, Channels.TRAJ,
                    Channels.COMMAND, Channels.GOAL, Channels.COST_PARAMS,
                    Channels.SOLVER_PARAMS]
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=7667)
    ap.add_argument("--group", default="239.255.76.67")
    ap.add_argument("--duration", type=float, default=0.0,
                    help="seconds to run; 0 = until interrupted")
    ap.add_argument("--channels", default=",".join(all_channels),
                    help="comma-separated channel subset")
    ap.add_argument("--interval", type=float, default=1.0,
                    help="seconds between table prints")
    args = ap.parse_args()

    channels = [c.strip() for c in args.channels.split(",") if c.strip()]
    bus = PubSub(group=args.group, port=args.port)
    for ch in channels:
        bus.subscribe(ch)

    counts = dict.fromkeys(channels, 0)
    sizes = dict.fromkeys(channels, 0)
    latest: dict = {}
    t_end = time.time() + args.duration if args.duration > 0 else float("inf")
    t_print = time.time() + args.interval
    print(f"spying {len(channels)} channels on {args.group}:{args.port} "
          "(ctrl-C to stop)")
    try:
        while time.time() < t_end:
            got = False
            for ch in channels:
                m = bus.poll_new(ch)
                if not m:
                    continue
                got = True
                counts[ch] += 1
                sizes[ch] = len(m[0])
                try:
                    latest[ch] = _summ(msg.unpack_any(m[0]))
                except Exception as e:  # unknown payload: show raw size only
                    latest[ch] = f"<undecodable: {e}>"
            now = time.time()
            if now >= t_print:
                dt = args.interval + (now - t_print)
                print(f"--- {time.strftime('%H:%M:%S')} ---")
                for ch in channels:
                    if counts[ch] == 0 and ch not in latest:
                        continue
                    print(f"  {ch:<24} {counts[ch] / dt:7.1f} Hz "
                          f"{sizes[ch]:6d} B  {latest.get(ch, '')}")
                counts = dict.fromkeys(channels, 0)
                t_print = now + args.interval
            if not got:
                time.sleep(0.0005)
    except KeyboardInterrupt:
        pass
    finally:
        bus.close()


if __name__ == "__main__":
    main()
