#!/usr/bin/env bash
# Watch the runtime-plane bus traffic — the reference launches `lcm-spy` for
# this (utils/runDrakeLCMSpy.sh:1); ours decodes this framework's channels.
# Usage: scripts/run_spy.sh [--port 7667] [--channels IIWA_STATUS,TRAJ_CHANNEL]
cd "$(dirname "$0")/.." || exit 1
exec python examples/bus_spy.py "$@"
