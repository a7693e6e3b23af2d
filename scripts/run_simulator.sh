#!/usr/bin/env bash
# Launch the plant simulator as its own process — the reference's analog is
# the Drake Kuka sim (utils/runDrakeSim.sh:1-3, torque-control variant
# runDrakeSimTorqueControl.sh) or the in-repo kukaLCMSimulator
# (examples/kukaLCMSimulator.cu:52-69), both on the IIWA_STATUS/IIWA_COMMAND
# topics.  Defaults: gravity-compensated Kuka at 500 Hz.
# Usage: scripts/run_simulator.sh [--plant kuka] [--rate 500] [--port 7667]
cd "$(dirname "$0")/.." || exit 1
exec python examples/run_simulator.py --mpc-mode "$@"
