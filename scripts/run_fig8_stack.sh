#!/usr/bin/env bash
# Launch the full 4-loop figure-8 MPC stack (solver + trajectory runner +
# goal publisher + plant) over the multicast bus — the reference's
# examples/LCM_fig8_examples.cu main() (compile line in its header comment).
# Usage: scripts/run_fig8_stack.sh [--duration 10] [--port 7790]
cd "$(dirname "$0")/.." || exit 1
exec python examples/distributed_fig8.py "$@"
