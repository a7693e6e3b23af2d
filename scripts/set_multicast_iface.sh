#!/usr/bin/env bash
# Route the runtime-plane multicast group out of a specific network adapter,
# for multi-machine operation (solver box <-> robot box).  The reference does
# the same for LCM's group with `route add` (utils/setLCMforEthAdapter.sh:1-3);
# our bus uses the same default group, so either script makes the two
# interoperate across boxes.
#
# Usage: sudo scripts/set_multicast_iface.sh <iface>   (e.g. eth0)
set -euo pipefail
IFACE="${1:?usage: set_multicast_iface.sh <iface>}"
GROUP="${PDDP_MCAST_GROUP:-239.255.76.67}"
if command -v ip >/dev/null 2>&1; then
    ip route replace "${GROUP}/32" dev "$IFACE"
else
    route add -net "$GROUP" netmask 255.255.255.255 dev "$IFACE"
fi
echo "multicast ${GROUP} -> ${IFACE}"
