"""Dump Kuka qdd / dqdd at a grid of states — test/printDyn.cu analog.

The reference prints dynamics and gradient matrices for eyeballing
(printDyn.cu:13-39).  Usage: python examples/print_dyn.py [--grid 3]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from parallel_ddp_tpu.models.kuka import kuka

    plant = kuka()
    jac = jax.jit(plant.qdd_jacobian())
    dyn = jax.jit(plant.dynamics)

    np.set_printoptions(precision=4, suppress=True, linewidth=160)
    qs = np.linspace(-1.0, 1.0, args.grid)
    for qv in qs:
        x = jnp.asarray(np.full(14, qv, np.float32))
        u = jnp.zeros(7, jnp.float32)
        print(f"\n=== q = qd = {qv:+.2f}, u = 0 ===")
        print("qdd:", np.asarray(dyn(x, u)))
        print("dqdd/d[x;u]:")
        print(np.asarray(jac(x, u)))


if __name__ == "__main__":
    main()
