"""Constrained DDP demo: pendulum swing-up under a hard torque bound.

The reference reserves CONSTRAINTS_ON and never implements it
(config.cuh:177-179).  Here: solve unconstrained (peak torque ~11), then with
|u| <= 6 via the augmented Lagrangian (solve_al), then run the REAL-TIME
variant (ALMPCController) in a closed loop and report the executed peak.

Run: python examples/constrained_swingup.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from parallel_ddp_tpu import (
        ALMPCController,
        BoxConstraints,
        ilqr_solve,
        solve_al,
    )
    from parallel_ddp_tpu.config import SolverConfig
    from parallel_ddp_tpu.costs.joint import pendulum_cost
    from parallel_ddp_tpu.models import pendulum
    from parallel_ddp_tpu.mpc.driver import MPCConfig
    from parallel_ddp_tpu.ops.integrators import make_step
    from parallel_ddp_tpu.presets import pendulum_swingup

    goal = jnp.asarray([np.pi, 0.0])
    prob = pendulum_swingup(num_time_steps=128, total_time=4.0,
                            m_blocks=4, num_alpha=16)
    x0 = jnp.zeros((128, 2))
    u0 = jnp.zeros((128, 1))

    out = ilqr_solve(prob.plant, prob.cost, prob.cfg, x0, u0, goal,
                     initial_rollout=True)
    print(f"unconstrained: J={float(out.J):.2f} "
          f"peak|u|={float(jnp.abs(out.u).max()):.2f}")

    con = BoxConstraints(n_state=2, n_ctrl=1, u_min=[-6.0], u_max=[6.0])
    out_c, info = solve_al(prob.plant, prob.cost, prob.cfg, x0, u0, goal, con)
    print(f"|u|<=6 (AL):   J={info['base_J']:.2f} "
          f"peak|u|={float(jnp.abs(out_c.u).max()):.4f} "
          f"outer={info['outer_iters']} "
          f"violations={[round(v, 4) for v in info['violations']]}")

    # real-time constrained MPC: swing up from hanging in closed loop
    cfg = SolverConfig(num_time_steps=48, total_time=2.0, m_blocks_b=2,
                       m_blocks_f=2, num_alpha=8, alpha_base=0.75,
                       integrator=3, rho_init=10.0)
    ctrl = ALMPCController(pendulum(), pendulum_cost(48), cfg,
                           MPCConfig(max_iters_per_solve=6), con, mu=50.0)
    x = np.zeros(2, np.float32)
    st, lam = ctrl.init_state(x, t0=0.0, goal=goal)
    sim_step = make_step(pendulum(), 3, 0.01)
    t, peak = 0.0, 0.0
    for _ in range(200):  # 4 s at 50 Hz replan, 100 Hz plant
        st, lam, _ = ctrl.step(st, lam, x, t, goal)
        for _ in range(2):
            u = con.clip_u(st.u[0])
            peak = max(peak, float(abs(u[0])))
            x = np.asarray(sim_step(jnp.asarray(x), u))
            t += 0.01
    print(f"constrained MPC: final x={x.round(3)} executed peak|u|={peak:.4f}")


if __name__ == "__main__":
    main()
