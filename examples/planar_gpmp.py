"""Planar GPMP (deterministic Gauss-Newton) demo.

The reference ships the GPMP class (``stoch_gpmp/planner.py:352``) without a
runnable example; this demo exercises it on the planar obstacle workload: the
structured block-tridiagonal normal-equation solve descends smoothly from the
straight-line init to collision-aware trajectories.

Run: ``python examples/planar_gpmp.py [--iters 100] [--plot out.png]``
"""

import argparse
import time

import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.costs import (
    CostCollision,
    CostComposite,
    CostGP,
    CostGoalPrior,
)
from stoch_gpmp_tpu.envs import generate_obstacle_map
from stoch_gpmp_tpu.planners import GPMP


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--plot", type=str, default=None)
    ap.add_argument("--method", choices=["cholesky", "woodbury"],
                    default="cholesky",
                    help="GN solve: structured Cholesky, or the "
                    "parallel-in-time Woodbury split (equal results; "
                    "O(log T) critical path — see planners/gpmp.py)")
    args = ap.parse_args()

    dtype = jnp.float32
    n_dof, traj_len, dt = 2, 64, 0.05
    start_state = jnp.asarray([-9.0, -9.0, 0.0, 0.0], dtype=dtype)
    goals = jnp.asarray([[9.0, 6.0, 0.0, 0.0], [9.0, -3.0, 0.0, 0.0]], dtype=dtype)

    obst_map, _ = generate_obstacle_map(
        map_dim=(20, 20), cell_size=0.1, random_gen=True, num_obst=10,
        rand_limits=[[-7.5, 7.5], [-7.5, 7.5]], rand_rect_shape=[2, 2],
        rng=args.seed, dtype=dtype,
    )

    cost = CostComposite.create(
        n_dof, traj_len,
        [
            CostGP.create(n_dof, traj_len, start_state, dt,
                          {"sigma_start": 0.01, "sigma_gp": 0.5}, dtype=dtype),
            CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=0.01,
                                 dtype=dtype),
            CostCollision.create(n_dof, traj_len, obst_map.as_field(),
                                 sigma_coll=0.05),
        ],
    )
    planner = GPMP(
        num_particles_per_goal=3,
        traj_len=traj_len,
        opt_iters=1,
        dt=dt,
        n_dof=n_dof,
        step_size=0.3,
        start_state=start_state,
        multi_goal_states=goals,
        cost=cost,
        sigma_start_init=0.01,
        sigma_goal_init=0.01,
        sigma_gp_init=5.0,
        sigma_start_sample=0.01,
        sigma_goal_sample=0.01,
        sigma_gp_sample=0.5,
        solver_params={"delta": 1e-2, "trust_region": False,
                       "method": args.method},
        seed=args.seed,
        dtype=dtype,
    )

    t0 = time.time()
    vel, pos, costs = planner.optimize(opt_iters=args.iters)
    print(f"{args.iters} GN iterations in {time.time() - t0:.2f}s "
          f"| final mean cost {float(np.asarray(costs).mean()):.2f}")
    end_err = np.linalg.norm(
        np.asarray(pos)[:, -1].reshape(2, 3, 2) - np.asarray(goals)[:, None, :2],
        axis=-1,
    )
    print(f"final goal distances: {np.round(end_err, 3)}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 7))
        x = np.linspace(-10, 10, obst_map.map.shape[1])
        y = np.linspace(-10, 10, obst_map.map.shape[0])
        ax.contourf(x, y, obst_map.map, 20)
        p = np.asarray(pos)
        for i in range(p.shape[0]):
            ax.plot(p[i, :, 0], p[i, :, 1], "b")
        g = np.asarray(goals)
        ax.plot(g[:, 0], g[:, 1], "g*", markersize=12)
        fig.savefig(args.plot, dpi=120)
        print(f"saved plot to {args.plot}")


if __name__ == "__main__":
    main()
