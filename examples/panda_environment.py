"""Panda 7-DOF StochGPMP demo (parity with the reference's
``examples/panda_environment.py``): plan to an SE(3) end-effector target among
random sphere obstacles, with FK + collision + self-collision + SE(3) goal
costs. Everything native — built-in FK, native IK (no pybullet / external FK).

Run: ``python examples/panda_environment.py [--iters 400] [--fast]
[--plot out.png]``

``--fast`` swaps in the TPU fast stack — the fused dense quadratic + the
FK-in-kernel Pallas field pass (exactly equal values, ~2.5x faster; see
docs/PERFORMANCE.md).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.costs import (
    CostCollision,
    CostComposite,
    CostGP,
    CostGoal,
    CostGoalPrior,
    EESE3DistanceField,
    LinkDistanceField,
    LinkSelfDistanceField,
)
from stoch_gpmp_tpu.envs.panda_env import random_init_static_sphere
from stoch_gpmp_tpu.kinematics import Frame, homogeneous, y_rot, z_rot
from stoch_gpmp_tpu.kinematics.ik import solve_ik_multistart
from stoch_gpmp_tpu.kinematics.panda_model import franka_panda
from stoch_gpmp_tpu.planners import StochGPMP


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--seed", type=int, default=int(time.time()))
    ap.add_argument("--num-obst", type=int, default=5)
    ap.add_argument("--fast", action="store_true",
                    help="fused quadratic + FK-in-kernel Pallas fields")
    ap.add_argument("--plot", type=str, default=None)
    args = ap.parse_args()

    dtype = jnp.float32
    traj_len, dt = 64, 0.05
    num_particles_per_goal, num_samples = 5, 32
    rng = np.random.default_rng(args.seed)

    chain = franka_panda(dtype=dtype)
    n_dof = chain.n_dofs

    # target pose (reference example values)
    target_pos = np.array([0.3, 0.3, 0.3])
    target_rot = z_rot(jnp.asarray(-np.pi, dtype=dtype)) @ y_rot(jnp.asarray(-np.pi, dtype=dtype))
    target_frame = Frame(rot=target_rot, trans=jnp.asarray(target_pos, dtype=dtype))
    target_h = target_frame.get_transform_matrix()

    start_q = jnp.asarray([0.012, -0.57, 0.0, -2.81, 0.0, 3.037, 0.741], dtype=dtype)
    start_state = jnp.concatenate([start_q, jnp.zeros_like(start_q)])

    # goal configuration from native IK (replaces the reference's pybullet IK)
    q_goal = solve_ik_multistart(
        chain, target_h, jax.random.PRNGKey(args.seed), num_starts=16,
        q_init=start_q, num_iters=150,
    )
    multi_goal_states = jnp.concatenate([q_goal, jnp.zeros_like(q_goal)])[None]

    # cost stack (reference sigma values)
    cost_gp = CostGP.create(
        n_dof, traj_len, start_state, dt,
        {"sigma_start": 0.0001, "sigma_gp": 0.0007}, dtype=dtype,
    )
    cost_goal_prior = CostGoalPrior.create(
        n_dof, traj_len, multi_goal_states, sigma_goal_prior=20.0, dtype=dtype
    )
    if args.fast:
        from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
        from stoch_gpmp_tpu.costs.quadratic import QuadraticCost

        cost = CostComposite.create(
            n_dof, traj_len,
            [
                QuadraticCost.from_gp_and_goal_prior(
                    cost_gp, cost_goal_prior, traj_len
                ),
                PlaneFieldsCost.create(
                    n_dof, traj_len, chain, target_h, margin=0.03,
                    sigma_self=0.01, sigma_coll=0.01, sigma_goal=0.00007,
                    num_obstacles=args.num_obst,
                ),
            ],
        )
    else:
        panda_self_link = LinkSelfDistanceField(margin=0.03)
        panda_collision_link = LinkDistanceField()
        panda_goal = EESE3DistanceField(target_h=target_h)
        cost = CostComposite.create(
            n_dof,
            traj_len,
            [
                cost_gp,
                cost_goal_prior,
                CostCollision.create(n_dof, traj_len, panda_self_link, sigma_coll=0.01),
                CostCollision.create(n_dof, traj_len, panda_collision_link, sigma_coll=0.01),
                CostGoal.create(n_dof, traj_len, panda_goal, sigma_goal=0.00007),
            ],
            fk=chain.fk,
        )

    planner = StochGPMP(
        num_particles_per_goal=num_particles_per_goal,
        num_samples=num_samples,
        traj_len=traj_len,
        dt=dt,
        n_dof=n_dof,
        opt_iters=1,
        temperature=1.0,
        start_state=start_state,
        multi_goal_states=multi_goal_states,
        cost=cost,
        step_size=0.1,
        sigma_start_init=0.0001,
        sigma_goal_init=0.1,
        sigma_gp_init=0.8,
        sigma_start_sample=0.001,
        sigma_goal_sample=0.07,
        sigma_gp_sample=0.1,
        seed=args.seed,
        dtype=dtype,
    )

    # spawn static sphere obstacles (reference example ranges)
    obst_range_lower = np.array([0.6, -0.2, 0.6])
    obst_range_upper = np.array([1.0, 0.2, 1.0])
    obstacle_spheres = np.zeros((1, args.num_obst, 4))
    for i in range(args.num_obst):
        r, pos = random_init_static_sphere(
            0.1, 0.2, obst_range_lower, obst_range_upper, 0.01, rng=rng
        )
        obstacle_spheres[0, i, :3] = pos
        obstacle_spheres[0, i, 3] = r
    obs = {"obstacle_spheres": jnp.asarray(obstacle_spheres, dtype=dtype)}

    t_start = time.time()
    chunk = 50
    for i in range(0, args.iters, chunk):
        t0 = time.time()
        trajectory_means, _, trajectories, _, costs, _ = planner.optimize(
            opt_iters=min(chunk, args.iters - i), observation=obs
        )
        print(
            f"iter {min(i + chunk, args.iters):4d}/{args.iters} | chunk {time.time() - t0:.3f}s "
            f"| total {time.time() - t_start:.2f}s | mean cost {float(np.asarray(costs).mean()):.1f}"
        )

    # report final EE distance to target
    means = np.asarray(planner.particle_means)
    ee = np.asarray(chain.ee_pose(jnp.asarray(means[:, -1, :n_dof])))
    dist = np.linalg.norm(ee[:, :3, 3] - target_pos, axis=-1)
    print(f"final EE->target distances: {np.round(dist, 4)}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
        for p_idx in range(means.shape[0]):
            for t in range(0, traj_len, 8):
                links = np.asarray(chain.fk(jnp.asarray(means[p_idx, t, :n_dof])))
                pts = links[:, :3, 3]
                ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "b-", alpha=0.3)
        ax.plot([target_pos[0]], [target_pos[1]], [target_pos[2]], "r*", markersize=10)
        ax.scatter(
            obstacle_spheres[0, :, 0], obstacle_spheres[0, :, 1],
            obstacle_spheres[0, :, 2], s=obstacle_spheres[0, :, 3] * 2000, color="r",
        )
        fig.savefig(args.plot, dpi=120)
        print(f"saved plot to {args.plot}")


if __name__ == "__main__":
    main()
