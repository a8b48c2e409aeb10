"""Planar multi-goal StochGPMP demo (parity with the reference's
``examples/planar_environment.py``): a 2-DOF point mass plans from a fixed
start to 3 goals through a random 20x20 obstacle map.

Run: ``python examples/planar_environment.py [--iters 500] [--fast]
[--traj-len 64] [--plot out.png] [--animate out.gif] [--live]``

``--traj-len`` beyond ~512 (M > 2048) switches the planner to long-horizon
mode: the structured square-root prior with the parallel-in-time
(associative-scan) sampler and — with ``--fast`` — the plane-layout optimize
pipeline, all automatic. The reference is O(T^3) dense in this regime.

``--animate`` saves the reference's live sample-cloud animation
(``planar_environment.py:110-134``: red sample trajectories + blue means
redrawn as optimization progresses) as a GIF; ``--live`` replays it in an
interactive window (needs a display).
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
from stoch_gpmp_tpu.costs.fields import OccupancyGridField
from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
from stoch_gpmp_tpu.envs import generate_obstacle_map
from stoch_gpmp_tpu.planners import StochGPMP
from stoch_gpmp_tpu.utils import print_info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--traj-len", type=int, default=64,
                    help="horizon; >512 engages long-horizon mode (pscan sampler, plane pipeline)")
    ap.add_argument("--seed", type=int, default=int(time.time()))
    ap.add_argument("--fast", action="store_true", help="fused quad cost + one-hot grid + hw RNG")
    ap.add_argument("--plot", type=str, default=None, help="save trajectory plot to this file")
    ap.add_argument("--animate", type=str, default=None,
                    help="save the optimization animation (gif) to this file")
    ap.add_argument("--live", action="store_true",
                    help="replay the animation in an interactive window")
    args = ap.parse_args()

    dtype = jnp.float32
    n_dof, traj_len, dt = 2, args.traj_len, 0.02
    num_particles_per_goal, num_samples = 5, 128

    start_state = jnp.asarray([-9.0, -9.0, 0.0, 0.0], dtype=dtype)
    multi_goal_states = jnp.asarray(
        [[9, 6, 0.0, 0.0], [9, -3, 0.0, 0.0], [-3, 9, 0.0, 0.0]], dtype=dtype
    )

    obst_map, _obst_list = generate_obstacle_map(
        map_dim=(20, 20),
        cell_size=0.1,
        random_gen=True,
        num_obst=15,
        rand_limits=[[-7.5, 7.5], [-7.5, 7.5]],
        rand_rect_shape=[2, 2],
        rng=args.seed,
        dtype=dtype,
    )
    field = obst_map.as_field()
    if args.fast:
        if 2 * n_dof * traj_len > 2048:
            # plane-capable exact raster field (long-horizon plane pipeline)
            from stoch_gpmp_tpu.costs.fields import RasterPrimitive2DField

            field = RasterPrimitive2DField.from_map(obst_map, _obst_list, dtype=dtype)
        else:
            field = OccupancyGridField(grid=field.grid, cell_size=field.cell_size, lookup="onehot")

    cost_prior = CostGP.create(
        n_dof, traj_len, start_state, dt,
        {"sigma_start": 0.001, "sigma_gp": 0.1}, dtype=dtype,
    )
    cost_goal_prior = CostGoalPrior.create(
        n_dof, traj_len, multi_goal_states, sigma_goal_prior=0.001, dtype=dtype
    )
    long_horizon = 2 * n_dof * traj_len > 2048
    if args.fast and not long_horizon:
        quad = QuadraticCost.from_gp_and_goal_prior(cost_prior, cost_goal_prior, traj_len)
        cost_list = [quad]
    else:
        cost_list = [cost_prior, cost_goal_prior]
    cost_list.append(CostCollision.create(n_dof, traj_len, field, sigma_coll=1e-5))
    cost = CostComposite.create(n_dof, traj_len, cost_list)

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
        step_size=0.5,
        sigma_start_init=1e-3,
        sigma_goal_init=1e-3,
        sigma_gp_init=20.0,
        sigma_start_sample=1e-3,
        sigma_goal_sample=1e-3,
        sigma_gp_sample=3.0,
        seed=args.seed,
        dtype=dtype,
        prng_impl="unsafe_rbg" if args.fast else None,
    )

    start_time = time.time()
    record = args.animate or args.live
    # the reference snapshots samples every 25 iterations for its live
    # animation (planar_environment.py:105-111)
    chunk = 25 if record else 50
    traj_history = []
    for i in range(0, args.iters, chunk):
        t0 = time.time()
        _, _, _, _, costs, _ = planner.optimize(opt_iters=min(chunk, args.iters - i))
        print_info(
            min(i + chunk, args.iters), args.iters, t0, start_time,
            np.asarray(costs),
        )
        if record:
            pos, _ = planner.get_recent_samples()
            traj_history.append(
                (np.asarray(pos), np.asarray(planner.particle_means))
            )

    if record:
        import matplotlib

        if not args.live:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        x = np.linspace(-10, 10, obst_map.map.shape[1])
        y = np.linspace(-10, 10, obst_map.map.shape[0])
        g = np.asarray(multi_goal_states)
        fig, ax = plt.subplots(figsize=(6, 6))

        def draw(frame):
            pos, means = traj_history[frame]
            ax.clear()
            ax.contourf(x, y, obst_map.map, 20)
            for p in range(pos.shape[0]):
                for s in range(0, pos.shape[1], max(1, pos.shape[1] // 8)):
                    ax.plot(pos[p, s, :, 0], pos[p, s, :, 1], "r", alpha=0.15)
            for p in range(means.shape[0]):
                ax.plot(means[p, :, 0], means[p, :, 1], "b")
            ax.plot(g[:, 0], g[:, 1], "g*", markersize=12)
            ax.set_title(f"iteration {(frame + 1) * chunk}")

        if args.animate:
            from matplotlib.animation import FuncAnimation, PillowWriter

            anim = FuncAnimation(fig, draw, frames=len(traj_history))
            anim.save(args.animate, writer=PillowWriter(fps=4))
            print(f"saved animation to {args.animate}")
        if args.live:  # pragma: no cover - needs a display
            plt.ion()
            for f in range(len(traj_history)):
                draw(f)
                plt.draw()
                plt.pause(0.1)
            plt.ioff()
            plt.show()

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 7))
        x = np.linspace(-10, 10, obst_map.map.shape[1])
        y = np.linspace(-10, 10, obst_map.map.shape[0])
        ax.contourf(x, y, obst_map.map, 20)
        trajs, _ = planner.get_recent_samples()
        trajs = np.asarray(trajs)
        for p in range(trajs.shape[0]):
            for s in range(0, trajs.shape[1], 16):
                ax.plot(trajs[p, s, :, 0], trajs[p, s, :, 1], "r", alpha=0.15)
        means = np.asarray(planner.particle_means)
        for p in range(means.shape[0]):
            ax.plot(means[p, :, 0], means[p, :, 1], "b")
        g = np.asarray(multi_goal_states)
        ax.plot(g[:, 0], g[:, 1], "g*", markersize=12)
        fig.savefig(args.plot, dpi=120)
        print(f"saved plot to {args.plot}")


if __name__ == "__main__":
    main()
