"""Multi-chip planar StochGPMP: the one-kwarg mesh API, end to end.

Runs the planar multi-goal workload sharded over a device mesh —
particles data-parallel over the ``p`` axis, Monte-Carlo samples
reduction-parallel over ``s`` (the softmax / weighted-mean all-reduces
ride the mesh; on real hardware that is ICI). With fewer real devices
than requested (e.g. the single-chip dev attachment) it self-provisions
an ``--devices N`` virtual CPU mesh — the same validation mode the
driver's ``dryrun_multichip`` uses — so the sharded program is runnable
anywhere. On a real multi-chip TPU slice, run it with the ambient
backend (drop the re-exec by having enough devices).

Usage: ``python examples/planar_sharded.py [--devices 8] [--iters 200]``
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _ensure_devices(n: int) -> None:
    """Re-exec on a virtual CPU mesh when the backend has < n devices.

    Decided WITHOUT touching the ambient backend: probing a dead remote
    attachment hangs ``jax.devices()`` in-process (see bench.py); and a
    single-chip attachment can't run an n-way mesh anyway. The child is
    marked so one re-exec suffices.
    """
    if os.environ.get("_STOCH_GPMP_SHARDED_CHILD") == "1":
        return
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the remote-backend sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n}".strip()
    )
    env["_STOCH_GPMP_SHARDED_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--native-backend", action="store_true",
                    help="use the ambient backend as-is (real multi-chip "
                    "slice) instead of self-provisioning a virtual CPU mesh")
    args = ap.parse_args()
    if not args.native_backend:
        _ensure_devices(args.devices)

    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    from stoch_gpmp_tpu.costs import (
        CostCollision, CostComposite, CostGP, CostGoalPrior,
    )
    from stoch_gpmp_tpu.envs import generate_obstacle_map
    from stoch_gpmp_tpu.parallel import make_mesh
    from stoch_gpmp_tpu.planners import StochGPMP

    n = min(args.devices, len(jax.devices()))
    mesh = make_mesh(n)
    print(f"mesh: {mesh.devices.shape} over {mesh.shape} "
          f"({jax.default_backend()})")

    n_dof, traj_len, dt = 2, 64, 0.02
    start = jnp.asarray([-9.0, -9.0, 0.0, 0.0])
    goals = jnp.asarray(
        [[9.0, 6, 0, 0], [9, -3, 0, 0], [-3, 9, 0, 0], [9, 9, 0, 0]]
    )
    obst_map, _ = generate_obstacle_map(
        map_dim=(20, 20), cell_size=0.1, random_gen=True, num_obst=15,
        rand_limits=[[-7.5, 7.5]] * 2, rand_rect_shape=[2, 2], rng=args.seed,
    )
    cost = CostComposite.create(n_dof, traj_len, [
        CostGP.create(n_dof, traj_len, start, dt,
                      {"sigma_start": 1e-3, "sigma_gp": 0.1}),
        CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=1e-3),
        CostCollision.create(n_dof, traj_len, obst_map.as_field(),
                             sigma_coll=1e-5),
    ])
    # particles divisible by the p axis, samples by the s axis. Round the
    # per-goal count UP until the total is an exact multiple of the p axis:
    # an uneven shard would silently disable the per-shard fused-quad path
    # (its p % n_p eligibility check) on non-power-of-two device counts.
    n_p, n_goals = mesh.shape["p"], goals.shape[0]
    ppg = max(1, -(-2 * n_p // n_goals))
    while (ppg * n_goals) % n_p:
        ppg += 1
    planner = StochGPMP(
        num_particles_per_goal=ppg, num_samples=16 * mesh.shape["s"],
        traj_len=traj_len, dt=dt, n_dof=n_dof, opt_iters=args.iters,
        start_state=start, multi_goal_states=goals, cost=cost,
        step_size=0.5, temperature=1.0, seed=args.seed,
        sigma_start_init=1e-3, sigma_goal_init=1e-3, sigma_gp_init=20.0,
        sigma_start_sample=1e-3, sigma_goal_sample=1e-3, sigma_gp_sample=3.0,
        mesh=mesh,
    )
    t0 = time.time()
    _, _, _, _, costs, _ = planner.optimize()
    means = np.asarray(planner.particle_means)
    el = time.time() - t0
    assert np.isfinite(means).all()
    n_shards = len(planner.particle_means.sharding.device_set)
    final = means[:, -1, :n_dof]
    dists = np.linalg.norm(
        final[:, None] - np.asarray(goals)[None, :, :n_dof], axis=-1
    ).min(axis=1)
    print(f"{args.iters} sharded iterations over {n_shards} devices "
          f"in {el:.2f}s | mean cost {float(np.asarray(costs).mean()):.1f}")
    print(f"final distance to nearest goal per particle: "
          f"{np.round(dists, 3)}")


if __name__ == "__main__":
    main()
