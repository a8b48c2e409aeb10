"""Success-rate parity evaluation: ours (f32) vs the PyTorch reference (f64)
on the same planar problems.

Success criterion per (seed, goal): after optimization, at least one particle
mean trajectory for that goal (a) ends within ``GOAL_TOL`` of the goal
position, (b) starts within ``START_TOL`` of the start, and (c) is
collision-free under the occupancy grid. The reference side is skipped when
its checkout/torch is unavailable.

Usage: ``python benchmarks/success_rate.py [--seeds 5] [--iters 300] [--skip-reference]``
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_DOF = 2
TRAJ_LEN = 32
DT = 0.02
PPG = 4
NUM_SAMPLES = 64
GOAL_TOL = 1.0
START_TOL = 0.5
START = np.asarray([-9.0, -9.0, 0.0, 0.0])
GOALS = np.asarray([[9.0, 6.0, 0.0, 0.0], [9.0, -3.0, 0.0, 0.0], [-3.0, 9.0, 0.0, 0.0]])
PLANNER_SIGMAS = dict(
    sigma_start_init=1e-3, sigma_goal_init=1e-3, sigma_gp_init=20.0,
    sigma_start_sample=1e-3, sigma_goal_sample=1e-3, sigma_gp_sample=3.0,
)
COST_SIGMAS = {"sigma_start": 0.001, "sigma_gp": 0.1}
SIGMA_GOAL_PRIOR = 0.001
SIGMA_COLL = 1e-5
MAP_KW = dict(
    map_dim=(20, 20), cell_size=0.1, random_gen=True, num_obst=10,
    rand_limits=[[-7.5, 7.5], [-7.5, 7.5]], rand_rect_shape=[2, 2],
)


def _success(means: np.ndarray, grid_cost) -> np.ndarray:
    """``means [G, PPG, T, 4]`` -> per-goal success bools."""
    end_ok = (
        np.linalg.norm(means[:, :, -1, :2] - GOALS[:, None, :2], axis=-1) < GOAL_TOL
    )
    start_ok = (
        np.linalg.norm(means[:, :, 0, :2] - START[None, None, :2], axis=-1) < START_TOL
    )
    coll = grid_cost(means[..., :2].reshape(-1, TRAJ_LEN, 2))  # [G*PPG, T]
    coll_free = (np.asarray(coll).reshape(means.shape[0], means.shape[1], TRAJ_LEN) == 0).all(-1)
    return (end_ok & start_ok & coll_free).any(axis=1)


def run_ours(seed: int, iters: int):
    import jax.numpy as jnp

    from stoch_gpmp_tpu.costs import (
        CostCollision, CostComposite, CostGP, CostGoalPrior,
    )
    from stoch_gpmp_tpu.envs import generate_obstacle_map
    from stoch_gpmp_tpu.planners import StochGPMP

    dtype = jnp.float32
    obst_map, _ = generate_obstacle_map(rng=seed, dtype=dtype, **MAP_KW)
    start = jnp.asarray(START, dtype=dtype)
    goals = jnp.asarray(GOALS, dtype=dtype)
    cost = CostComposite.create(
        N_DOF, TRAJ_LEN,
        [
            CostGP.create(N_DOF, TRAJ_LEN, start, DT, COST_SIGMAS, dtype=dtype),
            CostGoalPrior.create(N_DOF, TRAJ_LEN, goals, SIGMA_GOAL_PRIOR, dtype=dtype),
            CostCollision.create(N_DOF, TRAJ_LEN, obst_map.as_field(), SIGMA_COLL),
        ],
    )
    planner = StochGPMP(
        num_particles_per_goal=PPG, num_samples=NUM_SAMPLES, traj_len=TRAJ_LEN,
        dt=DT, n_dof=N_DOF, opt_iters=1, start_state=start,
        multi_goal_states=goals, cost=cost, step_size=0.5, seed=seed,
        dtype=dtype, **PLANNER_SIGMAS,
    )
    planner.optimize(opt_iters=iters)
    means = np.asarray(planner.particle_means).reshape(len(GOALS), PPG, TRAJ_LEN, 4)
    return _success(means, lambda x: obst_map.compute_cost(jnp.asarray(x)))


def run_reference(seed: int, iters: int):
    sys.path.insert(0, "/root/reference")
    import random

    import torch

    from stoch_gpmp.costs.cost_functions import (
        CostCollision, CostComposite, CostGP, CostGoalPrior,
    )
    from stoch_gpmp.envs.map_generator import generate_obstacle_map
    from stoch_gpmp.planner import StochGPMP

    ta = {"device": torch.device("cpu"), "dtype": torch.float64}
    random.seed(seed)
    obst_map = generate_obstacle_map(tensor_args=ta, **{k: v for k, v in MAP_KW.items()})[0]
    start = torch.from_numpy(START)
    goals = torch.from_numpy(GOALS)
    cost = CostComposite(
        N_DOF, TRAJ_LEN,
        [
            CostGP(N_DOF, TRAJ_LEN, start, DT, COST_SIGMAS, ta),
            CostGoalPrior(N_DOF, TRAJ_LEN, multi_goal_states=goals,
                          num_particles_per_goal=PPG, num_samples=NUM_SAMPLES,
                          sigma_goal_prior=SIGMA_GOAL_PRIOR, tensor_args=ta),
            CostCollision(N_DOF, TRAJ_LEN, field=obst_map, sigma_coll=SIGMA_COLL,
                          tensor_args=ta),
        ],
        tensor_args=ta,
    )
    planner = StochGPMP(
        num_particles_per_goal=PPG, num_samples=NUM_SAMPLES, traj_len=TRAJ_LEN,
        dt=DT, n_dof=N_DOF, opt_iters=1, start_state=start,
        multi_goal_states=goals, cost=cost, step_size=0.5, seed=seed,
        tensor_args=ta, **PLANNER_SIGMAS,
    )
    for _ in range(iters):
        planner.optimize()
    means = planner.particle_means.reshape(len(GOALS), PPG, TRAJ_LEN, 4).numpy()
    return _success(means, lambda x: obst_map.compute_cost(torch.from_numpy(x)).numpy())


def wilson_interval(k: int, n: int, z: float = 1.96) -> tuple[float, float]:
    """95% Wilson score interval for a binomial proportion."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, center - half), min(1.0, center + half))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    ours = np.concatenate([run_ours(s, args.iters) for s in range(args.seeds)])
    lo, hi = wilson_interval(int(ours.sum()), int(ours.size))
    print(json.dumps({
        "planner": "stoch_gpmp_tpu (v5e/CPU f32)",
        "success_rate": round(float(ours.mean()), 3),
        "episodes": int(ours.size),
        "wilson95": [round(lo, 3), round(hi, 3)],
    }), flush=True)

    if not args.skip_reference:
        try:
            ref = np.concatenate(
                [run_reference(s, args.iters) for s in range(args.seeds)]
            )
            lo, hi = wilson_interval(int(ref.sum()), int(ref.size))
            print(json.dumps({
                "planner": "reference stoch_gpmp (torch CPU f64)",
                "success_rate": round(float(ref.mean()), 3),
                "episodes": int(ref.size),
                "wilson95": [round(lo, 3), round(hi, 3)],
            }), flush=True)
        except Exception as e:  # pragma: no cover
            print(json.dumps({"reference": f"unavailable: {e}"}), flush=True)


if __name__ == "__main__":
    main()
