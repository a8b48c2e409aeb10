"""Measure the PyTorch reference's wall-clock per iteration (CPU float64).

Requires the reference checkout at /root/reference and torch. The Panda
config runs through the ``torch_robotics`` shim
(``benchmarks/reference_panda_shim.py`` — torch FK bit-identical to the
native chain). Recorded in BASELINE.md.

Usage: ``python benchmarks/reference_baseline.py [--iters 20] [--ppg 64]
[--panda] [--long-horizon-t T]``
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

from stoch_gpmp.costs.cost_functions import (  # noqa: E402
    CostCollision,
    CostComposite,
    CostGP,
    CostGoalPrior,
)
from stoch_gpmp.envs.map_generator import generate_obstacle_map  # noqa: E402
from stoch_gpmp.planner import StochGPMP  # noqa: E402

TA = {"device": torch.device("cpu"), "dtype": torch.float64}


def planar(ppg: int, num_samples: int, iters: int, traj_len: int = 64,
           label: str = None):
    import random

    random.seed(0)
    n_dof, dt = 2, 0.02
    start_state = torch.tensor([-9.0, -9.0, 0.0, 0.0], **TA)
    goals = torch.tensor(
        [[9, 6, 0.0, 0.0], [9, -3, 0.0, 0.0], [-3, 9, 0.0, 0.0]], **TA
    )
    obst_map = generate_obstacle_map(
        map_dim=[20, 20], obst_list=[], cell_size=0.1, random_gen=True,
        num_obst=15, rand_limits=[[-7.5, 7.5], [-7.5, 7.5]],
        rand_rect_shape=[2, 2], tensor_args=TA,
    )[0]
    cost = CostComposite(
        n_dof, traj_len,
        [
            CostGP(n_dof, traj_len, start_state, dt,
                   {"sigma_start": 0.001, "sigma_gp": 0.1}, TA),
            CostGoalPrior(n_dof, traj_len, multi_goal_states=goals,
                          num_particles_per_goal=ppg, num_samples=num_samples,
                          sigma_goal_prior=0.001, tensor_args=TA),
            CostCollision(n_dof, traj_len, field=obst_map, sigma_coll=1e-5,
                          tensor_args=TA),
        ],
        tensor_args=TA,
    )
    planner = StochGPMP(
        num_particles_per_goal=ppg, num_samples=num_samples, traj_len=traj_len,
        dt=dt, n_dof=n_dof, opt_iters=1, temperature=1.0,
        start_state=start_state, multi_goal_states=goals, cost=cost,
        step_size=0.5, sigma_start_init=1e-3, sigma_goal_init=1e-3,
        sigma_gp_init=20.0, sigma_start_sample=1e-3, sigma_goal_sample=1e-3,
        sigma_gp_sample=3.0, seed=0, tensor_args=TA,
    )
    planner.optimize()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        planner.optimize()
    elapsed = time.perf_counter() - t0
    p = planner.num_particles
    return {
        "config": label or f"planar-{ppg}ppg (reference torch CPU f64)",
        "metric": "particle-trajectory updates/sec",
        "value": round(p * iters / elapsed, 2),
        "iters_per_sec": round(iters / elapsed, 3),
        "particles": p,
    }


def prior_draws(iters: int):
    from stoch_gpmp.costs.factors.gp_factor import GPFactor
    from stoch_gpmp.costs.factors.mp_priors_multi import MultiMPPrior

    n_dof, traj_len, dt = 2, 64, 0.02
    d = 2 * n_dof
    start = torch.zeros(d, **TA)
    goals = torch.tensor([[9, 6, 0.0, 0.0], [9, -3, 0.0, 0.0], [-3, 9, 0.0, 0.0]], **TA)
    gp = GPFactor(n_dof, 3.0, dt, traj_len - 1, tensor_args=TA)
    k_s = torch.eye(d, **TA) / 1e-3**2
    k_g = torch.eye(d, **TA) / 1e-3**2
    prior = MultiMPPrior(traj_len - 1, dt, d, n_dof, k_s, gp.Q_inv[0], start,
                         K_g_inv=k_g, goal_states=goals, tensor_args=TA)
    n = 2048
    prior.sample(n)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        prior.sample(n)
    elapsed = time.perf_counter() - t0
    return {
        "config": "gp-prior-draws (reference torch CPU f64)",
        "metric": "trajectory draws/sec",
        "value": round(3 * n * iters / elapsed, 1),
    }


def panda(iters: int, num_goals: int = 1, ppg: int = 5, traj_len: int = 64,
          num_samples: int = 32, label: str = None):
    """Reference Panda config via the torch_robotics shim — float32 like the
    reference example. Defaults = the parity config (1 goal x 5 particles x
    32 samples x T=64, 5 sphere obstacles); pass the scaling shape for the
    config-5 comparison."""
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from reference_panda_shim import install_torch_robotics_shim

    install_torch_robotics_shim()
    from stoch_gpmp.costs.cost_functions import CostGoal
    from stoch_gpmp.costs.fields import (
        EESE3DistanceField, LinkDistanceField, LinkSelfDistanceField,
    )
    from torch_robotics.torch_kinematics_tree.models.robots import (
        DifferentiableFrankaPanda,
    )

    ta = {"device": torch.device("cpu"), "dtype": torch.float32}
    n_dof, dt = 7, 0.05
    start_q = torch.tensor([0.012, -0.57, 0.0, -2.81, 0.0, 3.037, 0.741], **ta)
    start_state = torch.cat([start_q, torch.zeros_like(start_q)])
    rng_g = np.random.default_rng(0)
    goals_q = start_q.unsqueeze(0) + torch.as_tensor(
        rng_g.uniform(-0.3, 0.3, (num_goals, n_dof)), dtype=torch.float32
    )
    goals = torch.cat([goals_q, torch.zeros_like(goals_q)], dim=-1)
    target_h = torch.eye(4, **ta)
    target_h[:3, 3] = torch.tensor([0.3, 0.3, 0.3], **ta)
    fk = DifferentiableFrankaPanda(gripper=False, device="cpu")
    cost = CostComposite(
        n_dof, traj_len,
        [
            CostGP(n_dof, traj_len, start_state, dt,
                   {"sigma_start": 0.0001, "sigma_gp": 0.0007}, ta),
            CostGoalPrior(n_dof, traj_len, multi_goal_states=goals,
                          num_particles_per_goal=ppg, num_samples=num_samples,
                          sigma_goal_prior=20.0, tensor_args=ta),
            CostCollision(n_dof, traj_len,
                          field=LinkSelfDistanceField(margin=0.03, tensor_args=ta),
                          sigma_coll=0.01),
            CostCollision(n_dof, traj_len,
                          field=LinkDistanceField(tensor_args=ta),
                          sigma_coll=0.01),
            CostGoal(n_dof, traj_len,
                     field=EESE3DistanceField(target_h, tensor_args=ta),
                     sigma_goal=0.00007),
        ],
        FK=fk.compute_forward_kinematics_all_links,
    )
    planner = StochGPMP(
        num_particles_per_goal=ppg, num_samples=num_samples, traj_len=traj_len,
        dt=dt, n_dof=n_dof, opt_iters=1, temperature=1.0,
        start_state=start_state, multi_goal_states=goals, cost=cost,
        step_size=0.1, sigma_start_init=0.0001, sigma_goal_init=0.1,
        sigma_gp_init=0.8, sigma_start_sample=0.001, sigma_goal_sample=0.07,
        sigma_gp_sample=0.1, seed=0, tensor_args=ta,
    )
    rng = np.random.default_rng(0)
    spheres = np.zeros((1, 5, 4))
    spheres[0, :, :3] = rng.uniform([0.6, -0.2, 0.6], [1.0, 0.2, 1.0], (5, 3))
    spheres[0, :, 3] = rng.uniform(0.1, 0.2, 5)
    obs = {"obstacle_spheres": torch.as_tensor(spheres).to(**ta)}
    planner.optimize(**obs)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        planner.optimize(**obs)
    elapsed = time.perf_counter() - t0
    p = planner.num_particles
    return {
        "config": label or "panda-parity (reference torch CPU f32, torch_robotics shim)",
        "metric": "particle-trajectory updates/sec",
        "value": round(p * iters / elapsed, 2),
        "iters_per_sec": round(iters / elapsed, 3),
        "particles": p,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ppg", type=int, default=64)
    ap.add_argument("--panda", action="store_true",
                    help="measure the reference Panda parity config (shim FK)")
    ap.add_argument("--panda-scaling", action="store_true",
                    help="measure the reference at the config-5 shape (10 goals x 128 ppg x T=128)")
    ap.add_argument("--long-horizon-t", type=int, default=0,
                    help="ALSO measure the planar config at this horizon "
                         "(the reference is O(T^3): it densely re-factorizes "
                         "an M x M f64 precision every iteration)")
    args = ap.parse_args()
    torch.manual_seed(0)
    np.random.seed(0)
    if args.panda:
        print(json.dumps(panda(args.iters)), flush=True)
        return
    if args.panda_scaling:
        print(json.dumps(panda(
            max(2, min(args.iters, 5)), num_goals=10, ppg=128, traj_len=128,
            num_samples=8,
            label="panda-scaling-10x128 (reference torch CPU f32, shim FK)",
        )), flush=True)
        return
    if args.long_horizon_t:
        print(json.dumps(planar(
            5, 32, max(2, args.iters), traj_len=args.long_horizon_t,
            label=f"planar-T{args.long_horizon_t} long-horizon "
                  "(reference torch CPU f64)",
        )), flush=True)
        return
    print(json.dumps(prior_draws(args.iters)), flush=True)
    print(json.dumps(planar(args.ppg, 128, args.iters)), flush=True)


if __name__ == "__main__":
    main()
