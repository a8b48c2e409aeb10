"""Closed-loop Panda success-rate evaluation — native AND reference planners.

Plans with StochGPMP (7-DOF, sphere obstacles, SE(3) goal), then executes the
best particle-mean trajectory as position targets in the native ``PandaEnv``
with the same obstacles; success = EE within 0.125 m of the target
(reference ``envs/panda.py:489``) with no contact.

``--planner reference`` runs the ACTUAL reference implementation
(`/root/reference` ``stoch_gpmp``, torch CPU float64) through the
``torch_robotics`` shim (``benchmarks/reference_panda_shim.py`` — a torch FK
bit-identical to the native chain), on the SAME episodes (same start, IK
goal, obstacle spheres, selection rule, env, criterion) — a true
reference-vs-native A/B instead of self-judged parity.

Usage: ``python benchmarks/success_rate_panda.py [--seeds 5] [--iters 300]
[--physics kinematic|dynamics] [--planner native|reference]``
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run_episode(seed: int, iters: int, physics: str = "kinematic",
                planner_kind: str = "native",
                contact_model: str = "spheres",
                render_gif: str | None = None,
                live: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from stoch_gpmp_tpu.costs import (
        CostCollision, CostComposite, CostGP, CostGoal, CostGoalPrior,
        EESE3DistanceField, LinkSelfDistanceField, MeshSphereDistanceField,
        MeshSphereFloorField,
    )
    from stoch_gpmp_tpu.envs.panda_env import PandaEnv, random_init_static_sphere
    from stoch_gpmp_tpu.kinematics import homogeneous, y_rot, z_rot
    from stoch_gpmp_tpu.kinematics.ik import solve_ik_multistart
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda
    from stoch_gpmp_tpu.planners import StochGPMP

    dtype = jnp.float32
    traj_len, dt = 32, 0.05
    rng = np.random.default_rng(seed)
    chain = franka_panda(dtype=dtype)
    n_dof = chain.n_dofs

    target_pos = np.array([0.3, 0.3, 0.3]) + rng.uniform(-0.05, 0.05, 3)
    target_rot = z_rot(jnp.asarray(-np.pi, dtype=dtype)) @ y_rot(jnp.asarray(-np.pi, dtype=dtype))
    target_h = homogeneous(target_rot, jnp.asarray(target_pos, dtype=dtype))

    start_q = jnp.asarray([0.012, -0.57, 0.0, -2.81, 0.0, 3.037, 0.741], dtype=dtype)
    start_state = jnp.concatenate([start_q, jnp.zeros_like(start_q)])
    q_goal = solve_ik_multistart(
        chain, target_h, jax.random.PRNGKey(seed), num_starts=16,
        q_init=start_q, num_iters=150,
    )
    goals = jnp.concatenate([q_goal, jnp.zeros_like(q_goal)])[None]

    # obstacles away from start/goal (reference example spawn box).
    # random_init_static_sphere interpolates only ONE coordinate inside the
    # box — the others are raw rand() draws (reference panda.py:54-58), so a
    # sphere can legally spawn ON the robot's base column, making the episode
    # unwinnable (seed 0 spawned 1.7 cm from the static link-1 origin).
    # Rejection-resample such spawns, mirroring the reference map generator's
    # retry pattern (map_generator.py:64-89).
    # mesh-decomposition collision spheres in world frame at a given pose
    # (kinematics/panda_collision.py — the geometry the env's default
    # contact check uses since round 3)
    from stoch_gpmp_tpu.kinematics.panda_collision import (
        PANDA_COLLISION_SPHERES,
    )

    fk_names = list(chain.link_names)

    def world_mesh_spheres(link_poses):  # [.., L, 4, 4] -> centers, radii
        cs, rs = [], []
        for frame, sph in PANDA_COLLISION_SPHERES.items():
            c, r = np.asarray(sph[:, :3]), np.asarray(sph[:, 3])
            if frame in fk_names:
                h = link_poses[..., fk_names.index(frame), :, :]
                cw = c @ np.swapaxes(h[..., :3, :3], -1, -2) + h[..., None, :3, 3]
            else:  # static base (panda_link0): world frame
                cw = np.broadcast_to(
                    c, link_poses.shape[:-3] + c.shape
                )
            cs.append(cw)
            rs.append(r)
        return np.concatenate(cs, axis=-2), np.concatenate(rs)

    start_poses = np.asarray(chain.fk(start_q[None]))[0]  # [L, 4, 4]
    start_cw, start_rw = world_mesh_spheres(start_poses)
    spheres = np.zeros((1, 5, 4))
    for i in range(5):
        for _ in range(50):
            r, pos = random_init_static_sphere(
                0.1, 0.2, np.array([0.6, -0.2, 0.6]), np.array([1.0, 0.2, 1.0]),
                0.01, rng=rng,
            )
            # spawn clearance vs the MESH surface (incl. the static base) —
            # a spawn touching the real geometry is unwinnable by definition
            clearance = (
                np.linalg.norm(start_cw - pos, axis=-1) - start_rw
            ).min() - r
            if clearance > 0.1:
                break
        spheres[0, i, :3] = pos
        spheres[0, i, 3] = r
    # plan against radius-inflated obstacles: the env flags contact when a
    # link ORIGIN comes within radius + buffer (envs/panda_env.py), so the
    # planner keeps a safety margin beyond the true surface
    spheres_plan = spheres.copy()
    spheres_plan[0, :, 3] += 0.05
    obs = {"obstacle_spheres": jnp.asarray(spheres_plan, dtype=dtype)}

    cost = CostComposite.create(
        n_dof, traj_len,
        [
            CostGP.create(n_dof, traj_len, start_state, dt,
                          {"sigma_start": 0.0001, "sigma_gp": 0.0007}, dtype=dtype),
            CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=20.0, dtype=dtype),
            CostCollision.create(n_dof, traj_len, LinkSelfDistanceField(margin=0.03), sigma_coll=0.01),
            # round 3: plan against the MESH volume (the geometry the env's
            # contact check uses) — link-origin planning left 8/25 episodes
            # touching the real surface
            CostCollision.create(
                n_dof, traj_len,
                (mesh_field := MeshSphereDistanceField.for_panda(chain, dtype=dtype)),
                sigma_coll=0.01,
            ),
            # floor avoidance over the same mesh volume (the env's floor
            # check is sphere-conservative; plans must keep the volume clear)
            CostCollision.create(
                n_dof, traj_len, MeshSphereFloorField(mesh=mesh_field),
                sigma_coll=0.01,
            ),
            CostGoal.create(n_dof, traj_len, EESE3DistanceField(target_h=target_h), sigma_goal=0.00007),
        ],
        fk=chain.fk,
    )
    if planner_kind == "reference":
        from reference_panda_shim import plan_with_reference

        means = plan_with_reference(
            np.asarray(start_state), np.asarray(goals),
            np.asarray(target_h, dtype=np.float64),
            np.asarray(spheres_plan), traj_len=traj_len, dt=dt,
            num_particles_per_goal=4, num_samples=32, opt_iters=iters,
            seed=seed,
        ).astype(np.float32)
    else:
        planner = StochGPMP(
            num_particles_per_goal=4, num_samples=32, traj_len=traj_len, dt=dt,
            n_dof=n_dof, opt_iters=1, start_state=start_state,
            multi_goal_states=goals, cost=cost, step_size=0.1,
            sigma_start_init=0.0001, sigma_goal_init=0.1, sigma_gp_init=0.8,
            sigma_start_sample=0.001, sigma_goal_sample=0.07, sigma_gp_sample=0.1,
            seed=seed, dtype=dtype,
        )
        planner.optimize(opt_iters=iters, observation=obs)
        means = np.asarray(planner.particle_means)

    # collision-aware particle selection: among particles whose whole plan
    # keeps the MESH-decomposition surface clear of every (true-radius)
    # obstacle with margin, pick the one whose final EE is closest to the
    # target; fall back to the globally closest if none is clean
    ee = np.asarray(chain.ee_pose(jnp.asarray(means[:, -1, :n_dof])))
    ee_dist = np.linalg.norm(ee[:, :3, 3] - target_pos, axis=-1)
    p_, t_ = means.shape[0], means.shape[1]
    plan_poses = np.asarray(
        chain.fk(jnp.asarray(means[..., :n_dof].reshape(-1, n_dof)))
    ).reshape(p_, t_, -1, 4, 4)
    cw, rw = world_mesh_spheres(plan_poses)  # [P, T, N, 3], [N]
    d = (
        np.linalg.norm(
            cw[..., None, :] - spheres[0, :, :3], axis=-1
        )
        - rw[None, None, :, None]
        - spheres[0, :, 3]
    )  # [P, T, N, O] mesh-surface to obstacle-surface distances
    # floor clearance of the arm volume along the plan (exclude the base
    # column spheres, which legitimately sit at the floor)
    n_base = len(PANDA_COLLISION_SPHERES["panda_link0"]) + len(
        PANDA_COLLISION_SPHERES["panda_link1"]
    )
    floor_clear = (cw[..., 2] - rw[None, None, :])[:, :, n_base:].min(
        axis=(1, 2)
    )
    clean = (d.min(axis=(1, 2, 3)) > 0.03) & (floor_clear > 0.02)
    import os
    if os.environ.get("SRP_DEBUG"):
        print("DBG obst_clear:", d.min(axis=(1, 2, 3)).round(3),
              "floor_clear:", floor_clear.round(3), "clean:", clean, flush=True)
    if np.any(clean):
        cand = np.where(clean)[0]
        best = int(cand[np.argmin(ee_dist[cand])])
    else:
        best = int(np.argmin(ee_dist))
    plan_q = means[best, :, :n_dof]

    # closed-loop execution in the env with the same obstacles
    env = PandaEnv(num_obst=5, seed=seed, frequency=24, physics=physics,
                   contact_model=contact_model,
                   render="live" if live else render_gif is not None)
    env.reset()
    env.panda.reset(q=np.asarray(start_q))
    for i, s in enumerate(env.spheres):
        s.base_position = spheres[0, i, :3].copy()
        s.scale = float(spheres[0, i, 3])
        s.base_linear_velocity = np.zeros(3)
    env.set_goals([target_pos, target_pos + np.array([0, 0, 100.0])])

    contact = False
    contact_by_model = {"spheres": False, "points": False}
    for t in range(plan_q.shape[0]):
        for _ in range(4):  # let the arm track each waypoint
            _, _, done, info = env.step(plan_q[t])
            for k in contact_by_model:
                contact_by_model[k] |= env.contact_verdicts[k]
        contact = contact or env.is_contact
        if env.goal_reached[0]:
            break
    ee_final, _ = env.panda.getEEPositionAndOrientation()
    dist = float(np.linalg.norm(ee_final - target_pos))
    if render_gif is not None:
        env.save_animation(f"{render_gif}_seed{seed}.gif", fps=20, stride=2)
    return {
        "seed": seed,
        "goal_reached": bool(env.goal_reached[0]),
        "contact": bool(contact),
        "contact_mesh_spheres": bool(contact_by_model["spheres"]),
        "contact_points_legacy": bool(contact_by_model["points"]),
        "final_ee_dist": round(dist, 4),
        "success": bool(env.goal_reached[0] and not contact),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--physics", choices=["kinematic", "dynamics"], default="kinematic",
                    help="arm stepping: velocity-limited tracker or computed-torque PD over RNEA forward dynamics")
    ap.add_argument("--planner", choices=["native", "reference"], default="native",
                    help="native = this framework; reference = /root/reference stoch_gpmp (torch CPU f64, torch_robotics shim)")
    ap.add_argument("--contact-model", choices=["spheres", "points"],
                    default="spheres",
                    help="contact geometry deciding success: 'spheres' = "
                    "92-sphere decomposition of the actual collision meshes "
                    "(default); 'points' = legacy link-origin check. BOTH "
                    "verdicts are reported per episode either way.")
    ap.add_argument("--render-gif", type=str, default=None,
                    help="save each episode's 3D view as PREFIX_seedN.gif "
                    "(the native equivalent of the reference's "
                    "PandaEnv(render=True) PyBullet GUI)")
    ap.add_argument("--live", action="store_true",
                    help="redraw a live 3D matplotlib window as each "
                    "episode executes (interactive backends only show it; "
                    "headless Agg redraws offscreen)")
    args = ap.parse_args()
    # stream each episode's verdict as it finishes (a long multi-seed run
    # that gets interrupted still leaves per-episode evidence in its log)
    results = []
    for s in range(args.seeds):
        r = run_episode(s, args.iters, physics=args.physics,
                        planner_kind=args.planner,
                        contact_model=args.contact_model,
                        render_gif=args.render_gif, live=args.live)
        print(json.dumps(r), flush=True)
        results.append(r)
    from success_rate import wilson_interval

    k = int(np.sum([r["success"] for r in results]))
    rate = k / len(results)
    lo, hi = wilson_interval(k, len(results))
    print(json.dumps({
        "planner": f"{args.planner} panda closed-loop",
        "physics": args.physics,
        "contact_model": args.contact_model,
        "success_rate": round(rate, 3),
        "wilson95": [round(lo, 3), round(hi, 3)],
        "episodes": len(results),
        "mesh_sphere_contacts": int(np.sum([r["contact_mesh_spheres"] for r in results])),
        "legacy_point_contacts": int(np.sum([r["contact_points_legacy"] for r in results])),
        "criterion": "EE within 0.125 m, no contact (reference envs/panda.py:489)",
    }), flush=True)


if __name__ == "__main__":
    main()
