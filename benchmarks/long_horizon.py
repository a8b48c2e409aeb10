"""Long-horizon planner benchmark: the parallel-in-time + plane-layout path.

Measures whole StochGPMP iterations (15 particles x 32 samples, planar d=4)
at horizons far beyond the reference's T=64, with and without the
15-obstacle collision field, plus the raw sampler solve scan-vs-pscan A/B.
Numbers recorded in docs/PERFORMANCE.md ("Long horizons"). The reference is
O(T^3) here (dense f64 re-factorization per iteration — measure it with
``reference_baseline.py --long-horizon-t T``).

Usage: ``python benchmarks/long_horizon.py [--horizons 1024 4096]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def _problem(t, with_obstacles):
    from stoch_gpmp_tpu.costs import (
        CostCollision, CostComposite, CostGP, CostGoalPrior,
    )
    from stoch_gpmp_tpu.costs.fields import RasterPrimitive2DField
    from stoch_gpmp_tpu.envs import generate_obstacle_map
    from stoch_gpmp_tpu.gp.prior import make_gp_prior
    from stoch_gpmp_tpu.planners import SamplerModel, StochGPMPState

    dtype = jnp.float32
    start = jnp.asarray([-9.0, -9.0, 0, 0], dtype)
    goals = jnp.asarray([[9.0, 6.0, 0, 0]], dtype)
    costs = [
        CostGP.create(2, t, start, 0.02,
                      {"sigma_start": 1e-3, "sigma_gp": 0.1}, dtype=dtype),
        CostGoalPrior.create(2, t, goals, sigma_goal_prior=1e-3, dtype=dtype),
    ]
    if with_obstacles:
        obst_map, obst_list = generate_obstacle_map(
            map_dim=(20, 20), cell_size=0.1, random_gen=True, num_obst=15,
            rand_limits=[[-7.5, 7.5]] * 2, rand_rect_shape=[2, 2], rng=0,
            dtype=dtype,
        )
        field = RasterPrimitive2DField.from_map(
            obst_map, obst_list, use_pallas=False
        )
        costs.append(CostCollision.create(2, t, field, sigma_coll=1e-5))
    cost = CostComposite.create(2, t, costs)
    prior = make_gp_prior(2, t, 0.02, start, 1e-3, 3.0, sigma_goal=1e-3,
                          goal_states=goals, dtype=dtype,
                          materialize_dense=False)
    sampler = SamplerModel.from_prior(prior)
    means = jnp.repeat(prior.means, 15, axis=0)
    state = StochGPMPState(
        particle_means=means, key=jax.random.key(0, impl="unsafe_rbg")
    )
    return sampler, cost, state


def iteration_bench(t, with_obstacles, iters=200, chunks=5):
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    sampler, cost, state = _problem(t, with_obstacles)
    run = jax.jit(lambda st: stoch_gpmp_optimize(
        sampler, cost, st, {}, opt_iters=iters, num_samples=32,
        temperature=1.0, step_size=0.5)[0])
    st = run(state)
    np.asarray(st.particle_means)
    t0 = time.perf_counter()
    for _ in range(chunks):
        st = run(st)
    final = np.asarray(st.particle_means)
    el = (time.perf_counter() - t0) / (iters * chunks)
    assert np.isfinite(final).all()
    return {
        "config": f"planar-T{t}{'-obst' if with_obstacles else ''} long-horizon",
        "metric": "particle-trajectory updates/sec",
        "value": round(15 / el, 1),
        "ms_per_iter": round(el * 1e3, 3),
    }


def solver_bench(t, n_samples=480, iters=50, chunks=4):
    from stoch_gpmp_tpu.gp.prior import make_gp_prior

    prior = make_gp_prior(
        2, t, 0.02, jnp.zeros(4, jnp.float32), 1e-3, 0.5, sigma_goal=1e-3,
        goal_states=jnp.asarray([[9.0, 6.0, 0, 0]], jnp.float32),
        dtype=jnp.float32, materialize_dense=False)
    out = {"config": f"sampler-solve-T{t}", "batch": n_samples}
    for method in ("scan", "pscan"):
        def many(key):
            def body(k, _):
                k, sub = jax.random.split(k)
                s = prior.sample(sub, n_samples, method=method)
                return k, jnp.sum(s) * 1e-9
            k, o = jax.lax.scan(body, key, None, length=iters)
            return o.sum()
        jf = jax.jit(many)
        key = jax.random.key(0, impl="unsafe_rbg")
        float(jf(key))
        t0 = time.perf_counter()
        for _ in range(chunks):
            float(jf(key))
        out[f"{method}_ms"] = round(
            (time.perf_counter() - t0) / (iters * chunks) * 1e3, 3
        )
    return out


def planar_dof_bench(t, with_obstacles, iters=200, chunks=5, mode="dof"):
    """d<=8 long-horizon A/B (VERDICT r3 next #7 / r4 #4) on the SAME planar
    workload. Arms:

    - ``mode='dof'`` — the ``[2T, 2T]`` per-dof dense-apply path
      (``sample_method='dof'``): the fused quadratic's dof form carries the
      stencil and the collision field evaluates on the dof position planes
      directly (``CostCollision.eval_dof_planes``). Requires ``2T <= 2048``
      (the dof factor isn't built beyond).
    - ``mode='flat'`` — the legacy flat path at these horizons: dense
      ``[M, M]`` weight apply + flat quadratic (the pre-round-5 default for
      d<=8 below M=2048; the planner now auto-routes eligible stacks to the
      dof path per this A/B, so the arm strips the sampler's dof factor to
      keep the flat path measurable).

    The pscan plane-path arm (long-horizon rows) comes from
    ``iteration_bench`` (``materialize_dense=False``)."""
    from stoch_gpmp_tpu.costs import (
        CostCollision, CostComposite, CostGP, CostGoalPrior,
    )
    from stoch_gpmp_tpu.costs.fields import RasterPrimitive2DField
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
    from stoch_gpmp_tpu.envs import generate_obstacle_map
    from stoch_gpmp_tpu.gp.prior import make_gp_prior
    from stoch_gpmp_tpu.planners import (
        SamplerModel, StochGPMPState, stoch_gpmp_optimize,
    )

    dtype = jnp.float32
    start = jnp.asarray([-9.0, -9.0, 0, 0], dtype)
    goals = jnp.asarray([[9.0, 6.0, 0, 0]], dtype)
    gp = CostGP.create(2, t, start, 0.02,
                       {"sigma_start": 1e-3, "sigma_gp": 0.1}, dtype=dtype)
    goal_prior = CostGoalPrior.create(2, t, goals, sigma_goal_prior=1e-3,
                                      dtype=dtype)
    costs = [QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t)]
    if with_obstacles:
        obst_map, obst_list = generate_obstacle_map(
            map_dim=(20, 20), cell_size=0.1, random_gen=True, num_obst=15,
            rand_limits=[[-7.5, 7.5]] * 2, rand_rect_shape=[2, 2], rng=0,
            dtype=dtype,
        )
        costs.append(CostCollision.create(
            2, t,
            RasterPrimitive2DField.from_map(obst_map, obst_list,
                                            use_pallas=False),
            sigma_coll=1e-5,
        ))
    cost = CostComposite.create(2, t, costs)
    prior = make_gp_prior(2, t, 0.02, start, 1e-3, 3.0, sigma_goal=1e-3,
                          goal_states=goals, dtype=dtype,
                          materialize_dense=None if mode == "flat" else False)
    sampler = SamplerModel.from_prior(prior)
    state = StochGPMPState(
        particle_means=jnp.repeat(prior.means, 15, axis=0),
        key=jax.random.key(0, impl="unsafe_rbg"),
    )
    sample_method = "dof" if mode == "dof" else "dense"
    if mode == "flat":
        sampler = sampler.replace(dof=None)  # pin the legacy flat path
    run = jax.jit(lambda st: stoch_gpmp_optimize(
        sampler, cost, st, {}, opt_iters=iters, num_samples=32,
        temperature=1.0, step_size=0.5, sample_method=sample_method)[0])
    st = run(state)
    np.asarray(st.particle_means)
    t0 = time.perf_counter()
    for _ in range(chunks):
        st = run(st)
    final = np.asarray(st.particle_means)
    el = (time.perf_counter() - t0) / (iters * chunks)
    assert np.isfinite(final).all()
    return {
        "config": (f"planar-T{t}{'-obst' if with_obstacles else ''} "
                   + ("dof-dense-apply" if mode == "dof" else "flat-dense")),
        "metric": "particle-trajectory updates/sec",
        "value": round(15 / el, 1),
        "ms_per_iter": round(el * 1e3, 3),
    }


def gn_bench(t, with_obstacles, method="woodbury", iters=100, chunks=5,
             particles=15, delta=None):
    """Gauss-Newton (GPMP) iteration time: the structured sequential-over-T
    Cholesky vs the parallel-in-time Woodbury solve (planners/gpmp.py). The
    reference's dense per-particle solve is O(M^3) here
    (``planner.py:600-633``). ``--horizons 64`` with ``--gn-particles 192``
    reproduces the planar parity scale of docs/PERFORMANCE.md.

    ``delta`` defaults by horizon: 1e-2 at the parity scale, 10.0 at t >= 512
    — undamped GN against the 1e10-weight collision hinge diverges at long
    horizons on EVERY backend (measured: f32 CPU and TPU alike blow up
    within ~40 iterations at T=1024 with delta <= 0.1, and within ~500
    iterations at delta = 1.0 — the round-5 deep-amortization protocol runs
    500, so the default damping rose with it). Damping does not change
    the per-iteration work being timed."""
    from stoch_gpmp_tpu.planners.gpmp import (
        GPMPState, build_woodbury, gpmp_optimize,
    )

    if delta is None:
        delta = 10.0 if t >= 512 else 1e-2
    sampler, cost, state = _problem(t, with_obstacles)
    del sampler
    means = state.particle_means
    if particles != means.shape[0]:
        reps = -(-particles // means.shape[0])
        means = jnp.tile(means, (reps, 1, 1))[:particles]
    gstate = GPMPState(particle_means=means, key=state.key)
    wb = build_woodbury(cost, delta) if method == "woodbury" else None
    run = jax.jit(lambda st: gpmp_optimize(
        cost, st, {}, opt_iters=iters, delta=delta, trust_region=False,
        method=method, step_size=0.5, woodbury=wb))
    st = run(gstate)
    np.asarray(st.particle_means)
    t0 = time.perf_counter()
    for _ in range(chunks):
        st = run(st)
    final = np.asarray(st.particle_means)
    el = (time.perf_counter() - t0) / (iters * chunks)
    assert np.isfinite(final).all()
    return {
        "config": f"gpmp-{method}-T{t}-P{particles}"
                  f"{'-obst' if with_obstacles else ''}",
        "metric": "particle-trajectory updates/sec",
        "value": round(particles / el, 1),
        "ms_per_iter": round(el * 1e3, 3),
    }


def _panda_problem_lh(t, with_fields):
    """d=14 long-horizon problem: dense-free quadratic stack (the [M, M]
    QuadraticCost at T=1024 would be 3.3 GB), optionally + the Pallas
    field cost."""
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.gp.dof_factored import DofQuadraticCost
    from stoch_gpmp_tpu.gp.prior import make_gp_prior
    from stoch_gpmp_tpu.kinematics import homogeneous, y_rot, z_rot
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda
    from stoch_gpmp_tpu.planners import SamplerModel, StochGPMPState

    dtype = jnp.float32
    dt = 0.05
    chain = franka_panda(dtype=dtype)
    n_dof = chain.n_dofs
    start_q = jnp.asarray(
        [0.012, -0.57, 0.0, -2.81, 0.0, 3.037, 0.741], dtype=dtype
    )
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)])
    goals = jnp.concatenate([start_q + 0.3, jnp.zeros_like(start_q)])[None]
    gp = CostGP.create(n_dof, t, start, dt,
                       {"sigma_start": 1e-4, "sigma_gp": 7e-4}, dtype=dtype)
    goal_prior = CostGoalPrior.create(
        n_dof, t, goals, sigma_goal_prior=20.0, dtype=dtype
    )
    dq = DofQuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t)
    costs = [dq]
    obs = {}
    if with_fields:
        from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost

        target_rot = z_rot(jnp.asarray(-np.pi, dtype=dtype)) @ y_rot(
            jnp.asarray(-np.pi, dtype=dtype)
        )
        target_h = homogeneous(
            target_rot, jnp.asarray([0.3, 0.3, 0.3], dtype=dtype)
        )
        costs.append(PlaneFieldsCost.create(
            n_dof, t, chain, target_h, margin=0.03, sigma_self=0.01,
            sigma_coll=0.01, sigma_goal=7e-5, build_selection=False,
        ))
        rng = np.random.default_rng(0)
        spheres = np.zeros((1, 5, 4))
        spheres[0, :, :3] = rng.uniform([0.6, -0.2, 0.6], [1.0, 0.2, 1.0], (5, 3))
        spheres[0, :, 3] = rng.uniform(0.1, 0.2, 5)
        obs = {"obstacle_spheres": jnp.asarray(spheres, dtype=dtype)}
    cost = CostComposite.create(n_dof, t, costs)
    prior = make_gp_prior(n_dof, t, dt, start, 0.001, 0.1, sigma_goal=0.07,
                          goal_states=goals, dtype=dtype)
    sampler = SamplerModel.from_prior(prior)
    means = jnp.repeat(prior.means, 15, axis=0)
    state = StochGPMPState(
        particle_means=means, key=jax.random.key(0, impl="unsafe_rbg")
    )
    return sampler, cost, state, obs


def panda_bench(t, with_fields, path="dof", iters=30, chunks=3,
                num_samples=8):
    """d=14 long-horizon iteration time: the dof-factored dense-apply path
    vs the legacy structured (pscan-sampling, d-minor-layout cost) path —
    the VERDICT r2 weak-#7 A/B. ``path='legacy'`` forces the legacy route
    via an identity sharding constraint."""
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    sampler, cost, state, obs = _panda_problem_lh(t, with_fields)
    kw = {}
    if path == "legacy":
        kw["shard_samples"] = lambda x: x
    run = jax.jit(lambda st: stoch_gpmp_optimize(
        sampler, cost, st, obs, opt_iters=iters, num_samples=num_samples,
        temperature=1.0, step_size=0.1, **kw)[0])
    st = run(state)
    np.asarray(st.particle_means)
    t0 = time.perf_counter()
    for _ in range(chunks):
        st = run(st)
    final = np.asarray(st.particle_means)
    el = (time.perf_counter() - t0) / (iters * chunks)
    assert np.isfinite(final).all()
    return {
        "config": f"panda-d14-T{t}-{path}{'-fields' if with_fields else ''}",
        "metric": "particle-trajectory updates/sec",
        "value": round(15 / el, 1),
        "ms_per_iter": round(el * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", type=int, nargs="+", default=[1024, 4096])
    ap.add_argument("--planner", choices=["stochgpmp", "gpmp"],
                    default="stochgpmp")
    ap.add_argument("--gn-iters", type=int, default=100)
    ap.add_argument("--gn-particles", type=int, default=15)
    ap.add_argument("--gn-delta", type=float, default=None,
                    help="GN damping (default: 1e-2, or 1.0 at t >= 512 — "
                    "see gn_bench docstring)")
    ap.add_argument("--panda", action="store_true",
                    help="d=14 long-horizon A/B (dof dense-apply vs legacy "
                    "pscan path); horizons with 2T <= 2048 only for dof")
    ap.add_argument("--planar-dof", action="store_true",
                    help="d=4 planar A/B: dof dense-apply vs the pscan "
                    "plane path (pair with the default stochgpmp rows); "
                    "dof rows need 2T <= 2048")
    args = ap.parse_args()
    if args.planar_dof:
        for t in args.horizons:
            if 2 * t <= 2048:
                print(json.dumps(planar_dof_bench(t, False)), flush=True)
                print(json.dumps(planar_dof_bench(t, True)), flush=True)
                print(json.dumps(planar_dof_bench(t, False, mode="flat")),
                      flush=True)
                print(json.dumps(planar_dof_bench(t, True, mode="flat")),
                      flush=True)
            print(json.dumps(iteration_bench(t, False)), flush=True)
            print(json.dumps(iteration_bench(t, True)), flush=True)
        return
    if args.panda:
        for t in args.horizons:
            if 2 * t <= 2048:
                print(json.dumps(panda_bench(t, False, "dof")), flush=True)
                print(json.dumps(panda_bench(t, True, "dof")), flush=True)
            print(json.dumps(panda_bench(t, False, "legacy")), flush=True)
        return
    for t in args.horizons:
        if args.planner == "gpmp":
            for method in ("woodbury", "cholesky"):
                print(json.dumps(gn_bench(
                    t, True, method=method, iters=args.gn_iters,
                    particles=args.gn_particles, delta=args.gn_delta,
                )), flush=True)
            continue
        print(json.dumps(solver_bench(t)), flush=True)
        print(json.dumps(iteration_bench(t, False)), flush=True)
        print(json.dumps(iteration_bench(t, True)), flush=True)


if __name__ == "__main__":
    main()
