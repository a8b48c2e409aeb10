"""Ablation profiler for the Panda benchmark configs.

Times the full StochGPMP iteration at config-4/5 scale and a ladder of
ablated variants (cost terms removed one at a time, FK alone, RNG alone,
sampling matmul alone) so the per-iteration budget can be attributed
piece-by-piece. One JSON line per measurement.

Usage: ``python benchmarks/profile_panda.py [--config 5] [--iters 20]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _timed_scan(body, carry, iters, reps=3):
    """Per-iteration seconds of ``body`` under lax.scan, amortized over
    ``iters`` steps and ``reps`` repeats, synced by host readback.

    MEASUREMENT TRAP (hit in round 2): a large scan carry is NOT free on this
    TPU attachment — carrying a [10240, 1792] f32 array through a passthrough
    body measured 27 ms/iter by itself. Isolated pieces must therefore use a
    SCALAR carry and materialize their inputs in-body (jnp.full + acc*1e-20);
    only like-for-like comparisons (same carry pytree) are meaningful
    otherwise."""

    def run(c):
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), c, None, length=iters)
        return c

    def sync(out):
        leaf = [x for x in jax.tree_util.tree_leaves(out)
                if not jnp.issubdtype(x.dtype, jax.dtypes.prng_key)][0]
        return np.asarray(leaf)

    jf = jax.jit(run)
    out = jf(carry)
    _ = sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jf(out)
    _ = sync(out)
    return (time.perf_counter() - t0) / (reps * iters)


def _dof_pieces(sampler, cost, state, obs, num_samples, iters):
    """Piece profile of the dof-factored path (_stoch_gpmp_optimize_dof):
    every hot term in isolation with a SCALAR carry and in-body synthetic
    inputs (see _timed_scan trap note), plus the full step with its real
    (mu_planes, key) carry. The stencil/dense quadratic and matvec A/Bs
    time the round-3 precision-trap fix against the (numerically unsafe)
    matmul forms it replaced."""
    from stoch_gpmp_tpu.gp.dof_factored import to_dof_planes
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    p, t, d2 = state.particle_means.shape
    nd = d2 // 2
    t2 = 2 * t
    n = p * num_samples
    dof = sampler.dof
    quad = next(c for c in cost.costs if getattr(c, "dof_form", None) is not None)
    dq = quad.dof_form
    fields = [c for c in cost.costs if c is not quad]

    def report(name, sec, rng_sec=None):
        rec = {"piece": name, "us_per_iter": round(sec * 1e6, 1)}
        if rng_sec is not None:
            rec["minus_rng_us"] = round((sec - rng_sec) * 1e6, 1)
        print(json.dumps(rec), flush=True)

    # full dof step, real carry (like-for-like with run.py's number)
    def full_body(carry):
        st, _ = carry
        new_state, _ = stoch_gpmp_optimize(
            sampler, cost, st, obs, opt_iters=1, num_samples=num_samples,
            temperature=1.0, step_size=0.1, sample_method="dof",
        )
        return (new_state, new_state.key)

    report("dof-full-step",
           _timed_scan(full_body, (state, state.key), iters))

    # Every isolated piece below consumes a FRESH RNG input: a jnp.full /
    # iota input varies along at most one axis, so XLA's algebraic
    # simplifier keeps the whole elementwise (stencil) pipeline on
    # broadcast-of-[2T] operands and the "measurement" collapses (observed:
    # 30 us for a 36M-element stencil eval). RNG cost is reported alone and
    # subtracted (minus_rng_us) for attribution.
    key0 = jax.random.key(7, impl="unsafe_rbg")

    def _rng_x(i, shape):
        return jax.random.normal(jax.random.fold_in(key0, i), shape,
                                 jnp.float32)

    def _timed_piece(shape, fn, iters):
        def body(carry):
            i, acc = carry
            x = _rng_x(i, shape)
            return (i + 1, acc + fn(x) * 1e-20)

        return _timed_scan(body, (jnp.int32(0), jnp.float32(0)), iters)

    rng_n = _timed_piece((nd, n, t2), lambda x: x.sum(), iters)
    rng_p = _timed_piece((nd, p, t2), lambda x: x.sum(), iters)
    report("dof-rng-[d,N,2T]", rng_n)
    report("dof-rng-[d,P,2T]", rng_p)

    # sampling matmul [N*d, 2T] @ [2T, 2T]
    w_dof = dof.w_dof
    report("dof-sample-matmul",
           _timed_piece((nd * n, t2), lambda x: (x @ w_dof).sum(), iters),
           rng_n)

    # quadratic eval: stencil (shipping) vs dense matmul (unsafe; timing A/B)
    report("dof-quad-stencil",
           _timed_piece((nd, n, t2),
                        lambda x: dq.eval_dof_planes(x).sum(), iters),
           rng_n)
    report("dof-quad-dense(unsafe)",
           _timed_piece((nd, n, t2),
                        lambda x: dq.eval_dof_planes_dense(x).sum(), iters),
           rng_n)

    # importance matvec on means [d, P, 2T]: stencil vs dense
    prec = dof.prec_dof
    report("dof-matvec-stencil",
           _timed_piece((nd, p, t2),
                        lambda x: dof.matvec_planes(x).sum(), iters),
           rng_p)
    report("dof-matvec-dense(unsafe)",
           _timed_piece((nd * p, t2), lambda x: (x @ prec).sum(), iters),
           rng_p)

    # field costs on dof planes (FK + fields from position planes)
    for f in fields:
        report(f"dof-fields({type(f).__name__})",
               _timed_piece((nd, n, t2),
                            lambda x, f=f: f.eval_dof_planes(
                                x, observation=obs).sum(), iters),
               rng_n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5, choices=[4, 5])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-variants", action="store_true",
                    help="only run the isolated pieces")
    ap.add_argument("--dof", action="store_true",
                    help="profile the dof-factored path pieces instead of "
                    "the flat stack")
    args = ap.parse_args()

    from benchmarks.run import _panda_problem
    from stoch_gpmp_tpu.costs import CostComposite
    from stoch_gpmp_tpu.planners import stoch_gpmp_step

    if args.config == 5:
        sampler, cost, state, obs, num_samples = _panda_problem(
            num_goals=10, ppg=128, traj_len=128, num_samples=8
        )
    else:
        sampler, cost, state, obs, num_samples = _panda_problem(num_goals=1, ppg=5)

    p, t, d = state.particle_means.shape
    n = p * num_samples
    m = t * d
    print(json.dumps({"config": args.config, "P": p, "S": num_samples,
                      "T": t, "d": d, "N": n, "M": m}), flush=True)

    if args.dof:
        _dof_pieces(sampler, cost, state, obs, num_samples, args.iters)
        return

    def report(name, sec):
        print(json.dumps({"piece": name, "us_per_iter": round(sec * 1e6, 1)}),
              flush=True)

    # --- full step and cost-stack ablations (same code path as run.py) ----
    def planner_body(cost_):
        def body(carry):
            st, key = carry
            new_state, _ = stoch_gpmp_step(
                sampler, cost_, st, obs,
                num_samples=num_samples, temperature=1.0, step_size=0.1,
            )
            return (new_state, new_state.key)

        return body

    # fast stack = [QuadraticCost, PlaneFieldsCost]; like-for-like carries, so
    # variant DIFFERENCES are attributable (absolute numbers include the
    # scan-carry overhead, see _timed_scan docstring)
    variants = {
        "full-fast": [0, 1],
        "quad-only": [0],
        "plane-fields-only": [1],
        "no-cost": [],
    }
    if args.skip_variants:
        variants = {}
    for name, keep in variants.items():
        kept = [cost.costs[i] for i in keep]
        c = CostComposite.create(cost.n_dof, cost.traj_len, kept, fk=None)
        sec = _timed_scan(planner_body(c), (state, state.key), args.iters)
        report(name, sec)

    # --- isolated pieces --------------------------------------------------
    # RNG draw [P, S, M]
    def rng_body(carry):
        key, acc = carry
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, (p, num_samples, m), dtype=jnp.float32)
        return (key, acc + eps.sum() * 1e-20)

    report("rng-only", _timed_scan(rng_body, (state.key, jnp.float32(0)), args.iters))

    # sampling matmul eps @ L^{-T} (fresh independent input per iteration —
    # mirroring the planner, where eps comes from RNG; chaining the full
    # [N, M] output through the carry serializes on a 70 MB dependency and
    # inflates the number)
    w = sampler.weight_t

    def matmul_body(acc):
        eps = jnp.full((p * num_samples, m), 1.0, jnp.float32) + acc * 1e-20
        out = eps @ w
        return acc + out.sum() * 1e-20

    report("sample-matmul", _timed_scan(matmul_body, jnp.float32(0), args.iters))

    # FK alone on the full point batch [N*T, 7]
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda

    chain = franka_panda(dtype=jnp.float32)

    def fk_body(acc):
        q = jnp.full((n * t, 7), 0.1, jnp.float32) + acc * 1e-20
        links = chain.fk_compact(q)
        return acc + links.positions.sum() * 1e-20

    report("fk-only", _timed_scan(fk_body, jnp.float32(0), args.iters))

    # FK + fields fused via scalar planes (the PlaneFieldsCost path)
    from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
    from stoch_gpmp_tpu.kinematics import homogeneous

    th = homogeneous(jnp.eye(3, dtype=jnp.float32),
                     jnp.asarray([0.3, 0.3, 0.3], jnp.float32))
    pf = PlaneFieldsCost.create(7, t, chain, th)

    def plane_body(acc):
        flat = jnp.full((n, t * d), 0.1, jnp.float32) + acc * 1e-20
        c = pf.eval(flat, observation=obs)
        return acc + c.sum() * 1e-20

    report("plane-fields(FK+fields fused)",
           _timed_scan(plane_body, jnp.float32(0), args.iters))

    # fields alone on precomputed positions [N, T-1, L, 3]
    from stoch_gpmp_tpu.costs.fields import LinkDistanceField, LinkSelfDistanceField
    from stoch_gpmp_tpu.kinematics.chain import LinkState

    obst_f = LinkDistanceField()
    self_f = LinkSelfDistanceField(margin=0.03)
    pos0 = jnp.ones((n, t - 1, 9, 3), dtype=jnp.float32) * 0.3
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, t - 1, 3, 3))

    def obst_body(acc):
        pos = pos0 + acc * 1e-20
        c = obst_f.compute_cost(
            LinkState(positions=pos, ee_rot=eye),
            obstacle_spheres=obs["obstacle_spheres"],
        )
        return acc + c.sum() * 1e-20

    def self_body(acc):
        pos = pos0 + acc * 1e-20
        c = self_f.compute_cost(LinkState(positions=pos, ee_rot=eye))
        return acc + c.sum() * 1e-20

    report("obst-field-only", _timed_scan(obst_body, jnp.float32(0), args.iters))
    report("self-field-only", _timed_scan(self_body, jnp.float32(0), args.iters))


if __name__ == "__main__":
    main()
