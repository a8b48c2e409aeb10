"""Fully-fused Panda iteration kernel — TPU-only (in-kernel hardware PRNG).

Validation strategy (mirrors tests/test_fused_step_tpu.py):

- exact cost parity, RNG-free: with ``weight_t = 0`` every sample equals the
  particle mean, so the kernel's per-sample costs must EXACTLY match the XLA
  fast-stack cost (QuadraticCost + PlaneFieldsCost + importance term) of the
  means — this checks quadratic, collision-field, SE(3), and importance
  stages without depending on the PRNG stream;
- behavior: fused iterations on the Panda parity workload (reference
  ``examples/panda_environment.py:83-98`` cost stack) drive the EE toward
  the SE(3) target while keeping the start anchored.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="fused kernel needs the TPU PRNG"
)


def _problem(ppg=5, num_samples=32):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from benchmarks.run import _panda_problem

    return _panda_problem(num_goals=1, ppg=ppg, num_samples=num_samples)


def _build_step(sampler, cost, state, obs, num_samples, weight_t=None,
                dof_quad=None, temperature=1.0, step_size=0.1):
    from stoch_gpmp_tpu.ops.pallas.panda_step import make_fused_panda_step

    quad, fields = cost.costs
    p = state.particle_means.shape[0]
    return make_fused_panda_step(
        chain=fields.chain,
        weight_t=sampler.weight_t if weight_t is None else weight_t,
        dof_prior=sampler.dof,
        dof_quad=quad.dof_form if dof_quad is None else dof_quad,
        num_particles=p,
        spheres=obs["obstacle_spheres"],
        target_h=np.asarray(fields.target_h, dtype=np.float64),
        n_dof=7, traj_len=64, num_samples=num_samples,
        margin=fields.margin,
        w_self=1.0 / fields.sigma_self**2,
        w_obst=1.0 / fields.sigma_coll**2,
        w_goal=1.0 / fields.sigma_goal**2,
        temperature=temperature, step_size=step_size,
    )


def _host_f64_quad_flat(dq, means):
    """Float64 numpy oracle of the stencil quadratic on flat [P, T, 2d]."""
    x = np.asarray(means, dtype=np.float64)
    p_, t, d2 = x.shape
    d = d2 // 2
    q = np.asarray(dq.q_i2, dtype=np.float64)
    ks = np.asarray(dq.k_s2, dtype=np.float64)
    kg = np.asarray(dq.k_g2, dtype=np.float64)
    s_pd = np.asarray(dq.s_pd, dtype=np.float64)
    g_pd = np.asarray(dq.g_pd, dtype=np.float64)
    dt = float(dq.dt)
    pos, vel = x[..., :d], x[..., d:]
    rp = pos[:, :-1] + dt * vel[:, :-1] - pos[:, 1:]
    rv = vel[:, :-1] - vel[:, 1:]
    e = (q[0, 0] * rp**2 + 2 * q[0, 1] * rp * rv + q[1, 1] * rv**2).sum((1, 2))
    r0p = pos[:, 0] - s_pd[None, :, 0]
    r0v = vel[:, 0] - s_pd[None, :, 1]
    e += (ks[0, 0] * r0p**2 + 2 * ks[0, 1] * r0p * r0v + ks[1, 1] * r0v**2).sum(1)
    gp = np.repeat(g_pd, p_ // dq.num_goals, axis=0)  # [P, d, 2]
    rgp = pos[:, -1] - gp[..., 0]
    rgv = vel[:, -1] - gp[..., 1]
    e += (kg[0, 0] * rgp**2 + 2 * kg[0, 1] * rgp * rgv + kg[1, 1] * rgv**2).sum(1)
    return e


def test_fused_panda_cost_parity_rng_free():
    """Two tiers: the FK/field/SE(3)/importance stages match the XLA fast
    stack tightly (quad zeroed); the full stack matches a float64 HOST
    stencil oracle (the on-TPU dense-matmul quadratic is bf16-corrupted at
    these sigmas and would validate nothing — see gp/dof_factored.py)."""
    sampler, cost, state, obs, s = _problem()
    m = sampler.weight_t.shape[0]
    zero_w = jnp.zeros((m, m), jnp.float32)
    means = state.particle_means
    p = means.shape[0]
    # exact stencil matvec for the importance oracle
    pu = sampler.dof.matvec_flat(means).reshape(p, -1)
    imp = np.asarray(jnp.sum(means.reshape(p, -1) * pu, axis=-1))

    # --- tier 1: fields + goal + importance, exact-ish ---------------------
    quad, fields = cost.costs
    z22 = jnp.zeros((2, 2), jnp.float32)
    dq_zero = quad.dof_form.replace(q_i2=z22, k_s2=z22, k_g2=z22)
    step_f = _build_step(
        sampler, cost, state, obs, s, weight_t=zero_w, dof_quad=dq_zero,
    )
    seeds = jnp.zeros((step_f.n_blocks, 2), jnp.int32)
    _, costs_f = jax.jit(step_f)(means, seeds)
    ref_f = np.asarray(fields.eval(means, observation=obs)) + imp
    np.testing.assert_allclose(
        np.asarray(costs_f), ref_f[:, None] * np.ones((p, s)), rtol=3e-4
    )

    # --- tier 2: full stack vs the f64 host stencil oracle -----------------
    step = _build_step(sampler, cost, state, obs, s, weight_t=zero_w)
    _, costs = jax.jit(step)(means, seeds)
    ref = _host_f64_quad_flat(quad.dof_form, means) + ref_f
    np.testing.assert_allclose(
        np.asarray(costs), ref[:, None] * np.ones((p, s)), rtol=1e-3
    )
    # and with identical samples the means must not move
    new_means, _ = jax.jit(step)(means, seeds)
    np.testing.assert_allclose(np.asarray(new_means), np.asarray(means), atol=1e-5)


def test_fused_panda_descends_like_xla_path():
    """The fused kernel is the same algorithm as the XLA fast stack: after
    the same number of iterations from the same init it must (a) descend the
    composed cost, (b) land in the same cost ballpark as the XLA-pipeline
    planner, and (c) keep the start anchored (sigma_start = 1e-4)."""
    from stoch_gpmp_tpu.ops.pallas.panda_step import fused_panda_optimize
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    sampler, cost, state, obs, s = _problem()
    step = _build_step(sampler, cost, state, obs, s)
    means, _ = jax.jit(
        lambda mn, k: fused_panda_optimize(step, mn, k, 200)
    )(state.particle_means, jax.random.PRNGKey(0))
    m1 = np.asarray(means)
    assert np.isfinite(m1).all()

    cost_of = jax.jit(lambda tr: cost.eval(tr, observation=obs).mean())
    c0 = float(cost_of(state.particle_means))
    c_fused = float(cost_of(means))
    assert c_fused < c0  # descends

    xla_state, _ = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(
            sa, c, st, ob, opt_iters=200, num_samples=s,
            temperature=1.0, step_size=0.1,
        )
    )(sampler, cost, state, obs)
    c_xla = float(cost_of(xla_state.particle_means))
    # same ballpark: both paths remove a comparable fraction of the initial
    # cost (different RNG streams -> not bitwise)
    assert (c0 - c_fused) > 0.5 * (c0 - c_xla)

    # start state stays anchored (stochastic wander under the 1e-4-sigma
    # anchor stays at the few-mrad scale over 200 iterations)
    start = np.asarray(state.particle_means[0, 0])
    np.testing.assert_allclose(
        m1[:, 0], np.broadcast_to(start, m1[:, 0].shape), atol=2e-2
    )
