"""Fused dof-factored Panda iteration kernel — TPU-only (hardware PRNG).

Validation mirrors tests/test_fused_panda_tpu.py:
- exact cost parity, RNG-free: with ``w_dof = 0`` every sample equals the
  particle mean, so per-sample costs must match the XLA dof fast stack
  (DofQuadraticCost + PlaneFieldsCost + importance) of the means;
- behavior: fused iterations at the scaling shape (T=128) descend like the
  XLA dof path with the start anchored.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="fused kernel needs the TPU PRNG"
)


def _problem(num_goals=2, ppg=4, num_samples=8):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from benchmarks.run import _panda_problem

    return _panda_problem(
        num_goals=num_goals, ppg=ppg, traj_len=128, num_samples=num_samples
    )


def _build_step(sampler, cost, state, obs, num_samples, w_dof=None,
                a_dof=None, b=None, temperature=1.0, step_size=0.1):
    from stoch_gpmp_tpu.ops.pallas.panda_step_dof import (
        make_fused_panda_dof_step,
    )

    quad, fields = cost.costs
    dq = quad.dof_form
    p = state.particle_means.shape[0]
    b_planes_p = jnp.repeat(
        jnp.transpose(dq.b_planes, (1, 0, 2)), p // dq.num_goals, axis=1
    )  # [D, P, 2T]
    return make_fused_panda_dof_step(
        chain=fields.chain,
        w_dof=sampler.dof.w_dof if w_dof is None else w_dof,
        a_dof=dq.a_dof if a_dof is None else a_dof,
        b_planes_p=b_planes_p if b is None else b,
        prec_dof=sampler.dof.prec_dof,
        spheres=obs["obstacle_spheres"],
        target_h=np.asarray(fields.target_h, dtype=np.float64),
        n_dof=7, traj_len=128, num_samples=num_samples,
        margin=fields.margin,
        w_self=1.0 / fields.sigma_self**2,
        w_obst=1.0 / fields.sigma_coll**2,
        w_goal=1.0 / fields.sigma_goal**2,
        temperature=temperature, step_size=step_size,
    )


def test_fused_dof_cost_parity_rng_free():
    from stoch_gpmp_tpu.gp.dof_factored import to_dof_planes

    sampler, cost, state, obs, s = _problem()
    t2 = sampler.dof.w_dof.shape[0]
    zero_w = jnp.zeros((t2, t2), jnp.float32)
    means = state.particle_means
    p = means.shape[0]
    mu_planes = to_dof_planes(means)  # [D, P, 2T]
    pu = sampler.dof.matvec_planes(mu_planes)
    imp = np.asarray(jnp.einsum("dpk,dpk->p", mu_planes, pu))
    quad, fields = cost.costs

    # --- tier 1: fields + goal + importance ---------------------------------
    d_, _, _ = mu_planes.shape
    step_f = _build_step(
        sampler, cost, state, obs, s, w_dof=zero_w,
        a_dof=jnp.zeros((t2, t2), jnp.float32),
        b=jnp.zeros((d_, p, t2), jnp.float32),
    )
    seeds = jnp.zeros((step_f.n_blocks, 2), jnp.int32)
    _, costs_f = jax.jit(step_f)(mu_planes, seeds)
    ref_f = np.asarray(fields.eval(means, observation=obs)) + imp
    np.testing.assert_allclose(
        np.asarray(costs_f), ref_f[:, None] * np.ones((p, s)), rtol=3e-4
    )

    # --- tier 2: full stack within the f32 accumulation envelope ------------
    step = _build_step(sampler, cost, state, obs, s, w_dof=zero_w)
    _, costs = jax.jit(step)(mu_planes, seeds)
    c_per_p = np.asarray(
        jnp.repeat(quad.dof_form.c, p // quad.num_goals, axis=0)
    )
    ref = np.asarray(cost.eval(means, observation=obs)) + imp - c_per_p
    np.testing.assert_allclose(
        np.asarray(costs), ref[:, None] * np.ones((p, s)), rtol=1e-2
    )
    # with identical samples the means must not move
    new_planes, _ = jax.jit(step)(mu_planes, seeds)
    np.testing.assert_allclose(
        np.asarray(new_planes), np.asarray(mu_planes), atol=1e-5
    )


def test_fused_dof_descends_like_xla_path():
    from stoch_gpmp_tpu.gp.dof_factored import from_dof_planes, to_dof_planes
    from stoch_gpmp_tpu.ops.pallas.panda_step_dof import (
        fused_panda_dof_optimize,
    )
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    sampler, cost, state, obs, s = _problem()
    step = _build_step(sampler, cost, state, obs, s)
    mu_planes = to_dof_planes(state.particle_means)
    planes, _ = jax.jit(
        lambda mn, k: fused_panda_dof_optimize(step, mn, k, 100)
    )(mu_planes, jax.random.PRNGKey(0))
    means = np.asarray(from_dof_planes(planes))
    assert np.isfinite(means).all()

    cost_of = jax.jit(lambda tr: cost.eval(tr, observation=obs).mean())
    c0 = float(cost_of(state.particle_means))
    c_fused = float(cost_of(jnp.asarray(means)))
    assert c_fused < c0

    xla_state, _ = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(
            sa, c, st, ob, opt_iters=100, num_samples=s,
            temperature=1.0, step_size=0.1,
        )
    )(sampler, cost, state, obs)
    c_xla = float(cost_of(xla_state.particle_means))
    assert (c0 - c_fused) > 0.5 * (c0 - c_xla)

    start = np.asarray(state.particle_means[0, 0])
    np.testing.assert_allclose(
        means[:, 0], np.broadcast_to(start, means[:, 0].shape), atol=2e-2
    )
