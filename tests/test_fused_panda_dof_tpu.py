"""Fused dof-factored Panda iteration kernel — TPU-only (hardware PRNG).

Validation mirrors tests/test_fused_panda_tpu.py:
- exact cost parity, RNG-free: with ``w_dof = 0`` every sample equals the
  particle mean, so per-sample costs must match a float64 HOST evaluation
  of the same stack (stencil quadratic + fields + importance). The host
  oracle is f64 numpy ON CPU — comparing against the on-TPU dense-matmul
  quadratic would validate nothing (its bf16 MXU passes corrupt the
  ~1e10-conditioned quadratic; that trap is exactly what the stencil kernel
  fixes, see gp/dof_factored.py);
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
                dof_quad=None, temperature=1.0, step_size=0.1):
    from stoch_gpmp_tpu.ops.pallas.panda_step_dof import (
        make_fused_panda_dof_step,
    )

    quad, fields = cost.costs
    p = state.particle_means.shape[0]
    return make_fused_panda_dof_step(
        chain=fields.chain,
        dof_prior=sampler.dof,
        dof_quad=quad.dof_form if dof_quad is None else dof_quad,
        num_particles=p,
        spheres=obs["obstacle_spheres"],
        target_h=np.asarray(fields.target_h, dtype=np.float64),
        n_dof=7, traj_len=128, num_samples=num_samples,
        margin=fields.margin,
        w_self=1.0 / fields.sigma_self**2,
        w_obst=1.0 / fields.sigma_coll**2,
        w_goal=1.0 / fields.sigma_goal**2,
        temperature=temperature, step_size=step_size,
        w_dof=w_dof,
    )


def _host_f64_quad(dq, mu_planes):
    """Float64 numpy oracle of the stencil quadratic on ``[d, P, 2T]``."""
    x = np.asarray(mu_planes, dtype=np.float64)
    d, p_, t2 = x.shape
    t = t2 // 2
    q = np.asarray(dq.q_i2, dtype=np.float64)
    ks = np.asarray(dq.k_s2, dtype=np.float64)
    kg = np.asarray(dq.k_g2, dtype=np.float64)
    s_pd = np.asarray(dq.s_pd, dtype=np.float64)
    g_pd = np.asarray(dq.g_pd, dtype=np.float64)
    dt = float(dq.dt)
    pos, vel = x[..., :t], x[..., t:]
    rp = pos[..., :-1] + dt * vel[..., :-1] - pos[..., 1:]
    rv = vel[..., :-1] - vel[..., 1:]
    e = (q[0, 0] * rp * rp + 2 * q[0, 1] * rp * rv + q[1, 1] * rv * rv).sum(
        axis=(0, 2)
    )
    r0p = pos[..., 0] - s_pd[:, None, 0]
    r0v = vel[..., 0] - s_pd[:, None, 1]
    e += (ks[0, 0] * r0p**2 + 2 * ks[0, 1] * r0p * r0v + ks[1, 1] * r0v**2).sum(0)
    ppg = p_ // dq.num_goals
    gp = np.repeat(g_pd[:, :, 0].T, ppg, axis=1)  # [d, P]
    gv = np.repeat(g_pd[:, :, 1].T, ppg, axis=1)
    rgp = pos[..., -1] - gp
    rgv = vel[..., -1] - gv
    e += (kg[0, 0] * rgp**2 + 2 * kg[0, 1] * rgp * rgv + kg[1, 1] * rgv**2).sum(0)
    return e


def test_fused_dof_cost_parity_rng_free():
    from stoch_gpmp_tpu.gp.dof_factored import to_dof_planes

    sampler, cost, state, obs, s = _problem()
    t2 = sampler.dof.w_dof.shape[0]
    zero_w = jnp.zeros((t2, t2), jnp.float32)
    means = state.particle_means
    p = means.shape[0]
    mu_planes = to_dof_planes(means)
    pu = sampler.dof.matvec_planes(mu_planes)  # exact stencil matvec
    imp = np.asarray(jnp.einsum("dpk,dpk->p", mu_planes, pu))
    quad, fields = cost.costs

    # --- tier 1: fields + goal + importance (quadratic zeroed) --------------
    z22 = jnp.zeros((2, 2), jnp.float32)
    dq = quad.dof_form
    dq_zero = dq.replace(q_i2=z22, k_s2=z22, k_g2=z22)
    step_f = _build_step(
        sampler, cost, state, obs, s, w_dof=zero_w, dof_quad=dq_zero,
    )
    seeds = jnp.zeros((step_f.n_blocks, 2), jnp.int32)
    _, costs_f = jax.jit(step_f)(mu_planes, seeds)
    ref_f = np.asarray(fields.eval(means, observation=obs)) + imp
    np.testing.assert_allclose(
        np.asarray(costs_f), ref_f[:, None] * np.ones((p, s)), rtol=3e-4
    )

    # --- tier 2: full stack vs the f64 host stencil oracle ------------------
    step = _build_step(sampler, cost, state, obs, s, w_dof=zero_w)
    _, costs = jax.jit(step)(mu_planes, seeds)
    ref = _host_f64_quad(dq, mu_planes) + ref_f
    np.testing.assert_allclose(
        np.asarray(costs), ref[:, None] * np.ones((p, s)), rtol=1e-3
    )
    # with identical samples the means must not move
    new_planes, _ = jax.jit(step)(mu_planes, seeds)
    np.testing.assert_allclose(
        np.asarray(new_planes), np.asarray(mu_planes), atol=1e-5
    )


def test_stencil_eval_kernel_on_hardware():
    """``dof_quad_eval_pallas`` compiled by Mosaic (non-interpret) equals the
    float64 HOST oracle at the reference's Panda sigmas — the XLA-path
    planner's config-5 hot quadratic (in-kernel lane rolls, masked residual
    quadratics, [B, d] energy table). Interpret-mode parity lives in
    tests/test_dof_factored.py; this is the on-chip record."""
    from stoch_gpmp_tpu.gp.dof_factored import to_dof_planes
    from stoch_gpmp_tpu.ops.pallas.stencil import dof_quad_eval_pallas

    sampler, cost, state, obs, s = _problem()
    quad, _ = cost.costs
    dq = quad.dof_form
    means = state.particle_means  # [P, T, 2d]
    p = means.shape[0]
    rng = np.random.default_rng(3)
    # planner regime: tiny per-sample spreads around each particle mean on a
    # ~2e11-weight quadratic (the cancellation the stencil form avoids)
    trajs = (
        np.repeat(np.asarray(means, np.float64), s, axis=0)
        + rng.normal(size=(p * s,) + means.shape[1:]) * 1e-3
    )
    xp = to_dof_planes(jnp.asarray(trajs, jnp.float32))  # [d, P*s, 2T]

    pal = jax.jit(lambda x: dof_quad_eval_pallas(dq, x))(xp)
    assert pal is not None
    oracle = _host_f64_quad(dq, np.asarray(xp, np.float64))
    np.testing.assert_allclose(np.asarray(pal), oracle, rtol=1e-3)

    # pu-fused form (the planner's importance term rides the same read)
    mu_planes = to_dof_planes(means)
    pu = sampler.dof.matvec_planes(mu_planes)  # [d, P, 2T]
    tau = 0.25
    fused = jax.jit(
        lambda x, u: dof_quad_eval_pallas(
            dq, x, pu=u, temperature=tau, num_samples=s
        )
    )(xp, pu)
    assert fused is not None
    # importance rides each SAMPLE row against its particle's pu
    x_ps = np.asarray(xp, np.float64).reshape(-1, p, s, xp.shape[-1])
    imp = np.einsum("dpsk,dpk->ps", x_ps, np.asarray(pu, np.float64))
    np.testing.assert_allclose(
        np.asarray(fused), oracle + tau * imp.reshape(-1), rtol=1e-3
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

    # evaluate through the dof stencil (exact on TPU) — cost.eval's flat
    # dense-matmul quadratic is bf16-degraded on the MXU at these sigmas
    cost_of = jax.jit(
        lambda tr: cost.eval_dof_planes(
            to_dof_planes(tr), observation=obs
        ).mean()
    )
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

    # anchor check is PER PARTICLE: the problem has two goals, and the
    # const-vel initialization gives each goal group a different t=0
    # VELOCITY (spread ~0.085) — comparing every particle against particle
    # 0's initial state would flag that initialization spread as drift
    init0 = np.asarray(state.particle_means)[:, 0]
    np.testing.assert_allclose(means[:, 0], init0, atol=2e-2)


def test_planner_class_fused_kernel_opt_in():
    """``StochGPMP(fused_kernel=True)`` runs iters-1 through the fused dof
    kernel and the final iteration on the normal path: the reference-shaped
    6-tuple / recent-samples API is intact, the run descends, and the start
    stays anchored (planners/fused_exec.py)."""
    from stoch_gpmp_tpu.gp.dof_factored import to_dof_planes
    from stoch_gpmp_tpu.planners import StochGPMP

    sampler, cost, state, obs, s = _problem()
    quad, fields = cost.costs
    n_dof, t = fields.n_dof, fields.traj_len
    start_q = jnp.asarray(
        [0.012, -0.57, 0.0, -2.81, 0.0, 3.037, 0.741], jnp.float32
    )
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)])
    g_pd = np.asarray(quad.dof_form.g_pd)  # [G, d, 2] goal anchors
    goals = jnp.asarray(
        np.concatenate([g_pd[:, :, 0], g_pd[:, :, 1]], axis=-1), jnp.float32
    )

    planner = StochGPMP(
        num_particles_per_goal=4, num_samples=s, traj_len=t, dt=0.05,
        n_dof=n_dof, opt_iters=50, temperature=1.0, start_state=start,
        multi_goal_states=goals, cost=cost, step_size=0.1,
        sigma_start_init=1e-3, sigma_goal_init=0.07, sigma_gp_init=0.1,
        sigma_start_sample=1e-3, sigma_goal_sample=0.07,
        sigma_gp_sample=0.1, seed=0, dtype=jnp.float32, fused_kernel=True,
    )
    cost_of = jax.jit(
        lambda tr: cost.eval_dof_planes(
            to_dof_planes(tr), observation=obs
        ).mean()
    )
    c0 = float(cost_of(planner.particle_means))
    out = planner.optimize(observation=obs)
    assert len(out) == 6
    for o in out:
        assert np.isfinite(np.asarray(o)).all()
    p = planner.num_particles
    assert out[0].shape == (p, t, n_dof)  # mean positions
    assert out[2].shape == (p, s, t, n_dof)  # sample positions (final iter)
    sp, sv = planner.get_recent_samples()
    assert sp.shape == (p, s, t, n_dof) and sv.shape == (p, s, t, n_dof)
    assert planner.get_traj("best").shape == (t, 2 * n_dof)
    c1 = float(cost_of(planner.particle_means))
    assert c1 < c0
    means = np.asarray(planner.particle_means)
    np.testing.assert_allclose(
        means[:, 0, :n_dof],
        np.broadcast_to(np.asarray(start_q), (p, n_dof)),
        atol=2e-2,
    )
