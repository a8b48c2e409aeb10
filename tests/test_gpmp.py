"""GPMP Gauss-Newton planner: structured solve vs dense oracle, convergence."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.costs import (
    CostCollision,
    CostComposite,
    CostGP,
    CostGoalPrior,
    OccupancyGridField,
)
from stoch_gpmp_tpu.planners.gpmp import GPMP, GPMPState, gpmp_step


def _quad_problem(dtype=jnp.float64, traj_len=12):
    n_dof, dt = 2, 0.05
    d = 2 * n_dof
    start = jnp.asarray([0.0, 0.0, 0.0, 0.0], dtype=dtype)
    goals = jnp.asarray([[2.0, 1.0, 0, 0], [-1.0, 2.0, 0, 0]], dtype=dtype)
    cost = CostComposite.create(
        n_dof,
        traj_len,
        [
            CostGP.create(
                n_dof, traj_len, start, dt,
                {"sigma_start": 0.01, "sigma_gp": 0.5}, dtype=dtype,
            ),
            CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=0.02, dtype=dtype),
        ],
    )
    return cost, start, goals, n_dof, traj_len, dt


def test_structured_solve_matches_dense():
    cost, start, goals, n_dof, traj_len, dt = _quad_problem()
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.standard_normal((4, traj_len, 2 * n_dof)))
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    s_chol = gpmp_step(cost, state, {}, delta=1e-3, trust_region=False, method="cholesky")
    s_dense = gpmp_step(cost, state, {}, delta=1e-3, trust_region=False, method="inverse")
    np.testing.assert_allclose(
        np.asarray(s_chol.particle_means),
        np.asarray(s_dense.particle_means),
        rtol=1e-7,
        atol=1e-9,
    )


def test_trust_region_branch_matches_dense():
    cost, *_ = _quad_problem()
    rng = np.random.default_rng(1)
    means = jnp.asarray(rng.standard_normal((4, 12, 4)))
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    s1 = gpmp_step(cost, state, {}, delta=0.1, trust_region=True, method="cholesky")
    s2 = gpmp_step(cost, state, {}, delta=0.1, trust_region=True, method="inverse")
    np.testing.assert_allclose(
        np.asarray(s1.particle_means), np.asarray(s2.particle_means), rtol=1e-7, atol=1e-9
    )


def test_gn_converges_to_quadratic_optimum_in_one_step():
    """For a purely quadratic cost, one full GN step (step_size=1, delta=0)
    lands on the global optimum: the gradient there must vanish."""
    cost, start, goals, n_dof, traj_len, dt = _quad_problem()
    rng = np.random.default_rng(2)
    means = jnp.asarray(rng.standard_normal((2, traj_len, 4)))
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    new = gpmp_step(cost, state, {}, delta=0.0, trust_region=False, method="cholesky")
    g = cost.gn_contrib(new.particle_means, observation={}).g
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
    # a second step must not move (already optimal)
    again = gpmp_step(cost, new, {}, delta=0.0, trust_region=False, method="cholesky")
    np.testing.assert_allclose(
        np.asarray(again.particle_means), np.asarray(new.particle_means), atol=1e-6
    )


def test_woodbury_matches_cholesky_quadratic():
    """The Woodbury parallel-in-time GN step equals the structured Cholesky
    step on the quadratic-only stack (f64, tight)."""
    from stoch_gpmp_tpu.planners.gpmp import build_woodbury, gpmp_step_woodbury

    cost, start, goals, n_dof, traj_len, dt = _quad_problem()
    rng = np.random.default_rng(3)
    means = jnp.asarray(rng.standard_normal((4, traj_len, 2 * n_dof)))
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    wb = build_woodbury(cost, 1e-3)
    assert wb is not None and wb.n_fields == 0
    s_ref = gpmp_step(cost, state, {}, delta=1e-3, trust_region=False,
                      method="cholesky")
    s_wb = gpmp_step_woodbury(wb, cost, state, {})
    np.testing.assert_allclose(
        np.asarray(s_wb.particle_means), np.asarray(s_ref.particle_means),
        rtol=1e-8, atol=1e-9,
    )


def test_woodbury_matches_cholesky_with_fields():
    """Rank-1 field contributions (occupancy collision) route through the
    capacitance solve; equal to the structured path (f64)."""
    from stoch_gpmp_tpu.planners.gpmp import build_woodbury, gpmp_step_woodbury

    dtype = jnp.float64
    n_dof, traj_len, dt = 2, 24, 0.05
    start = jnp.asarray([-2.0, -2.0, 0.0, 0.0], dtype=dtype)
    goals = jnp.asarray([[2.0, 2.0, 0.0, 0.0]], dtype=dtype)
    # smooth field so the autograd Jacobians are informative at the means
    xg, yg = jnp.meshgrid(jnp.arange(40, dtype=dtype), jnp.arange(40, dtype=dtype))
    grid = jnp.exp(-((xg - 20.0) ** 2 + (yg - 20.0) ** 2) / 50.0)
    from stoch_gpmp_tpu.costs import OccupancyGridField

    field = OccupancyGridField(grid=grid, cell_size=0.1)
    cost = CostComposite.create(
        n_dof, traj_len,
        [
            CostGP.create(n_dof, traj_len, start, dt,
                          {"sigma_start": 0.01, "sigma_gp": 0.5}, dtype=dtype),
            CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=0.02,
                                 dtype=dtype),
            CostCollision.create(n_dof, traj_len, field, sigma_coll=0.1),
        ],
    )
    rng = np.random.default_rng(4)
    means = jnp.asarray(0.5 * rng.standard_normal((3, traj_len, 2 * n_dof)))
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    wb = build_woodbury(cost, 1e-2)
    assert wb is not None and wb.n_fields == 1
    s_ref = gpmp_step(cost, state, {}, delta=1e-2, trust_region=False,
                      method="cholesky", step_size=0.5)
    s_wb = gpmp_step_woodbury(wb, cost, state, {}, step_size=0.5)
    np.testing.assert_allclose(
        np.asarray(s_wb.particle_means), np.asarray(s_ref.particle_means),
        rtol=1e-7, atol=1e-9,
    )


@pytest.mark.slow
def test_woodbury_panda_fk_fields():
    """Woodbury with FK-routed field Jacobians (LinkDistanceField + SE(3)
    goal) equals the structured path (f64)."""
    from stoch_gpmp_tpu.costs import (
        CostCollision, CostGoal, EESE3DistanceField, LinkDistanceField,
    )
    from stoch_gpmp_tpu.kinematics import homogeneous, z_rot
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda
    from stoch_gpmp_tpu.planners.gpmp import build_woodbury, gpmp_step_woodbury

    dtype = jnp.float64
    chain = franka_panda(dtype=dtype)
    n_dof, traj_len, dt = 7, 8, 0.05
    start_q = jnp.asarray([0.0, -0.5, 0.0, -2.0, 0.0, 2.0, 0.0], dtype=dtype)
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)])
    target_h = homogeneous(z_rot(jnp.asarray(0.3, dtype=dtype)),
                           jnp.asarray([0.4, 0.2, 0.5], dtype=dtype))
    cost = CostComposite.create(
        n_dof, traj_len,
        [
            CostGP.create(n_dof, traj_len, start, dt,
                          {"sigma_start": 0.001, "sigma_gp": 0.1}, dtype=dtype),
            CostCollision.create(n_dof, traj_len, LinkDistanceField(), sigma_coll=0.1),
            CostGoal.create(n_dof, traj_len, EESE3DistanceField(target_h=target_h),
                            sigma_goal=0.05),
        ],
        fk=chain.fk,
    )
    rng = np.random.default_rng(5)
    means = jnp.asarray(
        start[None, None] + 0.1 * rng.standard_normal((2, traj_len, 2 * n_dof))
    )
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    spheres = jnp.asarray([[[0.5, 0.0, 0.5, 0.1]]], dtype=dtype)
    obs = {"obstacle_spheres": spheres}
    wb = build_woodbury(cost, 1e-2)
    assert wb is not None and wb.n_fields == 2
    s_ref = gpmp_step(cost, state, obs, delta=1e-2, trust_region=False,
                      method="cholesky", step_size=0.2)
    s_wb = gpmp_step_woodbury(wb, cost, state, obs, step_size=0.2)
    np.testing.assert_allclose(
        np.asarray(s_wb.particle_means), np.asarray(s_ref.particle_means),
        rtol=1e-7, atol=1e-9,
    )


def test_gpmp_planner_end_to_end_with_obstacles():
    dtype = jnp.float64
    n_dof, traj_len, dt = 2, 24, 0.05
    start = jnp.asarray([-2.0, -2.0, 0.0, 0.0], dtype=dtype)
    goals = jnp.asarray([[2.0, 2.0, 0.0, 0.0]], dtype=dtype)
    grid = jnp.zeros((40, 40), dtype=dtype).at[18:22, 18:22].set(1.0)
    field = OccupancyGridField(grid=grid, cell_size=0.1)
    cost = CostComposite.create(
        n_dof,
        traj_len,
        [
            CostGP.create(
                n_dof, traj_len, start, dt,
                {"sigma_start": 0.01, "sigma_gp": 0.5}, dtype=dtype,
            ),
            CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=0.01, dtype=dtype),
            CostCollision.create(n_dof, traj_len, field, sigma_coll=0.1),
        ],
    )
    planner = GPMP(
        num_particles_per_goal=3,
        traj_len=traj_len,
        opt_iters=1,
        dt=dt,
        n_dof=n_dof,
        step_size=0.5,
        start_state=start,
        multi_goal_states=goals,
        cost=cost,
        sigma_start_init=0.01,
        sigma_goal_init=0.01,
        sigma_gp_init=2.0,
        sigma_start_sample=0.01,
        sigma_goal_sample=0.01,
        sigma_gp_sample=0.5,
        solver_params={"delta": 1e-2, "trust_region": False, "method": "cholesky"},
        seed=0,
        dtype=dtype,
    )
    c0 = np.asarray(
        planner.cost.eval(planner.particle_means.reshape(3, -1), observation={})
    )
    vel, pos, costs = planner.optimize(opt_iters=60)
    assert np.all(np.isfinite(np.asarray(costs)))
    assert float(np.asarray(costs).mean()) < float(c0.mean())
    # endpoints anchored
    end = np.asarray(pos[:, -1])
    assert np.abs(end - np.asarray(goals)[0, :2]).max() < 0.3
    st = np.asarray(pos[:, 0])
    assert np.abs(st - np.asarray(start)[:2]).max() < 0.1


def test_gpmp_sample_trajectories():
    cost, start, goals, n_dof, traj_len, dt = _quad_problem()
    planner = GPMP(
        num_particles_per_goal=2,
        traj_len=traj_len,
        opt_iters=1,
        dt=dt,
        n_dof=n_dof,
        start_state=start,
        multi_goal_states=goals,
        cost=cost,
        sigma_start_init=0.01,
        sigma_goal_init=0.01,
        sigma_gp_init=2.0,
        sigma_start_sample=0.01,
        sigma_goal_sample=0.01,
        sigma_gp_sample=0.5,
        solver_params={"delta": 0.0, "trust_region": False, "method": "cholesky"},
        dtype=jnp.float64,
    )
    pos, vel = planner.sample_trajectories(5)
    assert pos.shape == (4, 5, traj_len, 2)
    assert vel.shape == (4, 5, traj_len, 2)


@pytest.mark.slow
def test_gpmp_panda_with_fk_fields():
    """Gauss-Newton with field Jacobians flowing through the FK chain
    (reference field_factor.py:34-38 autograd path -> jax.grad here)."""
    from stoch_gpmp_tpu.costs import (
        CostCollision,
        CostGoal,
        EESE3DistanceField,
        LinkDistanceField,
    )
    from stoch_gpmp_tpu.kinematics import homogeneous, z_rot
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda

    dtype = jnp.float64
    chain = franka_panda(dtype=dtype)
    n_dof, traj_len, dt = 7, 8, 0.05
    start_q = jnp.asarray([0.0, -0.5, 0.0, -2.0, 0.0, 2.0, 0.0], dtype=dtype)
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)])
    target_h = homogeneous(z_rot(jnp.asarray(0.3, dtype=dtype)),
                           jnp.asarray([0.4, 0.2, 0.5], dtype=dtype))
    cost = CostComposite.create(
        n_dof, traj_len,
        [
            CostGP.create(n_dof, traj_len, start, dt,
                          {"sigma_start": 0.001, "sigma_gp": 0.1}, dtype=dtype),
            CostCollision.create(n_dof, traj_len, LinkDistanceField(), sigma_coll=0.1),
            CostGoal.create(n_dof, traj_len, EESE3DistanceField(target_h=target_h),
                            sigma_goal=0.05),
        ],
        fk=chain.fk,
    )
    means = jnp.tile(start[None, None, :], (2, traj_len, 1))
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    spheres = jnp.asarray([[[0.5, 0.0, 0.5, 0.1]]], dtype=dtype)
    obs = {"obstacle_spheres": spheres}

    from stoch_gpmp_tpu.kinematics.se3 import se3_distance

    def ee_dist(m):
        return float(
            se3_distance(chain.ee_pose(m[:, -1, :n_dof]), target_h).mean()
        )

    d0 = ee_dist(means)
    new = state
    for _ in range(15):
        new = gpmp_step(cost, new, obs, delta=1e-2, trust_region=False,
                        method="cholesky", step_size=0.2)
    assert np.all(np.isfinite(np.asarray(new.particle_means)))
    # GN through the FK-based field Jacobians pulls the final EE toward the
    # SE(3) target while keeping the start anchored
    assert ee_dist(new.particle_means) < d0
    np.testing.assert_allclose(
        np.asarray(new.particle_means[:, 0, :n_dof]),
        np.asarray(jnp.tile(start_q, (2, 1))),
        atol=0.05,
    )


def test_gn_rank1_consistent_with_gn_contrib():
    """gn_rank1's (h, e, k) reconstructs gn_contrib's diag (k h h^T) and
    gradient (k h e) for the raster-field collision cost."""
    dtype = jnp.float64
    n_dof, traj_len = 2, 10
    xg, yg = jnp.meshgrid(jnp.arange(40, dtype=dtype), jnp.arange(40, dtype=dtype))
    grid = jnp.exp(-((xg - 20.0) ** 2 + (yg - 20.0) ** 2) / 50.0)
    from stoch_gpmp_tpu.costs import OccupancyGridField

    field = OccupancyGridField(grid=grid, cell_size=0.1)
    coll = CostCollision.create(n_dof, traj_len, field, sigma_coll=0.1)
    rng = np.random.default_rng(6)
    trajs = jnp.asarray(0.5 * rng.standard_normal((3, traj_len, 2 * n_dof)))
    c = coll.gn_contrib(trajs)
    h, e, k = coll.gn_rank1(trajs)
    d = 2 * n_dof
    h_full = np.zeros((3, traj_len, d))
    h_full[..., :n_dof] = np.asarray(h)
    np.testing.assert_allclose(
        np.asarray(c.diag), k * np.einsum("pti,ptj->ptij", h_full, h_full),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(c.g), k * h_full * np.asarray(e)[..., None],
        rtol=1e-12, atol=1e-12,
    )


def test_build_woodbury_rejects_unsupported_stacks():
    """Stacks without the required structure return None (callers fall back
    to the structured path)."""
    from stoch_gpmp_tpu.planners.gpmp import build_woodbury

    class Weird:
        pass

    cost, *_ = _quad_problem()
    broken = cost.replace(costs=cost.costs + (Weird(),))
    assert build_woodbury(broken, 1e-2) is None
