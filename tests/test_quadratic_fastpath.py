"""Fused QuadraticCost and fast field lookups: exact parity with the
reference-style cost stack."""

import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.costs import CostGP, CostGoalPrior
from stoch_gpmp_tpu.costs.fields import OccupancyGridField, Primitive2DField
from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
from stoch_gpmp_tpu.envs import ObstacleCircle, ObstacleRectangle


def test_quadratic_cost_matches_gp_plus_goal_prior():
    rng = np.random.default_rng(0)
    n_dof, traj_len, dt = 2, 16, 0.05
    d = 2 * n_dof
    start = jnp.asarray(rng.standard_normal(d))
    goals = jnp.asarray(rng.standard_normal((3, d)))
    gp = CostGP.create(
        n_dof, traj_len, start, dt, {"sigma_start": 0.01, "sigma_gp": 0.7},
        dtype=jnp.float64,
    )
    gpr = CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=0.2, dtype=jnp.float64)
    fused = QuadraticCost.from_gp_and_goal_prior(gp, gpr, traj_len)

    trajs = jnp.asarray(rng.standard_normal((6, traj_len, d)))
    want = np.asarray(gp.eval(trajs)) + np.asarray(gpr.eval(trajs))
    got = np.asarray(fused.eval(trajs))
    np.testing.assert_allclose(got, want, rtol=1e-9)

    # GN contribution parity
    ca = gp.gn_contrib(trajs)
    cb = gpr.gn_contrib(trajs)
    cf = fused.gn_contrib(trajs)
    np.testing.assert_allclose(
        np.asarray(cf.diag), np.asarray(ca.diag + cb.diag), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(cf.lower), np.asarray(ca.lower), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(cf.g), np.asarray(ca.g + cb.g), rtol=1e-8, atol=1e-9
    )


def test_quadratic_cost_no_goal():
    rng = np.random.default_rng(1)
    n_dof, traj_len, dt = 2, 8, 0.1
    start = jnp.asarray(rng.standard_normal(4))
    gp = CostGP.create(
        n_dof, traj_len, start, dt, {"sigma_start": 0.1, "sigma_gp": 1.0},
        dtype=jnp.float64,
    )
    fused = QuadraticCost.from_gp_and_goal_prior(gp, None, traj_len)
    trajs = jnp.asarray(rng.standard_normal((4, traj_len, 4)))
    np.testing.assert_allclose(
        np.asarray(fused.eval(trajs)), np.asarray(gp.eval(trajs)), rtol=1e-9
    )


def test_onehot_lookup_matches_gather():
    rng = np.random.default_rng(2)
    grid = jnp.asarray(rng.random((20, 30)))
    x = jnp.asarray(rng.uniform(-3, 3, (5, 7, 2)))
    f_gather = OccupancyGridField(grid=grid, cell_size=0.2, lookup="gather")
    f_onehot = OccupancyGridField(grid=grid, cell_size=0.2, lookup="onehot")
    np.testing.assert_allclose(
        np.asarray(f_gather.compute_cost(x)),
        np.asarray(f_onehot.compute_cost(x)),
        rtol=1e-6,
    )


def test_primitive_field_matches_analytic_membership():
    rects = [ObstacleRectangle(1.0, 2.0, 2.0, 1.0)]
    circles = [ObstacleCircle(-2.0, -1.0, 1.5)]
    f = Primitive2DField.from_obstacles(rects + circles, dtype=jnp.float64)
    pts = jnp.asarray(
        [
            [1.0, 2.0],  # inside rect
            [1.9, 2.4],  # inside rect corner
            [2.5, 2.0],  # outside rect
            [-2.0, -1.0],  # inside circle
            [-2.0, 0.6],  # outside circle (dist 1.6 > 1.5)
            [10.0, 10.0],  # far outside
        ]
    )
    np.testing.assert_allclose(
        np.asarray(f.compute_cost(pts)), [1, 1, 0, 1, 0, 0]
    )


def test_primitive_field_approximates_grid():
    """Away from cell boundaries the analytic field and the rasterized grid
    agree."""
    from stoch_gpmp_tpu.envs import generate_obstacle_map

    obst_map, obst_list = generate_obstacle_map(
        map_dim=(20, 20),
        cell_size=0.1,
        random_gen=True,
        num_obst=8,
        rand_limits=[[-6, 6], [-6, 6]],
        rand_rect_shape=[2, 2],
        rng=0,
        dtype=jnp.float64,
    )
    prim = Primitive2DField.from_obstacles(obst_list, dtype=jnp.float64)
    grid = obst_map.as_field()
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-7, 7, (2000, 2)))
    a = np.asarray(prim.compute_collision(pts))
    b = np.asarray(grid.compute_cost(pts)) > 0
    # allow a small disagreement rate from cell quantization at boundaries
    assert (a != b).mean() < 0.05


def test_dense_quad_from_dof_matches_quadratic_cost():
    """The planar fused kernels' matmul path rebuilds (A, b) from the dof
    stencil params (ops/pallas/stencil.py dense_quad_from_dof); must equal
    QuadraticCost's own assembly."""
    import jax.numpy as jnp
    import numpy as np

    from stoch_gpmp_tpu.costs import CostGP, CostGoalPrior
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
    from stoch_gpmp_tpu.ops.pallas.stencil import dense_quad_from_dof

    t, n_dof = 11, 3
    start = jnp.arange(2 * n_dof, dtype=jnp.float64) * 0.1
    goals = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 2 * n_dof)), jnp.float64
    )
    gp = CostGP.create(n_dof, t, start, 0.05,
                       {"sigma_start": 1e-3, "sigma_gp": 0.1},
                       dtype=jnp.float64)
    goal_prior = CostGoalPrior.create(n_dof, t, goals, sigma_goal_prior=20.0,
                                      dtype=jnp.float64)
    quad = QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t)
    a, b = dense_quad_from_dof(quad.dof_form, t, n_dof)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(quad.a_dense, dtype=np.float32), rtol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(quad.b, dtype=np.float32),
        rtol=2e-6, atol=1e-8
    )


def test_stencil_gate_decided_at_construction():
    """The stencil-vs-dense verdict (trace-safe ``stencil_required``, set by
    ``needs_stencil`` at construction) picks the residual form at the
    reference's Panda sigmas (weights ~2e11 — bf16-MXU-unsafe) and keeps the
    dense matmul at planar conditioning (~1.5e8); the two branches are the
    same quadratic (exact in f64)."""
    from stoch_gpmp_tpu.ops.pallas.stencil import STENCIL_CONDITION_THRESHOLD

    rng = np.random.default_rng(7)

    def build(n_dof, sigmas, dtype):
        d = 2 * n_dof
        start = jnp.asarray(rng.standard_normal(d), dtype)
        goals = jnp.asarray(rng.standard_normal((2, d)), dtype)
        gp = CostGP.create(n_dof, 16, start, 0.05, sigmas, dtype=dtype)
        gpr = CostGoalPrior.create(
            n_dof, 16, goals, sigma_goal_prior=20.0, dtype=dtype
        )
        return QuadraticCost.from_gp_and_goal_prior(gp, gpr, 16)

    panda_sig = {"sigma_start": 1e-4, "sigma_gp": 7e-4}
    planar_sig = {"sigma_start": 1e-3, "sigma_gp": 0.7}
    assert build(7, panda_sig, jnp.float32).stencil_required
    assert not build(2, planar_sig, jnp.float32).stencil_required
    # threshold sanity: planar's max weight really is below the gate
    q = build(2, planar_sig, jnp.float32).dof_form
    assert np.abs(np.asarray(q.k_s2)).max() < STENCIL_CONDITION_THRESHOLD

    # branch equivalence where both are exact (f64): force each branch
    fused = build(7, panda_sig, jnp.float64)
    trajs = jnp.asarray(rng.standard_normal((6, 16, 14)))
    stencil = np.asarray(fused._eval_stencil(trajs))
    dense = np.asarray(fused.replace(stencil_required=False).eval(trajs))
    np.testing.assert_allclose(stencil, dense, rtol=1e-9)
    # and eval() routes through the gate
    np.testing.assert_allclose(np.asarray(fused.eval(trajs)), stencil, rtol=0)
