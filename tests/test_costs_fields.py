"""Cost stack and distance fields vs hand-computed / numpy oracles."""

import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.costs import (
    CostCollision,
    CostComposite,
    CostGP,
    CostGoal,
    CostGoalPrior,
    EESE3DistanceField,
    LinkDistanceField,
    LinkSelfDistanceField,
    OccupancyGridField,
)
from stoch_gpmp_tpu.kinematics.se3 import homogeneous, z_rot
from tests.oracles import phi_np, q_inv_np


def _rand_trajs(rng, b, t, d):
    return jnp.asarray(rng.standard_normal((b, t, d)))


def test_cost_gp_matches_oracle():
    rng = np.random.default_rng(0)
    n_dof, t, dt = 2, 8, 0.1
    d = 2 * n_dof
    start = jnp.asarray(rng.standard_normal(d))
    cost = CostGP.create(
        n_dof, t, start, dt, {"sigma_start": 0.05, "sigma_gp": 0.7}, dtype=jnp.float64
    )
    trajs = _rand_trajs(rng, 5, t, d)
    got = np.asarray(cost.eval(trajs))

    # Oracle: e0^T K e0 + sum_t e_t^T Qinv e_t (reference cost_functions.py:128-146)
    k = np.eye(d) / 0.05**2
    qinv = q_inv_np(n_dof, dt, 0.7)
    phi = phi_np(n_dof, dt)
    x = np.asarray(trajs)
    e0 = np.asarray(start) - x[:, 0]
    want = np.einsum("bi,ij,bj->b", e0, k, e0)
    e = x[:, 1:] - np.einsum("ij,btj->bti", phi, x[:, :-1])
    want += np.einsum("bti,ij,btj->b", e, qinv, e)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_cost_goal_prior_vectorized_matches_per_goal_loop():
    rng = np.random.default_rng(1)
    n_dof, t = 2, 6
    d = 2 * n_dof
    goals = jnp.asarray(rng.standard_normal((3, d)))
    cost = CostGoalPrior.create(
        n_dof, t, goals, sigma_goal_prior=0.3, dtype=jnp.float64
    )
    # goal-major batch: 3 goals x 4 per-goal
    trajs = _rand_trajs(rng, 12, t, d)
    got = np.asarray(cost.eval(trajs))
    k = np.eye(d) / 0.3**2
    x = np.asarray(trajs).reshape(3, 4, t, d)
    want = np.zeros((3, 4))
    for g in range(3):  # the reference's per-goal loop (cost_functions.py:381-387)
        e = np.asarray(goals[g]) - x[g, :, -1]
        want[g] = np.einsum("bi,ij,bj->b", e, k, e)
    np.testing.assert_allclose(got, want.reshape(-1), rtol=1e-10)


def test_occupancy_grid_lookup():
    grid = jnp.zeros((10, 10), dtype=jnp.float64).at[7, 3].set(1.0)
    field = OccupancyGridField(grid=grid, cell_size=0.5)
    # world (x, y) -> cell (x/0.5 + 5, y/0.5 + 5); cell (3, 7) <- world (-1.0, 1.0)
    x = jnp.asarray([[-1.0, 1.0], [0.0, 0.0], [100.0, 100.0], [-100.0, -100.0]])
    got = np.asarray(field.compute_cost(x))
    np.testing.assert_allclose(got, [1.0, 0.0, 0.0, 0.0])


def test_cost_collision_skips_timestep_zero():
    grid = jnp.ones((4, 4), dtype=jnp.float64)  # everything is a collision
    field = OccupancyGridField(grid=grid, cell_size=1.0)
    cost = CostCollision.create(2, 5, field, sigma_coll=1.0)
    trajs = jnp.zeros((2, 5, 4), dtype=jnp.float64)
    got = np.asarray(cost.eval(trajs))
    # T-1 = 4 timesteps counted (step 0 skipped, reference cost_functions.py:244)
    np.testing.assert_allclose(got, [4.0, 4.0])


def test_link_distance_field_types():
    rng = np.random.default_rng(2)
    # 2 batch, 3 links, identity rotations, random positions
    pos = rng.standard_normal((2, 3, 3))
    link_tensor = np.tile(np.eye(4), (2, 3, 1, 1))
    link_tensor[..., :3, 3] = pos
    spheres = np.array([[[0.0, 0.0, 0.0, 0.5], [1.0, 1.0, 1.0, 0.25]]])  # [1, 2, 4]
    lt, sp = jnp.asarray(link_tensor), jnp.asarray(spheres)

    # rbf: sum exp(-0.5 ||p-c||^2 / r^2) (reference fields.py:78-79)
    rbf = LinkDistanceField(field_type="rbf")
    diff = pos[:, :, None, :] - spheres[..., :3]
    sq = (diff**2).sum(-1)
    want = np.exp(-0.5 * sq / spheres[..., 3] ** 2).sum((-1, -2))
    np.testing.assert_allclose(np.asarray(rbf.compute_cost(lt, obstacle_spheres=sp)), want, rtol=1e-6)

    # sdf: max_t (r - dist) (reference fields.py:80-84)
    sdf = LinkDistanceField(field_type="sdf")
    want_sdf = (-np.sqrt(sq) + spheres[..., 3]).max((-1, -2))
    np.testing.assert_allclose(np.asarray(sdf.compute_cost(lt, obstacle_spheres=sp)), want_sdf, rtol=1e-6)

    # occupancy: count inside (reference fields.py:85-86)
    occ = LinkDistanceField(field_type="occupancy")
    want_occ = (np.sqrt(sq) < spheres[..., 3]).sum((-1, -2)).astype(float)
    np.testing.assert_allclose(np.asarray(occ.compute_cost(lt, obstacle_spheres=sp)), want_occ)

    # None obstacles -> zero cost
    np.testing.assert_allclose(np.asarray(rbf.compute_cost(lt)), np.zeros(2))


def test_self_distance_field():
    pos = np.array([[0.0, 0, 0], [1, 0, 0], [0, 2, 0]])
    link_tensor = np.tile(np.eye(4), (1, 3, 1, 1))
    link_tensor[..., :3, 3] = pos
    f = LinkSelfDistanceField(margin=0.5)
    sq = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    want = np.exp(sq / (-0.5**2 * 2)).sum()
    np.testing.assert_allclose(
        np.asarray(f.compute_cost(jnp.asarray(link_tensor))), [want], rtol=1e-6
    )
    # collision check excludes adjacent pairs (tril diagonal=-2)
    close = np.array([[0.0, 0, 0], [0.01, 0, 0], [0.02, 0, 0]])
    lt2 = np.tile(np.eye(4), (1, 3, 1, 1))
    lt2[..., :3, 3] = close
    col = np.asarray(f.compute_collision(jnp.asarray(lt2), buffer=0.05))
    assert col[0]  # links 0 and 2 are within buffer and non-adjacent


def test_ee_se3_field():
    theta = 0.7
    target = homogeneous(z_rot(jnp.asarray(theta)), jnp.asarray([1.0, 2.0, 3.0]))
    f = EESE3DistanceField(target_h=target, w_pos=2.0, w_rot=0.5, square=False)
    # EE at identity rotation, offset position
    ee = homogeneous(z_rot(jnp.asarray(0.0)), jnp.asarray([1.0, 2.0, 0.0]))
    link_tensor = jnp.stack([jnp.eye(4), ee])[None]  # [1, 2, 4, 4] — last is EE
    got = float(f.compute_cost(link_tensor)[0])
    want = 2.0 * 3.0 + 0.5 * theta
    np.testing.assert_allclose(got, want, rtol=1e-5)
    sq = EESE3DistanceField(target_h=target, w_pos=2.0, w_rot=0.5, square=True)
    np.testing.assert_allclose(float(sq.compute_cost(link_tensor)[0]), want**2, rtol=1e-5)


def test_cost_composite_sums_children():
    rng = np.random.default_rng(3)
    n_dof, t, dt = 2, 6, 0.1
    d = 2 * n_dof
    start = jnp.zeros(d, dtype=jnp.float64)
    goals = jnp.asarray(rng.standard_normal((2, d)))
    c1 = CostGP.create(n_dof, t, start, dt, {"sigma_start": 0.1, "sigma_gp": 1.0}, dtype=jnp.float64)
    c2 = CostGoalPrior.create(n_dof, t, goals, sigma_goal_prior=0.5, dtype=jnp.float64)
    comp = CostComposite.create(n_dof, t, [c1, c2])
    trajs = _rand_trajs(rng, 4, t, d)
    got = np.asarray(comp.eval(trajs))
    want = np.asarray(c1.eval(trajs)) + np.asarray(c2.eval(trajs))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_cost_gp_trajectory():
    """CostGPTrajectory = GP smoothness only (reference cost_functions.py:171-218)."""
    from stoch_gpmp_tpu.costs import CostGPTrajectory

    rng = np.random.default_rng(5)
    n_dof, t, dt = 2, 8, 0.1
    start = jnp.zeros(4, dtype=jnp.float64)
    full = CostGP.create(n_dof, t, start, dt, {"sigma_start": 1.0, "sigma_gp": 0.7}, dtype=jnp.float64)
    traj_only = CostGPTrajectory.create(n_dof, t, start, dt, {"sigma_gp": 0.7}, dtype=jnp.float64)
    trajs = _rand_trajs(rng, 3, t, 4)
    # anchored at start -> start term vanishes, costs must agree
    anchored = trajs.at[:, 0, :].set(start)
    np.testing.assert_allclose(
        np.asarray(traj_only.eval(anchored)), np.asarray(full.eval(anchored)), rtol=1e-9
    )
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        traj_only.gn_contrib(trajs)


def test_link_field_interpolation():
    """num_interpolate adds points along the configured link segments
    (reference fields.py:68-74)."""
    pos = np.zeros((1, 3, 3))
    pos[0, 0] = [0, 0, 0]
    pos[0, 1] = [1, 0, 0]
    pos[0, 2] = [2, 0, 0]
    lt = np.tile(np.eye(4), (1, 3, 1, 1))
    lt[..., :3, 3] = pos
    spheres = jnp.asarray([[[1.5, 0.0, 0.0, 0.1]]])
    f0 = LinkDistanceField(field_type="occupancy", num_interpolate=0)
    f3 = LinkDistanceField(
        field_type="occupancy", num_interpolate=3, link_interpolate_range=(1, 2)
    )
    # the sphere at x=1.5 contains no raw link point, but contains an
    # interpolated point on the segment link1->link2
    c0 = float(f0.compute_cost(jnp.asarray(lt), obstacle_spheres=spheres)[0])
    c3 = float(f3.compute_cost(jnp.asarray(lt), obstacle_spheres=spheres)[0])
    assert c0 == 0.0 and c3 >= 1.0


def test_cost_collision_custom_traj_range():
    """traj_range generalizes the field slice (reference field_factor.py:10-15)."""
    grid = jnp.ones((4, 4), dtype=jnp.float64)
    field = OccupancyGridField(grid=grid, cell_size=1.0)
    trajs = jnp.zeros((2, 6, 4), dtype=jnp.float64)
    default = CostCollision.create(2, 6, field, sigma_coll=1.0)
    np.testing.assert_allclose(np.asarray(default.eval(trajs)), [5.0, 5.0])
    mid = CostCollision.create(2, 6, field, sigma_coll=1.0, traj_range=(2, 5))
    np.testing.assert_allclose(np.asarray(mid.eval(trajs)), [3.0, 3.0])


def test_mesh_sphere_field_matches_manual():
    """MeshSphereDistanceField: world centers via FK link poses, RBF on
    surface distance; verified against a manual numpy computation, and the
    planning gradient flows (jax.grad through FK)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stoch_gpmp_tpu.costs.fields import MeshSphereDistanceField
    from stoch_gpmp_tpu.kinematics.panda_collision import (
        PANDA_COLLISION_SPHERES,
    )
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda

    chain = franka_panda(dtype=jnp.float64)
    field = MeshSphereDistanceField.for_panda(chain, dtype=jnp.float64)
    q = jnp.asarray([[0.1, -0.5, 0.2, -2.0, 0.1, 2.0, 0.3]], jnp.float64)
    lt = chain.fk(q)  # [1, L, 4, 4]
    spheres = jnp.asarray([[[0.5, 0.0, 0.5, 0.15], [0.2, 0.3, 0.8, 0.1]]],
                          jnp.float64)
    got = float(field.compute_cost(lt, obstacle_spheres=spheres)[0])

    names = list(chain.link_names)
    lt_np = np.asarray(lt)[0]
    total = 0.0
    for frame, sph in PANDA_COLLISION_SPHERES.items():
        if frame not in names:
            continue
        h = lt_np[names.index(frame)]
        for row in np.asarray(sph):
            cw = h[:3, :3] @ row[:3] + h[:3, 3]
            for o in np.asarray(spheres)[0]:
                d = max(np.linalg.norm(cw - o[:3]) - row[3], 0.0)
                total += np.exp(-0.5 * d * d / o[3] ** 2)
    np.testing.assert_allclose(got, total, rtol=1e-10)

    # gradient flows through FK into joint angles
    def cost_of(qq):
        return field.compute_cost(
            chain.fk(qq), obstacle_spheres=spheres
        ).sum()

    g = np.asarray(jax.grad(cost_of)(q))
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    # collision predicate: obstacle centered on a mesh sphere collides
    cw, rw = field.world_spheres(lt)
    probe = jnp.concatenate([cw[0, 3], jnp.asarray([0.05], jnp.float64)])
    hit = field.compute_collision(lt, obstacle_spheres=probe[None, None])
    assert bool(hit[0])
