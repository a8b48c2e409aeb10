"""Golden parity vs the actual reference implementation (torch CPU).

These tests import the PyTorch reference from /root/reference (read-only
checkout) and compare our structured/vectorized implementations against it on
identical inputs — RNG-free, so comparisons are exact to float tolerance.
Skipped when the reference checkout or torch is unavailable.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _stub_torch_robotics():
    """The reference's fields.py imports torch_robotics at module level but
    LinkDistanceField/LinkSelfDistanceField never use it; stub the import so
    those classes are testable without the external package."""
    import types

    if "torch_robotics" in sys.modules:
        return
    names = [
        "torch_robotics",
        "torch_robotics.torch_kinematics_tree",
        "torch_robotics.torch_kinematics_tree.geometrics",
        "torch_robotics.torch_kinematics_tree.geometrics.utils",
    ]
    for n in names:
        sys.modules[n] = types.ModuleType(n)

    def _unavailable(*a, **k):  # pragma: no cover
        raise RuntimeError("torch_robotics stub: SE3_distance not available")

    sys.modules[names[-1]].SE3_distance = _unavailable


_stub_torch_robotics()

try:
    from stoch_gpmp.costs.factors.gp_factor import GPFactor as RefGPFactor
    from stoch_gpmp.costs.factors.mp_priors_multi import MultiMPPrior as RefPrior
    from stoch_gpmp.costs.factors.unary_factor import UnaryFactor as RefUnary
    from stoch_gpmp.envs.obst_map import ObstacleMap as RefMap
    from stoch_gpmp.envs.obst_map import ObstacleRectangle as RefRect

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference checkout unavailable")

TA = {"device": torch.device("cpu"), "dtype": torch.float64}


def test_gp_factor_parity():
    from stoch_gpmp_tpu.gp import phi_matrix, q_inv_block

    dof, dt, sigma, num_factors = 3, 0.05, 0.7, 9
    ref = RefGPFactor(dof, sigma, dt, num_factors, tensor_args=TA)
    np.testing.assert_allclose(
        np.asarray(phi_matrix(dof, dt, dtype=jnp.float64)), ref.phi.numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(q_inv_block(dof, dt, sigma=sigma, dtype=jnp.float64)),
        ref.Q_inv[0].numpy(),
        rtol=1e-12,
    )


def test_gp_error_parity():
    from stoch_gpmp_tpu.costs.factors import gp_error
    from stoch_gpmp_tpu.gp import phi_matrix

    dof, dt, num_factors = 2, 0.1, 7
    ref = RefGPFactor(dof, 0.5, dt, num_factors, tensor_args=TA)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, num_factors + 1, 2 * dof))
    ref_err = ref.get_error(torch.from_numpy(x), calc_jacobian=False)
    got = gp_error(jnp.asarray(x), phi_matrix(dof, dt, dtype=jnp.float64))
    np.testing.assert_allclose(
        np.asarray(got), ref_err.squeeze(-1).numpy(), rtol=1e-10
    )


def test_unary_factor_parity():
    from stoch_gpmp_tpu.costs.factors import unary_error
    from stoch_gpmp_tpu.gp import unary_weight

    dim, sigma = 6, 0.03
    mean = torch.from_numpy(np.random.default_rng(1).standard_normal(dim))
    ref = RefUnary(dim, sigma, mean, TA)
    np.testing.assert_allclose(
        np.asarray(unary_weight(dim, sigma, dtype=jnp.float64)), ref.K.numpy(), rtol=1e-12
    )
    x = np.random.default_rng(2).standard_normal((5, dim))
    ref_err = ref.get_error(torch.from_numpy(x), calc_jacobian=False)
    got = unary_error(jnp.asarray(x), jnp.asarray(mean.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref_err.numpy(), rtol=1e-12)


@pytest.mark.parametrize(
    "dof,traj_len,dt,s_start,s_gp,s_goal",
    [
        (2, 16, 0.02, 1e-3, 3.0, 1e-3),
        (7, 8, 0.05, 0.001, 0.1, 0.07),
        (2, 12, 0.1, 0.01, 1.0, None),
    ],
)
def test_prior_precision_parity(dof, traj_len, dt, s_start, s_gp, s_goal):
    """Our block-tridiagonal precision == the reference's dense A^T Q^-1 A."""
    from stoch_gpmp_tpu.gp import build_precision, q_inv_block, unary_weight

    d = 2 * dof
    num_steps = traj_len - 1
    start = torch.zeros(d, **TA)
    goal_directed = s_goal is not None
    goals = torch.ones(2, d, **TA) if goal_directed else None
    k_s = torch.eye(d, **TA) / s_start**2
    ref_gp = RefGPFactor(dof, s_gp, dt, num_steps, tensor_args=TA)
    k_g = torch.eye(d, **TA) / s_goal**2 if goal_directed else None
    ref = RefPrior(
        num_steps, dt, d, dof, k_s, ref_gp.Q_inv[0], start,
        K_g_inv=k_g, goal_states=goals, tensor_args=TA,
    )
    ours = build_precision(
        dof,
        traj_len,
        dt,
        unary_weight(d, s_start, dtype=jnp.float64),
        q_inv_block(dof, dt, sigma=s_gp, dtype=jnp.float64),
        k_g_inv=None if not goal_directed else unary_weight(d, s_goal, dtype=jnp.float64),
        dtype=jnp.float64,
    )
    np.testing.assert_allclose(
        np.asarray(ours.to_dense()), ref.Sigma_inv.numpy(), rtol=1e-9, atol=1e-9
    )


def test_const_vel_mean_parity():
    from stoch_gpmp_tpu.gp import const_vel_means

    dof, num_steps, dt = 2, 10, 0.1
    d = 2 * dof
    start = np.asarray([1.0, -2.0, 0.0, 0.0])
    goals = np.asarray([[3.0, 4.0, 0.0, 0.0], [-1.0, 0.0, 0.0, 0.0]])
    k = torch.eye(d, **TA)
    ref_gp = RefGPFactor(dof, 1.0, dt, num_steps, tensor_args=TA)
    ref = RefPrior(
        num_steps, dt, d, dof, k, ref_gp.Q_inv[0], torch.from_numpy(start),
        K_g_inv=k, goal_states=torch.from_numpy(goals), tensor_args=TA,
    )
    ref_means = ref.get_mean().numpy()
    ours = const_vel_means(jnp.asarray(start), jnp.asarray(goals), num_steps, dt, dof)
    np.testing.assert_allclose(np.asarray(ours), ref_means, rtol=1e-9, atol=1e-12)


def test_cost_gp_eval_parity():
    """CostGP.eval on identical trajectories matches the reference cost."""
    sys_path_has = True
    from stoch_gpmp.costs.cost_functions import CostGP as RefCostGP

    from stoch_gpmp_tpu.costs import CostGP

    dof, traj_len, dt = 2, 12, 0.05
    d = 2 * dof
    rng = np.random.default_rng(3)
    start = rng.standard_normal(d)
    sigmas = {"sigma_start": 0.02, "sigma_gp": 0.4}
    ref = RefCostGP(dof, traj_len, torch.from_numpy(start), dt, sigmas, TA)
    ours = CostGP.create(dof, traj_len, jnp.asarray(start), dt, sigmas, dtype=jnp.float64)
    trajs = rng.standard_normal((6, traj_len, d))
    ref_costs = ref.eval(torch.from_numpy(trajs)).numpy()
    got = np.asarray(ours.eval(jnp.asarray(trajs)))
    np.testing.assert_allclose(got, ref_costs, rtol=1e-9)


def test_cost_goal_prior_eval_parity():
    from stoch_gpmp.costs.cost_functions import CostGoalPrior as RefCostGoalPrior

    from stoch_gpmp_tpu.costs import CostGoalPrior

    dof, traj_len = 2, 8
    d = 2 * dof
    rng = np.random.default_rng(4)
    goals = rng.standard_normal((3, d))
    npg, ns = 2, 4
    ref = RefCostGoalPrior(
        dof, traj_len,
        multi_goal_states=torch.from_numpy(goals),
        num_particles_per_goal=npg,
        num_samples=ns,
        sigma_goal_prior=0.3,
        tensor_args=TA,
    )
    ours = CostGoalPrior.create(dof, traj_len, jnp.asarray(goals), 0.3, dtype=jnp.float64)
    trajs = rng.standard_normal((3 * npg * ns, traj_len, d))
    ref_costs = ref.eval(torch.from_numpy(trajs)).numpy()
    got = np.asarray(ours.eval(jnp.asarray(trajs)))
    np.testing.assert_allclose(got, ref_costs, rtol=1e-9)


def test_obstacle_map_lookup_parity():
    """Same rasterized map + same query points -> identical collision values."""
    from stoch_gpmp_tpu.costs.fields import OccupancyGridField

    ref_map = RefMap((20, 20), 0.1, tensor_args=TA)
    RefRect(1.0, 2.0, 3.0, 2.0)._add_to_map(ref_map)
    ref_map.convert_map()
    ours = OccupancyGridField(grid=jnp.asarray(ref_map.map), cell_size=0.1)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-11, 11, (500, 2))  # includes out-of-bounds clamping
    ref_vals = ref_map.get_collisions(torch.from_numpy(pts)).numpy()
    got = np.asarray(ours.compute_cost(jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref_vals)
    # one-hot path too
    ours_oh = OccupancyGridField(grid=jnp.asarray(ref_map.map), cell_size=0.1, lookup="onehot")
    np.testing.assert_allclose(np.asarray(ours_oh.compute_cost(jnp.asarray(pts))), ref_vals)


def test_rectangle_rasterization_parity():
    """Our numpy rasterizer produces the same grid as the reference's."""
    from stoch_gpmp_tpu.envs import ObstacleMap, ObstacleRectangle

    ref_map = RefMap((20, 20), 0.1, tensor_args=TA)
    RefRect(1.3, -2.7, 2.0, 3.0)._add_to_map(ref_map)
    ours = ObstacleMap((20, 20), 0.1)
    ObstacleRectangle(1.3, -2.7, 2.0, 3.0).add_to_map(ours)
    np.testing.assert_array_equal(ours.map, ref_map.map)


def test_circle_rasterization_parity():
    from stoch_gpmp.envs.obst_map import ObstacleCircle as RefCircle

    from stoch_gpmp_tpu.envs import ObstacleCircle, ObstacleMap

    ref_map = RefMap((20, 20), 0.1, tensor_args=TA)
    RefCircle(-1.0, 2.5, 1.3)._add_to_map(ref_map)
    ours = ObstacleMap((20, 20), 0.1)
    ObstacleCircle(-1.0, 2.5, 1.3).add_to_map(ours)
    np.testing.assert_array_equal(ours.map, ref_map.map)


def test_link_distance_field_parity():
    """LinkDistanceField rbf/sdf/occupancy vs the reference on identical
    link poses and spheres (reference fields.py imports torch_robotics at
    module level only for SE3; LinkDistanceField itself is importable)."""
    try:
        from stoch_gpmp.costs.fields import LinkDistanceField as RefField
    except Exception:
        pytest.skip("reference fields module needs torch_robotics")

    from stoch_gpmp_tpu.costs import LinkDistanceField

    rng = np.random.default_rng(6)
    link_tensor = np.tile(np.eye(4), (4, 6, 1, 1))
    link_tensor[..., :3, 3] = rng.standard_normal((4, 6, 3))
    spheres = np.concatenate(
        [rng.standard_normal((1, 5, 3)), rng.uniform(0.2, 0.6, (1, 5, 1))], axis=-1
    )
    for ft in ("rbf", "sdf", "occupancy"):
        ref = RefField(field_type=ft, tensor_args=TA)
        ref_c = ref.compute_cost(
            torch.from_numpy(link_tensor), obstacle_spheres=torch.from_numpy(spheres)
        ).numpy()
        ours = LinkDistanceField(field_type=ft)
        got = np.asarray(
            ours.compute_cost(jnp.asarray(link_tensor), obstacle_spheres=jnp.asarray(spheres))
        )
        np.testing.assert_allclose(got, ref_c, rtol=1e-9, err_msg=ft)


def test_self_distance_field_parity():
    try:
        from stoch_gpmp.costs.fields import LinkSelfDistanceField as RefField
    except Exception:
        pytest.skip("reference fields module needs torch_robotics")

    from stoch_gpmp_tpu.costs import LinkSelfDistanceField

    rng = np.random.default_rng(7)
    link_tensor = np.tile(np.eye(4), (3, 8, 1, 1))
    link_tensor[..., :3, 3] = rng.standard_normal((3, 8, 3))
    ref = RefField(margin=0.05, tensor_args=TA)
    ref_c = ref.compute_cost(torch.from_numpy(link_tensor)).numpy()
    got = np.asarray(
        LinkSelfDistanceField(margin=0.05).compute_cost(jnp.asarray(link_tensor))
    )
    np.testing.assert_allclose(got, ref_c, rtol=1e-9)


def test_torch_robotics_shim_fk_matches_native():
    """The torch FK shim that lets the ACTUAL reference Panda planner run
    here (benchmarks/reference_panda_shim.py) is bit-identical to the native
    chain — both planners therefore see the same cost definitions."""
    torch = pytest.importorskip("torch")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))
    from reference_panda_shim import install_torch_robotics_shim

    install_torch_robotics_shim()
    from torch_robotics.torch_kinematics_tree.geometrics.utils import (
        SE3_distance,
    )
    from torch_robotics.torch_kinematics_tree.models.robots import (
        DifferentiableFrankaPanda,
    )

    from stoch_gpmp_tpu.kinematics import se3_distance
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda

    chain = franka_panda(dtype=jnp.float64)
    fk_t = DifferentiableFrankaPanda()
    rng = np.random.default_rng(3)
    q = rng.uniform(-2.0, 2.0, (6, 7))
    ours = np.asarray(chain.fk(jnp.asarray(q)))
    theirs = fk_t.compute_forward_kinematics_all_links(torch.as_tensor(q)).numpy()
    np.testing.assert_allclose(theirs, ours, atol=1e-12)

    # SE3 distance agrees with the native implementation on the EE frames
    h1 = torch.as_tensor(ours[:, -1])
    h2 = torch.as_tensor(ours[0, -1])
    d_t = SE3_distance(h1, h2, w_pos=1.0, w_rot=1.0).numpy()
    d_n = np.asarray(se3_distance(
        jnp.asarray(ours[:, -1]), jnp.asarray(ours[0, -1]), w_pos=1.0, w_rot=1.0
    ))
    np.testing.assert_allclose(d_t, d_n, atol=1e-7)
