"""Kinematics: SE(3) utilities, URDF parsing, Panda FK, IK."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from stoch_gpmp_tpu.kinematics import (
    axis_angle_to_matrix,
    homogeneous,
    matrix_to_quaternion,
    quaternion_to_matrix,
    rpy_to_matrix,
    se3_distance,
    x_rot,
    y_rot,
    z_rot,
)
from stoch_gpmp_tpu.kinematics.ik import pose_error, solve_ik
from stoch_gpmp_tpu.kinematics.panda_model import (
    PANDA_NO_GRIPPER,
    DifferentiableFrankaPanda,
    franka_panda,
)
from stoch_gpmp_tpu.kinematics.urdf import parse_urdf


def test_rotations_vs_scipy():
    rng = np.random.default_rng(0)
    for theta in rng.uniform(-np.pi, np.pi, 5):
        np.testing.assert_allclose(
            np.asarray(x_rot(jnp.asarray(theta))),
            Rotation.from_euler("x", theta).as_matrix(),
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(z_rot(jnp.asarray(theta))),
            Rotation.from_euler("z", theta).as_matrix(),
            atol=1e-7,
        )
    rpy = rng.uniform(-np.pi, np.pi, 3)
    np.testing.assert_allclose(
        np.asarray(rpy_to_matrix(jnp.asarray(rpy))),
        Rotation.from_euler("xyz", rpy).as_matrix(),  # URDF fixed-axis rpy
        atol=1e-7,
    )


def test_axis_angle_vs_scipy():
    rng = np.random.default_rng(1)
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    angle = 1.3
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(jnp.asarray(axis), jnp.asarray(angle))),
        Rotation.from_rotvec(axis * angle).as_matrix(),
        atol=1e-7,
    )


def test_quaternion_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        r = Rotation.random(random_state=rng)
        m = jnp.asarray(r.as_matrix())
        q = np.asarray(matrix_to_quaternion(m))
        want = r.as_quat()  # scipy: [x, y, z, w]
        if np.dot(q, want) < 0:
            want = -want
        np.testing.assert_allclose(q, want, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(quaternion_to_matrix(jnp.asarray(q))), r.as_matrix(), atol=1e-6
        )


def test_se3_distance():
    h1 = homogeneous(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.0]))
    h2 = homogeneous(z_rot(jnp.asarray(0.5)), jnp.asarray([3.0, 4.0, 0.0]))
    d = float(se3_distance(h1, h2, w_pos=1.0, w_rot=2.0))
    np.testing.assert_allclose(d, 5.0 + 2 * 0.5, rtol=1e-5)


def _fk_oracle_scipy(q):
    """Independent FK using scipy Rotation over the same joint data."""
    frames = {"base_link": np.eye(4)}
    qi = 0
    out = {}
    for j in PANDA_NO_GRIPPER.joints:
        t = np.eye(4)
        t[:3, :3] = Rotation.from_euler("xyz", j.origin_rpy).as_matrix()
        t[:3, 3] = j.origin_xyz
        x = frames[j.parent_link] @ t
        if j.actuated:
            m = np.eye(4)
            m[:3, :3] = Rotation.from_rotvec(np.asarray(j.axis) * q[qi]).as_matrix()
            x = x @ m
            qi += 1
        frames[j.child_link] = x
        out[j.child_link] = x
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_panda_fk_matches_scipy_oracle(seed):
    chain = franka_panda(dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    q = rng.uniform(np.asarray(chain.limits_lower), np.asarray(chain.limits_upper))
    got = np.asarray(chain.fk(jnp.asarray(q)))  # [L, 4, 4]
    oracle = _fk_oracle_scipy(q)
    for i, name in enumerate(chain.link_names):
        np.testing.assert_allclose(got[i], oracle[name], atol=1e-9, err_msg=name)


def test_panda_fk_known_geometry():
    chain = franka_panda(dtype=jnp.float64)
    q = jnp.zeros(7, dtype=jnp.float64)
    poses = np.asarray(chain.fk(q))
    # link1 origin is 0.333 m above base at any q
    np.testing.assert_allclose(poses[0][:3, 3], [0, 0, 0.333], atol=1e-12)
    # at q=0 the arm is fully upright: link4 x-offset 0.0825
    np.testing.assert_allclose(poses[3][:3, 3], [0.0825, 0.0, 0.333 + 0.316], atol=1e-9)
    # rotations stay orthonormal for random q
    rng = np.random.default_rng(3)
    qr = jnp.asarray(rng.uniform(-1, 1, (5, 7)))
    p = np.asarray(chain.fk(qr))  # [5, L, 4, 4]
    rtr = np.einsum("blij,blik->bljk", p[..., :3, :3], p[..., :3, :3])
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-10)
    np.testing.assert_allclose(p[..., 3, :], np.broadcast_to([0, 0, 0, 1], p[..., 3, :].shape), atol=1e-12)


def test_fk_batching_and_jit():
    chain = franka_panda()
    q = jnp.zeros((4, 6, 7))
    poses = jax.jit(chain.fk)(q)
    assert poses.shape == (4, 6, 9, 4, 4)


def test_fk_is_differentiable():
    chain = franka_panda(dtype=jnp.float64)

    def ee_z(q):
        return chain.ee_pose(q)[2, 3]

    g = jax.grad(ee_z)(jnp.zeros(7, dtype=jnp.float64))
    assert g.shape == (7,)
    # finite-difference check
    eps = 1e-6
    for i in range(7):
        qp = jnp.zeros(7, dtype=jnp.float64).at[i].set(eps)
        qm = jnp.zeros(7, dtype=jnp.float64).at[i].set(-eps)
        fd = (ee_z(qp) - ee_z(qm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), atol=1e-6)


def test_urdf_parser_on_reference_asset():
    """Optional: when the reference checkout is present, parsing its Panda
    URDF must reproduce the embedded model's FK."""
    import os

    path = "/root/reference/assets/franka_description/robots/panda_no_gripper.urdf"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    model = parse_urdf(path)
    assert model.n_dofs == 7
    from stoch_gpmp_tpu.kinematics.chain import KinematicChain

    parsed = KinematicChain(model, dtype=jnp.float64)
    builtin = franka_panda(dtype=jnp.float64)
    # EVERY link frame shared by both models, over several random q — a wrong
    # embedded mid-chain offset cannot hide behind a correct EE frame
    common = [n for n in builtin.link_names if n in parsed.link_names]
    assert len(common) >= 8  # links 1-7 + ee at minimum
    for seed in range(3):
        q = jnp.asarray(np.random.default_rng(seed).uniform(-1, 1, 7))
        fk_p = np.asarray(parsed.fk(q))
        fk_b = np.asarray(builtin.fk(q))
        for name in common:
            np.testing.assert_allclose(
                fk_p[parsed.link_names.index(name)],
                fk_b[builtin.link_names.index(name)],
                atol=1e-9,
                err_msg=name,
            )


def test_urdf_parser_gripper_asset_all_links():
    """Parse the GRIPPER panda.urdf and compare every common link frame
    against the embedded PANDA_WITH_GRIPPER model (9 DOF incl. prismatic
    fingers)."""
    import os

    path = "/root/reference/assets/franka_description/robots/panda.urdf"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    model = parse_urdf(path)
    assert model.n_dofs == 9
    from stoch_gpmp_tpu.kinematics.chain import KinematicChain

    parsed = KinematicChain(model, dtype=jnp.float64)
    builtin = franka_panda(dtype=jnp.float64, gripper=True)
    common = [n for n in builtin.link_names if n in parsed.link_names]
    assert "panda_leftfinger" in common and "panda_grasptarget" in common
    for seed in range(3):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(
            np.concatenate([rng.uniform(-1, 1, 7), rng.uniform(0, 0.04, 2)])
        )
        fk_p = np.asarray(parsed.fk(q))
        fk_b = np.asarray(builtin.fk(q))
        for name in common:
            # atol: the asset's rpy strings truncate pi/2 at ~5e-12 rad
            np.testing.assert_allclose(
                fk_p[parsed.link_names.index(name)],
                fk_b[builtin.link_names.index(name)],
                atol=1e-9,
                err_msg=name,
            )


def test_ik_converges_to_reachable_pose():
    chain = franka_panda(dtype=jnp.float64)
    rng = np.random.default_rng(5)
    q_true = jnp.asarray(
        rng.uniform(
            np.asarray(chain.limits_lower) * 0.5, np.asarray(chain.limits_upper) * 0.5
        )
    )
    target = chain.ee_pose(q_true)
    q0 = jnp.asarray([0.0, -0.5, 0.0, -2.0, 0.0, 2.0, 0.0], dtype=jnp.float64)
    from stoch_gpmp_tpu.kinematics.ik import solve_ik_multistart

    q = solve_ik_multistart(
        chain, target, jax.random.PRNGKey(0), num_starts=16, q_init=q0,
        num_iters=200, damping=1e-3,
    )
    err = pose_error(chain.ee_pose(q), target)
    assert float(jnp.linalg.norm(err[:3])) < 1e-3  # position
    assert float(jnp.linalg.norm(err[3:])) < 1e-2  # rotation
    # joint limits respected
    assert bool(jnp.all(q >= chain.limits_lower)) and bool(jnp.all(q <= chain.limits_upper))


def test_quaternion_180_degree_branches():
    """All four branch cases of matrix_to_quaternion (trace-dominant and each
    diagonal-dominant case, incl. 180-degree rotations where trace = -1)."""
    cases = [
        np.eye(3),
        Rotation.from_euler("x", np.pi).as_matrix(),
        Rotation.from_euler("y", np.pi).as_matrix(),
        Rotation.from_euler("z", np.pi).as_matrix(),
        Rotation.from_rotvec(np.pi * np.array([1, 1, 0]) / np.sqrt(2)).as_matrix(),
    ]
    for m in cases:
        q = np.asarray(matrix_to_quaternion(jnp.asarray(m)))
        back = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(back, m, atol=1e-5)


def test_quaternion_batched():
    rng = np.random.default_rng(9)
    ms = Rotation.random(16, random_state=rng).as_matrix()
    qs = np.asarray(matrix_to_quaternion(jnp.asarray(ms)))
    backs = np.asarray(quaternion_to_matrix(jnp.asarray(qs)))
    np.testing.assert_allclose(backs, ms, atol=1e-6)


def test_rotation_angle_gradient_finite_at_zero():
    import jax

    g = jax.grad(lambda t: float(0) + se3_distance(
        homogeneous(z_rot(t), jnp.zeros(3, dtype=jnp.float64)),
        homogeneous(z_rot(jnp.asarray(0.0, dtype=jnp.float64)), jnp.zeros(3, dtype=jnp.float64)),
    ))(jnp.asarray(0.0, dtype=jnp.float64))
    assert np.isfinite(float(g))


def test_fk_compact_matches_full():
    from stoch_gpmp_tpu.kinematics.chain import LinkState

    chain = franka_panda(dtype=jnp.float64)
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, (4, 7)))
    full = np.asarray(chain.fk(q))  # [4, L, 4, 4]
    compact = chain.fk_compact(q)
    assert isinstance(compact, LinkState)
    np.testing.assert_allclose(np.asarray(compact.positions), full[..., :3, 3], atol=1e-12)
    np.testing.assert_allclose(np.asarray(compact.ee_rot), full[:, -1, :3, :3], atol=1e-12)
    np.testing.assert_allclose(np.asarray(compact.ee_pose()), full[:, -1], atol=1e-12)


def test_fields_accept_linkstate():
    from stoch_gpmp_tpu.costs import (
        EESE3DistanceField,
        LinkDistanceField,
        LinkSelfDistanceField,
    )

    chain = franka_panda(dtype=jnp.float64)
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, (6, 7)))
    full = chain.fk(q)
    compact = chain.fk_compact(q)
    spheres = jnp.asarray(rng.uniform(0.2, 0.8, (1, 3, 4)))

    f1 = LinkDistanceField()
    np.testing.assert_allclose(
        np.asarray(f1.compute_cost(full, obstacle_spheres=spheres)),
        np.asarray(f1.compute_cost(compact, obstacle_spheres=spheres)),
        rtol=1e-12,
    )
    f2 = LinkSelfDistanceField(margin=0.05)
    np.testing.assert_allclose(
        np.asarray(f2.compute_cost(full)), np.asarray(f2.compute_cost(compact)), rtol=1e-12
    )
    target = full[0, -1]
    f3 = EESE3DistanceField(target_h=target)
    np.testing.assert_allclose(
        np.asarray(f3.compute_cost(full)), np.asarray(f3.compute_cost(compact)), rtol=1e-10
    )


def test_urdf_parser_every_reference_variant():
    """Every URDF the reference ships parses, builds a chain, and runs FK
    to finite poses (the two Panda variants above are FK-parity-checked;
    this sweeps the remaining arm/hand/grasped-object variants and the
    simple sphere for structural robustness of the parser)."""
    import glob
    import os

    from stoch_gpmp_tpu.kinematics.chain import KinematicChain

    paths = sorted(
        glob.glob("/root/reference/assets/franka_description/robots/*.urdf")
    ) + ["/root/reference/assets/sphere_simple.urdf"]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        pytest.skip("reference assets unavailable")
    for path in paths:
        model = parse_urdf(path)
        assert model.n_dofs >= 0, path
        assert model.root_link, path
        if not model.joints:  # jointless single body (sphere_simple.urdf)
            assert model.root_link == model.links[0]
            continue
        chain = KinematicChain(model, dtype=jnp.float64)
        q = jnp.zeros(model.n_dofs, dtype=jnp.float64)
        fk = np.asarray(chain.fk(q))
        assert np.isfinite(fk).all(), path
        assert fk.shape[-2:] == (4, 4), path
