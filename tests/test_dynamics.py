"""Rigid-body dynamics (RNEA) vs independent float64 oracles.

The oracle is the Euler-Lagrange equation evaluated purely by FK + autodiff:
kinetic energy from COM velocities (``jvp`` of COM positions) and body
angular velocities (``jvp`` of world rotations), potential energy from COM
heights — no Newton-Euler recursion shared with the implementation under
test beyond the per-joint frame transforms (which the FK tests validate
separately). Closes the reference's ``Panda.solveInverseDynamics`` contract
(``/root/reference/stoch_gpmp/envs/objects.py:346-348``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stoch_gpmp_tpu.kinematics.dynamics import ChainDynamics
from stoch_gpmp_tpu.kinematics.panda_model import (
    PANDA_WITH_GRIPPER,
    panda_dynamics,
)

GRAVITY = (0.0, 0.0, -9.81)


def _lagrangian_tau(dyn: ChainDynamics, q, qd, qdd):
    """tau = d/dt(dL/dqd) - dL/dq via autodiff on FK quantities only."""
    masses = jnp.asarray(dyn._mass)
    inertias = jnp.asarray(dyn._inertia)

    def kinetic(q, qd):
        v = jax.jvp(dyn.com_positions, (q,), (qd,))[1]
        t_lin = 0.5 * jnp.einsum("l,lc,lc->", masses, v, v)
        r = dyn.link_world_rotations(q)
        dr = jax.jvp(dyn.link_world_rotations, (q,), (qd,))[1]
        w_hat = jnp.einsum("lij,lkj->lik", dr, r)  # omega_hat in world frame
        w_world = jnp.stack([w_hat[:, 2, 1], w_hat[:, 0, 2], w_hat[:, 1, 0]], -1)
        w_link = jnp.einsum("lji,lj->li", r, w_world)
        t_rot = 0.5 * jnp.einsum("li,lij,lj->", w_link, inertias, w_link)
        return t_lin + t_rot

    def lagrangian(q, qd):
        return kinetic(q, qd) - dyn.potential_energy(q, gravity=GRAVITY)

    p_fn = jax.grad(lagrangian, argnums=1)
    dp = jax.jvp(p_fn, (q, qd), (qd, qdd))[1]
    return dp - jax.grad(lagrangian, argnums=0)(q, qd)


@pytest.mark.parametrize("gripper", [False, True])
def test_rnea_matches_lagrangian_oracle(gripper):
    dyn = panda_dynamics(gripper=gripper)
    n = dyn.n_dofs
    assert n == (9 if gripper else 7)
    rng = np.random.default_rng(1)
    for _ in range(5):
        q = jnp.asarray(rng.uniform(-1.5, 1.5, n))
        qd = jnp.asarray(rng.uniform(-1.0, 1.0, n))
        qdd = jnp.asarray(rng.uniform(-2.0, 2.0, n))
        tau = dyn.rnea(q, qd, qdd, gravity=GRAVITY)
        tau_oracle = _lagrangian_tau(dyn, q, qd, qdd)
        np.testing.assert_allclose(
            np.asarray(tau), np.asarray(tau_oracle), rtol=1e-9, atol=1e-10
        )


def test_power_balance():
    """tau . qd == d/dt (T + V) along any (q, qd, qdd) direction."""
    dyn = panda_dynamics()
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, 7))
    qdd = jnp.asarray(rng.uniform(-2.0, 2.0, 7))

    def energy(q, qd):
        return dyn.kinetic_energy(q, qd) + dyn.potential_energy(q, gravity=GRAVITY)

    de = jax.jvp(energy, (q, qd), (qd, qdd))[1]
    power = jnp.sum(dyn.rnea(q, qd, qdd, gravity=GRAVITY) * qd)
    np.testing.assert_allclose(float(power), float(de), rtol=1e-9)


def test_mass_matrix_symmetric_pd_and_batched():
    dyn = panda_dynamics()
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, (4, 7)))
    m = dyn.mass_matrix(q)
    assert m.shape == (4, 7, 7)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m.mT), atol=1e-12)
    assert np.all(np.linalg.eigvalsh(np.asarray(m)) > 0)


def test_gravity_torques_and_zero_gravity():
    dyn = panda_dynamics()
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
    z = jnp.zeros(7)
    g = dyn.gravity_torques(q)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(dyn.rnea(q, z, z, gravity=GRAVITY)), atol=1e-12
    )
    # no gravity, no motion -> no torque
    np.testing.assert_allclose(
        np.asarray(dyn.rnea(q, z, z, gravity=(0, 0, 0))), 0.0, atol=1e-12
    )


def test_forward_inverse_roundtrip():
    dyn = panda_dynamics()
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, 7))
    qdd = jnp.asarray(rng.uniform(-2.0, 2.0, 7))
    tau = dyn.rnea(q, qd, qdd, gravity=GRAVITY)
    qdd_back = dyn.forward_dynamics(q, qd, tau, gravity=GRAVITY)
    np.testing.assert_allclose(np.asarray(qdd_back), np.asarray(qdd), rtol=1e-8)


def test_parsed_reference_urdf_matches_embedded():
    """ChainDynamics built from the PARSED reference gripper URDF produces
    the same torques as the embedded model (validates <inertial> parsing and
    the embedded inertial constants against the asset they came from)."""
    from stoch_gpmp_tpu.kinematics.urdf import parse_urdf

    path = "/root/reference/assets/franka_description/robots/panda.urdf"
    try:
        model = parse_urdf(path)
    except OSError:
        pytest.skip("reference checkout unavailable")
    assert model.inertial_for("panda_link5").mass == 3.0
    dyn_parsed = ChainDynamics(model)
    dyn_embedded = ChainDynamics(PANDA_WITH_GRIPPER)
    assert dyn_parsed.n_dofs == dyn_embedded.n_dofs == 9
    # the parsed URDF roots at panda_link0 (static base, no parent joint), so
    # its 2.9 kg is absent from the tree total; it contributes zero torque
    assert dyn_parsed.total_mass == pytest.approx(dyn_embedded.total_mass - 2.9)
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, 9))
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, 9))
    qdd = jnp.asarray(rng.uniform(-2.0, 2.0, 9))
    # tolerance: the asset writes rpy="1.57079632679" (truncated pi/2, off by
    # ~5e-12 rad) where the embedded model uses math.pi/2 exactly
    np.testing.assert_allclose(
        np.asarray(dyn_parsed.rnea(q, qd, qdd)),
        np.asarray(dyn_embedded.rnea(q, qd, qdd)),
        atol=1e-9,
    )


def test_panda_solve_inverse_dynamics_api():
    """Reference signature: list(tau) from (pos, vel, acc) — objects.py:346."""
    from stoch_gpmp_tpu.envs.objects import Panda

    panda = Panda()
    tau = panda.solveInverseDynamics(panda.q, np.zeros(7), np.zeros(7))
    assert isinstance(tau, list) and len(tau) == 7
    # torque-mode stepping: gravity-compensation torques hold the arm still
    panda.setTargetTorques(np.asarray(tau))
    q0 = panda.q.copy()
    for _ in range(10):
        panda.step(1.0 / 240.0)
    np.testing.assert_allclose(panda.q, q0, atol=1e-4)
    # un-compensated arm falls
    panda.reset()
    panda.setTargetTorques(np.zeros(7))
    for _ in range(20):
        panda.step(1.0 / 240.0)
    assert np.abs(panda.q - q0).max() > 1e-4


def test_gripper_fk_and_wrapper():
    """gripper=True lifts the round-1 NotImplementedError: 9 DOF, prismatic
    fingers move the finger links along +/-y of the hand frame."""
    from stoch_gpmp_tpu.kinematics.panda_model import DifferentiableFrankaPanda

    panda = DifferentiableFrankaPanda(gripper=True, dtype=jnp.float64)
    assert panda._n_dofs == 9
    q = jnp.concatenate([jnp.asarray(np.zeros(7)), jnp.asarray([0.0, 0.0])])
    poses_closed = panda.compute_forward_kinematics_all_links(q)
    q_open = q.at[7:].set(0.04)
    poses_open = panda.compute_forward_kinematics_all_links(q_open)
    names = panda.get_link_names()
    li, ri = names.index("panda_leftfinger"), names.index("panda_rightfinger")
    # fingers moved apart by 0.04 each along the hand's y axis
    delta_l = poses_open[li, :3, 3] - poses_closed[li, :3, 3]
    delta_r = poses_open[ri, :3, 3] - poses_closed[ri, :3, 3]
    np.testing.assert_allclose(
        float(jnp.linalg.norm(delta_l)), 0.04, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(delta_l), -np.asarray(delta_r), atol=1e-12
    )
    # arm links unaffected by finger joints
    np.testing.assert_allclose(
        np.asarray(poses_open[:7]), np.asarray(poses_closed[:7]), atol=1e-12
    )


def test_gripper_gear_constraint_couples_fingers():
    """The 9-DOF Panda wrapper couples the finger joints like the
    reference's bullet gear constraint (objects.py:249-260: JOINT_GEAR,
    gearRatio=-1, maxForce=50): an asymmetric torque on ONE finger moves
    BOTH fingers together in torque mode, and kinematic tracking holds
    them symmetric under asymmetric targets."""
    import numpy as np

    from stoch_gpmp_tpu.envs.objects import Panda

    panda = Panda(gripper=True, use_dynamics=True)
    assert panda.dof == 9
    np.testing.assert_allclose(panda.q[7:], [0.04, 0.04])

    # torque mode: gravity-compensating torque on the arm, +3 N on finger 1
    # only (closing). Without the gear, finger 2 would not move.
    tau = np.zeros(9)
    h = np.asarray(panda.dynamics.bias_forces(
        jnp.asarray(panda.q), jnp.asarray(panda.dq)))
    tau[:7] = h[:7]
    tau[7] = -3.0
    panda.setTargetTorques(tau)
    for _ in range(120):  # 0.5 s
        panda.step(1.0 / 240.0)
    assert panda.q[7] < 0.035  # finger 1 moved toward closed
    assert abs(panda.q[7] - panda.q[8]) < 5e-3  # finger 2 dragged along

    # kinematic mode: asymmetric finger targets are tracked symmetrically
    kin = Panda(gripper=True)
    target = kin.q.copy()
    target[7], target[8] = 0.0, 0.04
    kin.setTargetPositions(target)
    for _ in range(240):
        kin.step(1.0 / 240.0)
    assert abs(kin.q[7] - kin.q[8]) < 1e-9
