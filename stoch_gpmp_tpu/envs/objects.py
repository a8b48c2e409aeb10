"""Simulation body abstractions (native, no physics-engine dependency).

Capability parity with reference ``stoch_gpmp/envs/objects.py``, whose classes
are thin wrappers around a PyBullet client (``BodyCore``/``Sphere``/``Panda``,
``objects.py:10-368``). Here the bodies are plain kinematic state containers:
the Panda tracks joint-position targets under its velocity limits, poses come
from the built-in differentiable FK, IK uses the native multi-start solver,
and ``solveInverseDynamics`` / ``setTargetTorques`` (bullet pass-throughs in
the reference, ``objects.py:306-313, 346-348``) run on the native batched
RNEA (``kinematics/dynamics.py``) — the whole closed-loop harness runs
without any physics engine.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from stoch_gpmp_tpu.kinematics.ik import solve_ik_multistart
from stoch_gpmp_tpu.kinematics.panda_model import franka_panda
from stoch_gpmp_tpu.kinematics.se3 import homogeneous, matrix_to_quaternion, quaternion_to_matrix


class BodyCore:
    """Pose + velocity state of a rigid body (reference ``objects.py:10-123``)."""

    def __init__(self, base_position, base_orientation=(0.0, 0.0, 0.0, 1.0)):
        self.init_base_position = np.asarray(base_position, dtype=float)
        self.init_base_orientation = np.asarray(base_orientation, dtype=float)
        self.reset()

    def reset(self):
        self.base_position = self.init_base_position.copy()
        self.base_orientation = self.init_base_orientation.copy()


class DynamicBodyCore(BodyCore):
    """Adds linear/angular velocity (reference ``objects.py:126-168``)."""

    def __init__(
        self,
        base_position=(0.0, 0.0, 0.0),
        base_orientation=(0.0, 0.0, 0.0, 1.0),
        base_linear_velocity=(0.0, 0.0, 0.0),
        base_angular_velocity=(0.0, 0.0, 0.0),
    ):
        self.init_base_linear_velocity = np.asarray(base_linear_velocity, dtype=float)
        self.init_base_angular_velocity = np.asarray(base_angular_velocity, dtype=float)
        super().__init__(base_position, base_orientation)

    def reset(self):
        super().reset()
        self.base_linear_velocity = self.init_base_linear_velocity.copy()
        self.base_angular_velocity = self.init_base_angular_velocity.copy()


class Sphere(DynamicBodyCore):
    """Sphere obstacle with radius ``scale`` and a static/dynamic ``role``
    (reference ``objects.py:171-181`` + role handling in ``envs/panda.py``)."""

    def __init__(self, base_position, base_linear_velocity=(0.0, 0.0, 0.0),
                 scale=0.1, role=0):
        self.scale = float(scale)
        self.role = int(role)
        super().__init__(
            base_position=base_position, base_linear_velocity=base_linear_velocity
        )

    def integrate(self, dt: float):
        self.base_position = self.base_position + self.base_linear_velocity * dt


@functools.lru_cache(maxsize=2)
def _shared_panda_dynamics(gripper: bool = False):
    from stoch_gpmp_tpu.kinematics.panda_model import panda_dynamics

    return panda_dynamics(gripper=gripper)


GEAR_MAX_FORCE = 50.0  # reference objects.py:260 changeConstraint maxForce
GEAR_ERP = 0.1  # reference objects.py:260 changeConstraint erp
_FINGER_MASS = 0.1  # kg, reference asset (prismatic => effective inertia)


@functools.lru_cache(maxsize=8)
def _panda_integrators(kp, kd, effort, vel, lo, hi, gripper=False):
    """Jitted computed-torque-PD and torque-mode steppers, cached across
    ``Panda`` instances (tracing the 8 RNEA passes of ``mass_matrix`` is
    expensive; all instances of one gain/limit set share a compilation).

    With ``gripper=True`` (9 DOF) both steppers solve the native analogue
    of the reference's bullet GEAR constraint between the finger joints
    (``objects.py:249-260``: ``JOINT_GEAR``, ``gearRatio=-1``, ``erp=0.1``,
    ``maxForce=50``) the way bullet does — as a velocity-level constraint
    after integration: the relative finger velocity is driven to zero plus
    an ERP positional correction, by an impulse capped at
    ``maxForce * dt``. (A stiff coupling FORCE is unstable against the
    velocity clamp at 240 Hz — measured a sustained ±vel-limit flip-flop
    limit cycle.)"""
    dyn = _shared_panda_dynamics(gripper)
    effort = jnp.asarray(effort)
    vel = jnp.asarray(vel)
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)

    def integrate(q, dq, qdd, dt):
        dq2 = jnp.clip(dq + qdd * dt, -vel, vel)
        if gripper:
            c = q[7] - q[8]  # drive q7 - q8 -> 0 (fingers symmetric)
            cdot = dq2[7] - dq2[8]
            mu = _FINGER_MASS / 2.0  # reduced mass of the two fingers
            j = jnp.clip(
                mu * (-cdot - GEAR_ERP * c / dt),
                -GEAR_MAX_FORCE * dt, GEAR_MAX_FORCE * dt,
            )
            dq2 = dq2.at[7].add(j / _FINGER_MASS)
            dq2 = dq2.at[8].add(-j / _FINGER_MASS)
            dq2 = jnp.clip(dq2, -vel, vel)
        q2 = jnp.clip(q + dq2 * dt, lo, hi)
        return q2, dq2

    @jax.jit
    def tau_step(q, dq, tau, dt):
        m = dyn.mass_matrix(q)
        h = dyn.bias_forces(q, dq)
        qdd = jnp.linalg.solve(m, (tau - h)[..., None])[..., 0]
        return integrate(q, dq, qdd, dt)

    @jax.jit
    def pd_step(q, dq, q_target, dt):
        # computed-torque PD: tau = M(q)(kp e - kd dq) + h(q, dq), clamped
        # to the joint effort limits, then forward dynamics under the clamp
        m = dyn.mass_matrix(q)
        h = dyn.bias_forces(q, dq)
        qdd_des = kp * (q_target - q) - kd * dq
        tau = jnp.clip(m @ qdd_des + h, -effort, effort)
        qdd = jnp.linalg.solve(m, (tau - h)[..., None])[..., 0]
        return integrate(q, dq, qdd, dt)

    return pd_step, tau_step


class Panda:
    """Kinematic Panda arm: joint state, velocity-limited position tracking
    (or computed-torque PD over the native rigid-body dynamics with
    ``use_dynamics=True``), FK-backed EE pose, native IK (reference
    ``objects.py:184-368`` API surface without the bullet client)."""

    HOME = np.asarray([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])
    HOME_FINGERS = np.asarray([0.04, 0.04])  # open (ref objects.py:201)

    def __init__(self, dtype=None, use_dynamics: bool = False,
                 kp: float = 400.0, kd: float | None = None,
                 gripper: bool = False):
        if dtype is None:
            # f64 when enabled (IK/dynamics precision); silent f32 otherwise
            # (jax emits a truncation warning per explicit-f64 asarray)
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        # ``gripper=True``: the 9-DOF variant (two prismatic fingers). The
        # finger joints are coupled by the native analogue of the
        # reference's bullet gear constraint (see ``_panda_integrators``) in
        # dynamics/torque mode, and held symmetric (the infinite-stiffness
        # limit of that gear) in kinematic mode.
        self.gripper = bool(gripper)
        self.chain = franka_panda(dtype=dtype, gripper=gripper)
        self.dof = self.chain.n_dofs
        self.jl_lower = np.asarray(self.chain.limits_lower)
        self.jl_upper = np.asarray(self.chain.limits_upper)
        self.velocity_limit = np.asarray(self.chain.limits_velocity)
        # effort limits from the reference asset (87 Nm joints 1-4, 12 Nm
        # 5-7, 20 N fingers)
        self.effort_limit = np.array([87.0, 87.0, 87.0, 87.0, 12.0, 12.0, 12.0])
        if gripper:
            self.effort_limit = np.concatenate([self.effort_limit, [20.0, 20.0]])
        # Position control through the rigid-body dynamics: a computed-torque
        # PD motor (the native analogue of bullet's POSITION_CONTROL
        # constraint motor the reference drives at objects.py:294-304),
        # critically damped by default.
        self.use_dynamics = bool(use_dynamics)
        self.kp = float(kp)
        self.kd = float(kd) if kd is not None else 2.0 * float(np.sqrt(kp))
        self._dynamics = None  # built on first dynamics call
        self._pd_step = None  # jitted computed-torque stepper
        self._tau_step = None  # jitted torque-mode stepper
        self.reset()

    @property
    def dynamics(self):
        if self._dynamics is None:
            self._dynamics = _shared_panda_dynamics(self.gripper)
        return self._dynamics

    def reset(self, q=None):
        if q is None:
            q = (
                np.concatenate([self.HOME, self.HOME_FINGERS])
                if self.gripper else self.HOME
            )
        self.q = np.asarray(q, dtype=float).copy()
        self.dq = np.zeros(self.dof)
        self.target_joint_positions = self.q.copy()
        self.target_torques = np.zeros(self.dof)
        self.control_mode = "position"

    def setTargetPositions(self, target_joint_positions):
        t = np.asarray(target_joint_positions, dtype=float).reshape(-1)[: self.dof]
        self.target_joint_positions = np.clip(t, self.jl_lower, self.jl_upper)
        self.control_mode = "position"

    def setTargetTorques(self, target_torques):
        """Torque control (reference ``objects.py:306-313`` sets bullet
        TORQUE_CONTROL): subsequent ``step`` calls integrate the native
        forward dynamics under these clamped joint torques."""
        t = np.asarray(target_torques, dtype=float).reshape(-1)[: self.dof]
        self.target_torques = np.clip(t, -self.effort_limit, self.effort_limit)
        self.control_mode = "torque"

    def step(self, dt: float):
        if self.control_mode == "torque":
            return self._step_torque(dt)
        if self.use_dynamics:
            return self._step_position_dynamics(dt)
        # First-order tracking toward the target under velocity limits
        # (kinematic fast path; ``use_dynamics=True`` replaces it with the
        # computed-torque PD motor over the rigid-body forward dynamics).
        err = self.target_joint_positions - self.q
        max_step = self.velocity_limit * dt
        dq = np.clip(err, -max_step, max_step)
        self.q = self.q + dq
        self.dq = dq / dt if dt > 0 else np.zeros_like(dq)
        if self.gripper:
            # infinite-stiffness limit of the finger gear constraint
            m = 0.5 * (self.q[7] + self.q[8])
            self.q[7] = self.q[8] = m

    def _integrators(self):
        """Jitted semi-implicit-Euler steppers (shared across instances)."""
        if self._tau_step is None:
            self._pd_step, self._tau_step = _panda_integrators(
                self.kp, self.kd,
                tuple(self.effort_limit), tuple(self.velocity_limit),
                tuple(self.jl_lower), tuple(self.jl_upper),
                gripper=self.gripper,
            )
        return self._pd_step, self._tau_step

    def _step_position_dynamics(self, dt: float):
        """Computed-torque PD position motor over the forward dynamics."""
        pd_step, _ = self._integrators()
        q, dq = pd_step(
            jnp.asarray(self.q), jnp.asarray(self.dq),
            jnp.asarray(self.target_joint_positions), dt,
        )
        self.q, self.dq = np.asarray(q), np.asarray(dq)

    def _step_torque(self, dt: float):
        """Semi-implicit Euler under the commanded torques:
        ``qdd = M(q)^{-1}(tau - h(q, qd))`` via RNEA."""
        _, tau_step = self._integrators()
        q, dq = tau_step(
            jnp.asarray(self.q), jnp.asarray(self.dq),
            jnp.asarray(self.target_torques), dt,
        )
        self.q, self.dq = np.asarray(q), np.asarray(dq)

    def getJointStates(self):
        return list(self.q), list(self.dq)

    def link_poses(self) -> np.ndarray:
        return np.asarray(self.chain.fk(jnp.asarray(self.q)))

    def getEEPositionAndOrientation(self):
        ee = self.link_poses()[-1]
        pos = ee[:3, 3]
        quat = np.asarray(matrix_to_quaternion(jnp.asarray(ee[:3, :3])))
        return pos, quat

    def solveInverseDynamics(self, pos, vel, acc):
        """Joint torques realizing ``acc`` at state ``(pos, vel)`` under
        gravity — reference signature (``objects.py:346-348`` wraps bullet's
        ``calculateInverseDynamics``); here the native batched RNEA."""
        tau = self.dynamics.rnea(
            jnp.asarray(pos, dtype=jnp.float64)[..., : self.dof],
            jnp.asarray(vel, dtype=jnp.float64)[..., : self.dof],
            jnp.asarray(acc, dtype=jnp.float64)[..., : self.dof],
        )
        return list(np.asarray(tau))

    def solveInverseKinematics(self, pos, ori=None, seed: int = 0):
        """IK to a position (+ optional quaternion ``[x,y,z,w]``); returns the
        joint configuration (reference ``objects.py:349-353`` wraps bullet)."""
        pos = jnp.asarray(pos, dtype=jnp.float64)
        if ori is not None:
            rot = quaternion_to_matrix(jnp.asarray(ori, dtype=jnp.float64))
        else:
            rot = self.chain.ee_pose(jnp.asarray(self.q))[
                :3, :3
            ]  # keep current orientation
        target = homogeneous(rot, pos)
        q = solve_ik_multistart(
            self.chain,
            target,
            jax.random.PRNGKey(seed),
            num_starts=16,
            q_init=jnp.asarray(self.q),
            num_iters=150,
        )
        return list(np.asarray(q))
