"""Rigid-body dynamics over a URDF-derived tree: batched RNEA, mass matrix,
forward dynamics.

Provides the native counterpart of the reference's
``Panda.solveInverseDynamics`` (``/root/reference/stoch_gpmp/envs/objects.py:
346-348``, a pass-through to PyBullet's ``calculateInverseDynamics``) and the
dynamics that make ``setTargetTorques`` (``objects.py:306-313``) meaningful
without a physics engine.

Algorithm: the classic recursive Newton-Euler algorithm (two passes over the
joint tree, link-frame 3-vector recursions), batched over arbitrary leading
axes. Revolute/continuous, prismatic, and fixed joints are supported; gravity
enters through the standard base-acceleration trick (``a_base = -g``).

This is NOT planner-hot-loop code: it runs host-side or per-env-step (tens of
3-vector ops for a 7-DOF arm), so the implementation favors clarity and f64
testability over MXU shaping. The planner's FK fast path stays in
``kinematics/chain.py``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from stoch_gpmp_tpu.kinematics.chain import _origin_np, _topo_sort
from stoch_gpmp_tpu.kinematics.urdf import RobotModel


def _rpy_matrix(rpy) -> np.ndarray:
    return _origin_np(rpy, (0.0, 0.0, 0.0))[:3, :3]


class ChainDynamics:
    """Batched inverse/forward dynamics for a fixed-topology joint tree.

    Per-link inertial parameters (mass, COM in the link frame, rotational
    inertia about the COM in the link frame) are resolved at construction from
    ``model.inertials``; links without an ``<inertial>`` block are massless.
    """

    def __init__(self, model: RobotModel, dtype=jnp.float64):
        self.model = model
        self.dtype = dtype
        self._joints = _topo_sort(model)
        self.n_dofs = model.n_dofs
        names = [j.child_link for j in self._joints]

        # Parent joint index per joint (-1 = attached to the root link).
        self._parent = []
        for j in self._joints:
            self._parent.append(
                names.index(j.parent_link) if j.parent_link in names else -1
            )
        self._types = [j.joint_type for j in self._joints]
        self._dof_index = []
        dof = 0
        for j in self._joints:
            if j.actuated:
                self._dof_index.append(dof)
                dof += 1
            else:
                self._dof_index.append(-1)

        # Static frame data (float64 numpy, cast at trace time).
        self._origin_r = np.stack(
            [_origin_np(j.origin_rpy, (0, 0, 0))[:3, :3] for j in self._joints]
        )
        self._origin_p = np.stack(
            [np.asarray(j.origin_xyz, dtype=np.float64) for j in self._joints]
        )
        self._axes = np.stack(
            [np.asarray(j.axis, dtype=np.float64) for j in self._joints]
        )

        # Per-link inertials in the LINK frame: mass, COM, inertia about COM.
        mass, com, inertia = [], [], []
        for j in self._joints:
            spec = model.inertial_for(j.child_link)
            if spec is None:
                mass.append(0.0)
                com.append(np.zeros(3))
                inertia.append(np.zeros((3, 3)))
            else:
                i_local = np.array(
                    [
                        [spec.ixx, spec.ixy, spec.ixz],
                        [spec.ixy, spec.iyy, spec.iyz],
                        [spec.ixz, spec.iyz, spec.izz],
                    ]
                )
                r = _rpy_matrix(spec.com_rpy)
                mass.append(spec.mass)
                com.append(np.asarray(spec.com_xyz, dtype=np.float64))
                inertia.append(r @ i_local @ r.T)
        self._mass = np.asarray(mass)
        self._com = np.stack(com)
        self._inertia = np.stack(inertia)
        self.total_mass = float(self._mass.sum())

    # ------------------------------------------------------------------ #
    def _joint_frames(self, q: jnp.ndarray):
        """Per joint: rotation ``R [..., 3, 3]`` of the child frame in the
        parent frame and child-origin position ``p [..., 3]`` in the parent
        frame (prismatic displacement included)."""
        frames = []
        for k, jtype in enumerate(self._types):
            r0 = jnp.asarray(self._origin_r[k], dtype=self.dtype)
            p0 = jnp.asarray(self._origin_p[k], dtype=self.dtype)
            a = jnp.asarray(self._axes[k], dtype=self.dtype)
            if jtype in ("revolute", "continuous"):
                qk = q[..., self._dof_index[k]]
                c, s = jnp.cos(qk), jnp.sin(qk)
                kx, ky, kz = a[0], a[1], a[2]
                zero = jnp.zeros_like(qk)
                kmat = jnp.stack(
                    [
                        jnp.stack([zero, -kz * jnp.ones_like(qk), ky * jnp.ones_like(qk)], -1),
                        jnp.stack([kz * jnp.ones_like(qk), zero, -kx * jnp.ones_like(qk)], -1),
                        jnp.stack([-ky * jnp.ones_like(qk), kx * jnp.ones_like(qk), zero], -1),
                    ],
                    -2,
                )
                eye = jnp.eye(3, dtype=self.dtype)
                rj = (
                    eye
                    + s[..., None, None] * kmat
                    + (1.0 - c)[..., None, None] * (kmat @ kmat)
                )
                r = r0 @ rj
                p = jnp.broadcast_to(p0, qk.shape + (3,))
            elif jtype == "prismatic":
                qk = q[..., self._dof_index[k]]
                r = jnp.broadcast_to(r0, qk.shape + (3, 3))
                p = p0 + qk[..., None] * (r0 @ a)
            else:  # fixed
                batch = q.shape[:-1]
                r = jnp.broadcast_to(r0, batch + (3, 3))
                p = jnp.broadcast_to(p0, batch + (3,))
            frames.append((r, p))
        return frames

    def rnea(
        self,
        q: jnp.ndarray,
        qd: jnp.ndarray,
        qdd: jnp.ndarray,
        gravity=(0.0, 0.0, -9.81),
    ) -> jnp.ndarray:
        """Inverse dynamics: joint torques/forces ``tau [..., n_dofs]`` such
        that ``M(q) qdd + C(q, qd) qd + g(q) = tau``. Batched over leading
        axes of ``q/qd/qdd``."""
        q = jnp.asarray(q, dtype=self.dtype)
        qd = jnp.asarray(qd, dtype=self.dtype)
        qdd = jnp.asarray(qdd, dtype=self.dtype)
        batch = q.shape[:-1]
        frames = self._joint_frames(q)

        def rot_t(r, v):  # R^T v
            return jnp.einsum("...ji,...j->...i", r, v)

        cross = jnp.cross

        zero3 = jnp.zeros(batch + (3,), dtype=self.dtype)
        base_acc = jnp.broadcast_to(
            -jnp.asarray(gravity, dtype=self.dtype), batch + (3,)
        )

        omega, domega, acc = [], [], []
        for k, jtype in enumerate(self._types):
            p_idx = self._parent[k]
            w_p = omega[p_idx] if p_idx >= 0 else zero3
            dw_p = domega[p_idx] if p_idx >= 0 else zero3
            a_p = acc[p_idx] if p_idx >= 0 else base_acc
            r, p = frames[k]
            a_hat = jnp.asarray(self._axes[k], dtype=self.dtype)

            w_in = rot_t(r, w_p)
            dw_in = rot_t(r, dw_p)
            a_in = rot_t(r, a_p + cross(dw_p, p) + cross(w_p, cross(w_p, p)))

            if jtype in ("revolute", "continuous"):
                qdk = qd[..., self._dof_index[k], None]
                qddk = qdd[..., self._dof_index[k], None]
                w = w_in + a_hat * qdk
                dw = dw_in + cross(w_in, a_hat * qdk) + a_hat * qddk
                a = a_in
            elif jtype == "prismatic":
                qdk = qd[..., self._dof_index[k], None]
                qddk = qdd[..., self._dof_index[k], None]
                w = w_in
                dw = dw_in
                a = a_in + 2.0 * cross(w_in, a_hat * qdk) + a_hat * qddk
            else:
                w, dw, a = w_in, dw_in, a_in
            omega.append(w)
            domega.append(dw)
            acc.append(a)

        # Per-link net force/moment at the COM, in the link frame.
        force, moment = [], []
        for k in range(len(self._joints)):
            m = float(self._mass[k])
            c = jnp.asarray(self._com[k], dtype=self.dtype)
            inertia = jnp.asarray(self._inertia[k], dtype=self.dtype)
            a_c = acc[k] + cross(domega[k], c) + cross(omega[k], cross(omega[k], c))
            f = m * a_c
            iw = jnp.einsum("ij,...j->...i", inertia, omega[k])
            n = jnp.einsum("ij,...j->...i", inertia, domega[k]) + cross(omega[k], iw)
            force.append(f)
            moment.append(n)

        # Backward pass: f_k/n_k = wrench exerted on link k by its parent, at
        # the link-k origin, in the link-k frame.
        f_acc = list(force)
        n_acc = [
            moment[k] + cross(jnp.asarray(self._com[k], dtype=self.dtype), force[k])
            for k in range(len(self._joints))
        ]
        tau = [None] * self.n_dofs
        # Reversed topological order: every child folds into its parent after
        # all of its own children have folded into it.
        for k in reversed(range(len(self._joints))):
            r, p = frames[k]
            p_idx = self._parent[k]
            if p_idx >= 0:
                rf = jnp.einsum("...ij,...j->...i", r, f_acc[k])
                f_acc[p_idx] = f_acc[p_idx] + rf
                n_acc[p_idx] = n_acc[p_idx] + jnp.einsum(
                    "...ij,...j->...i", r, n_acc[k]
                ) + cross(p, rf)
            d = self._dof_index[k]
            if d >= 0:
                a_hat = jnp.asarray(self._axes[k], dtype=self.dtype)
                src = f_acc[k] if self._types[k] == "prismatic" else n_acc[k]
                tau[d] = jnp.sum(src * a_hat, axis=-1)
        return jnp.stack(tau, axis=-1)

    # ------------------------------------------------------------------ #
    def gravity_torques(self, q: jnp.ndarray, gravity=(0.0, 0.0, -9.81)):
        """g(q): torques that statically hold the configuration."""
        z = jnp.zeros_like(jnp.asarray(q, dtype=self.dtype))
        return self.rnea(q, z, z, gravity=gravity)

    def mass_matrix(self, q: jnp.ndarray) -> jnp.ndarray:
        """M(q) [..., n, n] via unit-acceleration RNEA columns (no gravity)."""
        q = jnp.asarray(q, dtype=self.dtype)
        z = jnp.zeros_like(q)
        eye = jnp.eye(self.n_dofs, dtype=self.dtype)

        def col(e):
            return self.rnea(q, z, jnp.broadcast_to(e, q.shape), gravity=(0, 0, 0))

        return jnp.stack([col(eye[i]) for i in range(self.n_dofs)], axis=-1)

    def bias_forces(self, q, qd, gravity=(0.0, 0.0, -9.81)):
        """h(q, qd) = C(q, qd) qd + g(q)."""
        z = jnp.zeros_like(jnp.asarray(q, dtype=self.dtype))
        return self.rnea(q, qd, z, gravity=gravity)

    def forward_dynamics(self, q, qd, tau, gravity=(0.0, 0.0, -9.81)):
        """qdd = M(q)^{-1} (tau - h(q, qd)) — the torque-control integrator's
        core (reference ``setTargetTorques`` + bullet stepping)."""
        m = self.mass_matrix(q)
        h = self.bias_forces(q, qd, gravity=gravity)
        rhs = jnp.asarray(tau, dtype=self.dtype) - h
        return jnp.linalg.solve(m, rhs[..., None])[..., 0]

    # ------------------------------------------------------------------ #
    def _world_frames(self, q: jnp.ndarray):
        """World pose of every joint's child-link frame: rotations and
        origins, lists of ``[..., 3, 3]`` / ``[..., 3]``."""
        q = jnp.asarray(q, dtype=self.dtype)
        frames = self._joint_frames(q)
        batch = q.shape[:-1]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=self.dtype), batch + (3, 3))
        world_r: list[jnp.ndarray] = []
        world_p: list[jnp.ndarray] = []
        for k in range(len(self._joints)):
            r, p = frames[k]
            p_idx = self._parent[k]
            pr = world_r[p_idx] if p_idx >= 0 else eye
            pp = world_p[p_idx] if p_idx >= 0 else jnp.zeros(batch + (3,), self.dtype)
            world_r.append(pr @ r)
            world_p.append(pp + jnp.einsum("...ij,...j->...i", pr, p))
        return world_r, world_p

    def link_world_rotations(self, q: jnp.ndarray) -> jnp.ndarray:
        """``[..., L, 3, 3]`` world rotation per joint's child link."""
        world_r, _ = self._world_frames(q)
        return jnp.stack(world_r, axis=-3)

    def com_positions(self, q: jnp.ndarray) -> jnp.ndarray:
        """World-frame COM position of every joint's child link
        ``[..., L, 3]`` (used by the energy/Lagrangian oracles)."""
        world_r, world_p = self._world_frames(q)
        out = []
        for k in range(len(self._joints)):
            c = jnp.asarray(self._com[k], dtype=self.dtype)
            out.append(world_p[k] + jnp.einsum("...ij,j->...i", world_r[k], c))
        return jnp.stack(out, axis=-2)

    def kinetic_energy(self, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
        """T = 1/2 qd^T M(q) qd."""
        m = self.mass_matrix(q)
        qd = jnp.asarray(qd, dtype=self.dtype)
        return 0.5 * jnp.einsum("...i,...ij,...j->...", qd, m, qd)

    def potential_energy(self, q: jnp.ndarray, gravity=(0.0, 0.0, -9.81)):
        """V = -sum_i m_i g . r_com_i."""
        coms = self.com_positions(q)
        g = jnp.asarray(gravity, dtype=self.dtype)
        masses = jnp.asarray(self._mass, dtype=self.dtype)
        return -jnp.einsum("l,...lc,c->...", masses, coms, g)
