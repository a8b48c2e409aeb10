"""Fixed-topology batched differentiable forward kinematics.

Two output formats:
- ``fk(q)``: all-link homogeneous ``[..., L, 4, 4]`` (the reference's
  ``compute_forward_kinematics_all_links`` contract).
- ``fk_compact(q)``: a ``LinkState`` (positions ``[..., L, 3]`` + EE rotation
  ``[..., 3, 3]``) — everything the distance fields consume, at ~25% of the
  memory traffic of the 4x4 tensor. At the Panda-scaling benchmark size the
  full tensor is ~755 MB per iteration; the compact form is the fast path.

The chain topology is resolved at construction (host-side); ``fk`` is a pure
traced function — the per-joint loop unrolls at trace time into a short chain
of small matmuls that XLA fuses. Batched over arbitrary leading axes and
differentiable (used by IK and by the Gauss-Newton planner's field Jacobians).

Replaces the external ``DifferentiableFrankaPanda.compute_forward_kinematics_
all_links`` contract the reference relies on (``examples/panda_environment.py:
47-49,98``; shape contract ``[batch, links, 4, 4]`` from
``cost_functions.py:52``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from stoch_gpmp_tpu.kinematics.se3 import homogeneous
from stoch_gpmp_tpu.kinematics.urdf import RobotModel


@struct.dataclass
class LinkState:
    """Compact FK output: link positions + end-effector rotation (all the
    distance fields need). ``positions [..., L, 3]``, ``ee_rot [..., 3, 3]``."""

    positions: jnp.ndarray
    ee_rot: jnp.ndarray

    @property
    def shape(self):
        return self.positions.shape

    def __getitem__(self, idx):
        return LinkState(positions=self.positions[idx], ee_rot=self.ee_rot[idx])

    def reshape(self, *batch):
        """Reshape leading (batch) axes; keeps link/coordinate axes."""
        l = self.positions.shape[-2]
        return LinkState(
            positions=self.positions.reshape(*batch, l, 3),
            ee_rot=self.ee_rot.reshape(*batch, 3, 3),
        )

    def ee_pose(self) -> jnp.ndarray:
        return homogeneous(self.ee_rot, self.positions[..., -1, :])


def _origin_np(rpy, xyz) -> np.ndarray:
    """URDF joint origin as a float64 homogeneous transform (numpy)."""
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    ry = np.array([[cp, 0, sp], [0, 1.0, 0], [-sp, 0, cp]])
    rx = np.array([[1.0, 0, 0], [0, cr, -sr], [0, sr, cr]])
    t = np.eye(4)
    t[:3, :3] = rz @ ry @ rx
    t[:3, 3] = xyz
    return t


def _topo_sort(model: RobotModel):
    """Joints ordered so every parent link is resolved before its children."""
    by_parent: dict[str, list] = {}
    for j in model.joints:
        by_parent.setdefault(j.parent_link, []).append(j)
    ordered = []
    stack = [model.root_link]
    while stack:
        link = stack.pop(0)
        for j in by_parent.get(link, []):
            ordered.append(j)
            stack.append(j.child_link)
    if len(ordered) != len(model.joints):
        raise ValueError("joint graph is not a connected tree")
    return ordered


class KinematicChain:
    """Batched FK over a URDF-derived kinematic tree.

    ``fk(q)``: ``q [..., n_dofs]`` -> link poses ``[..., L, 4, 4]`` where ``L``
    covers the child links of every joint in topological order (the last
    entry is the end-effector for serial chains, matching the reference's
    "EE = last link" convention, ``fields.py:143-144``).
    """

    def __init__(self, model: RobotModel, link_names: list[str] | None = None,
                 dtype=jnp.float32):
        self.model = model
        self.dtype = dtype
        self._joints = _topo_sort(model)
        self.n_dofs = model.n_dofs

        # Static per-joint data (host-side numpy in float64 regardless of the
        # jax x64 setting; cast to the working dtype at trace time).
        self._origins = np.stack(
            [_origin_np(j.origin_rpy, j.origin_xyz) for j in self._joints]
        )
        self._types = [j.joint_type for j in self._joints]
        self._axes = np.stack([np.asarray(j.axis, dtype=np.float64) for j in self._joints])
        # dof index per joint (-1 for fixed)
        self._dof_index = []
        dof = 0
        for j in self._joints:
            if j.actuated:
                self._dof_index.append(dof)
                dof += 1
            else:
                self._dof_index.append(-1)

        self.all_link_names = [j.child_link for j in self._joints]
        if link_names is None:
            link_names = self.all_link_names
        missing = set(link_names) - set(self.all_link_names)
        if missing:
            raise ValueError(f"unknown links: {missing}")
        self.link_names = list(link_names)
        self._out_idx = [self.all_link_names.index(n) for n in self.link_names]

        lo, hi, vel = [], [], []
        for j in self._joints:
            if j.actuated:
                lo.append(j.limit_lower if j.limit_lower is not None else -np.inf)
                hi.append(j.limit_upper if j.limit_upper is not None else np.inf)
                vel.append(j.limit_velocity if j.limit_velocity is not None else np.inf)
        self.limits_lower = jnp.asarray(lo, dtype=dtype)
        self.limits_upper = jnp.asarray(hi, dtype=dtype)
        self.limits_velocity = jnp.asarray(vel, dtype=dtype)

    def _fk_planes(self, q: jnp.ndarray):
        """Shared SoA FK core: per selected link, rotation/position entry
        grids (python-float constants or traced scalars of `batch` shape).

        TPU-critical implementation: rotations are carried as nine scalar
        "planes" (structure-of-arrays) composed with explicit formulas —
        batched ``[B, 4, 4] @ [B, 4, 4]`` matmuls cannot tile the MXU and
        measured ~830 us/iteration on v5e for the Panda cost stack; the
        elementwise form fuses on the VPU. Entries that are compile-time
        constants (the root frame, fixed joints, and the ±90-degree joint
        origins whose rotation entries are 0/±1) are folded in PYTHON floats
        during trace, which keeps the emitted graph small (~10x fewer ops —
        XLA's CPU backend chokes on the unfolded version). Coefficients below
        1e-12 (float64 representation noise of pi/2 origins, ~6e-17) are
        pruned; this perturbs poses by <1e-15 m.
        """
        batch = q.shape[:-1]
        qs = [q[..., i] for i in range(self.n_dofs)]
        out = self.fk_planes_from_scalars(qs)

        def as_array(x):
            if isinstance(x, float):
                return jnp.full(batch, x, dtype=self.dtype)
            return jnp.broadcast_to(x, batch).astype(self.dtype)

        return out, as_array

    def fk_planes_from_scalars(self, qs):
        """The FK plane-composition core over a LIST of per-dof scalar values
        (python floats or traced arrays of any common shape). Usable both from
        the traced ``fk``/``fk_compact`` paths and from INSIDE a Pallas kernel
        (pass ``[1, lanes]``-shaped refs-loaded planes; all emitted ops are
        elementwise adds/muls/sin/cos). Returns a list of ``(r, p)`` entry
        grids per selected link.
        """

        # --- tiny scalar algebra over (python float | traced array) -------
        def is_const(x):
            return isinstance(x, float)

        def mul(x, y):
            if is_const(x) and abs(x) < 1e-12:
                return 0.0
            if is_const(y) and abs(y) < 1e-12:
                return 0.0
            if is_const(x) and is_const(y):
                return x * y
            if is_const(x):
                x, y = y, x
            # x traced, y const-or-traced
            if is_const(y):
                if y == 1.0:
                    return x
                if y == -1.0:
                    return -x
            return x * y

        def add(*terms):
            const = 0.0
            traced = []
            for t in terms:
                if is_const(t):
                    const += t
                else:
                    traced.append(t)
            if not traced:
                return const
            out = traced[0]
            for t in traced[1:]:
                out = out + t
            if const != 0.0:
                out = out + const
            return out

        def compose(r, m):
            """3x3 product of entry grids (lists of lists of scalars)."""
            return [
                [add(*(mul(r[i][k], m[k][j]) for k in range(3))) for j in range(3)]
                for i in range(3)
            ]

        root_r = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        root_p = [0.0, 0.0, 0.0]
        frames = {self.model.root_link: (root_r, root_p)}
        out = []
        for k, joint in enumerate(self._joints):
            pr, pp = frames[joint.parent_link]
            a = self._origins[k]  # host-side float64 [4, 4]
            a_r = [[float(a[i, j]) for j in range(3)] for i in range(3)]
            r = compose(pr, a_r)
            p = [
                add(pp[i], *(mul(pr[i][m], float(a[m, 3])) for m in range(3)))
                for i in range(3)
            ]
            if joint.joint_type in ("revolute", "continuous"):
                qj = qs[self._dof_index[k]]
                c, s = jnp.cos(qj), jnp.sin(qj)
                kx, ky, kz = (float(v) for v in self._axes[k])
                one_c = 1.0 - c
                # Rodrigues M = I + s K + (1-c) K^2 with constant axis
                kmat = [
                    [
                        add(c, mul(one_c, kx * kx)),
                        add(mul(one_c, kx * ky), mul(s, -kz)),
                        add(mul(one_c, kx * kz), mul(s, ky)),
                    ],
                    [
                        add(mul(one_c, ky * kx), mul(s, kz)),
                        add(c, mul(one_c, ky * ky)),
                        add(mul(one_c, ky * kz), mul(s, -kx)),
                    ],
                    [
                        add(mul(one_c, kz * kx), mul(s, -ky)),
                        add(mul(one_c, kz * ky), mul(s, kx)),
                        add(c, mul(one_c, kz * kz)),
                    ],
                ]
                r = compose(r, kmat)
            elif joint.joint_type == "prismatic":
                qj = qs[self._dof_index[k]]
                p = [
                    add(p[i], mul(qj, add(*(mul(r[i][m], float(self._axes[k][m]))
                                            for m in range(3)))))
                    for i in range(3)
                ]
            elif joint.joint_type != "fixed":
                raise ValueError(f"unsupported joint type {joint.joint_type}")
            frames[joint.child_link] = (r, p)
            out.append((r, p))

        return [out[i] for i in self._out_idx]

    def fk(self, q: jnp.ndarray) -> jnp.ndarray:
        """All selected link poses: ``q [..., n_dofs] -> [..., L, 4, 4]``."""
        q = jnp.asarray(q, dtype=self.dtype)
        planes, as_array = self._fk_planes(q)
        rows = []
        for r, p in planes:
            mat = jnp.stack(
                [
                    jnp.stack(
                        [as_array(r[j][0]), as_array(r[j][1]), as_array(r[j][2]),
                         as_array(p[j])],
                        axis=-1,
                    )
                    for j in range(3)
                ]
                + [
                    jnp.stack(
                        [as_array(0.0), as_array(0.0), as_array(0.0), as_array(1.0)],
                        axis=-1,
                    )
                ],
                axis=-2,
            )
            rows.append(mat)
        return jnp.stack(rows, axis=-3)

    def fk_compact(self, q: jnp.ndarray) -> LinkState:
        """Positions of all selected links + EE rotation as a ``LinkState`` —
        ~4x less output traffic than the homogeneous tensor; the fast path
        for field-based cost stacks."""
        q = jnp.asarray(q, dtype=self.dtype)
        planes, as_array = self._fk_planes(q)
        positions = jnp.stack(
            [
                jnp.stack([as_array(p[0]), as_array(p[1]), as_array(p[2])], axis=-1)
                for _, p in planes
            ],
            axis=-2,
        )
        r_ee, _ = planes[-1]
        ee_rot = jnp.stack(
            [
                jnp.stack(
                    [as_array(r_ee[i][0]), as_array(r_ee[i][1]), as_array(r_ee[i][2])],
                    axis=-1,
                )
                for i in range(3)
            ],
            axis=-2,
        )
        return LinkState(positions=positions, ee_rot=ee_rot)

    def fk_scalar_planes(self, q: jnp.ndarray):
        """Raw structure-of-arrays FK output: per selected link a ``(r, p)``
        pair of entry grids (python-float constants or traced ``batch``-shaped
        scalars) plus the ``as_array`` materializer.

        This is the zero-materialization interface: consumers fold the FK
        formulas directly into downstream math (e.g. distance-field sums,
        ``costs/fused_fields.PlaneFieldsCost``) without ever stacking an
        ``[..., L, 3]`` tensor — whose 3-wide minor dimension tiles terribly
        on TPU (pads to 128 lanes) and dominated the Panda iteration time.
        """
        q = jnp.asarray(q, dtype=self.dtype)
        return self._fk_planes(q)

    def ee_pose(self, q: jnp.ndarray) -> jnp.ndarray:
        """End-effector (last selected link) pose: ``[..., 4, 4]``."""
        return self.fk(q)[..., -1, :, :]

    def __call__(self, q: jnp.ndarray) -> jnp.ndarray:
        return self.fk(q)
