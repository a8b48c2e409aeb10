"""SE(3) / SO(3) utilities: rotations, quaternions, frames, pose distance.

This module provides natively what the reference delegates to the external
``torch_robotics`` package (the dependency surface catalogued in SURVEY.md
§2.2): ``SE3_distance`` (used by ``stoch_gpmp/costs/fields.py:4,143-144``),
``x_rot/y_rot/z_rot`` and ``Frame`` (used by
``examples/panda_environment.py:14-19,41-44``).

All functions are pure, batched over leading axes, and differentiable (the
rotation distance uses a clamped ``arccos`` so ``jax.grad`` stays finite at
coincident rotations — needed by the Gauss-Newton planner's field Jacobians).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


def x_rot(theta: jnp.ndarray) -> jnp.ndarray:
    """Rotation about x by ``theta`` (batched): ``[..., 3, 3]``."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def y_rot(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def z_rot(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rpy_to_matrix(rpy: jnp.ndarray) -> jnp.ndarray:
    """URDF fixed-axis roll-pitch-yaw to rotation matrix: ``R = Rz Ry Rx``."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    return z_rot(y) @ y_rot(p) @ x_rot(r)


def axis_angle_to_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula; ``axis``: unit ``[..., 3]``, ``angle``: ``[...]``."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    z = jnp.zeros_like(kx)
    k = jnp.stack(
        [
            jnp.stack([z, -kz, ky], axis=-1),
            jnp.stack([kz, z, -kx], axis=-1),
            jnp.stack([-ky, kx, z], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), k.shape)
    return eye + s * k + (1.0 - c) * (k @ k)


def homogeneous(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Assemble ``[..., 4, 4]`` from ``rot [..., 3, 3]`` and ``trans [..., 3]``."""
    batch = jnp.broadcast_shapes(rot.shape[:-2], trans.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    trans = jnp.broadcast_to(trans, batch + (3,))
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def rotation_angle(r1: jnp.ndarray, r2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Geodesic angle between rotations, ``arccos((tr(R1^T R2) - 1)/2)``,
    clamped away from ±1 so the gradient stays finite."""
    tr = jnp.einsum("...ji,...ji->...", r1, r2)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)


def se3_distance(
    h1: jnp.ndarray, h2: jnp.ndarray, w_pos: float = 1.0, w_rot: float = 1.0
) -> jnp.ndarray:
    """Weighted SE(3) pose distance between homogeneous transforms.

    ``w_pos * ||t1 - t2|| + w_rot * geodesic_angle(R1, R2)``. Replaces the
    external ``torch_robotics.SE3_distance`` used at reference
    ``fields.py:143-144``.
    """
    pos = jnp.linalg.norm(h1[..., :3, -1] - h2[..., :3, -1], axis=-1)
    rot = rotation_angle(h1[..., :3, :3], h2[..., :3, :3])
    return w_pos * pos + w_rot * rot


def matrix_to_quaternion(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix to quaternion ``[x, y, z, w]`` (pybullet order, matching
    the reference example's ``target_quat`` convention at
    ``examples/panda_environment.py:43``). Branch-free, batched."""
    m = rot
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]

    def _case(qw2, x, y, z, w):
        s = jnp.sqrt(jnp.maximum(qw2, 1e-12)) * 2.0
        return jnp.stack([x / s, y / s, z / s, w / s], axis=-1)

    q0 = _case(
        1.0 + tr,
        m[..., 2, 1] - m[..., 1, 2],
        m[..., 0, 2] - m[..., 2, 0],
        m[..., 1, 0] - m[..., 0, 1],
        1.0 + tr,
    )
    q1 = _case(
        1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
        1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
        m[..., 0, 1] + m[..., 1, 0],
        m[..., 0, 2] + m[..., 2, 0],
        m[..., 2, 1] - m[..., 1, 2],
    )
    q2 = _case(
        1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
        m[..., 0, 1] + m[..., 1, 0],
        1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
        m[..., 1, 2] + m[..., 2, 1],
        m[..., 0, 2] - m[..., 2, 0],
    )
    q3 = _case(
        1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        m[..., 0, 2] + m[..., 2, 0],
        m[..., 1, 2] + m[..., 2, 1],
        1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        m[..., 1, 0] - m[..., 0, 1],
    )
    # Pick the numerically best branch.
    diag = jnp.stack(
        [tr, m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1
    )
    idx = jnp.argmax(diag, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4 branches, 4]
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion ``[x, y, z, w]`` to rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


@struct.dataclass
class Frame:
    """A rigid-body frame (rotation + translation).

    API parity with the ``torch_robotics`` ``Frame`` usage in the reference
    Panda example (``examples/panda_environment.py:42-44``).
    """

    rot: jnp.ndarray  # [..., 3, 3]
    trans: jnp.ndarray  # [..., 3]

    def get_transform_matrix(self) -> jnp.ndarray:
        return homogeneous(self.rot, self.trans)

    def get_quaternion(self) -> jnp.ndarray:
        return matrix_to_quaternion(self.rot)
