"""Built-in Franka Panda kinematic model.

Joint data (origins, axes, limits) from the public Franka Emika Panda
specification (the ``franka_description`` URDF, no-gripper arm variant — the
same robot the reference's Panda workload uses via the external
``torch_robotics.DifferentiableFrankaPanda``, ``examples/panda_environment.py:
47-49``). Embedding the parameters removes both the external FK library and
any runtime URDF file dependency; ``parse_urdf`` can still load arbitrary
robots from file.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from stoch_gpmp_tpu.kinematics.chain import KinematicChain
from stoch_gpmp_tpu.kinematics.urdf import JointSpec, RobotModel

_HALF_PI = math.pi / 2.0

PANDA_NO_GRIPPER = RobotModel(
    name="panda_no_gripper",
    joints=(
        JointSpec("panda_fixed", "fixed", "base_link", "panda_link0"),
        JointSpec(
            "panda_joint1", "revolute", "panda_link0", "panda_link1",
            origin_xyz=(0.0, 0.0, 0.333), axis=(0.0, 0.0, 1.0),
            limit_lower=-2.8973, limit_upper=2.8973, limit_velocity=2.1750,
        ),
        JointSpec(
            "panda_joint2", "revolute", "panda_link1", "panda_link2",
            origin_rpy=(-_HALF_PI, 0.0, 0.0), axis=(0.0, 0.0, 1.0),
            limit_lower=-1.7628, limit_upper=1.7628, limit_velocity=2.1750,
        ),
        JointSpec(
            "panda_joint3", "revolute", "panda_link2", "panda_link3",
            origin_xyz=(0.0, -0.316, 0.0), origin_rpy=(_HALF_PI, 0.0, 0.0),
            axis=(0.0, 0.0, 1.0),
            limit_lower=-2.8973, limit_upper=2.8973, limit_velocity=2.1750,
        ),
        JointSpec(
            "panda_joint4", "revolute", "panda_link3", "panda_link4",
            origin_xyz=(0.0825, 0.0, 0.0), origin_rpy=(_HALF_PI, 0.0, 0.0),
            axis=(0.0, 0.0, 1.0),
            limit_lower=-3.0718, limit_upper=-0.0698, limit_velocity=2.1750,
        ),
        JointSpec(
            "panda_joint5", "revolute", "panda_link4", "panda_link5",
            origin_xyz=(-0.0825, 0.384, 0.0), origin_rpy=(-_HALF_PI, 0.0, 0.0),
            axis=(0.0, 0.0, 1.0),
            limit_lower=-2.8973, limit_upper=2.8973, limit_velocity=2.6100,
        ),
        JointSpec(
            "panda_joint6", "revolute", "panda_link5", "panda_link6",
            origin_rpy=(_HALF_PI, 0.0, 0.0), axis=(0.0, 0.0, 1.0),
            limit_lower=-0.0175, limit_upper=3.7525, limit_velocity=2.6100,
        ),
        JointSpec(
            "panda_joint7", "revolute", "panda_link6", "panda_link7",
            origin_xyz=(0.088, 0.0, 0.0), origin_rpy=(_HALF_PI, 0.0, 0.0),
            axis=(0.0, 0.0, 1.0),
            limit_lower=-2.8973, limit_upper=2.8973, limit_velocity=2.6100,
        ),
        JointSpec(
            "panda_hand_joint", "fixed", "panda_link7", "panda_hand",
            origin_xyz=(0.0, 0.0, 0.107), origin_rpy=(0.0, 0.0, -math.pi / 4),
        ),
        JointSpec(
            "ee_fixed_joint", "fixed", "panda_hand", "ee_link",
            origin_xyz=(0.0, 0.0, 0.1), origin_rpy=(0.0, 0.0, -1.57),
        ),
    ),
)

# The movable-link frames the FK exposes by default (EE last, matching the
# reference convention that the last link is the end-effector,
# fields.py:143-144).
PANDA_FK_LINKS = [
    "panda_link1",
    "panda_link2",
    "panda_link3",
    "panda_link4",
    "panda_link5",
    "panda_link6",
    "panda_link7",
    "panda_hand",
    "ee_link",
]


def franka_panda(dtype=jnp.float32, link_names=None) -> KinematicChain:
    """Batched differentiable FK chain for the 7-DOF Panda arm."""
    return KinematicChain(
        PANDA_NO_GRIPPER,
        link_names=link_names if link_names is not None else PANDA_FK_LINKS,
        dtype=dtype,
    )


class DifferentiableFrankaPanda:
    """API-parity convenience wrapper mirroring the external class the
    reference imports (``examples/panda_environment.py:13,47-49``)."""

    def __init__(self, gripper: bool = False, dtype=jnp.float32):
        if gripper:
            raise NotImplementedError("gripper variant not modeled")
        self.chain = franka_panda(dtype=dtype)
        self._n_dofs = self.chain.n_dofs

    def compute_forward_kinematics_all_links(self, q: jnp.ndarray) -> jnp.ndarray:
        return self.chain.fk(q)

    def get_link_names(self):
        return list(self.chain.link_names)

    def print_link_names(self):
        print(self.get_link_names())
