"""Minimal URDF parser producing a kinematic-chain specification.

Replaces the reference's external ``torch_robotics`` kinematic-tree dependency
(SURVEY.md §2.2): the Panda workload needs URDF -> batched differentiable FK.
Parsed subset: joints (type/origin/axis/limits incl. effort), the link graph,
and per-link ``<inertial>`` blocks (mass / COM origin / inertia tensor) —
the inputs to inverse dynamics (``kinematics/dynamics.py``). Visual/collision
geometry is ignored.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field


@dataclass(frozen=True)
class JointSpec:
    name: str
    joint_type: str  # 'revolute' | 'continuous' | 'prismatic' | 'fixed'
    parent_link: str
    child_link: str
    origin_xyz: tuple[float, float, float] = (0.0, 0.0, 0.0)
    origin_rpy: tuple[float, float, float] = (0.0, 0.0, 0.0)
    axis: tuple[float, float, float] = (0.0, 0.0, 1.0)
    limit_lower: float | None = None
    limit_upper: float | None = None
    limit_velocity: float | None = None
    limit_effort: float | None = None

    @property
    def actuated(self) -> bool:
        return self.joint_type in ("revolute", "continuous", "prismatic")


@dataclass(frozen=True)
class InertialSpec:
    """Per-link ``<inertial>``: mass, COM pose in the link frame, and the
    symmetric inertia tensor about the COM expressed in the inertial frame."""

    link: str
    mass: float
    com_xyz: tuple[float, float, float] = (0.0, 0.0, 0.0)
    com_rpy: tuple[float, float, float] = (0.0, 0.0, 0.0)
    ixx: float = 0.0
    ixy: float = 0.0
    ixz: float = 0.0
    iyy: float = 0.0
    iyz: float = 0.0
    izz: float = 0.0


@dataclass(frozen=True)
class RobotModel:
    name: str
    joints: tuple[JointSpec, ...]
    links: tuple[str, ...] = field(default_factory=tuple)
    inertials: tuple[InertialSpec, ...] = field(default_factory=tuple)

    def inertial_for(self, link: str) -> InertialSpec | None:
        for it in self.inertials:
            if it.link == link:
                return it
        return None

    @property
    def root_link(self) -> str:
        if not self.joints:
            # jointless single-body URDF (e.g. the reference's
            # assets/sphere_simple.urdf): the lone link is the root
            if not self.links:
                raise ValueError("URDF has no joints and no links")
            return self.links[0]
        children = {j.child_link for j in self.joints}
        roots = [j.parent_link for j in self.joints if j.parent_link not in children]
        if not roots:
            raise ValueError("no root link found (cycle in joint graph?)")
        return roots[0]

    @property
    def n_dofs(self) -> int:
        return sum(1 for j in self.joints if j.actuated)


def _floats(s: str | None, default):
    if s is None:
        return default
    return tuple(float(x) for x in s.split())


def parse_urdf(source: str) -> RobotModel:
    """Parse a URDF file path or XML string into a RobotModel."""
    if source.lstrip().startswith("<"):
        root = ET.fromstring(source)
    else:
        root = ET.parse(source).getroot()
    if root.tag != "robot":
        raise ValueError(f"not a URDF document (root tag {root.tag!r})")

    joints = []
    for j in root.findall("joint"):
        origin = j.find("origin")
        axis = j.find("axis")
        limit = j.find("limit")
        joints.append(
            JointSpec(
                name=j.get("name"),
                joint_type=j.get("type"),
                parent_link=j.find("parent").get("link"),
                child_link=j.find("child").get("link"),
                origin_xyz=_floats(
                    origin.get("xyz") if origin is not None else None, (0.0, 0.0, 0.0)
                ),
                origin_rpy=_floats(
                    origin.get("rpy") if origin is not None else None, (0.0, 0.0, 0.0)
                ),
                axis=_floats(
                    axis.get("xyz") if axis is not None else None, (0.0, 0.0, 1.0)
                ),
                limit_lower=(
                    float(limit.get("lower")) if limit is not None and limit.get("lower") else None
                ),
                limit_upper=(
                    float(limit.get("upper")) if limit is not None and limit.get("upper") else None
                ),
                limit_velocity=(
                    float(limit.get("velocity"))
                    if limit is not None and limit.get("velocity")
                    else None
                ),
                limit_effort=(
                    float(limit.get("effort"))
                    if limit is not None and limit.get("effort")
                    else None
                ),
            )
        )
    links = tuple(l.get("name") for l in root.findall("link"))
    inertials = []
    for l in root.findall("link"):
        inode = l.find("inertial")
        if inode is None:
            continue
        origin = inode.find("origin")
        mass = inode.find("mass")
        inertia = inode.find("inertia")

        def _i(attr):
            if inertia is None or inertia.get(attr) is None:
                return 0.0
            return float(inertia.get(attr))

        inertials.append(
            InertialSpec(
                link=l.get("name"),
                mass=float(mass.get("value")) if mass is not None else 0.0,
                com_xyz=_floats(
                    origin.get("xyz") if origin is not None else None,
                    (0.0, 0.0, 0.0),
                ),
                com_rpy=_floats(
                    origin.get("rpy") if origin is not None else None,
                    (0.0, 0.0, 0.0),
                ),
                ixx=_i("ixx"), ixy=_i("ixy"), ixz=_i("ixz"),
                iyy=_i("iyy"), iyz=_i("iyz"), izz=_i("izz"),
            )
        )
    return RobotModel(
        name=root.get("name", "robot"),
        joints=tuple(joints),
        links=links,
        inertials=tuple(inertials),
    )
