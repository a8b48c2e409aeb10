from stoch_gpmp_tpu.kinematics.chain import KinematicChain, LinkState
from stoch_gpmp_tpu.kinematics.dynamics import ChainDynamics
from stoch_gpmp_tpu.kinematics.panda_model import (
    DifferentiableFrankaPanda,
    franka_panda,
    panda_dynamics,
)
from stoch_gpmp_tpu.kinematics.se3 import (
    Frame,
    axis_angle_to_matrix,
    homogeneous,
    matrix_to_quaternion,
    quaternion_to_matrix,
    rotation_angle,
    rpy_to_matrix,
    se3_distance,
    x_rot,
    y_rot,
    z_rot,
)
from stoch_gpmp_tpu.kinematics.urdf import (
    InertialSpec,
    JointSpec,
    RobotModel,
    parse_urdf,
)

__all__ = [
    "ChainDynamics",
    "DifferentiableFrankaPanda",
    "Frame",
    "InertialSpec",
    "JointSpec",
    "KinematicChain",
    "LinkState",
    "RobotModel",
    "axis_angle_to_matrix",
    "franka_panda",
    "homogeneous",
    "matrix_to_quaternion",
    "panda_dynamics",
    "parse_urdf",
    "quaternion_to_matrix",
    "rotation_angle",
    "rpy_to_matrix",
    "se3_distance",
    "x_rot",
    "y_rot",
    "z_rot",
]
