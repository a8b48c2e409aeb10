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

__all__ = [
    "Frame",
    "axis_angle_to_matrix",
    "homogeneous",
    "matrix_to_quaternion",
    "quaternion_to_matrix",
    "rotation_angle",
    "rpy_to_matrix",
    "se3_distance",
    "x_rot",
    "y_rot",
    "z_rot",
]
