"""Math, camera, SH, and schedule utilities (pure functions, jnp-first)."""

from gsjax.utils.math import (
    inverse_sigmoid,
    quat_to_rotmat,
    build_scaling_rotation,
    build_covariance,
    strip_symmetric,
    unstrip_symmetric,
)
from gsjax.utils.sh import eval_sh, rgb_to_sh, sh_to_rgb, num_sh_coeffs
from gsjax.utils.camera import (
    world_to_view,
    projection_matrix,
    focal_to_fov,
    fov_to_focal,
)
from gsjax.utils.schedules import expon_lr_schedule

__all__ = [
    "inverse_sigmoid",
    "quat_to_rotmat",
    "build_scaling_rotation",
    "build_covariance",
    "strip_symmetric",
    "unstrip_symmetric",
    "eval_sh",
    "rgb_to_sh",
    "sh_to_rgb",
    "num_sh_coeffs",
    "world_to_view",
    "projection_matrix",
    "focal_to_fov",
    "fov_to_focal",
    "expon_lr_schedule",
]
