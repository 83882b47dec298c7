"""Core numerics: JPL quaternion algebra, SO(3), camera models, chi-square tables.

TPU-native counterpart of ref:include/larvio/math_utils.hpp (SURVEY.md §2
"Math utils"): the same algebra, implemented as pure, dtype-polymorphic JAX
functions that vmap/jit cleanly.
"""

from larvio_tpu.core.quaternion import (  # noqa: F401
    quat_identity,
    quat_inverse,
    quat_multiply,
    quat_normalize,
    quat_to_rotation,
    rotation_to_quat,
    small_angle_quat,
    quat_integrate_rk4,
)
from larvio_tpu.core.so3 import skew, so3_exp, so3_log  # noqa: F401
from larvio_tpu.core.camera import (  # noqa: F401
    distort_equidistant,
    distort_radtan,
    project,
    undistort_normalize,
)
from larvio_tpu.core.chi2 import chi2_inv95  # noqa: F401
