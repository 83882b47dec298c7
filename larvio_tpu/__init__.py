"""larvio_tpu — a TPU-native (JAX/XLA/Pallas) monocular visual-inertial odometry framework.

A ground-up rebuild of the capabilities of PetWorm/LARVIO (hybrid-MSCKF VIO):
an IMU-aided feature-tracking front-end and an error-state EKF back-end with
MSCKF camera-pose clones, SLAM features, FEJ, ZUPT and online camera-IMU
calibration — redesigned as fixed-shape, masked, padded dense linear algebra
under ``jit`` + ``lax.scan`` so full sequences run on-device, and ``vmap`` /
``shard_map`` scale to fleets of independent instances.

Reference parity map: see SURVEY.md §2 (component inventory).
"""

__version__ = "0.1.0"

from larvio_tpu.config import (  # noqa: F401
    CameraConfig,
    FilterConfig,
    FrontendConfig,
    NoiseConfig,
    VioConfig,
)
