"""Initialization package (ref:Initializer/*, SURVEY.md §3.4).

The static path lives on-device inside the filter step
(models/initializer.py). This package adds the in-motion bootstrap:

  * preintegration.py — IMU preintegration between keyframes
  * sfm.py            — two-view essential + window SfM (triangulate/PnP)
  * alignment.py      — gyro-bias solve + linear visual-inertial alignment
  * flexible.py       — static/dynamic dispatch (ref:FlexibleInitializer)

All host-side numpy: initialization runs once per sequence and is latency-
bound by data collection, not compute (SURVEY.md §7 hard part #6 endorses a
host path here).
"""

from larvio_tpu.init.flexible import FlexibleInitializer, InitResult  # noqa: F401
