"""The VIO pipeline ("model") layer: handler, feature tracker, initializer,
sliding-window tracker, frontend state machine, and the public Odometry API.

Host Python orchestrates branchy control flow (keyframe state machine, slot
management) over device-resident jitted kernels (preintegration, RANSAC/PARSAC,
triangulation, BA, marginalization) — the split recommended in SURVEY.md §7.
"""

from rd_vio_tpu.models.odometry import Odometry  # noqa: F401
