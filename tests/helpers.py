"""Shared test utilities (re-exported from the package)."""

from rd_vio_tpu.datasets.synthetic_problems import (  # noqa: F401
    build_window_problem,
    identity_ext,
)
