"""Determinism: identical seeds and inputs must reproduce the trajectory
bit-for-bit (SURVEY.md §4.6 — the reference pins RANSAC seed 648; all our
PRNG keys derive from Config.random, enabling golden-trajectory regression)."""

import numpy as np

from tests.test_e2e_synthetic import _run_pipeline


def test_two_runs_identical():
    _, t1, p1, s1, _ = _run_pipeline(duration=4.5)
    _, t2, p2, s2, _ = _run_pipeline(duration=4.5)
    assert s1 == s2
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
