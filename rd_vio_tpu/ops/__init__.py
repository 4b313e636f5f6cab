"""Pure-math and kernel ops for the TPU-native RD-VIO engine."""
