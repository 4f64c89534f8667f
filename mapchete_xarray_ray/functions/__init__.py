"""Scalar / per-batch kernels shared by engine stages and the oracle."""
