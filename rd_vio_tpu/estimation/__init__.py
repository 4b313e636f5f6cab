"""Estimation layer: window states, factors, batched LM solver, marginalization.

Replaces the reference's Ceres stack (src/rdvio_estimation) with a
struct-of-arrays, fixed-shape, jit-compiled trust-region solver whose
residual/Jacobian assembly and Schur reduction are batched matmuls (SURVEY.md
§2 L3 "TPU equivalent").
"""
