"""Pallas TPU kernels (component N5, SURVEY.md §2d — layer T0).

TPU-native replacements for the reference's OpenCL device kernels R1-R3
(SURVEY.md §2a): fused Jacobi sweeps that keep u/v resident in VMEM across
iterations instead of round-tripping HBM (the TPU analog of — and improvement
on — the reference's ping-pong buffer scheme).
"""

from opticalflowhs_tpu.kernels.jacobi import jacobi_sweeps  # noqa: F401
