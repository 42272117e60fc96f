"""open_vins_tpu — a TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
rpng/open_vins (MSCKF sliding-window VIO with FEJ, SLAM landmarks, ZUPT,
online calibration, static/dynamic initialization, SE(3)-B-spline simulator,
and an ATE/RPE/NEES evaluation suite), built around fixed-shape batched
state blocks, `lax.scan` propagation, QR measurement compression, and
`jax.sharding` meshes for multi-chip scaling.
"""

import jax as _jax

# On TPU, matmuls default to bfloat16 MXU passes (~3 decimal digits), which is
# fatal for EKF covariance algebra.  The filter is f32 end-to-end; force all
# dots to full f32 accumulation.  Hot kernels that can tolerate bf16 opt in
# explicitly with precision=DEFAULT.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
