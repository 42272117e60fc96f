"""open_vins_tpu — a TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
rpng/open_vins (MSCKF sliding-window VIO with FEJ, SLAM landmarks, ZUPT,
online calibration, static/dynamic initialization, SE(3)-B-spline simulator,
and an ATE/RPE/NEES evaluation suite), built around fixed-shape batched
state blocks, `lax.scan` propagation, QR measurement compression, and
`jax.sharding` meshes for multi-chip scaling.
"""

import os as _os

import jax as _jax

# On TPU, matmuls default to bfloat16 MXU passes (~3 decimal digits), which is
# fatal for EKF covariance algebra.  The filter is f32 end-to-end; force all
# dots to full f32 accumulation.  Hot kernels that can tolerate bf16 opt in
# explicitly with precision=DEFAULT.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache, OPT-IN via OVT_JAX_CACHE=<dir>: the
# estimator is a handful of large jit programs and caching skips the
# multi-minute first compile on repeat runs.  It is not enabled by default
# because with the remote-compile TPU tunnel the server also emits CPU AOT
# artifacts whose machine features do not match this host (SIGILL risk when
# a later CPU run loads them) — enable it only for same-platform reruns.
_cache_dir = _os.environ.get("OVT_JAX_CACHE", "")
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass

__version__ = "0.1.0"
