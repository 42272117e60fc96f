"""Device-mesh helpers: the TPU build's communication backend.

SURVEY.md §2.9 / §5.8: the reference has no distributed backend (ROS pub/sub
is its only transport); the TPU build's distributed axes are jax.sharding
meshes over ICI with XLA collectives.  This module centralizes mesh
construction (classic GSPMD 'Auto' axis types — jax 0.9 defaults to the
Explicit sharding mode, which the estimator does not use) and
multi-host initialization.
"""

from __future__ import annotations

import jax


def make_mesh(shape, names):
    """An Auto-typed mesh over the first prod(shape) devices."""
    axis_types = tuple(jax.sharding.AxisType.Auto for _ in names)
    return jax.make_mesh(tuple(shape), tuple(names), axis_types=axis_types)


def data_mesh(n_devices=None):
    """1-D data-parallel mesh ('dp')."""
    n = n_devices or len(jax.devices())
    return make_mesh((n,), ("dp",))


def init_distributed():
    """Multi-host initialization (jax.distributed) — call once per process
    on pod slices; a no-op in single-process runs."""
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
