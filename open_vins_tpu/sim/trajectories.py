"""Groundtruth trajectory file loading for the simulator.

Capability parity with the reference's DatasetReader::load_simulated_trajectory
(ov_core/src/utils/dataset_reader.h:177-247) + BsplineSE3::feed_trajectory
re-gridding (BsplineSE3.cpp:26-60): rows are
``timestamp p_IinG(3) q_GtoI(4, JPL xyzw)``, poses become uniform control
points at the average input rate (clamped to >= 0.05 s).

The reference repo ships these files in ov_data/ (udel_gore, euroc_V1_01_easy,
tum_corridor1, ...); pass any of them here to simulate realistic motion.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from open_vins_tpu.ops import lie

REFERENCE_SIM_DIR = "/root/reference/ov_data/sim"


def load_trajectory_file(path):
    """Parse a sim trajectory file -> (times [N], R_ItoG [N,3,3], p [N,3]).

    Times are shifted to start at 0 and re-gridded uniformly (the reference
    treats the poses as uniform control points at the average rate).
    """
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 8:
                continue
            rows.append([float(x) for x in parts[:8]])
    arr = np.asarray(rows, dtype=np.float64)
    if len(arr) < 8:
        raise ValueError(f"trajectory too short: {path}")
    t = arr[:, 0]
    p = arr[:, 1:4]
    q_GtoI = arr[:, 4:8]  # JPL xyzw
    dt = max(float(np.mean(np.diff(t))), 0.05)
    times = jnp.asarray(np.arange(len(arr)) * dt, dtype=jnp.float32)
    R_GtoI = lie.quat_2_rot(jnp.asarray(q_GtoI, dtype=jnp.float32))
    R_ItoG = jnp.swapaxes(R_GtoI, -1, -2)
    return times, R_ItoG, jnp.asarray(p, dtype=jnp.float32)
