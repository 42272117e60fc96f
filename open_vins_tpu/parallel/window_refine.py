"""Sliding-window BA refinement of the live filter state.

BASELINE config 5's "distributed BA refinement": takes the filter's clone
window and the current feature tracks, builds a BAProblem (poses = clone
window in the IMU frame with the camera extrinsic folded in), runs the
landmark-sharded Schur GN (parallel/distributed_ba.py) over a mesh, and
returns the refined window poses — a smoother-grade polish of the filter
trajectory (the role Ceres DENSE_SCHUR plays in the reference's dynamic
initializer, generalized to the sliding window and to multiple devices).

This is an *output refinement* (does not feed back into the covariance) —
the filter stays a consistent EKF; the refined window is for publishing/
evaluation, like the reference's secondary visualization products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import VioState
from open_vins_tpu.models import feature_table as ft
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie
from open_vins_tpu.parallel import distributed_ba as dba


def build_problem(state: VioState, cfg: FilterConfig, table: ft.FeatureTable,
                  tri_opts: tri.TriangulationOptions, max_landmarks: int,
                  gather_fn):
    """Assemble a BAProblem from the clone window + longest current tracks.

    Uses cam-0 poses (R_GtoC, p_CinG) as the BA 'camera' frames so the
    extrinsic is folded in; landmarks triangulated from the current state.
    max_landmarks should be mesh-divisible for sharded runs.
    """
    C = cfg.max_clones
    n_obs = ft.row_obs_counts(table)
    score = jnp.where(table.ids >= 0, n_obs.astype(jnp.float32), -1.0)
    _, rows = jax.lax.top_k(score, max_landmarks)
    tri_obs, gobs = gather_fn(state, cfg, table, rows)
    p_f, ok = tri.triangulate_batch(tri_obs, tri_opts)
    ok = ok & jnp.all(jnp.isfinite(p_f), axis=-1) & (score[rows] > 2)
    p_f = jnp.where(ok[:, None], p_f, jnp.asarray([0.0, 0.0, 1.0]))

    # BA poses: cam0 at each clone slot
    R_GtoI = lie.quat_2_rot(state.clones_q)  # [C,3,3]
    R_ItoC0 = lie.quat_2_rot(state.calib_ext_q[0])
    R = jnp.einsum("ij,cjk->cik", R_ItoC0, R_GtoI)
    p = state.clones_p - jnp.einsum(
        "cij,j->ci", jnp.swapaxes(R_GtoI, -1, -2),
        R_ItoC0.T @ state.calib_ext_p[0],
    )

    # observations: (slot, uvn) pairs from the gathered cam-0 entries
    O = gobs.mask.shape[1]
    cam0 = gobs.cam == 0  # [F, O]
    obs_mask = gobs.mask & cam0 & ok[:, None] \
        & state.clone_valid[gobs.clone_slot]
    prob = dba.BAProblem(
        R=R, p=p, landmarks=p_f,
        obs_pose=gobs.clone_slot,
        obs_uvn=gobs.uvn,
        obs_mask=obs_mask,
        R_ItoC=jnp.eye(3, dtype=R.dtype),  # extrinsic already folded in
        p_IinC=jnp.zeros(3, dtype=R.dtype),
    )
    return prob, ok


def refine_window(state: VioState, cfg: FilterConfig, table: ft.FeatureTable,
                  tri_opts: tri.TriangulationOptions, gather_fn,
                  mesh=None, max_landmarks=64, iters=3):
    """Refined (R_GtoC0 [C,3,3], p_C0inG [C,3], landmarks, rms_before, rms_after)."""
    prob, ok = build_problem(state, cfg, table, tri_opts, max_landmarks,
                             gather_fn)
    e0 = dba.reprojection_rmse(prob)
    prob2, _ = dba.refine(prob, iters=iters, mesh=mesh)
    e1 = dba.reprojection_rmse(prob2)
    return prob2.R, prob2.p, prob2.landmarks, e0, e1
