"""Batched 8-point fundamental-matrix RANSAC on normalized coordinates.

Capability parity with the reference's outlier rejection
(TrackKLT::perform_matching, TrackKLT.cpp:829-886: cv::findFundamentalMat
RANSAC on *undistorted normalized* points with threshold 2.0/max_focallength).

TPU-first design: a fixed number of hypotheses is evaluated in parallel
(vmapped 8-point solves via SVD), inliers counted with one [K, N] matmul-
shaped residual evaluation, best hypothesis selected by top-1 — no
data-dependent iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _eight_point(p0, p1):
    """Normalized 8-point: p0,p1 [8,2] -> F [3,3] with p1ᵀ F p0 = 0."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, jnp.ones_like(x0)],
        axis=1,
    )  # [8, 9]
    # nullspace of A via SVD
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    f = Vt[-1]
    F = f.reshape(3, 3)
    # enforce rank 2
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt2


def _sampson_dist(F, p0, p1):
    """Sampson distance of correspondences under F. p0,p1 [N,2] -> [N]."""
    ones = jnp.ones_like(p0[:, :1])
    x0 = jnp.concatenate([p0, ones], axis=1)  # [N,3]
    x1 = jnp.concatenate([p1, ones], axis=1)
    Fx0 = x0 @ F.T  # = (F @ x0ᵀ)ᵀ  [N,3]
    Ftx1 = x1 @ F  # [N,3]
    num = jnp.sum(x1 * Fx0, axis=1) ** 2
    den = Fx0[:, 0] ** 2 + Fx0[:, 1] ** 2 + Ftx1[:, 0] ** 2 + Ftx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def ransac_fundamental(p0, p1, mask, key, thresh, num_hyp=64):
    """RANSAC inlier mask for correspondences p0->p1 ([N,2] normalized).

    thresh: inlier threshold on Sampson distance (use (2/f_max)² semantics:
    pass the pixel-equivalent normalized threshold, it is squared inside).
    Returns (inlier_mask [N], best_F [3,3]).
    """
    N = p0.shape[0]
    valid_f = mask.astype(p0.dtype)
    n_valid = jnp.sum(mask)

    # sample hypotheses: random 8-subsets of valid indices (gumbel top-k)
    def sample(k):
        g = jax.random.gumbel(k, (N,))
        score = jnp.where(mask, g, -jnp.inf)
        _, idx = jax.lax.top_k(score, 8)
        return idx

    keys = jax.random.split(key, num_hyp)
    sets = jax.vmap(sample)(keys)  # [K, 8]

    def eval_hyp(idx):
        F = _eight_point(p0[idx], p1[idx])
        d = _sampson_dist(F, p0, p1)
        inl = (d < thresh**2) & mask
        return jnp.sum(inl.astype(jnp.int32)), F

    counts, Fs = jax.vmap(eval_hyp)(sets)
    best = jnp.argmax(counts)
    F = Fs[best]
    d = _sampson_dist(F, p0, p1)
    inliers = (d < thresh**2) & mask
    # degenerate guard: too few points -> keep everything valid
    enough = n_valid >= 12
    return jnp.where(enough, inliers, mask), F
