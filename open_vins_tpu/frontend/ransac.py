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

from open_vins_tpu.ops import smallmat

# fixed projection seed for _null9's CGS2 row-complement: the seed only
# needs a non-negligible component along the nullspace direction (it is
# projected onto the orthogonal complement of A's rows, then normalized).
# In the measure-zero case where a hypothesis' nullvector is ~orthogonal
# to the seed, the projected residual is f32-noise-sized, the normalized
# result is garbage, and that hypothesis simply loses the RANSAC inlier
# vote — no filter-path consequence.
_SEED9 = (0.31, -0.47, 0.22, 0.55, -0.13, 0.41, -0.29, 0.17, 0.23)


def _null9(A):
    """Unit nullvector of [8, 9] A — zero LAPACK custom calls.

    TPU rule (docs/tpu-design.md): batched small-matrix factorization
    custom calls (svd/geev/getrf) SERIALIZE over the vmapped hypothesis
    axis — the two svd calls here were 27% of the whole rendered tracker
    frame (80 ms / 119 frames each at K=64).  The nullspace of the 8×9
    system is just the orthogonal complement of its rows: twice-iterated
    Gram-Schmidt ("twice is enough" CGS2) orthonormalizes the rows and
    projects a fixed seed onto the complement — ~150 length-9 fused VPU
    ops, accurate to the conditioning of A itself (NOT of AᵀA: the
    squared route loses half the f32 mantissa — measured λ₈ = 6e-5 on
    Hartley-normalized data, unresolvable next to λmax ≈ 36).  A
    rank-deficient sample (nullspace dim > 1) returns one vector of it —
    a degenerate hypothesis that loses the RANSAC vote, exactly like a
    degenerate SVD hypothesis."""
    qs = []
    for i in range(A.shape[0]):
        r = A[i]
        for _ in range(2):
            for q in qs:
                r = r - (q @ r) * q
        n = jnp.linalg.norm(r)
        qs.append(jnp.where(n > 1e-12, r, 0.0)
                  / jnp.maximum(n, 1e-30))
    v = jnp.asarray(_SEED9, A.dtype)
    for _ in range(2):
        for q in qs:
            v = v - (q @ v) * q
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)


def _rank2_project(F):
    """Drop the smallest singular direction of [3, 3] F: F(I − v₃v₃ᵀ) with
    v₃ the smallest eigenvector of FᵀF — closed-form (eigvalsh3 + row
    cross products of the shifted matrix), no SVD custom call."""
    G = F.T @ F
    lam = smallmat.eigvalsh3(G)[0]
    B = G - lam * jnp.eye(3, dtype=F.dtype)
    # v3 spans the nullspace of B: cross of the two most independent rows
    cands = jnp.stack([
        jnp.cross(B[0], B[1]),
        jnp.cross(B[0], B[2]),
        jnp.cross(B[1], B[2]),
    ])
    norms = jnp.linalg.norm(cands, axis=1)
    v3 = jnp.sum(jax.nn.one_hot(jnp.argmax(norms), 3,
                                dtype=F.dtype)[:, None] * cands, axis=0)
    n = jnp.linalg.norm(v3)
    v3 = v3 / jnp.maximum(n, 1e-30)
    # near-rank-1 F (repeated smallest eigenvalue): leave F unchanged —
    # a degenerate hypothesis that loses the vote either way
    return jnp.where(n > 1e-12, F - jnp.outer(F @ v3, v3), F)


def _hartley(p):
    """Isotropic point normalization (Hartley '97; cv::findFundamentalMat
    does the same): center at the mean, scale mean radius to √2.  Returns
    (normalized points, T [3,3]) with p̃_h = T p_h."""
    c = jnp.mean(p, axis=0)
    d = p - c
    s = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(jnp.linalg.norm(d, axis=1)),
                                    1e-12)
    T = (jnp.zeros((3, 3), p.dtype)
         .at[0, 0].set(s).at[1, 1].set(s)
         .at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
         .at[2, 2].set(1.0))
    return s * d, T


def _eight_point(p0, p1):
    """Normalized 8-point: p0,p1 [8,2] -> F [3,3] with p1ᵀ F p0 = 0."""
    q0, T0 = _hartley(p0)
    q1, T1 = _hartley(p1)
    x0, y0 = q0[:, 0], q0[:, 1]
    x1, y1 = q1[:, 0], q1[:, 1]
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, jnp.ones_like(x0)],
        axis=1,
    )  # [8, 9]
    # nullspace by Gram-Schmidt row complement (see _null9), rank-2
    # enforced in the normalized frame, then denormalized
    F = _rank2_project(_null9(A).reshape(3, 3))
    return T1.T @ F @ T0


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
