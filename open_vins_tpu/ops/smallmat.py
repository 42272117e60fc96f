"""Closed-form small-matrix linear algebra (3x3 solve / symmetric eigvals).

Why this exists: on TPU, `jnp.linalg.solve` / `eigvalsh` lower to LAPACK-style
custom calls whose fixed launch latency (~30-60 us) dwarfs the arithmetic for
tiny batched operands — the profiled VIO frame spent ~0.2 ms/frame in seven
[40,3,3] custom calls.  Cramer/adjugate solves and the trigonometric
symmetric-3x3 eigenvalue formula are pure elementwise arithmetic, so XLA
fuses them into neighboring ops and the launches disappear.

Numerics: adjugate solves are exact up to f32 rounding for the
well-conditioned systems they are used on (damped GN normal equations,
condition-gated triangulation Gramians); callers keep their existing
conditioning gates/jitter.
"""

from __future__ import annotations

import jax.numpy as jnp


def det3(A):
    """Determinant of [..., 3, 3]."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def solve3(A, b, eps: float = 1e-12):
    """Solve A x = b for [..., 3, 3] A and [..., 3] b by the adjugate.

    Singular systems return a large-but-finite result (denominator clamped
    at eps) — callers gate on conditioning, exactly as with linalg.solve
    plus jitter.
    """
    a11, a12, a13 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a21, a22, a23 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a31, a32, a33 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c11 = a22 * a33 - a23 * a32
    c12 = a13 * a32 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    c21 = a23 * a31 - a21 * a33
    c22 = a11 * a33 - a13 * a31
    c23 = a13 * a21 - a11 * a23
    c31 = a21 * a32 - a22 * a31
    c32 = a12 * a31 - a11 * a32
    c33 = a11 * a22 - a12 * a21
    # cij above are adj(A) entries (transposed cofactors): det expands along
    # row 1 of A against column 1 of adj(A)
    det = a11 * c11 + a12 * c21 + a13 * c31
    det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps, det)
    b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2]
    x1 = (c11 * b1 + c12 * b2 + c13 * b3) / det
    x2 = (c21 * b1 + c22 * b2 + c23 * b3) / det
    x3 = (c31 * b1 + c32 * b2 + c33 * b3) / det
    return jnp.stack([x1, x2, x3], axis=-1)


def chi2_quadform(S, b, floor: float = 1e-20):
    """gamma = b^T S^{-1} b for SPD [..., m, m] S by UNROLLED Cholesky.

    gamma = ||L^{-1} b||^2, so no back-substitution is needed.  The m
    column steps + m forward-substitution steps unroll into ~2m fused
    batched vector ops — on TPU this replaces a lapack-style batched-solve
    custom call that executes its small factorizations serially (profiled
    at ~0.5 GFLOP/s).  m is static and must be small (gates use m <= ~24).

    Rows/cols that are exactly sigma^2*e_i (masked measurements) factor
    cleanly; `floor` guards the sqrt for degenerate inputs (callers gate on
    finiteness as before).
    """
    m = S.shape[-1]
    L = jnp.zeros_like(S)
    idx = jnp.arange(m)
    for j in range(m):
        # s_i = S[i,j] - sum_k L[i,k] L[j,k]; entries k >= j are still zero
        s = S[..., :, j] - jnp.sum(L * L[..., j:j + 1, :], axis=-1)
        d = jnp.sqrt(jnp.maximum(s[..., j], floor))
        col = s / d[..., None]
        L = L + (col * (idx >= j))[..., None] * (idx == j)  # set column j
    y = jnp.zeros_like(b)
    for i in range(m):
        yi = (b[..., i] - jnp.sum(L[..., i, :] * y, axis=-1)) / L[..., i, i]
        y = y + yi[..., None] * (idx == i)
    return jnp.sum(y * y, axis=-1)


def inv_upper3(U, eps: float = 1e-12):
    """Inverse of upper-triangular [..., 3, 3] U, closed form.

    Diagonals are clamped at eps (same conditioning convention the QR-based
    delayed-init used with its 1e-12 jitter); callers gate degenerate
    systems separately.
    """
    def _safe(d):
        s = jnp.where(d < 0, -1.0, 1.0)
        return jnp.where(jnp.abs(d) < eps, s * eps, d)

    u11 = _safe(U[..., 0, 0])
    u22 = _safe(U[..., 1, 1])
    u33 = _safe(U[..., 2, 2])
    u12, u13, u23 = U[..., 0, 1], U[..., 0, 2], U[..., 1, 2]
    v11, v22, v33 = 1.0 / u11, 1.0 / u22, 1.0 / u33
    v12 = -u12 * v11 * v22
    v23 = -u23 * v22 * v33
    v13 = (u12 * u23 - u13 * u22) * v11 * v22 * v33
    z = jnp.zeros_like(v11)
    return jnp.stack([
        jnp.stack([v11, v12, v13], axis=-1),
        jnp.stack([z, v22, v23], axis=-1),
        jnp.stack([z, z, v33], axis=-1),
    ], axis=-2)


def eigvalsh3(A):
    """Eigenvalues (ascending, [..., 3]) of symmetric [..., 3, 3] A.

    Trigonometric closed form (Smith 1961): exact for symmetric input up to
    rounding; used for condition-number gates where ~1e-6 relative accuracy
    is ample.
    """
    dtype = A.dtype
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 ** 2 + a02 ** 2 + a12 ** 2
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-38))
    # B = (A - q I) / p ; r = det(B) / 2
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = jnp.asarray(2.0943951023931953, dtype)
    e1 = q + 2.0 * p * jnp.cos(phi)  # largest
    e3 = q + 2.0 * p * jnp.cos(phi + two_pi_3)  # smallest
    e2 = 3.0 * q - e1 - e3
    # diagonal / near-spherical case: p2 ~ 0 -> all eigenvalues = q
    tiny = p2 < 1e-30
    e1 = jnp.where(tiny, q, e1)
    e2 = jnp.where(tiny, q, e2)
    e3 = jnp.where(tiny, q, e3)
    return jnp.stack([e3, e2, e1], axis=-1)
