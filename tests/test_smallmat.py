"""Closed-form 3x3 solve / eigvalsh vs LAPACK references."""

import jax.numpy as jnp
import numpy as np

from open_vins_tpu.ops import smallmat


def _rand_spd(rng, n=200, scale=1.0):
    J = rng.normal(size=(n, 5, 3)) * scale
    return np.einsum("nik,nij->nkj", J, J) + 1e-3 * np.eye(3)


def test_solve3_matches_linalg():
    rng = np.random.default_rng(0)
    A = _rand_spd(rng)
    b = rng.normal(size=(200, 3))
    x = np.array(smallmat.solve3(jnp.asarray(A), jnp.asarray(b)))
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    assert np.allclose(x, x_ref, rtol=1e-4, atol=1e-5)


def test_solve3_general_matrices():
    """Non-symmetric but well-conditioned systems (the supported regime —
    callers damp/gate conditioning before solving)."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(100, 3, 3)) + 4.0 * np.eye(3)  # diag-dominant-ish
    b = rng.normal(size=(100, 3))
    x = np.array(smallmat.solve3(jnp.asarray(A), jnp.asarray(b)))
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    assert np.allclose(x, x_ref, rtol=1e-3, atol=1e-4)


def test_eigvalsh3_matches_linalg():
    rng = np.random.default_rng(2)
    A = _rand_spd(rng, scale=3.0)
    e = np.array(smallmat.eigvalsh3(jnp.asarray(A)))
    e_ref = np.linalg.eigvalsh(A)
    assert np.all(np.diff(e, axis=-1) >= -1e-4), "not ascending"
    assert np.allclose(e, e_ref, rtol=1e-3, atol=1e-3 * np.abs(e_ref).max())


def test_chi2_quadform_matches_solve():
    rng = np.random.default_rng(5)
    for m in (6, 19):
        J = rng.normal(size=(40, m + 4, m))
        S = np.einsum("nik,nij->nkj", J, J) + 1.0 * np.eye(m)
        b = rng.normal(size=(40, m))
        g = np.array(smallmat.chi2_quadform(jnp.asarray(S), jnp.asarray(b)))
        g_ref = np.einsum("ni,ni->n", b, np.linalg.solve(S, b[..., None])[..., 0])
        assert np.allclose(g, g_ref, rtol=2e-3, atol=1e-4), (m, np.abs(g - g_ref).max())


def test_chi2_quadform_masked_rows():
    """sigma^2-identity rows (masked measurements) with zero residual must
    contribute nothing."""
    m = 8
    S = np.eye(m) * 0.25
    S[:3, :3] += np.array([[2.0, 0.3, 0.1], [0.3, 1.5, 0.2], [0.1, 0.2, 3.0]])
    b = np.zeros(m)
    b[:3] = [0.5, -0.2, 0.1]
    g = float(smallmat.chi2_quadform(jnp.asarray(S), jnp.asarray(b)))
    g_ref = float(b @ np.linalg.solve(S, b))
    assert abs(g - g_ref) < 1e-5 * max(1.0, g_ref)


def test_eigvalsh3_spherical():
    A = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
    e = np.array(smallmat.eigvalsh3(A))
    assert np.allclose(e, 2.5, atol=1e-6)
