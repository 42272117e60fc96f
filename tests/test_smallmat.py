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


def test_eigvalsh3_spherical():
    A = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
    e = np.array(smallmat.eigvalsh3(A))
    assert np.allclose(e, 2.5, atol=1e-6)
