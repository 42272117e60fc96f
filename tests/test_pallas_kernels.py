"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("D,m", [(96, 64), (171, 171), (256, 40), (130, 200)])
def test_symmetric_downdate_matches_dense(D, m):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(D, D)) * 0.1
    P = jnp.asarray(A @ A.T + np.eye(D), jnp.float32)
    K = jnp.asarray(rng.normal(size=(D, m)) * 0.05, jnp.float32)
    PHt = jnp.asarray(rng.normal(size=(D, m)) * 0.05, jnp.float32)

    ref = P - K @ PHt.T
    ref = 0.5 * (ref + ref.T)
    out = pk.symmetric_downdate_pallas(P, K, PHt, interpret=True)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=1e-5)
    # exact symmetry by construction
    np.testing.assert_allclose(np.array(out), np.array(out).T, atol=0)


@pytest.mark.parametrize("B,n", [(256, 128), (512, 128), (384, 256)])
def test_householder_qr_block_kernel(B, n):
    """In-VMEM block QR must reproduce RᵀR = AᵀA per block (interpret)."""
    rng = np.random.default_rng(2)
    g = 3
    A = rng.normal(size=(g, B, n)).astype(np.float32)
    # zero-pad some trailing rows/cols like the TSQR driver does
    A[:, -7:, :] = 0.0
    A[:, :, -5:] = 0.0
    R = pk.householder_qr_blocks_pallas(jnp.asarray(A), interpret=True)
    R = np.array(R, dtype=np.float64)
    for i in range(g):
        Ai = A[i].astype(np.float64)
        np.testing.assert_allclose(
            R[i].T @ R[i], Ai.T @ Ai, atol=2e-3,
            rtol=2e-3,
        )
        # upper triangular
        assert np.allclose(np.tril(R[i], -1), 0.0)


def test_tsqr_compress_equivalence():
    """TSQR compression must give the same EKF information as dense QR."""
    from open_vins_tpu.models import update_helper as uh

    rng = np.random.default_rng(3)
    m, D = 700, 120
    H = (rng.normal(size=(m, D)) * 0.3).astype(np.float32)
    H[100:140] = 0.0  # masked rows
    res = (rng.normal(size=m) * 0.1).astype(np.float32)
    res[100:140] = 0.0
    H_c, res_c = uh.compress_system(jnp.asarray(H), jnp.asarray(res), D)
    A = np.concatenate([H, res[:, None]], axis=1).astype(np.float64)
    G_ref = A.T @ A
    C = np.concatenate(
        [np.array(H_c, np.float64), np.array(res_c, np.float64)[:, None]], 1)
    # compressed system carries the same H-information and H·res coupling
    # (the res² element may differ: rows beyond D of R are dropped)
    np.testing.assert_allclose(
        (C.T @ C)[:D, :], G_ref[:D, :], atol=5e-2, rtol=5e-3)


def test_dispatch_fallback_matches():
    rng = np.random.default_rng(1)
    D, m = 100, 30
    P = jnp.asarray(rng.normal(size=(D, D)), jnp.float32)
    P = 0.5 * (P + P.T)
    K = jnp.asarray(rng.normal(size=(D, m)), jnp.float32)
    PHt = jnp.asarray(rng.normal(size=(D, m)), jnp.float32)
    out = pk.symmetric_downdate(P, K, PHt)  # cpu fallback path
    ref = P - K @ PHt.T
    ref = 0.5 * (ref + ref.T)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=1e-5)
