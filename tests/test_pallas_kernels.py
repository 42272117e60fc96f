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
