"""Unit tests for the latency-path micro primitives added in round 2:

* `update_helper.householder_rotate` — the LAPACK-free complete-QR
  orthogonal transform used by the nullspace projection / delayed-init
  rotation (replaces batched geqrf+orgqr custom calls),
* `propagator._compose_transitions` — the log-depth tree reduction of the
  per-interval (Φ, B, Qd) transitions (replaces the sequential scan
  composition),
* `propagator._rotation_prefixes` — associative-scan rotation prefixes.

Each is pinned against the straightforward sequential/LAPACK construction
it replaced.
"""

import jax
import jax.numpy as jnp
import numpy as np

from open_vins_tpu.models import propagator as P
from open_vins_tpu.models import update_helper as uh


class TestHouseholderRotate:
    def test_matches_complete_qr_information(self):
        rng = np.random.default_rng(0)
        m, k, n = 22, 3, 9
        Hf = rng.normal(size=(m, k)).astype(np.float32)
        Hf[4:7] = 0.0  # masked rows
        M = rng.normal(size=(m, n)).astype(np.float32)
        M[4:7] = 0.0
        R, QtM = uh.householder_rotate(jnp.asarray(Hf), jnp.asarray(M))
        R, QtM = np.array(R), np.array(QtM)
        # orthogonal transform: Gram matrices preserved exactly
        np.testing.assert_allclose(R.T @ R, Hf.T @ Hf, atol=3e-4)
        np.testing.assert_allclose(R.T @ QtM, Hf.T @ M, atol=3e-4)
        np.testing.assert_allclose((QtM**2).sum(0), (M**2).sum(0),
                                   rtol=2e-5, atol=1e-5)
        # R upper-triangular in the leading block, zero below
        assert np.abs(np.tril(R[:k, :k], -1)).max() < 1e-5
        assert np.abs(R[k:]).max() < 1e-5
        # rows k: of QtM carry the same information as the complete-QR
        # nullspace rows (any orthonormal basis of the complement)
        Q, _ = np.linalg.qr(Hf, mode="complete")
        ref = (Q.T @ M)[k:]
        got = QtM[k:]
        np.testing.assert_allclose(got.T @ got, ref.T @ ref, atol=5e-4)

    def test_zero_matrix_is_identity(self):
        M = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4)),
                        jnp.float32)
        R, QtM = uh.householder_rotate(jnp.zeros((8, 2), jnp.float32), M)
        np.testing.assert_allclose(np.array(QtM), np.array(M))
        assert np.abs(np.array(R)).max() == 0.0


class TestComposeTransitions:
    def _random_steps(self, n, seed=0):
        rng = np.random.default_rng(seed)
        Phis = (np.eye(15) + 0.05 * rng.normal(size=(n, 15, 15))).astype(
            np.float32)
        Bs = (0.1 * rng.normal(size=(n, 15, 24))).astype(np.float32)
        Qs = rng.normal(size=(n, 15, 15)).astype(np.float32)
        Qds = (0.01 * np.einsum("nij,nkj->nik", Qs, Qs)).astype(np.float32)
        return jnp.asarray(Phis), jnp.asarray(Bs), jnp.asarray(Qds)

    def _sequential(self, Phis, Bs, Qds):
        Phi = np.eye(15, dtype=np.float64)
        B = np.zeros((15, 24))
        Qd = np.zeros((15, 15))
        for k in range(Phis.shape[0]):
            Pk, Bk, Qk = (np.array(Phis[k], np.float64),
                          np.array(Bs[k], np.float64),
                          np.array(Qds[k], np.float64))
            B = Pk @ B + Bk
            Qd = Pk @ Qd @ Pk.T + Qk
            Phi = Pk @ Phi
        return Phi, B, Qd

    def test_matches_sequential(self):
        for n in (1, 2, 5, 10, 16):
            Phis, Bs, Qds = self._random_steps(n, seed=n)
            Phi, B, Qd = P._compose_transitions(Phis, Bs, Qds)
            Phi_r, B_r, Qd_r = self._sequential(Phis, Bs, Qds)
            np.testing.assert_allclose(np.array(Phi), Phi_r, atol=2e-4)
            np.testing.assert_allclose(np.array(B), B_r, atol=2e-4)
            np.testing.assert_allclose(np.array(Qd), Qd_r, atol=2e-4)

    def test_identity_padding_is_noop(self):
        Phis, Bs, Qds = self._random_steps(5, seed=3)
        eye = jnp.broadcast_to(jnp.eye(15, dtype=jnp.float32), (3, 15, 15))
        Phis_p = jnp.concatenate([Phis, eye])
        Bs_p = jnp.concatenate([Bs, jnp.zeros((3, 15, 24), jnp.float32)])
        Qds_p = jnp.concatenate([Qds, jnp.zeros((3, 15, 15), jnp.float32)])
        a = P._compose_transitions(Phis, Bs, Qds)
        b = P._compose_transitions(Phis_p, Bs_p, Qds_p)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.array(x), np.array(y), atol=1e-5)


class TestRotationPrefixes:
    def test_matches_sequential_products(self):
        rng = np.random.default_rng(0)
        from open_vins_tpu.ops import lie

        Rs = np.stack([
            np.array(lie.exp_so3(jnp.asarray(rng.normal(size=3) * 0.3)))
            for _ in range(10)
        ]).astype(np.float32)
        pref = np.array(P._rotation_prefixes(jnp.asarray(Rs)))
        acc = np.eye(3)
        for k in range(10):
            acc = Rs[k] @ acc
            np.testing.assert_allclose(pref[k], acc, atol=1e-5)
