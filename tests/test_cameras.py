"""Tests for camera models: distort/undistort round trips and Jacobians.

Reference capability: ov_core/src/cam/CamRadtan.h, CamEqui.h.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.ops import cameras


@pytest.fixture(autouse=True, scope="module")
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)

ZETA_RADTAN = jnp.asarray(
    [458.654, 457.296, 367.215, 248.375, -0.2834, 0.0739, 0.0002, 1.76e-05]
)  # EuRoC cam0-like
ZETA_EQUI = jnp.asarray(
    [278.66, 278.48, 319.75, 241.96, -0.0139, 0.0579, -0.0744, 0.0331]
)  # TUM-VI-like fisheye


def grid_points(scale=0.5, n=11):
    x = np.linspace(-scale, scale, n)
    g = np.stack(np.meshgrid(x, x), axis=-1).reshape(-1, 2)
    return jnp.asarray(g)


@pytest.mark.parametrize(
    "model,zeta",
    [(cameras.RADTAN, ZETA_RADTAN), (cameras.EQUI, ZETA_EQUI)],
)
class TestRoundTrip:
    def test_distort_undistort(self, model, zeta):
        pts = grid_points(0.6)
        px = cameras.distort(model, zeta, pts)
        back = cameras.undistort(model, zeta, px)
        np.testing.assert_allclose(np.array(back), np.array(pts), atol=1e-8)

    def test_center_maps_to_principal_point(self, model, zeta):
        px = cameras.distort(model, zeta, jnp.zeros((1, 2)))
        np.testing.assert_allclose(np.array(px[0]), np.array(zeta[2:4]), atol=1e-9)

    def test_jacobian_vs_finite_diff(self, model, zeta):
        pts = grid_points(0.4, n=5)
        J_pt, J_z = cameras.distort_jacobians(model, zeta, pts)
        eps = 1e-6
        for k in range(2):
            d = np.zeros(2)
            d[k] = eps
            fd = (
                np.array(cameras.distort(model, zeta, pts + jnp.asarray(d)))
                - np.array(cameras.distort(model, zeta, pts))
            ) / eps
            np.testing.assert_allclose(np.array(J_pt[..., k]), fd, atol=1e-4, rtol=1e-4)
        for k in range(8):
            dz = np.zeros(8)
            dz[k] = eps
            fd = (
                np.array(cameras.distort(model, zeta + jnp.asarray(dz), pts))
                - np.array(cameras.distort(model, zeta, pts))
            ) / eps
            np.testing.assert_allclose(np.array(J_z[..., k]), fd, atol=1e-4, rtol=1e-4)


def test_radtan_no_distortion_is_pinhole():
    zeta = jnp.asarray([400.0, 410.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0])
    pts = grid_points(0.5, n=5)
    px = cameras.distort(cameras.RADTAN, zeta, pts)
    expected = np.array(pts) * np.array([400.0, 410.0]) + np.array([320.0, 240.0])
    np.testing.assert_allclose(np.array(px), expected, atol=1e-12)


def test_equi_matches_radtan_at_center():
    """Both models are pinhole to first order at the optical center."""
    pts = grid_points(1e-4, n=3)
    a = cameras.distort(cameras.RADTAN, ZETA_RADTAN, pts)
    zeta2 = ZETA_RADTAN.at[4:].set(0.0)
    b = cameras.distort(cameras.RADTAN, zeta2, pts)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
