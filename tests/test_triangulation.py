"""Triangulation unit tests: 3D linear + 1-D depth-only variants
(FeatureInitializer.cpp:30-195 parity)."""

import jax.numpy as jnp
import numpy as np

from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie


def make_obs(p_f, n=6, seed=0, noise=0.0):
    """Cameras on an arc looking at p_f; exact normalized projections."""
    rng = np.random.default_rng(seed)
    Rs, ps, uvns, mask = [], [], [], []
    for i in range(n):
        ang = 0.15 * i
        c = np.array([2.0 * np.sin(ang), 2.0 * np.cos(ang) - 2.0, -5.0 + 0.2 * i])
        # look-at rotation: z axis towards the feature
        z = p_f - c
        z = z / np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_GtoC = np.stack([x, y, z])  # rows = camera axes
        pc = R_GtoC @ (p_f - c)
        uvn = pc[:2] / pc[2] + noise * rng.normal(size=2)
        Rs.append(R_GtoC), ps.append(c), uvns.append(uvn), mask.append(True)
    return tri.FeatureObs(
        R_GtoC=jnp.asarray(np.stack(Rs), jnp.float32),
        p_CinG=jnp.asarray(np.stack(ps), jnp.float32),
        uvn=jnp.asarray(np.stack(uvns), jnp.float32),
        mask=jnp.asarray(mask),
    )


P_TRUE = np.array([0.3, -0.2, 1.0])


class TestLinear3D:
    def test_exact_recovery(self):
        obs = make_obs(P_TRUE)
        opts = tri.TriangulationOptions(refine=False)
        p, ok = tri.triangulate(obs, opts)
        assert bool(ok)
        assert np.linalg.norm(np.array(p) - P_TRUE) < 1e-3


class TestDepthOnly1D:
    def test_exact_recovery_along_anchor_bearing(self):
        """Noise-free: the anchor ray passes through the true point, so the
        depth-only solve recovers it exactly
        (single_triangulation_1d, FeatureInitializer.cpp:114-195)."""
        obs = make_obs(P_TRUE)
        opts = tri.TriangulationOptions(refine=False, triangulate_1d=True)
        p, ok = tri.triangulate(obs, opts)
        assert bool(ok)
        assert np.linalg.norm(np.array(p) - P_TRUE) < 1e-3

    def test_noise_stays_on_anchor_ray(self):
        """With noisy non-anchor obs the solution still lies on the frozen
        anchor bearing — the 1-dof constraint that pairs with
        ANCHORED_INVERSE_DEPTH_SINGLE."""
        obs = make_obs(P_TRUE, noise=2e-3)
        opts = tri.TriangulationOptions(refine=False, triangulate_1d=True)
        p_G, ok, p_A, a = tri.triangulate_linear_1d(obs, opts)
        assert bool(ok)
        a = int(a)
        bearing = np.concatenate([np.array(obs.uvn[a]), [1.0]])
        bearing /= np.linalg.norm(bearing)
        pa = np.array(p_A)
        cosang = pa @ bearing / np.linalg.norm(pa)
        assert cosang > 1 - 1e-6, "solution left the anchor ray"
        assert np.linalg.norm(np.array(p_G) - P_TRUE) < 0.05

    def test_depth_gates_reject_behind_camera(self):
        obs = make_obs(P_TRUE)
        opts = tri.TriangulationOptions(refine=False, triangulate_1d=True,
                                        min_dist=50.0)  # force gate failure
        _, ok = tri.triangulate(obs, opts)
        assert not bool(ok)
