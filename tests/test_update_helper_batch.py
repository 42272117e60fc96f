"""feature_jacobian_batch (SoA, lane-major) must equal the per-feature
vmapped feature_jacobian exactly — over camera models, calib flags, and
masked observation patterns.  Reference semantics: UpdaterHelper.cpp
get_feature_jacobian_full (FEJ substitution per :353-363)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import init_state
from open_vins_tpu.models import update_helper as uh
from open_vins_tpu.ops import lie


def make_state(cfg, seed):
    rng = np.random.default_rng(seed)
    st = init_state(cfg)
    C = cfg.max_clones

    def rq(n):
        q = rng.normal(size=(n, 4))
        return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True),
                           jnp.float32)

    st = st._replace(
        clones_q=rq(C), clones_p=jnp.asarray(rng.normal(size=(C, 3)) * 0.5,
                                             jnp.float32),
        clones_q_fej=rq(C),
        clones_p_fej=jnp.asarray(rng.normal(size=(C, 3)) * 0.5, jnp.float32),
        clone_valid=jnp.ones((C,), bool),
        calib_ext_q=rq(cfg.num_cams),
        calib_ext_p=jnp.asarray(rng.normal(size=(cfg.num_cams, 3)) * 0.05,
                                jnp.float32),
        calib_intr=jnp.asarray(
            np.tile([460.0, 455.0, 360.0, 240.0, -0.28, 0.07, 2e-4, 1.8e-5],
                    (cfg.num_cams, 1)), jnp.float32),
    )
    return st


@pytest.mark.parametrize("cam_model", ["radtan", "equi"])
@pytest.mark.parametrize("calib", [(False, False), (True, True)])
@pytest.mark.parametrize("num_cams", [1, 2])
def test_batch_matches_vmapped(cam_model, calib, num_cams):
    cfg = FilterConfig(max_clones=6, max_slam=4, num_cams=num_cams,
                       cam_model=cam_model,
                       calib_cam_extrinsics=calib[0],
                       calib_cam_intrinsics=calib[1])
    state = make_state(cfg, seed=5)
    rng = np.random.default_rng(6)
    F = 7
    C, N = cfg.max_clones, cfg.num_cams
    O = C * N
    slot_idx = jnp.tile(jnp.arange(C, dtype=jnp.int32)[:, None],
                        (1, N)).reshape(O)
    cam_idx = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None, :],
                       (C, 1)).reshape(O)
    gobs = uh.GatheredObs(
        clone_slot=jnp.broadcast_to(slot_idx, (F, O)),
        cam=jnp.broadcast_to(cam_idx, (F, O)),
        uv=jnp.asarray(rng.normal(size=(F, O, 2)) * 40 + 300, jnp.float32),
        uvn=jnp.zeros((F, O, 2), jnp.float32),
        mask=jnp.asarray(rng.uniform(size=(F, O)) > 0.3),
    )
    p_f = jnp.asarray(rng.normal(size=(F, 3)) * 2 + np.array([0, 0, 5]),
                      jnp.float32)
    p_f_fej = p_f + jnp.asarray(rng.normal(size=(F, 3)) * 0.01, jnp.float32)

    ctx = uh.obs_context(state, cfg, slot_idx, cam_idx)
    ref = jax.vmap(
        lambda o, pf, pff: uh.feature_jacobian(state, cfg, o, pf, pff,
                                               ctx=ctx)
    )(gobs, p_f, p_f_fej)
    got = uh.feature_jacobian_batch(state, cfg, gobs, p_f, p_f_fej, ctx)
    names = ["H_x", "H_f", "res", "row_mask"]
    for name, a, b in zip(names, ref, got):
        np.testing.assert_allclose(
            np.array(a), np.array(b), rtol=2e-4, atol=2e-4,
            err_msg=f"{name} mismatch ({cam_model}, calib={calib}, "
                    f"N={num_cams})")


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
