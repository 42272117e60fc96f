"""Closed-loop coverage of every joint-update execution form.

Round-2 regression guard: the "spd" form (FilterConfig.joint_update_form)
shipped as the default while NaN-ing three landmark representations and
stereo on CPU — the per-rep closed loops only exercised the default form,
and the per-form unit tests only exercised well-conditioned covariance.
This module pins the full matrix: every form runs a closed loop on the rep
that broke (default profile), and the complete rep × form matrix runs under
the slow profile.  Reference update semantics: ov_msckf
StateHelper::EKFUpdate (StateHelper.cpp:116-197) — all forms must realize
the same filter.
"""

import jax
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import landmark_rep as lrep
from open_vins_tpu.models import runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.sim import simulator

FORMS = ["qr", "woodbury", "spd", "newton"]
ALL_REPS = [lrep.GLOBAL_3D, lrep.GLOBAL_FULL_INVERSE_DEPTH, lrep.ANCHORED_3D,
            lrep.ANCHORED_FULL_INVERSE_DEPTH,
            lrep.ANCHORED_MSCKF_INVERSE_DEPTH,
            lrep.ANCHORED_INVERSE_DEPTH_SINGLE]

PARAMS = simulator.SimParams(imu_rate=200.0, cam_rate=20.0, num_cams=1,
                             num_pts=32, map_size=1024, duration=4.0,
                             sigma_pix=1.0)
TRI = tri.TriangulationOptions()


def _closed_loop(rep, form, joint=True, seed=23):
    cfg = FilterConfig(max_clones=11, max_slam=8, num_cams=1,
                       max_msckf_in_update=25, feat_rep_slam=rep,
                       joint_vision_update=joint, joint_update_form=form)
    sim = simulator.build(PARAMS, seed=seed)
    run = runner.stage_run(sim, PARAMS)
    state, outs = jax.jit(
        lambda r: runner.run_filter(cfg, TRI, sim, PARAMS, r)
    )(run)
    ps = np.array(outs[1])
    gt = np.array(run.gt_p)[1:]
    rmse = float(np.sqrt(((ps - gt) ** 2).sum(1).mean()))
    finite = bool(np.isfinite(np.array(state.cov)).all())
    return rmse, finite, ps


class TestFormsOnRound2FailureRep:
    """Every execution form on ANCHORED_FULL_INVERSE_DEPTH — the rep that
    NaN'd under the round-2 'spd' default on this (CPU) platform."""

    REP = lrep.ANCHORED_FULL_INVERSE_DEPTH

    @pytest.mark.parametrize("form", FORMS)
    def test_form_closed_loop(self, form):
        rmse, finite, _ = _closed_loop(self.REP, form)
        assert finite, f"{form}: non-finite covariance"
        assert rmse < 0.10, f"{form}: RMSE {rmse:.3f} m"

    def test_sequential_closed_loop(self):
        rmse, finite, _ = _closed_loop(self.REP, "qr", joint=False)
        assert finite, "sequential: non-finite covariance"
        assert rmse < 0.10, f"sequential: RMSE {rmse:.3f} m"

    def test_qr_newton_agree(self):
        """qr and newton are both EXACT algebra (compress-then-solve vs
        push-through with an iterated inverse); PER-UPDATE equivalence is
        pinned tightly in tests/test_ekf.py.  Over a chaotic closed loop
        their f32 rounding profiles amplify: measured 4e-4 m pre-r05,
        1.05e-2 m after the r05 per-observation depth gate changed the
        active row set on this adversarial rep.  Gate at 2 cm: real
        algebra errors produce decimeter+ divergence here (and each
        form's own RMSE is gated separately above)."""
        _, _, ps_qr = _closed_loop(self.REP, "qr")
        _, _, ps_new = _closed_loop(self.REP, "newton")
        div_n = float(np.abs(ps_qr - ps_new).max())
        assert div_n < 2e-2, f"qr-vs-newton trajectory divergence {div_n:.4f} m"

    @pytest.mark.slow
    def test_forms_agree_approximate(self):
        """spd carries a designed 3e-5 relative prior jitter and woodbury a
        pivoted-LU rounding profile; over a chaotic closed loop those
        amplify to cm-scale TRAJECTORY divergence while the filter stays
        healthy (their RMSE is gated per-form above), so they only get a
        coarse same-update bound."""
        _, _, ps_qr = _closed_loop(self.REP, "qr")
        _, _, ps_spd = _closed_loop(self.REP, "spd")
        div = float(np.abs(ps_qr - ps_spd).max())
        assert div < 8e-2, f"qr-vs-spd trajectory divergence {div:.4f} m"

@pytest.mark.slow
class TestFullMatrix:
    """Complete rep × form matrix (slow profile)."""

    @pytest.mark.parametrize("rep", ALL_REPS)
    @pytest.mark.parametrize("form", FORMS)
    def test_rep_form(self, rep, form):
        rmse, finite, _ = _closed_loop(rep, form)
        assert finite, f"{rep}/{form}: non-finite covariance"
        assert rmse < 0.10, f"{rep}/{form}: RMSE {rmse:.3f} m"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
