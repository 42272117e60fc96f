"""Static error-state layout for the TPU filter.

The reference implements a generic typed-variable EKF where every state
element carries a covariance slot id (ov_core/src/types/Type.h:37-120,
ov_msckf/src/state/State.h:49-193).  The TPU-native equivalent is a
*compile-time* layout: the error state is one dense [D] vector with fixed
offsets computed from the filter configuration, and every state block always
exists — blocks that are not estimated simply keep zero covariance (zero
covariance -> zero Kalman gain -> mathematically identical to excluding the
block, but with one static shape for XLA).

Error-state ordering (all offsets static python ints):

    [ imu θ(3) p(3) v(3) bg(3) ba(3) |
      clone_0 θ(3) p(3) | ... | clone_{C-1} |
      slam_0 f(3) | ... | slam_{L-1} |
      calib_dt(1) |
      cam_0 ext θ(3) p(3) | ... |
      cam_0 intr ζ(8) | ... ]
"""

from __future__ import annotations

from typing import NamedTuple


class FilterConfig(NamedTuple):
    """Static filter configuration (hashable; safe as a jit static arg).

    Mirrors the knobs of ov_msckf StateOptions (StateOptions.h:35-119) that
    shape the state, plus the fixed-capacity caps the TPU build needs.
    """

    max_clones: int = 11
    max_slam: int = 25
    num_cams: int = 1
    # feature pipeline caps (static shapes)
    max_msckf_in_update: int = 40
    max_obs_per_feature: int = 12  # >= max_clones * cams used per feature
    # calibration switches (Jacobian gating only; blocks always allocated)
    calib_cam_timeoffset: bool = False
    calib_cam_extrinsics: bool = False
    calib_cam_intrinsics: bool = False
    calib_imu_intrinsics: bool = False  # Dw/Da (+ gyro frame, KALIBR model)
    calib_imu_g_sensitivity: bool = False  # Tg
    imu_model: str = "kalibr"  # "kalibr" | "rpng" (StateOptions::ImuModel,
    # StateOptions.h:62-65): kalibr = lower-triangular Dw/Da + estimated
    # R_GYROtoIMU; rpng = upper-triangular Dw/Da + estimated R_ACCtoIMU.
    # The thw error-state slot holds whichever rotation the model estimates.
    # estimator behavior
    integration: str = "rk4"  # "rk4" | "discrete" | "analytical" (ACI²
    # Ξ-series closed form, Propagator.cpp:588-829) — StateOptions parity
    use_fej: bool = True
    use_zupt: bool = False  # zero-velocity updates (UpdaterZeroVelocity)
    feat_rep_msckf: str = "GLOBAL_3D"  # parsed for parity; the MSCKF path
    # nullspace-projects H_f, making all 3-dof parameterizations equivalent
    feat_rep_slam: str = "GLOBAL_3D"  # | GLOBAL_FULL_INVERSE_DEPTH |
    # ANCHORED_3D | ANCHORED_FULL_INVERSE_DEPTH |
    # ANCHORED_MSCKF_INVERSE_DEPTH | ANCHORED_INVERSE_DEPTH_SINGLE
    # (LandmarkRepresentation.h:38-45 parity)
    feat_rep_aruco: str = "GLOBAL_3D"
    dt_slam_delay: float = 0.0  # seconds before first SLAM delayed init
    # (VioManagerOptions dt_slam_delay, VioManager.cpp:442)
    slam_stack_clones: int = 3  # clone slots gathered per landmark update
    # (newest-first).  Measurements are consumed every frame (used or
    # chi2-rejected, UpdaterSLAM to_delete parity), so unconsumed rows only
    # exist at the few newest clones — gathering all C slots is ~90% masked
    # padding and dominates the SLAM update cost on TPU.  W=3 reproduces
    # the full-window results exactly on closed-loop sims (W=2 measurably
    # drops rows); 0 = gather the full window (exact reference stacking).
    joint_vision_update: bool = True  # ONE EKF update per frame: the MSCKF,
    # SLAM-landmark, and delayed-init-leftover systems all linearize at the
    # pre-update state, are whitened to unit noise, jointly compressed on
    # the SLAM column support, and applied together.  The reference applies
    # them sequentially (VioManager.cpp:502-548) — a joint update of
    # independent measurement sets is the textbook simultaneous EKF update;
    # the difference is the second-order relinearization between the
    # sub-updates.  Closed-loop NEES/RMSE parity is pinned by
    # tests/test_e2e_sim.py + tests/test_slam.py (joint vs sequential).
    # False restores the reference-exact sequential ordering.
    gauge_deflation: bool = False  # EXPERIMENTAL, newton form only:
    # project the gauge-direction information out of the grammian
    # (core/ekf.deflate_gauge_info — the OC-EKF projection on the
    # information form).  Status r05: the basis IS verified against live
    # stacks (‖H·N‖/‖H‖ ≈ 3e-8, gauge_null_basis_support) and the
    # projection is exact on synthetic nullspaces, but it does NOT cure
    # the newton long-horizon yaw leak (yaw σ still shrank; an MH_05 A/B
    # additionally measured worse rmse on that chaotic realization) — the
    # leak is not gauge-direction information in G; see the
    # joint_update_form note.  Kept off; the qr default needs no
    # deflation (no HᵀH is ever formed).
    joint_update_form: str = "qr"  # how the joint vision system applies:
    # "qr" (DEFAULT since r05) = orthogonal compression on the support
    # columns + one-sweep chol(S) update — no explicit HᵀH grammian.
    # WHY the grammian forms are no longer the default — MEASURED on a
    # 95 s MH_05 replay (seed 1): with "newton" the unobservable yaw's σ
    # SHRINKS 1.15°→0.56° (it must be monotone non-decreasing), pos NEES
    # 209, RMSE 0.69 m; sequential NEES 20 / 0.21 m and qr NEES 18.6 /
    # 0.20 m on the same data.  newton_iters 14 vs 22 bit-identical (so
    # not solve convergence); "spd" leaks too (NEES 33); deflating the
    # VERIFIED gauge nullspace out of G/g (gauge_deflation, ‖H·N‖/‖H‖
    # measured 3e-8) does NOT cure it — so the leak is not simple
    # gauge-direction information injection.  Leading hypothesis: the
    # info-form downdate P_cols·(A⁻¹G)·P_colsᵀ evaluates the yaw-variance
    # quadratic form with FIRST-order f32 error (general bilinear
    # product), while qr's Gram-form downdate Y₁ᵀY₁ squares a computed
    # vector — errors enter the variance only at second order.  Until the
    # mechanism is fully pinned, the consistent form is the default;
    # tests/test_long_consistency.py gates it (yaw-σ monotonicity).
    # "newton" = push-through (Woodbury) with the k×k inverse by
    # Hotelling–Bodewig iteration (core/ekf.kalman_update_math_newton) —
    # EXACT information-form algebra (A = I + G·P_ss has spectrum ≥ 1, no
    # jitter anywhere) realized as ~2·iters batched matmuls with ZERO
    # factorization custom calls.  MEASURED on TPU v5e at the operating
    # point (k=231): 1777 fps single-stream vs spd's 1504 (+18%), and the
    # decisive win is the ensemble axis — TPU factorization custom calls
    # serialize over a vmapped batch (91 µs/frame at B=1 → 1010 µs at
    # B=8), while Newton matmuls ride the MXU at near-zero marginal batch
    # cost (B=8 aggregate 2168 → 2715 fps from this change alone).
    # Equivalence pinned by tests/test_ekf.py (healthy / PSD-singular /
    # f32-residue covariances, conditioning swept to λmax=1e4) + the
    # closed-loop rep × form matrix in tests/test_update_forms.py.
    # "spd" = symmetric push-through: one grammian + two SPD Choleskys +
    # ONE triangular solve (three custom calls; carries a designed
    # conservative 3e-5 relative prior jitter in the gain operator).
    # "qr" = CholeskyQR2-compress then the standard S-Cholesky update
    # (five k×k custom calls).
    # "woodbury" = push-through via ONE k×k LU (kalman_update_math_info) —
    # measured 466 fps on TPU: the pivoted-getrf custom call serializes its
    # row interchanges; it wins only where LU is cheap (CPU) or for small k
    # (the ZUPT uses the same identity at k=9).
    # Only read when joint_vision_update.
    newton_joseph: bool = False  # EXPERIMENTAL newton form: JOSEPH-FORM
    # covariance (P⁺ = (I−KH)P(I−KH)ᵀ + KKᵀ via support-structured
    # matmuls, still zero custom calls); stationary w.r.t. gain error —
    # the r05 candidate fix for the newton long-horizon yaw leak.
    # Status r05: unit-exact vs the plain downdate on healthy systems
    # (8e-7 rel, tests/test_ekf.py), but in closed loop the quadratic
    # terms use the UNPOLISHED inverse X and a small X error compounds
    # (covariance inflation → ‖A‖ beyond iters coverage → permanent
    # no-op updates → drift; measured on 12 s MH_05).  Known fix if
    # pursued: polish M2 = A⁻¹G (and A⁻ᵀ for KKᵀ) with the same
    # iterative refinement the solve uses (~2× matmul volume).  Keep
    # off; "qr" is the consistent default.
    newton_iters: int = 22  # fixed Hotelling-Bodewig sweeps of the newton
    # form (covers sigma = ||A||_F <= 2^iters/16 before the while-loop
    # polish takes over; see core/ekf.kalman_update_math_newton's
    # convergence policy).  The adaptive polish + residual no-op gate make
    # lower values SAFE (an under-converged inverse self-corrects or
    # no-ops visibly) — tune down for latency once the operating point's
    # sigma range is known; 22 is the conservative default.
    fast_compress: bool = False  # OPT-IN normal-eq compression instead of
    # tall QR.  CAVEAT: in f32 the required Cholesky jitter (~eps*||H^T H||)
    # injects spurious information on weakly-constrained dims and corrupts
    # long-horizon consistency (divergence after ~70 frames observed on
    # SLAM configs) — keep False unless running f64 or short horizons.
    cam_model: str = "radtan"
    # noise (continuous-time densities, NoiseManager parity)
    sigma_w: float = 1.6968e-4
    sigma_wb: float = 1.9393e-5
    sigma_a: float = 2.0e-3
    sigma_ab: float = 3.0e-3
    sigma_pix: float = 1.0
    gravity_mag: float = 9.81
    chi2_multiplier: float = 1.0
    # per-updater measurement noise / gating (UpdaterOptions per updater:
    # up_msckf_*, up_slam_*, up_aruco_* in the reference estimator config)
    sigma_pix_slam: float = 1.0
    chi2_multiplier_slam: float = 1.0
    sigma_pix_aruco: float = 1.0
    chi2_multiplier_aruco: float = 1.0
    # aruco id space: feature ids <= 4*num_aruco_tags are tag corners
    # (TrackAruco's "featid = 4*tag+corner" contract; the KLT/descriptor
    # trackers allocate natural ids above this, TrackBase currid init).
    # Aruco landmarks update with sigma_pix_aruco / chi2_multiplier_aruco
    # and get SLAM-promotion priority (the reference always promotes them).
    num_aruco_tags: int = 0
    # ZUPT options (UpdaterZeroVelocity ctor args / zupt_* yaml keys)
    zupt_noise_multiplier: float = 10.0
    zupt_max_velocity: float = 0.25
    zupt_max_disparity: float = 0.5
    zupt_chi2_multiplier: float = 1.0  # <= 0 disables the chi2 gate
    zupt_only_at_beginning: bool = False
    # two-clone explicit zero-motion variant (UpdaterZeroVelocity.cpp:279-324,
    # explicitly_enforce_zero_motion — a hard-coded bool in the reference,
    # surfaced as configuration here)
    zupt_explicit_motion: bool = False

    # ---- layout offsets -------------------------------------------------
    @property
    def imu_off(self) -> int:
        return 0

    @property
    def imu_dim(self) -> int:
        return 15

    @property
    def th_off(self) -> int:
        return 0

    @property
    def p_off(self) -> int:
        return 3

    @property
    def v_off(self) -> int:
        return 6

    @property
    def bg_off(self) -> int:
        return 9

    @property
    def ba_off(self) -> int:
        return 12

    @property
    def clones_off(self) -> int:
        return 15

    def clone_off(self, slot: int) -> int:
        return self.clones_off + 6 * slot

    @property
    def slam_off(self) -> int:
        return self.clones_off + 6 * self.max_clones

    def slam_slot_off(self, slot: int) -> int:
        return self.slam_off + 3 * slot

    @property
    def calib_dt_off(self) -> int:
        return self.slam_off + 3 * self.max_slam

    @property
    def calib_ext_off(self) -> int:
        return self.calib_dt_off + 1

    def cam_ext_off(self, cam: int) -> int:
        return self.calib_ext_off + 6 * cam

    @property
    def calib_intr_off(self) -> int:
        return self.calib_ext_off + 6 * self.num_cams

    def cam_intr_off(self, cam: int) -> int:
        return self.calib_intr_off + 8 * cam

    # IMU intrinsic blocks (KALIBR model, StateOptions.h:35-119 +
    # Propagator.cpp:860-963): Dw (6, lower-tri gyro scale/skew), Da (6),
    # Tg (9, gravity sensitivity), th_wtoI (3, gyro-frame rotation)
    @property
    def imu_dw_off(self) -> int:
        return self.calib_intr_off + 8 * self.num_cams

    @property
    def imu_da_off(self) -> int:
        return self.imu_dw_off + 6

    @property
    def imu_tg_off(self) -> int:
        return self.imu_da_off + 6

    @property
    def imu_thw_off(self) -> int:
        return self.imu_tg_off + 9

    @property
    def imu_intr_dim(self) -> int:
        return 24

    @property
    def state_dim(self) -> int:
        return self.imu_thw_off + 3

    # ---- static measurement column support -------------------------------
    # Visual measurement Jacobians never touch the IMU or IMU-intrinsic
    # blocks (feature rows live on clones + camera calib; SLAM rows add the
    # landmark block) — the update still corrects those states through the
    # P·Hᵀ cross-covariance.  Restricting compression and the S-solve to the
    # static support columns shrinks the per-update problem from D to ~D/3
    # with exactly the same algebra (the dropped columns are exact zeros).

    @property
    def cam_meas_support_ranges(self) -> tuple:
        """(start, stop) ranges of columns a camera-feature row can touch:
        clone block + camera extrinsic/intrinsic calib (+ dt)."""
        return (
            (self.clones_off, self.clones_off + 6 * self.max_clones),
            (self.calib_dt_off, self.calib_intr_off + 8 * self.num_cams),
        )

    @property
    def slam_meas_support_ranges(self) -> tuple:
        """Support of SLAM-landmark rows: clones + landmarks + cam calib."""
        return (
            (self.clones_off, self.calib_intr_off + 8 * self.num_cams),
        )
