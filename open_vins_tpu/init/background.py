"""Background initialization with camera catch-up replay.

Capability parity with VioManager::try_to_initialize
(/root/reference/ov_msckf/src/core/VioManagerHelper.cpp:78-188): the
initialization attempt runs on a detached worker thread so the camera
stream is never blocked; camera timestamps arriving while the attempt is
in flight are queued, and once an attempt succeeds the filter state is
moved forward over the queued times with propagate_and_clone +
marginalize (clone_rate-spaced, VioManagerHelper.cpp:156-163) before
normal filtering resumes.

The worker runs host-side python/numpy plus jitted JAX calls (thread-safe);
the main thread keeps the tracker warm exactly like the reference's
feed path.
"""

from __future__ import annotations

import threading

import jax.numpy as jnp

from open_vins_tpu.models import manager
from open_vins_tpu.models.propagator import ImuWindow


class BackgroundInitializer:
    """Detached-thread initialization driver.

    Usage per camera frame (pre-init):
        done = bg.try_to_initialize(t_cam, attempt_fn)
    where attempt_fn() -> (kind, res) is a closure over a snapshot of the
    current IMU/track history (e.g. router.try_initialize).  Returns True
    once a previous attempt has succeeded; while an attempt is in flight
    the frame time is queued for catch-up.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._running = False
        self._queue = []  # camera timestamps seen while an attempt runs
        self.result = None  # (kind, res, t_attempt)

    def try_to_initialize(self, t_cam: float, attempt_fn) -> bool:
        with self._lock:
            if self._running:
                self._queue.append(float(t_cam))
                return False
            if self.result is not None:
                return True
            if attempt_fn is None:  # probe only — nothing to launch
                return False
            self._running = True

        def worker():
            try:
                kind, res = attempt_fn()
            except Exception:
                kind, res = "none", None
            with self._lock:
                if kind != "none":
                    self.result = (kind, res, float(t_cam))
                else:
                    self._queue.clear()
                self._running = False

        threading.Thread(target=worker, daemon=True).start()
        return False

    @property
    def busy(self) -> bool:
        with self._lock:
            return self._running

    def join(self, timeout=None):
        """Block until no attempt is in flight (single-threaded replay mode,
        the reference's use_multi_threading_subs=false join)."""
        import time
        t0 = time.time()
        while True:
            with self._lock:
                if not self._running:
                    return
            if timeout is not None and time.time() - t0 > timeout:
                return
            time.sleep(0.002)

    def queued_times(self, t_init: float):
        with self._lock:
            ts = [t for t in self._queue if t > t_init]
            self._queue.clear()
        return ts


def catch_up(state, cfg, queued_ts, make_window, imu_rate: float):
    """Move the initialized state forward over queued camera times.

    clone_rate-spaced propagate_and_clone (VioManagerHelper.cpp:156-163):
    when many frames queued, only every (len/max_clones + 1)-th time is
    cloned so the window is not flooded with stale clones.
    `make_window(t0, t1, K) -> (n, t[K], w[K,3], a[K,3])` is the native
    SensorHub packer (padded rows are dt=0 no-ops); each replay window is
    sized from its own time span since skipped frames widen it.
    """
    if not queued_ts:
        return state
    clone_rate = len(queued_ts) // max(cfg.max_clones, 1) + 1
    t_prev = float(state.t)
    for t in queued_ts[::clone_rate]:
        if t <= t_prev:
            continue
        K = int((t - t_prev) * imu_rate) + 8
        n, wt, ww, wa = make_window(t_prev, t, K)
        if n <= 0:
            continue
        win = ImuWindow(t=jnp.asarray(wt, jnp.float32),
                        w=jnp.asarray(ww, jnp.float32),
                        a=jnp.asarray(wa, jnp.float32))
        state = manager.propagate_and_clone(state, cfg, win, t)
        t_prev = t
    return state
