// Native EuRoC ASL dataset loader: csv parsing + image decode on the host.
//
// The TPU build's equivalent of the reference's dataset ingestion path
// (rosbag decode in ros1_serial_msckf.cpp + DatasetReader csv loading,
// ov_core/src/utils/dataset_reader.h): reads mav0/imu0/data.csv,
// mav0/camN/data.csv and decodes grayscale images with OpenCV, exposing
// zero-copy buffers to Python via a C API (ctypes).

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct Prefetcher;

struct EurocData {
  std::vector<double> imu_t;
  std::vector<double> imu_w;  // 3N
  std::vector<double> imu_a;  // 3N
  std::vector<std::vector<double>> cam_t;           // per cam
  std::vector<std::vector<std::string>> cam_files;  // per cam
  std::string root;
  cv::Mat last_img;
  Prefetcher* pf = nullptr;
};

bool parse_csv_line(const std::string& line, std::vector<double>* vals,
                    std::string* tail) {
  if (line.empty() || line[0] == '#') return false;
  std::stringstream ss(line);
  std::string item;
  vals->clear();
  if (tail) tail->clear();
  int col = 0;
  while (std::getline(ss, item, ',')) {
    try {
      vals->push_back(std::stod(item));
    } catch (...) {
      if (tail && col > 0) {
        *tail = item;
        // trim whitespace/newline
        while (!tail->empty() &&
               (tail->back() == '\r' || tail->back() == '\n' ||
                tail->back() == ' '))
          tail->pop_back();
        return true;
      }
      return false;
    }
    col++;
  }
  return !vals->empty();
}

// Decode one frame of one camera to CV_32F grayscale in [0,1].
bool decode_frame(EurocData* d, int cam, int idx, cv::Mat* out) {
  if (cam >= static_cast<int>(d->cam_files.size())) return false;
  if (idx < 0 || idx >= static_cast<int>(d->cam_files[cam].size()))
    return false;
  std::string path = d->root + "/mav0/cam" + std::to_string(cam) + "/data/" +
                     d->cam_files[cam][idx];
  cv::Mat img = cv::imread(path, cv::IMREAD_GRAYSCALE);
  if (img.empty()) return false;
  img.convertTo(*out, CV_32F, 1.0 / 255.0);
  return true;
}

bool copy_out(const cv::Mat& f32, float* out, int max_h, int max_w,
              int* out_h, int* out_w) {
  if (f32.rows > max_h || f32.cols > max_w) return false;
  for (int r = 0; r < f32.rows; r++) {
    std::memcpy(out + r * f32.cols, f32.ptr<float>(r),
                f32.cols * sizeof(float));
  }
  *out_h = f32.rows;
  *out_w = f32.cols;
  return true;
}

// Decode-ahead worker: one background thread decodes frames in index order
// into a bounded ring (all cameras of one index per slot), overlapping the
// host's PNG decode with device compute — the TPU-build analog of the
// reference's threaded camera subscription/queueing runtime
// (ROS1Visualizer.cpp:451-487 `use_multi_threading_subs` + the sorted
// camera_queue of ros1_serial_msckf.cpp).
struct Prefetcher {
  EurocData* d = nullptr;
  int num_cams = 1;
  int depth = 4;
  int count = 0;        // frames available (min over cams)
  int next_decode = 0;  // next index the worker will decode
  int next_pushed = 0;  // first index NOT yet pushed to `ready`
  bool stop = false;
  struct Slot {
    int idx;
    std::vector<cv::Mat> imgs;  // per cam; empty() = decode failed
  };
  std::deque<Slot> ready;  // ascending idx
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
};

void prefetch_worker(Prefetcher* p) {
  while (true) {
    int idx;
    {
      std::unique_lock<std::mutex> lk(p->mu);
      p->cv_space.wait(lk, [&] {
        return p->stop || static_cast<int>(p->ready.size()) < p->depth;
      });
      if (p->stop || p->next_decode >= p->count) return;
      idx = p->next_decode++;
    }
    Prefetcher::Slot s;
    s.idx = idx;
    s.imgs.resize(p->num_cams);
    for (int c = 0; c < p->num_cams; c++) {
      if (!decode_frame(p->d, c, idx, &s.imgs[c])) {
        s.imgs.clear();  // mark the whole slot failed
        break;
      }
    }
    {
      std::lock_guard<std::mutex> lk(p->mu);
      p->ready.push_back(std::move(s));
      p->next_pushed = idx + 1;
    }
    p->cv_ready.notify_all();
  }
}

void prefetch_destroy(EurocData* d) {
  Prefetcher* p = d->pf;
  if (!p) return;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
  d->pf = nullptr;
}

}  // namespace

extern "C" {

void* euroc_open(const char* root, int num_cams) {
  auto* d = new EurocData();
  d->root = root;
  // imu
  std::ifstream f(std::string(root) + "/mav0/imu0/data.csv");
  if (!f.good()) {
    delete d;
    return nullptr;
  }
  std::string line;
  std::vector<double> vals;
  while (std::getline(f, line)) {
    if (!parse_csv_line(line, &vals, nullptr) || vals.size() < 7) continue;
    d->imu_t.push_back(vals[0] * 1e-9);
    for (int i = 0; i < 3; i++) d->imu_w.push_back(vals[1 + i]);
    for (int i = 0; i < 3; i++) d->imu_a.push_back(vals[4 + i]);
  }
  // cameras
  d->cam_t.resize(num_cams);
  d->cam_files.resize(num_cams);
  for (int c = 0; c < num_cams; c++) {
    std::ifstream fc(std::string(root) + "/mav0/cam" + std::to_string(c) +
                     "/data.csv");
    while (std::getline(fc, line)) {
      if (line.empty() || line[0] == '#') continue;
      auto comma = line.find(',');
      if (comma == std::string::npos) continue;
      double tns;
      try {
        tns = std::stod(line.substr(0, comma));
      } catch (...) {
        continue;
      }
      std::string fname = line.substr(comma + 1);
      while (!fname.empty() &&
             (fname.back() == '\r' || fname.back() == '\n' ||
              fname.back() == ' '))
        fname.pop_back();
      d->cam_t[c].push_back(tns * 1e-9);
      d->cam_files[c].push_back(fname);
    }
  }
  return d;
}

void euroc_close(void* h) {
  auto* d = static_cast<EurocData*>(h);
  prefetch_destroy(d);
  delete d;
}

int euroc_imu_count(void* h) {
  return static_cast<int>(static_cast<EurocData*>(h)->imu_t.size());
}

void euroc_imu_data(void* h, double* t, double* w, double* a) {
  auto* d = static_cast<EurocData*>(h);
  std::memcpy(t, d->imu_t.data(), d->imu_t.size() * sizeof(double));
  std::memcpy(w, d->imu_w.data(), d->imu_w.size() * sizeof(double));
  std::memcpy(a, d->imu_a.data(), d->imu_a.size() * sizeof(double));
}

int euroc_cam_count(void* h, int cam) {
  auto* d = static_cast<EurocData*>(h);
  if (cam >= static_cast<int>(d->cam_t.size())) return 0;
  return static_cast<int>(d->cam_t[cam].size());
}

void euroc_cam_times(void* h, int cam, double* t) {
  auto* d = static_cast<EurocData*>(h);
  std::memcpy(t, d->cam_t[cam].data(), d->cam_t[cam].size() * sizeof(double));
}

// Decode frame `idx` of camera `cam` to grayscale float32 [h*w] in [0,1].
// Returns 1 on success; writes dimensions to out_h/out_w.  The caller
// provides a buffer of at least max_h*max_w floats.
int euroc_load_image(void* h, int cam, int idx, float* out, int max_h,
                     int max_w, int* out_h, int* out_w) {
  auto* d = static_cast<EurocData*>(h);
  cv::Mat f32;
  if (!decode_frame(d, cam, idx, &f32)) return 0;
  return copy_out(f32, out, max_h, max_w, out_h, out_w) ? 1 : 0;
}

// Start the decode-ahead worker: decodes frames [start_idx, count) of the
// first `num_cams` cameras in order, `depth` slots ahead of the consumer.
int euroc_prefetch_start(void* h, int num_cams, int start_idx, int depth) {
  auto* d = static_cast<EurocData*>(h);
  prefetch_destroy(d);
  if (num_cams < 1 ||
      num_cams > static_cast<int>(d->cam_files.size()) || depth < 1)
    return 0;
  auto* p = new Prefetcher();
  p->d = d;
  p->num_cams = num_cams;
  p->depth = depth;
  p->count = static_cast<int>(d->cam_files[0].size());
  for (int c = 1; c < num_cams; c++)
    p->count = std::min(p->count, static_cast<int>(d->cam_files[c].size()));
  p->next_decode = p->next_pushed = std::max(0, start_idx);
  d->pf = p;
  p->worker = std::thread(prefetch_worker, p);
  return 1;
}

// Fetch camera `cam` of frame `idx` — blocks until the worker has decoded
// it.  Consumption must be (weakly) in index order; fetching the LAST
// camera of an index releases its slot.  Falls back to a synchronous
// decode if the slot was already released (re-read) or prefetch is off.
int euroc_prefetch_get(void* h, int cam, int idx, float* out, int max_h,
                       int max_w, int* out_h, int* out_w) {
  auto* d = static_cast<EurocData*>(h);
  Prefetcher* p = d->pf;
  if (!p || idx >= p->count)
    return euroc_load_image(h, cam, idx, out, max_h, max_w, out_h, out_w);
  {
    std::unique_lock<std::mutex> lk(p->mu);
    // Wait for slot `idx`, dropping slots the consumer skipped past on
    // EVERY wake: with a full ring of stale slots the worker is blocked
    // on space, so the drop must happen inside the wait loop or the two
    // deadlock.
    while (true) {
      bool dropped = false;
      while (!p->ready.empty() && p->ready.front().idx < idx) {
        p->ready.pop_front();
        dropped = true;
      }
      if (dropped) p->cv_space.notify_all();
      if (p->stop || p->next_pushed > idx) break;
      p->cv_ready.wait(lk);
    }
    if (!p->stop && !p->ready.empty() && p->ready.front().idx == idx) {
      Prefetcher::Slot& s = p->ready.front();
      if (s.imgs.empty() || cam >= static_cast<int>(s.imgs.size()))
        return 0;  // decode failed in the worker
      cv::Mat f32 = s.imgs[cam];
      bool last = (cam == p->num_cams - 1);
      if (last) {
        p->ready.pop_front();
        p->cv_space.notify_all();
      }
      lk.unlock();
      return copy_out(f32, out, max_h, max_w, out_h, out_w) ? 1 : 0;
    }
  }
  // slot already released (or prefetcher stopping): synchronous fallback
  return euroc_load_image(h, cam, idx, out, max_h, max_w, out_h, out_w);
}

void euroc_prefetch_stop(void* h) {
  prefetch_destroy(static_cast<EurocData*>(h));
}

}  // extern "C"
