// Native EuRoC ASL dataset loader: csv parsing + image decode on the host.
//
// The TPU build's equivalent of the reference's dataset ingestion path
// (rosbag decode in ros1_serial_msckf.cpp + DatasetReader csv loading,
// ov_core/src/utils/dataset_reader.h): reads mav0/imu0/data.csv,
// mav0/camN/data.csv and decodes grayscale images with OpenCV, exposing
// zero-copy buffers to Python via a C API (ctypes).

#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct EurocData {
  std::vector<double> imu_t;
  std::vector<double> imu_w;  // 3N
  std::vector<double> imu_a;  // 3N
  std::vector<std::vector<double>> cam_t;           // per cam
  std::vector<std::vector<std::string>> cam_files;  // per cam
  std::string root;
  cv::Mat last_img;
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

void euroc_close(void* h) { delete static_cast<EurocData*>(h); }

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
  if (cam >= static_cast<int>(d->cam_files.size())) return 0;
  if (idx >= static_cast<int>(d->cam_files[cam].size())) return 0;
  std::string path = d->root + "/mav0/cam" + std::to_string(cam) +
                     "/data/" + d->cam_files[cam][idx];
  cv::Mat img = cv::imread(path, cv::IMREAD_GRAYSCALE);
  if (img.empty()) return 0;
  if (img.rows > max_h || img.cols > max_w) return 0;
  cv::Mat f32;
  img.convertTo(f32, CV_32F, 1.0 / 255.0);
  for (int r = 0; r < f32.rows; r++) {
    std::memcpy(out + r * f32.cols, f32.ptr<float>(r),
                f32.cols * sizeof(float));
  }
  *out_h = f32.rows;
  *out_w = f32.cols;
  return 1;
}

}  // extern "C"
