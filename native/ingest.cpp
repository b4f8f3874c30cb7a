// Native ingestion runtime: threaded dataset reader + prefetcher.
//
// TPU-native replacement for the host-side I/O machinery the reference
// builds out of libcluon + blocking cv::imread in the replay loops
// (/root/reference/src/euroc-state-estimation.cpp:53-94,
//  src/cfsd-state-estimation.cpp:99-132): a C++ worker thread walks the
// dataset (EuRoC mav0 layout), decodes grayscale stereo pairs, and keeps a
// bounded ring of ready frames + their IMU spans so the Python/JAX side
// never blocks on disk or JPEG/PNG decode between device dispatches.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (links OpenCV imgcodecs for image decode only —
// all per-frame compute stays on the TPU.)

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

namespace {

struct ImuSample {
  int64_t ts;
  double gyr[3];
  double acc[3];
};

struct Frame {
  int64_t ts;
  std::vector<uint8_t> left;   // H*W grayscale
  std::vector<uint8_t> right;
  int width = 0, height = 0;
  std::vector<ImuSample> imu;  // samples since the previous frame
};

struct CsvRow {
  int64_t ts;
  std::string rest;
};

static std::vector<CsvRow> read_csv(const std::string& path) {
  std::vector<CsvRow> rows;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    auto comma = line.find(',');
    if (comma == std::string::npos) continue;
    CsvRow r;
    r.ts = std::stoll(line.substr(0, comma));
    r.rest = line.substr(comma + 1);
    // trim trailing whitespace/CR
    while (!r.rest.empty() &&
           (r.rest.back() == '\r' || r.rest.back() == '\n' || r.rest.back() == ' '))
      r.rest.pop_back();
    rows.push_back(std::move(r));
  }
  return rows;
}

class EurocLoader {
 public:
  EurocLoader(const std::string& mav0, int speed_up, int max_frames,
              int queue_cap)
      : root_(mav0), queue_cap_(queue_cap) {
    cam0_ = read_csv(root_ + "/cam0/data.csv");
    cam1_ = read_csv(root_ + "/cam1/data.csv");
    imu_ = read_csv(root_ + "/imu0/data.csv");
    speed_up_ = speed_up < 1 ? 1 : speed_up;
    max_frames_ = max_frames;
    worker_ = std::thread([this] { run(); });
  }

  ~EurocLoader() {
    stop_.store(true);
    cv_space_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  // Blocks until a frame is ready; returns false at end of stream.
  bool next(Frame& out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] { return !queue_.empty() || done_; });
    if (queue_.empty()) return false;
    out = std::move(queue_.front());
    queue_.pop_front();
    cv_space_.notify_one();
    return true;
  }

 private:
  void run() {
    size_t imu_i = 0;
    int produced = 0;
    for (size_t k = 0; k < cam0_.size() && k < cam1_.size();
         k += (size_t)speed_up_) {
      if (stop_.load()) break;
      if (max_frames_ > 0 && produced >= max_frames_) break;
      Frame fr;
      fr.ts = cam0_[k].ts;
      while (imu_i < imu_.size() && imu_[imu_i].ts <= fr.ts) {
        ImuSample s;
        s.ts = imu_[imu_i].ts;
        std::stringstream ss(imu_[imu_i].rest);
        std::string tok;
        double vals[6];
        for (int j = 0; j < 6 && std::getline(ss, tok, ','); j++)
          vals[j] = std::stod(tok);
        std::memcpy(s.gyr, vals, 3 * sizeof(double));
        std::memcpy(s.acc, vals + 3, 3 * sizeof(double));
        fr.imu.push_back(s);
        imu_i++;
      }
      cv::Mat l = cv::imread(root_ + "/cam0/data/" + cam0_[k].rest,
                             cv::IMREAD_GRAYSCALE);
      cv::Mat r = cv::imread(root_ + "/cam1/data/" + cam1_[k].rest,
                             cv::IMREAD_GRAYSCALE);
      if (l.empty() || r.empty()) continue;
      fr.width = l.cols;
      fr.height = l.rows;
      fr.left.assign(l.datastart, l.dataend);
      fr.right.assign(r.datastart, r.dataend);

      std::unique_lock<std::mutex> lk(mu_);
      cv_space_.wait(lk, [this] {
        return (int)queue_.size() < queue_cap_ || stop_.load();
      });
      if (stop_.load()) break;
      queue_.push_back(std::move(fr));
      produced++;
      cv_data_.notify_one();
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_data_.notify_all();
  }

  std::string root_;
  std::vector<CsvRow> cam0_, cam1_, imu_;
  int speed_up_ = 1;
  int max_frames_ = -1;
  int queue_cap_;
  std::deque<Frame> queue_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::thread worker_;
  std::atomic<bool> stop_{false};
  bool done_ = false;
};

}  // namespace

extern "C" {

void* euroc_open(const char* mav0, int speed_up, int max_frames,
                 int queue_cap) {
  try {
    return new EurocLoader(mav0, speed_up, max_frames, queue_cap);
  } catch (...) {
    return nullptr;
  }
}

void euroc_close(void* h) { delete static_cast<EurocLoader*>(h); }

// Returns 1 on success and fills the output buffers; 0 at end of stream.
// imgs must hold height*width bytes each; imu holds up to imu_cap samples of
// 7 doubles (ts_ns as double, gyr xyz, acc xyz).
int euroc_next(void* h, int64_t* ts, uint8_t* left, uint8_t* right,
               int* width, int* height, int img_cap, double* imu,
               int imu_cap, int* imu_count) {
  auto* loader = static_cast<EurocLoader*>(h);
  Frame fr;
  if (!loader->next(fr)) return 0;
  *ts = fr.ts;
  *width = fr.width;
  *height = fr.height;
  int n = fr.width * fr.height;
  if (n > img_cap) return -1;
  std::memcpy(left, fr.left.data(), n);
  std::memcpy(right, fr.right.data(), n);
  int m = (int)fr.imu.size();
  if (m > imu_cap) m = imu_cap;
  for (int i = 0; i < m; i++) {
    imu[i * 7 + 0] = (double)fr.imu[i].ts;
    std::memcpy(imu + i * 7 + 1, fr.imu[i].gyr, 3 * sizeof(double));
    std::memcpy(imu + i * 7 + 4, fr.imu[i].acc, 3 * sizeof(double));
  }
  *imu_count = m;
  return 1;
}

}  // extern "C"
