// Native data-loading runtime: threaded velodyne .bin reader + prefetch ring.
//
// Replaces the reference's torch DataLoader worker processes (main.py
// num_workers=8 CPU workers doing IO + numpy projection) with an in-process
// C++ thread pool: scans are read (mmap-free, plain fread — files are small)
// into fixed-capacity float32 buffers, padded/truncated to max_points, with a
// validity count. Python consumes batches through ctypes (zero-copy into
// numpy) and ships them to the TPU; the projection itself runs on-device
// (ops.lidar), so the host loop only moves bytes.
//
// Build: cc -O3 -shared -fPIC -o liblidar_io.so lidar_io.cpp -lpthread
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Scan {
  std::vector<float> xyz;   // max_points * 3, padded with zeros
  std::vector<float> rem;   // max_points
  int32_t n_valid = 0;
  int64_t index = -1;
};

struct Loader {
  std::vector<std::string> paths;
  int max_points;
  int n_threads;

  std::vector<std::thread> workers;
  std::queue<int64_t> work;          // indices to read
  std::queue<Scan> ready;            // completed scans
  std::mutex mu;
  std::condition_variable cv_work, cv_ready;
  std::atomic<bool> stop{false};
  size_t ready_cap;

  Loader(std::vector<std::string> p, int mp, int nt, size_t cap)
      : paths(std::move(p)), max_points(mp), n_threads(nt), ready_cap(cap) {
    for (int t = 0; t < n_threads; ++t)
      workers.emplace_back([this] { this->worker(); });
  }

  ~Loader() {
    stop.store(true);
    cv_work.notify_all();
    cv_ready.notify_all();
    for (auto& w : workers) w.join();
  }

  void enqueue(int64_t idx) {
    {
      std::lock_guard<std::mutex> lk(mu);
      work.push(idx);
    }
    cv_work.notify_one();
  }

  bool read_scan(int64_t idx, Scan& out) {
    if (idx < 0 || idx >= (int64_t)paths.size()) return false;
    FILE* f = std::fopen(paths[idx].c_str(), "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long bytes = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    long n = bytes / (4 * sizeof(float));  // x,y,z,remission rows
    std::vector<float> raw(n * 4);
    size_t got = std::fread(raw.data(), sizeof(float), n * 4, f);
    std::fclose(f);
    n = (long)(got / 4);

    out.xyz.assign((size_t)max_points * 3, 0.0f);
    out.rem.assign((size_t)max_points, 0.0f);
    long keep = n < max_points ? n : max_points;
    for (long i = 0; i < keep; ++i) {
      out.xyz[i * 3 + 0] = raw[i * 4 + 0];
      out.xyz[i * 3 + 1] = raw[i * 4 + 1];
      out.xyz[i * 3 + 2] = raw[i * 4 + 2];
      out.rem[i] = raw[i * 4 + 3];
    }
    out.n_valid = (int32_t)keep;
    out.index = idx;
    return true;
  }

  void worker() {
    while (!stop.load()) {
      int64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop.load() || !work.empty(); });
        if (stop.load()) return;
        idx = work.front();
        work.pop();
      }
      Scan s;
      if (!read_scan(idx, s)) continue;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_ready.wait(lk, [this] {
          return stop.load() || ready.size() < ready_cap;
        });
        if (stop.load()) return;
        ready.push(std::move(s));
      }
      cv_ready.notify_all();
    }
  }

  // blocks until one scan is available; copies into caller buffers
  int64_t next(float* xyz_out, float* rem_out, int32_t* n_valid_out) {
    Scan s;
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_ready.wait(lk, [this] { return stop.load() || !ready.empty(); });
      if (stop.load() && ready.empty()) return -1;
      s = std::move(ready.front());
      ready.pop();
    }
    cv_ready.notify_all();
    std::memcpy(xyz_out, s.xyz.data(), s.xyz.size() * sizeof(float));
    std::memcpy(rem_out, s.rem.data(), s.rem.size() * sizeof(float));
    *n_valid_out = s.n_valid;
    return s.index;
  }
};

}  // namespace

extern "C" {

void* lidar_loader_create(const char** paths, int64_t n_paths, int max_points,
                          int n_threads, int prefetch) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Loader(std::move(p), max_points, n_threads, (size_t)prefetch);
}

void lidar_loader_destroy(void* h) { delete static_cast<Loader*>(h); }

void lidar_loader_enqueue(void* h, int64_t idx) {
  static_cast<Loader*>(h)->enqueue(idx);
}

// returns the scan index, or -1 on shutdown
int64_t lidar_loader_next(void* h, float* xyz_out, float* rem_out,
                          int32_t* n_valid_out) {
  return static_cast<Loader*>(h)->next(xyz_out, rem_out, n_valid_out);
}

}  // extern "C"
