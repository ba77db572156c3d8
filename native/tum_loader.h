// Native TUM-sequence loader + threaded prefetch scheduler.
//
// The reference plays TUM data back through the C++ ROS stack (rosbag +
// image_transport deserialization on the subscriber thread, SURVEY.md
// §3.2 "ROS IPC boundary") — IO and decode overlap the SLAM loop for
// free because they live in other processes.  In this framework the
// SLAM loop is a single Python process driving the TPU, so the overlap
// is reproduced natively: a C++ worker pool decodes frames ahead of the
// consumer into a bounded in-order ring, and `NextFrame` hands the
// Python layer a ready host buffer while workers keep decoding.  This
// keeps the accelerator fed without the GIL throttling decode.
#pragma once

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "png_codec.h"

namespace popup {

struct StampedFile {
  double stamp;
  std::string path;  // absolute
};

struct GtPose {
  double stamp;
  double t[3];
  double q[4];  // x y z w (TUM order)
};

// Parsed index files of one TUM sequence directory.
struct Sequence {
  std::string root;
  std::vector<StampedFile> rgb;
  std::vector<StampedFile> depth;
  std::vector<StampedFile> seg;  // aligned with rgb; path empty if absent
  std::vector<GtPose> gt;
};

// Parse rgb.txt / depth.txt / groundtruth.txt (+ optional seg/ dir).
bool OpenSequence(const std::string& root, Sequence* out, std::string* err);

// Greedy nearest-stamp association (mirrors TUM associate.py / the
// Python twin in evaluation.ate.associate). Returns index pairs (i, j),
// each side used once, sorted by i.
std::vector<std::pair<int, int>> Associate(const std::vector<double>& a,
                                           const std::vector<double>& b,
                                           double max_difference);

// In-order prefetching decoder over a list of files.
class Prefetcher {
 public:
  // `lookahead` bounds how far workers run ahead of the consumer.
  Prefetcher(std::vector<StampedFile> files, int num_threads, int lookahead);
  ~Prefetcher();

  // Blocks until frame `next` is decoded; moves it out. Returns false
  // past the end or on decode error (err filled).
  bool NextFrame(Image* out, double* stamp, std::string* err);

  int size() const { return static_cast<int>(files_.size()); }

 private:
  struct Slot {
    enum State { kEmpty, kClaimed, kReady, kError };
    State state = kEmpty;
    Image img;
    std::string err;
  };

  void WorkerLoop();

  std::vector<StampedFile> files_;
  std::vector<Slot> slots_;  // one per frame (Image storage is transient)
  int lookahead_;
  std::mutex mu_;
  std::condition_variable cv_ready_;    // consumer waits for its frame
  std::condition_variable cv_space_;    // workers wait for window space
  int next_claim_ = 0;                  // next frame index to decode
  int consumer_pos_ = 0;                // next frame index to hand out
  bool stop_ = false;
  std::vector<std::thread> workers_;
};

}  // namespace popup
