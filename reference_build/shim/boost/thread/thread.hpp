// Minimal boost::thread shim over std::thread, sufficient for the
// reference's usage (thread_group::create_thread + join_all only; see
// reference src/PixelWisePyramid.cpp:424-436, DepthPropagation.cpp:1943-1949,
// GlobalOptimize.cpp:239-241).  Lets the unmodified reference sources build
// on a machine without Boost so its performance can be measured as the
// baseline for BASELINE.md.
#pragma once
#include <functional>
#include <thread>
#include <vector>

namespace boost {

using thread = std::thread;

class thread_group {
 public:
  template <typename F>
  thread* create_thread(F&& f) {
    threads_.emplace_back(std::forward<F>(f));
    return &threads_.back();
  }
  void join_all() {
    for (auto& t : threads_)
      if (t.joinable()) t.join();
    threads_.clear();
  }
  ~thread_group() { join_all(); }

 private:
  std::vector<std::thread> threads_;
};

using std::bind;

}  // namespace boost
