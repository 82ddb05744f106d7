// Async topology prefetch pipeline: a C++ thread pool that produces graph batches
// AHEAD of the training loop, overlapping host-side sampling with TPU step execution.
//
// The reference pays its per-batch topology cost inline on the Python hot path
// (batch_size networkx graphs rebuilt synchronously before every step,
// gnn_dlasso_progressive.py:181-191). Here the trainer submits upcoming batch seeds
// and pops finished [B, P, P] float32 adjacency batches; workers run dadmm::sample_batch
// (sampling.h — the same pure function as the synchronous API), so for any submitted
// seed the pipeline's output is bitwise-identical to sample_connected_er_batch(seed,...)
// no matter how threads interleave. Delivery is in submission order via a reorder
// buffer. Exposed via ctypes (ops/native_pipeline.py).
//
// Build: make -C native   ->  libgraph_builder.so (single .so with graph_builder.cc)

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

#include "sampling.h"

namespace {

struct Pipeline {
  int32_t batch, P;
  double prob;
  size_t batch_floats;

  std::mutex mu;
  std::condition_variable work_cv;    // workers wait for tasks
  std::condition_variable done_cv;    // consumer waits for the next in-order result
  std::deque<std::pair<uint64_t, uint64_t>> tasks;  // (sequence, seed)
  std::map<uint64_t, std::vector<float>> done;      // sequence -> finished batch
  uint64_t next_submit_seq = 0;
  uint64_t next_pop_seq = 0;
  bool stopping = false;
  std::vector<std::thread> workers;

  Pipeline(int32_t batch_, int32_t P_, double prob_, int32_t n_threads)
      : batch(batch_), P(P_), prob(prob_),
        batch_floats(static_cast<size_t>(batch_) * P_ * P_) {
    if (n_threads < 1) n_threads = 1;
    for (int32_t i = 0; i < n_threads; ++i) {
      workers.emplace_back([this] { worker_loop(); });
    }
  }

  ~Pipeline() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    work_cv.notify_all();
    for (auto& t : workers) t.join();
  }

  void worker_loop() {
    for (;;) {
      std::pair<uint64_t, uint64_t> task;
      {
        std::unique_lock<std::mutex> lk(mu);
        work_cv.wait(lk, [this] { return stopping || !tasks.empty(); });
        if (stopping && tasks.empty()) return;
        task = tasks.front();
        tasks.pop_front();
      }
      std::vector<float> buf(batch_floats);
      dadmm::sample_batch(task.second, batch, P, prob, buf.data());
      {
        std::lock_guard<std::mutex> lk(mu);
        done.emplace(task.first, std::move(buf));
      }
      done_cv.notify_all();
    }
  }

  void submit(uint64_t seed) {
    {
      std::lock_guard<std::mutex> lk(mu);
      tasks.emplace_back(next_submit_seq++, seed);
    }
    work_cv.notify_one();
  }

  // Blocking pop of the oldest submitted batch. Returns 0 on success, -1 if nothing
  // was submitted (would deadlock otherwise).
  int32_t next(float* out) {
    std::unique_lock<std::mutex> lk(mu);
    if (next_pop_seq >= next_submit_seq) return -1;
    uint64_t want = next_pop_seq++;
    done_cv.wait(lk, [this, want] { return done.count(want) != 0; });
    auto it = done.find(want);
    std::memcpy(out, it->second.data(), batch_floats * sizeof(float));
    done.erase(it);
    return 0;
  }

  int32_t pending() {
    std::lock_guard<std::mutex> lk(mu);
    return static_cast<int32_t>(next_submit_seq - next_pop_seq);
  }
};

}  // namespace

extern "C" {

void* graph_pipeline_create(int32_t batch, int32_t P, double prob, int32_t n_threads) {
  return new Pipeline(batch, P, prob, n_threads);
}

void graph_pipeline_submit(void* h, uint64_t seed) {
  static_cast<Pipeline*>(h)->submit(seed);
}

// out: float32 buffer of size batch * P * P. Blocks until the oldest submitted batch
// is ready. Returns 0 on success, -1 if nothing is outstanding.
int32_t graph_pipeline_next(void* h, float* out) {
  return static_cast<Pipeline*>(h)->next(out);
}

// Number of submitted-but-not-popped batches (in flight + finished).
int32_t graph_pipeline_pending(void* h) {
  return static_cast<Pipeline*>(h)->pending();
}

void graph_pipeline_destroy(void* h) {
  delete static_cast<Pipeline*>(h);
}

}  // extern "C"
