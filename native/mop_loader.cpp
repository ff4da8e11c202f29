// mop-tpu native data loader: multi-threaded shuffled batch assembly with a
// prefetch ring, exposed through a C ABI (ctypes binding in
// mop_tpu/data/native_loader.py).
//
// The reference relies on torch's DataLoader workers
// (num_workers=2, e.g. reference experiments/cifar100_ab5_param_budgets.py
// get_loaders) for host-side batching. Here the equivalent runtime component
// is native C++: worker threads gather shuffled sample rows from the
// in-memory dataset into preallocated batch buffers while the device computes,
// so the host gather never sits on the step critical path.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread mop_loader.cpp -o libmop_loader.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
  std::vector<uint8_t> x;
  std::vector<int32_t> y;
};

struct Loader {
  const uint8_t* data = nullptr;   // (n, sample_bytes) row-major, borrowed
  const int32_t* labels = nullptr; // (n,)
  int64_t n = 0;
  int64_t sample_bytes = 0;
  int64_t batch = 0;
  uint64_t seed = 0;
  bool drop_last = true;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for batches
  std::condition_variable cv_space;   // producer waits for queue space
  std::queue<Batch> ready;
  size_t queue_depth = 4;
  std::atomic<bool> stop{false};

  // Epoch order production is single-threaded (one producer thread builds the
  // permutation and assembles batches; extra workers split the memcpy work).
  std::thread producer;
};

void assemble(Loader* L, const std::vector<int64_t>& idx, int64_t start,
              int64_t count, Batch* out) {
  for (int64_t i = 0; i < count; ++i) {
    const int64_t src = idx[start + i];
    std::memcpy(out->x.data() + i * L->sample_bytes,
                L->data + src * L->sample_bytes,
                static_cast<size_t>(L->sample_bytes));
    out->y[i] = L->labels[src];
  }
}

void producer_loop(Loader* L) {
  std::mt19937_64 rng(L->seed);
  while (!L->stop.load()) {
    std::vector<int64_t> idx(L->n);
    for (int64_t i = 0; i < L->n; ++i) idx[i] = i;
    // Fisher-Yates with the loader's own PRNG stream.
    for (int64_t i = L->n - 1; i > 0; --i) {
      const int64_t j = static_cast<int64_t>(rng() % (i + 1));
      std::swap(idx[i], idx[j]);
    }
    const int64_t full = L->n / L->batch;
    for (int64_t b = 0; b < full && !L->stop.load(); ++b) {
      Batch out;
      out.x.resize(static_cast<size_t>(L->batch * L->sample_bytes));
      out.y.resize(static_cast<size_t>(L->batch));
      // Split the gather across helper threads for large batches.
      const int n_threads =
          L->sample_bytes * L->batch > (1 << 20) ? 4 : 1;
      if (n_threads == 1) {
        assemble(L, idx, b * L->batch, L->batch, &out);
      } else {
        std::vector<std::thread> ts;
        const int64_t per = (L->batch + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; ++t) {
          const int64_t s = t * per;
          const int64_t c = std::min<int64_t>(per, L->batch - s);
          if (c <= 0) break;
          ts.emplace_back([L, &idx, b, s, c, &out] {
            // threads write disjoint [s, s+c) ranges of the same batch
            for (int64_t i = 0; i < c; ++i) {
              const int64_t src = idx[b * L->batch + s + i];
              std::memcpy(out.x.data() + (s + i) * L->sample_bytes,
                          L->data + src * L->sample_bytes,
                          static_cast<size_t>(L->sample_bytes));
              out.y[s + i] = L->labels[src];
            }
          });
        }
        for (auto& t : ts) t.join();
      }
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_space.wait(lk, [L] {
        return L->ready.size() < L->queue_depth || L->stop.load();
      });
      if (L->stop.load()) return;
      L->ready.push(std::move(out));
      L->cv_ready.notify_one();
    }
  }
}

}  // namespace

extern "C" {

void* mop_loader_create(const uint8_t* data, const int32_t* labels,
                        int64_t n, int64_t sample_bytes, int64_t batch,
                        uint64_t seed, int64_t queue_depth) {
  auto* L = new Loader();
  L->data = data;
  L->labels = labels;
  L->n = n;
  L->sample_bytes = sample_bytes;
  L->batch = batch;
  L->seed = seed;
  L->queue_depth = static_cast<size_t>(queue_depth > 0 ? queue_depth : 4);
  L->producer = std::thread(producer_loop, L);
  return L;
}

// Blocks until a batch is available; copies into caller buffers.
// Returns 0 on success, -1 if the loader is stopped.
int mop_loader_next(void* handle, uint8_t* out_x, int32_t* out_y) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_ready.wait(lk, [L] { return !L->ready.empty() || L->stop.load(); });
  if (L->ready.empty()) return -1;
  Batch b = std::move(L->ready.front());
  L->ready.pop();
  L->cv_space.notify_one();
  lk.unlock();
  std::memcpy(out_x, b.x.data(), b.x.size());
  std::memcpy(out_y, b.y.data(), b.y.size() * sizeof(int32_t));
  return 0;
}

void mop_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->cv_space.notify_all();
    L->cv_ready.notify_all();
  }
  if (L->producer.joinable()) L->producer.join();
  delete L;
}

}  // extern "C"
