// rankpo_native: host-side native runtime pieces.
//
// TPU-native framework boundary: accelerator compute is JAX/XLA/Pallas; the
// host runtime around it is C++ (this file), replacing the roles the reference
// delegates to native libraries it doesn't own (SURVEY.md §2.2):
//   - exact inner-product top-k (FAISS IndexFlatIP's job, src/utils.py:38-80):
//     multithreaded, heap-based, FAISS tie semantics (lowest index first).
//     Used as the honest CPU baseline in bench.py and as a host fallback.
//   - batch padding/collation of token id sequences into fixed-shape int32
//     arrays (the hot host loop of the data pipeline).
//   - JSONL line scanning via mmap (offset table; parsing stays in Python).
//
// Built as a plain shared library, bound with ctypes (no pybind11).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// Exact top-k inner product. corpus [n, d] row-major fp32, queries [nq, d].
// Writes out_scores [nq, k], out_indices [nq, k], descending score, ties by
// lowest corpus index.
// ---------------------------------------------------------------------------
void topk_ip(const float* corpus, int64_t n, int64_t d, const float* queries,
             int64_t nq, int32_t k, int32_t n_threads, float* out_scores,
             int32_t* out_indices) {
  if (k > n) k = (int32_t)n;
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 1;

  // candidate = (score, index); "worse" = lower score, or equal score with
  // HIGHER index (so the heap evicts high-index ties first)
  struct Cand {
    float s;
    int32_t i;
  };
  auto worse = [](const Cand& a, const Cand& b) {
    return a.s > b.s || (a.s == b.s && a.i < b.i);  // min-heap on (s, -i)
  };

  std::atomic<int64_t> next_q(0);
  auto worker = [&]() {
    std::vector<Cand> heap;
    heap.reserve(k);
    std::vector<float> dots(n);
    for (;;) {
      int64_t q = next_q.fetch_add(1);
      if (q >= nq) break;
      const float* qv = queries + q * d;
      // blocked dot products; -O3 auto-vectorizes the inner loop
      for (int64_t i = 0; i < n; ++i) {
        const float* cv = corpus + i * d;
        float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
        int64_t j = 0;
        for (; j + 4 <= d; j += 4) {
          acc0 += qv[j] * cv[j];
          acc1 += qv[j + 1] * cv[j + 1];
          acc2 += qv[j + 2] * cv[j + 2];
          acc3 += qv[j + 3] * cv[j + 3];
        }
        for (; j < d; ++j) acc0 += qv[j] * cv[j];
        dots[i] = acc0 + acc1 + acc2 + acc3;
      }
      heap.clear();
      for (int64_t i = 0; i < n; ++i) {
        Cand c{dots[i], (int32_t)i};
        if ((int32_t)heap.size() < k) {
          heap.push_back(c);
          std::push_heap(heap.begin(), heap.end(), worse);
        } else if (worse(c, heap.front())) {
          std::pop_heap(heap.begin(), heap.end(), worse);
          heap.back() = c;
          std::push_heap(heap.begin(), heap.end(), worse);
        }
      }
      std::sort_heap(heap.begin(), heap.end(), worse);  // ascending "worse"
      // sort_heap leaves ascending by comparator => best first after reverse?
      // comparator 'worse' orders best-first already: sort_heap gives the
      // sequence sorted by 'worse' ascending == best (highest s, lowest i)
      // first.
      for (int32_t r = 0; r < k; ++r) {
        out_scores[q * k + r] = heap[r].s;
        out_indices[q * k + r] = heap[r].i;
      }
    }
  };

  std::vector<std::thread> threads;
  int32_t t_count = (int32_t)std::min<int64_t>(n_threads, nq > 0 ? nq : 1);
  for (int32_t t = 0; t < t_count; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// ---------------------------------------------------------------------------
// Batch padding: flat int32 ids + row offsets -> fixed [n_rows, target] ids
// and attention mask (right padding).
// ---------------------------------------------------------------------------
void pad_batch_int32(const int32_t* flat, const int64_t* offsets,
                     int64_t n_rows, int64_t target, int32_t pad_id,
                     int32_t* out_ids, int32_t* out_mask) {
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t start = offsets[r];
    int64_t len = offsets[r + 1] - start;
    if (len > target) len = target;
    int32_t* ids = out_ids + r * target;
    int32_t* mask = out_mask + r * target;
    std::memcpy(ids, flat + start, len * sizeof(int32_t));
    for (int64_t j = len; j < target; ++j) ids[j] = pad_id;
    for (int64_t j = 0; j < len; ++j) mask[j] = 1;
    for (int64_t j = len; j < target; ++j) mask[j] = 0;
  }
}

// ---------------------------------------------------------------------------
// JSONL line offsets via mmap. Returns number of lines (capped at max_lines);
// offsets gets line-start offsets, offsets[count] = file size (exclusive end).
// Returns -1 on IO error.
// ---------------------------------------------------------------------------
int64_t scan_jsonl_offsets(const char* path, int64_t* offsets,
                           int64_t max_lines) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  int64_t size = st.st_size;
  if (size == 0) {
    close(fd);
    if (max_lines > 0) offsets[0] = 0;
    return 0;
  }
  const char* data =
      (const char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return -1;

  int64_t count = 0;
  int64_t pos = 0;
  while (pos < size && count < max_lines) {
    offsets[count++] = pos;
    const char* nl = (const char*)memchr(data + pos, '\n', size - pos);
    pos = nl ? (nl - data) + 1 : size;
  }
  if (count <= max_lines) offsets[count] = size;
  munmap((void*)data, size);
  return count;
}

}  // extern "C"
