// Batched record-blob reader — native data-path acceleration.
//
// The framework's packed-record format (tpuseg/data/records.py) indexes
// (offset, length) blobs in a flat file.  Python's mmap path is fine for
// single samples; this kernel gathers many blobs into one contiguous
// output buffer with multi-threaded memcpy, used by the loader to
// assemble raw batch buffers without the GIL.  (The reference's native
// components are CUDA/C++ compute kernels; its data path is pure python —
// this is the runtime-native data loader the TPU build adds.)
//
// Build: native/build.py -> libtpuseg_native.so
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather n blobs from `base` (mmapped file) into `out`. offsets/lengths
// are int64 arrays of size n; out_offsets[i] gives the destination offset
// of blob i inside `out`.
void tpuseg_gather_blobs(const uint8_t* base, const int64_t* offsets,
                         const int64_t* lengths, const int64_t* out_offsets,
                         int64_t n, uint8_t* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  auto work = [&](int64_t start, int64_t end) {
    for (int64_t i = start; i < end; ++i) {
      std::memcpy(out + out_offsets[i], base + offsets[i],
                  static_cast<size_t>(lengths[i]));
    }
  };
  if (n_threads == 1 || n < 2 * n_threads) {
    work(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t s = t * chunk;
    int64_t e = s + chunk < n ? s + chunk : n;
    if (s >= e) break;
    threads.emplace_back(work, s, e);
  }
  for (auto& th : threads) th.join();
}

// uint8 (H,W,N) instance stack -> one-hot float32 with zero padding to
// max_n channels; used to build ins_masks batch tensors without python
// loops.
void tpuseg_expand_instances(const uint8_t* src, int64_t h, int64_t w,
                             int64_t n, int64_t max_n, float* dst) {
  const int64_t hw = h * w;
  for (int64_t p = 0; p < hw; ++p) {
    const uint8_t* s = src + p * n;
    float* o = dst + p * max_n;
    int64_t i = 0;
    for (; i < n && i < max_n; ++i) o[i] = s[i] ? 1.0f : 0.0f;
    for (; i < max_n; ++i) o[i] = 0.0f;
  }
}

}  // extern "C"
