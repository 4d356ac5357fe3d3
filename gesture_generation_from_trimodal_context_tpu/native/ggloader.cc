// GGPack native batch assembler.
//
// TPU-native equivalent of the reference's dataloader worker processes
// (reference lmdb_data_loader.py __getitem__ + collate, which deserialize
// pyarrow blobs per item in 4 worker processes).  Here samples are
// fixed-shape records in memory-mapped files, so batch assembly is a
// multithreaded strided gather plus an integer word-scatter — no
// serialization, no IPC.  Called from Python through ctypes
// (data/native_loader.py); a numpy fallback with identical semantics
// exists for environments without a compiler.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread ggloader.cc -o libggloader.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Parallel-for over [0, n) with a small fixed thread pool.
void parallel_for(int64_t n, int n_threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Gather n fixed-size records (record_bytes each, with a per-record copy
// window [copy_offset, copy_offset+copy_bytes)) from `base` into the
// contiguous `out`.  Covers both full-record gathers and clipped reads
// (e.g. the first n_poses frames of an extended window).
void gg_gather(const char* base, int64_t record_bytes, int64_t copy_offset,
               int64_t copy_bytes, const int64_t* indices, int64_t n,
               char* out, int n_threads) {
  parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * copy_bytes,
                  base + indices[i] * record_bytes + copy_offset, copy_bytes);
    }
  });
}

// float16 -> float32 widening gather (spectrogram field).
void gg_gather_f16_to_f32(const uint16_t* base, int64_t record_elems,
                          int64_t copy_offset_elems, int64_t copy_elems,
                          const int64_t* indices, int64_t n, float* out,
                          int n_threads) {
  parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint16_t* src =
          base + indices[i] * record_elems + copy_offset_elems;
      float* dst = out + i * copy_elems;
      for (int64_t j = 0; j < copy_elems; ++j) {
        uint16_t h = src[j];
        uint32_t sign = (uint32_t)(h & 0x8000) << 16;
        uint32_t exp = (h >> 10) & 0x1f;
        uint32_t man = h & 0x3ff;
        uint32_t bits;
        if (exp == 0) {
          if (man == 0) {
            bits = sign;
          } else {  // subnormal
            int shift = 0;
            while (!(man & 0x400)) {
              man <<= 1;
              ++shift;
            }
            man &= 0x3ff;
            // value = (1 + man/1024) * 2^(-14 - shift)
            bits = sign | ((uint32_t)(113 - shift) << 23) | (man << 13);
          }
        } else if (exp == 31) {
          bits = sign | 0x7f800000u | (man << 13);
        } else {
          bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
        }
        std::memcpy(dst + j, &bits, 4);
      }
    }
  });
}

// Frame-aligned word scatter (reference lmdb_data_loader.py:115-140).
// Ragged inputs: word ids/start-times flattened with per-sample offsets.
// For each selected sample s (global index sel[s]):
//   extended[s, clamp(floor((start - t0) / frame_dur))] = id  (last wins)
//   word_ids[s] = [SOS, ids while start <= sample_end, EOS] zero-padded.
// remove_word_timing=1 uses the evenly-spaced placement variant.
void gg_word_scatter(const int32_t* ids, const float* starts,
                     const int64_t* offsets, const int64_t* sel, int64_t n_sel,
                     const double* t0s, const double* sample_ends,
                     const double* frame_durs, int n_frames, int word_cap,
                     int sos, int eos, int remove_word_timing,
                     int32_t* extended, int32_t* word_ids,
                     int32_t* word_lengths, int n_threads) {
  parallel_for(n_sel, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t s = lo; s < hi; ++s) {
      int64_t g = sel[s];
      int64_t w0 = offsets[g], w1 = offsets[g + 1];
      double t0 = t0s[s], fd = frame_durs[s], send = sample_ends[s];
      int32_t* ext = extended + s * n_frames;
      int32_t* wid = word_ids + s * word_cap;
      std::memset(ext, 0, sizeof(int32_t) * n_frames);
      std::memset(wid, 0, sizeof(int32_t) * word_cap);

      if (remove_word_timing) {
        int n_words = 0;
        for (int64_t w = w0; w < w1; ++w) {
          int idx = (int)std::floor((starts[w] - t0) / fd);
          if (idx < 0) idx = 0;
          if (idx < n_frames) ++n_words;
        }
        int space = n_frames / (n_words + 1);
        for (int i = 0; i < n_words; ++i) {
          int pos = (i + 1) * space;
          if (pos < n_frames) ext[pos] = ids[w0 + i];
        }
      } else {
        for (int64_t w = w0; w < w1; ++w) {
          int idx = (int)std::floor((starts[w] - t0) / fd);
          if (idx < 0) idx = 0;
          if (idx < n_frames) ext[idx] = ids[w];
        }
      }

      int count = 0;
      wid[count++] = sos;
      for (int64_t w = w0; w < w1 && count < word_cap - 1; ++w) {
        if ((double)starts[w] > send) break;
        wid[count++] = ids[w];
      }
      wid[count++] = eos;
      word_lengths[s] = count;
    }
  });
}

}  // extern "C"
