// gm2min — native batch genome-minimization core.
//
// TPU-native framework's host-side sequence engine: the per-sample work the
// reference does with a Python set of 4.6M base positions and a per-base
// loop (/root/reference/src/genome_minimizer_2/minimizer/minimizer_2.py:68-101)
// is done here as interval fills over a removal bitmap + a single compaction
// pass, multithreaded over samples. Gene-name -> feature matching stays in
// Python (tiny); this core receives a per-sample drop mask over features.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread gm2min.cpp -o libgm2min.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <thread>
#include <vector>

namespace {

// Merge-sweep over features sorted by start: for each dropped interval, copy
// the kept gap before it, then advance past its end. Equivalent to the
// union-of-positions semantics, but O(F + output_bytes) memcpys instead of
// O(genome) per-byte work.
int64_t sweep(const uint8_t* seq, int64_t L, const int64_t* starts,
              const int64_t* ends, const int64_t* order, int64_t F,
              const uint8_t* drop, uint8_t* out) {
  int64_t cur = 0;
  int64_t n = 0;
  for (int64_t k = 0; k < F; ++k) {
    int64_t f = order[k];
    if (!drop[f]) continue;
    int64_t s = starts[f] < 0 ? 0 : (starts[f] > L ? L : starts[f]);
    int64_t e = ends[f] > L ? L : ends[f];
    if (s > cur) {
      std::memcpy(out + n, seq + cur, static_cast<size_t>(s - cur));
      n += s - cur;
    }
    if (e > cur) cur = e;
  }
  if (cur < L) {
    std::memcpy(out + n, seq + cur, static_cast<size_t>(L - cur));
    n += L - cur;
  }
  return n;
}

struct BatchArgs {
  const uint8_t* seq;
  int64_t L;
  const int64_t* starts;
  const int64_t* ends;
  const int64_t* order;  // feature indices sorted by start
  int64_t F;
  const uint8_t* drop;  // n_samples x F (dense mode; null in packed mode)
  int64_t n_samples;
  uint8_t* out;         // n_samples x L
  int64_t* out_lens;
  // Packed mode (pipeline fast path): per-sample little-bit-order presence
  // bitmasks over the dataset columns, plus the feature -> column index
  // table and essential flags. drop[f] = !(ess[f] || bit(col_idx[f])).
  // Fuses the converter's mask -> drop step into the minimize workers —
  // the host never materializes unpacked masks (8x smaller stream).
  const uint8_t* packed = nullptr;  // n_samples x packed_stride
  int64_t packed_stride = 0;
  const int64_t* col_idx = nullptr;  // F; -1 = gene name not a column
  const uint8_t* ess = nullptr;      // F
};

void expand_packed_row(const BatchArgs& a, int64_t i, uint8_t* drop) {
  const uint8_t* row = a.packed + i * a.packed_stride;
  for (int64_t f = 0; f < a.F; ++f) {
    int64_t c = a.col_idx[f];
    bool present = c >= 0 && ((row[c >> 3] >> (c & 7)) & 1u);
    drop[f] = (a.ess[f] || present) ? 0 : 1;
  }
}

int resolve_threads(int n_threads) {
  if (n_threads > 0) return n_threads;
  unsigned hw = std::thread::hardware_concurrency();
  return hw ? static_cast<int>(hw) : 2;
}

void worker(const BatchArgs& a, std::atomic<int64_t>* next) {
  std::vector<uint8_t> scratch(a.packed ? static_cast<size_t>(a.F) : 0);
  for (;;) {
    int64_t i = next->fetch_add(1);
    if (i >= a.n_samples) return;
    const uint8_t* drop;
    if (a.packed) {
      expand_packed_row(a, i, scratch.data());
      drop = scratch.data();
    } else {
      drop = a.drop + i * a.F;
    }
    a.out_lens[i] = sweep(a.seq, a.L, a.starts, a.ends, a.order, a.F, drop,
                          a.out + i * a.L);
  }
}

int run_batch(BatchArgs a, int n_threads) {
  std::vector<int64_t> order(static_cast<size_t>(a.F));
  std::iota(order.begin(), order.end(), 0);
  const int64_t* starts = a.starts;
  std::sort(order.begin(), order.end(),
            [starts](int64_t x, int64_t y) { return starts[x] < starts[y]; });
  a.order = order.data();
  int nt = resolve_threads(n_threads);
  if (nt > a.n_samples) nt = a.n_samples > 0 ? static_cast<int>(a.n_samples) : 1;
  std::atomic<int64_t> next{0};
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t)
    threads.emplace_back(worker, std::cref(a), &next);
  for (auto& th : threads) th.join();
  return 0;
}

}  // namespace

extern "C" {

// Minimize a batch into a dense (n_samples, L) output buffer; out_lens[i]
// receives each minimized length. Returns 0 on success.
int gm2_minimize_batch(const uint8_t* seq, int64_t L, const int64_t* starts,
                       const int64_t* ends, int64_t F, const uint8_t* drop,
                       int64_t n_samples, uint8_t* out, int64_t* out_lens,
                       int n_threads) {
  if (!seq || !out || !out_lens || L < 0 || F < 0 || n_samples < 0) return 1;
  BatchArgs a{seq, L, starts, ends, nullptr, F, drop, n_samples, out,
              out_lens};
  return run_batch(a, n_threads);
}

// Packed-presence variant: per-sample bitmasks over the dataset columns
// (little bit order, np.packbits(bitorder='little') layout) + per-feature
// column index (col_idx[f] < 0 = name not in dataset) and essential flag.
int gm2_minimize_packed_batch(const uint8_t* seq, int64_t L,
                              const int64_t* starts, const int64_t* ends,
                              int64_t F, const uint8_t* packed,
                              int64_t packed_stride, const int64_t* col_idx,
                              const uint8_t* ess, int64_t n_samples,
                              uint8_t* out, int64_t* out_lens, int n_threads) {
  if (!seq || !out || !out_lens || !packed || !col_idx || !ess || L < 0 ||
      F < 0 || n_samples < 0 || packed_stride < 0)
    return 1;
  BatchArgs a{seq, L, starts, ends, nullptr, F, nullptr, n_samples, out,
              out_lens};
  a.packed = packed;
  a.packed_stride = packed_stride;
  a.col_idx = col_idx;
  a.ess = ess;
  return run_batch(a, n_threads);
}

// Minimize a batch and append FASTA records directly to `path`:
//   >{header_prefix}_{start_index + i + 1}\n{seq}\n
// Sequences are computed in parallel (bounded-memory tiles) and written in
// order; out_lens (may be null) receives minimized lengths. Returns 0 on
// success.
static int minimize_to_fasta_impl(BatchArgs base, const char* path,
                                  const char* header_prefix,
                                  int64_t start_index, int append,
                                  int n_threads, int64_t* out_lens) {
  if (!path || !header_prefix) return 1;
  std::FILE* fp = std::fopen(path, append ? "ab" : "wb");
  if (!fp) return 2;

  int nt = resolve_threads(n_threads);
  int64_t tile = nt * 4 > 64 ? 64 : nt * 4;  // samples buffered per write pass
  if (tile < 1) tile = 1;
  int64_t n_samples = base.n_samples;
  int64_t L = base.L;
  std::vector<uint8_t> out_buf;
  std::vector<int64_t> lens;
  int rc = 0;
  for (int64_t lo = 0; lo < n_samples && rc == 0; lo += tile) {
    int64_t hi = lo + tile < n_samples ? lo + tile : n_samples;
    int64_t cnt = hi - lo;
    out_buf.resize(static_cast<size_t>(cnt * L));
    lens.resize(static_cast<size_t>(cnt));
    BatchArgs a = base;
    if (a.packed) {
      a.packed += lo * a.packed_stride;
    } else {
      a.drop += lo * a.F;
    }
    a.n_samples = cnt;
    a.out = out_buf.data();
    a.out_lens = lens.data();
    rc = run_batch(a, n_threads);
    if (rc == 0 && out_lens)
      std::memcpy(out_lens + lo, lens.data(),
                  static_cast<size_t>(cnt) * sizeof(int64_t));
    for (int64_t i = 0; i < cnt && rc == 0; ++i) {
      std::string header = ">" + std::string(header_prefix) + "_" +
                           std::to_string(start_index + lo + i + 1) + "\n";
      if (std::fwrite(header.data(), 1, header.size(), fp) != header.size())
        rc = 3;
      if (rc == 0 &&
          std::fwrite(out_buf.data() + i * L, 1,
                      static_cast<size_t>(lens[i]),
                      fp) != static_cast<size_t>(lens[i]))
        rc = 3;
      if (rc == 0 && std::fwrite("\n", 1, 1, fp) != 1) rc = 3;
    }
  }
  if (std::fclose(fp) != 0 && rc == 0) rc = 4;
  return rc;
}

int gm2_minimize_to_fasta(const uint8_t* seq, int64_t L, const int64_t* starts,
                          const int64_t* ends, int64_t F, const uint8_t* drop,
                          int64_t n_samples, const char* path,
                          const char* header_prefix, int64_t start_index,
                          int append, int n_threads, int64_t* out_lens) {
  BatchArgs a{seq, L, starts, ends, nullptr, F, drop, n_samples, nullptr,
              nullptr};
  return minimize_to_fasta_impl(a, path, header_prefix, start_index, append,
                                n_threads, out_lens);
}

// Packed pipeline fast path: converter semantics fused into the minimize
// workers (feature kept iff its gene is a set bit of the sample's presence
// bitmask OR essential) — byte-identical FASTA to the staged
// unpack -> drop-mask -> minimize path.
int gm2_minimize_packed_to_fasta(const uint8_t* seq, int64_t L,
                                 const int64_t* starts, const int64_t* ends,
                                 int64_t F, const uint8_t* packed,
                                 int64_t packed_stride, const int64_t* col_idx,
                                 const uint8_t* ess, int64_t n_samples,
                                 const char* path, const char* header_prefix,
                                 int64_t start_index, int append,
                                 int n_threads, int64_t* out_lens) {
  if (!packed || !col_idx || !ess) return 1;
  BatchArgs a{seq, L, starts, ends, nullptr, F, nullptr, n_samples, nullptr,
              nullptr};
  a.packed = packed;
  a.packed_stride = packed_stride;
  a.col_idx = col_idx;
  a.ess = ess;
  return minimize_to_fasta_impl(a, path, header_prefix, start_index, append,
                                n_threads, out_lens);
}

}  // extern "C"
