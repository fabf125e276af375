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

#include <errno.h>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

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

// Minimized length only — the sweep's interval arithmetic without the
// copies. O(F); lets the FASTA writer precompute every record's byte offset
// so workers can pwrite records fully in parallel (no ordered write section).
int64_t sweep_len(int64_t L, const int64_t* starts, const int64_t* ends,
                  const int64_t* order, int64_t F, const uint8_t* drop) {
  int64_t cur = 0;
  int64_t n = 0;
  for (int64_t k = 0; k < F; ++k) {
    int64_t f = order[k];
    if (!drop[f]) continue;
    int64_t s = starts[f] < 0 ? 0 : (starts[f] > L ? L : starts[f]);
    int64_t e = ends[f] > L ? L : ends[f];
    if (s > cur) n += s - cur;
    if (e > cur) cur = e;
  }
  if (cur < L) n += L - cur;
  return n;
}

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
// Two-pass, fully parallel writer. Pass 1 computes every record's minimized
// length with the copy-free sweep (O(F)/sample), which fixes each record's
// exact byte offset in the file. Pass 2 builds header+sequence+newline in a
// per-worker buffer and pwrite()s it at that offset — records land in file
// order without any ordered (serial) write section. The previous design
// swept tiles in parallel but funneled all bytes through one fwrite loop,
// serializing ~40% of the per-genome work on this 2-core host.
// out_lens (may be null) receives minimized lengths. Returns 0 on success.
static bool pwrite_all(int fd, const uint8_t* buf, size_t len, int64_t off) {
  while (len > 0) {
    ssize_t w = ::pwrite(fd, buf, len, static_cast<off_t>(off));
    if (w < 0 && errno == EINTR) continue;  // signal delivery is not failure
    if (w <= 0) return false;
    buf += w;
    off += w;
    len -= static_cast<size_t>(w);
  }
  return true;
}

// write_base: -1 = fresh rewrite (file_base 0, exact final size),
// -2 = append at current EOF, >=0 = write this batch at that exact byte
// offset (grow-only sizing; the caller truncates at stream end). The
// offset mode lets a chunked stream rewrite a previous output in place,
// recycling its materialized pages (see the O_TRUNC note below).
static int minimize_to_fasta_impl(BatchArgs base, const char* path,
                                  const char* header_prefix,
                                  int64_t start_index, int64_t write_base,
                                  int n_threads, int64_t* out_lens) {
  if (!path || !header_prefix) return 1;
  // O_RDWR, not O_WRONLY: a MAP_SHARED PROT_WRITE mmap requires a
  // read-write fd (EACCES otherwise) — with O_WRONLY the mmap fast path
  // below silently never engages and every byte goes through the pwrite
  // fallback's shmem write syscall path (double copy + per-page kernel
  // work; observed as 50%-sys-time collapses under the pipeline bench).
  //
  // No O_TRUNC on fresh writes: truncating releases the previous file's
  // backing pages, so a rewrite pays fresh page allocation for every byte.
  // On memory-overcommitted hosts the fresh-allocation path measured up to
  // ~40x slower than stores to already-materialized pages (0.1 vs 4.5 GB/s,
  // BASELINE.md round 4); keeping the pages makes repeated runs to the same
  // output immune to that. Content is unaffected: pass 2 overwrites
  // [file_base, total) completely and the ftruncate below sets the exact
  // final size (removing any stale tail a smaller rewrite would leave).
  int fd = ::open(path, O_RDWR | O_CREAT, 0644);
  if (fd < 0) return 2;
  int64_t file_base = 0;
  if (write_base == -2) {
    off_t end = ::lseek(fd, 0, SEEK_END);
    if (end < 0) {
      ::close(fd);
      return 2;
    }
    file_base = static_cast<int64_t>(end);
  } else if (write_base >= 0) {
    file_base = write_base;
  }

  int64_t n_samples = base.n_samples;
  std::vector<int64_t> order(static_cast<size_t>(base.F));
  std::iota(order.begin(), order.end(), 0);
  const int64_t* starts = base.starts;
  std::sort(order.begin(), order.end(),
            [starts](int64_t x, int64_t y) { return starts[x] < starts[y]; });
  base.order = order.data();

  std::vector<int64_t> lens(static_cast<size_t>(n_samples));
  std::vector<int64_t> offsets(static_cast<size_t>(n_samples));
  const std::string prefix = ">" + std::string(header_prefix) + "_";

  int nt = resolve_threads(n_threads);
  if (nt > n_samples) nt = n_samples > 0 ? static_cast<int>(n_samples) : 1;
  std::atomic<bool> failed{false};

  // Pass 1: minimized lengths (copy-free sweep), parallel over samples.
  {
    std::atomic<int64_t> next{0};
    auto len_worker = [&]() {
      std::vector<uint8_t> scratch(base.packed ? static_cast<size_t>(base.F)
                                               : 0);
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n_samples) return;
        const uint8_t* drop;
        if (base.packed) {
          expand_packed_row(base, i, scratch.data());
          drop = scratch.data();
        } else {
          drop = base.drop + i * base.F;
        }
        lens[static_cast<size_t>(i)] =
            sweep_len(base.L, base.starts, base.ends, base.order, base.F,
                      drop);
      }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(len_worker);
    for (auto& th : threads) th.join();
  }
  if (out_lens)
    std::memcpy(out_lens, lens.data(),
                static_cast<size_t>(n_samples) * sizeof(int64_t));

  // Exact record offsets: '>{prefix}_{idx}\n' + seq + '\n'.
  int64_t off = file_base;
  for (int64_t i = 0; i < n_samples; ++i) {
    offsets[static_cast<size_t>(i)] = off;
    int64_t header_len =
        static_cast<int64_t>(prefix.size() +
                             std::to_string(start_index + i + 1).size()) + 1;
    off += header_len + lens[static_cast<size_t>(i)] + 1;
  }

  // Pass 2: sweep each record DIRECTLY into an mmap of the output file at
  // its exact offset. The sweep is memory-bandwidth-bound (~3 MB of kept
  // sequence per E. coli-scale record), so the previous
  // buffer-then-pwrite scheme moved every byte twice more (write to the
  // record buffer, read by pwrite) — mapping the file removes both legs
  // (~2x less traffic/record; on tmpfs the mapped pages ARE the file).
  // Records are disjoint regions, so workers never contend. Falls back to
  // per-worker buffers + pwrite when mmap isn't available for the target.
  int64_t total_bytes = off;
  // Sizing by mode:
  //  fresh (-1): exact final size up front — shrinks away the stale tail
  //    of a larger previous file (no O_TRUNC at open). If that shrink
  //    fails with a larger file in place, stale records would survive
  //    pass 2 — hard error, not a fallback.
  //  append (-2) / offset (>=0): grow-only — an offset writer is one
  //    chunk of a longer stream, so the stale tail beyond it belongs to
  //    the caller (truncated once at stream end; shrinking here would
  //    free exactly the pages the offset mode exists to recycle).
  bool sized;
  if (write_base == -1) {
    sized = ::ftruncate(fd, static_cast<off_t>(total_bytes)) == 0;
    if (!sized) {
      struct stat st;
      if (::fstat(fd, &st) != 0 || st.st_size > total_bytes) {
        ::close(fd);
        return 2;
      }
      // old size <= total: safe — the pwrite fallback extends implicitly
    }
  } else {
    struct stat st;
    sized = ::fstat(fd, &st) == 0;
    if (sized && st.st_size < total_bytes)
      sized = ::ftruncate(fd, static_cast<off_t>(total_bytes)) == 0;
  }
  uint8_t* map = nullptr;
  int64_t map_base = 0;
  size_t map_len = 0;
  if (total_bytes > file_base && sized) {
    long pg = ::sysconf(_SC_PAGESIZE);
    if (pg > 0) {
      map_base = (file_base / pg) * pg;
      map_len = static_cast<size_t>(total_bytes - map_base);
      void* m = ::mmap(nullptr, map_len, PROT_WRITE, MAP_SHARED, fd,
                       static_cast<off_t>(map_base));
      if (m != MAP_FAILED) {
        map = static_cast<uint8_t*>(m);
#ifndef MADV_POPULATE_WRITE
#define MADV_POPULATE_WRITE 23  // kernel >= 5.14
#endif
        // Batch-allocate the backing pages up front (one kernel pass)
        // instead of a page fault per 4 KiB store inside the sweep
        // workers; ignored (EINVAL) on kernels without it — the per-fault
        // path is correct, just slower.
        (void)::madvise(m, map_len, MADV_POPULATE_WRITE);
      }
    }
  }

  {
    std::atomic<int64_t> next{0};
    auto write_worker = [&]() {
      std::vector<uint8_t> scratch(base.packed ? static_cast<size_t>(base.F)
                                               : 0);
      std::vector<uint8_t> rec;
      if (!map)
        rec.resize(static_cast<size_t>(base.L) + prefix.size() + 32);
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n_samples || failed.load(std::memory_order_relaxed)) return;
        const uint8_t* drop;
        if (base.packed) {
          expand_packed_row(base, i, scratch.data());
          drop = scratch.data();
        } else {
          drop = base.drop + i * base.F;
        }
        std::string header = prefix + std::to_string(start_index + i + 1) +
                             "\n";
        uint8_t* dst =
            map ? map + (offsets[static_cast<size_t>(i)] - map_base)
                : rec.data();
        std::memcpy(dst, header.data(), header.size());
        int64_t n = sweep(base.seq, base.L, base.starts, base.ends,
                          base.order, base.F, drop, dst + header.size());
        if (n != lens[static_cast<size_t>(i)]) {  // defensive: passes agree
          failed.store(true, std::memory_order_relaxed);
          return;
        }
        dst[header.size() + static_cast<size_t>(n)] = '\n';
        if (!map &&
            !pwrite_all(fd, dst, header.size() + static_cast<size_t>(n) + 1,
                        offsets[static_cast<size_t>(i)]))
          failed.store(true, std::memory_order_relaxed);
      }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(write_worker);
    for (auto& th : threads) th.join();
  }
  if (map) ::munmap(map, map_len);

  int rc = failed.load() ? 3 : 0;
  if (rc != 0) {
    // A pass-2 failure may leave zero-filled holes at records after the
    // failed one (disjoint pwrite regions land out of order). rc=3 reaches
    // Python as an exception, but defense-in-depth: restore the file to its
    // pre-call state (append) or remove it (fresh write) so a failed call
    // can never leave a plausible-looking but corrupt FASTA behind.
    if (write_base != -1) {
      (void)::ftruncate(fd, static_cast<off_t>(file_base));
    } else {
      (void)::unlink(path);
    }
  }
  if (::close(fd) != 0 && rc == 0) rc = 4;
  return rc;
}

int gm2_minimize_to_fasta(const uint8_t* seq, int64_t L, const int64_t* starts,
                          const int64_t* ends, int64_t F, const uint8_t* drop,
                          int64_t n_samples, const char* path,
                          const char* header_prefix, int64_t start_index,
                          int64_t write_base, int n_threads,
                          int64_t* out_lens) {
  BatchArgs a{seq, L, starts, ends, nullptr, F, drop, n_samples, nullptr,
              nullptr};
  return minimize_to_fasta_impl(a, path, header_prefix, start_index,
                                write_base, n_threads, out_lens);
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
                                 int64_t start_index, int64_t write_base,
                                 int n_threads, int64_t* out_lens) {
  if (!packed || !col_idx || !ess) return 1;
  BatchArgs a{seq, L, starts, ends, nullptr, F, nullptr, n_samples, nullptr,
              nullptr};
  a.packed = packed;
  a.packed_stride = packed_stride;
  a.col_idx = col_idx;
  a.ess = ess;
  return minimize_to_fasta_impl(a, path, header_prefix, start_index,
                                write_base, n_threads, out_lens);
}

}  // extern "C"
