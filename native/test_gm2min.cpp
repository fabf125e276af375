// Standalone test harness for the native minimization core.
//
// Exercises gm2_minimize_batch / gm2_minimize_to_fasta with many threads and
// verifies results against a single-threaded per-base oracle (the reference
// algorithm's semantics). Built by `make check` both plain and with
// -fsanitize=thread — the TSan run is the framework's race-detection gate
// for the multithreaded sweep workers (the reference is single-threaded
// Python and has no such subsystem; SURVEY.md §5).

#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" {
int gm2_minimize_batch(const uint8_t*, int64_t, const int64_t*, const int64_t*,
                       int64_t, const uint8_t*, int64_t, uint8_t*, int64_t*,
                       int);
int gm2_minimize_to_fasta(const uint8_t*, int64_t, const int64_t*,
                          const int64_t*, int64_t, const uint8_t*, int64_t,
                          const char*, const char*, int64_t, int64_t, int,
                          int64_t*);
int gm2_minimize_packed_batch(const uint8_t*, int64_t, const int64_t*,
                              const int64_t*, int64_t, const uint8_t*,
                              int64_t, const int64_t*, const uint8_t*,
                              int64_t, uint8_t*, int64_t*, int);
}

namespace {

// Oracle: per-base membership in the union of dropped intervals.
std::vector<uint8_t> oracle(const std::vector<uint8_t>& seq,
                            const std::vector<int64_t>& starts,
                            const std::vector<int64_t>& ends,
                            const uint8_t* drop) {
  int64_t L = static_cast<int64_t>(seq.size());
  std::vector<uint8_t> removed(seq.size(), 0);
  for (size_t f = 0; f < starts.size(); ++f) {
    if (!drop[f]) continue;
    for (int64_t i = std::max<int64_t>(0, starts[f]);
         i < std::min<int64_t>(L, ends[f]); ++i)
      removed[static_cast<size_t>(i)] = 1;
  }
  std::vector<uint8_t> out;
  for (size_t i = 0; i < seq.size(); ++i)
    if (!removed[i]) out.push_back(seq[i]);
  return out;
}

}  // namespace

int main() {
  std::mt19937 rng(42);
  const int64_t L = 200000;
  const int64_t F = 500;
  const int64_t N = 64;

  std::vector<uint8_t> seq(L);
  const char* bases = "ACGT";
  for (auto& b : seq) b = static_cast<uint8_t>(bases[rng() % 4]);

  std::vector<int64_t> starts(F), ends(F);
  for (int64_t f = 0; f < F; ++f) {
    starts[f] = static_cast<int64_t>(rng() % (L - 1000));
    ends[f] = starts[f] + 50 + static_cast<int64_t>(rng() % 800);
  }
  // deliberately unsorted + overlapping + one clamped interval
  ends[0] = L + 500;

  std::vector<uint8_t> drop(static_cast<size_t>(N * F));
  for (auto& d : drop) d = rng() % 2;

  std::vector<uint8_t> out(static_cast<size_t>(N * L));
  std::vector<int64_t> lens(static_cast<size_t>(N));
  int rc = gm2_minimize_batch(seq.data(), L, starts.data(), ends.data(), F,
                              drop.data(), N, out.data(), lens.data(), 8);
  if (rc != 0) {
    std::fprintf(stderr, "FAIL: batch rc=%d\n", rc);
    return 1;
  }
  for (int64_t i = 0; i < N; ++i) {
    auto expect = oracle(seq, starts, ends, drop.data() + i * F);
    if (static_cast<int64_t>(expect.size()) != lens[static_cast<size_t>(i)] ||
        std::memcmp(expect.data(), out.data() + i * L, expect.size()) != 0) {
      std::fprintf(stderr, "FAIL: sample %lld mismatch\n",
                   static_cast<long long>(i));
      return 1;
    }
  }

  const char* path = "/tmp/gm2min_test.fasta";
  std::vector<int64_t> lens2(static_cast<size_t>(N));
  rc = gm2_minimize_to_fasta(seq.data(), L, starts.data(), ends.data(), F,
                             drop.data(), N, path, "T", 0, -1, 8,
                             lens2.data());
  if (rc != 0) {
    std::fprintf(stderr, "FAIL: to_fasta rc=%d\n", rc);
    return 1;
  }
  for (int64_t i = 0; i < N; ++i) {
    if (lens2[static_cast<size_t>(i)] != lens[static_cast<size_t>(i)]) {
      std::fprintf(stderr, "FAIL: to_fasta lens mismatch\n");
      return 1;
    }
  }

  // --- write_base modes: the same batch written (a) fresh in one call,
  // (b) as two offset-mode chunks REWRITING the larger file (a) left
  // behind, caller-truncated at stream end — must be byte-identical.
  // Exercises in-place rewrite (page recycling) incl. the stale-tail rule.
  {
    std::FILE* f = std::fopen(path, "rb");
    std::fseek(f, 0, SEEK_END);
    long fresh_size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string fresh(static_cast<size_t>(fresh_size), '\0');
    if (std::fread(fresh.data(), 1, fresh.size(), f) != fresh.size()) {
      std::fprintf(stderr, "FAIL: fresh read\n");
      return 1;
    }
    std::fclose(f);

    int64_t half = N / 2;
    int64_t off1 = 0;
    // record bytes: ">T_" + idx + "\n" + seq + "\n"
    for (int64_t i = 0; i < half; ++i)
      off1 += 3 + static_cast<int64_t>(std::to_string(i + 1).size()) + 1 +
              lens[static_cast<size_t>(i)] + 1;
    int64_t total = off1;
    for (int64_t i = half; i < N; ++i)
      total += 3 + static_cast<int64_t>(std::to_string(i + 1).size()) + 1 +
               lens[static_cast<size_t>(i)] + 1;
    rc = gm2_minimize_to_fasta(seq.data(), L, starts.data(), ends.data(), F,
                               drop.data(), half, path, "T", 0, 0, 8, nullptr);
    int rc2 = gm2_minimize_to_fasta(seq.data(), L, starts.data(), ends.data(),
                                    F, drop.data() + half * F, N - half, path,
                                    "T", half, off1, 8, nullptr);
    if (rc != 0 || rc2 != 0 || ::truncate(path, total) != 0) {
      std::fprintf(stderr, "FAIL: offset-mode rc=%d/%d\n", rc, rc2);
      return 1;
    }
    f = std::fopen(path, "rb");
    std::fseek(f, 0, SEEK_END);
    long rw_size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string rewritten(static_cast<size_t>(rw_size), '\0');
    if (std::fread(rewritten.data(), 1, rewritten.size(), f) !=
        rewritten.size()) {
      std::fprintf(stderr, "FAIL: rewrite read\n");
      return 1;
    }
    std::fclose(f);
    if (rewritten != fresh) {
      std::fprintf(stderr, "FAIL: offset-mode rewrite != fresh write\n");
      return 1;
    }
  }
  std::remove(path);

  // --- packed-presence mode: expand on the test side, compare against the
  // dense-drop path (same sweep underneath, many threads — TSan-covered) ---
  {
    const int64_t n_cols = 977;  // not a multiple of 8: stride rounds up
    const int64_t stride = (n_cols + 7) / 8;
    std::vector<int64_t> col_idx(static_cast<size_t>(F));
    std::vector<uint8_t> ess(static_cast<size_t>(F));
    for (int64_t f = 0; f < F; ++f) {
      col_idx[static_cast<size_t>(f)] =
          (rng() % 10 == 0) ? -1 : static_cast<int64_t>(rng() % n_cols);
      ess[static_cast<size_t>(f)] = rng() % 7 == 0;
    }
    std::vector<uint8_t> packed(static_cast<size_t>(N * stride));
    for (auto& b : packed) b = static_cast<uint8_t>(rng() & 0xff);
    std::vector<uint8_t> drop_ref(static_cast<size_t>(N * F));
    for (int64_t i = 0; i < N; ++i) {
      const uint8_t* row = packed.data() + i * stride;
      for (int64_t f = 0; f < F; ++f) {
        int64_t c = col_idx[static_cast<size_t>(f)];
        bool present = c >= 0 && ((row[c >> 3] >> (c & 7)) & 1u);
        drop_ref[static_cast<size_t>(i * F + f)] =
            (ess[static_cast<size_t>(f)] || present) ? 0 : 1;
      }
    }
    std::vector<uint8_t> out_b(static_cast<size_t>(N * L));
    std::vector<int64_t> len_a(static_cast<size_t>(N)),
        len_b(static_cast<size_t>(N));
    rc = gm2_minimize_packed_batch(seq.data(), L, starts.data(), ends.data(),
                                   F, packed.data(), stride, col_idx.data(),
                                   ess.data(), N, out.data(), len_a.data(),
                                   16);
    if (rc != 0) {
      std::fprintf(stderr, "FAIL: packed batch rc=%d\n", rc);
      return 1;
    }
    rc = gm2_minimize_batch(seq.data(), L, starts.data(), ends.data(), F,
                            drop_ref.data(), N, out_b.data(), len_b.data(),
                            16);
    if (rc != 0) {
      std::fprintf(stderr, "FAIL: dense batch rc=%d\n", rc);
      return 1;
    }
    for (int64_t i = 0; i < N; ++i) {
      if (len_a[static_cast<size_t>(i)] != len_b[static_cast<size_t>(i)] ||
          std::memcmp(out.data() + i * L, out_b.data() + i * L,
                      static_cast<size_t>(len_a[static_cast<size_t>(i)])) !=
              0) {
        std::fprintf(stderr, "FAIL: packed vs dense mismatch at %lld\n",
                     static_cast<long long>(i));
        return 1;
      }
    }
  }

  std::printf("gm2min native tests PASS (%lld genomes)\n",
              static_cast<long long>(N));
  return 0;
}
