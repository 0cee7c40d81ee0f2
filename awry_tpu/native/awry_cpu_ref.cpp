// AWRY CPU reference microbenchmark: measures the reference's count+locate
// throughput on this host, replacing the estimated vs_baseline denominator
// (round-3 verdict task 6).
//
// This reimplements the reference's query hot path at the instruction level
// (no Rust toolchain in this image):
//   * 160 B block-of-structs layout: 3 x 256-bit occurrence bit-vectors +
//     8 x u64 milestones, 32 B aligned (src/bwt.rs:13-17, 29-30)
//   * AVX2 rank: per-symbol AND/ANDNOT combine of the three vectors +
//     inclusive masked popcount (src/bwt.rs:110-135,
//     src/simd_instructions.rs:98-121)
//   * backward search via update_range_with_symbol
//     (src/fm_index.rs:402-438, 559-582) — the k-mer table recomputes its
//     range by search in the reference (SURVEY.md quirk #1), so the honest
//     per-query cost is the full qlen-symbol search
//   * locate: per-row LF-walk to a row-sampled SA entry, symbol_at by bit
//     extraction (src/fm_index.rs:516-544, 585-593; bwt.rs:307-325)
//   * rayon-style parallelism over independent queries -> OpenMP here
//     (src/fm_index.rs:455-487)
//
// Input: a binary dump produced by scripts/dump_cpu_ref.py from the real
// bench index (so the data distribution, not synthetic assumptions, drives
// cache behavior).  Output: one JSON line with count+locate queries/sec.
//
// Build: g++ -O3 -march=native -fopenmp -o awry_cpu_ref awry_cpu_ref.cpp

#include <immintrin.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct alignas(32) Block {
  uint64_t vec[3][4];    // 3 x 256-bit occurrence planes (bit v of code)
  uint64_t milestone[8];  // 6 used (cardinality), padded to 8 (bwt.rs:13)
};

struct Index {
  std::vector<Block> blocks;
  uint64_t prefix_sums[7];
  std::vector<uint64_t> sampled_sa;
  uint64_t bwt_len;
  uint64_t sa_ratio;
};

// Nucleotide occurrence-vector combine (src/bwt.rs:120-129): symbol codes
// $=0b100 A=0b110 C=0b101 G=0b011 N=0b010 T=0b001; occ vector for symbol s
// is the AND over planes v of (plane if code bit v else ~plane).
inline __m256i occ_vector(const Block& b, unsigned sym_code) {
  __m256i v0 = _mm256_load_si256((const __m256i*)b.vec[0]);
  __m256i v1 = _mm256_load_si256((const __m256i*)b.vec[1]);
  __m256i v2 = _mm256_load_si256((const __m256i*)b.vec[2]);
  __m256i acc = (sym_code & 1) ? v0 : _mm256_andnot_si256(v0, _mm256_set1_epi64x(-1));
  acc = (sym_code & 2) ? _mm256_and_si256(acc, v1) : _mm256_andnot_si256(v1, acc);
  acc = (sym_code & 4) ? _mm256_and_si256(acc, v2) : _mm256_andnot_si256(v2, acc);
  return acc;
}

// Inclusive masked popcount of bits [0, local] (simd_instructions.rs:98-121).
inline uint64_t masked_popcount(__m256i v, unsigned local) {
  alignas(32) uint64_t w[4];
  _mm256_store_si256((__m256i*)w, v);
  unsigned word = local >> 6;
  uint64_t mask = ~0ULL >> (63 - (local & 63));
  uint64_t pop = 0;
  for (unsigned i = 0; i < word; ++i) pop += (uint64_t)__builtin_popcountll(w[i]);
  pop += (uint64_t)__builtin_popcountll(w[word] & mask);
  return pop;
}

static const unsigned kIndexToCode[6] = {4, 6, 5, 3, 2, 1};  // $,A,C,G,N,T
static const int kCodeToIndex[8] = {-1, 5, 4, 3, 0, 2, 1, -1};

inline uint64_t global_occurrence(const Index& ix, uint64_t pos, unsigned sym) {
  const Block& b = ix.blocks[pos >> 8];
  return b.milestone[sym] + masked_popcount(occ_vector(b, kIndexToCode[sym]), pos & 255);
}

inline unsigned symbol_at(const Index& ix, uint64_t pos) {  // bwt.rs:307-325
  const Block& b = ix.blocks[pos >> 8];
  unsigned local = pos & 255, word = local >> 6, bit = local & 63;
  unsigned code = 0;
  for (unsigned v = 0; v < 3; ++v) code |= ((b.vec[v][word] >> bit) & 1u) << v;
  return (unsigned)kCodeToIndex[code];
}

// update_range_with_symbol (fm_index.rs:559-582); range inclusive.
inline void update_range(const Index& ix, uint64_t& s, uint64_t& e, unsigned sym) {
  uint64_t c = ix.prefix_sums[sym];
  s = c + global_occurrence(ix, s - 1, sym);
  e = c + global_occurrence(ix, e, sym) - 1;
}

uint64_t count_query(const Index& ix, const uint8_t* q, int qlen,
                     uint64_t& s_out, uint64_t& e_out) {
  unsigned last = q[qlen - 1];
  uint64_t s = ix.prefix_sums[last], e = ix.prefix_sums[last + 1] - 1;
  for (int i = qlen - 2; i >= 0 && s <= e; --i) update_range(ix, s, e, q[i]);
  s_out = s;
  e_out = e;
  return s <= e ? e - s + 1 : 0;
}

uint64_t locate_range(const Index& ix, uint64_t s, uint64_t e, uint64_t* sink) {
  uint64_t n = 0;
  for (uint64_t row = s; row <= e; ++row) {  // fm_index.rs:516-544
    uint64_t r = row, steps = 0;
    while (r % ix.sa_ratio != 0) {  // backstep, fm_index.rs:585-593
      unsigned sym = symbol_at(ix, r);
      if (sym == 0) { r = 0; break; }
      r = ix.prefix_sums[sym] + global_occurrence(ix, r, sym) - 1;
      ++steps;
    }
    *sink ^= (ix.sampled_sa[r / ix.sa_ratio] + steps) % ix.bwt_len;
    ++n;
  }
  return n;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s dump.bin [trials]\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 2; }
  uint64_t hdr[5];  // bwt_len, sa_ratio, num_blocks, nq, qlen
  if (fread(hdr, 8, 5, f) != 5) return 2;
  Index ix;
  ix.bwt_len = hdr[0];
  ix.sa_ratio = hdr[1];
  uint64_t nb = hdr[2], nq = hdr[3], qlen = hdr[4];
  if (fread(ix.prefix_sums, 8, 7, f) != 7) return 2;
  ix.blocks.resize(nb);
  if (fread(ix.blocks.data(), sizeof(Block), nb, f) != nb) return 2;
  uint64_t nsa = (ix.bwt_len + ix.sa_ratio - 1) / ix.sa_ratio;
  ix.sampled_sa.resize(nsa);
  if (fread(ix.sampled_sa.data(), 8, nsa, f) != nsa) return 2;
  std::vector<uint8_t> queries(nq * qlen);
  if (fread(queries.data(), 1, nq * qlen, f) != nq * qlen) return 2;
  fclose(f);

  int trials = argc > 2 ? atoi(argv[2]) : 3;
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  double best = 0;
  uint64_t hits = 0, checksum = 0;
  for (int t = 0; t < trials; ++t) {
    uint64_t th = 0, tc = 0;
    auto t0 = std::chrono::steady_clock::now();
#pragma omp parallel reduction(+ : th) reduction(^ : tc)
    {
      uint64_t sink = 0, h = 0;
#pragma omp for schedule(static)
      for (int64_t i = 0; i < (int64_t)nq; ++i) {
        uint64_t s, e;
        uint64_t c = count_query(ix, &queries[i * qlen], (int)qlen, s, e);
        if (c) h += locate_range(ix, s, e, &sink);
      }
      th += h;
      tc ^= sink;
    }
    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    double qps = (double)nq / dt;
    if (qps > best) best = qps;
    hits = th;
    checksum = tc;
    fprintf(stderr, "trial %d: %.0f q/s (%.2fs, %llu hits)\n", t, qps, dt,
            (unsigned long long)th);
  }
  printf(
      "{\"queries_per_sec\": %.1f, \"threads\": %d, \"num_queries\": %llu, "
      "\"query_len\": %llu, \"hits\": %llu, \"checksum\": %llu}\n",
      best, threads, (unsigned long long)nq, (unsigned long long)qlen,
      (unsigned long long)hits, (unsigned long long)checksum);
  return 0;
}
