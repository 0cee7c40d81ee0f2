// SA-IS linear-time suffix array construction (Nong, Zhang & Chan 2009).
//
// TPU-native replacement for the reference's external `libsufr` Rust crate
// (reference: Cargo.toml:23, src/fm_index.rs:156-181).  Suffix-array
// construction is inherently sequential/irregular and runs once per index on
// the host, off the query hot path, so it lives in C++ behind a ctypes
// binding rather than on the device (SURVEY.md section 2, native component #4).
//
// Contract: the caller passes `text` of length `n` whose final character
// text[n-1] is a UNIQUE, SMALLEST terminator (the virtual sentinel '$' is
// appended as byte 0 by the Python caller).  Output `sa` receives the
// lexicographic suffix array of text; sa[0] == n-1 always.
//
// Because the suffixes of a sentinel-terminated text are pairwise distinct,
// the suffix array is unique, so any correct algorithm reproduces libsufr's
// result bit-for-bit downstream (SURVEY.md section 2, item 4).
//
// The index type is templated over int32 / uint32 / int64.  The uint32
// instantiation is the one that matters at genome scale: GRCh38's
// n = 3.1e9 exceeds int32 but fits uint32, and a 4-byte SA halves the
// memory traffic (and peak RSS: ~12.5 GB instead of ~25 GB) of the int64
// path.  All loops are therefore written sentinel-based (EMPTY = max value)
// rather than sign-based.

#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

template <typename C, typename I>
void sais_core(const C* s, I* sa, I n, I K) {
  const I EMPTY = std::numeric_limits<I>::max();
  if (n == 1) {
    sa[0] = 0;
    return;
  }

  // Classify suffixes: S-type (true) iff suffix i < suffix i+1.
  std::vector<bool> t(n);
  t[n - 1] = true;
  for (I i = n - 1; i-- > 0;)
    t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);
  auto is_lms = [&](I i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<I> bkt(K);
  auto get_buckets = [&](bool end) {
    std::fill(bkt.begin(), bkt.end(), I(0));
    for (I i = 0; i < n; ++i) ++bkt[s[i]];
    I sum = 0;
    for (I k = 0; k < K; ++k) {
      sum += bkt[k];
      bkt[k] = end ? sum : sum - bkt[k];
    }
  };

  auto induce = [&]() {
    // Induce L-type suffixes left-to-right from bucket heads.
    get_buckets(false);
    for (I i = 0; i < n; ++i) {
      I j = sa[i];
      if (j != EMPTY && j > 0 && !t[j - 1]) sa[bkt[s[j - 1]]++] = j - 1;
    }
    // Induce S-type suffixes right-to-left from bucket tails.
    get_buckets(true);
    for (I i = n; i-- > 0;) {
      I j = sa[i];
      if (j != EMPTY && j > 0 && t[j - 1]) sa[--bkt[s[j - 1]]] = j - 1;
    }
  };

  // Stage 1: approximately sort LMS suffixes by first placing them at their
  // bucket tails and inducing.
  std::fill(sa, sa + n, EMPTY);
  get_buckets(true);
  for (I i = 1; i < n; ++i)
    if (is_lms(i)) sa[--bkt[s[i]]] = i;
  induce();

  // Compact the (now substring-sorted) LMS positions into sa[0..n1).
  I n1 = 0;
  for (I i = 0; i < n; ++i)
    if (sa[i] != EMPTY && sa[i] > 0 && is_lms(sa[i])) sa[n1++] = sa[i];

  // Name LMS substrings; equal substrings share a name.
  std::fill(sa + n1, sa + n, EMPTY);
  I name = 0;
  I prev = EMPTY;
  for (I i = 0; i < n1; ++i) {
    I pos = sa[i];
    bool diff = false;
    if (prev == EMPTY) {
      diff = true;
    } else {
      for (I d = 0;; ++d) {
        if (s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
          diff = true;
          break;
        }
        if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) break;
      }
    }
    if (diff) {
      ++name;
      prev = pos;
    }
    sa[n1 + pos / 2] = name - 1;
  }
  I j = n - 1;
  for (I i = n; i-- > n1;)
    if (sa[i] != EMPTY) sa[j--] = sa[i];

  // Stage 2: sort the reduced problem (LMS-substring names in text order).
  I* s1 = sa + n - n1;
  I* sa1 = sa;
  if (name < n1) {
    sais_core<I, I>(s1, sa1, n1, name);
  } else {
    for (I i = 0; i < n1; ++i) sa1[s1[i]] = i;
  }

  // Stage 3: map reduced ranks back to LMS positions and induce the rest.
  std::vector<I> lms;
  lms.reserve(n1);
  for (I i = 1; i < n; ++i)
    if (is_lms(i)) lms.push_back(i);
  for (I i = 0; i < n1; ++i) sa1[i] = lms[sa1[i]];
  std::fill(sa + n1, sa + n, EMPTY);
  get_buckets(true);
  for (I i = n1; i-- > 0;) {
    I p = sa[i];
    sa[i] = EMPTY;
    sa[--bkt[s[p]]] = p;
  }
  induce();
}

}  // namespace

extern "C" {

// Parallel random gather dst[i] = src[idx[i]] — the BWT-from-SA pass is a
// multi-G-element random byte gather, memory-latency bound; OpenMP threads
// hide miss latency across cores.
int awry_gather_u8(const uint8_t* src, const int64_t* idx, uint8_t* dst, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = src[idx[i]];
  return 0;
}

// uint32-index variant (no 8-byte index temporary at genome scale).
int awry_gather_u8_u32(const uint8_t* src, const uint32_t* idx, uint8_t* dst, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = src[idx[i]];
  return 0;
}

// Returns 0 on success. text[n-1] must be the unique smallest byte.
int awry_sais_i32(const uint8_t* text, int32_t n, int32_t* sa) {
  if (n <= 0) return -1;
  sais_core<uint8_t, int32_t>(text, sa, n, 256);
  return 0;
}

// n may be up to 2^32 - 2 (EMPTY = 2^32 - 1 is reserved).
int awry_sais_u32(const uint8_t* text, uint32_t n, uint32_t* sa) {
  if (n == 0 || n >= std::numeric_limits<uint32_t>::max()) return -1;
  sais_core<uint8_t, uint32_t>(text, sa, n, 256);
  return 0;
}

int awry_sais_i64(const uint8_t* text, int64_t n, int64_t* sa) {
  if (n <= 0) return -1;
  sais_core<uint8_t, int64_t>(text, sa, n, int64_t(256));
  return 0;
}
}
