// SA-IS suffix array construction (linear time, induced sorting).
//
// Native replacement for the reference's is.c (SA-IS over the packed
// reference) used during index construction; the Python prefix-doubling
// fallback is O(n log^2 n) and impractical beyond ~100 Mbp.  Clean-room
// implementation of the standard Nong/Zhang/Chan algorithm.
//
// Exported C ABI:
//   int sais_i64(const uint8_t* s, int64_t* sa, int64_t n)
//     - s: input string over a byte alphabet; caller appends NOTHING; the
//       virtual sentinel (smallest, unique) is handled internally.
//     - sa: output array of length n (suffix start offsets, sentinel row
//       excluded? NO: sa gets the n suffixes of s sorted; see wrapper).
//
// The Python wrapper builds the +sentinel convention it needs on top.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename SI, typename CI>
void sais_core(const CI* s, SI* sa, SI n, SI K) {
  // suffix array of s[0..n-1]; s must end with a unique smallest sentinel
  // (s[n-1] strictly smaller than every other character).
  std::vector<bool> is_s(n);
  is_s[n - 1] = true;
  for (SI i = n - 2; i >= 0; --i) {
    is_s[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && is_s[i + 1]);
    if (i == 0) break;
  }
  auto is_lms = [&](SI i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

  std::vector<SI> bkt(K + 1);
  auto bucket_ends = [&](bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (SI i = 0; i < n; ++i) bkt[s[i] + 1]++;
    for (SI c = 1; c <= K; ++c) bkt[c] += bkt[c - 1];
    // bkt[c] = start of bucket c; for "end" we want exclusive ends
    if (end) {
      // shift: end[c] = start[c+1]
      std::vector<SI> e(K + 1);
      for (SI c = 0; c < K; ++c) e[c] = bkt[c + 1];
      e[K] = n;
      bkt = e;
    }
  };

  auto induce = [&](const std::vector<SI>& lms) {
    std::fill(sa, sa + n, (SI)-1);
    bucket_ends(true);
    for (SI i = (SI)lms.size() - 1; i >= 0; --i) {
      SI p = lms[i];
      sa[--bkt[s[p]]] = p;
      if (i == 0) break;
    }
    bucket_ends(false);
    for (SI i = 0; i < n; ++i) {
      SI p = sa[i];
      if (p > 0 && !is_s[p - 1]) sa[bkt[s[p - 1]]++] = p - 1;
    }
    bucket_ends(true);
    for (SI i = n - 1; i >= 0; --i) {
      SI p = sa[i];
      if (p > 0 && is_s[p - 1]) sa[--bkt[s[p - 1]]] = p - 1;
      if (i == 0) break;
    }
  };

  // collect LMS positions in order
  std::vector<SI> lms;
  for (SI i = 1; i < n; ++i)
    if (is_lms(i)) lms.push_back(i);

  induce(lms);

  // compact sorted LMS suffixes and name LMS substrings
  SI n_lms = (SI)lms.size();
  std::vector<SI> sorted_lms;
  sorted_lms.reserve(n_lms);
  for (SI i = 0; i < n; ++i)
    if (sa[i] > 0 && is_lms(sa[i])) sorted_lms.push_back(sa[i]);
  // (the sentinel position n-1 is LMS by convention in some variants; here
  // is_lms(n-1) holds iff s[n-2] is L, which the loop covers.)

  std::vector<SI> name(n, (SI)-1);
  SI cur = 0;
  SI prev = -1;
  for (SI idx = 0; idx < (SI)sorted_lms.size(); ++idx) {
    SI p = sorted_lms[idx];
    if (prev == -1) {
      name[p] = cur;
    } else {
      // compare LMS substrings at prev and p
      bool diff = false;
      for (SI d = 0;; ++d) {
        if (prev + d >= n || p + d >= n) { diff = true; break; }
        if (s[prev + d] != s[p + d] || is_s[prev + d] != is_s[p + d]) {
          diff = true;
          break;
        }
        if (d > 0 && (is_lms(prev + d) || is_lms(p + d))) {
          diff = !(is_lms(prev + d) && is_lms(p + d));
          break;
        }
      }
      if (diff) ++cur;
      name[p] = cur;
    }
    prev = p;
  }
  SI n_names = cur + 1;

  std::vector<SI> s1(n_lms), sa1(n_lms);
  for (SI i = 0, j = 0; i < n; ++i)
    if (name[i] >= 0) s1[j++] = name[i];

  if (n_names < n_lms) {
    sais_core<SI, SI>(s1.data(), sa1.data(), n_lms, n_names);
  } else {
    for (SI i = 0; i < n_lms; ++i) sa1[s1[i]] = i;
  }
  std::vector<SI> ordered(n_lms);
  for (SI i = 0; i < n_lms; ++i) ordered[i] = lms[sa1[i]];
  induce(ordered);
}

}  // namespace

extern "C" {

// Suffix array of s[0..n-1] where s must already contain a unique
// smallest terminal character at position n-1.  Alphabet size K.
int sais_u8_i64(const uint8_t* s, int64_t* sa, int64_t n, int64_t K) {
  if (n <= 0) return -1;
  if (n == 1) { sa[0] = 0; return 0; }
  sais_core<int64_t, uint8_t>(s, sa, n, K);
  return 0;
}

int sais_u8_i32(const uint8_t* s, int32_t* sa, int32_t n, int32_t K) {
  if (n <= 0) return -1;
  if (n == 1) { sa[0] = 0; return 0; }
  sais_core<int32_t, uint8_t>(s, sa, n, K);
  return 0;
}
}
