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

  // K+2 slots: the count pass writes bkt[s[i]+1] with s[i] up to K
  std::vector<SI> bkt(K + 2);
  auto bucket_ends = [&](bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (SI i = 0; i < n; ++i) bkt[s[i] + 1]++;
    for (SI c = 1; c <= K + 1; ++c) bkt[c] += bkt[c - 1];
    // bkt[c] = start of bucket c; for "end" we want exclusive ends
    if (end) {
      // shift: end[c] = start[c+1]
      std::vector<SI> e(K + 2);
      for (SI c = 0; c <= K; ++c) e[c] = bkt[c + 1];
      e[K + 1] = n;
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

// ---------------------------------------------------------------------------
// Memory-lean SA-IS (the production path).
//
// The straightforward implementation above allocates ~27 bytes/symbol of
// side vectors (name[] alone is 8n) — at human-genome scale (6.2e9 fwd+rev
// rows) that is ~170 GB and forced index construction onto the much slower
// incremental-BWT path even on large-RAM hosts.  This variant is the
// classic in-place layout from the Nong/Zhang/Chan paper's reference code:
// every intermediate (sorted LMS list, substring names keyed by p/2, the
// reduced problem and its SA) lives inside the caller's sa[] buffer, so the
// peak is 8n (sa) + n (text) + n/8 (type bits) + buckets.  Output is
// identical to sais_core (parity: tests/test_index.py::test_sais_lean_parity).
// ---------------------------------------------------------------------------

namespace {

template <typename SI, typename CI>
static void lean_buckets(const CI* s, SI* bkt, SI n, SI K, bool end) {
  for (SI c = 0; c <= K; ++c) bkt[c] = 0;
  for (SI i = 0; i < n; ++i) bkt[s[i]]++;
  SI sum = 0;
  for (SI c = 0; c <= K; ++c) {
    sum += bkt[c];
    bkt[c] = end ? sum : sum - bkt[c];
  }
}

template <typename SI, typename CI>
static void lean_induce_l(const std::vector<bool>& t, SI* sa, const CI* s,
                          SI* bkt, SI n, SI K) {
  lean_buckets(s, bkt, n, K, false);
  for (SI i = 0; i < n; ++i) {
    SI j = sa[i] - 1;
    if (sa[i] > 0 && !t[j]) sa[bkt[s[j]]++] = j;
  }
}

template <typename SI, typename CI>
static void lean_induce_s(const std::vector<bool>& t, SI* sa, const CI* s,
                          SI* bkt, SI n, SI K) {
  lean_buckets(s, bkt, n, K, true);
  for (SI i = n - 1; i >= 0; --i) {
    SI j = sa[i] - 1;
    if (sa[i] > 0 && t[j]) sa[--bkt[s[j]]] = j;
    if (i == 0) break;
  }
}

// s must end with a unique smallest sentinel at position n-1; n >= 2.
template <typename SI, typename CI>
static void sais_lean(const CI* s, SI* sa, SI n, SI K) {
  std::vector<bool> t(n);
  t[n - 1] = true;               // sentinel is S-type
  t[n - 2] = false;              // sentinel unique-smallest => s[n-2] is L
  for (SI i = n - 3; i >= 0; --i) {
    t[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1]);
    if (i == 0) break;
  }
  auto is_lms = [&](SI i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<SI> bkt(K + 1);

  // stage 1: induced-sort the LMS substrings
  lean_buckets(s, bkt.data(), n, K, true);
  for (SI i = 0; i < n; ++i) sa[i] = -1;
  for (SI i = 1; i < n; ++i)
    if (is_lms(i)) sa[--bkt[s[i]]] = i;
  lean_induce_l(t, sa, s, bkt.data(), n, K);
  lean_induce_s(t, sa, s, bkt.data(), n, K);

  // compact the sorted LMS positions into sa[0..n1)
  SI n1 = 0;
  for (SI i = 0; i < n; ++i)
    if (is_lms(sa[i])) sa[n1++] = sa[i];

  // name LMS substrings into sa[n1 + p/2] (LMS starts are >= 2 apart, so
  // the p/2 slots are collision-free and n1 + n/2 <= n)
  for (SI i = n1; i < n; ++i) sa[i] = -1;
  SI name = 0, prev = -1;
  for (SI i = 0; i < n1; ++i) {
    SI pos = sa[i];
    bool diff = false;
    for (SI d = 0; d < n; ++d) {
      if (prev == -1 || s[pos + d] != s[prev + d] ||
          t[pos + d] != t[prev + d]) {
        diff = true;
        break;
      }
      if (d > 0 && (is_lms(pos + d) || is_lms(prev + d)))
        break;  // both LMS (else the char/type test above differed)
    }
    if (diff) {
      ++name;
      prev = pos;
    }
    sa[n1 + pos / 2] = name - 1;
  }
  // compact names (text order) into s1 = sa[n - n1 .. n)
  for (SI i = n - 1, j = n - 1; i >= n1; --i) {
    if (sa[i] >= 0) sa[j--] = sa[i];
    if (i == n1) break;
  }
  SI* s1 = sa + n - n1;

  if (name < n1) {
    sais_lean<SI, SI>(s1, sa, n1, name - 1);
  } else {
    for (SI i = 0; i < n1; ++i) sa[s1[i]] = i;
  }

  // stage 2: induce the full SA from the now fully sorted LMS suffixes
  lean_buckets(s, bkt.data(), n, K, true);
  for (SI i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) s1[j++] = i;          // LMS positions in text order
  for (SI i = 0; i < n1; ++i) sa[i] = s1[sa[i]];
  for (SI i = n1; i < n; ++i) sa[i] = -1;
  for (SI i = n1 - 1; i >= 0; --i) {
    SI j = sa[i];
    sa[i] = -1;
    sa[--bkt[s[j]]] = j;
    if (i == 0) break;
  }
  lean_induce_l(t, sa, s, bkt.data(), n, K);
  lean_induce_s(t, sa, s, bkt.data(), n, K);
}

}  // namespace

extern "C" {

// Suffix array of s[0..n-1] where s must already contain a unique
// smallest terminal character at position n-1.  Alphabet size K.
int sais_u8_i64(const uint8_t* s, int64_t* sa, int64_t n, int64_t K) {
  if (n <= 0) return -1;
  if (n == 1) { sa[0] = 0; return 0; }
  sais_lean<int64_t, uint8_t>(s, sa, n, K);
  return 0;
}

int sais_u8_i32(const uint8_t* s, int32_t* sa, int32_t n, int32_t K) {
  if (n <= 0) return -1;
  if (n == 1) { sa[0] = 0; return 0; }
  sais_lean<int32_t, uint8_t>(s, sa, n, K);
  return 0;
}

// The straightforward implementation, kept as a parity oracle for tests.
int sais_ref_u8_i64(const uint8_t* s, int64_t* sa, int64_t n, int64_t K) {
  if (n <= 0) return -1;
  if (n == 1) { sa[0] = 0; return 0; }
  sais_core<int64_t, uint8_t>(s, sa, n, K);
  return 0;
}
}
