// Batched CIGAR walk for GetAlignments (aligner.go:1529-1564).
//
// The per-hit walk — M-segment mismatch collection (reference+read locus
// lists), indel/softclip counters, the reversed-hit back-to-front order —
// was the largest GIL-held Python term left in the host tail
// (ARCHITECTURE.md round-5 note): ~0.2 core-ms/pair of tiny numpy calls
// and per-op Python loops.  This runs the whole batch in C++ with the GIL
// released; the Python implementation remains the authoritative spec and
// the no-toolchain fallback (parity: tests/test_rfa.py cigar-walk test +
// e2e byte-identity with the native path toggled).
//
// Layout: hits are flattened — cigars as (op,len) int32 pairs, reference
// windows and read codes as uint8 runs — with int64 offset tables.  Outputs
// are fixed-width counter rows plus mismatch locus/readloc arrays written
// at each hit's read-offset base (a mismatch count can never exceed the
// read length, so the read offsets double as output bases).

#include <cstdint>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

struct Walk {
    const int32_t* cig;      // flat (op, len) pairs
    const int64_t* cig_off;  // pair-count offsets, n+1
    const uint8_t* ref;
    const int64_t* ref_off;
    const uint8_t* read;
    const int64_t* read_off;
    const uint8_t* rev;
    const int64_t* ref_start;
    const int64_t* ref_end;
    const int32_t* edit_dist;
    int32_t* counters;       // (n, 6): matches, mism, indels, indel_len, sc, sc_len
    int64_t* mism_locs;      // written at read_off[i] base
    int32_t* mism_read_locs; // same base
    int32_t* mism_n;         // per hit
};

static void walk_one(const Walk& W, int64_t i) {
    const int64_t c0 = W.cig_off[i], c1 = W.cig_off[i + 1];
    const uint8_t* ref = W.ref + W.ref_off[i];
    const int64_t ref_len = W.ref_off[i + 1] - W.ref_off[i];
    const uint8_t* read = W.read + W.read_off[i];
    const int64_t read_len = W.read_off[i + 1] - W.read_off[i];
    const bool rev = W.rev[i] != 0;
    const int64_t rstart = W.ref_start[i], rend = W.ref_end[i];
    int64_t* locs = W.mism_locs + W.read_off[i];
    int32_t* rlocs = W.mism_read_locs + W.read_off[i];

    int64_t matches = 0, indels = 0, indel_len = 0, sc = 0, sc_len = 0;
    int64_t ref_o = 0, read_o = 0;
    int32_t nm = 0;
    // reversed hits walk the cigar back-to-front (aligner.go:1524-1564)
    for (int64_t step = 0; step < c1 - c0; ++step) {
        int64_t k = rev ? (c1 - 1 - step) : (c0 + step);
        int32_t op = W.cig[2 * k], ln = W.cig[2 * k + 1];
        if (op == 0) {
            matches += ln;
            int64_t limit = ln;
            limit = std::min(limit, ref_len - ref_o);
            limit = std::min(limit, read_len - read_o);
            if (limit < 0) limit = 0;
            for (int64_t m = 0; m < limit; ++m) {
                if (ref[ref_o + m] != read[read_o + m]) {
                    locs[nm] = rev ? (rend - (ref_o + m)) : (ref_o + rstart + m);
                    rlocs[nm] = (int32_t)(read_o + m);
                    ++nm;
                }
            }
            ref_o += ln;
            read_o += ln;
        } else if (op == 1) {
            indels += 1;
            indel_len += ln;
            read_o += ln;
        } else if (op == 2) {
            indels += 1;
            indel_len += ln;
            ref_o += ln;
        } else if (op == 3) {
            sc += 1;
            sc_len += ln;
            read_o += ln;
        }
    }
    int64_t mismatches = (int64_t)W.edit_dist[i] - indel_len;
    matches -= mismatches;
    if (mismatches < 0) mismatches = 0;
    int32_t* row = W.counters + i * 6;
    row[0] = (int32_t)matches;
    row[1] = (int32_t)mismatches;
    row[2] = (int32_t)indels;
    row[3] = (int32_t)indel_len;
    row[4] = (int32_t)sc;
    row[5] = (int32_t)sc_len;
    W.mism_n[i] = nm;
}

}  // namespace

extern "C" int cigar_walk_batch(
    const int32_t* cig, const int64_t* cig_off,
    const uint8_t* ref, const int64_t* ref_off,
    const uint8_t* read, const int64_t* read_off,
    const uint8_t* rev, const int64_t* ref_start, const int64_t* ref_end,
    const int32_t* edit_dist,
    int64_t n,
    int32_t* counters, int64_t* mism_locs, int32_t* mism_read_locs,
    int32_t* mism_n, int32_t n_threads) {
    Walk W{cig, cig_off, ref, ref_off, read, read_off, rev,
           ref_start, ref_end, edit_dist,
           counters, mism_locs, mism_read_locs, mism_n};
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) walk_one(W, i);
    };
    if (n_threads <= 1 || n < 256) {
        work(0, n);
        return 0;
    }
    int nt = std::min<int32_t>(n_threads, 16);
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t)
        threads.emplace_back(work, n * t / nt, n * (t + 1) / nt);
    for (auto& th : threads) th.join();
    return 0;
}
