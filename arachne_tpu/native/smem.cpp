// Native SMEM seeding over the planar FM-index layout.
//
// Exact reimplementation of align/smem.py's three-pass collection
// (mem_collect_intv semantics, bwamem.c:114-162 / bwt.c:262-379) operating
// on the same arrays the Python/JAX paths use: bwt_words (uint32, 16
// bases/word MSB-first) and occ checkpoints (int64 [n_blocks,4], every 128
// bases).  The Python inner loops of the dense host engine hold the GIL
// and dominate the superbatch host phase; this runs the whole state
// machine in C++ (optionally across threads) and releases the GIL for the
// duration of the ctypes call.
//
// Output per read: up to MAXS (k, l, s, qb, qe) int64 rows sorted by the
// packed (qb<<32|qe) key, exactly like the reference's intv sort.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <chrono>
#include <vector>
#include <thread>

namespace {

struct FM {
    const uint32_t* words;
    const int64_t* occ;   // (n_blocks, 4)
    const int64_t* L2;    // len 5
    int64_t primary;
    int64_t seq_len;
    int64_t n_words;
};

struct Intv {
    int64_t k, l, s;
    int32_t info;  // query end of the match (exclusive)
};

struct Mem {
    int64_t k, l, s;
    int32_t qb, qe;
};

static inline void occ4(const FM& fm, int64_t k, int64_t out[4]) {
    if (k == -1) {
        out[0] = out[1] = out[2] = out[3] = 0;
        return;
    }
    if (k == fm.seq_len) {
        for (int c = 0; c < 4; ++c) out[c] = fm.L2[c + 1] - fm.L2[c];
        return;
    }
    int64_t kk = k - (k >= fm.primary ? 1 : 0);
    int64_t block = kk >> 7;
    int64_t j = kk & 127;
    int64_t wi = j >> 4;
    int64_t p = j & 15;
    const int64_t* base = fm.occ + block * 4;
    int64_t cnt[4] = {0, 0, 0, 0};
    int64_t invalid = 0;
    for (int64_t w = 0; w <= wi; ++w) {
        int64_t widx = block * 8 + w;
        uint32_t word = widx < fm.n_words ? fm.words[widx] : 0u;
        int64_t nvalid = (w < wi) ? 16 : (p + 1);
        uint64_t shift = (uint64_t)((16 - nvalid) * 2);
        uint32_t mask = (uint32_t)~((1ull << shift) - 1ull);
        uint32_t y = word & mask;
        uint32_t ny = ~y;
        for (int c = 0; c < 4; ++c) {
            uint32_t hi = (c & 2) ? y : ny;
            uint32_t lo = (c & 1) ? y : ny;
            uint32_t t = (hi >> 1) & lo & 0x55555555u;
            cnt[c] += __builtin_popcount(t);
        }
        invalid += 16 - nvalid;
    }
    cnt[0] -= invalid;  // the c==0 formula also counts masked-off slots
    for (int c = 0; c < 4; ++c) out[c] = base[c] + cnt[c];
}

// bwt_extend (bwt.c:262-275): ok[c] = interval after extending with c.
// Prefetch the occ-checkpoint and bwt-word cache lines a rank query at
// row k will touch.  At human-genome scale the tables are ~3 GB, every
// occ4 is a DRAM miss (~50% of single-thread align time measured on the
// 6.2e9-row index), and the two occ4s of one extend — plus the next
// loop iteration's — are independent, so issuing their line addresses
// early lets the core overlap the misses instead of serializing them.
static inline void prefetch_rank(const FM& fm, int64_t k) {
    if (k < 0 || k >= fm.seq_len) return;
    int64_t kk = k - (k >= fm.primary ? 1 : 0);
    int64_t block = kk >> 7;
    __builtin_prefetch(fm.occ + block * 4);
    __builtin_prefetch(fm.words + block * 8);
}

static inline void prefetch_extend(const FM& fm, int64_t x0, int64_t x1,
                                   int64_t x2, bool is_back) {
    int64_t xb = is_back ? x0 : x1;
    prefetch_rank(fm, xb - 1);
    prefetch_rank(fm, xb - 1 + x2);
}

static inline void extend(const FM& fm, int64_t x0, int64_t x1, int64_t x2,
                          bool is_back, int64_t ok0[4], int64_t ok1[4],
                          int64_t ok2[4]) {
    int64_t xb = is_back ? x0 : x1;
    int64_t tk[4], tl[4];
    prefetch_extend(fm, x0, x1, x2, is_back);
    occ4(fm, xb - 1, tk);
    occ4(fm, xb - 1 + x2, tl);
    int64_t okb[4], oks[4], oko[4];
    for (int c = 0; c < 4; ++c) {
        okb[c] = fm.L2[c] + 1 + tk[c];
        oks[c] = tl[c] - tk[c];
    }
    int64_t hit = (xb <= fm.primary && xb + x2 - 1 >= fm.primary) ? 1 : 0;
    oko[3] = (is_back ? x1 : x0) + hit;
    oko[2] = oko[3] + oks[3];
    oko[1] = oko[2] + oks[2];
    oko[0] = oko[1] + oks[1];
    for (int c = 0; c < 4; ++c) {
        ok2[c] = oks[c];
        if (is_back) { ok0[c] = okb[c]; ok1[c] = oko[c]; }
        else         { ok0[c] = oko[c]; ok1[c] = okb[c]; }
    }
}

// bwt_smem1a (bwt.c:289-351): SMEMs covering query position x.
// Returns next scan position; appends to mems.
static int32_t smem1a(const FM& fm, const uint8_t* q, int32_t len, int32_t x,
                      int64_t min_intv, int64_t max_intv,
                      std::vector<Mem>& mems, std::vector<Intv>& curr,
                      std::vector<Intv>& prev) {
    if (q[x] > 3) return x + 1;
    if (min_intv < 1) min_intv = 1;
    int c0 = q[x];
    Intv ik;
    ik.k = fm.L2[c0] + 1;
    ik.l = fm.L2[3 - c0] + 1;
    ik.s = fm.L2[c0 + 1] - fm.L2[c0];
    ik.info = x + 1;

    curr.clear();
    int64_t ok0[4], ok1[4], ok2[4];
    int32_t i = x + 1;
    for (; i < len; ++i) {
        if (ik.s < max_intv) {  // 3rd-pass variant; max_intv==0 in pass 1/2
            curr.push_back(ik);
            break;
        }
        if (q[i] < 4) {
            int c = 3 - q[i];
            extend(fm, ik.k, ik.l, ik.s, false, ok0, ok1, ok2);
            if (ok2[c] != ik.s) {
                curr.push_back(ik);
                if (ok2[c] < min_intv) break;
            }
            ik.k = ok0[c]; ik.l = ok1[c]; ik.s = ok2[c]; ik.info = i + 1;
        } else {
            curr.push_back(ik);
            break;
        }
    }
    if (i == len) curr.push_back(ik);
    std::reverse(curr.begin(), curr.end());
    int32_t ret = curr[0].info;
    prev = curr;

    size_t mems0 = mems.size();
    for (int32_t bi = x - 1; bi >= -1; --bi) {
        int c = (bi < 0) ? -1 : (q[bi] < 4 ? q[bi] : -1);
        curr.clear();
        for (size_t pi = 0; pi < prev.size(); ++pi) {
            const Intv& p = prev[pi];
            if (pi + 1 < prev.size()) {
                // overlap the next item's rank-table misses with this one
                const Intv& nx = prev[pi + 1];
                prefetch_extend(fm, nx.k, nx.l, nx.s, true);
            }
            bool have_oc = false;
            Intv oc;
            if (c >= 0 && p.s >= max_intv) {
                extend(fm, p.k, p.l, p.s, true, ok0, ok1, ok2);
                oc.k = ok0[c]; oc.l = ok1[c]; oc.s = ok2[c]; oc.info = p.info;
                have_oc = true;
            }
            if (c < 0 || p.s < max_intv || (have_oc && oc.s < min_intv)) {
                if (curr.empty()) {
                    bool fresh = (mems.size() == mems0) ||
                                 (bi + 1 < mems.back().qb);
                    if (fresh) {
                        Mem m;
                        m.k = p.k; m.l = p.l; m.s = p.s;
                        m.qb = bi + 1; m.qe = p.info;
                        mems.push_back(m);
                    }
                }
            } else if (curr.empty() || oc.s != curr.back().s) {
                curr.push_back(oc);
            }
        }
        if (curr.empty()) break;
        prev = curr;
    }
    std::reverse(mems.begin() + mems0, mems.end());
    return ret;
}

// bwt_seed_strategy1 (bwt.c:358-379): LAST-like forward seeding.
static int32_t seed_strategy1(const FM& fm, const uint8_t* q, int32_t len,
                              int32_t x, int32_t min_len, int64_t max_intv,
                              bool* found, Mem* out) {
    *found = false;
    if (q[x] > 3) return x + 1;
    int c0 = q[x];
    int64_t k = fm.L2[c0] + 1;
    int64_t l = fm.L2[3 - c0] + 1;
    int64_t s = fm.L2[c0 + 1] - fm.L2[c0];
    int64_t ok0[4], ok1[4], ok2[4];
    for (int32_t i = x + 1; i < len; ++i) {
        if (q[i] < 4) {
            int c = 3 - q[i];
            extend(fm, k, l, s, false, ok0, ok1, ok2);
            if (ok2[c] < max_intv && i - x >= min_len) {
                if (ok2[c] > 0) {
                    out->k = ok0[c]; out->l = ok1[c]; out->s = ok2[c];
                    out->qb = x; out->qe = i + 1;
                    *found = true;
                }
                return i + 1;
            }
            k = ok0[c]; l = ok1[c]; s = ok2[c];
        } else {
            return i + 1;
        }
    }
    return len;
}

// mem_collect_intv (bwamem.c:114-162) for one read.
static void collect_one(const FM& fm, const uint8_t* q, int32_t len,
                        int32_t min_seed_len, int32_t split_len,
                        int32_t split_width, int64_t max_mem_intv,
                        int64_t* out_row, int32_t* out_n, uint8_t* ovf,
                        int32_t MAXS) {
    std::vector<Mem> all, found;
    std::vector<Intv> curr, prev;
    curr.reserve(len + 1);
    prev.reserve(len + 1);
    // pass 1
    for (int32_t x = 0; x < len;) {
        if (q[x] < 4) {
            found.clear();
            x = smem1a(fm, q, len, x, 1, 0, found, curr, prev);
            for (const Mem& m : found)
                if (m.qe - m.qb >= min_seed_len) all.push_back(m);
        } else {
            ++x;
        }
    }
    // pass 2: re-seed inside long, low-occ SMEMs
    size_t old_n = all.size();
    for (size_t kx = 0; kx < old_n; ++kx) {
        Mem p = all[kx];
        if (p.qe - p.qb < split_len || p.s > split_width) continue;
        found.clear();
        smem1a(fm, q, len, (p.qb + p.qe) >> 1, p.s + 1, 0, found, curr, prev);
        for (const Mem& m : found)
            if (m.qe - m.qb >= min_seed_len) all.push_back(m);
    }
    // pass 3: LAST-like
    if (max_mem_intv > 0) {
        for (int32_t x = 0; x < len;) {
            if (q[x] < 4) {
                bool got;
                Mem m;
                x = seed_strategy1(fm, q, len, x, min_seed_len, max_mem_intv,
                                   &got, &m);
                if (got && m.s > 0) all.push_back(m);
            } else {
                ++x;
            }
        }
    }
    std::stable_sort(all.begin(), all.end(), [](const Mem& a, const Mem& b) {
        uint64_t ka = ((uint64_t)(uint32_t)a.qb << 32) | (uint32_t)a.qe;
        uint64_t kb = ((uint64_t)(uint32_t)b.qb << 32) | (uint32_t)b.qe;
        return ka < kb;
    });
    if ((int32_t)all.size() > MAXS) {
        *ovf = 1;
        *out_n = 0;
        return;
    }
    *ovf = 0;
    *out_n = (int32_t)all.size();
    for (size_t t = 0; t < all.size(); ++t) {
        out_row[t * 5 + 0] = all[t].k;
        out_row[t * 5 + 1] = all[t].l;
        out_row[t * 5 + 2] = all[t].s;
        out_row[t * 5 + 3] = all[t].qb;
        out_row[t * 5 + 4] = all[t].qe;
    }
}

}  // namespace

extern "C" int smem_collect_batch(
    const uint32_t* words, int64_t n_words, const int64_t* occ,
    const int64_t* L2, int64_t primary, int64_t seq_len,
    const uint8_t* qs, const int32_t* qlens, int32_t n_reads, int32_t L,
    int32_t min_seed_len, int32_t split_len, int32_t split_width,
    int64_t max_mem_intv,
    int64_t* out, int32_t* out_n, uint8_t* overflow,
    int32_t MAXS, int32_t n_threads) {
    FM fm{words, occ, L2, primary, seq_len, n_words};
    auto work = [&](int32_t lo, int32_t hi) {
        for (int32_t r = lo; r < hi; ++r) {
            collect_one(fm, qs + (int64_t)r * L, qlens[r], min_seed_len,
                        split_len, split_width, max_mem_intv,
                        out + (int64_t)r * MAXS * 5, out_n + r, overflow + r,
                        MAXS);
        }
    };
    if (n_threads <= 1 || n_reads < 64) {
        work(0, n_reads);
        return 0;
    }
    int nt = std::min<int32_t>(n_threads, 16);
    std::vector<std::thread> threads;
    int32_t per = (n_reads + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int32_t lo = t * per, hi = std::min(n_reads, lo + per);
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
    return 0;
}

// ---------------------------------------------------------------------------
// Sampled-SA lookup: bwt_sa (bwt.c:86-96) — inverse-Psi walk to the nearest
// sampled row.  At genome scale (sampled SA, sa_intv=32) the numpy walk was
// the chaining stage's dominant term (~0.5 ms/occurrence); here each step is
// one occ4 + one word read.
// ---------------------------------------------------------------------------

namespace {

// invPsi (bwt.c:53-59): previous row in the LF walk.
static inline int64_t inv_psi(const FM& fm, int64_t k) {
    if (k == fm.primary) return 0;
    int64_t x = k - (k > fm.primary ? 1 : 0);
    uint32_t word = fm.words[x >> 4];
    uint32_t sh = (uint32_t)(((~x) & 15) << 1);
    int c = (int)((word >> sh) & 3u);
    int64_t occv[4];
    occ4(fm, k, occv);
    return fm.L2[c] + occv[c];
}

}  // namespace

// Build the sampled suffix array by walking the full LF cycle once
// (bwt_cal_sa semantics, bwt.c:62-84): start at row 0 (SA value n) and
// apply invPsi/LF n times, recording SA values at every sa_intv-th row.
// Used by the incremental (ropebwt) index build, which has no full SA to
// sample from.  out_sampled must hold n/sa_intv + 1 entries; entry 0 is
// overwritten with the -1 sentinel to mirror build_fmindex.
extern "C" int sa_sample_walk(
    const uint32_t* words, int64_t n_words, const int64_t* occ,
    const int64_t* L2, int64_t primary, int64_t seq_len,
    int64_t sa_intv, int64_t* out_sampled) {
    FM fm{words, occ, L2, primary, seq_len, n_words};
    const int64_t mask = sa_intv - 1;
    const int shift = __builtin_ctzll((uint64_t)sa_intv);
    int64_t cur = 0;
    for (int64_t v = seq_len; v >= 0; --v) {
        if ((cur & mask) == 0) out_sampled[cur >> shift] = v;
        if (v) cur = inv_psi(fm, cur);
    }
    out_sampled[0] = -1;  // bwt_cal_sa's sa[0] = -1 sentinel (bwt.c:83)
    return 0;
}

// Parallel sampled-SA construction (bwt_cal_sa semantics, bwt.c:62-84).
//
// The serial walk is one 2n-step inv_psi pointer chase (~35 min at
// GRCh38 scale: every step a dependent DRAM miss).  This version splits
// the text-position space into chunks and walks them concurrently:
// the row of the suffix starting at each chunk boundary p is found by
// FM backward search of the text window T[p, p+L) extended until its SA
// interval narrows to width 1 (that unique row IS the suffix's row);
// each walk segment then covers its v-range independently, and every
// BWT row is visited exactly once globally, so the sampled writes are
// race-free without locks.  Threads interleave several chunks and
// prefetch each chain's next rank lines, overlapping the DRAM misses
// the serial chase pays one at a time.
static inline int get2bp(const uint8_t* pac2, int64_t i) {
    return (pac2[i >> 2] >> ((3 - (i & 3)) * 2)) & 3;
}

// row of the suffix starting at text position p, or -1 if the window
// never becomes unique (caller retries a shifted boundary)
static int64_t suffix_row(const FM& fm, const uint8_t* pac2, int64_t n,
                          int64_t p) {
    for (int64_t L = 64; L <= 1024; L <<= 1) {
        if (p + L > n) return -1;
        int c = get2bp(pac2, p + L - 1);
        int64_t k = fm.L2[c] + 1, l = fm.L2[c + 1];
        for (int64_t i = L - 2; i >= 0 && k <= l; --i) {
            c = get2bp(pac2, p + i);
            int64_t tk[4], tl[4];
            occ4(fm, k - 1, tk);
            occ4(fm, l, tl);
            k = fm.L2[c] + tk[c] + 1;
            l = fm.L2[c] + tl[c];
        }
        if (k > l) return -1;  // cannot happen for a true substring
        if (k == l) return k;
    }
    return -1;
}

extern "C" int sa_sample_walk_par(
    const uint32_t* words, int64_t n_words, const int64_t* occ,
    const int64_t* L2, int64_t primary, int64_t seq_len,
    int64_t sa_intv, int64_t* out_sampled, const uint8_t* pac2,
    int32_t n_chunks, int32_t n_threads, volatile int64_t* progress) {
    FM fm{words, occ, L2, primary, seq_len, n_words};
    const int64_t mask = sa_intv - 1;
    const int shift = __builtin_ctzll((uint64_t)sa_intv);
    if (n_chunks < 1) n_chunks = 1;
    // boundaries in v-space; bounds[t] = start of chunk t (v_lo), chunk t
    // covers [bounds[t], bounds[t+1]); bounds[n_chunks] = seq_len
    std::vector<int64_t> bounds(n_chunks + 1);
    std::vector<int64_t> rows(n_chunks + 1, -1);
    bounds[0] = 0;
    bounds[n_chunks] = seq_len;
    rows[n_chunks] = 0;  // row of the $-suffix (v = seq_len) is 0
    int used = 1;
    for (int t = 1; t < n_chunks; ++t) {
        int64_t ideal = seq_len * (int64_t)t / n_chunks;
        int64_t r = -1, p = ideal;
        for (int tries = 0; tries < 64 && r < 0; ++tries) {
            if (p + 1024 > seq_len || p <= bounds[used - 1]) break;
            r = suffix_row(fm, pac2, seq_len, p);
            if (r < 0) p -= 1009;  // shift off a repeat and retry
        }
        if (r >= 0) {
            bounds[used] = p;
            rows[used] = r;
            ++used;
        }
        // else: drop the boundary — the previous chunk absorbs this range
    }
    bounds[used] = seq_len;
    rows[used] = 0;
    int total = used;  // chunks: [bounds[t], bounds[t+1]) for t in [0,total)

    std::vector<int64_t> done(std::max(total, 1), 0);
    auto run_range = [&](int t0, int t1) {
        // interleave this thread's chunks: K independent inv_psi chains
        // keep K DRAM misses in flight instead of 1
        int K = t1 - t0;
        std::vector<int64_t> cur(K), v(K), lo(K);
        for (int j = 0; j < K; ++j) {
            int t = t0 + j;
            cur[j] = rows[t + 1];       // row of suffix at v = bounds[t+1]
            v[j] = bounds[t + 1];
            lo[j] = bounds[t];
            if (t + 1 == total) {
                // top chunk starts at the $-suffix row and records it
                out_sampled[0] = seq_len;  // row 0 (always sampled)
            }
        }
        int active = K;
        while (active > 0) {
            active = 0;
            for (int j = 0; j < K; ++j) {
                if (v[j] <= lo[j]) continue;
                int64_t c = inv_psi(fm, cur[j]);
                cur[j] = c;
                v[j] -= 1;
                if ((c & mask) == 0) out_sampled[c >> shift] = v[j];
                if (v[j] > lo[j]) {
                    ++active;
                    prefetch_rank(fm, c);  // next step's rank lines
                }
            }
            if (progress) {
                int64_t d = 0;
                for (int j = 0; j < K; ++j) d += bounds[t0 + j + 1] - v[j];
                done[t0] = d;
            }
        }
    };
    int nt = std::max(1, std::min<int32_t>(n_threads, total));
    std::vector<std::thread> threads;
    std::thread reporter;
    volatile bool stop = false;
    if (progress) {
        reporter = std::thread([&]() {
            while (!stop) {
                int64_t d = 0;
                for (int t = 0; t < total; ++t) d += done[t];
                *progress = d;
                std::this_thread::sleep_for(std::chrono::milliseconds(500));
            }
        });
    }
    for (int t = 0; t < nt; ++t)
        threads.emplace_back(run_range, total * t / nt, total * (t + 1) / nt);
    for (auto& th : threads) th.join();
    if (progress) {
        stop = true;
        reporter.join();
        *progress = seq_len;
    }
    out_sampled[0] = -1;  // bwt_cal_sa's sa[0] = -1 sentinel (bwt.c:83)
    return 0;
}

extern "C" int sa_batch(
    const uint32_t* words, int64_t n_words, const int64_t* occ,
    const int64_t* L2, int64_t primary, int64_t seq_len,
    const int64_t* sampled, int64_t sa_intv,
    const int64_t* rows, int64_t n, int64_t* out, int32_t n_threads) {
    FM fm{words, occ, L2, primary, seq_len, n_words};
    const int64_t mask = sa_intv - 1;
    const int shift = __builtin_ctzll((uint64_t)sa_intv);
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            int64_t cur = rows[i], steps = 0;
            while (cur & mask) {
                cur = inv_psi(fm, cur);
                ++steps;
            }
            out[i] = steps + sampled[cur >> shift];
        }
    };
    if (n_threads <= 1 || n < 1024) {
        work(0, n);
        return 0;
    }
    int nt = std::min<int32_t>(n_threads, 16);
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
    return 0;
}
