// Native seed chaining + chain filtering.
//
// Exact reimplementation of align/chain.py's mem_chain / chain_weight /
// chain_filter (mem_chain bwamem.c:251-315, test_and_merge :190-211,
// mem_chain_weight :213-232, mem_chain_flt :327-385) over flat arrays, one
// call per superbatch, parallel across reads.  The Python loop (sorted-list
// insert + per-seed merge tests) was 31% of end-to-end wall time; here the
// whole block runs in C++ with the GIL released.
//
// Inputs: per-SMEM arrays (for frac_rep) and per-occurrence seed arrays
// (SA-resolved rbeg + rid, owning-SMEM qbeg/len), each with per-read offset
// tables.  Occurrence iteration order == Python's (SMEM order, then
// stride-sampled occurrence order), which fixes merge decisions and chain
// creation order bit-for-bit.
//
// Outputs, flattened with per-read capacity = that read's occurrence count:
// kept chains in mem_chain_flt's final order (stable weight-descending sort
// of the pos-sorted chain list, drops kept==0), each with pos/rid/weight/
// kept flag/seed count + the rmax0/rmax1 extension window of
// mem_chain2aln:642-657, plus flat occurrence indices of each chain's seeds
// in appended order.

#include <cstdint>
#include <algorithm>
#include <vector>
#include <thread>

namespace {

struct ChainRec {
    int64_t pos;
    int64_t first_rbeg, last_rbeg;
    int32_t first_qbeg, last_qbeg, last_len;
    int32_t rid;
    int32_t head, tail;   // occurrence-index linked list (local indices)
    int32_t n;            // seed count
    int32_t w;            // weight (filled by chain_weight pass)
    int32_t kept;
    int32_t first;        // mem_chain_flt bookkeeping
};

struct Opts {
    int32_t w, max_chain_gap, min_chain_weight, min_seed_len, max_chain_extend;
    int64_t max_occ;
    double mask_level, drop_ratio;
    int32_t a, o_del, e_del, o_ins, e_ins;   // cal_max_gap params
};

static inline int32_t cal_max_gap(const Opts& o, int64_t qlen) {
    // cal_max_gap (bwamem.c:621-628)
    int64_t l_del = (int64_t)(((double)qlen * o.a - o.o_del) / o.e_del + 1.0);
    int64_t l_ins = (int64_t)(((double)qlen * o.a - o.o_ins) / o.e_ins + 1.0);
    int64_t l = l_del > l_ins ? l_del : l_ins;
    if (l < 1) l = 1;
    int64_t cap = (int64_t)o.w * 2;
    return (int32_t)(l < cap ? l : cap);
}

// chain_weight (bwamem.c:213-232) over the linked seed list in appended
// order; identical to align/chain.py:63-83.
static int32_t chain_weight(const ChainRec& c, const std::vector<int32_t>& next,
                            const int64_t* occ_rbeg, const int32_t* occ_qbeg,
                            const int32_t* occ_len) {
    int64_t w = 0, end = 0;
    for (int32_t i = c.head; i >= 0; i = next[i]) {
        int64_t qb = occ_qbeg[i], len = occ_len[i];
        if (qb >= end) w += len;
        else if (qb + len > end) w += qb + len - end;
        if (qb + len > end) end = qb + len;
    }
    int64_t tmp = w;
    w = 0; end = 0;
    for (int32_t i = c.head; i >= 0; i = next[i]) {
        int64_t rb = occ_rbeg[i], len = occ_len[i];
        if (rb >= end) w += len;
        else if (rb + len > end) w += rb + len - end;
        if (rb + len > end) end = rb + len;
    }
    if (w > tmp) w = tmp;
    int64_t cap = (1LL << 30) - 1;
    return (int32_t)(w < cap ? w : cap);
}

static void chain_one_read(
    const Opts& opt, int64_t l_pac,
    // per-SMEM slices for this read
    const int64_t* mem_s, const int32_t* mem_qb, const int32_t* mem_qe,
    int64_t n_mems,
    // per-occurrence slices for this read (local indices 0..n_occ)
    const int64_t* occ_rbeg, const int64_t* occ_rid,
    const int32_t* occ_qbeg, const int32_t* occ_len, int64_t n_occ,
    int32_t qlen,
    // outputs (capacity n_occ each, local)
    int32_t* out_nchains,
    int64_t* out_chain_pos, int32_t* out_chain_rid, int32_t* out_chain_w,
    int32_t* out_chain_kept, double* out_chain_frac, int32_t* out_chain_nseeds,
    int64_t* out_rmax0, int64_t* out_rmax1, int32_t* out_seed_idx) {
    *out_nchains = 0;
    if (qlen < opt.min_seed_len || n_occ == 0) return;

    // frac_rep (bwamem.c:265-272): sweep over SMEMs in order
    int64_t l_rep = 0, b = 0, e = 0;
    for (int64_t m = 0; m < n_mems; ++m) {
        if (mem_s[m] <= opt.max_occ) continue;
        int64_t sb = mem_qb[m], se = mem_qe[m];
        if (sb > e) { l_rep += e - b; b = sb; e = se; }
        else if (se > e) e = se;
    }
    l_rep += e - b;
    double frac = (double)l_rep / (double)qlen;

    std::vector<ChainRec> chains;
    std::vector<int64_t> positions;   // sorted; parallel to `order`
    std::vector<int32_t> order;       // chain index at each sorted slot
    std::vector<int32_t> next((size_t)n_occ, -1);
    chains.reserve(16); positions.reserve(16); order.reserve(16);

    for (int64_t i = 0; i < n_occ; ++i) {
        int64_t rbeg = occ_rbeg[i];
        int64_t rid = occ_rid[i];
        if (rid < 0) continue;
        int32_t qbeg = occ_qbeg[i], len = occ_len[i];
        bool to_add = true;
        if (!positions.empty()) {
            // closest chain with pos <= rbeg (bisect_right)
            auto it = std::upper_bound(positions.begin(), positions.end(), rbeg);
            if (it != positions.begin()) {
                ChainRec& c = chains[order[(it - positions.begin()) - 1]];
                // test_and_merge (bwamem.c:190-211)
                if (rid == c.rid) {
                    int64_t qend = (int64_t)c.last_qbeg + c.last_len;
                    int64_t rend = c.last_rbeg + c.last_len;
                    if (qbeg >= c.first_qbeg && qbeg + len <= qend &&
                        rbeg >= c.first_rbeg && rbeg + len <= rend) {
                        to_add = false;   // contained: merged, not appended
                    } else if (!((c.last_rbeg < l_pac || c.first_rbeg < l_pac) &&
                                 rbeg >= l_pac)) {
                        int64_t x = (int64_t)qbeg - c.last_qbeg;
                        int64_t y = rbeg - c.last_rbeg;
                        if (y >= 0 && x - y <= opt.w && y - x <= opt.w &&
                            x - c.last_len < opt.max_chain_gap &&
                            y - c.last_len < opt.max_chain_gap) {
                            // append seed i
                            int32_t ci = order[(it - positions.begin()) - 1];
                            ChainRec& cc = chains[ci];
                            next[cc.tail] = (int32_t)i;
                            cc.tail = (int32_t)i;
                            cc.n += 1;
                            cc.last_rbeg = rbeg;
                            cc.last_qbeg = qbeg;
                            cc.last_len = len;
                            to_add = false;
                        }
                    }
                }
            }
        }
        if (to_add) {
            ChainRec c;
            c.pos = rbeg;
            c.first_rbeg = c.last_rbeg = rbeg;
            c.first_qbeg = c.last_qbeg = qbeg;
            c.last_len = len;
            c.rid = (int32_t)rid;
            c.head = c.tail = (int32_t)i;
            c.n = 1;
            c.w = 0; c.kept = 0; c.first = -1;
            int32_t ci = (int32_t)chains.size();
            chains.push_back(c);
            // insert before equal keys (bisect_left)
            auto it = std::lower_bound(positions.begin(), positions.end(), rbeg);
            size_t slot = it - positions.begin();
            positions.insert(positions.begin() + slot, rbeg);
            order.insert(order.begin() + slot, ci);
        }
    }

    // ---- mem_chain_flt (bwamem.c:327-385) over chains in pos-sorted order
    std::vector<int32_t> a;   // indices into `chains`, filtered by weight
    a.reserve(chains.size());
    for (size_t s = 0; s < order.size(); ++s) {
        ChainRec& c = chains[order[s]];
        c.first = -1;
        c.kept = 0;
        c.w = chain_weight(c, next, occ_rbeg, occ_qbeg, occ_len);
        if (c.w >= opt.min_chain_weight) a.push_back(order[s]);
    }
    if (a.empty()) return;
    std::stable_sort(a.begin(), a.end(), [&](int32_t x, int32_t y) {
        return chains[x].w > chains[y].w;
    });
    std::vector<int32_t> kept_idx;
    kept_idx.push_back(0);
    chains[a[0]].kept = 3;
    auto qspan = [&](int32_t ci, int64_t& qb, int64_t& qe) {
        const ChainRec& c = chains[ci];
        qb = c.first_qbeg;
        qe = (int64_t)c.last_qbeg + c.last_len;
    };
    for (size_t i = 1; i < a.size(); ++i) {
        bool large_ovlp = false, broke = false;
        int64_t iqb, iqe; qspan(a[i], iqb, iqe);
        for (int32_t j : kept_idx) {
            int64_t jqb, jqe; qspan(a[j], jqb, jqe);
            int64_t b_max = jqb > iqb ? jqb : iqb;
            int64_t e_min = jqe < iqe ? jqe : iqe;
            if (e_min > b_max) {   // is_alt always false here
                int64_t li = iqe - iqb, lj = jqe - jqb;
                int64_t min_l = li < lj ? li : lj;
                if ((double)(e_min - b_max) >= (double)min_l * opt.mask_level &&
                    min_l < opt.max_chain_gap) {
                    large_ovlp = true;
                    if (chains[a[j]].first < 0) chains[a[j]].first = (int32_t)i;
                    if ((double)chains[a[i]].w < (double)chains[a[j]].w * opt.drop_ratio &&
                        chains[a[j]].w - chains[a[i]].w >= opt.min_seed_len * 2) {
                        broke = true;
                        break;
                    }
                }
            }
        }
        if (!broke) {
            kept_idx.push_back((int32_t)i);
            chains[a[i]].kept = large_ovlp ? 2 : 3;
        }
    }
    for (int32_t j : kept_idx) {
        if (chains[a[j]].first >= 0) chains[a[chains[a[j]].first]].kept = 1;
    }
    // cap the number of kept=1/2 chains to extend (:373-378)
    {
        int32_t k = 0;
        size_t cut = a.size();
        for (size_t i = 0; i < a.size(); ++i) {
            int32_t kk = chains[a[i]].kept;
            if (kk == 0 || kk == 3) continue;
            ++k;
            if (k >= opt.max_chain_extend) { cut = i; break; }
        }
        for (size_t i = cut; i < a.size(); ++i) {
            if (chains[a[i]].kept < 3) chains[a[i]].kept = 0;
        }
    }

    // ---- emit kept chains in a-order, with rmax windows
    int32_t n_out = 0;
    int32_t* seed_cursor = out_seed_idx;
    for (size_t i = 0; i < a.size(); ++i) {
        ChainRec& c = chains[a[i]];
        if (c.kept == 0) continue;
        out_chain_pos[n_out] = c.pos;
        out_chain_rid[n_out] = c.rid;
        out_chain_w[n_out] = c.w;
        out_chain_kept[n_out] = c.kept;
        out_chain_frac[n_out] = frac;
        out_chain_nseeds[n_out] = c.n;
        // rmax (mem_chain2aln bwamem.c:642-657)
        int64_t rmax0 = l_pac << 1, rmax1 = 0;
        for (int32_t s = c.head; s >= 0; s = next[s]) {
            int64_t tqb = occ_qbeg[s], tlen = occ_len[s], trb = occ_rbeg[s];
            int64_t lhs = trb - (tqb + cal_max_gap(opt, tqb));
            int64_t rhs = trb + tlen + (qlen - tqb - tlen) +
                          cal_max_gap(opt, qlen - tqb - tlen);
            if (lhs < rmax0) rmax0 = lhs;
            if (rhs > rmax1) rmax1 = rhs;
            *seed_cursor++ = s;
        }
        if (rmax0 < 0) rmax0 = 0;
        if (rmax1 > (l_pac << 1)) rmax1 = l_pac << 1;
        if (rmax0 < l_pac && l_pac < rmax1) {
            if (occ_rbeg[c.head] < l_pac) rmax1 = l_pac;
            else rmax0 = l_pac;
        }
        out_rmax0[n_out] = rmax0;
        out_rmax1[n_out] = rmax1;
        ++n_out;
    }
    *out_nchains = n_out;
}

}  // namespace

extern "C" int chain_batch(
    const int64_t* mem_s, const int32_t* mem_qb, const int32_t* mem_qe,
    const int64_t* mem_off,            // n_reads+1
    const int64_t* occ_rbeg, const int64_t* occ_rid,
    const int32_t* occ_qbeg, const int32_t* occ_len,
    const int64_t* occ_off,            // n_reads+1
    const int32_t* qlen,               // per read
    int32_t n_reads, int64_t l_pac,
    int32_t opt_w, int32_t max_chain_gap, int64_t max_occ,
    int32_t min_chain_weight, int32_t min_seed_len, int32_t max_chain_extend,
    double mask_level, double drop_ratio,
    int32_t a, int32_t o_del, int32_t e_del, int32_t o_ins, int32_t e_ins,
    int32_t* out_nchains,
    int64_t* out_chain_pos, int32_t* out_chain_rid, int32_t* out_chain_w,
    int32_t* out_chain_kept, double* out_chain_frac, int32_t* out_chain_nseeds,
    int64_t* out_rmax0, int64_t* out_rmax1, int32_t* out_seed_idx,
    int32_t n_threads) {
    Opts opt;
    opt.w = opt_w; opt.max_chain_gap = max_chain_gap;
    opt.min_chain_weight = min_chain_weight; opt.min_seed_len = min_seed_len;
    opt.max_chain_extend = max_chain_extend; opt.max_occ = max_occ;
    opt.mask_level = mask_level; opt.drop_ratio = drop_ratio;
    opt.a = a; opt.o_del = o_del; opt.e_del = e_del;
    opt.o_ins = o_ins; opt.e_ins = e_ins;

    auto work = [&](int32_t lo, int32_t hi) {
        for (int32_t r = lo; r < hi; ++r) {
            int64_t mo = mem_off[r], oo = occ_off[r];
            chain_one_read(
                opt, l_pac,
                mem_s + mo, mem_qb + mo, mem_qe + mo, mem_off[r + 1] - mo,
                occ_rbeg + oo, occ_rid + oo, occ_qbeg + oo, occ_len + oo,
                occ_off[r + 1] - oo, qlen[r],
                out_nchains + r,
                out_chain_pos + oo, out_chain_rid + oo, out_chain_w + oo,
                out_chain_kept + oo, out_chain_frac + oo, out_chain_nseeds + oo,
                out_rmax0 + oo, out_rmax1 + oo, out_seed_idx + oo);
        }
    };
    if (n_threads <= 1 || n_reads < 64) {
        work(0, n_reads);
        return 0;
    }
    int nt = std::min<int32_t>(n_threads, 16);
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) {
        int32_t lo = (int64_t)n_reads * t / nt;
        int32_t hi = (int64_t)n_reads * (t + 1) / nt;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
    return 0;
}
