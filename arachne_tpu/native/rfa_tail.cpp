// Native RFA finish tail: tagBestAlignments -> inferMolecules ->
// markBestAlignmentForReadInMolecule -> scrapMolecules -> greedy optimize ->
// estimateMapQualities, for one barcode, on flat arrays.
//
// Statement-faithful port of rfa/molecules.py, rfa/optimizer.py and
// rfa/mapq.py (themselves cited ports of aligner.go:1397-1481, :1300-1393,
// :991-1016, :1065-1298, :697-922).  Bit parity requirements honored:
//   * OrderedMap iteration order incl. swap-remove deletion
//     (ordered_map.go:39-51) — deletion order changes later fast_score
//     sweeps and therefore outputs;
//   * float accumulation order identical to the Python statement order
//     (alignment_change sums, dna_length sums, top-15 probability sum);
//   * the md5-seeded jitter stream (JitterRand): seeds computed by the
//     caller (hashlib md5), doubles generated here with the same
//     splitmix64 -> (z >> 11) * 2^-53 mapping (utils/rng.py).
//
// The Python tail remains the reference implementation; parity is asserted
// field-for-field in tests/test_rfa_native_tail.py and end-to-end by the
// byte-identity e2e tests.

#include <cstdint>
#include <cmath>
#include <algorithm>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

using std::vector;

constexpr double NEG_INF = -std::numeric_limits<double>::infinity();
constexpr double POS_INF = std::numeric_limits<double>::infinity();

struct In {
    int32_t R, A;
    const int64_t* pos;
    const int64_t* aend;
    const double* logp;       // log_alignment_probability
    const double* score;      // Alignment.score (int-valued)
    const int32_t* mismatches;
    const int32_t* indels;
    const int32_t* soft_clipped;
    const int32_t* soft_len;
    const int32_t* seq_len;
    const uint8_t* rev;
    const int32_t* contig;
    const int32_t* aln_id;
    const int32_t* read_of;   // (A) read index of each slot
    const int64_t* locs;      // mismatch_locs CSR values
    const int64_t* locs_off;  // (A+1)
    const int64_t* aln_off;   // (R+1)
    const int32_t* mate_of;   // (R)
    const uint64_t* jitter_seed;  // (R)
    double improper;
    double ref_len;
    int32_t run_rfa;
    int32_t temp_steps;
    int32_t anneal_factor;
    const int64_t* cen_start;  // per contig id, -1 = none
    const int64_t* cen_end;
};

struct Out {
    uint8_t* active;
    uint8_t* proper;
    uint8_t* bwa_pick;
    int32_t* mapq;
    int32_t* mol_id;
    uint8_t* active_mol;
    double* mol_conf;
    double* mol_diff;
    double* sum_move;
    int32_t* mate_slot;
    int32_t* sb_slot;
    double* sb_score;
    uint8_t* sb_proper;
    int32_t* sb_mol_reads;
    double* sb_mol_conf;
    int32_t* copies;
    int32_t* copies_in;
    int32_t* copies_out;
    int32_t* uniq_mols;
    double* md_score;
    int32_t* reads_in_mol;
    int32_t* n_molecules;
};

// Insertion-ordered int map with swap-remove delete (ordered_map.go:39-51).
struct OM {
    std::unordered_map<int32_t, int32_t> index;
    vector<int32_t> keys;
    vector<int32_t> vals;

    int32_t get(int32_t key) const {
        auto it = index.find(key);
        return it == index.end() ? -1 : vals[it->second];
    }
    void set(int32_t key, int32_t val) {
        auto it = index.find(key);
        if (it != index.end()) {
            vals[it->second] = val;
        } else {
            index.emplace(key, (int32_t)vals.size());
            keys.push_back(key);
            vals.push_back(val);
        }
    }
    void del(int32_t key) {
        auto it = index.find(key);
        if (it == index.end()) return;
        int32_t i = it->second;
        if (vals.size() > 1) {
            vals[i] = vals.back();
            index[keys.back()] = i;
            keys[i] = keys.back();
        }
        vals.pop_back();
        keys.pop_back();
        index.erase(it);
    }
    size_t size() const { return keys.size(); }
};

struct Molecule {
    int32_t id = 0;
    int32_t contig = 0;
    int64_t start = 0, stop = 0;
    OM aln_by_read;            // read -> index into read_maps
    vector<OM> read_maps;      // per-read (aln_id -> slot) maps
    OM best_for_read;          // read -> slot
    OM active;                 // read -> slot
    double confidence = 1.0;
    double differences = 0.0;
    int32_t soft_clipped = 0;
    bool active_molecule = false;
    std::unordered_map<int64_t, int32_t> mismatch_locs;

    OM* read_map(int32_t read) {
        int32_t i = aln_by_read.get(read);
        return i < 0 ? nullptr : &read_maps[i];
    }
    void add_aln(int32_t read, int32_t aid, int32_t slot) {
        int32_t i = aln_by_read.get(read);
        if (i < 0) {
            i = (int32_t)read_maps.size();
            read_maps.emplace_back();
            aln_by_read.set(read, i);
        }
        read_maps[i].set(aid, slot);
    }
};

static inline bool is_pair(const In& in, int32_t a, int32_t b) {
    if (in.rev[a] == in.rev[b] || in.contig[a] != in.contig[b]) return false;
    int32_t fwd = in.rev[a] ? b : a;
    int32_t rv = in.rev[a] ? a : b;
    int64_t dist = in.pos[rv] - in.pos[fwd];
    return dist >= -35 && dist < 750;
}

// scoreAlignment (aligner.go:556-581); slot -1 = nil.
static double score_alignment(const In& in, const Out& out, int32_t a,
                              int32_t m, double mol_pen, double improper) {
    double score = 0.0;
    if (a >= 0) {
        score += in.mismatches[a] * -2.0 + in.indels[a] * -3.0;
        if (in.soft_clipped[a] > 0) {
            score -= 5.0 * in.soft_clipped[a];
            score -= in.soft_len[a] * 0.5;
        }
    }
    if (m >= 0) {
        score += in.mismatches[m] * -2.0 + in.indels[m] * -3.0;
        if (in.soft_clipped[m] > 0) {
            score -= 5.0 * in.soft_clipped[m];
            score -= in.soft_len[m] * 0.5;
        }
    }
    if (m < 0 || a < 0 || !is_pair(in, a, m)) score += improper;
    if (a >= 0 && !out.active_mol[a]) score += mol_pen;
    return score;
}

static double pseudo_count_score(const In& in, int32_t a, double mol_pen) {
    double score = 0.0;
    score -= 10.0;
    score -= (in.seq_len[a] - 25.0) * 0.5;
    score += mol_pen;
    return score;
}

struct Jitter {
    uint64_t state;
    explicit Jitter(uint64_t seed) : state(seed) {}
    double next() {
        state += 0x9E3779B97F4A7C15ull;
        uint64_t z = state;
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
        z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
        z = z ^ (z >> 31);
        return (double)(z >> 11) * (1.0 / 9007199254740992.0);
    }
};

struct State {
    const In& in;
    Out& out;
    vector<Molecule> mols;
    State(const In& i, Out& o) : in(i), out(o) {}
    int64_t rbeg(int32_t r) const { return in.aln_off[r]; }
    int64_t rend(int32_t r) const { return in.aln_off[r + 1]; }
};

// ------------------------------------------------- tagBestAlignments

static void tag_best(State& st, vector<vector<int32_t>>& positions) {
    const In& in = st.in;
    Out& out = st.out;
    std::unordered_map<int32_t, int32_t> contig_bucket;
    vector<char> touched((size_t)in.R, 0);
    for (int32_t r = 0; r < in.R; ++r) {
        double best_score = NEG_INF;
        int32_t best_aln = -1, best_mate = -1;
        Jitter random(in.jitter_seed[r]);
        int32_t m = in.mate_of[r];
        for (int64_t a = st.rbeg(r); a < st.rend(r); ++a) {
            bool any_mate = st.rend(m) > st.rbeg(m);
            for (int64_t ma = st.rbeg(m); ma < st.rend(m); ++ma) {
                double total =
                    score_alignment(in, out, (int32_t)a, (int32_t)ma, 0.0,
                                    in.improper) +
                    random.next() / 2.0;
                if (total > best_score) {
                    best_score = total;
                    best_aln = (int32_t)a;
                    best_mate = (int32_t)ma;
                }
            }
            if (!any_mate) {
                double s = in.score[a] + random.next() / 2.0;
                if (s > best_score) {
                    best_score = s;
                    best_aln = (int32_t)a;
                    best_mate = -1;
                }
            }
            auto it = contig_bucket.find(in.contig[a]);
            if (it != contig_bucket.end()) {
                positions[it->second].push_back((int32_t)a);
            } else {
                contig_bucket.emplace(in.contig[a], (int32_t)positions.size());
                positions.emplace_back();
                positions.back().push_back((int32_t)a);
            }
        }
        if (!touched[r] && best_aln >= 0) {
            out.active[best_aln] = 1;
            out.bwa_pick[best_aln] = 1;
            if (best_mate >= 0) {
                if (is_pair(in, best_aln, best_mate)) {
                    out.proper[best_aln] = 1;
                    out.proper[best_mate] = 1;
                }
                out.active[best_mate] = 1;
                out.bwa_pick[best_mate] = 1;
                touched[m] = 1;
            }
        }
    }
    for (auto& plist : positions)
        std::stable_sort(plist.begin(), plist.end(),
                         [&](int32_t x, int32_t y) { return in.pos[x] < in.pos[y]; });
}

// --------------------------------------------------- inferMolecules

static void infer_molecules(State& st, const vector<vector<int32_t>>& positions) {
    const In& in = st.in;
    int32_t molecule_num = 0;
    int32_t cur = -1;
    for (const auto& plist : positions) {
        for (size_t i = 0; i < plist.size(); ++i) {
            int32_t a = plist[i];
            if (i == 0 || in.pos[a] - in.pos[plist[i - 1]] > 50000) {
                if (i > 0 && cur >= 0) st.mols[cur].stop = in.pos[plist[i - 1]];
                st.mols.emplace_back();
                cur = (int32_t)st.mols.size() - 1;
                Molecule& mol = st.mols[cur];
                mol.contig = in.contig[a];
                mol.start = in.pos[a];
                mol.id = molecule_num;
                mol.confidence = 1.0;
                mol.add_aln(in.read_of[a], in.aln_id[a], a);
                ++molecule_num;
            }
            st.mols[cur].add_aln(in.read_of[a], in.aln_id[a], a);
        }
        if (!plist.empty()) st.mols[cur].stop = in.pos[plist.back()];
    }
}

// ------------------------------- markBestAlignmentForReadInMolecule

static void mark_best(State& st) {
    const In& in = st.in;
    Out& out = st.out;
    for (auto& mol : st.mols) {
        OM active_alignments;
        OM best_for_read;
        // snapshot of read keys (list(...iter_keys()))
        vector<int32_t> read_keys(mol.aln_by_read.keys);
        for (int32_t read : read_keys) {
            OM* alns = mol.read_map(read);
            double best_score = NEG_INF;
            int32_t best_aln = -1;
            vector<int32_t> aln_keys(alns->keys);
            for (int32_t aid : aln_keys) {
                int32_t a = alns->get(aid);
                OM* mates = mol.read_map(in.mate_of[read]);
                if (mates != nullptr && mates->size() > 0) {
                    vector<int32_t> mate_keys(mates->keys);
                    for (int32_t mid : mate_keys) {
                        int32_t ma = mates->get(mid);
                        double s = score_alignment(in, out, a, ma, 0.0,
                                                   in.improper);
                        if (s > best_score) {
                            best_score = s;
                            best_aln = a;
                        }
                    }
                } else {
                    if (in.logp[a] > best_score) {
                        best_score = in.logp[a];
                        best_aln = a;
                    }
                }
                if (out.active[a]) active_alignments.set(read, a);
            }
            if (out.active[best_aln]) active_alignments.set(read, best_aln);
            best_for_read.set(read, best_aln);
        }
        for (int32_t a : active_alignments.vals)
            for (int64_t li = in.locs_off[a]; li < in.locs_off[a + 1]; ++li)
                mol.mismatch_locs[in.locs[li]] += 1;
        mol.active = std::move(active_alignments);
        mol.best_for_read = std::move(best_for_read);
    }
}

// ------------------------------------------------------ scrapMolecules

static void scrap(State& st) {
    const In& in = st.in;
    vector<Molecule> kept;
    int32_t count = 0;
    for (auto& mol : st.mols) {
        if (mol.active.size() > 0) {
            for (int32_t read : mol.aln_by_read.keys) {
                OM* amap = mol.read_map(read);
                for (int32_t slot : amap->vals) st.out.mol_id[slot] = count;
            }
            mol.id = count;  // ids renumbered with the compaction
            kept.push_back(std::move(mol));
            ++count;
        } else {
            for (int32_t read : mol.aln_by_read.keys) {
                OM* amap = mol.read_map(read);
                for (int32_t slot : amap->vals) st.out.mol_id[slot] = -1;
            }
        }
    }
    (void)in;
    st.mols = std::move(kept);
}

// NOTE on scrap id semantics: the Python port renumbers molecule_id on the
// ALIGNMENTS but keeps CandidateMolecule.id untouched; downstream the only
// molecule-id consumers are alignment.molecule_id and list positions, and
// fast_score compares source.id != sink.id.  Python ids remain the ORIGINAL
// inference numbering while ours compacts — but identity comparisons
// (source.id != sink.id) only need uniqueness, which both give.  The
// alignment.molecule_id values (compacted) match Python exactly.

static void set_molecule_differences(State& st) {
    const In& in = st.in;
    for (auto& mol : st.mols) {
        double differences = 0.0;
        for (int32_t a : mol.active.vals) differences += in.mismatches[a];
        size_t n_active = mol.active.size();
        mol.differences =
            n_active ? differences / (double)n_active
                     : std::numeric_limits<double>::quiet_NaN();
        for (int32_t a : mol.active.vals) st.out.mol_diff[a] = mol.differences;
    }
}

// ------------------------------------------------------------ optimizer

static bool is_active_molecule(const Molecule& mol, int64_t read_change) {
    int64_t active = (int64_t)mol.active.size() + read_change;
    int64_t potential = (int64_t)mol.best_for_read.size();
    if (active <= 4) return false;
    if ((double)active / (double)potential < 0.1) return false;
    return true;
}

struct Move {
    double score_change = NEG_INF;
    double alignment_change = 0.0;
    int32_t source = -1, sink = -1;
    vector<int32_t> to_delete;
    vector<int32_t> to_set;
    int32_t num_moved = 0;
};

// fastScore (aligner.go:1109-1237)
static double fast_score(State& st, int32_t src_i, int32_t snk_i, Move& mv) {
    const In& in = st.in;
    Molecule& source = st.mols[src_i];
    Molecule& sink = st.mols[snk_i];
    double change = 0.0;
    double alignment_change = 0.0;
    int32_t num = 0;
    mv.to_delete.clear();
    mv.to_set.clear();
    bool diff = src_i != snk_i;

    for (size_t vi = 0; vi < source.active.vals.size(); ++vi) {
        int32_t sa = source.active.vals[vi];
        int32_t read_id = in.read_of[sa];
        int32_t sink_aln = sink.best_for_read.get(read_id);
        if (sink_aln < 0) continue;
        int32_t mate_read = in.mate_of[read_id];
        int32_t source_mate = source.active.get(mate_read);
        bool source_has_mate = source_mate >= 0;
        bool source_has_mate_pair =
            source_has_mate && is_pair(in, sa, source_mate);
        int32_t mate = sink.best_for_read.get(mate_read);
        bool sink_has_mate_pair =
            mate >= 0 && is_pair(in, sink_aln, mate) && source_has_mate;
        if (!source_has_mate_pair || (source_has_mate && sink_has_mate_pair)) {
            mv.to_delete.push_back(read_id);
            mv.to_set.push_back(sink_aln);
        }
        alignment_change += in.logp[sink_aln] - in.logp[sa];
        // consistency check (aligner.go:1159-1184 invariants)
        for (int64_t li = in.locs_off[sa]; li < in.locs_off[sa + 1]; ++li) {
            auto it = source.mismatch_locs.find(in.locs[li]);
            if (it == source.mismatch_locs.end() || it->second == 0)
                return std::numeric_limits<double>::quiet_NaN();  // invariant broken
        }
        if (source_has_mate_pair && !sink_has_mate_pair && diff)
            alignment_change += st.in.improper / 2.0;
        else if (!source_has_mate_pair && sink_has_mate_pair && diff)
            alignment_change -= st.in.improper / 2.0;
        ++num;
    }

    bool source_active_before = is_active_molecule(source, 0);
    bool source_active_after = is_active_molecule(source, -num);
    if (!source_active_after && source_active_before && diff)
        change -= (double)source.best_for_read.size() * -0.5;
    bool sink_active_before = is_active_molecule(sink, 0);
    bool sink_active_after = is_active_molecule(sink, num);
    if (sink_active_after && !sink_active_before && diff)
        change += (double)sink.best_for_read.size() * -0.5;
    if ((int64_t)source.active.size() - num == 0 && num > 0 && diff)
        change -= -3.0;
    if (sink.active.size() == 0 && num > 0 && diff) change += -3.0;
    change += alignment_change;
    mv.source = src_i;
    mv.sink = snk_i;
    mv.num_moved = num;
    mv.score_change = change;
    mv.alignment_change = alignment_change;
    return change;
}

static void accept_move(State& st, Move& mv) {
    const In& in = st.in;
    Molecule& source = st.mols[mv.source];
    Molecule& sink = st.mols[mv.sink];
    for (size_t i = 0; i < mv.to_delete.size(); ++i) {
        int32_t read_id = mv.to_delete[i];
        int32_t sink_aln = mv.to_set[i];
        int32_t source_aln = source.active.get(read_id);
        for (int64_t li = in.locs_off[source_aln];
             li < in.locs_off[source_aln + 1]; ++li)
            source.mismatch_locs[in.locs[li]] -= 1;
        for (int64_t li = in.locs_off[sink_aln]; li < in.locs_off[sink_aln + 1];
             ++li)
            sink.mismatch_locs[in.locs[li]] += 1;
        source.active.del(read_id);
        sink.active.set(read_id, sink_aln);
        st.out.active[source_aln] = 0;
        st.out.active[sink_aln] = 1;
    }
}

// sink_neighborhoods (rfa/optimizer.py:144-167)
static vector<vector<int32_t>> neighborhoods(const State& st) {
    std::unordered_map<int32_t, vector<int32_t>> by_read;
    for (size_t i = 0; i < st.mols.size(); ++i)
        for (int32_t rid : st.mols[i].best_for_read.keys)
            by_read[rid].push_back((int32_t)i);
    vector<vector<char>> nbr_mask(st.mols.size(),
                                  vector<char>(st.mols.size(), 0));
    for (auto& kv : by_read) {
        auto& lst = kv.second;
        if (lst.size() > 1)
            for (int32_t i : lst)
                for (int32_t j : lst) nbr_mask[i][j] = 1;
    }
    vector<vector<int32_t>> out(st.mols.size());
    for (size_t i = 0; i < st.mols.size(); ++i)
        for (size_t j = 0; j < st.mols.size(); ++j)
            if (nbr_mask[i][j] && i != j) out[i].push_back((int32_t)j);
    return out;
}

static void optimize(State& st) {
    if (st.mols.empty()) return;
    auto nbr = neighborhoods(st);
    int32_t current_source = 0;
    int32_t n = (int32_t)st.mols.size();
    int64_t steps_per_temp = (int64_t)st.in.anneal_factor * n;
    Move best, cand;
    for (int32_t t = 0; t < st.in.temp_steps; ++t) {
        for (int64_t s = 0; s < steps_per_temp; ++s) {
            Molecule& source = st.mols[current_source];
            if (source.active.size() == 0) {
                current_source = (current_source + 1) % n;
                continue;
            }
            best = Move();
            best.sink = current_source;  // sentinel mirror of best.sink=source
            bool best_valid = false;
            for (int32_t i : nbr[current_source]) {
                double score = fast_score(st, current_source, i, cand);
                bool better =
                    score > best.score_change ||
                    (score == best.score_change && best.sink >= 0 &&
                     cand.sink >= 0 &&
                     st.mols[cand.sink].active.size() >
                         st.mols[best.sink].active.size());
                if (better && cand.num_moved > 0) {
                    best = cand;
                    best_valid = true;
                }
            }
            if (best_valid && best.num_moved > 0) {
                if (best.score_change > 0 ||
                    (best.score_change == 0 &&
                     st.mols[best.sink].active.size() >
                         source.active.size()))
                    accept_move(st, best);
            }
            current_source = (current_source + 1) % n;
        }
    }
}

// --------------------------------------------- estimateMapQualities

static void molecule_mapq_probability_sums(State& st) {
    if (st.mols.empty()) return;
    const In& in = st.in;
    auto nbr = neighborhoods(st);
    Move scratch;
    vector<int32_t> source_alignments;
    for (size_t mol_id = 0; mol_id < st.mols.size(); ++mol_id) {
        Molecule& source = st.mols[mol_id];
        for (int32_t mol2 : nbr[mol_id]) {
            Molecule& sink = st.mols[mol2];
            source_alignments.clear();
            for (int32_t a : source.active.vals)
                if (sink.best_for_read.get(in.read_of[a]) >= 0)
                    source_alignments.push_back(a);
            if (source_alignments.empty()) continue;
            double change =
                fast_score(st, (int32_t)mol_id, mol2, scratch);
            double move_probability = std::pow(10.0, change);
            for (int32_t a : source_alignments)
                st.out.sum_move[a] += move_probability;
        }
    }
}

static void set_molecule_confidences(State& st) {
    for (auto& mol : st.mols) {
        mol.confidence =
            (double)mol.active.size() / (double)mol.best_for_read.size();
        for (int32_t a : mol.active.vals) {
            if (st.in.soft_clipped[a] > 0) mol.soft_clipped += 1;
            st.out.mol_conf[a] = mol.confidence;
        }
    }
}

static void update_molecule_status(
    State& st, std::unordered_map<int32_t, int32_t>& in_active,
    std::unordered_map<int32_t, int32_t>& not_in_active,
    std::unordered_map<int32_t, std::unordered_map<int32_t, char>>& uniq) {
    // (molecules always present when called on the RFA path)
    set_molecule_confidences(st);
    set_molecule_differences(st);
    const In& in = st.in;
    for (int32_t r = 0; r < in.R; ++r) {
        for (int64_t a = st.rbeg(r); a < st.rend(r); ++a) {
            bool is_active = false;
            int32_t mid = st.out.mol_id[a];
            if (mid != -1) {
                Molecule& mol = st.mols[mid];
                is_active = (int64_t)mol.active.size() - mol.soft_clipped > 4 &&
                            mol.confidence > 0.1;
                st.out.active_mol[a] = is_active ? 1 : 0;
            }
            if (is_active) {
                st.mols[mid].active_molecule = true;
                in_active[r] += 1;
                uniq[r][mid] = 1;
            } else {
                not_in_active[r] += 1;
            }
            if (mid != -1)
                st.out.reads_in_mol[a] = (int32_t)st.mols[mid].active.size();
        }
    }
}

static double calculate_log_molecule_penalty(State& st) {
    double dna_length = 1000.0;
    if (st.mols.empty()) return 0.0;
    const In& in = st.in;
    for (auto& mol : st.mols) {
        if (mol.active_molecule) {
            double smallest = POS_INF;
            double biggest = -1.0;
            for (int32_t a : mol.active.vals) {
                biggest = std::max(biggest, (double)in.pos[a]);
                smallest = std::min(smallest, (double)in.pos[a]);
            }
            if (biggest >= smallest) dna_length += (biggest - smallest) + 1000.0;
        } else {
            for (int32_t a : mol.active.vals)
                dna_length += (double)(in.aend[a] - in.pos[a]) * 2.0;
        }
    }
    double singleton_prob = 0.05;
    return std::log10(dna_length / st.in.ref_len * singleton_prob);
}

static int estimate_map_qualities(State& st, bool have_molecules) {
    const In& in = st.in;
    Out& out = st.out;
    std::unordered_map<int32_t, int32_t> in_active, not_in_active;
    std::unordered_map<int32_t, std::unordered_map<int32_t, char>> uniq;

    if (have_molecules) {
        molecule_mapq_probability_sums(st);
        update_molecule_status(st, in_active, not_in_active, uniq);
    }
    double mol_pen = calculate_log_molecule_penalty(st);

    vector<double> scores;
    for (int32_t r = 0; r < in.R; ++r) {
        scores.clear();
        int64_t b = st.rbeg(r), e = st.rend(r);
        int32_t mate_read = in.mate_of[r];
        int64_t mb = st.rbeg(mate_read), me = st.rend(mate_read);
        // _append_pseudocount_score
        if (e > b) {
            double best_single_mate = NEG_INF;
            for (int64_t ma = mb; ma < me; ++ma) {
                double s = score_alignment(in, out, -1, (int32_t)ma, mol_pen,
                                           in.improper);
                if (s > best_single_mate) best_single_mate = s;
            }
            if (me > mb)
                scores.push_back(best_single_mate +
                                 pseudo_count_score(in, (int32_t)b, mol_pen));
            else
                scores.push_back(pseudo_count_score(in, (int32_t)b, mol_pen));
        }
        double total_probability = 0.0;
        // link active mates
        for (int64_t a = b; a < e; ++a)
            for (int64_t ma = mb; ma < me; ++ma)
                if (out.active[a] && out.active[ma]) {
                    out.mate_slot[a] = (int32_t)ma;
                    out.mate_slot[ma] = (int32_t)a;
                }
        for (int64_t a = b; a < e; ++a) {
            double best_score = NEG_INF;
            for (int64_t ma = mb; ma < me; ++ma) {
                double s = score_alignment(in, out, (int32_t)a, (int32_t)ma,
                                           mol_pen, in.improper);
                if (s > best_score) best_score = s;
            }
            if (me == mb)
                best_score =
                    score_alignment(in, out, (int32_t)a, -1, mol_pen, in.improper);
            scores.push_back(best_score);
        }
        // second-best bookkeeping
        bool sb_proper = false;
        double sb_raw = scores.empty() ? 0.0 : scores[0];
        double sb_logp = -1000.0;
        int32_t sb_mol_reads = -1;
        int32_t sb_slot = -1;
        double sb_mol_conf = -1.0;
        for (int64_t a = b; a < e; ++a) {
            for (int64_t ma = mb; ma < me; ++ma) {
                double s = score_alignment(in, out, (int32_t)a, (int32_t)ma,
                                           mol_pen, in.improper);
                if (!out.active[a] && s > sb_logp) {
                    sb_logp = s;
                    sb_raw = score_alignment(in, out, (int32_t)a, (int32_t)ma,
                                             0.0, in.improper);
                    sb_slot = (int32_t)a;
                    out.mate_slot[a] = (int32_t)ma;
                    sb_proper = out.proper[a] != 0;
                    if (out.mol_id[a] != -1 && have_molecules) {
                        Molecule& alt = st.mols[out.mol_id[a]];
                        sb_mol_conf = alt.confidence;
                        sb_mol_reads = (int32_t)alt.active.size();
                    }
                }
            }
        }
        for (int64_t a = b; a < e; ++a) {
            if (out.active[a]) {
                out.sb_slot[a] = sb_slot;
                out.sb_score[a] = sb_raw;
                out.sb_proper[a] = sb_proper ? 1 : 0;
                out.sb_mol_conf[a] = sb_mol_conf;
                out.sb_mol_reads[a] = sb_mol_reads;
                out.copies[a] = (int32_t)(e - b);
                auto it1 = in_active.find(r);
                out.copies_in[a] = it1 == in_active.end() ? 0 : it1->second;
                auto it2 = not_in_active.find(r);
                out.copies_out[a] = it2 == not_in_active.end() ? 0 : it2->second;
                auto it3 = uniq.find(r);
                out.uniq_mols[a] = it3 == uniq.end() ? 0 : (int32_t)it3->second.size();
                out.md_score[a] = score_alignment(in, out, (int32_t)a,
                                                  out.mate_slot[a], 0.0,
                                                  in.improper);
            }
        }
        // top-15 normalization
        std::sort(scores.begin(), scores.end());
        for (int64_t i = (int64_t)scores.size() - 1; i >= 0; --i) {
            if ((int64_t)scores.size() - i > 15) break;
            total_probability += std::pow(10.0, scores[i]);
        }
        // final mapq
        for (int64_t a = b; a < e; ++a) {
            double s = score_alignment(in, out, (int32_t)a, out.mate_slot[a],
                                       mol_pen, in.improper);
            double ratio = total_probability > 0.0
                               ? std::pow(10.0, s) / total_probability
                               : 1.0;
            double mapq =
                ratio < 1.0 ? -10.0 * std::log10(1.0 - ratio) : POS_INF;
            double molecule_mapq;
            if (out.sum_move[a] > 0.0) {
                double inv = 1.0 / out.sum_move[a];
                molecule_mapq =
                    inv < 1.0 ? -10.0 * std::log10(1.0 - inv) : POS_INF;
            } else {
                molecule_mapq = POS_INF;
            }
            mapq = std::min(mapq, molecule_mapq);
            mapq = std::min(60.0, mapq);
            int64_t cs = in.cen_start[in.contig[a]];
            int64_t ce = in.cen_end[in.contig[a]];
            if (cs < in.pos[a] && in.pos[a] <= ce) mapq = 0.0;
            out.mapq[a] = (int32_t)mapq;
        }
    }
    // checkMates invariant
    for (int32_t a = 0; a < in.A; ++a)
        if (out.active[a] && out.mate_slot[a] >= 0 &&
            !out.active[out.mate_slot[a]])
            return -2;
    return 0;
}

}  // namespace

extern "C" int rfa_tail(
    int32_t R, int32_t A,
    const int64_t* pos, const int64_t* aend, const double* logp,
    const double* score, const int32_t* mismatches, const int32_t* indels,
    const int32_t* soft_clipped, const int32_t* soft_len,
    const int32_t* seq_len, const uint8_t* rev, const int32_t* contig,
    const int32_t* aln_id, const int32_t* read_of, const int64_t* locs,
    const int64_t* locs_off, const int64_t* aln_off, const int32_t* mate_of,
    const uint64_t* jitter_seed, double improper, double ref_len,
    int32_t run_rfa, int32_t temp_steps, int32_t anneal_factor,
    const int64_t* cen_start, const int64_t* cen_end,
    uint8_t* out_active, uint8_t* out_proper, uint8_t* out_bwa_pick,
    int32_t* out_mapq, int32_t* out_mol_id, uint8_t* out_active_mol,
    double* out_mol_conf, double* out_mol_diff, double* out_sum_move,
    int32_t* out_mate_slot, int32_t* out_sb_slot, double* out_sb_score,
    uint8_t* out_sb_proper, int32_t* out_sb_mol_reads, double* out_sb_mol_conf,
    int32_t* out_copies, int32_t* out_copies_in, int32_t* out_copies_out,
    int32_t* out_uniq_mols, double* out_md_score, int32_t* out_reads_in_mol,
    int32_t* out_n_molecules) {
    In in{R, A, pos, aend, logp, score, mismatches, indels, soft_clipped,
          soft_len, seq_len, rev, contig, aln_id, read_of, locs, locs_off,
          aln_off, mate_of, jitter_seed, improper, ref_len, run_rfa,
          temp_steps, anneal_factor, cen_start, cen_end};
    Out out{out_active, out_proper, out_bwa_pick, out_mapq, out_mol_id,
            out_active_mol, out_mol_conf, out_mol_diff, out_sum_move,
            out_mate_slot, out_sb_slot, out_sb_score, out_sb_proper,
            out_sb_mol_reads, out_sb_mol_conf, out_copies, out_copies_in,
            out_copies_out, out_uniq_mols, out_md_score, out_reads_in_mol,
            out_n_molecules};
    State st(in, out);
    vector<vector<int32_t>> positions;
    tag_best(st, positions);
    if (run_rfa) {
        infer_molecules(st, positions);
        mark_best(st);
        scrap(st);
        set_molecule_differences(st);
        optimize(st);
        int rc = estimate_map_qualities(st, true);
        if (rc != 0) return rc;
        *out_n_molecules = (int32_t)st.mols.size();
    } else {
        int rc = estimate_map_qualities(st, false);
        if (rc != 0) return rc;
        *out_n_molecules = 0;
    }
    return 0;
}
