// Native search runtime: one time-synchronous expansion step of the
// word-conditioned tree search (HMM beam search inner loop).
//
// The reference implements this hot core in C++
// (src/Search/AdvancedTreeSearch/SearchSpace.cc: expandHmm ->
// pruneAndAddScores, SoA StateHypothesis arrays in
// SearchSpaceHelpers.hh:84); the Python/numpy implementation in
// rasr_tpu/search/hmm_timesync.py is vectorized but still pays
// several array passes (concatenate / lexsort / argpartition) per
// frame.  This kernel fuses, in one pass over the candidates:
//
//   within-node moves (loop/forward/skip) + child-node entries off the
//   exit set + externally injected candidates (word-end re-entries,
//   utterance-start entries) -> emission score add -> recombination on
//   (state, LM history) via open-addressing hash -> score-threshold +
//   histogram pruning.
//
// Word-end handling stays in Python (it calls the LM and the traceback
// arena); the exit set is computed there and passed in.
//
// Build: part of librasr_io.so (see Makefile).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct BeamNet {
    int64_t n_states = 0;
    std::vector<uint8_t> loop_ok, fwd_in, skip_in;
    std::vector<double> loop_pen, fwd_pen, skip_pen;
    std::vector<int64_t> emis, node_of;
    std::vector<int64_t> child_off, child_flat;  // per NODE
};

struct Cand {
    int64_t state, hist, trace, bframe;
    double score, bscore, pscore;   // pscore = score + pruning biases
};

// open-addressing hash: key -> candidate slot (keep lowest score)
struct Recomb {
    std::vector<int64_t> keys;
    std::vector<int32_t> slot;
    uint64_t mask = 0;

    void init(size_t n_expected) {
        size_t cap = 16;
        while (cap < 2 * n_expected) cap <<= 1;
        keys.assign(cap, -1);
        slot.assign(cap, -1);
        mask = cap - 1;
    }

    // returns slot index to overwrite, or -1 if existing entry is better
    int32_t offer(int64_t key, double score, std::vector<Cand>& cands) {
        uint64_t h = static_cast<uint64_t>(key) * 0x9E3779B97F4A7C15ull;
        uint64_t i = h & mask;
        while (true) {
            int64_t k = keys[i];
            if (k == -1) {
                keys[i] = key;
                cands.push_back(Cand{});
                slot[i] = static_cast<int32_t>(cands.size() - 1);
                return slot[i];
            }
            if (k == key) {
                int32_t s = slot[i];
                return (score < cands[s].score) ? s : -1;
            }
            i = (i + 1) & mask;
        }
    }
};

}  // namespace

extern "C" {

void* rasr_beam_net_create(
        int64_t n_states,
        const uint8_t* loop_ok, const uint8_t* fwd_in,
        const uint8_t* skip_in,
        const double* loop_pen, const double* fwd_pen,
        const double* skip_pen,
        const int64_t* emis, const int64_t* node_of,
        int64_t n_nodes, const int64_t* child_off,
        const int64_t* child_flat) {
    auto* net = new BeamNet();
    net->n_states = n_states;
    net->loop_ok.assign(loop_ok, loop_ok + n_states);
    net->fwd_in.assign(fwd_in, fwd_in + n_states);
    net->skip_in.assign(skip_in, skip_in + n_states);
    net->loop_pen.assign(loop_pen, loop_pen + n_states);
    net->fwd_pen.assign(fwd_pen, fwd_pen + n_states);
    net->skip_pen.assign(skip_pen, skip_pen + n_states);
    net->emis.assign(emis, emis + n_states);
    net->node_of.assign(node_of, node_of + n_states);
    net->child_off.assign(child_off, child_off + n_nodes + 1);
    net->child_flat.assign(child_flat,
                           child_flat + child_off[n_nodes]);
    return net;
}

void rasr_beam_net_free(void* handle) {
    delete static_cast<BeamNet*>(handle);
}

// One expansion step.  Returns the new beam size (<= beam_size), or -1
// on error.  out_stats[0] = candidates before recombination,
// out_stats[1] = candidates surviving recombination,
// out_stats[2] = candidates within the score threshold.
int64_t rasr_beam_expand(
        void* handle,
        // current beam (within-node moves expand from here)
        int64_t n, const int64_t* b_state, const int64_t* b_hist,
        const double* b_score, const int64_t* b_trace,
        const int64_t* b_bframe, const double* b_bscore,
        // exit set (child-node entries expand from here); e_node is the
        // tree node id whose children are entered
        int64_t n_ex, const int64_t* e_node, const int64_t* e_hist,
        const double* e_score, const int64_t* e_trace,
        const int64_t* e_bframe, const double* e_bscore,
        // injected candidates (word-end re-entries, start entries)
        int64_t n_inj, const int64_t* i_state, const int64_t* i_hist,
        const double* i_score, const int64_t* i_trace,
        const int64_t* i_bframe, const double* i_bscore,
        // frame emission scores, indexed by emis[state]
        const double* frame,
        // optional next-frame lookahead row (prune bias) + scale
        const double* la_row, double la_scale,
        // optional LM lookahead (prune bias): slot-pooled tables
        // lm_la[slot * n_la_nodes + la_node], per-history slot map
        // lm_la_slot[hist] and per-state la node lm_la_state[state]
        const float* lm_la, const int64_t* lm_la_slot,
        const int64_t* lm_la_state, int64_t n_la_nodes,
        // recombination key space: key = state * hist_count + hist
        int64_t hist_count,
        // pruning
        double threshold, int64_t beam_size,
        // outputs, capacity beam_size
        int64_t* o_state, int64_t* o_hist, double* o_score,
        int64_t* o_trace, int64_t* o_bframe, double* o_bscore,
        int64_t* out_stats) {
    const auto* net = static_cast<const BeamNet*>(handle);
    size_t expected = static_cast<size_t>(3 * n + n_inj) + 16;
    for (int64_t j = 0; j < n_ex; ++j)
        expected += static_cast<size_t>(
            net->child_off[e_node[j] + 1] - net->child_off[e_node[j]]);

    std::vector<Cand> cands;
    cands.reserve(expected);
    Recomb table;
    table.init(expected);
    int64_t n_raw = 0;

    // early threshold skip: the pruning bias of a candidate depends only
    // on (state, hist), so recombination winners and losers share it —
    // a candidate whose biased score exceeds the running best + threshold
    // can never survive the final cut and need not be hashed at all
    // (the reference's pruneAndAddScores early cutoff).  running_best
    // only decreases, so the skip is sound.
    double running_best = std::numeric_limits<double>::infinity();

    auto offer = [&](int64_t state, int64_t hist, double score,
                     int64_t trace, int64_t bframe, double bscore) {
        ++n_raw;
        int64_t em = net->emis[state];
        score += frame[em];
        // two-stage skip: the LM-lookahead bias is a random gather into
        // a ~100 MB slot pool (DRAM miss per offer at scale), and it is
        // NON-NEGATIVE -- so the cheap acoustic-only bound already
        // proves most losers can never survive, and the pool is touched
        // only for the few that pass it
        double p = score;
        if (la_row) p += la_scale * la_row[em];
        if (p > running_best + threshold) return;
        if (lm_la) {
            p += lm_la[lm_la_slot[hist] * n_la_nodes
                       + lm_la_state[state]];
            if (p > running_best + threshold) return;
        }
        if (p < running_best) running_best = p;
        int32_t s = table.offer(state * hist_count + hist, score, cands);
        if (s >= 0)
            cands[s] = Cand{state, hist, trace, bframe, score, bscore, p};
    };

    for (int64_t i = 0; i < n; ++i) {
        int64_t st = b_state[i];
        if (net->loop_ok[st])
            offer(st, b_hist[i], b_score[i] + net->loop_pen[st],
                  b_trace[i], b_bframe[i], b_bscore[i]);
        if (net->fwd_in[st])
            offer(st + 1, b_hist[i], b_score[i] + net->fwd_pen[st],
                  b_trace[i], b_bframe[i], b_bscore[i]);
        if (net->skip_in[st])
            offer(st + 2, b_hist[i], b_score[i] + net->skip_pen[st],
                  b_trace[i], b_bframe[i], b_bscore[i]);
    }
    for (int64_t j = 0; j < n_ex; ++j) {
        int64_t nd = e_node[j];
        for (int64_t k = net->child_off[nd]; k < net->child_off[nd + 1];
             ++k)
            offer(net->child_flat[k], e_hist[j], e_score[j], e_trace[j],
                  e_bframe[j], e_bscore[j]);
    }
    for (int64_t j = 0; j < n_inj; ++j)
        offer(i_state[j], i_hist[j], i_score[j], i_trace[j], i_bframe[j],
              i_bscore[j]);

    out_stats[0] = n_raw;
    out_stats[1] = static_cast<int64_t>(cands.size());
    if (cands.empty()) {
        out_stats[2] = 0;
        return 0;
    }

    // pruning scores were computed (with biases) at offer time
    std::vector<double> prune(cands.size());
    double best = std::numeric_limits<double>::infinity();
    for (size_t i = 0; i < cands.size(); ++i) {
        prune[i] = cands[i].pscore;
        if (prune[i] < best) best = prune[i];
    }
    double cut = best + threshold;
    std::vector<int32_t> sel;
    sel.reserve(cands.size());
    for (size_t i = 0; i < cands.size(); ++i)
        if (prune[i] <= cut) sel.push_back(static_cast<int32_t>(i));
    out_stats[2] = static_cast<int64_t>(sel.size());
    if (static_cast<int64_t>(sel.size()) > beam_size) {
        std::nth_element(sel.begin(), sel.begin() + beam_size - 1,
                         sel.end(), [&](int32_t a, int32_t b) {
                             return prune[a] < prune[b];
                         });
        sel.resize(beam_size);
    }
    for (size_t i = 0; i < sel.size(); ++i) {
        const Cand& c = cands[sel[i]];
        o_state[i] = c.state;
        o_hist[i] = c.hist;
        o_score[i] = c.score;
        o_trace[i] = c.trace;
        o_bframe[i] = c.bframe;
        o_bscore[i] = c.bscore;
    }
    return static_cast<int64_t>(sel.size());
}

}  // extern "C"
