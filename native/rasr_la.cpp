// Fused LM-lookahead table fill for the word-conditioned tree search.
//
// One call computes a complete lookahead table (min over reachable word
// ends of scale * -ln p_lm(w|h), propagated up the compressed lookahead
// network) directly into its slot-pool row.  The numpy fill path
// (rasr_tpu/search/lm_lookahead.py LmLookahead._fill) performs ~10
// separate vectorized passes (gather, multiply, reduceat, scatter,
// per-level fancy-indexed segment mins, nan_to_num, pool copy); fills
// sit on the decode hot path (one per newly observed LM context, ~3 ms
// per table at 100k words / 130k lookahead nodes, ~20% of total decode
// wall in SCALE_BENCH).  Fusing the whole fill into one C pass removes
// every intermediate array and memory round trip.
//
// Behavioral spec: /root/reference/src/Search/LanguageModelLookahead.cc
// (computeScores / the compressed lookahead network fill); layout and
// semantics identical to LmLookahead._fill, which remains the portable
// fallback and the parity oracle (tests/test_native_la_fill.py).

#include <algorithm>
#include <cstdint>
#include <limits>

extern "C" {

// Fill one lookahead table.
//
//   tab        : [n_la] float32 output row (a slot-pool row, in place)
//   dense      : [V] float32, -ln p(w|h) for every vocabulary word
//   scale      : LM scale applied to dense scores
//   w_tok      : [n_wend] LM token id per word-end entry, grouped
//                (sorted) by lookahead node
//   w_starts   : [n_wuniq] segment starts into w_tok
//   w_la       : [n_wuniq] lookahead node per segment
//   free_la    : [n_free] lookahead nodes holding a zero-score word end
//                (silence/blank: no LM token is consumed)
//   levels     : flattened per-level propagation groups, deepest first.
//                Level l covers parents p_flat[pstart[l] .. pstart[l+1])
//                with child lists c_flat[cstart[l] .. cstart[l+1]);
//                s_flat (aligned with p_flat) holds each parent's
//                segment start within its level's child range.
//   posinf     : replacement for +inf entries (unreachable nodes must
//                not poison pruning arithmetic)
void rasr_la_fill(float* tab, int64_t n_la,
                  const float* dense, double scale,
                  const int64_t* w_tok, const int64_t* w_starts,
                  const int64_t* w_la, int64_t n_wend, int64_t n_wuniq,
                  const int64_t* free_la, int64_t n_free,
                  int64_t n_levels,
                  const int64_t* p_flat, const int64_t* pstart,
                  const int64_t* c_flat, const int64_t* cstart,
                  const int64_t* s_flat,
                  float posinf) {
    const float INF = std::numeric_limits<float>::infinity();
    std::fill(tab, tab + n_la, INF);

    const float fscale = static_cast<float>(scale);
    for (int64_t j = 0; j < n_wuniq; ++j) {
        const int64_t lo = w_starts[j];
        const int64_t hi = (j + 1 < n_wuniq) ? w_starts[j + 1] : n_wend;
        float m = INF;
        for (int64_t i = lo; i < hi; ++i) {
            const float v = fscale * dense[w_tok[i]];
            m = std::min(m, v);
        }
        tab[w_la[j]] = m;
    }
    for (int64_t i = 0; i < n_free; ++i) {
        float& t = tab[free_la[i]];
        t = std::min(t, 0.0f);
    }
    for (int64_t l = 0; l < n_levels; ++l) {
        const int64_t p0 = pstart[l], p1 = pstart[l + 1];
        const int64_t c0 = cstart[l], c1 = cstart[l + 1];
        for (int64_t j = p0; j < p1; ++j) {
            const int64_t lo = c0 + s_flat[j];
            const int64_t hi = (j + 1 < p1) ? c0 + s_flat[j + 1] : c1;
            float m = INF;
            for (int64_t i = lo; i < hi; ++i)
                m = std::min(m, tab[c_flat[i]]);
            float& t = tab[p_flat[j]];
            t = std::min(t, m);
        }
    }
    for (int64_t i = 0; i < n_la; ++i) {
        if (tab[i] == INF)             // exactly np.nan_to_num semantics:
            tab[i] = posinf;           // +inf -> posinf, NaN -> 0, finite
        else if (tab[i] != tab[i])     // values (even huge) untouched
            tab[i] = 0.0f;
    }
}

}  // extern "C"
