// Native encode front-end: LZ matcher + trace-builder FSM.
//
// The reference's runtime is native (Rust); ours keeps JAX/XLA for the
// compute path and implements the host-side encode front-end natively:
//   dtpu_match():       hash-chain greedy+lazy matcher (ir/matcher.py's
//                       algorithm, C++ speed)
//   dtpu_build_trace(): the encode-side command FSM with zero CDF work,
//                       emitting the per-nibble coding trace consumed by
//                       the device model-pass scan (codec/trace.py is
//                       the Python twin; tests assert identical traces)
//
// Scope: the fast profiles our own encoder emits (PredictionMode +
// Literal/Copy commands, block type 0, identity context maps, constant
// mixing mask). Dict commands / foreign shapes stay on the Python path.
//
// Build: make -C native  (produces libdivans_tpu_native.so; loaded via
// ctypes by divans_tpu/native.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <vector>

// DIVANS_DP_TIMING=1: per-call phase timing for dtpu_match_optimal on
// stderr (research tooling; no effect on output)
static inline double now_s() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

extern "C" {

// ---------------------------------------------------------------- matcher

// Cost-model optimal parse (quality 11): Zopfli-style shortest-path DP
// over literal/copy edges with billing-calibrated integer costs (1/16
// bit units, deterministic).  The reference reaches its q11 ratio through
// brotli's optimal parse; this is the TPU build's equivalent front-end.
// Candidates come from the same hash chains as the greedy matcher.

struct Match;  // fwd (defined below)

extern "C" int32_t dtpu_match_optimal(const uint8_t* data, int32_t n,
                                      int32_t depth, int32_t kcand,
                                      const int32_t* lit_cost16,
                                      const int32_t* dist_cost16,
                                      const int32_t* dict_len,
                                      const int32_t* dict_cost16,
                                      Match* out, int32_t out_cap);


struct Match { int32_t pos, dist, len; };

// Repeat-distance post-pass (ir/matcher._prefer_repeat_distances): swap
// a copy's distance for a distance-LRU hit when the same bytes are
// available there — an LRU mnemonic costs ~3 bits vs 4+0.55*log2(d) for
// an explicit distance (codec/copy.rs mnemonics).  The LRU is simulated
// exactly as the codec maintains it (codec/model.py).
extern "C" void dtpu_prefer_repeat(const uint8_t* data, int32_t n,
                                   Match* m, int32_t nm) {
    int32_t lru[4] = {4, 11, 15, 16};
    for (int32_t i = 0; i < nm; ++i) {
        int32_t pos = m[i].pos, dist = m[i].dist, len = m[i].len;
        int32_t best = dist;
        if (dist == 0) continue;            // dict edge marker
        bool in_lru = dist == lru[0] || dist == lru[1] || dist == lru[2]
            || dist == lru[3];
        if (!in_lru) {
            int32_t bl = 32 - __builtin_clz((uint32_t)dist);
            if (16 + 9 * bl - 48 > 0) {
                for (int k = 0; k < 4; ++k) {
                    int32_t d = lru[k];
                    if (d != dist && d <= pos && pos + len <= n
                        && memcmp(data + pos - d, data + pos,
                                  (size_t)len) == 0) {
                        best = d;
                        break;
                    }
                }
            }
        }
        m[i].dist = best;
        if (best != lru[0]) {
            if (best == lru[1]) {
                int32_t t[4] = {best, lru[0], lru[2], lru[3]};
                memcpy(lru, t, sizeof t);
            } else if (best == lru[2]) {
                int32_t t[4] = {best, lru[0], lru[1], lru[3]};
                memcpy(lru, t, sizeof t);
            } else {
                int32_t t[4] = {best, lru[0], lru[1], lru[2]};
                memcpy(lru, t, sizeof t);
            }
        }
    }
}

static inline uint32_t hash4(const uint8_t* p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return (v * 0x1E35A7BDu) >> 17;  // 15-bit bucket
}

// Greedy+lazy hash-chain matching; mirrors ir/matcher.py find_matches.
// out receives (pos, dist, len) triples; returns the number of matches.
int32_t dtpu_match(const uint8_t* data, int32_t n, int32_t quality,
                   Match* out, int32_t out_cap) {
    const int MIN_MATCH = 4;
    if (n < MIN_MATCH) return 0;
    int depth = 1 << (quality > 4 ? (quality - 4 > 6 ? 6 : quality - 4) : 0);
    bool lazy = quality >= 5;
    // chains: per-bucket vector of positions (pruned like the Python twin)
    static thread_local std::vector<std::vector<int32_t>> chains;
    chains.assign(1 << 15, {});
    int32_t count = 0;

    auto ext_len = [&](const uint8_t* a, const uint8_t* b,
                       int32_t maxl) -> int32_t {
        // 8-byte XOR compares (identical result to the byte loop; the
        // match-extension dominates the chain walk)
        int32_t l = 0;
        while (l + 8 <= maxl) {
            uint64_t xa, xb;
            memcpy(&xa, a + l, 8);
            memcpy(&xb, b + l, 8);
            uint64_t x = xa ^ xb;
            if (x) return l + (__builtin_ctzll(x) >> 3);
            l += 8;
        }
        while (l < maxl && a[l] == b[l]) ++l;
        return l;
    };
    auto best_at = [&](int32_t i, int32_t* bl, int32_t* bd) {
        *bl = 0; *bd = 0;
        if (i + MIN_MATCH > n) return;
        auto& cand = chains[hash4(data + i)];
        int32_t best_len = 0, best_dist = 0;
        int32_t lo = (int32_t)cand.size() > depth ? (int32_t)cand.size() - depth : 0;
        int32_t maxl = n - i;
        for (int32_t k = (int32_t)cand.size() - 1; k >= lo; --k) {
            int32_t j = cand[k];
            // cheap reject, exact: the chain walks nearest-first so
            // distances only grow — a candidate can only win by
            // EXTENDING past best_len, which requires a match at index
            // best_len (the equal-length+nearer tie-break is dead after
            // the first hit)
            if (best_len > 0 && best_len < maxl
                && data[j + best_len] != data[i + best_len])
                continue;
            int32_t l = ext_len(data + j, data + i, maxl);
            if (l > best_len || (l == best_len && i - j < best_dist)) {
                best_len = l;
                best_dist = i - j;
                if (l >= 128) break;
            }
        }
        if (best_len >= MIN_MATCH) { *bl = best_len; *bd = best_dist; }
    };
    auto insert = [&](int32_t i) {
        if (i + 4 <= n) {
            auto& lst = chains[hash4(data + i)];
            lst.push_back(i);
            if ((int32_t)lst.size() > 4 * depth)
                lst.erase(lst.begin(), lst.begin() + 2 * depth);
        }
    };

    int32_t i = 0;
    int32_t prev_end = 0;
    while (i + MIN_MATCH <= n) {
        int32_t l, d;
        best_at(i, &l, &d);
        if (l) {
            if (lazy && i + 1 + MIN_MATCH <= n) {
                insert(i);
                int32_t l2, d2;
                best_at(i + 1, &l2, &d2);
                if (l2 > l + 1) { i += 1; l = l2; d = d2; }
            }
            // backward extension (mirrors ir/matcher.py): misaligned
            // prefix bytes matching at distance d join the copy
            int32_t s = i;
            while (s > prev_end && s > d && data[s - 1] == data[s - 1 - d])
                --s;
            if (count >= out_cap) return -1;
            out[count++] = Match{s, d, l + (i - s)};
            int32_t end = i + l;
            prev_end = end;
            if (lazy) {
                int32_t step = (l > 64) ? (l / 8 > 1 ? l / 8 : 1) : 1;
                for (int32_t j = i + 1; j < end; j += step) insert(j);
            }
            i = end;
        } else {
            insert(i);
            i += 1;
        }
    }
    return count;
}

// ----------------------------------------------------------- trace builder

// segment offsets, indexed as passed from codec/layout.py (see
// divans_tpu/native.py SEGS for the order)
enum Seg {
    SEG_CC, SEG_LL_CS, SEG_LL_BEG, SEG_LL_LAST, SEG_LL_MANT,
    SEG_C_CCS, SEG_C_CBEG, SEG_C_CLAST, SEG_C_CMANT,
    SEG_C_DMN, SEG_C_DBEG, SEG_C_DLAST, SEG_C_DMANT,
    SEG_BT_STRIDE,
    SEG_PM_ONLY, SEG_PM_DCM, SEG_PM_PD, SEG_PM_PALETTE, SEG_PM_MVMODE,
    SEG_PM_CMN, SEG_PM_CF, SEG_PM_CS,
    SEG_LIT_HI, SEG_LIT_LO, SEG_CM_FIRST, SEG_CM_SECOND,
    SEG_D_SBEG, SEG_D_SLAST, SEG_D_IDX, SEG_D_TR,  // (decoder-only segs,
    SEG_PM_MIX,                                    //  kept for index parity
    SEG_LIT_HI_S, SEG_LIT_LO_S,
    SEG_BT_MN, SEG_BT_F, SEG_BT_S,                    //  with codec_core.cpp)
    SEG_COUNT
};


// --------------------------------------------- optimal parse (quality 11)

static inline int32_t bitlen_u32(uint32_t v) {
    return v ? 32 - __builtin_clz(v) : 0;
}

static inline int32_t copy_len_cost16(int32_t len) {
    // cmd nibble ~1.6 bits + length mnemonic/mantissas
    int32_t c = 26;
    if (len < 15) c += 40;
    else c += 64 + 11 * ((bitlen_u32((uint32_t)len) - 4) & ~3);
    return c;
}

static inline int32_t copy_cost16(int32_t len, int32_t dist,
                                  const int32_t* dist_cost16) {
    // length cost + a per-bitlen distance cost table (default calibrated
    // from billing; the second parse iteration passes costs measured
    // from a replay of the first)
    return copy_len_cost16(len) + dist_cost16[bitlen_u32((uint32_t)dist)];
}

// Per-position literal cost estimate for the optimal-parse DP, in 1/16
// bit units (the reference's q11 gets this from brotli's literal_cost.c
// sliding histogram).  A sliding 4 KiB order-1 window tracks
// p(byte | prev byte); regions of text vs binary then price their
// literals locally instead of at one corpus-wide constant, which is
// what decides copy-vs-literal near-ties correctly on mixed data.
// `scale16` calibrates model-vs-estimate (the adaptive context-mixed
// coder beats a raw order-1 estimate; swept in research).
extern "C" void dtpu_lit_costs(const uint8_t* data, int32_t n,
                               int32_t scale16, int32_t* out16) {
    const int32_t W = 4096;
    static thread_local std::vector<uint16_t> cnt;
    static thread_local std::vector<int32_t> tot;
    cnt.assign(1 << 16, 0);
    tot.assign(256, 0);
    // log2((tot+256)/(cnt+1)) via a fixed-point table: log2(a)-log2(b)
    // with 8-bit mantissa interpolation (max error ~0.003 bits, well
    // under the DP's 1/16-bit cost grid).  Encoder-side heuristic only —
    // every engine sees the identical parse, so container equality is
    // unaffected.  (log2f per byte was ~20% of q10 matcher time.)
    static int32_t log2_q8[512];     // log2(256 + m) * 256 for m in 0..255
    static bool log2_init = false;   // (cheap idempotent init; races benign)
    if (!log2_init) {
        for (int32_t m = 0; m < 512; ++m)
            log2_q8[m] = (int32_t)(__builtin_log2f(256.0f + m) * 256.0f
                                   + 0.5f);
        log2_init = true;
    }
    auto log2q8 = [&](uint32_t v) -> int32_t {
        // v >= 1; returns log2(v) * 256
        int32_t e = 31 - __builtin_clz(v);
        uint32_t m = e >= 8 ? (v >> (e - 8)) : (v << (8 - e));
        return ((e - 8) << 8) + log2_q8[m - 256];
    };
    for (int32_t i = 0; i < n; ++i) {
        int32_t p = i ? data[i - 1] : 0;
        int32_t c = cnt[(p << 8) | data[i]];
        int32_t t = tot[p];
        int32_t bits_q8 = log2q8((uint32_t)(t + 256))
            - log2q8((uint32_t)(c + 1));
        if (bits_q8 < 128) bits_q8 = 128;          // 0.5 bits
        if (bits_q8 > 14 * 256) bits_q8 = 14 * 256;
        out16[i] = (bits_q8 * scale16) >> 8;
        cnt[(p << 8) | data[i]] += 1;
        tot[p] += 1;
        if (i >= W) {
            int32_t q = i - W ? data[i - W - 1] : 0;
            cnt[(q << 8) | data[i - W]] -= 1;
            tot[q] -= 1;
        }
    }
}

int32_t dtpu_match_optimal(const uint8_t* data, int32_t n, int32_t depth,
                           int32_t kcand,
                           const int32_t* lit_cost16,
                           const int32_t* dist_cost16,
                           const int32_t* dict_len,
                           const int32_t* dict_cost16,
                           Match* out, int32_t out_cap) {
    const int MIN_MATCH = 4;
    if (n < MIN_MATCH) return 0;
    if (depth < 1) depth = 1;
    // head/prev hash chains (cache-friendly; no per-bucket allocation);
    // 17-bit buckets: 4x fewer collisions than the greedy matcher's
    // 15-bit hash, so a given depth wastes fewer compares on false hits
    static thread_local std::vector<int32_t> head, prev;
    head.assign(1 << 18, -1);
    prev.assign((size_t)n, -1);

    auto match_len = [&](int32_t a0, int32_t b0, int32_t maxl) -> int32_t {
        // 8-byte XOR compares (the match-extension loop dominates the
        // candidate search)
        int32_t l = 0;
        const uint8_t* a = data + a0;
        const uint8_t* b = data + b0;
        while (l + 8 <= maxl) {
            uint64_t xa, xb;
            memcpy(&xa, a + l, 8);
            memcpy(&xb, b + l, 8);
            uint64_t x = xa ^ xb;
            if (x) return l + (__builtin_ctzll(x) >> 3);
            l += 8;
        }
        while (l < maxl && a[l] == b[l]) ++l;
        return l;
    };

    // Per-position candidate PARETO FRONTIER: walking the chain in
    // ascending distance, a candidate only matters if strictly longer
    // than everything nearer (same length nearer is always cheaper), so
    // the useful set is (len, dist) strictly increasing in both — up to
    // K entries per position (entry 0 is the nearest match; when more
    // improvements occur than fit, the second-to-last slot is
    // overwritten, keeping the near and long ends exact).  The DP then
    // prices EVERY length at its cheapest available distance, which the
    // old longest+nearest pair could not (mid-distance mid-length
    // matches were invisible).
    // K=2 degenerates to the old nearest+longest pair (the default
    // quality's speed point); q11 pays for the wider frontier.
    const bool timing = getenv("DIVANS_DP_TIMING") != nullptr;
    double t0 = timing ? now_s() : 0.0;
    const int K = kcand < 2 ? 2 : (kcand > 8 ? 8 : kcand);
    static thread_local std::vector<int32_t> fr_len, fr_dist;
    fr_len.assign((size_t)n * K, 0);
    fr_dist.assign((size_t)n * K, 0);
    // Long-match skip (brotli backward_references_hq's shortcut): once a
    // position finds a match of length >= SKIP, the positions it covers
    // almost always ride that copy on the optimal path — searching their
    // chains re-finds suffixes of the same match at full depth cost.
    // Those positions get a SYNTHESIZED single-entry frontier instead:
    // "continue the long match" (len decaying, same distance), which is
    // the edge the DP actually uses there, and chain insertion still
    // happens so later positions see them as candidates.
    const int32_t SKIP = [&]{
        const char* e = getenv("DIVANS_DP_SKIP");
        return e ? atoi(e) : 64;
    }();
    int32_t skip_end = 0, skip_d = 0;
    // positions whose frontier is the synthesized continue-the-long-match
    // edge: cache probing is skipped there (the copy dominates; probes
    // just re-find its suffixes at full relax cost)
    static thread_local std::vector<uint8_t> synth;
    synth.assign((size_t)n, 0);
    for (int32_t i = 0; i + MIN_MATCH <= n; ++i) {
        uint32_t v;
        memcpy(&v, data + i, 4);
        uint32_t h = (v * 0x1E35A7BDu) >> 14;
        int32_t* fl = fr_len.data() + (size_t)i * K;
        int32_t* fd = fr_dist.data() + (size_t)i * K;
        if (i < skip_end) {
            int32_t rem = skip_end - i;
            if (rem >= MIN_MATCH) {
                fl[0] = rem;
                fd[0] = skip_d;
            }
            synth[i] = 1;
            prev[i] = head[h];
            head[h] = i;
            continue;
        }
        int32_t best_len = 0;
        int32_t nf = 0;
        int32_t j = head[h];
        int32_t maxl = n - i;
        for (int32_t k = 0; k < depth && j >= 0; ++k, j = prev[j]) {
            // cheap reject: a frontier entry must extend past best_len
            if (best_len > 0 && best_len < maxl
                && data[j + best_len] != data[i + best_len])
                continue;
            int32_t l = match_len(j, i, maxl);
            if (l > best_len && l >= MIN_MATCH) {
                if (nf >= K) {          // keep the longest at K-1 exact
                    fl[K - 1] = l;
                    fd[K - 1] = i - j;
                } else {
                    fl[nf] = l;
                    fd[nf] = i - j;
                    ++nf;
                }
                best_len = l;
                if (l >= 256) break;
            }
        }
        // (slots beyond nf stay 0 — the DP stops at the first 0 length)
        prev[i] = head[h];
        head[h] = i;
        if (SKIP > 0 && best_len >= SKIP) {
            skip_end = i + best_len;
            skip_d = nf >= K ? fd[K - 1] : fd[nf - 1];  // longest entry
        }
    }

    double t1 = timing ? now_s() : 0.0;

    // Forward DP carrying the TRUE distance-LRU along the best path
    // (the zopfli dist-cache idea, brotli backward_references_hq.c's
    // ZopfliNode cache): cost[i] = cheapest coding of data[:i]; each
    // position's cache is the last <= 4 distinct copy distances on ITS
    // OWN best path, read by walking the copy-end anchor chain.  The
    // old backward DP's pair-credit (rep_bonus) left the mnemonic rate
    // at ~7% of copies while explicit distances averaged ~14.7 bits —
    // half of all q11 bits (billing, PERF_NOTES round-4).  Here cache
    // hits price at the mnemonic differential AND the cache distances
    // are probed as first-class match candidates: a slightly shorter
    // copy at a reused distance routinely beats a longer one at
    // explicit cost.
    const int64_t INF = (int64_t)1 << 60;
    std::vector<int64_t> cost((size_t)n + 1, INF);
    // edge INTO position i: elen 0 = literal, else copy/dict of that
    // length ending at i (edist 0 marks dict)
    std::vector<int32_t> elen((size_t)n + 1, 0), edist((size_t)n + 1, 0);
    std::vector<int32_t> anchor((size_t)n + 1, -1);  // latest copy-end on path
    std::vector<int32_t> aprev((size_t)n + 1, -1);   // at a copy-end: previous
    std::vector<int32_t> adist((size_t)n + 1, 0);    // at a copy-end: distance
    cost[0] = 0;
    // mnemonic differential: both paths pay the dmn nibble; a hit skips
    // dbeg/dlast/dmant but raises dmn entropy as the rate climbs —
    // priced at 3 bits (swept 8..48: flat band, 48 best on corpus AND
    // alice — matching the old rep_bonus credit)
    const int32_t mn16 = [&]{
        const char* e = getenv("DIVANS_MN_COST16");
        return e ? atoi(e) : 48;
    }();
    // cache PRICING is free for every quality (replaces the old
    // rep_bonus pair-credit); cache PROBING (4 match_len per position)
    // is paid only at the q11 frontier widths
    const bool probe_cache = K >= 3;
    // the distance cache is a pure function of anchor[i], and the anchor
    // chain below position i is frozen (forward DP writes only forward
    // indices) — memoize it across the long runs of positions that share
    // one anchor instead of re-walking the chain every position
    int32_t cache[4];
    int nc = 0;
    int32_t cache_anchor = -2;
    for (int32_t i = 0; i < n; ++i) {
        const int64_t ci = cost[i];
        // literal edge
        if (ci + lit_cost16[i] < cost[i + 1]) {
            cost[i + 1] = ci + lit_cost16[i];
            elen[i + 1] = 0;
            anchor[i + 1] = anchor[i];
        }
        if (anchor[i] != cache_anchor) {
            cache_anchor = anchor[i];
            nc = 0;
            for (int32_t a = cache_anchor; a >= 0 && nc < 4; a = aprev[a]) {
                int32_t d = adist[a];
                bool dup = false;
                for (int k = 0; k < nc; ++k)
                    if (cache[k] == d) { dup = true; break; }
                if (!dup) cache[nc++] = d;
            }
        }
        auto relax_copy = [&](int32_t l, int32_t d, int32_t c16) {
            if (ci + c16 < cost[i + l]) {
                cost[i + l] = ci + c16;
                elen[i + l] = l;
                edist[i + l] = d;
                anchor[i + l] = i + l;
                aprev[i + l] = anchor[i];
                adist[i + l] = d;
            }
        };
        auto dist16 = [&](int32_t d) -> int32_t {
            for (int k = 0; k < nc; ++k)
                if (cache[k] == d) return mn16;
            return dist_cost16[bitlen_u32((uint32_t)d)];
        };
        int32_t maxl = n - i;
        // cache-distance candidates: the 4 LRU distances (mnemonics
        // 0-3) plus lru[0..1] +/- 1..3 (mnemonics 4-14), each probed as
        // a first-class match
        int32_t probes[16];
        int np = 0;
        if (probe_cache) {
            for (int k = 0; k < nc; ++k) probes[np++] = cache[k];
            // the +/-1..3 mnemonic variants only pay off where the
            // parse is open; inside a synthesized long-match region
            // they just re-find the copy's suffixes (measured
            // ratio-neutral to skip, probe sweep in PERF_NOTES r5)
            if (!synth[i])
                for (int k = 0; k < nc && k < 2; ++k)
                    for (int32_t s = 1; s <= 3; ++s) {
                        probes[np++] = cache[k] + s;
                        probes[np++] = cache[k] - s;
                    }
        }
        const int32_t* fl_i = fr_len.data() + (size_t)i * K;
        const int32_t* fd_i = fr_dist.data() + (size_t)i * K;
        for (int k = 0; k < np; ++k) {
            int32_t d = probes[k];
            if (d <= 0 || d > i) continue;
            bool dup = false;
            for (int k2 = 0; k2 < k; ++k2)
                if (probes[k2] == d) { dup = true; break; }
            if (dup) continue;
            // PURE cache distance == the NEAREST frontier entry: every
            // length 4..fl[0] at d is priced at the mnemonic by dist16()
            // in the frontier relax below (d is in the cache, entry 0
            // covers all those lengths), so only the len-2/3 edges are
            // new — skip the long relax loop (the probe pass's dominant
            // cost on repetitive data).  +/-1..3 variants are NOT in the
            // cache (they price via mnemonics 4-14 that dist16 cannot
            // see), and farther frontier entries only cover their own
            // tier — both keep the full probe.
            int32_t lmax = maxl;
            if (k < nc && fl_i[0] >= MIN_MATCH && fd_i[0] == d)
                lmax = lmax < 3 ? lmax : 3;
            int32_t l = match_len(i - d, i, lmax);
            if (l < 2) continue;
            int32_t l2 = 2;
            while (l2 <= l) {
                relax_copy(l2, d, copy_len_cost16(l2) + mn16);
                if (l2 < 24) ++l2;
                else if (l2 < l) {
                    int32_t step = l2 >> 2 > 16 ? l2 >> 2 : 16;
                    l2 = l2 + step <= l ? l2 + step : l;
                } else ++l2;
            }
        }
        // frontier edges: every length prices at its cheapest available
        // distance — the first frontier entry with len >= l.  Dense
        // lengths to 24, then every frontier endpoint plus geometric
        // samples (cost[] cliffs between samples are rare past 24; dense
        // stepping made long runs quadratic).
        const int32_t* fl = fr_len.data() + (size_t)i * K;
        const int32_t* fd = fr_dist.data() + (size_t)i * K;
        if (fl[0] >= MIN_MATCH) {
            int32_t fi = 0;
            int32_t L = 0;
            for (int32_t k = 0; k < K && fl[k]; ++k) L = fl[k];
            int32_t l = MIN_MATCH;
            // hoist the distance cost per frontier ENTRY (<= K lookups)
            // instead of per length (~L lookups)
            int32_t d = fd[0], dc = dist16(d);
            while (l <= L) {
                if (fl[fi] < l) {           // step to the next tier
                    while (fl[fi] < l) ++fi;   // ends: some entry >= l
                    d = fd[fi];
                    dc = dist16(d);
                }
                relax_copy(l, d, copy_len_cost16(l) + dc);
                if (l < 24) {
                    ++l;
                } else if (l < fl[fi]) {
                    int32_t step = l >> 2 > 16 ? l >> 2 : 16;
                    l = l + step <= fl[fi] ? l + step : fl[fi];
                } else {
                    ++l;                    // step to the next frontier tier
                }
            }
        }
        if (dict_len && dict_len[i] > 0) {
            // static-dictionary edge; dist 0 marks it for the caller
            int32_t dl = dict_len[i];
            if (ci + dict_cost16[i] < cost[i + dl]) {
                cost[i + dl] = ci + dict_cost16[i];
                elen[i + dl] = dl;
                edist[i + dl] = 0;
                anchor[i + dl] = anchor[i];   // dict skips the distance LRU
            }
        }
    }
    if (timing) {
        double t2 = now_s();
        fprintf(stderr, "[dp_timing] n=%d frontier=%.3fs dp=%.3fs\n",
                n, t1 - t0, t2 - t1);
    }

    // backward reconstruction, emitted forward
    int32_t count = 0;
    for (int32_t i = n; i > 0;) {
        if (elen[i]) {
            ++count;
            i -= elen[i];
        } else {
            --i;
        }
    }
    if (count > out_cap) return -1;
    int32_t w = count;
    for (int32_t i = n; i > 0;) {
        if (elen[i]) {
            --w;
            out[w].pos = i - elen[i];
            out[w].dist = edist[i];
            out[w].len = elen[i];
            i -= elen[i];
        } else {
            --i;
        }
    }
    return count;
}

// Static-dictionary candidate scan (q11): for every position, the
// longest materialized transform output matching the data, via a
// binary search over the sorted 4-byte output prefixes and a
// longest-first memcmp scan of the matching bucket.  The index arrays
// are built once in Python (ir/matcher._dict_flat_index) from the RFC
// 7932 dictionary + transform set; this pass is what makes full-breadth
// dict matching affordable (the Python per-position scan was ~100x
// slower).  Writes out_len[i] (0 = no hit) and ent_idx[i] (entry id for
// wid/tid recovery).
extern "C" void dtpu_dict_scan(const uint8_t* data, int32_t n,
                               const uint32_t* grams, int32_t n_grams,
                               const int32_t* pref16_off,
                               const int32_t* bucket_off,
                               const uint8_t* out_blob,
                               const int32_t* ent_off,
                               const int32_t* ent_len,
                               const uint64_t* ent_p8,
                               const uint64_t* ent_m8,
                               int32_t* out_len, int32_t* ent_idx) {
    // rolling big-endian gram; pref16_off[p..p+1] bounds the sorted-gram
    // range sharing 16-bit prefix p, so the common case (no dictionary
    // word starts here) is two loads and a compare.  Bucket entries are
    // longest-first, so most FAIL: one masked u64 compare per entry
    // (ent_p8/ent_m8 = the entry's first <=8 bytes) replaces a memcmp.
    uint32_t g = n >= 4
        ? (((uint32_t)data[0] << 24) | ((uint32_t)data[1] << 16)
           | ((uint32_t)data[2] << 8) | (uint32_t)data[3])
        : 0;
    for (int32_t i = 0; i + 4 <= n; ++i) {
        out_len[i] = 0;
        ent_idx[i] = -1;
        int32_t lo = pref16_off[g >> 16], hi = pref16_off[(g >> 16) + 1];
        if (lo < hi) {
            while (lo < hi) {
                int32_t mid = (lo + hi) >> 1;
                if (grams[mid] < g) lo = mid + 1;
                else hi = mid;
            }
            if (lo < n_grams && grams[lo] == g) {
                uint64_t d8 = 0;
                if (i + 8 <= n) {
                    memcpy(&d8, data + i, 8);
                    d8 = __builtin_bswap64(d8);
                } else {
                    for (int32_t b = 0; b < n - i; ++b)
                        d8 |= (uint64_t)data[i + b] << (8 * (7 - b));
                }
                for (int32_t e = bucket_off[lo]; e < bucket_off[lo + 1];
                     ++e) {
                    int32_t l = ent_len[e];
                    if (i + l > n) continue;
                    if ((d8 & ent_m8[e]) != ent_p8[e]) continue;
                    if (l <= 8
                        || memcmp(data + i + 8, out_blob + ent_off[e] + 8,
                                  (size_t)(l - 8)) == 0) {
                        out_len[i] = l;
                        ent_idx[i] = e;
                        break;
                    }
                }
            }
        }
        if (i + 4 < n) g = (g << 8) | data[i + 4];
    }
    for (int32_t i = n < 4 ? 0 : n - 3; i < n; ++i) {
        out_len[i] = 0;
        ent_idx[i] = -1;
    }
}

// One-call q10/q11 parse: literal costs + DP + repeat-distance rewrite
// in a single GIL-free native call.  The Python orchestration
// (ir/matcher.find_matches_optimal) funnels here, so the golden and
// native engines share the identical parse by construction; the win is
// removing the per-frame Python round-trips (tolist of ~13k matches,
// double buffer copies, numpy entropy) that serialized the encode pool
// on the GIL.
//   lit_scale16 > 0: per-position sliding order-1 costs (dtpu_lit_costs)
//   lit_scale16 = 0: one calibrated constant = order-1 entropy * 0.92
//                    (ir/optimize.order1_bits_per_byte's rule)
extern "C" int32_t dtpu_parse_optimal(const uint8_t* data, int32_t n,
                                      int32_t depth, int32_t kcand,
                                      int32_t lit_scale16,
                                      int32_t dist_base16,
                                      int32_t dist_slope16,
                                      const int32_t* dict_len,
                                      const int32_t* dict_cost16,
                                      Match* out, int32_t out_cap) {
    if (n < 4) return 0;
    static thread_local std::vector<int32_t> lit;
    lit.resize((size_t)n);
    if (lit_scale16 > 0) {
        dtpu_lit_costs(data, n, lit_scale16, lit.data());
        for (int32_t i = 0; i < n; ++i)
            if (lit[i] < 8) lit[i] = 8;
    } else {
        // order-1 conditional entropy, bits/byte (double math, matching
        // the numpy twin's formula)
        static thread_local std::vector<uint32_t> cnt;
        cnt.assign(1 << 16, 0);
        uint32_t row[256] = {0};
        for (int32_t i = 1; i < n; ++i) {
            cnt[((uint32_t)data[i - 1] << 8) | data[i]] += 1;
            row[data[i - 1]] += 1;
        }
        double h = 0.0;
        for (int32_t p = 0; p < 256; ++p) {
            if (!row[p]) continue;
            double t = (double)row[p];
            const uint32_t* cp = cnt.data() + (p << 8);
            for (int32_t c = 0; c < 256; ++c)
                if (cp[c])
                    h -= (double)cp[c] * __builtin_log2((double)cp[c] / t);
        }
        double bits = n >= 2 ? h / (double)(n - 1) : 8.0;
        int32_t c16 = (int32_t)(bits * 0.92 * 16.0);
        if (c16 < 8) c16 = 8;
        for (int32_t i = 0; i < n; ++i) lit[i] = c16;
    }
    int32_t dist16[33];
    for (int32_t bl = 0; bl < 33; ++bl)
        dist16[bl] = dist_base16 + dist_slope16 * bl;
    int32_t nm = dtpu_match_optimal(data, n, depth, kcand, lit.data(),
                                    dist16, dict_len, dict_cost16,
                                    out, out_cap);
    if (nm > 0) dtpu_prefer_repeat(data, n, out, nm);
    return nm;
}

struct Speed { int32_t inc, lim; };
static const Speed MUD{0x10, 0x2000}, SLOW{0x20, 0x1000}, MED{0x30, 0x4000},
    FAST{0x60, 0x4000}, PLANE{0x80, 0x4000}, ROCKET{0x180, 0x4000};
static const int32_t NOOP_LIM = 0x4000;

struct TraceCtx {
    const int32_t* seg;
    int32_t* out;       // [cap, 10]
    int32_t cap, nsteps;
    bool overflow;
    // bookkeeping
    int32_t l4s = 3 << 4;
    int32_t dlru[4] = {4, 11, 15, 16};
    int32_t last_llen = 1, last_clen = 1, last_dlen = 1;
    // literal side
    const uint8_t* lut0;
    const uint8_t* lut1;
    bool combine = false;
    bool use_cm = true;        // profile: cm (mm=0) vs stride (mm=4)
    Speed adapt[4] = {MUD, MUD, {8, 8192}, {8, 8192}};
    int32_t nctx;              // layout cm_second minor dim
    int32_t lo_shift = 0;      // deferred layouts bucket lo ctx 64 -> 8
    int32_t self_fed = 0;      // deferred-v2: lit history = lit bytes only
    uint64_t l8 = 0;           // last 8 literal bytes, newest in the top 8
    int64_t lit_seen = 0;      // literal byte counter (deferred-v3 subs)
    int32_t stride = 1;        // EFFECTIVE stride (min(7, v^4) + 1), cm off
    int32_t mv_value = 0;      // wire mask value v = 4 + min(7, s-1)
    const uint8_t* mask = nullptr;  // per-context mask (8192), cm on
    int32_t nb = 1;            // literal block types (split profile <= 4)
    int32_t nctx_hi = 64;      // lit_hi / lit_hi_s minor dim (64 * nb)
    int32_t btype_last = 0;    // current literal block type
    int32_t bt_lru0 = 0, bt_lru1 = 1;  // literal btype LRU (model.py)
    int32_t bt_max_seen = 0;

    // effective mask value for one literal nibble (engine_np mm_opts):
    // explicit per-context mask, else the constant stride-with-cm mask
    inline int32_t mask_at(int32_t idx) const {
        if (mask) return mask[idx];
        return (use_cm && stride > 1) ? mv_value : 0;
    }
};

static inline void rec(TraceCtx& c, int32_t flat, int32_t value,
                       int32_t stream, Speed sp, int32_t mix = 0,
                       int32_t which = 0, int32_t cm_idx = 0,
                       Speed cm_sp = {0, NOOP_LIM}) {
    if (c.nsteps >= c.cap) { c.overflow = true; return; }
    int32_t* r = c.out + (int64_t)c.nsteps * 10;
    r[0] = flat; r[1] = value; r[2] = stream; r[3] = sp.inc; r[4] = sp.lim;
    r[5] = mix; r[6] = which; r[7] = cm_idx; r[8] = cm_sp.inc; r[9] = cm_sp.lim;
    c.nsteps++;
}

static inline int32_t bitlen(uint32_t v) {
    return v ? 32 - __builtin_clz(v) : 0;
}
static inline int32_t rum4(int32_t v) { return ((v - 1) | 3) + 1; }

static void mantissa(TraceCtx& c, int32_t seg_rest, int32_t seg_first,
                     int32_t value, int32_t len_rem, int32_t seed,
                     Speed sp_rest, Speed sp_first) {
    int32_t decoded = seed;
    int i = 0;
    while (len_rem > 0) {
        int32_t next_rem = len_rem - 4;
        int32_t nib = ((value ^ decoded) >> next_rem) & 0xF;
        rec(c, i == 0 ? seg_first : seg_rest, nib, 0,
            i == 0 ? sp_first : sp_rest);
        decoded |= nib << next_rem;
        len_rem = next_rem;
        ++i;
    }
}

// deferred-v3 format constant: literal bytes per lit sub-stream
// (normative twin of codec/deferred.py SUB_LIT; cross-checked by the
// golden<->native byte-equality tests)
static constexpr int64_t SUB_LIT = 1 << 15;

static void code_literal_content(TraceCtx& c, const uint8_t* raw,
                                 int32_t pos, int32_t nbytes) {
    const int32_t* seg = c.seg;
    for (int32_t k = 0; k < nbytes; ++k) {
        int32_t p = pos + k;
        if (c.self_fed) {
            // deferred-v3 lit sub-streams: the context keys recompute
            // against a zeroed literal history at every SUB_LIT
            // boundary (the decoder resets the same way); the model
            // resets happen downstream, per sub-trace
            if (c.lit_seen && (c.lit_seen % SUB_LIT) == 0) c.l8 = 0;
            ++c.lit_seen;
        }
        // deferred-v2 streams feed literal history from the literal
        // stream itself; adaptive streams use the window (reference).
        // On the encode side window bytes ARE raw bytes, so the window
        // reads index raw[] directly.
        int32_t prev = c.self_fed ? (int32_t)((c.l8 >> 0x38) & 0xFF)
                                  : (p >= 1 ? raw[p - 1] : 0);
        int32_t prev2 = c.self_fed ? (int32_t)((c.l8 >> 0x30) & 0xFF)
                                   : (p >= 2 ? raw[p - 2] : 0);
        int32_t byte = raw[p];
        int32_t hi = byte >> 4, lo = byte & 0xF;
        if (c.use_cm) {   // ctx tables (sel 0) or masked stride (sel 1)
            // identity lcm: actual ctx = selected + btype*64 (engine_np
            // cmap_index = selected + btype_last << 6)
            int32_t ctx = (c.lut0[prev] | c.lut1[prev2])
                + (c.btype_last << 6);
            int32_t ctx_lo = ctx >> c.lo_shift;  // deferred lo bucketing
            // per-nibble mixing mask (engine_np._literal_nibble):
            // mm_index = ctx | (hi prior << 8) [| 4096 for the low nibble]
            int32_t mo_hi = c.mask_at(ctx | ((prev >> 4) << 8));
            int32_t mo_lo = c.mask_at(ctx | (hi << 8) | 4096);
            int32_t hi_flat, lo_flat;
            if (mo_hi == 0) {
                hi_flat = seg[SEG_LIT_HI] + ctx;
            } else {       // stride prior keyed (sb, ctx), sel 1
                int32_t x = mo_hi ^ 4;
                int32_t s = x < 7 ? x + 1 : 8;
                int32_t sb = c.self_fed
                    ? (int32_t)((c.l8 >> (0x38 - ((s - 1) << 3))) & 0xFF)
                    : (p >= s ? raw[p - s] : 0);
                hi_flat = seg[SEG_LIT_HI_S] + sb * c.nctx_hi + ctx;
            }
            if (mo_lo == 0) {
                lo_flat = seg[SEG_LIT_LO] + ctx_lo * 16 + hi;
            } else {       // stride prior keyed (sb, hi), sel 1
                int32_t x = mo_lo ^ 4;
                int32_t s = x < 7 ? x + 1 : 8;
                int32_t sb = c.self_fed
                    ? (int32_t)((c.l8 >> (0x38 - ((s - 1) << 3))) & 0xFF)
                    : (p >= s ? raw[p - s] : 0);
                lo_flat = seg[SEG_LIT_LO_S] + sb * 16 + hi;
            }
            if (c.combine) {
                rec(c, hi_flat, hi, 1, c.adapt[0], 1, 1,
                    seg[SEG_CM_FIRST] + ctx, c.adapt[3]);
                rec(c, lo_flat, lo, 1, c.adapt[0], 1, 0,
                    seg[SEG_CM_SECOND] + hi * c.nctx + ctx_lo, c.adapt[2]);
            } else {
                rec(c, hi_flat, hi, 1, c.adapt[0]);
                rec(c, lo_flat, lo, 1, c.adapt[0]);
            }
        } else {          // mm_opts == 4+s-1: stride-s prior, sel 1, ctx 0
            // engine_np._literal_nibble: stride_byte = l8 byte s back
            int32_t s = c.stride;
            int32_t sb = c.self_fed
                ? (int32_t)((c.l8 >> (0x38 - ((s - 1) << 3))) & 0xFF)
                : (p >= s ? raw[p - s] : 0);
            int32_t hi_flat = seg[SEG_LIT_HI] + sb;
            int32_t lo_flat = seg[SEG_LIT_LO] + sb * 16 + hi;
            if (c.combine) {
                rec(c, hi_flat, hi, 1, c.adapt[0], 1, 1,
                    seg[SEG_CM_FIRST] + 0, c.adapt[3]);
                rec(c, lo_flat, lo, 1, c.adapt[0], 1, 0,
                    seg[SEG_CM_SECOND] + hi * c.nctx + 0, c.adapt[2]);
            } else {
                rec(c, hi_flat, hi, 1, c.adapt[0]);
                rec(c, lo_flat, lo, 1, c.adapt[0]);
            }
        }
        c.l8 = (c.l8 >> 8) | ((uint64_t)byte << 0x38);
    }
}

static void code_literal(TraceCtx& c, const uint8_t* raw, int32_t pos,
                         int32_t len) {
    const int32_t* seg = c.seg;
    int32_t serialized = len - 15;
    int32_t shortcut = len - 1 < 14 ? len - 1 : 14;
    rec(c, seg[SEG_LL_CS], shortcut, 0, MED);
    if (shortcut < 14) {
        c.last_llen = len;
    } else {
        int32_t lllen = bitlen((uint32_t)serialized);
        int32_t beg = lllen < 15 ? lllen : 15;
        rec(c, seg[SEG_LL_BEG], beg, 0, MUD);
        if (beg == 15) {
            rec(c, seg[SEG_LL_LAST], (lllen - 15) & 0xF, 0, MUD);
            mantissa(c, seg[SEG_LL_MANT], seg[SEG_LL_MANT], serialized,
                     rum4(lllen - 1), 1 << (lllen - 1), MUD, MUD);
            c.last_llen = len;
        } else if (beg <= 1) {
            // quirk kept from the reference: last_llen not updated
        } else {
            mantissa(c, seg[SEG_LL_MANT], seg[SEG_LL_MANT], serialized,
                     rum4(beg - 1), 1 << (beg - 1), MUD, MUD);
            c.last_llen = len;
        }
    }
    code_literal_content(c, raw, pos, len);
}

static bool dist_from_mnemonic(const int32_t* lru, int32_t code,
                               int32_t* out) {
    if (code < 4) { *out = lru[code]; return true; }
    int32_t unsigned_v = code >> 2;
    int32_t signed_v = (code & 1) ? -unsigned_v : unsigned_v;
    int32_t index = (code & 2) >> 1;
    int32_t ret = lru[index] + signed_v;
    *out = ret;
    return ret > 0;
}

static void code_copy(TraceCtx& c, int32_t distance, int32_t num_bytes) {
    const int32_t* seg = c.seg;
    // CountSmall
    int32_t cs_index = ((c.l4s >> 4) & 3)
        + 4 * ((c.last_llen - 1 < 3) ? c.last_llen - 1 : 3);
    int32_t shortcut = num_bytes < 15 ? num_bytes : 15;
    rec(c, seg[SEG_C_CCS] + cs_index, shortcut, 0, MUD);
    if (shortcut < 15) {
        c.last_clen = bitlen((uint32_t)num_bytes);
    } else {
        int32_t clen = bitlen((uint32_t)num_bytes);
        int32_t beg = (clen - 4) < 15 ? (clen - 4) : 15;
        rec(c, seg[SEG_C_CBEG], beg, 0, FAST);
        if (beg == 15) {
            rec(c, seg[SEG_C_CLAST], (clen - 19) & 0xF, 0, FAST);
            c.last_clen = clen;
            mantissa(c, seg[SEG_C_CMANT] + 0, seg[SEG_C_CMANT] + (c.last_clen % 4) + 1,
                     num_bytes, rum4(clen - 1 /*last+18 = clen-1*/),
                     1 << (clen - 1), SLOW, SLOW);
        } else {
            c.last_clen = beg + 4;
            mantissa(c, seg[SEG_C_CMANT] + 0, seg[SEG_C_CMANT] + (c.last_clen % 4) + 1,
                     num_bytes, rum4(beg + 3), 1 << (beg + 3), SLOW, SLOW);
        }
    }
    // distance: identity dcm -> actual_prior = min(max(nb,2)-2,3)
    int32_t ap = num_bytes > 2 ? num_bytes - 2 : 0;
    if (ap > 3) ap = 3;
    int32_t mn = 15;
    for (int32_t code = 0; code < 15; ++code) {
        int32_t item;
        if (dist_from_mnemonic(c.dlru, code, &item) && item == distance) {
            mn = code;
            break;
        }
    }
    rec(c, seg[SEG_C_DMN] + ap * 2 + (c.last_llen < 8 ? 1 : 0), mn, 0, SLOW);
    if (mn != 15) {
        c.last_dlen = bitlen((uint32_t)distance);
    } else {
        int32_t dlen = bitlen((uint32_t)distance);
        int32_t beg = (dlen - 1) < 14 ? (dlen - 1) : 14;
        if (c.dlru[1] - 3 == distance) beg = 15;
        int32_t dist_index = bitlen((uint32_t)num_bytes) >> 2;
        rec(c, seg[SEG_C_DBEG] + ap * 8 + dist_index, beg, 0, SLOW);
        if (beg == 15) {
            c.last_dlen = bitlen((uint32_t)(c.dlru[1] - 3));
        } else if (beg == 14) {
            rec(c, seg[SEG_C_DLAST] + ap, (dlen - 15) & 0xF, 0, ROCKET);
            c.last_dlen = dlen;
            int32_t fi = (c.last_dlen & 3) + 1;
            Speed sp0{0x4 << ((fi & 6) << ((fi & 2) >> 1)), 0x4000};
            mantissa(c, seg[SEG_C_DMANT] + ap * 5 + 0,
                     seg[SEG_C_DMANT] + ap * 5 + fi,
                     distance, rum4(dlen - 1), 1 << (dlen - 1),
                     Speed{4, 0x4000}, sp0);
        } else if (beg == 0) {
            c.last_dlen = 1;
        } else {
            c.last_dlen = beg + 1;
            int32_t fi = (c.last_dlen & 3) + 1;
            Speed sp0{0x4 << ((fi & 6) << ((fi & 2) >> 1)), 0x4000};
            mantissa(c, seg[SEG_C_DMANT] + ap * 5 + 0,
                     seg[SEG_C_DMANT] + ap * 5 + fi,
                     distance, rum4(beg), 1 << beg,
                     Speed{4, 0x4000}, sp0);
        }
    }
    // obs_distance LRU
    int32_t* l = c.dlru;
    if (distance == l[1]) {
        int32_t t[4] = {distance, l[0], l[2], l[3]};
        memcpy(l, t, sizeof t);
    } else if (distance == l[2]) {
        int32_t t[4] = {distance, l[0], l[1], l[3]};
        memcpy(l, t, sizeof t);
    } else if (distance != l[0]) {
        int32_t t[4] = {distance, l[0], l[1], l[2]};
        memcpy(l, t, sizeof t);
    }
}

static void code_prediction_mode(TraceCtx& c, int32_t mixing,
                                 int32_t prior_depth) {
    const int32_t* seg = c.seg;
    rec(c, seg[SEG_PM_ONLY], 3, 0, MED);                   // utf8
    rec(c, seg[SEG_PM_DCM], mixing & 0xF, 0, MED);
    rec(c, seg[SEG_PM_PD], prior_depth, 0, FAST);
    // adaptation speeds: 4 speeds x 4 palette nibbles, f8 encoding
    for (int si = 0; si < 4; ++si) {
        int32_t vals[2];
        for (int hv = 0; hv < 2; ++hv) {
            int32_t v = hv == 0 ? c.adapt[si].inc : c.adapt[si].lim;
            int32_t length = bitlen((uint32_t)v);
            int32_t f8 = 0;
            if (v != 0) {
                int32_t rem = v - (1 << (length - 1));
                int32_t mant = (rem << 3) >> (length - 1);
                f8 = ((length << 3) | mant) & 0xFF;
            }
            vals[hv] = f8 & 0x7F;
        }
        rec(c, seg[SEG_PM_PALETTE] + 0, vals[0] >> 3, 0, FAST);
        rec(c, seg[SEG_PM_PALETTE] + 1, vals[0] & 7, 0, FAST);
        rec(c, seg[SEG_PM_PALETTE] + 2, vals[1] >> 3, 0, FAST);
        rec(c, seg[SEG_PM_PALETTE] + 3, vals[1] & 7, 0, FAST);
    }
    // context maps via the 13-entry LRU mnemonic coder
    int32_t lru[13];
    auto reset_lru = [&]() { for (int i = 0; i < 13; ++i) lru[i] = i; };
    auto obs = [&](int32_t val) {
        int pos = -1;
        for (int i = 0; i < 13; ++i) if (lru[i] == val) { pos = i; break; }
        if (pos == 0) return;
        if (pos > 0) {
            for (int i = pos; i > 0; --i) lru[i] = lru[i - 1];
        } else {
            for (int i = 12; i > 0; --i) lru[i] = lru[i - 1];
        }
        lru[0] = val;
    };
    auto code_map = [&](int which, int nvals) {
        for (int idx = 0; idx < nvals; ++idx) {
            int32_t target = idx;  // identity map
            int32_t mn = 15;
            for (int li = 0; li < 13; ++li)
                if (lru[li] == target) mn = li;
            int32_t mx = lru[0];
            for (int li = 1; li < 13; ++li) if (lru[li] > mx) mx = lru[li];
            if (target == ((mx + 1) & 0xFF)) mn = 13;
            rec(c, seg[SEG_PM_CMN] + which, mn, 0, MED);
            if (mn == 15) {
                rec(c, seg[SEG_PM_CF] + which, target >> 4, 0, MED);
                rec(c, seg[SEG_PM_CS] + which, target & 0xF, 0, MED);
            }
            obs(target);
        }
        rec(c, seg[SEG_PM_CMN] + which, 14, 0, MED);  // eof
    };
    reset_lru();
    code_map(0, c.use_cm ? 64 * c.nb : 0);
    reset_lru();
    code_map(1, c.use_cm ? 4 : 0);
    // mixing-value mode selection mirrors the golden encoder exactly
    // (engine_np.code_prediction_mode): 0 all-zero, 1 all-four (cm off),
    // 2 explicit 8192 nibbles, 3 constant value + one nibble
    int32_t mv_mode;
    if (!c.use_cm) {
        mv_mode = c.stride == 1 ? 1 : 3;
    } else if (c.mask) {
        bool anyv = false, constant = true;
        for (int i = 0; i < 8192; ++i) {
            if (c.mask[i]) anyv = true;
            if (c.mask[i] != c.mask[0]) constant = false;
        }
        bool per_t = c.nb >= 1;
        for (int i = 0; i < 8192 && per_t; ++i) {
            int32_t t = (i & 0xFF) >> 6;
            if (t > c.nb - 1) t = c.nb - 1;
            if (c.mask[i] != c.mask[t * 64]) per_t = false;
        }
        if (!anyv) { mv_mode = 0; c.mask = nullptr; }
        else if (constant) { mv_mode = 3; c.mv_value = c.mask[0]; }
        else if (per_t) { mv_mode = 4; }
        else if (!c.combine) { mv_mode = 0; c.mask = nullptr; }
        else mv_mode = 2;
    } else if (c.stride > 1) {
        mv_mode = 3;   // constant stride mask with the context map on
    } else {
        mv_mode = 0;
    }
    rec(c, seg[SEG_PM_MVMODE], mv_mode, 0, MED);
    if (mv_mode == 3) {  // constant mask value 4+min(7,s-1) (engine_np)
        rec(c, seg[SEG_PM_MIX] + 16, c.mv_value, 0, PLANE);
    } else if (mv_mode == 4) {  // one value per literal block type
        for (int32_t t = 0; t < c.nb; ++t)
            rec(c, seg[SEG_PM_MIX] + 16, c.mask[t * 64], 0, PLANE);
    } else if (mv_mode == 2) {
        for (int32_t i = 0; i < 8192; ++i) {
            int32_t prior = i >= 256 ? (c.mask[i - 256] & 0xF) : 16;
            rec(c, seg[SEG_PM_MIX] + prior, c.mask[i], 0, PLANE);
        }
    }
}

// Build the full per-metablock trace. matches: triples from dtpu_match.
// Returns n_steps, or -1 on overflow.
int32_t dtpu_build_trace(
        const uint8_t* raw, int32_t raw_len,
        const Match* matches, int32_t n_matches,
        int32_t use_cm, int32_t mixing, int32_t prior_depth,
        int32_t stride,               // constant literal stride (cm off)
        const int32_t* adapt_speeds,  // [4][2] inc,lim
        const int32_t* seg_offsets, int32_t nctx, int32_t lo_shift,
        int32_t self_fed,
        const uint8_t* lut0, const uint8_t* lut1,
        const uint8_t* mask,
        int32_t* out, int32_t out_cap) {
    TraceCtx c{};
    c.lo_shift = lo_shift;
    c.self_fed = self_fed;
    c.mask = mask;
    // The wire carries mask value v = 4 + min(7, s-1) and the engine
    // fetches min(7, v^4) + 1 back (engine_np stride_offset) — so the
    // EFFECTIVE stride for s in 5..7 is 8 (v^4 jumps to 12..14).  Mirror
    // that exactly or traces diverge from the golden twin.
    if (stride > 1) {
        int32_t v = 4 + (stride - 1 < 7 ? stride - 1 : 7);
        int32_t x = v ^ 4;
        c.stride = x < 7 ? x + 1 : 8;
        c.mv_value = v;
    }
    c.seg = seg_offsets;
    c.out = out;
    c.cap = out_cap;
    c.lut0 = lut0;
    c.lut1 = lut1;
    c.use_cm = use_cm != 0;
    c.combine = (mixing & 3) != 0;
    c.nctx = nctx;
    for (int i = 0; i < 4; ++i)
        c.adapt[i] = Speed{adapt_speeds[2 * i], adapt_speeds[2 * i + 1]};

    auto cmd_type = [&](int32_t nib) {
        rec(c, c.seg[SEG_CC] + (c.l4s >> 4), nib, 0, ROCKET);
    };

    // PredictionMode command
    cmd_type(0x7);
    code_prediction_mode(c, (mixing > 7 ? 7 : mixing) & 3, prior_depth);

    int32_t pos = 0;
    auto emit_literal = [&](int32_t lo, int32_t hi) {
        if (hi <= lo) return;
        cmd_type(0x3);
        c.l4s = ((c.l4s >> 2) | 128) & 0xFF;
        // NOTE: obs_literal_state happens before coding in the golden
        // engine's _run_one_command; mirror that ordering
        code_literal(c, raw, lo, hi - lo);
    };
    for (int32_t m = 0; m < n_matches; ++m) {
        emit_literal(pos, matches[m].pos);
        cmd_type(0x1);
        c.l4s = ((c.l4s >> 2) | 64) & 0xFF;
        code_copy(c, matches[m].dist, matches[m].len);
        pos = matches[m].pos + matches[m].len;
    }
    emit_literal(pos, raw_len);
    cmd_type(0xF);  // END
    return c.overflow ? -1 : c.nsteps;
}

// ------------------------------------------- trace from a command array
// The q11 / IR-optimizer front-end assembles commands in Python (DP with
// dict edges, measured merges); this entry codes an explicit command
// array — including Dict commands — so high-quality encodes stay on the
// native back-end end-to-end (engine_np.code_dict is the Python twin,
// codec/dict.rs:77-170 the reference).

static const int32_t DICT_BITS_TB[25] = {0, 0, 0, 0, 10, 10, 11, 11, 10, 10,
                                         10, 10, 10, 9, 9, 8, 7, 7, 8, 7,
                                         7, 6, 6, 5, 5};

static void code_dict_cmd(TraceCtx& c, int32_t ws, int32_t wid, int32_t tid) {
    const int32_t* seg = c.seg;
    int32_t ws_in = (ws - 4) < 15 ? (ws - 4) : 15;
    rec(c, seg[SEG_D_SBEG], ws_in, 0, MUD);
    if (ws_in == 15)
        rec(c, seg[SEG_D_SLAST], (ws - 19) & 0xF, 0, MUD);
    int32_t bits = DICT_BITS_TB[ws];
    // identity distance cmap: prior = min(max(ws,2)-2, 3)
    int32_t prior = (ws > 2 ? ws : 2) - 2;
    if (prior > 3) prior = 3;
    mantissa(c, seg[SEG_D_IDX] + prior * 5 + 0,
             seg[SEG_D_IDX] + prior * 5 + (bits % 4) + 1,
             wid, rum4(bits), 0, MUD, MUD);
    rec(c, seg[SEG_D_TR] + (ws >> 1), tid >> 4, 0, FAST);
    rec(c, seg[SEG_D_TR] + 16 + (tid >> 4), tid & 0xF, 0, FAST);
}

static void code_block_switch_lit(TraceCtx& c, int32_t value,
                                  int32_t stride_nib) {
    // BlockTypeState FSM, literal variant (engine_np.code_block_switch +
    // code_stride_nibble; reference src/codec/block_type.rs:18-195)
    const int32_t* seg = c.seg;
    int32_t mn;
    if (value == c.bt_lru1) mn = 0;
    else if (value == ((c.bt_max_seen + 1) & 0xFF)) mn = 1;
    else if (value <= 12) mn = value + 2;
    else mn = 15;
    rec(c, seg[SEG_BT_MN] + 0, mn, 0, SLOW);
    if (mn == 15) {
        rec(c, seg[SEG_BT_F] + 0, value & 0xF, 0, SLOW);
        rec(c, seg[SEG_BT_S] + 0, value >> 4, 0, SLOW);
    }
    rec(c, seg[SEG_BT_STRIDE], stride_nib, 0, SLOW);
    c.bt_lru1 = c.bt_lru0;
    c.bt_lru0 = value;
    if (value > c.bt_max_seen) c.bt_max_seen = value;
    c.btype_last = value;
    c.l4s >>= 2;   // _obs_btype shifts a 0 state tag in (model.py:81)
}

// cmd_rows: int32[n,5] = (type, a, b, c, d):
//   0 Literal (a = len) | 1 Copy (a = dist, b = len)
//   2 Dict (a = word_size, b = word_id, c = transform, d = final_size)
//   3 BlockSwitchLiteral (a = block_type, b = stride nibble)
// Returns n_steps, or -1 on overflow / malformed command.
int32_t dtpu_build_trace_cmds(
        const uint8_t* raw, int32_t raw_len,
        const int32_t* cmd_rows, int32_t n_cmds,
        int32_t use_cm, int32_t mixing, int32_t prior_depth,
        int32_t stride,
        const int32_t* adapt_speeds,
        const int32_t* seg_offsets, int32_t nctx, int32_t lo_shift,
        int32_t self_fed,
        const uint8_t* lut0, const uint8_t* lut1,
        const uint8_t* mask, int32_t nb,
        int32_t* out, int32_t out_cap) {
    TraceCtx c{};
    c.lo_shift = lo_shift;
    c.self_fed = self_fed;
    c.mask = mask;
    if (nb < 1) nb = 1;
    if (nb > 4) return -1;
    c.nb = nb;
    c.nctx_hi = 64 * nb;
    if (stride > 1) {
        int32_t v = 4 + (stride - 1 < 7 ? stride - 1 : 7);
        int32_t x = v ^ 4;
        c.stride = x < 7 ? x + 1 : 8;
        c.mv_value = v;
    }
    c.seg = seg_offsets;
    c.out = out;
    c.cap = out_cap;
    c.lut0 = lut0;
    c.lut1 = lut1;
    c.use_cm = use_cm != 0;
    c.combine = (mixing & 3) != 0;
    c.nctx = nctx;
    for (int i = 0; i < 4; ++i)
        c.adapt[i] = Speed{adapt_speeds[2 * i], adapt_speeds[2 * i + 1]};

    auto cmd_type = [&](int32_t nib) {
        rec(c, c.seg[SEG_CC] + (c.l4s >> 4), nib, 0, ROCKET);
    };
    cmd_type(0x7);
    code_prediction_mode(c, (mixing > 7 ? 7 : mixing) & 3, prior_depth);

    int32_t pos = 0;
    for (int32_t i = 0; i < n_cmds; ++i) {
        const int32_t* r = cmd_rows + (int64_t)i * 5;
        if (r[0] == 0) {                     // literal
            int32_t len = r[1];
            if (len <= 0 || pos + len > raw_len) return -1;
            cmd_type(0x3);
            c.l4s = ((c.l4s >> 2) | 128) & 0xFF;
            code_literal(c, raw, pos, len);
            pos += len;
        } else if (r[0] == 1) {              // copy
            cmd_type(0x1);
            c.l4s = ((c.l4s >> 2) | 64) & 0xFF;
            code_copy(c, r[1], r[2]);
            pos += r[2];
        } else if (r[0] == 3) {              // literal block switch
            if (r[1] < 0 || r[1] >= nb) return -1;
            cmd_type(0x4);
            code_block_switch_lit(c, r[1], r[2]);
        } else if (r[0] == 2) {              // dict word
            int32_t ws = r[1];
            if (ws < 4 || ws > 24 || pos + r[4] > raw_len) return -1;
            cmd_type(0x2);
            c.l4s = ((c.l4s >> 2) | 192) & 0xFF;
            code_dict_cmd(c, ws, r[2], r[3]);
            pos += r[4];                      // transformed word length
        } else {
            return -1;
        }
        if (pos > raw_len) return -1;
    }
    if (pos != raw_len) return -1;
    cmd_type(0xF);  // END
    return c.overflow ? -1 : c.nsteps;
}

}  // extern "C"
