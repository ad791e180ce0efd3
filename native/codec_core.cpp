// Native serial codec core: trace -> rANS streams (encode back-end) and
// the full serial metablock decoder.
//
// This is the host-native twin of the device path: the same rans32 wire
// format (divans_tpu/ans/coder_np.py), the same int32 CDF/mixer rules
// (probability/cdf16.py, weights.py), and the same FSM semantics as the
// golden engine (codec/engine_np.py).  Scope mirrors the device scan's
// profiles (PM + literal/copy/dict + high-entropy escape; identity-bounded
// context maps); block switches return an error and the caller falls
// back to the Python golden engine.
//
// Exactness notes (all match the Python definitions):
//   - blend: i16 wraparound, renorm (c+bias) - ((c+bias)>>2)
//   - average: shift by max(bitlen(amax*bmax)-15, 0), +1 >> 15, i16 wrap
//   - mixer: int32 with the (error*(n1i-p1)) >> (log_geo-15) fold and
//     the [1, 2^30-1] clamp; norm_weight via the 8-bit reciprocal
//   - rans32: state in [2^15, 2^31), one conditional 16-bit pull

#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

constexpr int32_t LOG2_SCALE = 15;
constexpr int32_t SCALE_MASK = (1 << LOG2_SCALE) - 1;
constexpr int32_t STATE_LOW = 1 << 15;
constexpr int32_t ENC_START = 1 << 15;
constexpr int32_t WEIGHT_MAX = (1 << 30) - 1;

inline int32_t wrap_i16(int32_t x) {
    return ((x + 0x8000) & 0xFFFF) - 0x8000;
}
inline int32_t bitlen(uint32_t v) { return v ? 32 - __builtin_clz(v) : 0; }

struct Cdf {
    int32_t c[16];
};

const Cdf CDF_INIT = {{4, 8, 12, 16, 20, 24, 28, 32, 36, 40, 44, 48, 52, 56,
                       60, 64}};

inline void blend(Cdf& cdf, int32_t sym, int32_t inc, int32_t lim) {
    for (int i = sym; i < 16; ++i) cdf.c[i] = wrap_i16(cdf.c[i] + inc);
    if (cdf.c[15] >= lim) {
        for (int i = 0; i < 16; ++i) {
            int32_t cb = wrap_i16(cdf.c[i] + i + 1);
            cdf.c[i] = wrap_i16(cb - (cb >> 2));
        }
    }
}

// Reciprocal table: RECIP45[d] = ceil(2^45/d) for d in [1, 32767] —
// div_by_recip below is exact over the codec's whole domain, replacing
// two idiv instructions per range extraction (~26 cycles each; the
// literal hot loop extracts 3 ranges per nibble).  This is the host
// analog of the reference's div_lut (src/probability/numeric.rs) — on
// TPU the XLA int32 divide is native, on x86 the LUT wins.
static uint64_t RECIP45[32768];
static const bool RECIP45_INIT = [] {
    RECIP45[0] = 0;
    for (uint64_t d = 1; d < 32768; ++d)
        RECIP45[d] = ((1ULL << 45) + d - 1) / d;
    return true;
}();

inline void sym_to_start_freq(const Cdf& cdf, int32_t sym, int32_t* start,
                              int32_t* freq) {
    int32_t maxv = cdf.c[15];
    // LUT path only on the sane domain (nonnegative numerators, 15-bit
    // max); corrupt-stream junk falls back to the trunc-division the
    // golden engine computes, keeping cross-engine fuzz bit-equal
    if ((uint32_t)maxv - 1 < 32767u && cdf.c[sym] >= 0
        && (sym == 0 || cdf.c[sym - 1] >= 0)) {
        uint64_t M = RECIP45[maxv];
        int32_t r_sym =
            (int32_t)((unsigned __int128)(uint32_t)(cdf.c[sym] << LOG2_SCALE)
                      * M >> 45);
        int32_t r_prev = sym > 0
            ? (int32_t)((unsigned __int128)(uint32_t)(cdf.c[sym - 1]
                                                      << LOG2_SCALE)
                        * M >> 45)
            : 0;
        *start = r_prev + 1;
        *freq = r_sym - r_prev - 1;
        return;
    }
    int32_t r_sym = (cdf.c[sym] << LOG2_SCALE) / maxv;
    int32_t r_prev = sym > 0 ? (cdf.c[sym - 1] << LOG2_SCALE) / maxv : 0;
    *start = r_prev + 1;
    *freq = r_sym - r_prev - 1;
}

// floor(x / d) for x < 2^30, d < 2^15, via M = ceil(2^45/d): the error
// term e = M*d - 2^45 is in [0, d), so floor(x*M >> 45) = floor(x/d) +
// floor(frac(x/d) + x*e/(d*2^45)) and x*e < 2^30 * 2^15 = 2^45 makes the
// correction term < 1/d + (d-1)/d = 1.  Exact over the whole domain.
static inline int32_t div_by_recip(int32_t x, uint64_t M) {
    return (int32_t)((unsigned __int128)(uint32_t)x * M >> 45);
}

static inline void sym_to_start_freq_r(const Cdf& cdf, uint64_t M,
                                       int32_t sym, int32_t* start,
                                       int32_t* freq) {
    int32_t r_sym = div_by_recip(cdf.c[sym] << LOG2_SCALE, M);
    int32_t r_prev = sym > 0 ? div_by_recip(cdf.c[sym - 1] << LOG2_SCALE, M)
                             : 0;
    *start = r_prev + 1;
    *freq = r_sym - r_prev - 1;
}

inline int32_t offset_to_sym(const Cdf& cdf, int32_t off) {
    int32_t rescaled = (off * cdf.c[15]) >> LOG2_SCALE;
    // branchless 15-way compare (vectorizes; cdf is monotone so the sum
    // of compares equals the first-miss index)
    int32_t sym = 0;
    for (int i = 0; i < 15; ++i) sym += rescaled >= cdf.c[i];
    return sym;
}

inline Cdf average(const Cdf& a, const Cdf& b, int32_t mix_rate) {
    int32_t amax = a.c[15], bmax = b.c[15];
    int32_t shift = bitlen((uint32_t)(amax * bmax)) - 15;
    if (shift < 0) shift = 0;
    int32_t inv = (1 << 15) - mix_rate;
    Cdf out;
    for (int i = 0; i < 16; ++i) {
        int32_t ra = (a.c[i] * bmax) >> shift;
        int32_t rb = (b.c[i] * amax) >> shift;
        // the sum can graze +/-2^31; wrap exactly like numpy int32
        int64_t s = (int64_t)ra * mix_rate + (int64_t)rb * inv + 1;
        int32_t s32 = (int32_t)(uint32_t)(s & 0xFFFFFFFF);
        out.c[i] = wrap_i16(s32 >> 15);
    }
    return out;
}

struct Weights {
    int32_t w0 = 1, w1 = 1, norm = 1 << 14;
};

inline int32_t norm_weight(int32_t w0, int32_t w1) {
    int32_t total = w0 + w1;
    int32_t sh = bitlen((uint32_t)total) - 8;
    if (sh < 0) sh = 0;
    int32_t total8 = total >> sh;
    int32_t inv = 1 + (1 << 24) / total8;
    int32_t num = (w0 >> sh) << 8;
    int32_t hi = (inv >> 12) * num;
    int32_t lo = (inv & 0xFFF) * num;
    int32_t q = (hi + (lo >> 12)) >> 12;
    int32_t q16 = ((q + 0x8000) & 0xFFFF) - 0x8000;
    int32_t res = q16 << 7;
    return ((res + 0x8000) & 0xFFFF) - 0x8000;
}

inline void weights_update(Weights& w, int32_t p_cm, int32_t p_nib,
                           int32_t weighted) {
    int32_t w0 = w.w0, w1 = w.w1;
    if ((w0 | w1) & 0x7F000000) {
        int32_t ilog = bitlen((uint32_t)w0);
        int32_t il1 = bitlen((uint32_t)w1);
        if (il1 > ilog) ilog = il1;
        if (ilog >= 24) { w0 >>= ilog - 24; w1 >>= ilog - 24; }
    }
    int32_t total = 1 << 15;
    int32_t p1 = weighted, p0 = total - p1, error = total - p1;
    int32_t log_geo = bitlen((uint32_t)(p1 * p0));
    int32_t probs[2] = {p_cm, p_nib};
    int32_t ws[2] = {w0, w1};
    for (int i = 0; i < 2; ++i) {
        int32_t adj = (error * (probs[i] - p1)) >> (log_geo - 15);
        int32_t s = ws[i] + adj;
        if (s < 1) s = 1;
        if (s > WEIGHT_MAX) s = WEIGHT_MAX;
        ws[i] = s;
    }
    w.w0 = ws[0];
    w.w1 = ws[1];
    w.norm = norm_weight(ws[0], ws[1]);
}

// ----------------------------------------------- deferred adaptation
// The chunk-deferred profile (divans_tpu/codec/deferred.py): coding reads
// a committed snapshot; per-chunk updates apply in batch with the
// normative histogram + capped-renorm CDF rule and the clamped
// summed-adjustment mixer rule, one chunk behind (commit lag 1).

inline void weight_adjustments(int32_t p_cm, int32_t p_nib, int32_t weighted,
                               int32_t* a0, int32_t* a1) {
    constexpr int32_t ADJ_CLAMP = 1 << 21;
    int32_t p1 = weighted, error = (1 << 15) - p1;
    int32_t log_geo = bitlen((uint32_t)(p1 * error));
    int32_t sh = log_geo - 15;
    if (sh < 0) sh = 0;
    int32_t out[2];
    const int32_t n1[2] = {p_cm, p_nib};
    for (int i = 0; i < 2; ++i) {
        int32_t adj = (int32_t)(((int64_t)error * (n1[i] - p1)) >> sh);
        if (adj > ADJ_CLAMP) adj = ADJ_CLAMP;
        if (adj < -ADJ_CLAMP) adj = -ADJ_CLAMP;
        out[i] = adj;
    }
    *a0 = out[0];
    *a1 = out[1];
}

// per-stream ticking (deferred-v2): the cmd stream's chunk for lit chunk S
static inline int32_t cmd_chunk(int32_t chunk) {
    return chunk >> 2 > 16 ? chunk >> 2 : 16;
}

// deferred-v3 format constant: literal bytes per lit sub-stream
// (normative twin of codec/deferred.py SUB_LIT)
static constexpr int64_t SUB_LIT = 1 << 15;

struct DeferredState {
    static constexpr int32_t MAX_RENORM = 24;
    int32_t chunk = 0;               // 0 = per-nibble adaptive mode
    int32_t rem = 0;                 // countdown to the chunk boundary
    std::vector<Cdf>* committed = nullptr;
    std::vector<uint64_t>* recip = nullptr;  // per-row ceil(2^45/max) cache
    Weights cw[2];

    // Flat double-buffered per-row accumulators (commit lag 1: at most
    // two chunks in flight — the one being recorded and the queued one).
    // A touched-row list keeps clear/apply proportional to rows actually
    // hit, with zero per-chunk allocation (the unordered_map this
    // replaces dominated the deferred decode profile).
    struct Upd {
        int32_t add[16];
        int32_t limsum, cnt;
        uint8_t touched;
    };
    struct Buf {
        std::vector<Upd> rows;
        std::vector<int32_t> touched;
        uint32_t wadj[2][2];
    };
    Buf bufs[2];
    int cur = 0;
    int queued = 0;

    void init_rows(int32_t nrows) {
        rem = chunk;
        for (Buf& b : bufs) {
            b.rows.assign((size_t)nrows, Upd{});
            b.touched.clear();
            b.touched.reserve(256);
            memset(b.wadj, 0, sizeof b.wadj);
        }
    }
    void record_blend(int32_t flat, int32_t sym, int32_t inc, int32_t lim) {
        if (!inc) return;
        Buf& b = bufs[cur];
        Upd& u = b.rows[flat];
        if (!u.touched) {
            u.touched = 1;
            b.touched.push_back(flat);
        }
        for (int i = sym; i < 16; ++i) u.add[i] += inc;
        u.limsum += lim;
        u.cnt += 1;
    }
    void record_wadj(int which, int32_t a0, int32_t a1) {
        bufs[cur].wadj[which][0] += (uint32_t)a0;  // mod-2^32 accumulation
        bufs[cur].wadj[which][1] += (uint32_t)a1;
    }
    void tick() {
        if (--rem > 0) return;
        rem = chunk;
        if (queued) {
            apply(bufs[1 - cur]);
            clear(bufs[1 - cur]);
        }
        queued = 1;
        cur = 1 - cur;  // record the next chunk into the cleared buffer
    }
    void clear(Buf& b) {
        for (int32_t flat : b.touched) b.rows[flat] = Upd{};
        b.touched.clear();
        memset(b.wadj, 0, sizeof b.wadj);
    }
    // deferred-v3 lit sub-stream switch: drop all in-flight updates and
    // re-init the mixer weights/chunk clock (the committed-row resets
    // are the caller's job — it knows the lit row range)
    void reset() {
        clear(bufs[0]);
        clear(bufs[1]);
        cur = 0;
        queued = 0;
        rem = chunk;
        cw[0] = Weights{};
        cw[1] = Weights{};
    }
    void apply(const Buf& u) {
        for (int32_t flat : u.touched) {
            Cdf& row = (*committed)[flat];
            const Upd& up = u.rows[flat];
            int32_t r[16];
            for (int i = 0; i < 16; ++i) r[i] = row.c[i] + up.add[i];
            int32_t lim = up.limsum / up.cnt;
            for (int pass = 0; pass < MAX_RENORM && r[15] >= lim; ++pass)
                for (int i = 0; i < 16; ++i) {
                    int32_t cb = r[i] + i + 1;
                    r[i] = cb - (cb >> 2);
                }
            for (int i = 0; i < 16; ++i) row.c[i] = r[i];
            if (recip)
                (*recip)[flat] = ((1ULL << 45) + row.c[15] - 1)
                    / (uint64_t)row.c[15];
        }
        for (int which = 0; which < 2; ++which) {
            Weights& w = cw[which];
            int32_t w0 = (int32_t)((uint32_t)w.w0 + u.wadj[which][0]);
            int32_t w1 = (int32_t)((uint32_t)w.w1 + u.wadj[which][1]);
            if (w0 < 1) w0 = 1;
            if (w0 > WEIGHT_MAX) w0 = WEIGHT_MAX;
            if (w1 < 1) w1 = 1;
            if (w1 > WEIGHT_MAX) w1 = WEIGHT_MAX;
            if ((w0 | w1) & 0x7F000000) {
                int32_t il = bitlen((uint32_t)w0), il1 = bitlen((uint32_t)w1);
                if (il1 > il) il = il1;
                if (il >= 24) { w0 >>= il - 24; w1 >>= il - 24; }
            }
            w.w0 = w0;
            w.w1 = w1;
            w.norm = norm_weight(w0, w1);
        }
    }
};

// ------------------------------------------------------------------ rANS

struct AnsEnc {
    std::vector<std::pair<int32_t, int32_t>> pairs;  // chronological
    void put(int32_t start, int32_t freq) { pairs.emplace_back(start, freq); }
    // returns wire bytes
    std::vector<uint8_t> flush() {
        if (pairs.empty()) return {};
        uint32_t state = ENC_START;
        std::vector<uint16_t> words;
        for (auto it = pairs.rbegin(); it != pairs.rend(); ++it) {
            int32_t start = it->first, freq = it->second;
            if (state >= (uint32_t)(freq << 16)) {
                words.push_back((uint16_t)(state & 0xFFFF));
                state >>= 16;
            }
            state = ((state / freq) << LOG2_SCALE) + (state % freq) + start;
        }
        std::vector<uint8_t> out(4);
        memcpy(out.data(), &state, 4);  // little-endian host assumed (x86)
        for (auto it = words.rbegin(); it != words.rend(); ++it) {
            out.push_back((uint8_t)(*it & 0xFF));
            out.push_back((uint8_t)(*it >> 8));
        }
        return out;
    }
};

struct AnsDec {
    const uint8_t* data;
    int32_t len, pos = 0;
    uint32_t state = 0;
    void init(const uint8_t* d, int32_t n) {
        data = d;
        len = n;
        if (n >= 4) { memcpy(&state, d, 4); pos = 4; }
    }
    int32_t peek() {
        if (state < (uint32_t)STATE_LOW) {
            uint16_t w = 0;
            if (pos + 2 <= len) memcpy(&w, data + pos, 2);
            state = (state << 16) | w;
            pos += 2;
        }
        return (int32_t)(state & SCALE_MASK);
    }
    void advance(int32_t start, int32_t freq) {
        state = (uint32_t)freq * (state >> LOG2_SCALE)
            + (state & SCALE_MASK) - start;
    }
};

}  // namespace

extern "C" {

// ------------------------------------------------- encode back-end (trace)

// trace: int32[n,10]; returns 0 on success. Stream bytes are written to
// out_cmd/out_lit with lengths in *cmd_len/*lit_len (capacities in).
// sel: bit0 = code the cmd stream, bit1 = code the lit stream.  The two
// streams touch disjoint model row sets (the layout separates cmd rows
// from lit/cm rows) and the mixer weights are lit-only, so skipping one
// stream's steps leaves the other's bytes bit-identical — this is what
// lets the host encode the cmd stream while the device encodes the
// literals (the encode mirror of the 2-stage decode split, reference
// src/parallel_decompressor.rs:99-133).
int32_t dtpu_encode_streams_sel(const int32_t* trace, int32_t n,
                                int32_t num_rows, int32_t chunk,
                                int32_t lit_base, int32_t sel,
                                uint8_t* out_cmd, int32_t* cmd_len,
                                uint8_t* out_lit, int32_t* lit_len) {
    std::vector<Cdf> model((size_t)num_rows, CDF_INIT);
    Weights weights[2];
    AnsEnc enc[2];
    // deferred-v2 per-stream ticking: each stream has its own chunk
    // clock (cmd = chunk/4); model row sets are disjoint by layout, and
    // the mixer weights belong to the lit stream (mix is lit-only).
    DeferredState dss[2];
    dss[0].chunk = chunk ? cmd_chunk(chunk) : 0;
    dss[1].chunk = chunk;
    dss[0].committed = dss[1].committed = &model;
    if (chunk) {
        dss[0].init_rows(num_rows);
        dss[1].init_rows(num_rows);
    }
    // deferred-v3 lit sub-streams: a lit trace row pair = one literal
    // byte, so the sub boundary falls every 2*SUB_LIT coded lit rows
    std::vector<std::vector<uint8_t>> lit_done;
    int64_t lit_rows = 0;
    for (int32_t t = 0; t < n; ++t) {
        const int32_t* r = trace + (int64_t)t * 10;
        int32_t flat = r[0], value = r[1], stream = r[2], inc = r[3],
                lim = r[4], mix = r[5], which = r[6], cm_idx = r[7],
                cm_inc = r[8], cm_lim = r[9];
        if (!((sel >> (stream == 1 ? 1 : 0)) & 1)) continue;
        if (chunk && stream == 1) {
            if (lit_rows && (lit_rows % (2 * SUB_LIT)) == 0) {
                lit_done.push_back(enc[1].flush());
                enc[1] = AnsEnc{};
                for (int32_t rr = lit_base; rr < num_rows; ++rr)
                    model[rr] = CDF_INIT;
                dss[1].reset();
            }
            ++lit_rows;
        }
        DeferredState& ds = dss[stream == 1 ? 1 : 0];
        Cdf& rows = model[flat];
        int32_t start, freq;
        Weights& w = chunk ? dss[1].cw[which] : weights[which];
        if (mix) {
            Cdf& cm = model[cm_idx];
            Cdf mixed = average(cm, rows, w.norm & 0xFFFF);
            sym_to_start_freq(mixed, value, &start, &freq);
            int32_t s_cm, p_cm, s_nib, p_nib;
            sym_to_start_freq(cm, value, &s_cm, &p_cm);
            sym_to_start_freq(rows, value, &s_nib, &p_nib);
            if (chunk) {
                int32_t a0, a1;
                weight_adjustments(p_cm, p_nib, freq, &a0, &a1);
                ds.record_wadj(which, a0, a1);
                ds.record_blend(cm_idx, value, cm_inc, cm_lim);
            } else {
                weights_update(weights[which], p_cm, p_nib, freq);
                blend(cm, value, cm_inc, cm_lim);
            }
        } else {
            sym_to_start_freq(rows, value, &start, &freq);
        }
        enc[stream].put(start, freq);
        if (chunk) {
            ds.record_blend(flat, value, inc, lim);
            ds.tick();
        } else if (inc) {
            blend(rows, value, inc, lim);
        }
    }
    auto cb = enc[0].flush();
    std::vector<uint8_t> lb;
    if (chunk && (sel & 2)) {
        // assemble the deferred-v3 lit field: varint(n_subs) ++ varint
        // lengths (all but the last) ++ payloads (deferred.lit_subs_join)
        lit_done.push_back(enc[1].flush());
        auto put_varint = [&lb](uint64_t v) {
            while (v >= 0x80) { lb.push_back((uint8_t)(v | 0x80)); v >>= 7; }
            lb.push_back((uint8_t)v);
        };
        put_varint(lit_done.size());
        for (size_t i = 0; i + 1 < lit_done.size(); ++i)
            put_varint(lit_done[i].size());
        for (auto& s : lit_done)
            lb.insert(lb.end(), s.begin(), s.end());
    } else {
        lb = enc[1].flush();
    }
    if ((int32_t)cb.size() > *cmd_len || (int32_t)lb.size() > *lit_len)
        return -1;
    memcpy(out_cmd, cb.data(), cb.size());
    memcpy(out_lit, lb.data(), lb.size());
    *cmd_len = (int32_t)cb.size();
    *lit_len = (int32_t)lb.size();
    return 0;
}

int32_t dtpu_encode_streams(const int32_t* trace, int32_t n,
                            int32_t num_rows, int32_t chunk,
                            int32_t lit_base,
                            uint8_t* out_cmd, int32_t* cmd_len,
                            uint8_t* out_lit, int32_t* lit_len) {
    return dtpu_encode_streams_sel(trace, n, num_rows, chunk, lit_base, 3,
                                   out_cmd, cmd_len, out_lit, lit_len);
}

// Pack a trace's LIT-stream rows into the lit-kernel's per-byte plane
// (ctx | hi<<6 | lo<<10 | act<<14 | mix<<15 — the C++ twin of
// pallas_lit_pass.pack_lit_row, run GIL-free so the hybrid encode's
// host threads stay on C++).  Rebases lit rows by lit_base like
// jax_engine._rebase_lit and applies the same cm-envelope checks.
// Returns the LIT ROW COUNT (2x the packed words) on success, -1 when
// the trace leaves the packed-byte envelope, -2 on overflow.
// out_spd[6] = the per-lane adaptation speeds the kernel needs.
int32_t dtpu_pack_lit(const int32_t* trace, int32_t n, int32_t lit_base,
                      uint16_t* out_row, int32_t cap, int32_t* out_spd) {
    int32_t nw = 0;          // packed words (lit bytes)
    int32_t phase = 0;       // 0 = expecting hi row, 1 = expecting lo
    int32_t hi_f = 0, hi_v = 0, act_h = 0, mix_h = 0, cm_h = 0, ctx = 0;
    bool first = true;
    for (int64_t t = 0; t < n; ++t) {
        const int32_t* r = trace + t * 10;
        if (r[2] != 1) continue;
        int32_t flat = r[0] == 0 ? 0 : r[0] - (lit_base - 1);
        int32_t cm = r[7] == 0 ? 0 : r[7] - (lit_base - 1);
        int32_t act = (r[3] != 0 || r[5] != 0) ? 1 : 0;
        if (phase == 0) {
            hi_f = flat; hi_v = r[1]; act_h = act; mix_h = r[5];
            cm_h = cm;
            if (first) {
                if (r[3] == 0) return -1;    // dead first step
                out_spd[0] = r[3]; out_spd[1] = r[4];
                out_spd[4] = r[8]; out_spd[5] = r[9];
                first = false;
            }
            phase = 1;
            continue;
        }
        phase = 0;
        // lo row of the byte: validate the pair against the cm envelope
        if (act_h != act || mix_h != r[5]) return -1;
        ctx = act_h ? hi_f - 1 : 0;
        if (ctx < 0 || ctx >= 64) return -1;
        int32_t idx_expect = 65 + (ctx >> 3) * 16 + hi_v;
        if (act && flat != idx_expect) return -1;
        if (mix_h && cm_h != 193 + ctx) return -1;
        if (r[5] && cm != 257 + hi_v * 8 + (ctx >> 3)) return -1;
        if (nw == 0) { out_spd[2] = r[8]; out_spd[3] = r[9]; }
        if (nw >= cap) return -2;
        out_row[nw++] = (uint16_t)(ctx | (hi_v << 6) | (r[1] << 10)
                                   | (act_h << 14) | (mix_h << 15));
    }
    if (phase != 0) return -1;               // odd lit row count
    return nw * 2;
}

// --------------------------------------------------------- serial decoder

// LEB128 (container/format.py read_varint); returns false on overrun
static inline bool read_varint_u(const uint8_t* d, int32_t n, int32_t* pos,
                                 int64_t* out) {
    int64_t v = 0;
    for (int sh = 0; sh < 64; sh += 7) {
        if (*pos >= n) return false;
        uint8_t b = d[(*pos)++];
        v |= (int64_t)(b & 0x7F) << sh;
        if (!(b & 0x80)) { *out = v; return true; }
    }
    return false;
}

struct DecCtx {
    std::vector<Cdf> model;
    Weights weights[2];
    AnsDec cmd, lit;
    const int32_t* seg;
    const uint8_t* lut0;
    const uint8_t* lut1;
    int32_t nctx;
    int32_t lo_shift = 0;      // deferred layouts bucket lo ctx 64 -> 8
    bool use_cm;
    bool combine = false;
    int32_t adapt[4][2] = {{0x10, 0x2000}, {0x10, 0x2000},
                           {0x10, 0x2000}, {0x10, 0x2000}};
    // bookkeeping
    int32_t l4s = 3 << 4;
    int32_t dlru[4] = {4, 11, 15, 16};
    int32_t last_llen = 1, last_clen = 1, last_dlen = 1;
    uint8_t* out;
    int32_t raw_len, wpos = 0;
    bool err = false;
    // structure-only mode (the 2-stage device decode's host cmd pass,
    // mirroring the reference's cmd-decode thread,
    // src/parallel_decompressor.rs:99-133): literal content is skipped
    // (deferred-v2 per-stream clocks make the cmd FSM independent of
    // literal values) and the command script is recorded instead.
    bool structure = false;
    int32_t* ops = nullptr;            // [cap][3]: see dtpu header comment
    int32_t ops_cap = 0, n_ops = 0;
    uint8_t* pool = nullptr;           // transformed dict word bytes
    int32_t pool_cap = 0, pool_len = 0;
    int64_t lit_total = 0;
    int32_t pm_count = 0;

    bool overflow = false;

    bool push_op(int32_t ty, int32_t a, int32_t b) {
        if (n_ops >= ops_cap) { err = true; overflow = true; return false; }
        int32_t* r = ops + (int64_t)n_ops * 3;
        r[0] = ty; r[1] = a; r[2] = b;
        ++n_ops;
        return true;
    }
    // deferred-v2: per-stream chunk clocks (ds = cmd, ds_lit = lit;
    // mixer weights live on the lit clock) and self-fed literal history
    DeferredState ds;      // ds.chunk > 0 = deferred profile
    DeferredState ds_lit;
    std::vector<uint64_t> recip;  // per-committed-row division cache
    uint64_t l8 = 0;       // last 8 literal bytes, newest in the top 8
    // deferred-v3 lit sub-streams: spans into the frame's lit field,
    // switched every SUB_LIT literal bytes with a full lit-side reset
    std::vector<std::pair<const uint8_t*, int32_t>> lit_subs;
    size_t lit_sub_next = 0;
    int64_t lit_seen = 0;
    int32_t lit_row_base = 0;   // first lit-stream model row (seg lit_hi)
    int32_t n_rows = 0;

    void switch_lit_sub() {
        if (lit_sub_next >= lit_subs.size()) { err = true; return; }
        lit.init(lit_subs[lit_sub_next].first,
                 lit_subs[lit_sub_next].second);
        ++lit_sub_next;
        for (int32_t r = lit_row_base; r < n_rows; ++r) {
            model[r] = CDF_INIT;
            if (!recip.empty())
                recip[r] = ((1ULL << 45) + CDF_INIT.c[15] - 1)
                    / (uint64_t)CDF_INIT.c[15];
        }
        ds_lit.reset();
        l8 = 0;
    }
    int32_t stride = 1;    // constant mask 4+s-1 (mv_mode 1/3), cm off
    bool masked = false;   // mix profile: per-context masks with cm on
    std::vector<uint8_t> mask;  // 8192 entries when masked streams seen
    int32_t nb = 1;        // literal block types (from the decoded lcm)
    int32_t nctx_hi = 64;  // lit_hi / lit_hi_s minor dim (64 * nb)
    int32_t nb_cap = 1;    // layout capacity: (nctx << lo_shift) / 64
    int32_t btype_last = 0;
    // decoded literal context map (identity unless the PM carries a
    // clustered/foreign map — engine_np actual_context = lcm[sel +
    // btype*64]); values are bounded < 64*nb at PM decode
    uint8_t lcm_tab[256];
    DecCtx() { for (int i = 0; i < 256; ++i) lcm_tab[i] = (uint8_t)i; }
    int32_t bt_lru0 = 0, bt_lru1 = 1;
    int32_t bt_max_seen = 0;

    // effective mask value per literal nibble (engine_np mm_opts)
    inline int32_t mask_at(int32_t idx) const {
        return mask.empty() ? 0 : mask[idx];
    }

    void init_recip(int32_t num_rows) {
        recip.assign((size_t)num_rows,
                     ((1ULL << 45) + CDF_INIT.c[15] - 1)
                         / (uint64_t)CDF_INIT.c[15]);
        ds.recip = &recip;
        ds_lit.recip = &recip;
    }

    int32_t nib(int32_t flat, int32_t inc, int32_t lim, AnsDec& ans) {
        Cdf& row = model[flat];  // committed snapshot in deferred mode
        int32_t off = ans.peek();
        int32_t sym = offset_to_sym(row, off);
        int32_t start, freq;
        DeferredState& d = (&ans == &lit) ? ds_lit : ds;
        if (d.chunk) {
            // rows are frozen within a chunk: cached-reciprocal division
            sym_to_start_freq_r(row, recip[flat], sym, &start, &freq);
            ans.advance(start, freq);
            d.record_blend(flat, sym, inc, lim);
            d.tick();
        } else {
            sym_to_start_freq(row, sym, &start, &freq);
            ans.advance(start, freq);
            if (inc) blend(row, sym, inc, lim);
        }
        return sym;
    }
};

// enum order shared with trace_builder.cpp / native.py
enum Seg {
    SEG_CC, SEG_LL_CS, SEG_LL_BEG, SEG_LL_LAST, SEG_LL_MANT,
    SEG_C_CCS, SEG_C_CBEG, SEG_C_CLAST, SEG_C_CMANT,
    SEG_C_DMN, SEG_C_DBEG, SEG_C_DLAST, SEG_C_DMANT,
    SEG_BT_STRIDE,
    SEG_PM_ONLY, SEG_PM_DCM, SEG_PM_PD, SEG_PM_PALETTE, SEG_PM_MVMODE,
    SEG_PM_CMN, SEG_PM_CF, SEG_PM_CS,
    SEG_LIT_HI, SEG_LIT_LO, SEG_CM_FIRST, SEG_CM_SECOND,
    SEG_D_SBEG, SEG_D_SLAST, SEG_D_IDX, SEG_D_TR,
    SEG_PM_MIX,
    SEG_LIT_HI_S, SEG_LIT_LO_S,
    SEG_BT_MN, SEG_BT_F, SEG_BT_S,
    SEG_COUNT
};

// ------------------------------------------------ RFC 7932 static dict
// Twin of divans_tpu/dictionary.py (word fetch + TransformDictionaryWord,
// RFC 7932 §8); the dict data/offsets/transforms come from the vendored
// blob via the caller.

static const int32_t DICT_BITS[25] = {0, 0, 0, 0, 10, 10, 11, 11, 10, 10,
                                      10, 10, 10, 9, 9, 8, 7, 7, 8, 7,
                                      7, 6, 6, 5, 5};

struct DictRef {
    const uint8_t* data = nullptr;
    int32_t data_size = 0;
    const uint32_t* offsets = nullptr;     // [32]
    const uint8_t* ps_pool = nullptr;      // prefix/suffix byte pool
    const int32_t* tr_meta = nullptr;      // [ntr][5]: poff,plen,type,soff,slen
    int32_t ntr = 0;
};

// uppercase one possibly-multibyte char at pos; returns its width
static int32_t ferment(uint8_t* buf, int32_t pos, int32_t len) {
    uint8_t ch = buf[pos];
    if (ch < 192) {
        if (ch >= 97 && ch <= 122) buf[pos] = ch ^ 32;
        return 1;
    }
    if (ch < 224) {
        if (pos + 1 < len) buf[pos + 1] ^= 32;
        return 2;
    }
    if (pos + 2 < len) buf[pos + 2] ^= 5;
    return 3;
}

// transformed word -> out (cap 64); returns length or -1 on error
static int32_t transform_word(const DictRef& d, int32_t ws, int32_t wid,
                              int32_t tid, uint8_t* out) {
    if (!d.data || tid >= d.ntr || ws < 4 || ws > 24) return -1;
    if (wid >= (1 << DICT_BITS[ws])) return -1;
    int64_t off = (int64_t)d.offsets[ws] + (int64_t)ws * wid;
    if (off + ws > d.data_size) return -1;
    const int32_t* m = d.tr_meta + (int64_t)tid * 5;
    int32_t plen = m[1], ttype = m[2], slen = m[4];
    uint8_t word[32];
    memcpy(word, d.data + off, ws);
    int32_t wlen = ws;
    if (ttype >= 1 && ttype <= 9) {            // OmitLast1..9
        wlen = ws - ttype > 0 ? ws - ttype : 0;
    } else if (ttype >= 12 && ttype <= 20) {   // OmitFirst1..9
        int32_t omit = ttype - 11 < ws ? ttype - 11 : ws;
        memmove(word, word + omit, ws - omit);
        wlen = ws - omit;
    } else if (ttype == 10) {                  // UppercaseFirst
        if (wlen) ferment(word, 0, wlen);
    } else if (ttype == 11) {                  // UppercaseAll
        for (int32_t i = 0; i < wlen;) i += ferment(word, i, wlen);
    }
    if (plen + wlen + slen > 64) return -1;
    memcpy(out, d.ps_pool + m[0], plen);
    memcpy(out + plen, word, wlen);
    memcpy(out + plen + wlen, d.ps_pool + m[3], slen);
    return plen + wlen + slen;
}

static const int32_t sMUD[2] = {0x10, 0x2000}, sSLOW[2] = {0x20, 0x1000},
    sMED[2] = {0x30, 0x4000}, sFAST[2] = {0x60, 0x4000},
    sROCKET[2] = {0x180, 0x4000};

static int32_t u8_to_speed(int32_t b) {
    if (b < 8) return 0;
    int32_t lv = (b >> 3) - 1;
    return (1 << lv) | (((b & 7) << lv) >> 3);
}

static int32_t rum4(int32_t v) { return ((v - 1) | 3) + 1; }

static int32_t mantissa_dec(DecCtx& c, int32_t seg_rest, int32_t seg_first,
                            int32_t len_rem, int32_t seed,
                            const int32_t* sp_rest, const int32_t* sp_first) {
    int32_t decoded = seed;
    int i = 0;
    while (len_rem > 0) {
        int32_t next_rem = len_rem - 4;
        const int32_t* sp = i == 0 ? sp_first : sp_rest;
        int32_t v = c.nib(i == 0 ? seg_first : seg_rest, sp[0], sp[1], c.cmd);
        decoded |= v << next_rem;
        len_rem = next_rem;
        ++i;
    }
    return decoded;
}

static void decode_literal_content(DecCtx& c, int32_t nbytes) {
    const int32_t* seg = c.seg;
    for (int32_t k = 0; k < nbytes; ++k) {
        if (c.wpos >= c.raw_len) { c.err = true; return; }
        if (c.ds_lit.chunk) {   // deferred-v3 lit sub-streams
            if (c.lit_seen && (c.lit_seen % SUB_LIT) == 0) {
                c.switch_lit_sub();
                if (c.err) return;
            }
            ++c.lit_seen;
        }
        // deferred-v2 streams feed literal history from the literal
        // stream itself; adaptive streams use the window (reference)
        bool self_fed = c.ds.chunk != 0;
        int32_t prev = self_fed ? (int32_t)((c.l8 >> 0x38) & 0xFF)
                                : (c.wpos >= 1 ? c.out[c.wpos - 1] : 0);
        int32_t prev2 = self_fed ? (int32_t)((c.l8 >> 0x30) & 0xFF)
                                 : (c.wpos >= 2 ? c.out[c.wpos - 2] : 0);
        int32_t ctx = c.use_cm
            ? c.lcm_tab[(c.lut0[prev] | c.lut1[prev2])
                        + (c.btype_last << 6)] : 0;
        int32_t hi_flat, lo_base;
        // deferred layouts bucket the lo-nibble ctx (engine_np.py)
        int32_t ctx_lo = c.use_cm ? (ctx >> c.lo_shift) : ctx;
        // the low nibble's mask lookup / stride row needs hi first; in
        // the masked branch lo_base is resolved after hi decodes
        bool lo_masked = false;
        if (c.use_cm) {
            int32_t mo_hi = c.mask_at(ctx | ((prev >> 4) << 8));
            if (mo_hi == 0) {
                hi_flat = seg[SEG_LIT_HI] + ctx;
            } else {   // stride prior keyed (sb, ctx), sel 1 (mix layout)
                int32_t x = mo_hi ^ 4;
                int32_t s = x < 7 ? x + 1 : 8;
                int32_t sb = self_fed
                    ? (int32_t)((c.l8 >> (0x38 - ((s - 1) << 3))) & 0xFF)
                    : (c.wpos >= s ? c.out[c.wpos - s] : 0);
                hi_flat = seg[SEG_LIT_HI_S] + sb * c.nctx_hi + ctx;
            }
            lo_base = seg[SEG_LIT_LO] + ctx_lo * 16;
            lo_masked = !c.mask.empty();
        } else {
            // stride-s prior (engine_np._literal_nibble stride_offset)
            int32_t s = c.stride;
            int32_t sb = self_fed
                ? (int32_t)((c.l8 >> (0x38 - ((s - 1) << 3))) & 0xFF)
                : (c.wpos >= s ? c.out[c.wpos - s] : 0);
            hi_flat = seg[SEG_LIT_HI] + sb;
            lo_base = seg[SEG_LIT_LO] + sb * 16;
        }
        int32_t hi = 0, lo = 0;
        if (c.combine) {
            for (int half = 0; half < 2; ++half) {
                bool is_high = half == 0;
                int32_t nf = is_high ? hi_flat : lo_base + hi;
                int32_t cf = is_high
                    ? seg[SEG_CM_FIRST] + ctx
                    : seg[SEG_CM_SECOND] + hi * c.nctx + ctx_lo;
                Cdf& nrow = c.model[nf];
                Cdf& crow = c.model[cf];
                int which = is_high ? 1 : 0;
                Weights& w = c.ds_lit.chunk ? c.ds_lit.cw[which]
                                            : c.weights[which];
                Cdf mixed = average(crow, nrow, w.norm & 0xFFFF);
                int32_t off = (is_high ? c.lit : c.lit).peek();
                int32_t sym = offset_to_sym(mixed, off);
                int32_t start, freq;
                sym_to_start_freq(mixed, sym, &start, &freq);
                c.lit.advance(start, freq);
                int32_t s1, p_cm, s2, p_nib;
                if (c.ds_lit.chunk) {
                    sym_to_start_freq_r(crow, c.recip[cf], sym, &s1, &p_cm);
                    sym_to_start_freq_r(nrow, c.recip[nf], sym, &s2, &p_nib);
                } else {
                    sym_to_start_freq(crow, sym, &s1, &p_cm);
                    sym_to_start_freq(nrow, sym, &s2, &p_nib);
                }
                if (c.ds_lit.chunk) {
                    int32_t a0, a1;
                    weight_adjustments(p_cm, p_nib, freq, &a0, &a1);
                    c.ds_lit.record_wadj(which, a0, a1);
                    c.ds_lit.record_blend(cf, sym,
                                          c.adapt[is_high ? 3 : 2][0],
                                          c.adapt[is_high ? 3 : 2][1]);
                    c.ds_lit.record_blend(nf, sym, c.adapt[0][0],
                                          c.adapt[0][1]);
                    c.ds_lit.tick();
                } else {
                    weights_update(w, p_cm, p_nib, freq);
                    blend(crow, sym, c.adapt[is_high ? 3 : 2][0],
                          c.adapt[is_high ? 3 : 2][1]);
                    blend(nrow, sym, c.adapt[0][0], c.adapt[0][1]);
                }
                if (is_high) hi = sym; else lo = sym;
                if (is_high && lo_masked) {
                    int32_t mo_lo = c.mask_at(ctx | (hi << 8) | 4096);
                    if (mo_lo != 0) {   // stride prior keyed (sb, hi)
                        int32_t x = mo_lo ^ 4;
                        int32_t s = x < 7 ? x + 1 : 8;
                        int32_t sb = self_fed
                            ? (int32_t)((c.l8 >> (0x38 - ((s - 1) << 3)))
                                        & 0xFF)
                            : (c.wpos >= s ? c.out[c.wpos - s] : 0);
                        lo_base = seg[SEG_LIT_LO_S] + sb * 16;
                    }
                }
            }
        } else {
            hi = c.nib(hi_flat, c.adapt[0][0], c.adapt[0][1], c.lit);
            if (lo_masked) {
                int32_t mo_lo = c.mask_at(ctx | (hi << 8) | 4096);
                if (mo_lo != 0) {
                    int32_t x = mo_lo ^ 4;
                    int32_t s = x < 7 ? x + 1 : 8;
                    int32_t sb = self_fed
                        ? (int32_t)((c.l8 >> (0x38 - ((s - 1) << 3))) & 0xFF)
                        : (c.wpos >= s ? c.out[c.wpos - s] : 0);
                    lo_base = seg[SEG_LIT_LO_S] + sb * 16;
                }
            }
            lo = c.nib(lo_base + hi, c.adapt[0][0], c.adapt[0][1], c.lit);
        }
        c.out[c.wpos++] = (uint8_t)((hi << 4) | lo);
        c.l8 = (c.l8 >> 8) | ((uint64_t)((hi << 4) | lo) << 0x38);
    }
}

static void decode_prediction_mode(DecCtx& c) {
    const int32_t* seg = c.seg;
    c.pm_count++;
    int32_t pm = c.nib(seg[SEG_PM_ONLY], sMED[0], sMED[1], c.cmd);
    if (pm != 3) { c.err = true; return; }  // only utf8 in this profile
    int32_t mix = c.nib(seg[SEG_PM_DCM], sMED[0], sMED[1], c.cmd);
    c.combine = (mix & 3) != 0;
    c.nib(seg[SEG_PM_PD], sFAST[0], sFAST[1], c.cmd);
    for (int si = 0; si < 4; ++si) {
        int32_t inc8 = 0, lim8 = 0;
        for (int pt = 0; pt < 4; ++pt) {
            int32_t v = c.nib(seg[SEG_PM_PALETTE] + pt, sFAST[0], sFAST[1],
                              c.cmd);
            if (pt == 0) inc8 |= v << 3;
            else if (pt == 1) inc8 |= v;
            else if (pt == 2) lim8 |= v << 3;
            else lim8 |= v;
        }
        c.adapt[si][0] = u8_to_speed(inc8);
        c.adapt[si][1] = u8_to_speed(lim8);
    }
    // context maps: literal map may be ARBITRARY (clustered/foreign;
    // stored in lcm_tab, values bounded below); distance map stays
    // identity-bounded (anything else -> python fallback)
    for (int which = 0; which < 2; ++which) {
        int32_t lru[13];
        for (int i = 0; i < 13; ++i) lru[i] = i;
        int32_t limit = which == 0 ? 64 * c.nb_cap : 4;
        int32_t idx = 0;
        for (;;) {
            int32_t mn = c.nib(seg[SEG_PM_CMN] + which, sMED[0], sMED[1],
                               c.cmd);
            if (mn == 14) break;
            int32_t val;
            if (mn == 15) {
                int32_t f = c.nib(seg[SEG_PM_CF] + which, sMED[0], sMED[1],
                                  c.cmd);
                int32_t s = c.nib(seg[SEG_PM_CS] + which, sMED[0], sMED[1],
                                  c.cmd);
                val = (f << 4) | s;
            } else if (mn == 13) {
                int32_t mx = lru[0];
                for (int i = 1; i < 13; ++i) if (lru[i] > mx) mx = lru[i];
                val = (mx + 1) & 0xFF;
            } else {
                val = lru[mn];
            }
            if (idx >= limit) { c.err = true; return; }
            if (which == 0) {
                c.lcm_tab[idx] = (uint8_t)val;
            } else if (val != idx) {
                // distance map: identity required
                c.err = true;
                return;
            }
            // lru move-to-front / insert
            int pos = -1;
            for (int i = 0; i < 13; ++i) if (lru[i] == val) { pos = i; break; }
            if (pos != 0) {
                int upto = pos > 0 ? pos : 12;
                for (int i = upto; i > 0; --i) lru[i] = lru[i - 1];
                lru[0] = val;
            }
            idx++;
        }
        if (which == 0) {
            // literal map: nb*64 entries, nb <= capacity; VALUES must
            // stay inside the nb*64 model rows (engine semantics allow
            // any u8, but rows beyond the layout go to python)
            if (idx % 64 != 0 || idx > limit) { c.err = true; return; }
            if (idx == 0 && c.use_cm) { c.err = true; return; }
            if (idx != 0 && !c.use_cm) { c.err = true; return; }
            c.nb = idx ? idx / 64 : 1;
            c.nctx_hi = 64 * c.nb;
            for (int32_t i = 0; i < idx; ++i)
                if (c.lcm_tab[i] >= 64 * c.nb) { c.err = true; return; }
        } else {
            if (idx != 0 && idx != limit) { c.err = true; return; }
        }
    }
    int32_t mv = c.nib(seg[SEG_PM_MVMODE], sMED[0], sMED[1], c.cmd);
    static const int32_t sPLANE[2] = {0x80, 0x4000};
    if (c.use_cm) {
        if (mv == 0) {
            c.mask.clear();                // all-zero mask: pure cm
        } else if (!c.masked) {
            c.err = true;                  // cm layout: masks -> python
        } else if (mv == 3) {
            int32_t v = c.nib(seg[SEG_PM_MIX] + 16, sPLANE[0], sPLANE[1],
                              c.cmd);
            if (v < 4 || v > 11) { c.err = true; return; }
            c.mask.assign(8192, (uint8_t)v);
        } else if (mv == 4) {
            // one mask value per literal block type (engine_np mv_mode=4)
            uint8_t vals[4] = {0, 0, 0, 0};
            for (int32_t t = 0; t < c.nb; ++t) {
                int32_t v = c.nib(seg[SEG_PM_MIX] + 16, sPLANE[0],
                                  sPLANE[1], c.cmd);
                if (v != 0 && (v < 4 || v > 11)) { c.err = true; return; }
                vals[t] = (uint8_t)v;
            }
            c.mask.assign(8192, 0);
            for (int32_t i = 0; i < 8192; ++i) {
                int32_t t = (i & 0xFF) >> 6;
                if (t > c.nb - 1) t = c.nb - 1;
                c.mask[i] = vals[t];
            }
            bool anyv = false;
            for (int t = 0; t < c.nb; ++t) if (vals[t]) anyv = true;
            if (!anyv) c.mask.clear();
        } else if (mv == 2) {
            // explicit 8192 nibbles, prior = value 256 back (engine_np)
            c.mask.assign(8192, 0);
            for (int32_t i = 0; i < 8192; ++i) {
                int32_t prior = i >= 256 ? (c.mask[i - 256] & 0xF) : 16;
                int32_t v = c.nib(seg[SEG_PM_MIX] + prior, sPLANE[0],
                                  sPLANE[1], c.cmd);
                if (v != 0 && (v < 4 || v > 11)) { c.err = true; return; }
                c.mask[i] = (uint8_t)v;
            }
        } else {
            c.err = true;
        }
    } else if (mv == 1) {
        c.stride = 1;                      // all-fours mask: stride 1
    } else if (mv == 3) {
        // constant mask value 4+s-1 (engine_np mv_mode=3 + one nibble)
        int32_t v = c.nib(seg[SEG_PM_MIX] + 16, sPLANE[0], sPLANE[1], c.cmd);
        if (v < 4) { c.err = true; return; }  // opt1/fast_cm masks: python
        c.stride = (v ^ 4) < 7 ? (v ^ 4) + 1 : 8;
    } else {
        c.err = true;                      // explicit/per-btype: python
    }
}

// Shared command-FSM decode loop: full decode (writes raw bytes) or
// structure-only (records the command script; literal content untouched).
static int32_t decode_loop(DecCtx& c, const DictRef& dict) {
    const int32_t* seg = c.seg;
    const int32_t raw_len = c.raw_len;
    int64_t guard = 8LL * raw_len + 4096;
    while (!c.err) {
        if (guard-- < 0) return 1;
        int32_t nib = c.nib(seg[SEG_CC] + (c.l4s >> 4), sROCKET[0],
                            sROCKET[1], c.cmd);
        if (nib == 0xF) break;
        if (nib == 0x7) {
            decode_prediction_mode(c);
            continue;
        }
        if (nib == 0x3) {                      // literal
            c.l4s = ((c.l4s >> 2) | 128) & 0xFF;
            int32_t shortcut = c.nib(seg[SEG_LL_CS], sMED[0], sMED[1], c.cmd);
            if (shortcut == 15) {              // high-entropy escape
                shortcut = c.nib(seg[SEG_LL_CS], sMED[0], sMED[1], c.cmd);
                if (shortcut == 15) return 1;
            }
            int32_t nbytes;
            if (shortcut < 14) {
                nbytes = shortcut + 1;
                c.last_llen = nbytes;
            } else {
                int32_t beg = c.nib(seg[SEG_LL_BEG], sMUD[0], sMUD[1], c.cmd);
                if (beg == 15) {
                    int32_t last = c.nib(seg[SEG_LL_LAST], sMUD[0], sMUD[1],
                                         c.cmd);
                    if (last + 14 >= 31) return 1;
                    nbytes = mantissa_dec(c, seg[SEG_LL_MANT], seg[SEG_LL_MANT],
                                          rum4(last + 14), 1 << (last + 14),
                                          sMUD, sMUD) + 15;
                    c.last_llen = nbytes;
                } else if (beg <= 1) {
                    nbytes = 15 + beg;
                } else {
                    nbytes = mantissa_dec(c, seg[SEG_LL_MANT], seg[SEG_LL_MANT],
                                          rum4(beg - 1), 1 << (beg - 1),
                                          sMUD, sMUD) + 15;
                    c.last_llen = nbytes;
                }
            }
            if (c.structure) {
                if (c.wpos + nbytes > raw_len
                    || !c.push_op(0, nbytes, 0)) return 1;
                c.wpos += nbytes;
                c.lit_total += nbytes;
            } else {
                decode_literal_content(c, nbytes);
            }
        } else if (nib == 0x1) {               // copy
            c.l4s = ((c.l4s >> 2) | 64) & 0xFF;
            int32_t cs_index = ((c.l4s >> 4) & 3)
                + 4 * ((c.last_llen - 1 < 3) ? c.last_llen - 1 : 3);
            int32_t shortcut = c.nib(seg[SEG_C_CCS] + cs_index, sMUD[0],
                                     sMUD[1], c.cmd);
            int32_t nbytes;
            if (shortcut < 15) {
                nbytes = shortcut;
                c.last_clen = bitlen((uint32_t)nbytes);
            } else {
                int32_t beg = c.nib(seg[SEG_C_CBEG], sFAST[0], sFAST[1],
                                    c.cmd);
                if (beg == 15) {
                    int32_t last = c.nib(seg[SEG_C_CLAST], sFAST[0], sFAST[1],
                                         c.cmd);
                    if (last + 18 >= 31) return 1;
                    c.last_clen = last + 19;
                    nbytes = mantissa_dec(
                        c, seg[SEG_C_CMANT] + 0,
                        seg[SEG_C_CMANT] + (c.last_clen % 4) + 1,
                        rum4(last + 18), 1 << (last + 18), sSLOW, sSLOW);
                } else {
                    c.last_clen = beg + 4;
                    nbytes = mantissa_dec(
                        c, seg[SEG_C_CMANT] + 0,
                        seg[SEG_C_CMANT] + (c.last_clen % 4) + 1,
                        rum4(beg + 3), 1 << (beg + 3), sSLOW, sSLOW);
                }
            }
            int32_t ap = nbytes > 2 ? nbytes - 2 : 0;
            if (ap > 3) ap = 3;
            int32_t mn = c.nib(seg[SEG_C_DMN] + ap * 2
                               + (c.last_llen < 8 ? 1 : 0),
                               sSLOW[0], sSLOW[1], c.cmd);
            int32_t distance;
            if (mn != 15) {
                if (mn < 4) {
                    distance = c.dlru[mn];
                } else {
                    int32_t unsigned_v = mn >> 2;
                    int32_t signed_v = (mn & 1) ? -unsigned_v : unsigned_v;
                    distance = c.dlru[(mn & 2) >> 1] + signed_v;
                    if (distance <= 0) return 1;
                }
                c.last_dlen = bitlen((uint32_t)distance);
            } else {
                int32_t dist_index = bitlen((uint32_t)nbytes) >> 2;
                int32_t beg = c.nib(seg[SEG_C_DBEG] + ap * 8 + dist_index,
                                    sSLOW[0], sSLOW[1], c.cmd);
                if (beg == 15) {
                    distance = c.dlru[1] - 3;
                    if (distance <= 0) return 1;
                    c.last_dlen = bitlen((uint32_t)distance);
                } else if (beg == 14) {
                    int32_t last = c.nib(seg[SEG_C_DLAST] + ap, sROCKET[0],
                                         sROCKET[1], c.cmd);
                    if (last + 14 >= 31) return 1;
                    c.last_dlen = last + 15;
                    int32_t fi = (c.last_dlen & 3) + 1;
                    int32_t sp0[2] = {0x4 << ((fi & 6) << ((fi & 2) >> 1)),
                                      0x4000};
                    int32_t spr[2] = {4, 0x4000};
                    distance = mantissa_dec(c, seg[SEG_C_DMANT] + ap * 5 + 0,
                                            seg[SEG_C_DMANT] + ap * 5 + fi,
                                            rum4(last + 14), 1 << (last + 14),
                                            spr, sp0);
                } else if (beg == 0) {
                    distance = 1;
                    c.last_dlen = 1;
                } else {
                    c.last_dlen = beg + 1;
                    int32_t fi = (c.last_dlen & 3) + 1;
                    int32_t sp0[2] = {0x4 << ((fi & 6) << ((fi & 2) >> 1)),
                                      0x4000};
                    int32_t spr[2] = {4, 0x4000};
                    distance = mantissa_dec(c, seg[SEG_C_DMANT] + ap * 5 + 0,
                                            seg[SEG_C_DMANT] + ap * 5 + fi,
                                            rum4(beg), 1 << beg, spr, sp0);
                }
            }
            // obs + execute
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
            if (distance < 1 || distance > c.wpos
                || c.wpos + nbytes > raw_len) return 1;
            if (c.structure) {
                if (!c.push_op(1, distance, nbytes)) return 1;
                c.wpos += nbytes;
            } else {
                for (int32_t i = 0; i < nbytes; ++i) {
                    c.out[c.wpos] = c.out[c.wpos - distance];
                    c.wpos++;
                }
            }
        } else if (nib == 0x2) {               // dict word
            // engine_np.code_dict (codec/dict.rs:77-170); ctype = 0 (the
            // device/native profiles have nb = 1, and any stream with
            // block switches already fell back above)
            c.l4s = ((c.l4s >> 2) | 192) & 0xFF;
            int32_t beg = c.nib(seg[SEG_D_SBEG], sMUD[0], sMUD[1], c.cmd);
            int32_t ws;
            if (beg == 15) {
                int32_t last = c.nib(seg[SEG_D_SLAST], sMUD[0], sMUD[1],
                                     c.cmd);
                ws = last + 19;
                if (ws > 24) return 1;
            } else {
                ws = beg + 4;
            }
            int32_t bits = DICT_BITS[ws];
            // identity distance cmap: prior = min(max(ws,2)-2, 3) = 3
            // for every dict size, but keep the exact formula
            int32_t prior = (ws > 2 ? ws : 2) - 2;
            if (prior > 3) prior = 3;
            int32_t wid = mantissa_dec(
                c, seg[SEG_D_IDX] + prior * 5 + 0,
                seg[SEG_D_IDX] + prior * 5 + (bits % 4) + 1,
                rum4(bits), 0, sMUD, sMUD);
            int32_t hi = c.nib(seg[SEG_D_TR] + (ws >> 1), sFAST[0], sFAST[1],
                               c.cmd);
            int32_t lo = c.nib(seg[SEG_D_TR] + 16 + hi, sFAST[0], sFAST[1],
                               c.cmd);
            uint8_t word[64];
            int32_t wl = transform_word(dict, ws, wid, (hi << 4) | lo, word);
            if (wl < 0 || c.wpos + wl > raw_len) return 1;
            if (c.structure) {
                if (c.pool_len + wl > c.pool_cap) {
                    c.overflow = true;
                    return 1;
                }
                if (!c.push_op(2, c.pool_len, wl)) return 1;
                memcpy(c.pool + c.pool_len, word, wl);
                c.pool_len += wl;
            } else {
                memcpy(c.out + c.wpos, word, wl);
            }
            c.wpos += wl;
        } else if (nib == 0x4) {               // literal block switch
            if (c.structure) return 1;  // device kernel: nb=1 only
            int32_t mn = c.nib(seg[SEG_BT_MN] + 0, sSLOW[0], sSLOW[1],
                               c.cmd);
            int32_t value;
            if (mn == 0) value = c.bt_lru1;
            else if (mn == 1) value = (c.bt_max_seen + 1) & 0xFF;
            else if (mn != 15) value = mn - 2;
            else {
                int32_t f = c.nib(seg[SEG_BT_F] + 0, sSLOW[0], sSLOW[1],
                                  c.cmd);
                int32_t s = c.nib(seg[SEG_BT_S] + 0, sSLOW[0], sSLOW[1],
                                  c.cmd);
                value = (s << 4) | f;
            }
            c.nib(seg[SEG_BT_STRIDE], sSLOW[0], sSLOW[1], c.cmd);
            if (value < 0 || value >= c.nb) return 1;  // beyond the lcm
            c.bt_lru1 = c.bt_lru0;
            c.bt_lru0 = value;
            if (value > c.bt_max_seen) c.bt_max_seen = value;
            c.btype_last = value;
            c.l4s >>= 2;   // _obs_btype shifts a 0 state tag in
        } else {
            return 1;  // cmd/dist block switches: python fallback
        }
    }
    if (c.err || c.wpos != raw_len) return 1;
    return 0;
}

// Serial decode of one metablock. Returns 0 ok, 1 out-of-profile/corrupt.
// dict_*: the RFC 7932 static dictionary (divans_tpu/data/rfc7932_dict.bin
// via native.py); dict_data may be null, in which case Dict commands are
// out of profile (python fallback).
int32_t dtpu_decode_metablock(
        const uint8_t* cmd_bytes, int32_t cmd_n,
        const uint8_t* lit_bytes, int32_t lit_n,
        int32_t raw_len, int32_t use_cm, int32_t num_rows, int32_t chunk,
        const int32_t* seg_offsets, int32_t nctx, int32_t lo_shift,
        const uint8_t* lut0, const uint8_t* lut1,
        uint8_t* out_raw,
        const uint8_t* dict_data, int32_t dict_size,
        const uint32_t* dict_offsets, const uint8_t* dict_ps_pool,
        const int32_t* dict_tr_meta, int32_t dict_ntr) {
    DictRef dict;
    dict.data = dict_data;
    dict.data_size = dict_size;
    dict.offsets = dict_offsets;
    dict.ps_pool = dict_ps_pool;
    dict.tr_meta = dict_tr_meta;
    dict.ntr = dict_ntr;
    DecCtx c;
    c.model.assign((size_t)num_rows, CDF_INIT);
    c.ds.chunk = chunk ? cmd_chunk(chunk) : 0;  // cmd-stream clock
    c.ds_lit.chunk = chunk;                      // lit-stream clock
    c.ds.committed = &c.model;
    c.ds_lit.committed = &c.model;
    if (chunk) {
        c.ds.init_rows(num_rows);
        c.ds_lit.init_rows(num_rows);
        c.init_recip(num_rows);
    }
    c.cmd.init(cmd_bytes, cmd_n);
    if (chunk) {
        // deferred-v3: lit field = varint(n_subs) ++ varint lengths
        // (all but the last) ++ concatenated sub-stream payloads
        int32_t pos = 0;
        int64_t nsubs = 0;
        if (!read_varint_u(lit_bytes, lit_n, &pos, &nsubs)
            || nsubs < 1 || nsubs > (1 << 20)) return 1;
        std::vector<int64_t> lens((size_t)(nsubs - 1));
        for (auto& ln : lens)
            if (!read_varint_u(lit_bytes, lit_n, &pos, &ln)) return 1;
        for (int64_t ln : lens) {
            if (pos + ln > lit_n) return 1;
            c.lit_subs.emplace_back(lit_bytes + pos, (int32_t)ln);
            pos += (int32_t)ln;
        }
        c.lit_subs.emplace_back(lit_bytes + pos, lit_n - pos);
        c.lit.init(c.lit_subs[0].first, c.lit_subs[0].second);
        c.lit_sub_next = 1;
        c.lit_row_base = seg_offsets[SEG_LIT_HI];
        c.n_rows = num_rows;
    } else {
        c.lit.init(lit_bytes, lit_n);
    }
    c.seg = seg_offsets;
    c.lut0 = lut0;
    c.lut1 = lut1;
    c.nctx = nctx;
    c.lo_shift = lo_shift;
    c.use_cm = (use_cm & 1) != 0;
    c.masked = (use_cm & 2) != 0;   // mix/split profile (masks present)
    c.nb_cap = ((nctx << lo_shift) + 63) / 64;  // lcm capacity in types
    c.out = out_raw;
    c.raw_len = raw_len;
    return decode_loop(c, dict);
}

// Cmd-structure decode — the host half of the 2-stage device decode
// (match: the reference's cmd-decode worker thread,
// /root/reference/src/parallel_decompressor.rs:99-133 feeding
// src/codec/decoder.rs:120-163).  Decodes the cmd stream ONLY (valid for
// deferred-v2 streams, whose per-stream chunk clocks decouple it from
// literal values) and emits the command script:
//   ops[i] = {0, lit_len, 0} | {1, distance, copy_len} | {2, pool_off, len}
// with transformed dict-word bytes appended to pool_out.
// info_out[16]: [0]=lit_total, [1]=combine(mixing on), [2]=pm_count,
// [3..10]=adapt speeds (inc,lim)x4, [11]=pool_len, [12]=nb (literal
// block types).  lcm_out[256] (may be null): the decoded literal
// context map (identity unless the PM carried a clustered/foreign map)
// — the device literal kernel consumes it per frame.
// Returns n_ops >= 0, or -1 (corrupt / out of profile -> caller falls back).
int32_t dtpu_decode_cmd_structure(
        const uint8_t* cmd_bytes, int32_t cmd_n,
        int32_t raw_len, int32_t use_cm, int32_t num_rows, int32_t chunk,
        const int32_t* seg_offsets, int32_t nctx, int32_t lo_shift,
        const uint8_t* lut0, const uint8_t* lut1,
        const uint8_t* dict_data, int32_t dict_size,
        const uint32_t* dict_offsets, const uint8_t* dict_ps_pool,
        const int32_t* dict_tr_meta, int32_t dict_ntr,
        int32_t* ops_out, int32_t ops_cap,
        uint8_t* pool_out, int32_t pool_cap,
        int32_t* info_out, uint8_t* lcm_out) {
    DictRef dict;
    dict.data = dict_data;
    dict.data_size = dict_size;
    dict.offsets = dict_offsets;
    dict.ps_pool = dict_ps_pool;
    dict.tr_meta = dict_tr_meta;
    dict.ntr = dict_ntr;
    DecCtx c;
    c.model.assign((size_t)num_rows, CDF_INIT);
    c.ds.chunk = chunk ? cmd_chunk(chunk) : 0;
    c.ds_lit.chunk = chunk;
    c.ds.committed = &c.model;
    c.ds_lit.committed = &c.model;
    if (chunk) {
        c.ds.init_rows(num_rows);
        c.ds_lit.init_rows(num_rows);
        c.init_recip(num_rows);
    }
    c.cmd.init(cmd_bytes, cmd_n);
    c.lit.init(nullptr, 0);
    c.seg = seg_offsets;
    c.lut0 = lut0;
    c.lut1 = lut1;
    c.nctx = nctx;
    c.lo_shift = lo_shift;
    c.use_cm = use_cm != 0;
    c.out = nullptr;
    c.raw_len = raw_len;
    c.structure = true;
    c.ops = ops_out;
    c.ops_cap = ops_cap;
    c.pool = pool_out;
    c.pool_cap = pool_cap;
    if (decode_loop(c, dict) != 0) return c.overflow ? -2 : -1;
    info_out[0] = (int32_t)c.lit_total;
    info_out[1] = c.combine ? 1 : 0;
    info_out[2] = c.pm_count;
    for (int i = 0; i < 4; ++i) {
        info_out[3 + 2 * i] = c.adapt[i][0];
        info_out[4 + 2 * i] = c.adapt[i][1];
    }
    info_out[11] = c.pool_len;
    info_out[12] = c.nb;
    for (int i = 13; i < 16; ++i) info_out[i] = 0;
    if (lcm_out)
        memcpy(lcm_out, c.lcm_tab, 256);
    return c.n_ops;
}

// Replay a command script with device-decoded literal bytes (the host
// tail of the 2-stage decode; memcpy speed).  Returns 0 ok, 1 corrupt.
int32_t dtpu_execute_script(const int32_t* ops, int32_t n_ops,
                            const uint8_t* lit, int64_t lit_n,
                            const uint8_t* pool, int32_t pool_len,
                            uint8_t* out, int32_t raw_len) {
    int64_t wpos = 0, lpos = 0;
    for (int32_t i = 0; i < n_ops; ++i) {
        const int32_t* op = ops + (int64_t)i * 3;
        if (op[0] == 0) {                       // literal run
            int32_t n = op[1];
            if (n < 0 || lpos + n > lit_n || wpos + n > raw_len) return 1;
            memcpy(out + wpos, lit + lpos, n);
            lpos += n;
            wpos += n;
        } else if (op[0] == 1) {                // copy
            int32_t d = op[1], n = op[2];
            if (d < 1 || d > wpos || n < 0 || wpos + n > raw_len) return 1;
            if (d >= n) {
                memcpy(out + wpos, out + wpos - d, n);
                wpos += n;
            } else {
                for (int32_t k = 0; k < n; ++k, ++wpos)
                    out[wpos] = out[wpos - d];
            }
        } else if (op[0] == 2) {                // dict word from pool
            int32_t off = op[1], n = op[2];
            if (off < 0 || n < 0 || off + n > pool_len
                || wpos + n > raw_len) return 1;
            memcpy(out + wpos, pool + off, n);
            wpos += n;
        } else {
            return 1;
        }
    }
    return wpos == raw_len ? 0 : 1;
}

}  // extern "C"

// ------------------------------------------------------------------ crc32c
// Castagnoli CRC via SSE4.2 when available, else slicing-by-8 table.

#if defined(__SSE4_2__)
#include <nmmintrin.h>
#endif

extern "C" uint32_t dtpu_crc32c(const uint8_t* data, int64_t n,
                                uint32_t crc_in) {
    uint32_t crc = ~crc_in;
#if defined(__SSE4_2__)
    uint64_t c64 = crc;
    int64_t i = 0;
    for (; i + 8 <= n; i += 8) {
        uint64_t v;
        memcpy(&v, data + i, 8);
        c64 = _mm_crc32_u64(c64, v);
    }
    crc = (uint32_t)c64;
    for (; i < n; ++i) crc = _mm_crc32_u8(crc, data[i]);
#else
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
        for (uint32_t j = 0; j < 256; ++j) {
            uint32_t c = j;
            for (int k = 0; k < 8; ++k)
                c = (c >> 1) ^ ((c & 1) ? 0x82F63B78u : 0);
            table[j] = c;
        }
        init = true;
    }
    for (int64_t i = 0; i < n; ++i)
        crc = (crc >> 8) ^ table[(crc ^ data[i]) & 0xFF];
#endif
    return ~crc;
}
