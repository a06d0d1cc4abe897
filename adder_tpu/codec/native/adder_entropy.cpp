// Native entropy stage for the compressed ADDER codec.
//
// Implements the source-modeled compression pipeline bit-compatibly with the
// reference (semantics studied from adder-codec-core/src/codec/compressed/*
// and the vendored arithmetic-coding crate):
//   - 64-bit integer range coder, precision 33 (BitStore u64, max_denominator
//     2^30; ref: arithmetic-coding-adder-dep/src/{encoder,decoder}.rs)
//   - Fenwick-tree adaptive frequency contexts with EOF at index 0
//     (ref: adder-codec-core/src/codec/compressed/fenwick/)
//   - four CABAC contexts: d (513 symbols), t (256), eof (1), bitshift (16)
//     with the reference's peaked priors (ref: cabac_contexts.rs:26-46,138-225)
//   - 16x16x3 EventCube intra/inter residual coding with bitshift escapes and
//     the lossy intensity-tolerant t-quantization
//     (ref: event_cube.rs:309-685, cabac_contexts.rs:83-135)
//   - EventAdu framing: start_t bytes, all cubes intra, all cubes inter, EOF
//     (ref: event_adu.rs:83-166)
//
// This is a host-side sequential stage by nature (adaptive model = serial
// symbol dependency); the TPU pipeline hands each ADU's events to this
// library off the device and streams length-prefixed blobs.
//
// Build: g++ -O2 -shared -fPIC -o libadder_entropy.so adder_entropy.cpp

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

constexpr int BLOCK_SIZE = 16;
constexpr int16_t D_RESIDUAL_OFFSET = 255;
constexpr int16_t DRESIDUAL_NO_EVENT = 256;
constexpr int16_t DRESIDUAL_SKIP_CUBE = 257;
constexpr uint8_t BITSHIFT_ENCODE_FULL = 15;
constexpr uint8_t D_EMPTY = 255;
constexpr uint64_t MAX_DENOMINATOR = 1ull << 30;
constexpr uint32_t PRECISION = 33;  // 64 - (ilog2(2^30)+1)

// ---------------------------------------------------------------- bit IO ---

struct BitWriter {
    std::vector<uint8_t> bytes;
    uint8_t cur = 0;
    int nbits = 0;

    void write_bit(bool b) {
        cur = (uint8_t)((cur << 1) | (b ? 1 : 0));
        if (++nbits == 8) {
            bytes.push_back(cur);
            cur = 0;
            nbits = 0;
        }
    }
    void byte_align() {
        while (nbits != 0) write_bit(false);
    }
};

struct BitReader {
    const uint8_t* data;
    size_t len;
    size_t pos = 0;  // bit position

    // Returns -1 on EOF (the reference treats EOF as "no bit": x unchanged)
    int next_bit() {
        if (pos >= len * 8) return -1;
        int bit = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
        pos++;
        return bit;
    }
};

// ------------------------------------------------------------ Fenwick ------

struct Weights {
    // counts[0] is the EOF pseudo-symbol (ref: fenwick/mod.rs:17-48)
    std::vector<uint64_t> tree;  // fenwick tree over n+1 entries
    uint64_t total = 0;
    size_t n;  // number of real symbols

    explicit Weights(size_t n_symbols) : tree(n_symbols + 2, 0), n(n_symbols) {}

    void add(size_t index, uint64_t delta) {  // index includes EOF offset
        total += delta;
        for (size_t i = index + 1; i < tree.size(); i += i & (~i + 1))
            tree[i] += delta;
    }
    uint64_t prefix_inclusive(size_t index) const {  // sum counts[0..=index]
        uint64_t s = 0;
        for (size_t i = index + 1; i > 0; i -= i & (~i + 1)) s += tree[i];
        return s;
    }
    // probability range for symbol (SIZE_MAX = EOF)
    void range(size_t sym, uint64_t* lo, uint64_t* hi) const {
        size_t index = (sym == SIZE_MAX) ? 0 : sym + 1;
        *hi = prefix_inclusive(index);
        *lo = index == 0 ? 0 : prefix_inclusive(index - 1);
    }
    // smallest i with prefix(Some(i)) > v; SIZE_MAX if v in EOF range
    // (ref: fenwick/mod.rs:81-103)
    size_t symbol(uint64_t v) const {
        if (v < prefix_inclusive(0)) return SIZE_MAX;
        size_t low = 0, high = n;
        while (low + 1 < high) {
            size_t i = (low + high - 1) / 2;
            if (prefix_inclusive(i + 1) > v)
                high = i + 1;
            else
                low = i + 1;
        }
        return low;
    }

    static Weights with_counts(const uint64_t* counts, size_t n_symbols) {
        Weights w(n_symbols);
        for (size_t i = 0; i < n_symbols; i++) w.add(i + 1, counts[i]);
        w.add(0, 1);  // EOF
        return w;
    }
};

struct Model {
    std::vector<Weights> contexts;
    size_t current = 0;

    size_t push(Weights&& w) {
        contexts.push_back(std::move(w));
        return contexts.size() - 1;
    }
    Weights& ctx() { return contexts[current]; }
    const Weights& ctx() const { return contexts[current]; }
    void update(size_t sym) {  // +1 adaptive, capped (ref: context_switching.rs:82-99)
        if (ctx().total < MAX_DENOMINATOR)
            ctx().add(sym == SIZE_MAX ? 0 : sym + 1, 1);
    }
};

// reference context priors (ref: cabac_contexts.rs:138-225)
Weights d_residual_default_weights() {
    uint64_t counts[513];
    for (int i = 0; i < 513; i++) counts[i] = 1;
    for (int i = 0; i < 513; i++) {
        if (i >= 245 && i <= 265)
            counts[i] = 20;
        else if ((i >= 235 && i <= 275) || (i >= 490 && i <= 510) || i <= 20)
            counts[i] = 10;
        if (i == 511) counts[i] = 20;
        if (i == 512) counts[i] = 10;
    }
    return Weights::with_counts(counts, 513);
}

Weights t_residual_default_weights() {
    uint64_t counts[256];
    for (int i = 0; i < 256; i++) counts[i] = 1;
    counts[0] = 100;
    for (int i = 0; i < 10; i++) counts[i] = 10;
    return Weights::with_counts(counts, 256);
}

struct Contexts {
    size_t d_context, t_context, eof_context, bitshift_context;
    int64_t t_residual_max;

    explicit Contexts(Model& m) {
        // context 0: FenwickModel::with_symbols(u16::MAX, ...) default ctx
        m.push(Weights(65535));
        d_context = m.push(d_residual_default_weights());
        Weights tw = t_residual_default_weights();
        t_residual_max = ((int64_t)tw.n - 2) / 2;  // = 127
        t_context = m.push(std::move(tw));
        uint64_t one = 1;
        eof_context = m.push(Weights::with_counts(&one, 1));
        uint64_t ones16[16];
        for (int i = 0; i < 16; i++) ones16[i] = 1;
        bitshift_context = m.push(Weights::with_counts(ones16, 16));
    }
};

// --------------------------------------------------------- range coder -----

struct RangeEncoder {
    uint64_t low = 0, high = 1ull << PRECISION;
    uint32_t pending = 0;
    BitWriter* out;

    static constexpr uint64_t HALF = 1ull << (PRECISION - 1);
    static constexpr uint64_t QUARTER = 1ull << (PRECISION - 2);

    void emit(bool bit) {
        out->write_bit(bit);
        for (uint32_t i = 0; i < pending; i++) out->write_bit(!bit);
        pending = 0;
    }
    void scale(uint64_t plo, uint64_t phi, uint64_t denom) {
        uint64_t range = high - low + 1;
        high = low + (range * phi) / denom - 1;
        low += (range * plo) / denom;
        while (high < HALF || low >= HALF) {
            if (high < HALF) {
                emit(false);
                high <<= 1;
                low <<= 1;
            } else {
                emit(true);
                low = (low - HALF) << 1;
                high = (high - HALF) << 1;
            }
        }
        while (low >= QUARTER && high < HALF + QUARTER) {
            pending++;
            low = (low - QUARTER) << 1;
            high = (high - QUARTER) << 1;
        }
    }
    void encode(Model& m, size_t sym) {
        uint64_t lo, hi;
        m.ctx().range(sym, &lo, &hi);
        scale(lo, hi, m.ctx().total);
        m.update(sym);
    }
    void flush() {
        pending += 1;
        if (low <= QUARTER)
            emit(false);
        else
            emit(true);
    }
};

struct RangeDecoder {
    uint64_t low = 0, high = 1ull << PRECISION, x = 0;
    bool uninit = true;
    BitReader* in;

    static constexpr uint64_t HALF = 1ull << (PRECISION - 1);
    static constexpr uint64_t QUARTER = 1ull << (PRECISION - 2);

    void take_bit() {
        int b = in->next_bit();
        if (b == 1) x += 1;
    }
    void initialise() {
        if (!uninit) return;
        uninit = false;
        for (uint32_t i = 0; i < PRECISION; i++) {
            x <<= 1;
            take_bit();
        }
    }
    size_t decode(Model& m) {
        initialise();
        uint64_t denom = m.ctx().total;
        uint64_t range = high - low + 1;
        uint64_t value = ((x - low + 1) * denom - 1) / range;
        size_t sym = m.ctx().symbol(value);
        uint64_t lo, hi;
        m.ctx().range(sym, &lo, &hi);
        high = low + (range * hi) / denom - 1;
        low += (range * lo) / denom;
        while (high < HALF || low >= HALF) {
            if (high < HALF) {
                high <<= 1;
                low <<= 1;
                x <<= 1;
            } else {
                low = (low - HALF) << 1;
                high = (high - HALF) << 1;
                x = (x - HALF) << 1;
            }
            take_bit();
        }
        while (low >= QUARTER && high < HALF + QUARTER) {
            low = (low - QUARTER) << 1;
            high = (high - QUARTER) << 1;
            x = (x - QUARTER) << 1;
            take_bit();
        }
        m.update(sym);
        return sym;
    }
};

// ----------------------------------------------------------- event cube ----

struct Ev {
    uint8_t d;
    uint32_t t;
};

struct Cube {
    std::vector<Ev> px[3][BLOCK_SIZE][BLOCK_SIZE];
    bool skip = true;
};

static double event_to_intensity_d(uint8_t d, uint32_t delta_t, uint32_t dt_ref) {
    // ref: cabac_contexts.rs:72-81 (D_SHIFT table is 129 entries; >=129 -> 0)
    double intensity;
    if (d >= 129)
        intensity = 0.0;
    else if (d == 128)
        intensity = 0.0;  // D_SHIFT[128] == 0
    else
        intensity = std::ldexp(1.0, d);
    if (delta_t != 0 && d < 129 && d != 128) intensity /= (double)delta_t;
    return intensity * (double)dt_ref;
}

// ref: cabac_contexts.rs:49-70
static void residual_to_bitshift(int64_t t_res, int64_t t_res_max, uint8_t* amt,
                                 int64_t* out_res) {
    if (std::llabs(t_res) < t_res_max) {
        *amt = 0;
        *out_res = t_res;
    } else {
        *amt = BITSHIFT_ENCODE_FULL;
        *out_res = t_res;
    }
}

// ref: cabac_contexts.rs:83-135
static void residual_to_bitshift2(int64_t t_prediction, int64_t t_res_i64,
                                  const Ev& event, const Ev& prev,
                                  uint32_t dt_ref, double c_thresh_max,
                                  int64_t t_res_max, uint8_t* out_amt,
                                  int64_t* out_res) {
    if (std::llabs(t_res_i64) < t_res_max) {
        *out_amt = 0;
        *out_res = t_res_i64;
        return;
    }
    uint32_t actual_dt = event.t >= prev.t ? event.t - prev.t : 0;
    double actual_intensity = event_to_intensity_d(event.d, actual_dt, dt_ref);
    double recon_intensity = actual_intensity;
    uint8_t bitshift = 0;
    int64_t t_residual = std::llabs(t_res_i64);
    for (;;) {
        if (t_residual > t_res_max &&
            actual_intensity - c_thresh_max < recon_intensity &&
            actual_intensity + c_thresh_max > recon_intensity) {
            t_residual >>= 1;
            bitshift += 1;
            int64_t recon_predicted_t64 = t_prediction + t_residual;
            uint32_t recon_predicted_t = (uint32_t)recon_predicted_t64;
            if (recon_predicted_t < prev.t) break;
            uint32_t recon_predicted_dt = recon_predicted_t - prev.t;
            recon_intensity =
                event_to_intensity_d(event.d, recon_predicted_dt, dt_ref);
        } else {
            break;
        }
    }
    bitshift = bitshift > 0 ? (uint8_t)(bitshift - 1) : 0;
    t_residual = std::llabs(t_res_i64) >> bitshift;
    if (t_residual < t_res_max) {
        *out_amt = bitshift;
        *out_res = t_res_i64 < 0 ? -t_residual : t_residual;
    } else {
        *out_amt = BITSHIFT_ENCODE_FULL;
        *out_res = t_res_i64;
    }
}

// ref: event_cube.rs:81-113
static uint32_t generate_t_prediction(size_t idx, int16_t d_residual,
                                      uint32_t last_delta_t, const Ev& prev,
                                      size_t num_intervals, uint32_t dt_ref,
                                      uint32_t start_t) {
    if (idx == 1) return start_t + last_delta_t;
    if (std::abs((int)d_residual) > 14) d_residual = 0;
    if (prev.d == D_EMPTY) d_residual = -1;
    uint32_t delta_t_prediction = d_residual < 0
                                      ? last_delta_t >> (-d_residual)
                                      : last_delta_t << d_residual;
    uint32_t cap = (uint32_t)((uint8_t)num_intervals) * dt_ref;
    uint32_t p = prev.t + std::min(delta_t_prediction, cap);
    return std::max(prev.t, p);
}

struct Adu {
    int blocks_y, blocks_x, channels;
    uint32_t start_t, dt_ref;
    size_t num_intervals;
    std::vector<Cube> cubes;  // row-major

    Cube& cube(int by, int bx) { return cubes[by * blocks_x + bx]; }
};

// encode helpers: byte-wise symbol streams in a given context.
// Enc/Dec are either the range coder (compat `addec` path) or the rANS
// symbol collector/replayer (own `addrn` path) — the residual transforms
// are shared verbatim between the two entropy stages.
template <class Enc>
static void encode_bytes(Enc& enc, Model& m, size_t ctx,
                         const uint8_t* bytes, size_t n) {
    m.current = ctx;
    for (size_t i = 0; i < n; i++) enc.encode(m, bytes[i]);
}

template <class Dec>
static void decode_bytes(Dec& dec, Model& m, size_t ctx,
                         uint8_t* bytes, size_t n) {
    m.current = ctx;
    for (size_t i = 0; i < n; i++) bytes[i] = (uint8_t)dec.decode(m);
}

// ref: event_cube.rs:309-417
template <class Enc>
static void compress_intra(Cube& cube, Enc& enc, Model& m,
                           const Contexts& ctxs, uint32_t start_t,
                           int channels) {
    m.current = ctxs.d_context;
    if (cube.skip) {
        enc.encode(m, (size_t)(DRESIDUAL_SKIP_CUBE + D_RESIDUAL_OFFSET));
        return;
    }
    bool have_init = false;
    Ev init{0, 0};
    for (int c = 0; c < channels; c++)
        for (int y = 0; y < BLOCK_SIZE; y++)
            for (int x = 0; x < BLOCK_SIZE; x++) {
                auto& pixel = cube.px[c][y][x];
                m.current = ctxs.d_context;
                if (!pixel.empty()) {
                    Ev& event = pixel.front();
                    if (have_init) {
                        int16_t d_residual =
                            (int16_t)event.d - (int16_t)init.d;
                        enc.encode(m, (size_t)(d_residual + D_RESIDUAL_OFFSET));
                    } else {
                        enc.encode(m,
                                   (size_t)((int16_t)event.d + D_RESIDUAL_OFFSET));
                        init = Ev{event.d, start_t};
                        have_init = true;
                    }
                    int64_t t_residual_i64 = (int64_t)event.t - (int64_t)init.t;
                    uint8_t amt;
                    int64_t t_residual;
                    residual_to_bitshift(t_residual_i64, ctxs.t_residual_max,
                                         &amt, &t_residual);
                    uint8_t amt_b = amt;
                    encode_bytes(enc, m, ctxs.bitshift_context, &amt_b, 1);
                    if (amt == BITSHIFT_ENCODE_FULL) {
                        uint8_t b[8];
                        for (int i = 0; i < 8; i++)
                            b[i] = (uint8_t)(((uint64_t)t_residual) >>
                                             (56 - 8 * i));
                        encode_bytes(enc, m, ctxs.t_context, b, 8);
                        event.t = (uint32_t)((int64_t)init.t + t_residual);
                    } else {
                        int16_t tr = (int16_t)t_residual;
                        uint8_t b[2] = {(uint8_t)(((uint16_t)tr) >> 8),
                                        (uint8_t)(((uint16_t)tr) & 0xFF)};
                        encode_bytes(enc, m, ctxs.t_context, b, 2);
                        event.t = (uint32_t)((int64_t)init.t +
                                             ((int64_t)tr << amt));
                    }
                    init = event;
                } else {
                    enc.encode(m, (size_t)(DRESIDUAL_NO_EVENT + D_RESIDUAL_OFFSET));
                }
            }
}

// ref: event_cube.rs:419-517
template <class Enc>
static void compress_inter(Cube& cube, Enc& enc, Model& m,
                           const Contexts& ctxs, uint32_t start_t,
                           uint32_t dt_ref, size_t num_intervals, int channels,
                           double c_thresh_max) {
    if (cube.skip) return;
    for (int c = 0; c < channels; c++)
        for (int y = 0; y < BLOCK_SIZE; y++)
            for (int x = 0; x < BLOCK_SIZE; x++) {
                auto& pixel = cube.px[c][y][x];
                if (pixel.empty()) continue;
                size_t idx = 1;
                uint32_t last_delta_t = 0;
                for (;;) {
                    m.current = ctxs.d_context;
                    if (idx < pixel.size()) {
                        Ev prev = pixel[idx - 1];
                        Ev& event = pixel[idx];
                        int16_t d_residual = (int16_t)event.d - (int16_t)prev.d;
                        uint8_t db[2] = {(uint8_t)(((uint16_t)d_residual) >> 8),
                                         (uint8_t)(((uint16_t)d_residual) & 0xFF)};
                        encode_bytes(enc, m, ctxs.d_context, db, 2);

                        uint32_t t_prediction = generate_t_prediction(
                            idx, d_residual, last_delta_t, prev, num_intervals,
                            dt_ref, start_t);
                        int64_t t_residual_i64 =
                            (int64_t)event.t - (int64_t)t_prediction;
                        uint8_t amt;
                        int64_t t_residual;
                        residual_to_bitshift2(t_prediction, t_residual_i64,
                                              event, prev, dt_ref,
                                              c_thresh_max,
                                              ctxs.t_residual_max, &amt,
                                              &t_residual);
                        encode_bytes(enc, m, ctxs.bitshift_context, &amt, 1);
                        if (amt == BITSHIFT_ENCODE_FULL) {
                            uint8_t b[8];
                            for (int i = 0; i < 8; i++)
                                b[i] = (uint8_t)(((uint64_t)t_residual) >>
                                                 (56 - 8 * i));
                            encode_bytes(enc, m, ctxs.t_context, b, 8);
                            event.t =
                                (uint32_t)((int64_t)t_prediction + t_residual);
                        } else {
                            int16_t tr = (int16_t)t_residual;
                            uint8_t b[2] = {(uint8_t)(((uint16_t)tr) >> 8),
                                            (uint8_t)(((uint16_t)tr) & 0xFF)};
                            encode_bytes(enc, m, ctxs.t_context, b, 2);
                            event.t = (uint32_t)((int64_t)t_prediction +
                                                 ((int64_t)tr << amt));
                        }
                        if (event.t < prev.t) event.t = prev.t;
                        last_delta_t = event.t - prev.t;
                    } else {
                        uint8_t nb[2] = {
                            (uint8_t)(((uint16_t)DRESIDUAL_NO_EVENT) >> 8),
                            (uint8_t)(((uint16_t)DRESIDUAL_NO_EVENT) & 0xFF)};
                        encode_bytes(enc, m, ctxs.d_context, nb, 2);
                        break;
                    }
                    idx++;
                }
            }
}

// ref: event_cube.rs:519-598
template <class Dec>
static bool decompress_intra(Cube& cube, Dec& dec, Model& m,
                             const Contexts& ctxs, uint32_t start_t,
                             int channels) {
    bool have_init = false;
    Ev init{0, 0};
    cube.skip = true;
    for (int c = 0; c < channels; c++)
        for (int y = 0; y < BLOCK_SIZE; y++)
            for (int x = 0; x < BLOCK_SIZE; x++) {
                auto& pixel = cube.px[c][y][x];
                m.current = ctxs.d_context;
                size_t sym = dec.decode(m);
                int16_t d_residual = (int16_t)sym - D_RESIDUAL_OFFSET;
                if (d_residual == DRESIDUAL_SKIP_CUBE) {
                    pixel.clear();
                    cube.skip = true;
                    return true;  // whole cube skipped
                } else if (d_residual == DRESIDUAL_NO_EVENT) {
                    pixel.clear();
                } else {
                    uint8_t d;
                    if (have_init) {
                        d = (uint8_t)((int16_t)init.d + d_residual);
                    } else {
                        init = Ev{0, start_t};
                        have_init = true;
                        cube.skip = false;
                        d = (uint8_t)d_residual;
                    }
                    uint8_t amt;
                    decode_bytes(dec, m, ctxs.bitshift_context, &amt, 1);
                    int64_t t_residual;
                    if (amt == BITSHIFT_ENCODE_FULL) {
                        uint8_t b[8];
                        decode_bytes(dec, m, ctxs.t_context, b, 8);
                        uint64_t v = 0;
                        for (int i = 0; i < 8; i++) v = (v << 8) | b[i];
                        t_residual = (int64_t)v;
                    } else {
                        uint8_t b[2];
                        decode_bytes(dec, m, ctxs.t_context, b, 2);
                        int16_t tr = (int16_t)(((uint16_t)b[0] << 8) | b[1]);
                        t_residual = ((int64_t)tr) << amt;
                    }
                    init.d = (uint8_t)((int16_t)init.d + d_residual);
                    init.t = (uint32_t)((int64_t)init.t + t_residual);
                    pixel.push_back(Ev{d, init.t});
                }
            }
    return false;
}

// ref: event_cube.rs:600-685
template <class Dec>
static bool decompress_inter(Cube& cube, Dec& dec, Model& m,
                             const Contexts& ctxs, uint32_t start_t,
                             uint32_t dt_ref, size_t num_intervals,
                             int channels) {
    if (cube.skip) return true;
    // Corrupt-stream guard: a legitimate pixel emits a handful of events per
    // interval (arena depth), but a corrupted symbol stream may never decode
    // DRESIDUAL_NO_EVENT; cap the per-pixel loop instead of growing forever.
    const size_t max_per_px = 32 * num_intervals + 1024;
    for (int c = 0; c < channels; c++)
        for (int y = 0; y < BLOCK_SIZE; y++)
            for (int x = 0; x < BLOCK_SIZE; x++) {
                auto& pixel = cube.px[c][y][x];
                if (pixel.empty()) continue;
                size_t idx = 1;
                uint32_t last_delta_t = 0;
                for (;;) {
                    if (pixel.size() > max_per_px) return false;
                    uint8_t db[2];
                    decode_bytes(dec, m, ctxs.d_context, db, 2);
                    int16_t d_residual =
                        (int16_t)(((uint16_t)db[0] << 8) | db[1]);
                    if (d_residual == DRESIDUAL_NO_EVENT) break;
                    Ev prev = pixel[idx - 1];
                    uint8_t d = (uint8_t)((int16_t)prev.d + d_residual);
                    uint32_t t_prediction = generate_t_prediction(
                        idx, d_residual, last_delta_t, prev, num_intervals,
                        dt_ref, start_t);
                    uint8_t amt;
                    decode_bytes(dec, m, ctxs.bitshift_context, &amt, 1);
                    int64_t t_residual;
                    if (amt == BITSHIFT_ENCODE_FULL) {
                        uint8_t b[8];
                        decode_bytes(dec, m, ctxs.t_context, b, 8);
                        uint64_t v = 0;
                        for (int i = 0; i < 8; i++) v = (v << 8) | b[i];
                        t_residual = (int64_t)v;
                    } else {
                        uint8_t b[2];
                        decode_bytes(dec, m, ctxs.t_context, b, 2);
                        int16_t tr = (int16_t)(((uint16_t)b[0] << 8) | b[1]);
                        t_residual = ((int64_t)tr) << amt;
                    }
                    uint32_t t =
                        (uint32_t)((int64_t)t_prediction + t_residual);
                    if (t < prev.t) t = prev.t;
                    last_delta_t = t - prev.t;
                    pixel.push_back(Ev{d, t});
                    idx++;
                }
            }
    return true;
}

// --------------------------------------------------- interleaved rANS ------
// Own TPU-friendly entropy stage (`addrn` magic; NOT in the reference): the
// cube residual transforms above are reused verbatim, but the adaptive
// arithmetic coder is replaced by 8-lane interleaved rANS with static
// per-ADU frequency tables (two-pass). Decoding is branch-light and
// lane-parallel; encoding visits symbols once to count and once to code.

constexpr uint32_t RANS_SCALE_BITS = 12;
constexpr uint32_t RANS_SCALE = 1u << RANS_SCALE_BITS;
constexpr uint32_t RANS_LOW = 1u << 16;
constexpr int RANS_LANES = 8;

// Collector/replayer present the RangeEncoder/RangeDecoder interface to the
// templated cube functions, but just buffer symbols per model context.
struct SymCollector {
    std::vector<std::vector<uint16_t>> streams;
    explicit SymCollector(size_t n_ctx) : streams(n_ctx) {}
    void encode(Model& m, size_t sym) {
        if (sym == SIZE_MAX) return;  // EOF is implicit (counts in header)
        streams[m.current].push_back((uint16_t)sym);
    }
};

struct SymReplayer {
    std::vector<std::vector<uint16_t>> streams;
    std::vector<size_t> pos;
    bool fail = false;
    explicit SymReplayer(size_t n_ctx) : streams(n_ctx), pos(n_ctx, 0) {}
    size_t decode(Model& m) {
        auto& s = streams[m.current];
        size_t& p = pos[m.current];
        if (p >= s.size()) {
            fail = true;  // corrupt/truncated stream; loop caps bound us
            return 0;
        }
        return s[p++];
    }
};

struct FreqTable {
    std::vector<uint32_t> freq, cum;   // freq[sym], cum[sym]
    std::vector<uint16_t> slot2sym;    // RANS_SCALE entries
    size_t n_sym = 0;

    // quantize raw counts to sum exactly RANS_SCALE (largest-remainder-ish:
    // floor scaling with >=1 per present symbol, then adjust the largest)
    bool build(const std::vector<uint32_t>& counts) {
        n_sym = counts.size();
        freq.assign(n_sym, 0);
        cum.assign(n_sym + 1, 0);
        uint64_t total = 0;
        for (uint32_t c : counts) total += c;
        if (total == 0) return true;  // empty stream
        uint64_t assigned = 0;
        size_t largest = 0;
        for (size_t s = 0; s < n_sym; s++) {
            if (!counts[s]) continue;
            uint64_t f = ((uint64_t)counts[s] * RANS_SCALE) / total;
            if (f == 0) f = 1;
            freq[s] = (uint32_t)f;
            assigned += f;
            if (counts[s] > counts[largest] || freq[largest] == 0) largest = s;
        }
        // fix the sum on the most frequent symbol
        int64_t fix = (int64_t)RANS_SCALE - (int64_t)assigned;
        if ((int64_t)freq[largest] + fix < 1) {
            // pathological many-rare-symbols case: flatten instead
            size_t present = 0;
            for (size_t s = 0; s < n_sym; s++) present += counts[s] ? 1 : 0;
            if (present > RANS_SCALE) return false;
            uint32_t base = RANS_SCALE / (uint32_t)present;
            uint32_t rem = RANS_SCALE % (uint32_t)present;
            for (size_t s = 0; s < n_sym; s++)
                if (counts[s]) freq[s] = base + (rem ? (rem--, 1) : 0);
        } else {
            freq[largest] = (uint32_t)((int64_t)freq[largest] + fix);
        }
        finish();
        return true;
    }
    void finish() {
        uint32_t acc = 0;
        slot2sym.assign(RANS_SCALE, 0);
        for (size_t s = 0; s < n_sym; s++) {
            cum[s] = acc;
            for (uint32_t i = 0; i < freq[s]; i++) slot2sym[acc + i] = (uint16_t)s;
            acc += freq[s];
        }
        cum[n_sym] = acc;
    }
};

static void put_u16(std::vector<uint8_t>& out, uint16_t v) {
    out.push_back((uint8_t)v);
    out.push_back((uint8_t)(v >> 8));
}
static void put_u32(std::vector<uint8_t>& out, uint32_t v) {
    for (int i = 0; i < 4; i++) out.push_back((uint8_t)(v >> (8 * i)));
}

struct ByteCursor {
    const uint8_t* p;
    size_t len, pos = 0;
    bool fail = false;
    uint16_t u16() {
        if (pos + 2 > len) { fail = true; return 0; }
        uint16_t v = (uint16_t)(p[pos] | (p[pos + 1] << 8));
        pos += 2;
        return v;
    }
    uint32_t u32() {
        if (pos + 4 > len) { fail = true; return 0; }
        uint32_t v = 0;
        for (int i = 0; i < 4; i++) v |= (uint32_t)p[pos + i] << (8 * i);
        pos += 4;
        return v;
    }
};

// Giesen-style interleaved rANS: encode in reverse symbol order, each lane
// renormalizing 16-bit words into a shared stream that is reversed at the
// end; the decoder walks symbols forward, lanes round-robin.
static void rans_encode_stream(const std::vector<uint16_t>& syms,
                               const FreqTable& ft,
                               std::vector<uint8_t>& out) {
    uint32_t states[RANS_LANES];
    for (int l = 0; l < RANS_LANES; l++) states[l] = RANS_LOW;
    std::vector<uint16_t> words;
    words.reserve(syms.size());
    for (size_t ii = syms.size(); ii-- > 0;) {
        int l = (int)(ii % RANS_LANES);
        uint32_t f = ft.freq[syms[ii]];
        uint32_t c = ft.cum[syms[ii]];
        uint32_t x = states[l];
        uint64_t x_max = ((uint64_t)(RANS_LOW >> RANS_SCALE_BITS) << 16) * f;
        while (x >= x_max) {
            words.push_back((uint16_t)x);
            x >>= 16;
        }
        states[l] = ((x / f) << RANS_SCALE_BITS) + (x % f) + c;
    }
    for (int l = 0; l < RANS_LANES; l++) put_u32(out, states[l]);
    for (size_t i = words.size(); i-- > 0;) put_u16(out, words[i]);
}

static bool rans_decode_stream(ByteCursor& in, size_t n, const FreqTable& ft,
                               std::vector<uint16_t>& out_syms) {
    out_syms.resize(n);
    if (n == 0) return true;
    uint32_t states[RANS_LANES];
    for (int l = 0; l < RANS_LANES; l++) states[l] = in.u32();
    if (in.fail) return false;
    for (size_t i = 0; i < n; i++) {
        int l = (int)(i % RANS_LANES);
        uint32_t x = states[l];
        uint32_t slot = x & (RANS_SCALE - 1);
        uint16_t s = ft.slot2sym[slot];
        x = ft.freq[s] * (x >> RANS_SCALE_BITS) + slot - ft.cum[s];
        while (x < RANS_LOW) {
            if (in.pos + 2 > in.len) return false;
            x = (x << 16) | in.u16();
        }
        states[l] = x;
        out_syms[i] = s;
    }
    return true;
}

// ----------------------------------------------------------- ADU ingest ----

static void ingest_adu(Adu& adu, const uint16_t* xs, const uint16_t* ys,
                       const uint8_t* cs, const uint8_t* ds,
                       const uint32_t* ts, size_t n_events) {
    // ref: event_adu.rs:179-193, event_cube.rs:121-155
    for (size_t i = 0; i < n_events; i++) {
        int by = ys[i] / BLOCK_SIZE, bx = xs[i] / BLOCK_SIZE;
        Cube& cube = adu.cube(by, bx);
        int cc = cs[i] == 255 ? 0 : cs[i];
        int ly = ys[i] % BLOCK_SIZE, lx = xs[i] % BLOCK_SIZE;
        auto& pixel = cube.px[cc][ly][lx];
        if (pixel.size() > 1 && ts[i] <= pixel.back().t) continue;
        pixel.push_back(Ev{ds[i], ts[i]});
        cube.skip = false;
    }
}

}  // namespace

// ------------------------------------------------------------- C ABI -------

extern "C" {

// Compress one ADU's events. Events must be the raw transcoder output order
// (per-pixel chronological). Coordinates are absolute; channel 255 = mono.
// Returns a malloc'd blob in *out (caller frees via adder_free).
// Event t values are rewritten to their (possibly lossy) reconstructions.
int adder_compress_adu(const uint16_t* xs, const uint16_t* ys,
                       const uint8_t* cs, const uint8_t* ds,
                       const uint32_t* ts, size_t n_events, uint16_t width,
                       uint16_t height, uint8_t channels, uint32_t start_t,
                       uint32_t dt_ref, uint32_t num_intervals,
                       uint8_t c_thresh_max, uint8_t** out, size_t* out_len) {
    Adu adu;
    adu.blocks_y = (height + BLOCK_SIZE - 1) / BLOCK_SIZE;
    adu.blocks_x = (width + BLOCK_SIZE - 1) / BLOCK_SIZE;
    adu.channels = channels;
    adu.start_t = start_t;
    adu.dt_ref = dt_ref;
    adu.num_intervals = num_intervals;
    adu.cubes.resize((size_t)adu.blocks_y * adu.blocks_x);

    ingest_adu(adu, xs, ys, cs, ds, ts, n_events);

    // compress (ref: event_adu.rs:83-116)
    BitWriter bw;
    RangeEncoder enc;
    enc.out = &bw;
    Model m;
    Contexts ctxs(m);

    m.current = ctxs.t_context;
    uint8_t stb[4] = {(uint8_t)(start_t >> 24), (uint8_t)(start_t >> 16),
                      (uint8_t)(start_t >> 8), (uint8_t)start_t};
    for (int i = 0; i < 4; i++) enc.encode(m, stb[i]);

    for (auto& cube : adu.cubes)
        compress_intra(cube, enc, m, ctxs, start_t, channels);
    for (auto& cube : adu.cubes)
        compress_inter(cube, enc, m, ctxs, start_t, dt_ref, num_intervals,
                       channels, (double)c_thresh_max);

    // EOF flush (ref: cabac_contexts.rs:227-239)
    m.current = ctxs.eof_context;
    enc.encode(m, SIZE_MAX);
    enc.flush();
    bw.byte_align();

    *out_len = bw.bytes.size();
    *out = (uint8_t*)std::malloc(bw.bytes.size());
    std::memcpy(*out, bw.bytes.data(), bw.bytes.size());
    return 0;
}

// Decompress one ADU blob. Outputs events in cube-raster drain order
// (ref: event_adu.rs:195-214, event_cube.rs:157-199). Caller provides
// capacity; returns number of events, or -1 if capacity insufficient.
long adder_decompress_adu(const uint8_t* blob, size_t blob_len, uint16_t width,
                          uint16_t height, uint8_t channels, uint32_t start_t,
                          uint32_t dt_ref, uint32_t num_intervals,
                          uint16_t* xs, uint16_t* ys, uint8_t* cs, uint8_t* ds,
                          uint32_t* ts, size_t cap) {
    int blocks_y = (height + BLOCK_SIZE - 1) / BLOCK_SIZE;
    int blocks_x = (width + BLOCK_SIZE - 1) / BLOCK_SIZE;
    std::vector<Cube> cubes((size_t)blocks_y * blocks_x);

    BitReader br{blob, blob_len};
    RangeDecoder dec;
    dec.in = &br;
    Model m;
    Contexts ctxs(m);

    m.current = ctxs.t_context;
    uint8_t stb[4];
    for (int i = 0; i < 4; i++) stb[i] = (uint8_t)dec.decode(m);
    (void)stb;  // the reference reads but ignores this, using its own start_t

    for (auto& cube : cubes)
        decompress_intra(cube, dec, m, ctxs, start_t, channels);
    for (auto& cube : cubes)
        if (!decompress_inter(cube, dec, m, ctxs, start_t, dt_ref,
                              num_intervals, channels))
            return -2;  // corrupt stream: per-pixel event cap exceeded

    // drain
    size_t k = 0;
    for (int by = 0; by < blocks_y; by++)
        for (int bx = 0; bx < blocks_x; bx++) {
            Cube& cube = cubes[(size_t)by * blocks_x + bx];
            if (cube.skip) continue;
            for (int c = 0; c < channels; c++)
                for (int y = 0; y < BLOCK_SIZE; y++)
                    for (int x = 0; x < BLOCK_SIZE; x++)
                        for (const Ev& e : cube.px[c][y][x]) {
                            if (k >= cap) return -1;
                            xs[k] = (uint16_t)(bx * BLOCK_SIZE + x);
                            ys[k] = (uint16_t)(by * BLOCK_SIZE + y);
                            cs[k] = channels == 1 ? 255 : (uint8_t)c;
                            ds[k] = e.d;
                            ts[k] = e.t;
                            k++;
                        }
        }
    return (long)k;
}

void adder_free(uint8_t* p) { std::free(p); }

// Compress one ADU with the interleaved-rANS entropy stage (`addrn` format;
// own design, not reference-compatible at the bitstream level — the cube
// residual transforms and event semantics are identical to the `addec`
// path, only the entropy coding differs).
//
// Blob layout (all little-endian):
//   u32 start_t
//   u8 lanes, u8 scale_bits, u16 reserved
//   3 x context stream [d, t, bitshift]:
//     u32 n_syms
//     u16 n_nonzero, then n_nonzero x (u16 sym, u16 freq)
//     u32 payload_len, payload (lane states + reversed renorm words)
int adder_compress_adu_rans(const uint16_t* xs, const uint16_t* ys,
                            const uint8_t* cs, const uint8_t* ds,
                            const uint32_t* ts, size_t n_events,
                            uint16_t width, uint16_t height, uint8_t channels,
                            uint32_t start_t, uint32_t dt_ref,
                            uint32_t num_intervals, uint8_t c_thresh_max,
                            uint8_t** out, size_t* out_len) {
    Adu adu;
    adu.blocks_y = (height + BLOCK_SIZE - 1) / BLOCK_SIZE;
    adu.blocks_x = (width + BLOCK_SIZE - 1) / BLOCK_SIZE;
    adu.channels = channels;
    adu.start_t = start_t;
    adu.dt_ref = dt_ref;
    adu.num_intervals = num_intervals;
    adu.cubes.resize((size_t)adu.blocks_y * adu.blocks_x);
    ingest_adu(adu, xs, ys, cs, ds, ts, n_events);

    // pass 1: run the shared residual transforms, collecting symbols
    Model m;
    Contexts ctxs(m);
    SymCollector col(m.contexts.size());
    for (auto& cube : adu.cubes)
        compress_intra(cube, col, m, ctxs, start_t, channels);
    for (auto& cube : adu.cubes)
        compress_inter(cube, col, m, ctxs, start_t, dt_ref, num_intervals,
                       channels, (double)c_thresh_max);

    const size_t ctx_ids[3] = {ctxs.d_context, ctxs.t_context,
                               ctxs.bitshift_context};
    const size_t alphabet[3] = {513 + 5, 256, 16};

    std::vector<uint8_t> blob;
    put_u32(blob, start_t);
    blob.push_back((uint8_t)RANS_LANES);
    blob.push_back((uint8_t)RANS_SCALE_BITS);
    put_u16(blob, 0);

    for (int k = 0; k < 3; k++) {
        const auto& syms = col.streams[ctx_ids[k]];
        std::vector<uint32_t> counts(alphabet[k], 0);
        for (uint16_t s : syms) {
            if (s >= alphabet[k]) return -3;
            counts[s]++;
        }
        FreqTable ft;
        if (!ft.build(counts)) return -4;
        put_u32(blob, (uint32_t)syms.size());
        uint16_t nz = 0;
        for (uint32_t f : ft.freq) nz += f ? 1 : 0;
        put_u16(blob, nz);
        for (size_t s = 0; s < ft.freq.size(); s++)
            if (ft.freq[s]) {
                put_u16(blob, (uint16_t)s);
                put_u16(blob, (uint16_t)ft.freq[s]);
            }
        std::vector<uint8_t> payload;
        if (!syms.empty()) rans_encode_stream(syms, ft, payload);
        put_u32(blob, (uint32_t)payload.size());
        blob.insert(blob.end(), payload.begin(), payload.end());
    }

    *out_len = blob.size();
    *out = (uint8_t*)std::malloc(blob.size());
    std::memcpy(*out, blob.data(), blob.size());
    return 0;
}

long adder_decompress_adu_rans(const uint8_t* blob, size_t blob_len,
                               uint16_t width, uint16_t height,
                               uint8_t channels, uint32_t start_t,
                               uint32_t dt_ref, uint32_t num_intervals,
                               uint16_t* xs, uint16_t* ys, uint8_t* cs,
                               uint8_t* ds, uint32_t* ts, size_t cap) {
    int blocks_y = (height + BLOCK_SIZE - 1) / BLOCK_SIZE;
    int blocks_x = (width + BLOCK_SIZE - 1) / BLOCK_SIZE;
    std::vector<Cube> cubes((size_t)blocks_y * blocks_x);

    Model m;
    Contexts ctxs(m);
    SymReplayer rep(m.contexts.size());
    const size_t ctx_ids[3] = {ctxs.d_context, ctxs.t_context,
                               ctxs.bitshift_context};
    const size_t alphabet[3] = {513 + 5, 256, 16};

    ByteCursor cur{blob, blob_len};
    (void)cur.u32();  // start_t (caller passes its own, like the reference)
    uint8_t lanes = cur.pos < cur.len ? blob[cur.pos] : 0;
    cur.pos += 1;
    uint8_t scale_bits = cur.pos < cur.len ? blob[cur.pos] : 0;
    cur.pos += 1;
    (void)cur.u16();
    if (cur.fail || lanes != RANS_LANES || scale_bits != RANS_SCALE_BITS)
        return -2;

    for (int k = 0; k < 3; k++) {
        uint32_t n_syms = cur.u32();
        uint16_t nz = cur.u16();
        if (cur.fail) return -2;
        std::vector<uint32_t> counts(alphabet[k], 0);
        FreqTable ft;
        ft.n_sym = alphabet[k];
        ft.freq.assign(alphabet[k], 0);
        ft.cum.assign(alphabet[k] + 1, 0);
        uint32_t fsum = 0;
        for (uint16_t i = 0; i < nz; i++) {
            uint16_t s = cur.u16();
            uint16_t f = cur.u16();
            if (cur.fail || s >= alphabet[k]) return -2;
            ft.freq[s] = f;
            fsum += f;
        }
        if (n_syms > 0 && fsum != RANS_SCALE) return -2;
        ft.finish();
        uint32_t payload_len = cur.u32();
        if (cur.fail || cur.pos + payload_len > cur.len) return -2;
        ByteCursor pc{blob + cur.pos, payload_len};
        if (!rans_decode_stream(pc, n_syms, ft, rep.streams[ctx_ids[k]]))
            return -2;
        cur.pos += payload_len;
    }

    for (auto& cube : cubes)
        decompress_intra(cube, rep, m, ctxs, start_t, channels);
    for (auto& cube : cubes)
        if (!decompress_inter(cube, rep, m, ctxs, start_t, dt_ref,
                              num_intervals, channels))
            return -2;
    if (rep.fail) return -2;

    size_t k = 0;
    for (int by = 0; by < blocks_y; by++)
        for (int bx = 0; bx < blocks_x; bx++) {
            Cube& cube = cubes[(size_t)by * blocks_x + bx];
            if (cube.skip) continue;
            for (int c = 0; c < channels; c++)
                for (int y = 0; y < BLOCK_SIZE; y++)
                    for (int x = 0; x < BLOCK_SIZE; x++)
                        for (const Ev& e : cube.px[c][y][x]) {
                            if (k >= cap) return -1;
                            xs[k] = (uint16_t)(bx * BLOCK_SIZE + x);
                            ys[k] = (uint16_t)(by * BLOCK_SIZE + y);
                            cs[k] = channels == 1 ? 255 : (uint8_t)c;
                            ds[k] = e.d;
                            ts[k] = e.t;
                            k++;
                        }
        }
    return (long)k;
}

// LZ4 block decompression (standard LZ4 block format; used by the aedat4
// reader for DV-written files — lz4 has no Python binding in this
// environment). Returns decompressed size, or -1 on malformed input /
// insufficient capacity.
long adder_lz4_block_decompress(const uint8_t* src, size_t src_len,
                                uint8_t* dst, size_t dst_cap) {
    size_t ip = 0, op = 0;
    while (ip < src_len) {
        uint8_t token = src[ip++];
        size_t lit_len = token >> 4;
        if (lit_len == 15) {
            uint8_t b;
            do {
                if (ip >= src_len) return -1;
                b = src[ip++];
                lit_len += b;
            } while (b == 255);
        }
        if (ip + lit_len > src_len || op + lit_len > dst_cap) return -1;
        std::memcpy(dst + op, src + ip, lit_len);
        ip += lit_len;
        op += lit_len;
        if (ip >= src_len) break;  // last literals-only sequence
        if (ip + 2 > src_len) return -1;
        size_t offset = src[ip] | ((size_t)src[ip + 1] << 8);
        ip += 2;
        if (offset == 0 || offset > op) return -1;
        size_t match_len = (token & 0xF);
        if (match_len == 15) {
            uint8_t b;
            do {
                if (ip >= src_len) return -1;
                b = src[ip++];
                match_len += b;
            } while (b == 255);
        }
        match_len += 4;
        if (op + match_len > dst_cap) return -1;
        // overlapping copies are part of the format: byte-by-byte
        for (size_t i = 0; i < match_len; i++, op++)
            dst[op] = dst[op - offset];
    }
    return (long)op;
}

// Variant for LZ4-frame dependent blocks: dst[0..prefix_len) already holds
// the previous window; decoding starts at prefix_len and matches may reach
// back into the prefix. Returns end position (>= prefix_len) or -1.
long adder_lz4_block_decompress_prefixed(const uint8_t* src, size_t src_len,
                                         uint8_t* dst, size_t dst_cap,
                                         size_t prefix_len) {
    size_t ip = 0, op = prefix_len;
    while (ip < src_len) {
        uint8_t token = src[ip++];
        size_t lit_len = token >> 4;
        if (lit_len == 15) {
            uint8_t b;
            do {
                if (ip >= src_len) return -1;
                b = src[ip++];
                lit_len += b;
            } while (b == 255);
        }
        if (ip + lit_len > src_len || op + lit_len > dst_cap) return -1;
        std::memcpy(dst + op, src + ip, lit_len);
        ip += lit_len;
        op += lit_len;
        if (ip >= src_len) break;
        if (ip + 2 > src_len) return -1;
        size_t offset = src[ip] | ((size_t)src[ip + 1] << 8);
        ip += 2;
        if (offset == 0 || offset > op) return -1;
        size_t match_len = (token & 0xF);
        if (match_len == 15) {
            uint8_t b;
            do {
                if (ip >= src_len) return -1;
                b = src[ip++];
                match_len += b;
            } while (b == 255);
        }
        match_len += 4;
        if (op + match_len > dst_cap) return -1;
        for (size_t i = 0; i < match_len; i++, op++)
            dst[op] = dst[op - offset];
    }
    return (long)op;
}

// EventDrop EMA rate limiter over an event batch (ref: encoder.rs:234-253).
// IEEE double arithmetic matches the Python-scalar recurrence bit-for-bit,
// so the keep-set is identical; this just removes the per-event interpreter
// cost (million-event batches drop in ~ms).
double adder_event_drop_ema(size_t n, double rate, double alpha,
                            double instant_rate /* (1-alpha)/t_diff */,
                            double target, uint8_t* keep_out) {
    for (size_t i = 0; i < n; i++) {
        double new_rate = alpha * rate + instant_rate;
        if (new_rate > target) {
            rate *= alpha;
            keep_out[i] = 0;
        } else {
            rate = new_rate;
            keep_out[i] = 1;
        }
    }
    return rate;
}

}  // extern "C"
