// Minimal LASzip (.laz) codec — native replacement for the reference's
// lazrs/laspy LAZ path (las_dataset.py:36-41 reads .laz via laspy's
// LazBackend chain; this image has neither laspy nor lazrs, and the NFI
// distribution ships LAZ).
//
// Scope: compressor type 2 (POINTWISE_CHUNKED) with version-2 items
//   POINT10 v2, GPSTIME11 v2, RGB12 v2, BYTE v2
// i.e. LAS point formats 0-3 (+ extra bytes), the airborne-LiDAR formats.
// Both directions are implemented (decompress for ingestion, compress for
// export and test fixtures).
//
// Implementation notes: the entropy coder is the Amir-Said FastAC variant
// used by LASzip (arithmetic{enc,dec} with DM_/BM_ LengthShift 15/13,
// AC__MinLength renormalization), the predictors mirror
// las{read,write}item_compressed_v2 (streaming median-of-5 x/y deltas with
// 16 return-context slots, per-level z heights, changed-values flag symbol,
// multi-sequence gpstime with 32-bit-diff multipliers). Written from the
// LASzip format description; round-trip correctness is test-asserted
// (tests/test_data.py); conformance against reference laszip archives
// should be re-validated in an environment that has laspy+lazrs.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;
typedef int8_t I8;
typedef int16_t I16;
typedef int32_t I32;
typedef int64_t I64;

namespace laz {

// ---------------------------------------------------------------------------
// FastAC arithmetic coder (as in LASzip: arithmeticencoder/decoder.cpp)
// ---------------------------------------------------------------------------

static const U32 AC_MinLength = 0x01000000u;
static const U32 AC_MaxLength = 0xFFFFFFFFu;

static const int DM_LengthShift = 15;
static const U32 DM_MaxCount = 1u << DM_LengthShift;
static const int BM_LengthShift = 13;
static const U32 BM_MaxCount = 1u << BM_LengthShift;

struct ArithmeticModel {
    std::vector<U32> distribution, symbol_count, decoder_table;
    U32 symbols = 0, total_count = 0, update_cycle = 0, symbols_until_update = 0;
    U32 last_symbol = 0, table_size = 0, table_shift = 0;
    bool compress = false;

    void init(U32 n, bool for_compress) {
        symbols = n;
        compress = for_compress;
        last_symbol = n - 1;
        if (!for_compress && symbols > 16) {
            U32 table_bits = 3;
            while (symbols > (1u << (table_bits + 2))) ++table_bits;
            table_size = 1u << table_bits;
            table_shift = DM_LengthShift - table_bits;
            decoder_table.assign(table_size + 2, 0);
        } else {
            table_size = table_shift = 0;
            decoder_table.clear();
        }
        distribution.assign(symbols, 0);
        symbol_count.assign(symbols, 1);
        total_count = 0;
        update_cycle = symbols;
        update();
        symbols_until_update = update_cycle = (symbols + 6) >> 1;
    }

    void update() {
        if ((total_count += update_cycle) > DM_MaxCount) {
            total_count = 0;
            for (U32 n = 0; n < symbols; n++) {
                symbol_count[n] = (symbol_count[n] + 1) >> 1;
                total_count += symbol_count[n];
            }
        }
        U32 sum = 0, s = 0;
        U32 scale = 0x80000000u / total_count;
        if (compress || (table_size == 0)) {
            for (U32 k = 0; k < symbols; k++) {
                distribution[k] = (scale * sum) >> (31 - DM_LengthShift);
                sum += symbol_count[k];
            }
        } else {
            for (U32 k = 0; k < symbols; k++) {
                distribution[k] = (scale * sum) >> (31 - DM_LengthShift);
                sum += symbol_count[k];
                U32 w = distribution[k] >> table_shift;
                while (s < w) decoder_table[++s] = k - 1;
            }
            decoder_table[0] = 0;
            while (s <= table_size) decoder_table[++s] = symbols - 1;
        }
        update_cycle = (5 * update_cycle) >> 2;
        U32 max_cycle = (symbols + 6) << 3;
        if (update_cycle > max_cycle) update_cycle = max_cycle;
        symbols_until_update = update_cycle;
    }
};

struct ArithmeticBitModel {
    U32 bit_0_prob, bit_0_count, bit_count, update_cycle, bits_until_update;

    void init() {
        bit_0_count = 1;
        bit_count = 2;
        bit_0_prob = 1u << (BM_LengthShift - 1);
        update_cycle = bits_until_update = 4;
    }

    void update() {
        if ((bit_count += update_cycle) > BM_MaxCount) {
            bit_count = (bit_count + 1) >> 1;
            bit_0_count = (bit_0_count + 1) >> 1;
            if (bit_0_count == bit_count) ++bit_count;
        }
        U32 scale = 0x80000000u / bit_count;
        bit_0_prob = (bit_0_count * scale) >> (31 - BM_LengthShift);
        update_cycle = (5 * update_cycle) >> 2;
        if (update_cycle > 64) update_cycle = 64;
        bits_until_update = update_cycle;
    }
};

struct Decoder {
    const U8* in;
    const U8* in_end;
    U32 value = 0, length = 0;

    U8 getByte() { return (in < in_end) ? *in++ : 0; }

    void init() {
        length = AC_MaxLength;
        value = ((U32)getByte() << 24) | ((U32)getByte() << 16)
              | ((U32)getByte() << 8) | (U32)getByte();
    }

    void renorm() {
        do { value = (value << 8) | getByte(); }
        while ((length <<= 8) < AC_MinLength);
    }

    U32 decodeBit(ArithmeticBitModel& m) {
        U32 x = m.bit_0_prob * (length >> BM_LengthShift);
        U32 sym = (value >= x);
        if (sym == 0) {
            length = x;
            ++m.bit_0_count;
        } else {
            value -= x;
            length -= x;
        }
        if (length < AC_MinLength) renorm();
        if (--m.bits_until_update == 0) m.update();
        return sym;
    }

    U32 decodeSymbol(ArithmeticModel& m) {
        U32 n, sym, x, y = length;
        if (!m.decoder_table.empty()) {
            length >>= DM_LengthShift;
            U32 dv = value / length;
            U32 t = dv >> m.table_shift;
            sym = m.decoder_table[t];
            n = m.decoder_table[t + 1] + 1;
            while (n > sym + 1) {
                U32 k = (sym + n) >> 1;
                if (m.distribution[k] > dv) n = k; else sym = k;
            }
            x = m.distribution[sym] * length;
            if (sym != m.last_symbol) y = m.distribution[sym + 1] * length;
        } else {
            x = sym = 0;
            length >>= DM_LengthShift;
            U32 k = (n = m.symbols) >> 1;
            do {
                U32 z = length * m.distribution[k];
                if (z > value) { n = k; y = z; }
                else { sym = k; x = z; }
            } while ((k = (sym + n) >> 1) != sym);
        }
        value -= x;
        length = y - x;
        if (length < AC_MinLength) renorm();
        ++m.symbol_count[sym];
        if (--m.symbols_until_update == 0) m.update();
        return sym;
    }

    U32 readBits(U32 bits) {
        if (bits > 19) {
            U32 lo = readShort();
            U32 hi = readBits(bits - 16);
            return (hi << 16) | lo;
        }
        U32 sym = value / (length >>= bits);
        value -= length * sym;
        if (length < AC_MinLength) renorm();
        return sym;
    }

    U8 readByte() {
        U32 sym = value / (length >>= 8);
        value -= length * sym;
        if (length < AC_MinLength) renorm();
        return (U8)sym;
    }

    U16 readShort() {
        U32 sym = value / (length >>= 16);
        value -= length * sym;
        if (length < AC_MinLength) renorm();
        return (U16)sym;
    }

    U32 readInt() {
        U32 lo = readShort();
        U32 hi = readShort();
        return ((U32)hi << 16) | lo;
    }
};

struct Encoder {
    std::vector<U8> out;
    U32 base = 0, length = AC_MaxLength;

    void init() {
        out.clear();
        base = 0;
        length = AC_MaxLength;
    }

    void propagate_carry() {
        // increment backwards over 0xFF bytes
        for (size_t i = out.size(); i-- > 0;) {
            if (out[i] == 0xFFu) out[i] = 0;
            else { ++out[i]; break; }
        }
    }

    void renorm() {
        do {
            out.push_back((U8)(base >> 24));
            base <<= 8;
        } while ((length <<= 8) < AC_MinLength);
    }

    void encodeBit(ArithmeticBitModel& m, U32 bit) {
        U32 x = m.bit_0_prob * (length >> BM_LengthShift);
        if (bit == 0) {
            length = x;
            ++m.bit_0_count;
        } else {
            U32 init_base = base;
            base += x;
            length -= x;
            if (init_base > base) propagate_carry();
        }
        if (length < AC_MinLength) renorm();
        if (--m.bits_until_update == 0) m.update();
    }

    void encodeSymbol(ArithmeticModel& m, U32 sym) {
        U32 x, init_base = base;
        if (sym == m.last_symbol) {
            x = m.distribution[sym] * (length >> DM_LengthShift);
            base += x;
            length -= x;
        } else {
            x = m.distribution[sym] * (length >>= DM_LengthShift);
            base += x;
            length = m.distribution[sym + 1] * length - x;
        }
        if (init_base > base) propagate_carry();
        if (length < AC_MinLength) renorm();
        ++m.symbol_count[sym];
        if (--m.symbols_until_update == 0) m.update();
    }

    void writeBits(U32 bits, U32 sym) {
        if (bits > 19) {
            writeShort((U16)(sym & 0xFFFFu));
            writeBits(bits - 16, sym >> 16);
            return;
        }
        U32 init_base = base;
        base += sym * (length >>= bits);
        if (init_base > base) propagate_carry();
        if (length < AC_MinLength) renorm();
    }

    void writeByte(U8 sym) {
        U32 init_base = base;
        base += (U32)sym * (length >>= 8);
        if (init_base > base) propagate_carry();
        if (length < AC_MinLength) renorm();
    }

    void writeShort(U16 sym) {
        U32 init_base = base;
        base += (U32)sym * (length >>= 16);
        if (init_base > base) propagate_carry();
        if (length < AC_MinLength) renorm();
    }

    void writeInt(U32 sym) {
        writeShort((U16)(sym & 0xFFFFu));
        writeShort((U16)(sym >> 16));
    }

    void done() {
        // LASzip ArithmeticEncoder::done(): the decoder may read a few
        // bytes past this chunk's output — chunk boundaries are recovered
        // from the chunk table, not from the decoder's consumed position
        U32 init_base = base;
        if (length > 2 * AC_MinLength) {
            base += AC_MinLength;
            length = AC_MinLength >> 1;
        } else {
            base += AC_MinLength >> 1;
            length = AC_MinLength >> 9;
        }
        if (init_base > base) propagate_carry();
        renorm();
    }
};

// ---------------------------------------------------------------------------
// IntegerCompressor (LASzip integercompressor.cpp) for bits=32
// ---------------------------------------------------------------------------

struct IntegerDecompressor {
    Decoder* dec = nullptr;
    U32 contexts = 0, bits_high = 8;
    U32 k = 0;
    std::vector<ArithmeticModel> mBits;      // [contexts], 33 symbols
    ArithmeticBitModel mCorrector0;
    std::vector<ArithmeticModel> mCorrector; // [32], 1<<min(k,8) symbols

    void init(Decoder* d, U32 n_contexts) {
        dec = d;
        contexts = n_contexts;
        mBits.resize(contexts);
        for (U32 c = 0; c < contexts; c++) mBits[c].init(33, false);
        mCorrector0.init();
        mCorrector.resize(33);
        for (U32 kk = 1; kk <= 32; kk++)
            mCorrector[kk].init(kk <= bits_high ? (1u << kk)
                                                : (1u << bits_high), false);
    }

    I32 readCorrector(ArithmeticModel& bits_model) {
        I32 c;
        k = dec->decodeSymbol(bits_model);
        if (k) {
            if (k < 32) {
                if (k <= bits_high) {
                    c = (I32)dec->decodeSymbol(mCorrector[k]);
                } else {
                    U32 k1 = k - bits_high;
                    c = (I32)dec->decodeSymbol(mCorrector[k]);
                    U32 c1 = dec->readBits(k1);
                    c = (I32)(((U32)c << k1) | c1);
                }
                if (c >= (1 << (k - 1))) c += 1;
                else c -= ((1 << k) - 1);
            } else {
                c = INT32_MIN;  // corr_min for full 32-bit range
            }
        } else {
            c = (I32)dec->decodeBit(mCorrector0);
        }
        return c;
    }

    I32 decompress(I32 pred, U32 context) {
        // bits=32: corr_range wraps mod 2^32 naturally
        return (I32)((U32)pred + (U32)readCorrector(mBits[context]));
    }
};

struct IntegerCompressor {
    Encoder* enc = nullptr;
    U32 contexts = 0, bits_high = 8;
    U32 k = 0;
    std::vector<ArithmeticModel> mBits;
    ArithmeticBitModel mCorrector0;
    std::vector<ArithmeticModel> mCorrector;

    void init(Encoder* e, U32 n_contexts) {
        enc = e;
        contexts = n_contexts;
        mBits.resize(contexts);
        for (U32 c = 0; c < contexts; c++) mBits[c].init(33, true);
        mCorrector0.init();
        mCorrector.resize(33);
        for (U32 kk = 1; kk <= 32; kk++)
            mCorrector[kk].init(kk <= bits_high ? (1u << kk)
                                                : (1u << bits_high), true);
    }

    void writeCorrector(I32 c, ArithmeticModel& bits_model) {
        // tightest interval [-(2^k - 1), 2^k] containing c
        k = 0;
        U32 c1 = (U32)(c <= 0 ? -(I64)c : (I64)c - 1);
        while (c1) { c1 >>= 1; ++k; }
        enc->encodeSymbol(bits_model, k);
        if (k) {
            if (k < 32) {
                if (c >= 0) c -= 1;                  // [2^(k-1), 2^k - 1]
                else c += ((1 << k) - 1);            // [0, 2^(k-1) - 1]
                if (k <= bits_high) {
                    enc->encodeSymbol(mCorrector[k], (U32)c);
                } else {
                    U32 k1 = k - bits_high;
                    U32 clow = (U32)c & ((1u << k1) - 1);
                    enc->encodeSymbol(mCorrector[k], ((U32)c) >> k1);
                    enc->writeBits(k1, clow);
                }
            }
        } else {
            enc->encodeBit(mCorrector0, (U32)c);
        }
    }

    void compress(I32 pred, I32 real, U32 context) {
        I32 corr = (I32)((U32)real - (U32)pred);  // wrap mod 2^32
        writeCorrector(corr, mBits[context]);
    }
};

// ---------------------------------------------------------------------------
// StreamingMedian5 (laszip common_v2.hpp)
// ---------------------------------------------------------------------------

struct StreamingMedian5 {
    I32 values[5];
    bool high;

    void init() {
        values[0] = values[1] = values[2] = values[3] = values[4] = 0;
        high = true;
    }

    void add(I32 v) {
        if (high) {
            if (v < values[2]) {
                values[4] = values[3];
                values[3] = values[2];
                if (v < values[0]) {
                    values[2] = values[1]; values[1] = values[0]; values[0] = v;
                } else if (v < values[1]) {
                    values[2] = values[1]; values[1] = v;
                } else {
                    values[2] = v;
                }
            } else {
                if (v < values[3]) { values[4] = values[3]; values[3] = v; }
                else values[4] = v;
                high = false;
            }
        } else {
            if (values[2] < v) {
                values[0] = values[1];
                values[1] = values[2];
                if (values[4] < v) {
                    values[2] = values[3]; values[3] = values[4]; values[4] = v;
                } else if (values[3] < v) {
                    values[2] = values[3]; values[3] = v;
                } else {
                    values[2] = v;
                }
            } else {
                if (values[1] < v) { values[0] = values[1]; values[1] = v; }
                else values[0] = v;
                high = true;
            }
        }
    }

    I32 get() const { return values[2]; }
};

// number_return_map / number_return_level (laszip common_v2.hpp)
static const U8 number_return_map[8][8] = {
    {15, 14, 13, 12, 11, 10, 9, 8},
    {14, 0, 1, 3, 6, 10, 10, 9},
    {13, 1, 2, 4, 7, 11, 11, 10},
    {12, 3, 4, 5, 8, 12, 12, 11},
    {11, 6, 7, 8, 9, 13, 13, 12},
    {10, 10, 11, 12, 13, 14, 14, 13},
    {9, 10, 11, 12, 13, 14, 15, 14},
    {8, 9, 10, 11, 12, 13, 14, 15}};
static const U8 number_return_level[8][8] = {
    {0, 1, 2, 3, 4, 5, 6, 7},
    {1, 0, 1, 2, 3, 4, 5, 6},
    {2, 1, 0, 1, 2, 3, 4, 5},
    {3, 2, 1, 0, 1, 2, 3, 4},
    {4, 3, 2, 1, 0, 1, 2, 3},
    {5, 4, 3, 2, 1, 0, 1, 2},
    {6, 5, 4, 3, 2, 1, 0, 1},
    {7, 6, 5, 4, 3, 2, 1, 0}};

static inline U8 u8_fold(I32 n) { return (U8)(n & 0xFF); }

// raw POINT10 record layout (20 bytes, little-endian)
#pragma pack(push, 1)
struct Point10 {
    I32 x, y, z;
    U16 intensity;
    U8 flags;           // return_num:3 | num_returns:3 | scan_dir:1 | edge:1
    U8 classification;
    I8 scan_angle_rank;
    U8 user_data;
    U16 point_source_ID;
};
#pragma pack(pop)

// ---------------------------------------------------------------------------
// POINT10 v2 item codec (lasreaditemcompressed_v2.cpp POINT10)
// ---------------------------------------------------------------------------

struct Point10v2Decompressor {
    Decoder* dec;
    Point10 last;
    U16 last_intensity[16];
    StreamingMedian5 last_x_diff_median5[16], last_y_diff_median5[16];
    I32 last_height[8];
    ArithmeticModel m_changed_values;
    IntegerDecompressor ic_intensity;
    ArithmeticModel m_scan_angle_rank[2];
    IntegerDecompressor ic_point_source_ID;
    ArithmeticModel* m_bit_byte[256];
    ArithmeticModel* m_classification[256];
    ArithmeticModel* m_user_data[256];
    IntegerDecompressor ic_dx, ic_dy, ic_z;

    void init(Decoder* d, const U8* first_item) {
        dec = d;
        std::memcpy(&last, first_item, 20);
        for (int i = 0; i < 16; i++) {
            last_x_diff_median5[i].init();
            last_y_diff_median5[i].init();
            last_intensity[i] = 0;
        }
        for (int i = 0; i < 8; i++) last_height[i] = 0;
        m_changed_values.init(64, false);
        ic_intensity.init(dec, 4);
        m_scan_angle_rank[0].init(256, false);
        m_scan_angle_rank[1].init(256, false);
        ic_point_source_ID.init(dec, 1);
        for (int i = 0; i < 256; i++) {
            m_bit_byte[i] = m_classification[i] = m_user_data[i] = nullptr;
        }
        ic_dx.init(dec, 2);
        ic_dy.init(dec, 22);
        ic_z.init(dec, 20);
        // the raw first point seeds the intensity context 0 like laszip
        last_intensity[0] = last.intensity;
        last.intensity = last.intensity;  // keep raw
    }

    ~Point10v2Decompressor() {
        for (int i = 0; i < 256; i++) {
            delete m_bit_byte[i];
            delete m_classification[i];
            delete m_user_data[i];
        }
    }

    void read(U8* item) {
        U32 r, n, m, l, k_bits;
        I32 median, diff;

        U32 changed_values = dec->decodeSymbol(m_changed_values);
        if (changed_values) {
            if (changed_values & 32) {
                U8 b = last.flags;
                if (!m_bit_byte[b]) {
                    m_bit_byte[b] = new ArithmeticModel();
                    m_bit_byte[b]->init(256, false);
                }
                last.flags = (U8)dec->decodeSymbol(*m_bit_byte[b]);
            }
        }
        r = last.flags & 7u;
        n = (last.flags >> 3) & 7u;
        m = number_return_map[n][r];
        l = number_return_level[n][r];
        if (changed_values) {
            if (changed_values & 16) {
                U32 ctx = (m < 3 ? m : 3u);
                last.intensity = (U16)ic_intensity.decompress(
                    last_intensity[m], ctx);
                last_intensity[m] = last.intensity;
            } else {
                last.intensity = last_intensity[m];
            }
            if (changed_values & 8) {
                U8 c = last.classification;
                if (!m_classification[c]) {
                    m_classification[c] = new ArithmeticModel();
                    m_classification[c]->init(256, false);
                }
                last.classification =
                    (U8)dec->decodeSymbol(*m_classification[c]);
            }
            if (changed_values & 4) {
                U32 f = (last.flags >> 6) & 1u;  // scan_direction_flag
                I32 val = (I32)dec->decodeSymbol(m_scan_angle_rank[f]);
                last.scan_angle_rank =
                    (I8)u8_fold(val + (U8)last.scan_angle_rank);
            }
            if (changed_values & 2) {
                U8 u = last.user_data;
                if (!m_user_data[u]) {
                    m_user_data[u] = new ArithmeticModel();
                    m_user_data[u]->init(256, false);
                }
                last.user_data = (U8)dec->decodeSymbol(*m_user_data[u]);
            }
            if (changed_values & 1) {
                last.point_source_ID = (U16)ic_point_source_ID.decompress(
                    last.point_source_ID, 0);
            }
        } else {
            last.intensity = last_intensity[m];
        }

        // x
        median = last_x_diff_median5[m].get();
        diff = ic_dx.decompress(median, n == 1);
        last.x += diff;
        last_x_diff_median5[m].add(diff);

        // y
        median = last_y_diff_median5[m].get();
        k_bits = ic_dx.k;
        diff = ic_dy.decompress(
            median, (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20u));
        last.y += diff;
        last_y_diff_median5[m].add(diff);

        // z
        k_bits = (ic_dx.k + ic_dy.k) / 2;
        last.z = ic_z.decompress(
            last_height[l], (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18u));
        last_height[l] = last.z;

        std::memcpy(item, &last, 20);
    }
};

struct Point10v2Compressor {
    Encoder* enc;
    Point10 last;
    U16 last_intensity[16];
    StreamingMedian5 last_x_diff_median5[16], last_y_diff_median5[16];
    I32 last_height[8];
    ArithmeticModel m_changed_values;
    IntegerCompressor ic_intensity;
    ArithmeticModel m_scan_angle_rank[2];
    IntegerCompressor ic_point_source_ID;
    ArithmeticModel* m_bit_byte[256];
    ArithmeticModel* m_classification[256];
    ArithmeticModel* m_user_data[256];
    IntegerCompressor ic_dx, ic_dy, ic_z;

    void init(Encoder* e, const U8* first_item) {
        enc = e;
        std::memcpy(&last, first_item, 20);
        for (int i = 0; i < 16; i++) {
            last_x_diff_median5[i].init();
            last_y_diff_median5[i].init();
            last_intensity[i] = 0;
        }
        for (int i = 0; i < 8; i++) last_height[i] = 0;
        m_changed_values.init(64, true);
        ic_intensity.init(enc, 4);
        m_scan_angle_rank[0].init(256, true);
        m_scan_angle_rank[1].init(256, true);
        ic_point_source_ID.init(enc, 1);
        for (int i = 0; i < 256; i++) {
            m_bit_byte[i] = m_classification[i] = m_user_data[i] = nullptr;
        }
        ic_dx.init(enc, 2);
        ic_dy.init(enc, 22);
        ic_z.init(enc, 20);
        last_intensity[0] = last.intensity;
    }

    ~Point10v2Compressor() {
        for (int i = 0; i < 256; i++) {
            delete m_bit_byte[i];
            delete m_classification[i];
            delete m_user_data[i];
        }
    }

    void write(const U8* item) {
        Point10 cur;
        std::memcpy(&cur, item, 20);
        U32 r = cur.flags & 7u;
        U32 n = (cur.flags >> 3) & 7u;
        U32 m = number_return_map[n][r];
        U32 l = number_return_level[n][r];

        U32 changed_values =
            (((U32)(last.flags != cur.flags)) << 5) |
            (((U32)(last_intensity[m] != cur.intensity)) << 4) |
            (((U32)(last.classification != cur.classification)) << 3) |
            (((U32)(last.scan_angle_rank != cur.scan_angle_rank)) << 2) |
            (((U32)(last.user_data != cur.user_data)) << 1) |
            ((U32)(last.point_source_ID != cur.point_source_ID));
        // NOTE: the flags/returns must be updated BEFORE m is used for the
        // intensity context on the decode side — mirror that order here by
        // computing m from cur (the decoder recomputes r/n/m/l after
        // decoding the new flags byte).
        enc->encodeSymbol(m_changed_values, changed_values);
        if (changed_values) {
            if (changed_values & 32) {
                U8 b = last.flags;
                if (!m_bit_byte[b]) {
                    m_bit_byte[b] = new ArithmeticModel();
                    m_bit_byte[b]->init(256, true);
                }
                enc->encodeSymbol(*m_bit_byte[b], cur.flags);
            }
            if (changed_values & 16) {
                U32 ctx = (m < 3 ? m : 3u);
                ic_intensity.compress(last_intensity[m], cur.intensity, ctx);
                last_intensity[m] = cur.intensity;
            }
            if (changed_values & 8) {
                U8 c = last.classification;
                if (!m_classification[c]) {
                    m_classification[c] = new ArithmeticModel();
                    m_classification[c]->init(256, true);
                }
                enc->encodeSymbol(*m_classification[c], cur.classification);
            }
            if (changed_values & 4) {
                U32 f = (cur.flags >> 6) & 1u;
                // encode the difference modulo 256 (decoder folds back)
                U32 val = (U8)(cur.scan_angle_rank - last.scan_angle_rank);
                enc->encodeSymbol(m_scan_angle_rank[f], val);
            }
            if (changed_values & 2) {
                U8 u = last.user_data;
                if (!m_user_data[u]) {
                    m_user_data[u] = new ArithmeticModel();
                    m_user_data[u]->init(256, true);
                }
                enc->encodeSymbol(*m_user_data[u], cur.user_data);
            }
            if (changed_values & 1) {
                ic_point_source_ID.compress(last.point_source_ID,
                                            cur.point_source_ID, 0);
            }
        }

        I32 median, diff;
        // x — laszip passes (pred=median, real=diff): the corrector is
        // diff - median
        median = last_x_diff_median5[m].get();
        diff = (I32)((U32)cur.x - (U32)last.x);
        ic_dx.compress(median, diff, n == 1);
        last_x_diff_median5[m].add(diff);
        last.x = cur.x;

        // y
        median = last_y_diff_median5[m].get();
        diff = (I32)((U32)cur.y - (U32)last.y);
        U32 k_bits = ic_dx.k;
        ic_dy.compress(median, diff,
                       (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20u));
        last_y_diff_median5[m].add(diff);
        last.y = cur.y;

        // z
        k_bits = (ic_dx.k + ic_dy.k) / 2;
        ic_z.compress(last_height[l], cur.z,
                      (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18u));
        last_height[l] = cur.z;
        last.z = cur.z;

        last.flags = cur.flags;
        last.intensity = cur.intensity;
        last.classification = cur.classification;
        last.scan_angle_rank = cur.scan_angle_rank;
        last.user_data = cur.user_data;
        last.point_source_ID = cur.point_source_ID;
    }
};

// ---------------------------------------------------------------------------
// GPSTIME11 v2 item codec
// ---------------------------------------------------------------------------

static const I32 GPSTIME_MULTI = 500;
static const I32 GPSTIME_MULTI_MINUS = -10;
static const I32 GPSTIME_MULTI_UNCHANGED =
    (GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 1);
static const I32 GPSTIME_MULTI_CODE_FULL =
    (GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 2);
static const I32 GPSTIME_MULTI_TOTAL =
    (GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 6);

union U64I64F64 {
    U64 u64;
    I64 i64;
    double f64;
};

struct GpsTime11v2Decompressor {
    Decoder* dec;
    U32 last = 0, next = 0;
    U64I64F64 last_gpstime[4];
    I32 last_gpstime_diff[4];
    I32 multi_extreme_counter[4];
    ArithmeticModel m_gpstime_multi, m_gpstime_0diff;
    IntegerDecompressor ic_gpstime;

    void init(Decoder* d, const U8* first_item) {
        dec = d;
        last = next = 0;
        for (int i = 0; i < 4; i++) {
            last_gpstime[i].u64 = 0;
            last_gpstime_diff[i] = 0;
            multi_extreme_counter[i] = 0;
        }
        std::memcpy(&last_gpstime[0].u64, first_item, 8);
        m_gpstime_multi.init(GPSTIME_MULTI_TOTAL, false);
        m_gpstime_0diff.init(6, false);
        ic_gpstime.init(dec, 9);
    }

    void read(U8* item) {
        I32 multi;
        if (last_gpstime_diff[last] == 0) {
            multi = (I32)dec->decodeSymbol(m_gpstime_0diff);
            if (multi == 1) {  // the difference fits in 32 bits
                last_gpstime_diff[last] = ic_gpstime.decompress(0, 0);
                last_gpstime[last].i64 += last_gpstime_diff[last];
                multi_extreme_counter[last] = 0;
            } else if (multi == 2) {  // the difference is huge
                next = (next + 1) & 3;
                last_gpstime[next].u64 = (U64)(I64)ic_gpstime.decompress(
                    (I32)(last_gpstime[last].u64 >> 32), 8);
                last_gpstime[next].u64 <<= 32;
                last_gpstime[next].u64 |= dec->readInt();
                last = next;
                last_gpstime_diff[last] = 0;
                multi_extreme_counter[last] = 0;
            } else if (multi > 2) {  // switch to another sequence
                last = (last + multi - 2) & 3;
                read(item);
                return;
            }
        } else {
            multi = (I32)dec->decodeSymbol(m_gpstime_multi);
            if (multi == 1) {
                last_gpstime[last].i64 += ic_gpstime.decompress(
                    last_gpstime_diff[last], 1);
                multi_extreme_counter[last] = 0;
            } else if (multi < GPSTIME_MULTI_UNCHANGED) {
                I32 gpstime_diff;
                if (multi == 0) {
                    gpstime_diff = ic_gpstime.decompress(0, 7);
                    multi_extreme_counter[last]++;
                    if (multi_extreme_counter[last] > 3) {
                        last_gpstime_diff[last] = gpstime_diff;
                        multi_extreme_counter[last] = 0;
                    }
                } else if (multi < GPSTIME_MULTI) {
                    if (multi < 10)
                        gpstime_diff = ic_gpstime.decompress(
                            multi * last_gpstime_diff[last], 2);
                    else
                        gpstime_diff = ic_gpstime.decompress(
                            multi * last_gpstime_diff[last], 3);
                } else if (multi == GPSTIME_MULTI) {
                    gpstime_diff = ic_gpstime.decompress(
                        GPSTIME_MULTI * last_gpstime_diff[last], 4);
                    multi_extreme_counter[last]++;
                    if (multi_extreme_counter[last] > 3) {
                        last_gpstime_diff[last] = gpstime_diff;
                        multi_extreme_counter[last] = 0;
                    }
                } else {
                    multi = GPSTIME_MULTI - multi;  // negative multiplier
                    if (multi > GPSTIME_MULTI_MINUS) {
                        gpstime_diff = ic_gpstime.decompress(
                            multi * last_gpstime_diff[last], 5);
                    } else {
                        gpstime_diff = ic_gpstime.decompress(
                            GPSTIME_MULTI_MINUS * last_gpstime_diff[last], 6);
                        multi_extreme_counter[last]++;
                        if (multi_extreme_counter[last] > 3) {
                            last_gpstime_diff[last] = gpstime_diff;
                            multi_extreme_counter[last] = 0;
                        }
                    }
                }
                last_gpstime[last].i64 += gpstime_diff;
            } else if (multi == GPSTIME_MULTI_CODE_FULL) {
                next = (next + 1) & 3;
                last_gpstime[next].u64 = (U64)(I64)ic_gpstime.decompress(
                    (I32)(last_gpstime[last].u64 >> 32), 8);
                last_gpstime[next].u64 <<= 32;
                last_gpstime[next].u64 |= dec->readInt();
                last = next;
                last_gpstime_diff[last] = 0;
                multi_extreme_counter[last] = 0;
            } else if (multi >= GPSTIME_MULTI_CODE_FULL) {
                last = (last + multi - GPSTIME_MULTI_CODE_FULL) & 3;
                read(item);
                return;
            }
        }
        std::memcpy(item, &last_gpstime[last].u64, 8);
    }
};

struct GpsTime11v2Compressor {
    Encoder* enc;
    U32 last = 0, next = 0;
    U64I64F64 last_gpstime[4];
    I32 last_gpstime_diff[4];
    I32 multi_extreme_counter[4];
    ArithmeticModel m_gpstime_multi, m_gpstime_0diff;
    IntegerCompressor ic_gpstime;

    void init(Encoder* e, const U8* first_item) {
        enc = e;
        last = next = 0;
        for (int i = 0; i < 4; i++) {
            last_gpstime[i].u64 = 0;
            last_gpstime_diff[i] = 0;
            multi_extreme_counter[i] = 0;
        }
        std::memcpy(&last_gpstime[0].u64, first_item, 8);
        m_gpstime_multi.init(GPSTIME_MULTI_TOTAL, true);
        m_gpstime_0diff.init(6, true);
        ic_gpstime.init(enc, 9);
    }

    void write(const U8* item) {
        U64I64F64 cur;
        std::memcpy(&cur.u64, item, 8);

        if (last_gpstime_diff[last] == 0) {
            if (cur.i64 == last_gpstime[last].i64) {
                enc->encodeSymbol(m_gpstime_0diff, 0);  // unchanged
                return;
            }
            // calculate the difference between the two doubles as an integer
            I64 curr_gpstime_diff_64 = cur.i64 - last_gpstime[last].i64;
            I32 curr_gpstime_diff = (I32)curr_gpstime_diff_64;
            if (curr_gpstime_diff_64 == (I64)curr_gpstime_diff) {
                enc->encodeSymbol(m_gpstime_0diff, 1);  // fits in 32 bits
                ic_gpstime.compress(0, curr_gpstime_diff, 0);
                last_gpstime_diff[last] = curr_gpstime_diff;
                multi_extreme_counter[last] = 0;
                last_gpstime[last].i64 = cur.i64;
            } else {
                // look for a previous sequence that matches
                for (U32 i = 1; i < 4; i++) {
                    I64 other_diff = cur.i64 - last_gpstime[(last + i) & 3].i64;
                    if (other_diff == (I64)(I32)other_diff) {
                        enc->encodeSymbol(m_gpstime_0diff, i + 2);
                        last = (last + i) & 3;
                        write(item);
                        return;
                    }
                }
                enc->encodeSymbol(m_gpstime_0diff, 2);  // full
                ic_gpstime.compress((I32)(last_gpstime[last].u64 >> 32),
                                    (I32)(cur.u64 >> 32), 8);
                enc->writeInt((U32)(cur.u64 & 0xFFFFFFFFu));
                next = (next + 1) & 3;
                last = next;
                last_gpstime_diff[last] = 0;
                multi_extreme_counter[last] = 0;
                last_gpstime[last].i64 = cur.i64;
            }
        } else {
            if (cur.i64 == last_gpstime[last].i64) {
                // unchanged: symbol meaning multiplier "unchanged"
                enc->encodeSymbol(m_gpstime_multi, GPSTIME_MULTI_UNCHANGED);
                return;
            }
            I64 curr_gpstime_diff_64 = cur.i64 - last_gpstime[last].i64;
            I32 curr_gpstime_diff = (I32)curr_gpstime_diff_64;
            if (curr_gpstime_diff_64 == (I64)curr_gpstime_diff) {
                // compute multiplier between current and last difference
                double multi_f = (double)curr_gpstime_diff /
                                 (double)last_gpstime_diff[last];
                I32 multi = (I32)(multi_f < 0 ? multi_f - 0.5 : multi_f + 0.5);
                if (multi == 1) {
                    enc->encodeSymbol(m_gpstime_multi, 1);
                    ic_gpstime.compress(last_gpstime_diff[last],
                                        curr_gpstime_diff, 1);
                    multi_extreme_counter[last] = 0;
                } else if (multi > 0) {
                    if (multi < GPSTIME_MULTI) {
                        enc->encodeSymbol(m_gpstime_multi, multi);
                        if (multi < 10)
                            ic_gpstime.compress(
                                multi * last_gpstime_diff[last],
                                curr_gpstime_diff, 2);
                        else
                            ic_gpstime.compress(
                                multi * last_gpstime_diff[last],
                                curr_gpstime_diff, 3);
                    } else {
                        enc->encodeSymbol(m_gpstime_multi, GPSTIME_MULTI);
                        ic_gpstime.compress(
                            GPSTIME_MULTI * last_gpstime_diff[last],
                            curr_gpstime_diff, 4);
                        multi_extreme_counter[last]++;
                        if (multi_extreme_counter[last] > 3) {
                            last_gpstime_diff[last] = curr_gpstime_diff;
                            multi_extreme_counter[last] = 0;
                        }
                    }
                } else if (multi < 0) {
                    if (multi > GPSTIME_MULTI_MINUS) {
                        enc->encodeSymbol(m_gpstime_multi,
                                          GPSTIME_MULTI - multi);
                        ic_gpstime.compress(
                            multi * last_gpstime_diff[last],
                            curr_gpstime_diff, 5);
                    } else {
                        enc->encodeSymbol(
                            m_gpstime_multi,
                            GPSTIME_MULTI - GPSTIME_MULTI_MINUS);
                        ic_gpstime.compress(
                            GPSTIME_MULTI_MINUS * last_gpstime_diff[last],
                            curr_gpstime_diff, 6);
                        multi_extreme_counter[last]++;
                        if (multi_extreme_counter[last] > 3) {
                            last_gpstime_diff[last] = curr_gpstime_diff;
                            multi_extreme_counter[last] = 0;
                        }
                    }
                } else {  // multi == 0
                    enc->encodeSymbol(m_gpstime_multi, 0);
                    ic_gpstime.compress(0, curr_gpstime_diff, 7);
                    multi_extreme_counter[last]++;
                    if (multi_extreme_counter[last] > 3) {
                        last_gpstime_diff[last] = curr_gpstime_diff;
                        multi_extreme_counter[last] = 0;
                    }
                }
                last_gpstime[last].i64 = cur.i64;
            } else {
                // the difference is huge: look for matching sequence first
                for (U32 i = 1; i < 4; i++) {
                    I64 other_diff = cur.i64 - last_gpstime[(last + i) & 3].i64;
                    if (other_diff == (I64)(I32)other_diff) {
                        enc->encodeSymbol(m_gpstime_multi,
                                          GPSTIME_MULTI_CODE_FULL + i);
                        last = (last + i) & 3;
                        write(item);
                        return;
                    }
                }
                enc->encodeSymbol(m_gpstime_multi, GPSTIME_MULTI_CODE_FULL);
                ic_gpstime.compress((I32)(last_gpstime[last].u64 >> 32),
                                    (I32)(cur.u64 >> 32), 8);
                enc->writeInt((U32)(cur.u64 & 0xFFFFFFFFu));
                next = (next + 1) & 3;
                last = next;
                last_gpstime_diff[last] = 0;
                multi_extreme_counter[last] = 0;
                last_gpstime[last].i64 = cur.i64;
            }
        }
    }
};

// ---------------------------------------------------------------------------
// RGB12 v2 item codec
// ---------------------------------------------------------------------------

struct Rgb12v2Decompressor {
    Decoder* dec;
    U16 last[3];
    ArithmeticModel m_byte_used, m_rgb_diff_0, m_rgb_diff_1, m_rgb_diff_2,
        m_rgb_diff_3, m_rgb_diff_4, m_rgb_diff_5;

    void init(Decoder* d, const U8* first_item) {
        dec = d;
        std::memcpy(last, first_item, 6);
        m_byte_used.init(128, false);
        m_rgb_diff_0.init(256, false);
        m_rgb_diff_1.init(256, false);
        m_rgb_diff_2.init(256, false);
        m_rgb_diff_3.init(256, false);
        m_rgb_diff_4.init(256, false);
        m_rgb_diff_5.init(256, false);
    }

    void read(U8* item) {
        U8 corr;
        I32 diff = 0;
        U32 sym = dec->decodeSymbol(m_byte_used);
        U16 rgb[3];
        if (sym & 1) {
            corr = (U8)dec->decodeSymbol(m_rgb_diff_0);
            rgb[0] = (U16)u8_fold(corr + (last[0] & 255));
        } else {
            rgb[0] = last[0] & 0xFF;
        }
        if (sym & 2) {
            corr = (U8)dec->decodeSymbol(m_rgb_diff_1);
            rgb[0] |= ((U16)u8_fold(corr + (last[0] >> 8))) << 8;
        } else {
            rgb[0] |= last[0] & 0xFF00;
        }
        if (sym & 64) {
            diff = (rgb[0] & 0x00FF) - (last[0] & 0x00FF);
            if (sym & 4) {
                corr = (U8)dec->decodeSymbol(m_rgb_diff_2);
                rgb[1] = (U16)u8_fold(
                    corr + clamp8(diff + (last[1] & 255)));
            } else {
                rgb[1] = last[1] & 0xFF;
            }
            if (sym & 16) {
                corr = (U8)dec->decodeSymbol(m_rgb_diff_4);
                diff = (diff + ((rgb[1] & 0x00FF) - (last[1] & 0x00FF))) / 2;
                rgb[2] = (U16)u8_fold(corr + clamp8(diff + (last[2] & 255)));
            } else {
                rgb[2] = last[2] & 0xFF;
            }
            diff = (rgb[0] >> 8) - (last[0] >> 8);
            if (sym & 8) {
                corr = (U8)dec->decodeSymbol(m_rgb_diff_3);
                rgb[1] |= ((U16)u8_fold(
                              corr + clamp8(diff + (last[1] >> 8)))) << 8;
            } else {
                rgb[1] |= last[1] & 0xFF00;
            }
            if (sym & 32) {
                corr = (U8)dec->decodeSymbol(m_rgb_diff_5);
                diff = (diff + ((rgb[1] >> 8) - (last[1] >> 8))) / 2;
                rgb[2] |= ((U16)u8_fold(
                              corr + clamp8(diff + (last[2] >> 8)))) << 8;
            } else {
                rgb[2] |= last[2] & 0xFF00;
            }
        } else {
            rgb[1] = rgb[0];
            rgb[2] = rgb[0];
        }
        std::memcpy(last, rgb, 6);
        std::memcpy(item, rgb, 6);
    }

    static I32 clamp8(I32 v) { return v < 0 ? 0 : (v > 255 ? 255 : v); }
};

struct Rgb12v2Compressor {
    Encoder* enc;
    U16 last[3];
    ArithmeticModel m_byte_used, m_rgb_diff_0, m_rgb_diff_1, m_rgb_diff_2,
        m_rgb_diff_3, m_rgb_diff_4, m_rgb_diff_5;

    void init(Encoder* e, const U8* first_item) {
        enc = e;
        std::memcpy(last, first_item, 6);
        m_byte_used.init(128, true);
        m_rgb_diff_0.init(256, true);
        m_rgb_diff_1.init(256, true);
        m_rgb_diff_2.init(256, true);
        m_rgb_diff_3.init(256, true);
        m_rgb_diff_4.init(256, true);
        m_rgb_diff_5.init(256, true);
    }

    void write(const U8* item) {
        U16 rgb[3];
        std::memcpy(rgb, item, 6);
        I32 diff_l = 0, diff_h = 0;
        U32 sym = (((last[0] & 0x00FF) != (rgb[0] & 0x00FF)) << 0) |
                  (((last[0] & 0xFF00) != (rgb[0] & 0xFF00)) << 1) |
                  (((last[1] & 0x00FF) != (rgb[1] & 0x00FF)) << 2) |
                  (((last[1] & 0xFF00) != (rgb[1] & 0xFF00)) << 3) |
                  (((last[2] & 0x00FF) != (rgb[2] & 0x00FF)) << 4) |
                  (((last[2] & 0xFF00) != (rgb[2] & 0xFF00)) << 5) |
                  ((((rgb[0] & 0x00FF) != (rgb[1] & 0x00FF)) ||
                    ((rgb[0] & 0x00FF) != (rgb[2] & 0x00FF)) ||
                    ((rgb[0] & 0xFF00) != (rgb[1] & 0xFF00)) ||
                    ((rgb[0] & 0xFF00) != (rgb[2] & 0xFF00))) << 6);
        enc->encodeSymbol(m_byte_used, sym);
        if (sym & 1) {
            diff_l = (rgb[0] & 255) - (last[0] & 255);
            enc->encodeSymbol(m_rgb_diff_0, (U8)diff_l);
        }
        if (sym & 2) {
            diff_h = (rgb[0] >> 8) - (last[0] >> 8);
            enc->encodeSymbol(m_rgb_diff_1, (U8)diff_h);
        }
        if (sym & 64) {
            if (sym & 4) {
                I32 corr = (rgb[1] & 255) -
                    Rgb12v2Decompressor::clamp8(diff_l + (last[1] & 255));
                enc->encodeSymbol(m_rgb_diff_2, (U8)corr);
            }
            if (sym & 16) {
                diff_l = (diff_l + (rgb[1] & 255) - (last[1] & 255)) / 2;
                I32 corr = (rgb[2] & 255) -
                    Rgb12v2Decompressor::clamp8(diff_l + (last[2] & 255));
                enc->encodeSymbol(m_rgb_diff_4, (U8)corr);
            }
            if (sym & 8) {
                I32 corr = (rgb[1] >> 8) -
                    Rgb12v2Decompressor::clamp8(diff_h + (last[1] >> 8));
                enc->encodeSymbol(m_rgb_diff_3, (U8)corr);
            }
            if (sym & 32) {
                diff_h = (diff_h + (rgb[1] >> 8) - (last[1] >> 8)) / 2;
                I32 corr = (rgb[2] >> 8) -
                    Rgb12v2Decompressor::clamp8(diff_h + (last[2] >> 8));
                enc->encodeSymbol(m_rgb_diff_5, (U8)corr);
            }
        }
        std::memcpy(last, rgb, 6);
    }
};

// ---------------------------------------------------------------------------
// BYTE v2 item codec (extra bytes; one 256-symbol model per byte)
// ---------------------------------------------------------------------------

struct Byte2Decompressor {
    Decoder* dec;
    U32 number = 0;
    std::vector<U8> last;
    std::vector<ArithmeticModel> m_byte;

    void init(Decoder* d, const U8* first_item, U32 n) {
        dec = d;
        number = n;
        last.assign(first_item, first_item + n);
        m_byte.resize(n);
        for (U32 i = 0; i < n; i++) m_byte[i].init(256, false);
    }

    void read(U8* item) {
        for (U32 i = 0; i < number; i++) {
            I32 val = (I32)dec->decodeSymbol(m_byte[i]);
            item[i] = u8_fold(val + last[i]);
        }
        std::memcpy(last.data(), item, number);
    }
};

struct Byte2Compressor {
    Encoder* enc;
    U32 number = 0;
    std::vector<U8> last;
    std::vector<ArithmeticModel> m_byte;

    void init(Encoder* e, const U8* first_item, U32 n) {
        enc = e;
        number = n;
        last.assign(first_item, first_item + n);
        m_byte.resize(n);
        for (U32 i = 0; i < n; i++) m_byte[i].init(256, true);
    }

    void write(const U8* item) {
        for (U32 i = 0; i < number; i++) {
            U32 diff = (U8)(item[i] - last[i]);
            enc->encodeSymbol(m_byte[i], diff);
        }
        std::memcpy(last.data(), item, number);
    }
};

// ---------------------------------------------------------------------------
// Chunked stream codecs over an item schema
// ---------------------------------------------------------------------------

// item type ids (LASzip laszip.hpp)
enum ItemType : U16 {
    ITEM_BYTE = 0,
    ITEM_POINT10 = 6,
    ITEM_GPSTIME11 = 7,
    ITEM_RGB12 = 8,
};

struct Schema {
    // parallel arrays: type, size (BYTE items carry their byte count)
    std::vector<U16> types;
    std::vector<U16> sizes;

    U32 record_size() const {
        U32 s = 0;
        for (U16 z : sizes) s += z;
        return s;
    }
};

}  // namespace laz

using namespace laz;

extern "C" {

// Decompress a LAZ point blob (compressor 2, pointwise chunked, v2 items).
//
// in:  compressed bytes beginning at the LAS "offset to point data", i.e.
//      starting with the i64 chunk-table offset (ABSOLUTE file offset;
//      point_data_offset converts it to a blob-relative position)
// schema: item (type, size) pairs; n_items entries
// out: n_points * record_size bytes of raw little-endian point records
// Returns 0 on success, negative error code otherwise.
//
// Chunk boundaries: the arithmetic decoder reads a few bytes past each
// chunk's payload (4-byte lookahead), so multi-chunk streams are
// repositioned from the chunk table (u32 version 0, u32 n_chunks, then
// chunk byte counts compressed with IntegerCompressor(32,2) ctx 1) — the
// same recovery real LASzip readers perform.
int64_t laz_decompress(const uint8_t* in, int64_t in_len,
                       const uint16_t* item_types, const uint16_t* item_sizes,
                       int64_t n_items, int64_t n_points, int64_t chunk_size,
                       int64_t point_data_offset, uint8_t* out) {
    if (n_points == 0) return 0;
    Schema schema;
    for (int64_t i = 0; i < n_items; i++) {
        schema.types.push_back(item_types[i]);
        schema.sizes.push_back(item_sizes[i]);
    }
    const U32 rec = schema.record_size();
    if (in_len < 8) return -1;
    const U8* p = in + 8;
    const U8* p_end = in + in_len;

    // chunk starts from the chunk table (needed when n_points > chunk_size)
    std::vector<const U8*> chunk_start;
    if (chunk_size > 0 && n_points > chunk_size) {
        I64 table_abs;
        std::memcpy(&table_abs, in, 8);
        I64 table_rel = table_abs - point_data_offset;
        if (table_rel < 8 || table_rel + 8 > in_len) return -5;
        const U8* t = in + table_rel;
        U32 version, n_chunks;
        std::memcpy(&version, t, 4);
        std::memcpy(&n_chunks, t + 4, 4);
        if (version != 0) return -5;
        Decoder tdec;
        tdec.in = t + 8;
        tdec.in_end = p_end;
        tdec.init();
        IntegerDecompressor tic;
        tic.init(&tdec, 2);
        const U8* pos = in + 8;
        I32 prev = 0;
        for (U32 i = 0; i < n_chunks; i++) {
            chunk_start.push_back(pos);
            I32 bytes = tic.decompress(prev, 1);
            prev = bytes;
            pos += bytes;
        }
    }

    int64_t done = 0;
    size_t ci = 0;
    while (done < n_points) {
        int64_t this_chunk = n_points - done;
        if (chunk_size > 0 && this_chunk > chunk_size) this_chunk = chunk_size;
        if (!chunk_start.empty()) {
            if (ci >= chunk_start.size()) return -6;
            p = chunk_start[ci++];
        }

        // first point of the chunk is raw
        if (p + rec > p_end) return -2;
        std::memcpy(out + done * rec, p, rec);
        p += rec;

        Decoder dec;
        dec.in = p;
        dec.in_end = p_end;
        dec.init();

        // per-item codecs seeded with the raw first record
        Point10v2Decompressor* d_pt = nullptr;
        GpsTime11v2Decompressor* d_gps = nullptr;
        Rgb12v2Decompressor* d_rgb = nullptr;
        std::vector<Byte2Decompressor*> d_bytes;
        {
            const U8* item = out + done * rec;
            for (size_t i = 0; i < schema.types.size(); i++) {
                switch (schema.types[i]) {
                case ITEM_POINT10:
                    d_pt = new Point10v2Decompressor();
                    d_pt->init(&dec, item);
                    break;
                case ITEM_GPSTIME11:
                    d_gps = new GpsTime11v2Decompressor();
                    d_gps->init(&dec, item);
                    break;
                case ITEM_RGB12:
                    d_rgb = new Rgb12v2Decompressor();
                    d_rgb->init(&dec, item);
                    break;
                case ITEM_BYTE: {
                    Byte2Decompressor* b = new Byte2Decompressor();
                    b->init(&dec, item, schema.sizes[i]);
                    d_bytes.push_back(b);
                    break;
                }
                default:
                    delete d_pt; delete d_gps; delete d_rgb;
                    for (auto* b : d_bytes) delete b;
                    return -3;  // unsupported item
                }
                item += schema.sizes[i];
            }
        }

        for (int64_t j = 1; j < this_chunk; j++) {
            U8* item = out + (done + j) * rec;
            size_t bi = 0;
            for (size_t i = 0; i < schema.types.size(); i++) {
                switch (schema.types[i]) {
                case ITEM_POINT10: d_pt->read(item); break;
                case ITEM_GPSTIME11: d_gps->read(item); break;
                case ITEM_RGB12: d_rgb->read(item); break;
                case ITEM_BYTE: d_bytes[bi++]->read(item); break;
                }
                item += schema.sizes[i];
            }
        }
        delete d_pt;
        delete d_gps;
        delete d_rgb;
        for (auto* b : d_bytes) delete b;

        // decoder consumed bytes up to dec.in; continue there
        p = dec.in;
        done += this_chunk;
    }
    return 0;
}

// Compress raw point records into a LAZ point blob (chunk-table offset +
// chunks; a minimal chunk table is appended). out_cap must be generous
// (records + header slack); returns the number of bytes written, or a
// negative error code.
int64_t laz_compress(const uint8_t* in, int64_t n_points,
                     const uint16_t* item_types, const uint16_t* item_sizes,
                     int64_t n_items, int64_t chunk_size, uint8_t* out,
                     int64_t out_cap) {
    Schema schema;
    for (int64_t i = 0; i < n_items; i++) {
        schema.types.push_back(item_types[i]);
        schema.sizes.push_back(item_sizes[i]);
    }
    const U32 rec = schema.record_size();

    std::vector<U8> blob;
    blob.resize(8, 0);  // chunk table offset placeholder
    std::vector<U32> chunk_bytes;

    int64_t done = 0;
    while (done < n_points) {
        int64_t this_chunk = n_points - done;
        if (chunk_size > 0 && this_chunk > chunk_size) this_chunk = chunk_size;
        size_t chunk_start = blob.size();

        // raw first record
        blob.insert(blob.end(), in + done * rec, in + (done + 1) * rec);

        Encoder enc;
        enc.init();
        Point10v2Compressor* c_pt = nullptr;
        GpsTime11v2Compressor* c_gps = nullptr;
        Rgb12v2Compressor* c_rgb = nullptr;
        std::vector<Byte2Compressor*> c_bytes;
        {
            const U8* item = in + done * rec;
            for (size_t i = 0; i < schema.types.size(); i++) {
                switch (schema.types[i]) {
                case ITEM_POINT10:
                    c_pt = new Point10v2Compressor();
                    c_pt->init(&enc, item);
                    break;
                case ITEM_GPSTIME11:
                    c_gps = new GpsTime11v2Compressor();
                    c_gps->init(&enc, item);
                    break;
                case ITEM_RGB12:
                    c_rgb = new Rgb12v2Compressor();
                    c_rgb->init(&enc, item);
                    break;
                case ITEM_BYTE: {
                    Byte2Compressor* b = new Byte2Compressor();
                    b->init(&enc, item, schema.sizes[i]);
                    c_bytes.push_back(b);
                    break;
                }
                default:
                    delete c_pt; delete c_gps; delete c_rgb;
                    for (auto* b : c_bytes) delete b;
                    return -3;
                }
                item += schema.sizes[i];
            }
        }
        for (int64_t j = 1; j < this_chunk; j++) {
            const U8* item = in + (done + j) * rec;
            size_t bi = 0;
            for (size_t i = 0; i < schema.types.size(); i++) {
                switch (schema.types[i]) {
                case ITEM_POINT10: c_pt->write(item); break;
                case ITEM_GPSTIME11: c_gps->write(item); break;
                case ITEM_RGB12: c_rgb->write(item); break;
                case ITEM_BYTE: c_bytes[bi++]->write(item); break;
                }
                item += schema.sizes[i];
            }
        }
        enc.done();
        delete c_pt;
        delete c_gps;
        delete c_rgb;
        for (auto* b : c_bytes) delete b;

        blob.insert(blob.end(), enc.out.begin(), enc.out.end());
        chunk_bytes.push_back((U32)(blob.size() - chunk_start));
        done += this_chunk;
    }

    // chunk table, LASzip layout: u32 version(0), u32 number_chunks, then
    // the chunk byte-counts compressed with IntegerCompressor(32, 2)
    // context 1, each predicted by its predecessor. (Our own reader decodes
    // sequentially and skips the table; it is written for conformance with
    // random-access LASzip readers.)
    U64 table_off = blob.size();  // relative; caller patches to absolute
    std::memcpy(blob.data(), &table_off, 8);
    U32 version = 0;
    U32 n_chunks = (U32)chunk_bytes.size();
    blob.insert(blob.end(), (U8*)&version, (U8*)&version + 4);
    blob.insert(blob.end(), (U8*)&n_chunks, (U8*)&n_chunks + 4);
    {
        Encoder tenc;
        tenc.init();
        IntegerCompressor tic;
        tic.init(&tenc, 2);
        for (U32 i = 0; i < n_chunks; i++)
            tic.compress(i ? (I32)chunk_bytes[i - 1] : 0,
                         (I32)chunk_bytes[i], 1);
        tenc.done();
        blob.insert(blob.end(), tenc.out.begin(), tenc.out.end());
    }

    if ((int64_t)blob.size() > out_cap) return -4;
    std::memcpy(out, blob.data(), blob.size());
    return (int64_t)blob.size();
}

}  // extern "C"
