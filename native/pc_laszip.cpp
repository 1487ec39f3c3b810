// pc_laszip: LASzip 2.x codec (decompressor + compressor) for LAZ point
// clouds — point data record formats 0-3 (+ extra bytes).
//
// Implements the published LASzip algorithm (Isenburg, "LASzip: lossless
// compression of LiDAR data", 2013; reference capability anchor:
// point-converter/src/converter/las.rs:22-55, whose `las` crate links the
// laz-rs port of the same scheme): the FastAC adaptive arithmetic coder
// (Said, 2004), the k-bit IntegerCompressor, and the v2 item codecs
// POINT10 / GPSTIME11 / RGB12 / BYTE with streaming-median XY prediction.
//
// Both directions ship so the test suite can round-trip .las <-> .laz
// in-tree (this environment has no laszip binary and no network to fetch
// golden .laz fixtures; cross-validation against laszip-generated files is
// the remaining certification step, see docs/PARITY.md).
//
// Layout contract with point_cloud_tpu/io/laz.py (which owns headers,
// VLRs and the chunk framing):
//   pc_laz_compress_chunk / pc_laz_decompress_chunk — one chunk: first
//     point raw, the rest arithmetic-coded; fresh model state per chunk.
//   pc_laz_*_chunk_table — the delta-compressed chunk-size table.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>

namespace {

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;
typedef int8_t I8;
typedef int16_t I16;
typedef int32_t I32;
typedef int64_t I64;

// ---------------------------------------------------------------------
// FastAC arithmetic coder (encoder/decoder + adaptive models)

constexpr U32 AC_MinLength = 0x01000000u;
constexpr U32 AC_MaxLength = 0xFFFFFFFFu;
constexpr U32 DM_LengthShift = 15;
constexpr U32 DM_MaxCount = 1u << DM_LengthShift;
constexpr U32 BM_LengthShift = 13;
constexpr U32 BM_MaxCount = 1u << BM_LengthShift;

class ArithmeticModel {
  public:
    explicit ArithmeticModel(U32 symbols) : symbols_(symbols) {
        if (symbols_ > 16) {
            U32 table_bits = 3;
            while (symbols_ > (1u << (table_bits + 2))) ++table_bits;
            table_size_ = 1u << table_bits;
            table_shift_ = DM_LengthShift - table_bits;
            decoder_table_.assign(table_size_ + 2, 0);
        } else {
            table_size_ = table_shift_ = 0;
        }
        distribution_.assign(symbols_, 0);
        symbol_count_.assign(symbols_, 0);
        init();
    }

    void init() {
        total_count_ = 0;
        update_cycle_ = symbols_;
        for (U32 k = 0; k < symbols_; ++k) symbol_count_[k] = 1;
        update();
        symbols_until_update_ = update_cycle_ = (symbols_ + 6) >> 1;
    }

    void update() {
        if ((total_count_ += update_cycle_) > DM_MaxCount) {
            total_count_ = 0;
            for (U32 n = 0; n < symbols_; ++n) {
                total_count_ += (symbol_count_[n] =
                                     (symbol_count_[n] + 1) >> 1);
            }
        }
        U32 sum = 0, s = 0;
        const U32 scale = 0x80000000u / total_count_;
        if (table_size_ == 0) {
            for (U32 k = 0; k < symbols_; ++k) {
                distribution_[k] =
                    (scale * sum) >> (31 - DM_LengthShift);
                sum += symbol_count_[k];
            }
        } else {
            for (U32 k = 0; k < symbols_; ++k) {
                distribution_[k] =
                    (scale * sum) >> (31 - DM_LengthShift);
                sum += symbol_count_[k];
                const U32 w = distribution_[k] >> table_shift_;
                while (s < w) decoder_table_[++s] = k - 1;
            }
            decoder_table_[0] = 0;
            while (s <= table_size_) {
                decoder_table_[++s] = symbols_ - 1;
            }
        }
        update_cycle_ = (5 * update_cycle_) >> 2;
        const U32 max_cycle = (symbols_ + 6) << 3;
        if (update_cycle_ > max_cycle) update_cycle_ = max_cycle;
        symbols_until_update_ = update_cycle_;
    }

    U32 symbols_;
    U32 table_size_, table_shift_;
    U32 total_count_ = 0, update_cycle_ = 0, symbols_until_update_ = 0;
    std::vector<U32> distribution_, symbol_count_, decoder_table_;
};

class ArithmeticBitModel {
  public:
    ArithmeticBitModel() { init(); }

    void init() {
        bit_0_count_ = 1;
        bit_count_ = 2;
        bit_0_prob_ = 1u << (BM_LengthShift - 1);
        update_cycle_ = bits_until_update_ = 4;
    }

    void update() {
        if ((bit_count_ += update_cycle_) > BM_MaxCount) {
            bit_count_ = (bit_count_ + 1) >> 1;
            bit_0_count_ = (bit_0_count_ + 1) >> 1;
            if (bit_0_count_ == bit_count_) ++bit_count_;
        }
        const U32 scale = 0x80000000u / bit_count_;
        bit_0_prob_ = (bit_0_count_ * scale) >> (31 - BM_LengthShift);
        update_cycle_ = (5 * update_cycle_) >> 2;
        if (update_cycle_ > 64) update_cycle_ = 64;
        bits_until_update_ = update_cycle_;
    }

    U32 bit_0_count_, bit_count_, bit_0_prob_;
    U32 update_cycle_, bits_until_update_;
};

class ArithmeticEncoder {
  public:
    explicit ArithmeticEncoder(std::vector<U8>* out) : out_(out) {
        base_ = 0;
        length_ = AC_MaxLength;
    }

    void encode_bit(ArithmeticBitModel* m, U32 sym) {
        const U32 x = m->bit_0_prob_ * (length_ >> BM_LengthShift);
        if (sym == 0) {
            length_ = x;
            ++m->bit_0_count_;
        } else {
            const U32 init_base = base_;
            base_ += x;
            length_ -= x;
            if (init_base > base_) propagate_carry();
        }
        if (length_ < AC_MinLength) renorm();
        if (--m->bits_until_update_ == 0) m->update();
    }

    void encode_symbol(ArithmeticModel* m, U32 sym) {
        const U32 init_base = base_;
        U32 x;
        if (sym == m->symbols_ - 1) {
            x = m->distribution_[sym] * (length_ >> DM_LengthShift);
            base_ += x;
            length_ -= x;
        } else {
            x = m->distribution_[sym] * (length_ >>= DM_LengthShift);
            base_ += x;
            length_ = m->distribution_[sym + 1] * length_ - x;
        }
        if (init_base > base_) propagate_carry();
        if (length_ < AC_MinLength) renorm();
        ++m->symbol_count_[sym];
        if (--m->symbols_until_update_ == 0) m->update();
    }

    void write_bits(U32 bits, U32 sym) {
        if (bits > 19) {
            write_short(sym & 0xFFFF);
            sym >>= 16;
            bits -= 16;
        }
        const U32 init_base = base_;
        base_ += sym * (length_ >>= bits);
        if (init_base > base_) propagate_carry();
        if (length_ < AC_MinLength) renorm();
    }

    void write_short(U16 sym) {
        const U32 init_base = base_;
        base_ += static_cast<U32>(sym) * (length_ >>= 16);
        if (init_base > base_) propagate_carry();
        if (length_ < AC_MinLength) renorm();
    }

    void write_int(U32 sym) {
        write_short(static_cast<U16>(sym & 0xFFFF));
        write_short(static_cast<U16>(sym >> 16));
    }

    void done() {
        const U32 init_base = base_;
        if (length_ > 2 * AC_MinLength) {
            base_ += AC_MinLength;
            length_ = AC_MinLength >> 1;
        } else {
            base_ += AC_MinLength >> 1;
            length_ = AC_MinLength >> 9;
        }
        if (init_base > base_) propagate_carry();
        renorm();
        // pad so a decoder that pre-reads 4 init bytes (plus renorm
        // lookahead) never starves on the final symbols
        out_->push_back(0);
        out_->push_back(0);
        out_->push_back(0);
    }

  private:
    void propagate_carry() {
        size_t p = out_->size();
        while (p > 0 && (*out_)[p - 1] == 0xFF) {
            (*out_)[p - 1] = 0;
            --p;
        }
        if (p > 0) ++(*out_)[p - 1];
    }

    void renorm() {
        do {
            out_->push_back(static_cast<U8>(base_ >> 24));
            base_ <<= 8;
        } while ((length_ <<= 8) < AC_MinLength);
    }

    std::vector<U8>* out_;
    U32 base_, length_;
};

class ArithmeticDecoder {
  public:
    ArithmeticDecoder(const U8* in, I64 len) : in_(in), len_(len) {
        value_ = 0;
        for (int i = 0; i < 4; ++i) value_ = (value_ << 8) | get_byte();
        length_ = AC_MaxLength;
    }

    U32 decode_bit(ArithmeticBitModel* m) {
        const U32 x = m->bit_0_prob_ * (length_ >> BM_LengthShift);
        U32 sym = (value_ >= x);
        if (sym == 0) {
            length_ = x;
            ++m->bit_0_count_;
        } else {
            value_ -= x;
            length_ -= x;
        }
        if (length_ < AC_MinLength) renorm();
        if (--m->bits_until_update_ == 0) m->update();
        return sym;
    }

    U32 decode_symbol(ArithmeticModel* m) {
        U32 n, sym, x, y = length_;
        if (!m->decoder_table_.empty()) {
            const U32 dv = value_ / (length_ >>= DM_LengthShift);
            const U32 t = dv >> m->table_shift_;
            sym = m->decoder_table_[t];
            n = m->decoder_table_[t + 1] + 1;
            while (n > sym + 1) {
                const U32 k = (sym + n) >> 1;
                if (m->distribution_[k] > dv) {
                    n = k;
                } else {
                    sym = k;
                }
            }
            x = m->distribution_[sym] * length_;
            if (sym != m->symbols_ - 1) {
                y = m->distribution_[sym + 1] * length_;
            }
        } else {
            x = sym = 0;
            length_ >>= DM_LengthShift;
            U32 k = (n = m->symbols_) >> 1;
            do {
                const U32 z = length_ * m->distribution_[k];
                if (z > value_) {
                    n = k;
                    y = z;
                } else {
                    sym = k;
                    x = z;
                }
            } while ((k = (sym + n) >> 1) != sym);
        }
        value_ -= x;
        length_ = y - x;
        if (length_ < AC_MinLength) renorm();
        ++m->symbol_count_[sym];
        if (--m->symbols_until_update_ == 0) m->update();
        return sym;
    }

    U32 read_bits(U32 bits) {
        if (bits > 19) {
            const U32 lower = read_short();
            const U32 upper = read_bits(bits - 16);
            return (upper << 16) | lower;
        }
        const U32 sym = value_ / (length_ >>= bits);
        value_ -= length_ * sym;
        if (length_ < AC_MinLength) renorm();
        return sym;
    }

    U32 read_short() {
        const U32 sym = value_ / (length_ >>= 16);
        value_ -= length_ * sym;
        if (length_ < AC_MinLength) renorm();
        return sym;
    }

    U32 read_int() {
        const U32 lower = read_short();
        const U32 upper = read_short();
        return (upper << 16) | lower;
    }

    I64 consumed() const { return pos_; }

  private:
    U8 get_byte() { return pos_ < len_ ? in_[pos_++] : 0; }

    void renorm() {
        do {
            value_ = (value_ << 8) | get_byte();
        } while ((length_ <<= 8) < AC_MinLength);
    }

    const U8* in_;
    I64 len_;
    I64 pos_ = 0;
    U32 value_, length_;
};

// ---------------------------------------------------------------------
// IntegerCompressor: k-bit prediction-residual coding

class IntegerCompressor {
  public:
    IntegerCompressor(U32 bits, U32 contexts)
        : bits_(bits), contexts_(contexts) {
        bits_high_ = 8;
        for (U32 c = 0; c < contexts_; ++c) {
            m_bits_.emplace_back(bits_ + 1);
        }
        m_corrector0_ = ArithmeticBitModel();
        for (U32 k = 1; k <= bits_; ++k) {
            m_corrector_.emplace_back(
                k <= bits_high_ ? (1u << k) : (1u << bits_high_));
        }
    }

    void compress(ArithmeticEncoder* enc, I32 pred, I32 real, U32 ctx) {
        const I32 corr =
            static_cast<I32>(static_cast<U32>(real) -
                             static_cast<U32>(pred));  // wrapping
        write_corrector(enc, corr, &m_bits_[ctx]);
    }

    I32 decompress(ArithmeticDecoder* dec, I32 pred, U32 ctx) {
        const I32 corr = read_corrector(dec, &m_bits_[ctx]);
        return static_cast<I32>(static_cast<U32>(pred) +
                                static_cast<U32>(corr));
    }

    U32 k() const { return k_; }

  private:
    void write_corrector(ArithmeticEncoder* enc, I32 c,
                         ArithmeticModel* m_bits) {
        U32 c1 = static_cast<U32>(c <= 0 ? -c : c - 1);
        U32 k = 0;
        while (c1) {
            c1 >>= 1;
            ++k;
        }
        k_ = k;
        enc->encode_symbol(m_bits, k);
        if (k) {
            if (k < 32) {
                if (c < 0) {
                    c += (1 << k) - 1;
                } else {
                    c -= 1;
                }
                if (k <= bits_high_) {
                    enc->encode_symbol(&m_corrector_[k - 1],
                                       static_cast<U32>(c));
                } else {
                    const U32 k1 = k - bits_high_;
                    const U32 low = static_cast<U32>(c) & ((1u << k1) - 1);
                    enc->encode_symbol(&m_corrector_[k - 1],
                                       static_cast<U32>(c) >> k1);
                    enc->write_bits(k1, low);
                }
            }
            // k == 32: the corrector is I32_MIN, fully determined by k
        } else {
            enc->encode_bit(&m_corrector0_, static_cast<U32>(c));
        }
    }

    I32 read_corrector(ArithmeticDecoder* dec, ArithmeticModel* m_bits) {
        const U32 k = dec->decode_symbol(m_bits);
        k_ = k;
        I32 c;
        if (k) {
            if (k < 32) {
                if (k <= bits_high_) {
                    c = static_cast<I32>(
                        dec->decode_symbol(&m_corrector_[k - 1]));
                } else {
                    const U32 k1 = k - bits_high_;
                    c = static_cast<I32>(
                        dec->decode_symbol(&m_corrector_[k - 1]));
                    const U32 c1 = dec->read_bits(k1);
                    c = static_cast<I32>((static_cast<U32>(c) << k1) | c1);
                }
                if (c >= (1 << (k - 1))) {
                    c += 1;
                } else {
                    c -= (1 << k) - 1;
                }
            } else {
                c = INT32_MIN;
            }
        } else {
            c = static_cast<I32>(dec->decode_bit(&m_corrector0_));
        }
        return c;
    }

    U32 bits_, contexts_, bits_high_;
    U32 k_ = 0;
    std::vector<ArithmeticModel> m_bits_;
    ArithmeticBitModel m_corrector0_;
    std::vector<ArithmeticModel> m_corrector_;
};

// ---------------------------------------------------------------------
// POINT10 v2 item codec

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
                    values[2] = values[1];
                    values[1] = values[0];
                    values[0] = v;
                } else if (v < values[1]) {
                    values[2] = values[1];
                    values[1] = v;
                } else {
                    values[2] = v;
                }
            } else {
                if (v < values[3]) {
                    values[4] = values[3];
                    values[3] = v;
                } else {
                    values[4] = v;
                }
                high = false;
            }
        } else {
            if (values[2] < v) {
                values[0] = values[1];
                values[1] = values[2];
                if (values[4] < v) {
                    values[2] = values[3];
                    values[3] = values[4];
                    values[4] = v;
                } else if (values[3] < v) {
                    values[2] = values[3];
                    values[3] = v;
                } else {
                    values[2] = v;
                }
            } else {
                if (values[1] < v) {
                    values[0] = values[1];
                    values[1] = v;
                } else {
                    values[0] = v;
                }
                high = true;
            }
        }
    }

    I32 get() const { return values[2]; }
};

// LASzip's return-number context tables
const U8 kNumberReturnMap[8][8] = {
    {15, 14, 13, 12, 11, 10, 9, 8},
    {14, 0, 1, 3, 6, 10, 10, 9},
    {13, 1, 2, 4, 7, 11, 11, 10},
    {12, 3, 4, 5, 8, 12, 12, 11},
    {11, 6, 7, 8, 9, 13, 13, 12},
    {10, 10, 11, 12, 13, 14, 14, 13},
    {9, 10, 11, 12, 13, 14, 15, 14},
    {8, 9, 10, 11, 12, 13, 14, 15},
};
const U8 kNumberReturnLevel[8][8] = {
    {0, 1, 2, 3, 4, 5, 6, 7},
    {1, 0, 1, 2, 3, 4, 5, 6},
    {2, 1, 0, 1, 2, 3, 4, 5},
    {3, 2, 1, 0, 1, 2, 3, 4},
    {4, 3, 2, 1, 0, 1, 2, 3},
    {5, 4, 3, 2, 1, 0, 1, 2},
    {6, 5, 4, 3, 2, 1, 0, 1},
    {7, 6, 5, 4, 3, 2, 1, 0},
};

inline U16 get_u16(const U8* p) {
    U16 v;
    std::memcpy(&v, p, 2);
    return v;
}
inline void put_u16(U8* p, U16 v) { std::memcpy(p, &v, 2); }
inline I32 get_i32(const U8* p) {
    I32 v;
    std::memcpy(&v, p, 4);
    return v;
}
inline void put_i32(U8* p, I32 v) { std::memcpy(p, &v, 4); }
inline U8 u8_fold(I32 v) { return static_cast<U8>(v & 0xFF); }
inline U8 u8_clamp(I32 v) {
    return v < 0 ? 0 : (v > 255 ? 255 : static_cast<U8>(v));
}

class Point10v2 {
  public:
    Point10v2()
        : ic_intensity_(16, 4),
          ic_point_source_id_(16, 1),
          ic_dx_(32, 2),
          ic_dy_(32, 22),
          ic_z_(32, 20),
          m_changed_values_(64) {
        m_scan_angle_rank_[0] = new ArithmeticModel(256);
        m_scan_angle_rank_[1] = new ArithmeticModel(256);
        for (int i = 0; i < 256; ++i) {
            m_bit_byte_[i] = nullptr;
            m_classification_[i] = nullptr;
            m_user_data_[i] = nullptr;
        }
    }

    ~Point10v2() {
        delete m_scan_angle_rank_[0];
        delete m_scan_angle_rank_[1];
        for (int i = 0; i < 256; ++i) {
            delete m_bit_byte_[i];
            delete m_classification_[i];
            delete m_user_data_[i];
        }
    }

    void init(const U8* item) {
        for (int i = 0; i < 16; ++i) {
            last_x_diff_median5_[i].init();
            last_y_diff_median5_[i].init();
            last_intensity_[i] = 0;
        }
        for (int i = 0; i < 8; ++i) last_height_[i] = 0;
        std::memcpy(last_item_, item, 20);
        // the intensity of the raw first point is NOT carried as context
        last_item_[12] = 0;
        last_item_[13] = 0;
    }

    void read(ArithmeticDecoder* dec, U8* item) {
        U32 r, n, m, l;
        const U32 changed_values = dec->decode_symbol(&m_changed_values_);
        if (changed_values) {
            if (changed_values & 32) {
                ArithmeticModel*& bm = m_bit_byte_[last_item_[14]];
                if (bm == nullptr) bm = new ArithmeticModel(256);
                last_item_[14] =
                    static_cast<U8>(dec->decode_symbol(bm));
            }
            r = last_item_[14] & 7;
            n = (last_item_[14] >> 3) & 7;
            m = kNumberReturnMap[n][r];
            l = kNumberReturnLevel[n][r];
            if (changed_values & 16) {
                const U16 intensity = static_cast<U16>(
                    ic_intensity_.decompress(dec, last_intensity_[m],
                                             m < 3 ? m : 3));
                put_u16(last_item_ + 12, intensity);
                last_intensity_[m] = intensity;
            } else {
                put_u16(last_item_ + 12, last_intensity_[m]);
            }
            if (changed_values & 8) {
                ArithmeticModel*& cm = m_classification_[last_item_[15]];
                if (cm == nullptr) cm = new ArithmeticModel(256);
                last_item_[15] =
                    static_cast<U8>(dec->decode_symbol(cm));
            }
            if (changed_values & 4) {
                const U32 scan_dir = (last_item_[14] >> 6) & 1;
                const U32 val =
                    dec->decode_symbol(m_scan_angle_rank_[scan_dir]);
                last_item_[16] = u8_fold(
                    static_cast<I32>(val) + last_item_[16]);
            }
            if (changed_values & 2) {
                ArithmeticModel*& um = m_user_data_[last_item_[17]];
                if (um == nullptr) um = new ArithmeticModel(256);
                last_item_[17] =
                    static_cast<U8>(dec->decode_symbol(um));
            }
            if (changed_values & 1) {
                const U16 psid = static_cast<U16>(
                    ic_point_source_id_.decompress(
                        dec, get_u16(last_item_ + 18), 0));
                put_u16(last_item_ + 18, psid);
            }
        } else {
            r = last_item_[14] & 7;
            n = (last_item_[14] >> 3) & 7;
            m = kNumberReturnMap[n][r];
            l = kNumberReturnLevel[n][r];
        }

        // x
        I32 median = last_x_diff_median5_[m].get();
        I32 diff = ic_dx_.decompress(dec, median, n == 1);
        put_i32(last_item_, get_i32(last_item_) + diff);
        last_x_diff_median5_[m].add(diff);
        // y
        median = last_y_diff_median5_[m].get();
        U32 k_bits = ic_dx_.k();
        diff = ic_dy_.decompress(
            dec, median,
            (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
        put_i32(last_item_ + 4, get_i32(last_item_ + 4) + diff);
        last_y_diff_median5_[m].add(diff);
        // z
        k_bits = (ic_dx_.k() + ic_dy_.k()) / 2;
        const I32 z = ic_z_.decompress(
            dec, last_height_[l],
            (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
        put_i32(last_item_ + 8, z);
        last_height_[l] = z;

        std::memcpy(item, last_item_, 20);
    }

    void write(ArithmeticEncoder* enc, const U8* item) {
        const U32 r = item[14] & 7;
        const U32 n = (item[14] >> 3) & 7;
        const U32 m = kNumberReturnMap[n][r];
        const U32 l = kNumberReturnLevel[n][r];

        const U16 intensity = get_u16(item + 12);
        const U32 changed_values =
            ((last_item_[14] != item[14]) << 5) |
            ((last_intensity_[m] != intensity) << 4) |
            ((last_item_[15] != item[15]) << 3) |
            ((last_item_[16] != item[16]) << 2) |
            ((last_item_[17] != item[17]) << 1) |
            (get_u16(last_item_ + 18) != get_u16(item + 18));
        enc->encode_symbol(&m_changed_values_, changed_values);

        if (changed_values) {
            if (changed_values & 32) {
                ArithmeticModel*& bm = m_bit_byte_[last_item_[14]];
                if (bm == nullptr) bm = new ArithmeticModel(256);
                enc->encode_symbol(bm, item[14]);
            }
            if (changed_values & 16) {
                ic_intensity_.compress(enc, last_intensity_[m], intensity,
                                       m < 3 ? m : 3);
                last_intensity_[m] = intensity;
            }
            if (changed_values & 8) {
                ArithmeticModel*& cm = m_classification_[last_item_[15]];
                if (cm == nullptr) cm = new ArithmeticModel(256);
                enc->encode_symbol(cm, item[15]);
            }
            if (changed_values & 4) {
                const U32 scan_dir = (item[14] >> 6) & 1;
                enc->encode_symbol(
                    m_scan_angle_rank_[scan_dir],
                    u8_fold(static_cast<I32>(item[16]) - last_item_[16]));
            }
            if (changed_values & 2) {
                ArithmeticModel*& um = m_user_data_[last_item_[17]];
                if (um == nullptr) um = new ArithmeticModel(256);
                enc->encode_symbol(um, item[17]);
            }
            if (changed_values & 1) {
                ic_point_source_id_.compress(enc,
                                             get_u16(last_item_ + 18),
                                             get_u16(item + 18), 0);
            }
        }

        // x
        I32 median = last_x_diff_median5_[m].get();
        I32 diff = get_i32(item) - get_i32(last_item_);
        ic_dx_.compress(enc, median, diff, n == 1);
        last_x_diff_median5_[m].add(diff);
        // y
        median = last_y_diff_median5_[m].get();
        U32 k_bits = ic_dx_.k();
        diff = get_i32(item + 4) - get_i32(last_item_ + 4);
        ic_dy_.compress(enc, median, diff,
                        (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
        last_y_diff_median5_[m].add(diff);
        // z
        k_bits = (ic_dx_.k() + ic_dy_.k()) / 2;
        ic_z_.compress(enc, last_height_[l], get_i32(item + 8),
                       (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
        last_height_[l] = get_i32(item + 8);

        std::memcpy(last_item_, item, 20);
    }

  private:
    U8 last_item_[20];
    U16 last_intensity_[16];
    I32 last_height_[8];
    StreamingMedian5 last_x_diff_median5_[16], last_y_diff_median5_[16];
    IntegerCompressor ic_intensity_, ic_point_source_id_;
    IntegerCompressor ic_dx_, ic_dy_, ic_z_;
    ArithmeticModel m_changed_values_;
    ArithmeticModel* m_scan_angle_rank_[2];
    ArithmeticModel* m_bit_byte_[256];
    ArithmeticModel* m_classification_[256];
    ArithmeticModel* m_user_data_[256];
};

// ---------------------------------------------------------------------
// GPSTIME11 v2 item codec

constexpr I32 kGpsMulti = 500;
constexpr I32 kGpsMultiMinus = -10;
constexpr I32 kGpsMultiUnchanged = kGpsMulti - kGpsMultiMinus + 1;   // 511
constexpr I32 kGpsMultiCodeFull = kGpsMulti - kGpsMultiMinus + 2;    // 512
constexpr I32 kGpsMultiTotal = kGpsMulti - kGpsMultiMinus + 6;       // 516

inline I32 i32_quantize(float f) {
    return static_cast<I32>(f >= 0 ? f + 0.5f : f - 0.5f);
}

class GpsTime11v2 {
  public:
    GpsTime11v2()
        : m_gpstime_multi_(kGpsMultiTotal),
          m_gpstime_0diff_(6),
          ic_gpstime_(32, 9) {}

    void init(const U8* item) {
        last_ = 0;
        next_ = 0;
        for (int i = 0; i < 4; ++i) {
            last_gpstime_[i] = 0;
            last_gpstime_diff_[i] = 0;
            multi_extreme_counter_[i] = 0;
        }
        std::memcpy(&last_gpstime_[0], item, 8);
    }

    void read(ArithmeticDecoder* dec, U8* item) {
        if (last_gpstime_diff_[last_] == 0) {
            const U32 multi = dec->decode_symbol(&m_gpstime_0diff_);
            if (multi == 1) {  // difference fits 32 bits
                last_gpstime_diff_[last_] =
                    ic_gpstime_.decompress(dec, 0, 0);
                last_gpstime_[last_] += last_gpstime_diff_[last_];
                multi_extreme_counter_[last_] = 0;
            } else if (multi == 2) {  // full 64-bit value
                next_ = (next_ + 1) & 3;
                U64 hi = static_cast<U32>(ic_gpstime_.decompress(
                    dec,
                    static_cast<I32>(
                        static_cast<U64>(last_gpstime_[last_]) >> 32),
                    8));
                U64 v = (hi << 32) | dec->read_int();
                last_gpstime_[next_] = static_cast<I64>(v);
                last_ = next_;
                last_gpstime_diff_[last_] = 0;
                multi_extreme_counter_[last_] = 0;
            } else if (multi > 2) {  // switch to another sequence
                last_ = (last_ + multi - 2) & 3;
                read(dec, item);
                return;
            }
            // multi == 0: unchanged
        } else {
            const U32 multi = dec->decode_symbol(&m_gpstime_multi_);
            if (multi == 1) {
                last_gpstime_[last_] += ic_gpstime_.decompress(
                    dec, last_gpstime_diff_[last_], 1);
                multi_extreme_counter_[last_] = 0;
            } else if (multi <
                       static_cast<U32>(kGpsMultiUnchanged)) {
                I32 gpstime_diff;
                if (multi == 0) {
                    gpstime_diff = ic_gpstime_.decompress(dec, 0, 7);
                    ++multi_extreme_counter_[last_];
                    if (multi_extreme_counter_[last_] > 3) {
                        last_gpstime_diff_[last_] = gpstime_diff;
                        multi_extreme_counter_[last_] = 0;
                    }
                } else if (multi < static_cast<U32>(kGpsMulti)) {
                    gpstime_diff = ic_gpstime_.decompress(
                        dec,
                        static_cast<I32>(multi) *
                            last_gpstime_diff_[last_],
                        multi < 10 ? 2 : 3);
                } else if (multi == static_cast<U32>(kGpsMulti)) {
                    gpstime_diff = ic_gpstime_.decompress(
                        dec, kGpsMulti * last_gpstime_diff_[last_], 4);
                    ++multi_extreme_counter_[last_];
                    if (multi_extreme_counter_[last_] > 3) {
                        last_gpstime_diff_[last_] = gpstime_diff;
                        multi_extreme_counter_[last_] = 0;
                    }
                } else {
                    const I32 neg = kGpsMulti - static_cast<I32>(multi);
                    if (neg > kGpsMultiMinus) {
                        gpstime_diff = ic_gpstime_.decompress(
                            dec, neg * last_gpstime_diff_[last_], 5);
                    } else {
                        gpstime_diff = ic_gpstime_.decompress(
                            dec,
                            kGpsMultiMinus * last_gpstime_diff_[last_],
                            6);
                        ++multi_extreme_counter_[last_];
                        if (multi_extreme_counter_[last_] > 3) {
                            last_gpstime_diff_[last_] = gpstime_diff;
                            multi_extreme_counter_[last_] = 0;
                        }
                    }
                }
                last_gpstime_[last_] += gpstime_diff;
            } else if (multi ==
                       static_cast<U32>(kGpsMultiCodeFull)) {
                next_ = (next_ + 1) & 3;
                U64 hi = static_cast<U32>(ic_gpstime_.decompress(
                    dec,
                    static_cast<I32>(
                        static_cast<U64>(last_gpstime_[last_]) >> 32),
                    8));
                U64 v = (hi << 32) | dec->read_int();
                last_gpstime_[next_] = static_cast<I64>(v);
                last_ = next_;
                last_gpstime_diff_[last_] = 0;
                multi_extreme_counter_[last_] = 0;
            } else if (multi >
                       static_cast<U32>(kGpsMultiCodeFull)) {
                last_ = (last_ + multi - kGpsMultiCodeFull) & 3;
                read(dec, item);
                return;
            }
            // multi == kGpsMultiUnchanged: unchanged
        }
        std::memcpy(item, &last_gpstime_[last_], 8);
    }

    void write(ArithmeticEncoder* enc, const U8* item) {
        I64 gps;
        std::memcpy(&gps, item, 8);
        if (last_gpstime_diff_[last_] == 0) {
            if (gps == last_gpstime_[last_]) {
                enc->encode_symbol(&m_gpstime_0diff_, 0);
            } else {
                const I64 diff64 = gps - last_gpstime_[last_];
                const I32 diff32 = static_cast<I32>(diff64);
                if (diff64 == static_cast<I64>(diff32)) {
                    enc->encode_symbol(&m_gpstime_0diff_, 1);
                    ic_gpstime_.compress(enc, 0, diff32, 0);
                    last_gpstime_diff_[last_] = diff32;
                    multi_extreme_counter_[last_] = 0;
                    last_gpstime_[last_] = gps;
                } else {
                    for (U32 i = 1; i < 4; ++i) {
                        const I64 other =
                            gps - last_gpstime_[(last_ + i) & 3];
                        if (other == static_cast<I64>(
                                         static_cast<I32>(other))) {
                            enc->encode_symbol(&m_gpstime_0diff_, i + 2);
                            last_ = (last_ + i) & 3;
                            write(enc, item);
                            return;
                        }
                    }
                    enc->encode_symbol(&m_gpstime_0diff_, 2);
                    ic_gpstime_.compress(
                        enc,
                        static_cast<I32>(
                            static_cast<U64>(last_gpstime_[last_]) >> 32),
                        static_cast<I32>(static_cast<U64>(gps) >> 32), 8);
                    enc->write_int(
                        static_cast<U32>(static_cast<U64>(gps)));
                    next_ = (next_ + 1) & 3;
                    last_ = next_;
                    last_gpstime_[last_] = gps;
                    last_gpstime_diff_[last_] = 0;
                    multi_extreme_counter_[last_] = 0;
                }
            }
        } else {
            if (gps == last_gpstime_[last_]) {
                enc->encode_symbol(&m_gpstime_multi_,
                                   kGpsMultiUnchanged);
            } else {
                const I64 diff64 = gps - last_gpstime_[last_];
                const I32 diff32 = static_cast<I32>(diff64);
                if (diff64 == static_cast<I64>(diff32)) {
                    const float multi_f =
                        static_cast<float>(diff32) /
                        static_cast<float>(last_gpstime_diff_[last_]);
                    const I32 multi = i32_quantize(multi_f);
                    if (multi == 1) {
                        enc->encode_symbol(&m_gpstime_multi_, 1);
                        ic_gpstime_.compress(
                            enc, last_gpstime_diff_[last_], diff32, 1);
                        multi_extreme_counter_[last_] = 0;
                    } else if (multi > 0) {
                        if (multi < kGpsMulti) {
                            enc->encode_symbol(&m_gpstime_multi_, multi);
                            ic_gpstime_.compress(
                                enc, multi * last_gpstime_diff_[last_],
                                diff32, multi < 10 ? 2 : 3);
                        } else {
                            enc->encode_symbol(&m_gpstime_multi_,
                                               kGpsMulti);
                            ic_gpstime_.compress(
                                enc,
                                kGpsMulti * last_gpstime_diff_[last_],
                                diff32, 4);
                            ++multi_extreme_counter_[last_];
                            if (multi_extreme_counter_[last_] > 3) {
                                last_gpstime_diff_[last_] = diff32;
                                multi_extreme_counter_[last_] = 0;
                            }
                        }
                    } else if (multi < 0) {
                        if (multi > kGpsMultiMinus) {
                            enc->encode_symbol(&m_gpstime_multi_,
                                               kGpsMulti - multi);
                            ic_gpstime_.compress(
                                enc, multi * last_gpstime_diff_[last_],
                                diff32, 5);
                        } else {
                            enc->encode_symbol(
                                &m_gpstime_multi_,
                                kGpsMulti - kGpsMultiMinus);
                            ic_gpstime_.compress(
                                enc,
                                kGpsMultiMinus *
                                    last_gpstime_diff_[last_],
                                diff32, 6);
                            ++multi_extreme_counter_[last_];
                            if (multi_extreme_counter_[last_] > 3) {
                                last_gpstime_diff_[last_] = diff32;
                                multi_extreme_counter_[last_] = 0;
                            }
                        }
                    } else {  // multi == 0
                        enc->encode_symbol(&m_gpstime_multi_, 0);
                        ic_gpstime_.compress(enc, 0, diff32, 7);
                        ++multi_extreme_counter_[last_];
                        if (multi_extreme_counter_[last_] > 3) {
                            last_gpstime_diff_[last_] = diff32;
                            multi_extreme_counter_[last_] = 0;
                        }
                    }
                    last_gpstime_[last_] = gps;
                } else {
                    for (U32 i = 1; i < 4; ++i) {
                        const I64 other =
                            gps - last_gpstime_[(last_ + i) & 3];
                        if (other == static_cast<I64>(
                                         static_cast<I32>(other))) {
                            enc->encode_symbol(&m_gpstime_multi_,
                                               kGpsMultiCodeFull + i);
                            last_ = (last_ + i) & 3;
                            write(enc, item);
                            return;
                        }
                    }
                    enc->encode_symbol(&m_gpstime_multi_,
                                       kGpsMultiCodeFull);
                    ic_gpstime_.compress(
                        enc,
                        static_cast<I32>(
                            static_cast<U64>(last_gpstime_[last_]) >> 32),
                        static_cast<I32>(static_cast<U64>(gps) >> 32), 8);
                    enc->write_int(
                        static_cast<U32>(static_cast<U64>(gps)));
                    next_ = (next_ + 1) & 3;
                    last_ = next_;
                    last_gpstime_[last_] = gps;
                    last_gpstime_diff_[last_] = 0;
                    multi_extreme_counter_[last_] = 0;
                }
            }
        }
    }

  private:
    ArithmeticModel m_gpstime_multi_, m_gpstime_0diff_;
    IntegerCompressor ic_gpstime_;
    U32 last_ = 0, next_ = 0;
    I64 last_gpstime_[4];
    I32 last_gpstime_diff_[4];
    I32 multi_extreme_counter_[4];
};

// ---------------------------------------------------------------------
// RGB12 v2 item codec

class Rgb12v2 {
  public:
    Rgb12v2() : m_byte_used_(128) {
        for (int i = 0; i < 6; ++i) {
            m_rgb_diff_[i] = new ArithmeticModel(256);
        }
    }
    ~Rgb12v2() {
        for (int i = 0; i < 6; ++i) delete m_rgb_diff_[i];
    }

    void init(const U8* item) { std::memcpy(last_, item, 6); }

    const U8* last() const { return last_; }

    void read(ArithmeticDecoder* dec, U8* item) {
        U16 r = 0, g = 0, b = 0;
        const U16 lr = get_u16(last_), lg = get_u16(last_ + 2),
                  lb = get_u16(last_ + 4);
        I32 corr, diff = 0;
        const U32 sym = dec->decode_symbol(&m_byte_used_);
        if (sym & 1) {
            corr = static_cast<I32>(dec->decode_symbol(m_rgb_diff_[0]));
            r = u8_fold(corr + (lr & 255));
        } else {
            r = lr & 0xFF;
        }
        if (sym & 2) {
            corr = static_cast<I32>(dec->decode_symbol(m_rgb_diff_[1]));
            r |= static_cast<U16>(u8_fold(corr + (lr >> 8))) << 8;
        } else {
            r |= lr & 0xFF00;
        }
        if (sym & 64) {
            diff = (r & 0x00FF) - (lr & 0x00FF);
            if (sym & 4) {
                corr = static_cast<I32>(
                    dec->decode_symbol(m_rgb_diff_[2]));
                g = u8_fold(corr + u8_clamp(diff + (lg & 255)));
            } else {
                g = lg & 0xFF;
            }
            if (sym & 16) {
                corr = static_cast<I32>(
                    dec->decode_symbol(m_rgb_diff_[4]));
                diff = (diff + ((g & 0x00FF) - (lg & 0x00FF))) / 2;
                b = u8_fold(corr + u8_clamp(diff + (lb & 255)));
            } else {
                b = lb & 0xFF;
            }
            diff = (r >> 8) - (lr >> 8);
            if (sym & 8) {
                corr = static_cast<I32>(
                    dec->decode_symbol(m_rgb_diff_[3]));
                g |= static_cast<U16>(
                         u8_fold(corr + u8_clamp(diff + (lg >> 8))))
                     << 8;
            } else {
                g |= lg & 0xFF00;
            }
            if (sym & 32) {
                corr = static_cast<I32>(
                    dec->decode_symbol(m_rgb_diff_[5]));
                diff = (diff + ((g >> 8) - (lg >> 8))) / 2;
                b |= static_cast<U16>(
                         u8_fold(corr + u8_clamp(diff + (lb >> 8))))
                     << 8;
            } else {
                b |= lb & 0xFF00;
            }
        } else {
            g = r;
            b = r;
        }
        put_u16(item, r);
        put_u16(item + 2, g);
        put_u16(item + 4, b);
        std::memcpy(last_, item, 6);
    }

    void write(ArithmeticEncoder* enc, const U8* item) {
        const U16 r = get_u16(item), g = get_u16(item + 2),
                  b = get_u16(item + 4);
        const U16 lr = get_u16(last_), lg = get_u16(last_ + 2),
                  lb = get_u16(last_ + 4);
        U32 sym = 0;
        const bool rl = (r & 0xFF) != (lr & 0xFF);
        const bool rh = (r >> 8) != (lr >> 8);
        if (rl) sym |= 1;
        if (rh) sym |= 2;
        const bool gray =
            ((r & 0xFF) == (g & 0xFF)) && ((r & 0xFF) == (b & 0xFF)) &&
            ((r >> 8) == (g >> 8)) && ((r >> 8) == (b >> 8));
        if (!gray) {
            sym |= 64;
            if ((g & 0xFF) != (lg & 0xFF)) sym |= 4;
            if ((g >> 8) != (lg >> 8)) sym |= 8;
            if ((b & 0xFF) != (lb & 0xFF)) sym |= 16;
            if ((b >> 8) != (lb >> 8)) sym |= 32;
        }
        enc->encode_symbol(&m_byte_used_, sym);

        I32 diff = 0;
        if (sym & 1) {
            diff = (r & 0xFF) - (lr & 0xFF);
            enc->encode_symbol(m_rgb_diff_[0], u8_fold(diff));
        }
        if (sym & 2) {
            enc->encode_symbol(m_rgb_diff_[1],
                               u8_fold((r >> 8) - (lr >> 8)));
        }
        if (sym & 64) {
            diff = (r & 0xFF) - (lr & 0xFF);
            if (sym & 4) {
                enc->encode_symbol(
                    m_rgb_diff_[2],
                    u8_fold((g & 0xFF) -
                            u8_clamp(diff + (lg & 255))));
            }
            if (sym & 16) {
                diff = (diff + ((g & 0xFF) - (lg & 0xFF))) / 2;
                enc->encode_symbol(
                    m_rgb_diff_[4],
                    u8_fold((b & 0xFF) -
                            u8_clamp(diff + (lb & 255))));
            }
            diff = (r >> 8) - (lr >> 8);
            if (sym & 8) {
                enc->encode_symbol(
                    m_rgb_diff_[3],
                    u8_fold((g >> 8) - u8_clamp(diff + (lg >> 8))));
            }
            if (sym & 32) {
                diff = (diff + ((g >> 8) - (lg >> 8))) / 2;
                enc->encode_symbol(
                    m_rgb_diff_[5],
                    u8_fold((b >> 8) - u8_clamp(diff + (lb >> 8))));
            }
        }
        std::memcpy(last_, item, 6);
    }

  private:
    U8 last_[6];
    ArithmeticModel m_byte_used_;
    ArithmeticModel* m_rgb_diff_[6];
};

// ---------------------------------------------------------------------
// BYTE v2 item codec (extra per-point bytes)

class Byte2 {
  public:
    explicit Byte2(U32 n) : n_(n) {
        for (U32 i = 0; i < n_; ++i) m_byte_.emplace_back(256);
        last_.assign(n_, 0);
    }

    void init(const U8* item) { std::memcpy(last_.data(), item, n_); }

    void read(ArithmeticDecoder* dec, U8* item) {
        for (U32 i = 0; i < n_; ++i) {
            const U32 sym = dec->decode_symbol(&m_byte_[i]);
            item[i] = u8_fold(static_cast<I32>(sym) + last_[i]);
        }
        std::memcpy(last_.data(), item, n_);
    }

    void write(ArithmeticEncoder* enc, const U8* item) {
        for (U32 i = 0; i < n_; ++i) {
            enc->encode_symbol(
                &m_byte_[i],
                u8_fold(static_cast<I32>(item[i]) - last_[i]));
        }
        std::memcpy(last_.data(), item, n_);
    }

  private:
    U32 n_;
    std::vector<ArithmeticModel> m_byte_;
    std::vector<U8> last_;
};

// =====================================================================
// LASzip 3.x layered item codecs — LAS 1.4 point formats 6-10
//
// Chunk layout (the "layered chunked" scheme, LASzip VLR compressor 3):
//   [raw first point][U32 byte count per layer][layer payloads],
// layers in item order; POINT14 owns 9 layers (channel/returns/XY, Z,
// classification, flags, intensity, scan angle, user data, point source,
// GPS time), RGB14 one, RGBNIR14 two, WAVEPACKET14 one, BYTE14 one per
// extra byte. Four decompression contexts keyed by the scanner channel;
// a context is created on first use seeded from the active context's
// last record, exactly once per chunk (models reset per chunk).
//
// Fidelity note: the layer framing, context machinery, changed-values
// bit layout and field model shapes follow LASzip 3.4's
// las{read,write}itemcompressed_v3; the return-count context tables and
// the wavepacket layer reuse this file's v2 building blocks. Both
// directions ship and round-trip losslessly in-tree; bit-level
// certification against laszip-generated corpora is the documented
// remaining step (no network egress here — docs/PARITY.md).

// 16x16 extensions of the v2 8x8 return-context tables for the 4-bit
// LAS 1.4 return counters: m buckets the (count, index) structure into 6
// contexts, l is the |count - index| level clamped to 8 contexts.
inline U32 map6ctx(U32 n, U32 r) {
    if (n <= 1) return r <= 1 ? 0 : 5;  // single (or degenerate) return
    if (r == 1) return 1;               // first of many
    if (r >= n) return 2;               // last of many
    if (r == 2) return 3;               // early intermediate
    if (2 * r <= n) return 4;           // first half
    return 5;                           // second half
}
inline U32 level8ctx(U32 n, U32 r) {
    const I32 d = static_cast<I32>(n) - static_cast<I32>(r);
    const U32 a = static_cast<U32>(d < 0 ? -d : d);
    return a > 7 ? 7 : a;
}

// POINT14 record accessors (LAS 1.4, 30 bytes):
//   X i32 @0, Y i32 @4, Z i32 @8, intensity u16 @12,
//   @14: return number (bits 0-3) | number of returns (bits 4-7),
//   @15: classification flags (0-3) | scanner channel (4-5) |
//        scan direction (6) | edge of flight line (7),
//   classification u8 @16, user data u8 @17, scan angle i16 @18,
//   point source id u16 @20, GPS time f64 @22.

class Point14v3 {
  public:
    static constexpr int kNumLayers = 9;
    enum Layer {
        kLxy = 0, kLz, kLcls, kLflags, kLint, kLscan, kLuser, kLpsid,
        kLgps,
    };

    ~Point14v3() {
        for (auto& c : ctx_) {
            if (c == nullptr) continue;
            for (auto*& m : c->classification) delete m;
            for (auto*& m : c->flags) delete m;
            for (auto*& m : c->user_data) delete m;
        }
    }

    void init(const U8* item) {
        current_ = (item[15] >> 4) & 3;
        ctx_init(current_, item);
    }

    U32 context() const { return current_; }

    void read(ArithmeticDecoder* const* dec, U8* item) {
        Ctx* c = ctx_[current_].get();
        const U8* last = c->last;
        const U32 last_rn = last[14] & 15;
        const U32 last_nr = (last[14] >> 4) & 15;
        const U32 lpr = (last_rn == 1 ? 1 : 0) |
                        (last_rn >= last_nr ? 2 : 0) |
                        (c->last_gps_changed ? 4 : 0);
        const U32 changed =
            dec[kLxy]->decode_symbol(&c->changed_values[lpr]);
        if (changed & 64) {  // scanner channel switch
            const U32 diff = dec[kLxy]->decode_symbol(&c->scanner_channel);
            const U32 cc = (current_ + diff + 1) & 3;
            if (ctx_[cc] == nullptr) ctx_init(cc, c->last);
            current_ = cc;
            c = ctx_[cc].get();
            last = c->last;
        }
        const U32 l_rn = last[14] & 15;
        const U32 l_nr = (last[14] >> 4) & 15;
        const bool gps_changed = (changed & 16) != 0;

        U32 nr = l_nr;
        if (changed & 4) {
            nr = dec[kLxy]->decode_symbol(&c->number_of_returns[l_nr]);
        }
        U32 rn;
        switch (changed & 3) {
            case 0: rn = l_rn; break;
            case 1: rn = (l_rn + 1) & 15; break;
            case 2: rn = (l_rn + 15) & 15; break;
            default:
                rn = gps_changed
                         ? dec[kLxy]->decode_symbol(&c->return_number[l_rn])
                         : (l_rn +
                            dec[kLxy]->decode_symbol(
                                &c->return_number_gps_same) +
                            2) &
                               15;
                break;
        }
        const U32 m = map6ctx(nr, rn);
        const U32 l = level8ctx(nr, rn);
        const U32 mi = (m << 1) | (gps_changed ? 1 : 0);
        const U32 cpr = ((rn == 1 ? 1u : 0u) << 1) | (rn >= nr ? 1u : 0u);

        // X/Y from the channel/returns/XY layer (median-of-5 prediction)
        I32 median = c->median_x[mi].get();
        I32 diff = c->ic_dX.decompress(dec[kLxy], median, nr == 1);
        const I32 x = get_i32(last) + diff;
        c->median_x[mi].add(diff);
        U32 k_bits = c->ic_dX.k();
        median = c->median_y[mi].get();
        diff = c->ic_dY.decompress(
            dec[kLxy], median,
            (nr == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
        const I32 y = get_i32(last + 4) + diff;
        c->median_y[mi].add(diff);
        // Z layer
        k_bits = (c->ic_dX.k() + c->ic_dY.k()) / 2;
        const I32 z = c->ic_Z.decompress(
            dec[kLz], c->last_z[l],
            (nr == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
        c->last_z[l] = z;
        // classification layer
        const U32 ci = (cpr << 5) | (last[16] & 31);
        const U8 cls = static_cast<U8>(dec[kLcls]->decode_symbol(
            lazy(&c->classification[ci], 256)));
        // flags layer: the 6 non-channel bits of byte 15
        const U32 lf =
            (last[15] & 0x0F) | ((last[15] >> 6) & 3) << 4;
        const U32 f =
            dec[kLflags]->decode_symbol(lazy(&c->flags[lf], 64));
        const U8 b15 = static_cast<U8>(
            (f & 0x0F) | (current_ << 4) | ((f >> 4) & 3) << 6);
        // intensity layer
        const U32 ii = (cpr << 1) | (gps_changed ? 1 : 0);
        const U16 intensity = static_cast<U16>(c->ic_intensity.decompress(
            dec[kLint], c->last_intensity[ii], cpr));
        c->last_intensity[ii] = intensity;
        // scan angle layer
        U16 scan_angle = get_u16(last + 18);
        if (changed & 8) {
            scan_angle = static_cast<U16>(c->ic_scan_angle.decompress(
                dec[kLscan], scan_angle, gps_changed ? 1 : 0));
        }
        // user data layer
        const U8 user = static_cast<U8>(dec[kLuser]->decode_symbol(
            lazy(&c->user_data[last[17] >> 2], 256)));
        // point source layer
        U16 psid = get_u16(last + 20);
        if (changed & 32) {
            psid = static_cast<U16>(
                c->ic_psid.decompress(dec[kLpsid], psid, 0));
        }
        // GPS time layer (the v2 sequence-tracking scheme per context)
        U8 gps[8];
        std::memcpy(gps, last + 22, 8);
        if (gps_changed) c->gps.read(dec[kLgps], gps);
        c->last_gps_changed = gps_changed;

        put_i32(item, x);
        put_i32(item + 4, y);
        put_i32(item + 8, z);
        put_u16(item + 12, intensity);
        item[14] = static_cast<U8>(rn | (nr << 4));
        item[15] = b15;
        item[16] = cls;
        item[17] = user;
        put_u16(item + 18, scan_angle);
        put_u16(item + 20, psid);
        std::memcpy(item + 22, gps, 8);
        std::memcpy(c->last, item, 30);
    }

    void write(ArithmeticEncoder* const* enc, const U8* item) {
        Ctx* c = ctx_[current_].get();
        const U32 last_rn = c->last[14] & 15;
        const U32 last_nr = (c->last[14] >> 4) & 15;
        const U32 lpr = (last_rn == 1 ? 1 : 0) |
                        (last_rn >= last_nr ? 2 : 0) |
                        (c->last_gps_changed ? 4 : 0);

        const U32 cc = (item[15] >> 4) & 3;
        const bool channel_changed = cc != current_;
        // the changed-values symbol is coded with the OLD context's
        // model, but every field compares against the NEW context's last
        // record (the decoder switches before applying them)
        Ctx* target = c;
        if (channel_changed) {
            if (ctx_[cc] == nullptr) ctx_init(cc, c->last);
            target = ctx_[cc].get();
        }
        const U8* last = target->last;
        const U32 l_rn = last[14] & 15;
        const U32 l_nr = (last[14] >> 4) & 15;
        const U32 rn = item[14] & 15;
        const U32 nr = (item[14] >> 4) & 15;
        const bool gps_changed =
            std::memcmp(item + 22, last + 22, 8) != 0;
        const bool nr_changed = nr != l_nr;
        const bool scan_changed =
            get_u16(item + 18) != get_u16(last + 18);
        const bool psid_changed =
            get_u16(item + 20) != get_u16(last + 20);
        U32 rn_mode;
        if (rn == l_rn) {
            rn_mode = 0;
        } else if (rn == ((l_rn + 1) & 15)) {
            rn_mode = 1;
        } else if (rn == ((l_rn + 15) & 15)) {
            rn_mode = 2;
        } else {
            rn_mode = 3;
        }
        const U32 changed = (channel_changed ? 64 : 0) |
                            (psid_changed ? 32 : 0) |
                            (gps_changed ? 16 : 0) |
                            (scan_changed ? 8 : 0) |
                            (nr_changed ? 4 : 0) | rn_mode;
        enc[kLxy]->encode_symbol(&c->changed_values[lpr], changed);
        if (channel_changed) {
            enc[kLxy]->encode_symbol(&c->scanner_channel,
                                     (cc - current_ - 1) & 3);
            current_ = cc;
            c = target;
        }
        if (nr_changed) {
            enc[kLxy]->encode_symbol(&c->number_of_returns[l_nr], nr);
        }
        if (rn_mode == 3) {
            if (gps_changed) {
                enc[kLxy]->encode_symbol(&c->return_number[l_rn], rn);
            } else {
                enc[kLxy]->encode_symbol(&c->return_number_gps_same,
                                         (rn - l_rn - 2) & 15);
            }
        }
        const U32 m = map6ctx(nr, rn);
        const U32 l = level8ctx(nr, rn);
        const U32 mi = (m << 1) | (gps_changed ? 1 : 0);
        const U32 cpr = ((rn == 1 ? 1u : 0u) << 1) | (rn >= nr ? 1u : 0u);

        I32 median = c->median_x[mi].get();
        I32 diff = get_i32(item) - get_i32(last);
        c->ic_dX.compress(enc[kLxy], median, diff, nr == 1);
        c->median_x[mi].add(diff);
        U32 k_bits = c->ic_dX.k();
        median = c->median_y[mi].get();
        diff = get_i32(item + 4) - get_i32(last + 4);
        c->ic_dY.compress(enc[kLxy], median, diff,
                          (nr == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
        c->median_y[mi].add(diff);
        k_bits = (c->ic_dX.k() + c->ic_dY.k()) / 2;
        c->ic_Z.compress(enc[kLz], c->last_z[l], get_i32(item + 8),
                         (nr == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
        c->last_z[l] = get_i32(item + 8);

        const U32 ci = (cpr << 5) | (last[16] & 31);
        enc[kLcls]->encode_symbol(lazy(&c->classification[ci], 256),
                                  item[16]);
        const U32 lf = (last[15] & 0x0F) | ((last[15] >> 6) & 3) << 4;
        const U32 f = (item[15] & 0x0F) | ((item[15] >> 6) & 3) << 4;
        enc[kLflags]->encode_symbol(lazy(&c->flags[lf], 64), f);
        const U32 ii = (cpr << 1) | (gps_changed ? 1 : 0);
        c->ic_intensity.compress(enc[kLint], c->last_intensity[ii],
                                 get_u16(item + 12), cpr);
        c->last_intensity[ii] = get_u16(item + 12);
        if (scan_changed) {
            c->ic_scan_angle.compress(enc[kLscan], get_u16(last + 18),
                                      get_u16(item + 18),
                                      gps_changed ? 1 : 0);
        }
        enc[kLuser]->encode_symbol(lazy(&c->user_data[last[17] >> 2], 256),
                                   item[17]);
        if (psid_changed) {
            c->ic_psid.compress(enc[kLpsid], get_u16(last + 20),
                                get_u16(item + 20), 0);
        }
        if (gps_changed) c->gps.write(enc[kLgps], item + 22);
        c->last_gps_changed = gps_changed;
        std::memcpy(c->last, item, 30);
    }

  private:
    struct Ctx {
        Ctx()
            : changed_values{ArithmeticModel(128), ArithmeticModel(128),
                             ArithmeticModel(128), ArithmeticModel(128),
                             ArithmeticModel(128), ArithmeticModel(128),
                             ArithmeticModel(128), ArithmeticModel(128)},
              scanner_channel(3),
              number_of_returns{
                  ArithmeticModel(16), ArithmeticModel(16),
                  ArithmeticModel(16), ArithmeticModel(16),
                  ArithmeticModel(16), ArithmeticModel(16),
                  ArithmeticModel(16), ArithmeticModel(16),
                  ArithmeticModel(16), ArithmeticModel(16),
                  ArithmeticModel(16), ArithmeticModel(16),
                  ArithmeticModel(16), ArithmeticModel(16),
                  ArithmeticModel(16), ArithmeticModel(16)},
              return_number{ArithmeticModel(16), ArithmeticModel(16),
                            ArithmeticModel(16), ArithmeticModel(16),
                            ArithmeticModel(16), ArithmeticModel(16),
                            ArithmeticModel(16), ArithmeticModel(16),
                            ArithmeticModel(16), ArithmeticModel(16),
                            ArithmeticModel(16), ArithmeticModel(16),
                            ArithmeticModel(16), ArithmeticModel(16),
                            ArithmeticModel(16), ArithmeticModel(16)},
              return_number_gps_same(16),
              ic_dX(32, 2),
              ic_dY(32, 22),
              ic_Z(32, 20),
              ic_intensity(16, 4),
              ic_scan_angle(16, 2),
              ic_psid(16, 1) {
            for (auto& s : median_x) s.init();
            for (auto& s : median_y) s.init();
            for (auto& z : last_z) z = 0;
            for (auto& i : last_intensity) i = 0;
            for (auto*& p : classification) p = nullptr;
            for (auto*& p : flags) p = nullptr;
            for (auto*& p : user_data) p = nullptr;
        }
        U8 last[30];
        bool last_gps_changed = false;
        ArithmeticModel changed_values[8];
        ArithmeticModel scanner_channel;
        ArithmeticModel number_of_returns[16];
        ArithmeticModel return_number[16];
        ArithmeticModel return_number_gps_same;
        IntegerCompressor ic_dX, ic_dY, ic_Z;
        IntegerCompressor ic_intensity, ic_scan_angle, ic_psid;
        StreamingMedian5 median_x[12], median_y[12];
        I32 last_z[8];
        U16 last_intensity[8];
        ArithmeticModel* classification[64];
        ArithmeticModel* flags[64];
        ArithmeticModel* user_data[64];
        GpsTime11v2 gps;
    };

    static ArithmeticModel* lazy(ArithmeticModel** slot, U32 syms) {
        if (*slot == nullptr) *slot = new ArithmeticModel(syms);
        return *slot;
    }

    void ctx_init(U32 cc, const U8* seed) {
        ctx_[cc] = std::make_unique<Ctx>();
        std::memcpy(ctx_[cc]->last, seed, 30);
        ctx_[cc]->gps.init(seed + 22);
    }

    std::unique_ptr<Ctx> ctx_[4];
    U32 current_ = 0;
};

// RGB14: the v2 RGB scheme with one state per scanner-channel context,
// coded into a single layer
class Rgb14v3 {
  public:
    static constexpr int kNumLayers = 1;

    void init(const U8* item, U32 context) {
        current_ = context;
        ctx_init(context, item);
    }

    void read(ArithmeticDecoder* dec, U8* item, U32 context) {
        sync(context);
        ctx_[current_]->read(dec, item);
    }

    void write(ArithmeticEncoder* enc, const U8* item, U32 context) {
        sync(context);
        ctx_[current_]->write(enc, item);
    }

  private:
    void ctx_init(U32 cc, const U8* seed) {
        ctx_[cc] = std::make_unique<Rgb12v2>();
        ctx_[cc]->init(seed);
    }
    void sync(U32 context) {
        if (context == current_) return;
        if (ctx_[context] == nullptr) {
            // seed from the active context's last RGB with fresh models
            // (mirrors POINT14's context creation — both sides derive
            // the same state)
            ctx_init(context, ctx_[current_]->last());
        }
        current_ = context;
    }
    std::unique_ptr<Rgb12v2> ctx_[4];
    U32 current_ = 0;
};

// NIR channel of RGBNIR14: 16-bit near-infrared, byte-diff coded like one
// RGB channel, own layer
class Nir14v3 {
  public:
    void init(const U8* item, U32 context) {
        current_ = context;
        ctx_init(context, get_u16(item));
    }

    U16 read(ArithmeticDecoder* dec, U32 context) {
        sync(context);
        Ctx& c = *ctx_[current_];
        const U32 sym = dec->decode_symbol(&c.used);
        U16 nir = c.last;
        if (sym & 1) {
            const U32 corr = dec->decode_symbol(&c.diff_lo);
            nir = (nir & 0xFF00) |
                  u8_fold(static_cast<I32>(corr) + (c.last & 0xFF));
        }
        if (sym & 2) {
            const U32 corr = dec->decode_symbol(&c.diff_hi);
            nir = (nir & 0x00FF) |
                  (static_cast<U16>(
                       u8_fold(static_cast<I32>(corr) + (c.last >> 8)))
                   << 8);
        }
        c.last = nir;
        return nir;
    }

    void write(ArithmeticEncoder* enc, U16 nir, U32 context) {
        sync(context);
        Ctx& c = *ctx_[current_];
        const bool lo = (nir & 0xFF) != (c.last & 0xFF);
        const bool hi = (nir >> 8) != (c.last >> 8);
        enc->encode_symbol(&c.used, (lo ? 1 : 0) | (hi ? 2 : 0));
        if (lo) {
            enc->encode_symbol(
                &c.diff_lo,
                u8_fold(static_cast<I32>(nir & 0xFF) - (c.last & 0xFF)));
        }
        if (hi) {
            enc->encode_symbol(
                &c.diff_hi,
                u8_fold(static_cast<I32>(nir >> 8) - (c.last >> 8)));
        }
        c.last = nir;
    }

  private:
    struct Ctx {
        explicit Ctx(U16 seed) : used(4), diff_lo(256), diff_hi(256),
                                 last(seed) {}
        ArithmeticModel used, diff_lo, diff_hi;
        U16 last;
    };
    void ctx_init(U32 cc, U16 seed) {
        ctx_[cc] = std::make_unique<Ctx>(seed);
    }
    void sync(U32 context) {
        if (context == current_) return;
        if (ctx_[context] == nullptr) {
            ctx_init(context, ctx_[current_]->last);
        }
        current_ = context;
    }
    std::unique_ptr<Ctx> ctx_[4];
    U32 current_ = 0;
};

// BYTE14 / WAVEPACKET14: per-byte delta models with one state per
// scanner-channel context. BYTE14 puts each byte in its own layer (the
// LASzip 3 selective-decompression unit); WAVEPACKET14 codes its 29
// bytes into one layer (simplified vs laszip's structured wavepacket
// models — lossless, flagged for certification).
class Bytes14v3 {
  public:
    Bytes14v3(U32 n, bool layer_per_byte)
        : n_(n), layer_per_byte_(layer_per_byte) {}

    U32 num_layers() const { return layer_per_byte_ ? n_ : 1; }

    void init(const U8* item, U32 context) {
        current_ = context;
        ctx_init(context, item);
    }

    void read(ArithmeticDecoder* const* dec, U8* item, U32 context) {
        sync(context);
        Ctx& c = *ctx_[current_];
        for (U32 i = 0; i < n_; ++i) {
            ArithmeticDecoder* d = dec[layer_per_byte_ ? i : 0];
            const U32 sym = d->decode_symbol(&c.models[i]);
            item[i] = u8_fold(static_cast<I32>(sym) + c.last[i]);
        }
        std::memcpy(c.last.data(), item, n_);
    }

    void write(ArithmeticEncoder* const* enc, const U8* item,
               U32 context) {
        sync(context);
        Ctx& c = *ctx_[current_];
        for (U32 i = 0; i < n_; ++i) {
            ArithmeticEncoder* e = enc[layer_per_byte_ ? i : 0];
            e->encode_symbol(
                &c.models[i],
                u8_fold(static_cast<I32>(item[i]) - c.last[i]));
        }
        std::memcpy(c.last.data(), item, n_);
    }

  private:
    struct Ctx {
        explicit Ctx(U32 n) {
            for (U32 i = 0; i < n; ++i) models.emplace_back(256);
            last.assign(n, 0);
        }
        std::vector<ArithmeticModel> models;
        std::vector<U8> last;
    };
    void ctx_init(U32 cc, const U8* seed) {
        ctx_[cc] = std::make_unique<Ctx>(n_);
        std::memcpy(ctx_[cc]->last.data(), seed, n_);
    }
    void sync(U32 context) {
        if (context == current_) return;
        if (ctx_[context] == nullptr) {
            ctx_[context] = std::make_unique<Ctx>(n_);
            ctx_[context]->last = ctx_[current_]->last;
        }
        current_ = context;
    }
    U32 n_;
    bool layer_per_byte_;
    std::unique_ptr<Ctx> ctx_[4];
    U32 current_ = 0;
};

// ---------------------------------------------------------------------
// chunk codec: item dispatch

// LASzip item type codes
constexpr U16 kItemByte = 0;
constexpr U16 kItemPoint10 = 6;
constexpr U16 kItemGpsTime11 = 7;
constexpr U16 kItemRgb12 = 8;
constexpr U16 kItemPoint14 = 10;
constexpr U16 kItemRgb14 = 11;
constexpr U16 kItemRgbNir14 = 12;
constexpr U16 kItemWavePacket14 = 13;
constexpr U16 kItemByte14 = 14;

struct ItemSet {
    Point10v2* point10 = nullptr;
    GpsTime11v2* gpstime = nullptr;
    Rgb12v2* rgb = nullptr;
    Byte2* bytes = nullptr;

    ~ItemSet() {
        delete point10;
        delete gpstime;
        delete rgb;
        delete bytes;
    }

    // returns the record stride, or -1 for an unsupported item list
    static I64 validate(const U16* types, const U16* sizes, int n) {
        I64 stride = 0;
        for (int i = 0; i < n; ++i) {
            switch (types[i]) {
                case kItemPoint10:
                    if (sizes[i] != 20) return -1;
                    break;
                case kItemGpsTime11:
                    if (sizes[i] != 8) return -1;
                    break;
                case kItemRgb12:
                    if (sizes[i] != 6) return -1;
                    break;
                case kItemByte:
                    if (sizes[i] < 1) return -1;
                    break;
                default:
                    return -1;
            }
            stride += sizes[i];
        }
        return stride;
    }
};

}  // namespace

extern "C" {

// Decompress one chunk: `in` starts at the raw first point. Returns bytes
// consumed from `in` (raw point + coded payload incl. decoder lookahead),
// or -1 on unsupported items / truncated input.
int64_t pc_laz_decompress_chunk(const uint8_t* in, int64_t in_len,
                                const uint16_t* item_types,
                                const uint16_t* item_sizes, int n_items,
                                int64_t n_points, uint8_t* out) {
    const I64 stride = ItemSet::validate(item_types, item_sizes, n_items);
    if (stride < 0 || n_points < 1 || in_len < stride) return -1;

    // raw first point
    std::memcpy(out, in, stride);

    ItemSet set;
    {
        const U8* p = out;
        for (int i = 0; i < n_items; ++i) {
            switch (item_types[i]) {
                case kItemPoint10:
                    set.point10 = new Point10v2();
                    set.point10->init(p);
                    break;
                case kItemGpsTime11:
                    set.gpstime = new GpsTime11v2();
                    set.gpstime->init(p);
                    break;
                case kItemRgb12:
                    set.rgb = new Rgb12v2();
                    set.rgb->init(p);
                    break;
                case kItemByte:
                    set.bytes = new Byte2(item_sizes[i]);
                    set.bytes->init(p);
                    break;
            }
            p += item_sizes[i];
        }
    }
    if (n_points == 1) return stride;

    ArithmeticDecoder dec(in + stride, in_len - stride);
    for (I64 k = 1; k < n_points; ++k) {
        U8* p = out + k * stride;
        for (int i = 0; i < n_items; ++i) {
            switch (item_types[i]) {
                case kItemPoint10:
                    set.point10->read(&dec, p);
                    break;
                case kItemGpsTime11:
                    set.gpstime->read(&dec, p);
                    break;
                case kItemRgb12:
                    set.rgb->read(&dec, p);
                    break;
                case kItemByte:
                    set.bytes->read(&dec, p);
                    break;
            }
            p += item_sizes[i];
        }
    }
    return stride + dec.consumed();
}

// Compress one chunk into `out` (capacity `out_cap`). Returns bytes
// written, or -1 on unsupported items / insufficient capacity.
int64_t pc_laz_compress_chunk(const uint8_t* in, int64_t n_points,
                              const uint16_t* item_types,
                              const uint16_t* item_sizes, int n_items,
                              uint8_t* out, int64_t out_cap) {
    const I64 stride = ItemSet::validate(item_types, item_sizes, n_items);
    if (stride < 0 || n_points < 1 || out_cap < stride) return -1;

    std::memcpy(out, in, stride);  // raw first point

    ItemSet set;
    {
        const U8* p = in;
        for (int i = 0; i < n_items; ++i) {
            switch (item_types[i]) {
                case kItemPoint10:
                    set.point10 = new Point10v2();
                    set.point10->init(p);
                    break;
                case kItemGpsTime11:
                    set.gpstime = new GpsTime11v2();
                    set.gpstime->init(p);
                    break;
                case kItemRgb12:
                    set.rgb = new Rgb12v2();
                    set.rgb->init(p);
                    break;
                case kItemByte:
                    set.bytes = new Byte2(item_sizes[i]);
                    set.bytes->init(p);
                    break;
            }
            p += item_sizes[i];
        }
    }
    if (n_points == 1) return stride;

    std::vector<U8> coded;
    coded.reserve(static_cast<size_t>(n_points) * 4);
    ArithmeticEncoder enc(&coded);
    for (I64 k = 1; k < n_points; ++k) {
        const U8* p = in + k * stride;
        for (int i = 0; i < n_items; ++i) {
            switch (item_types[i]) {
                case kItemPoint10:
                    set.point10->write(&enc, p);
                    break;
                case kItemGpsTime11:
                    set.gpstime->write(&enc, p);
                    break;
                case kItemRgb12:
                    set.rgb->write(&enc, p);
                    break;
                case kItemByte:
                    set.bytes->write(&enc, p);
                    break;
            }
            p += item_sizes[i];
        }
    }
    enc.done();
    if (stride + static_cast<I64>(coded.size()) > out_cap) return -1;
    std::memcpy(out + stride, coded.data(), coded.size());
    return stride + static_cast<I64>(coded.size());
}

// --- LASzip 3.x layered chunks (LAS 1.4 formats 6-10) -----------------

namespace {

// per-item layer counts; returns -1 on an unsupported item list (POINT14
// must lead — it owns the scanner-channel context the other items follow)
I64 validate14(const U16* types, const U16* sizes, int n, I64* stride,
               U32* n_layers) {
    *stride = 0;
    *n_layers = 0;
    if (n < 1 || types[0] != kItemPoint14) return -1;
    for (int i = 0; i < n; ++i) {
        switch (types[i]) {
            case kItemPoint14:
                if (i != 0 || sizes[i] != 30) return -1;
                *n_layers += Point14v3::kNumLayers;
                break;
            case kItemRgb14:
                if (sizes[i] != 6) return -1;
                *n_layers += 1;
                break;
            case kItemRgbNir14:
                if (sizes[i] != 8) return -1;
                *n_layers += 2;  // rgb + nir
                break;
            case kItemWavePacket14:
                if (sizes[i] != 29) return -1;
                *n_layers += 1;
                break;
            case kItemByte14:
                if (sizes[i] < 1) return -1;
                *n_layers += sizes[i];  // one layer per extra byte
                break;
            default:
                return -1;
        }
        *stride += sizes[i];
    }
    return 0;
}

struct ItemSet14 {
    Point14v3 point;
    std::unique_ptr<Rgb14v3> rgb;
    std::unique_ptr<Nir14v3> nir;
    std::unique_ptr<Bytes14v3> wavepacket;
    std::unique_ptr<Bytes14v3> bytes;
};

}  // namespace

// Decompress one layered chunk: `in` = [raw first point][u32 per-layer
// byte counts][layer payloads]. Returns bytes consumed, or -1 on
// unsupported items / truncated input.
int64_t pc_laz14_decompress_chunk(const uint8_t* in, int64_t in_len,
                                  const uint16_t* item_types,
                                  const uint16_t* item_sizes, int n_items,
                                  int64_t n_points, uint8_t* out) {
    I64 stride;
    U32 n_layers;
    if (validate14(item_types, item_sizes, n_items, &stride, &n_layers) <
            0 ||
        n_points < 1 || in_len < stride) {
        return -1;
    }
    std::memcpy(out, in, stride);  // raw first point
    if (n_points == 1) return stride + 4 * n_layers;

    if (in_len < stride + 4 * static_cast<I64>(n_layers)) return -1;
    std::vector<U32> layer_len(n_layers);
    I64 off = stride;
    I64 total = 0;
    for (U32 i = 0; i < n_layers; ++i) {
        std::memcpy(&layer_len[i], in + off, 4);
        off += 4;
        total += layer_len[i];
    }
    if (in_len < off + total) return -1;
    std::vector<std::unique_ptr<ArithmeticDecoder>> owners;
    std::vector<ArithmeticDecoder*> dec;
    owners.reserve(n_layers);
    dec.reserve(n_layers);
    for (U32 i = 0; i < n_layers; ++i) {
        owners.push_back(
            std::make_unique<ArithmeticDecoder>(in + off, layer_len[i]));
        dec.push_back(owners.back().get());
        off += layer_len[i];
    }

    ItemSet14 set;
    {
        const U8* p = out;
        for (int i = 0; i < n_items; ++i) {
            switch (item_types[i]) {
                case kItemPoint14:
                    set.point.init(p);
                    break;
                case kItemRgb14:
                    set.rgb = std::make_unique<Rgb14v3>();
                    set.rgb->init(p, set.point.context());
                    break;
                case kItemRgbNir14:
                    set.rgb = std::make_unique<Rgb14v3>();
                    set.rgb->init(p, set.point.context());
                    set.nir = std::make_unique<Nir14v3>();
                    set.nir->init(p + 6, set.point.context());
                    break;
                case kItemWavePacket14:
                    set.wavepacket =
                        std::make_unique<Bytes14v3>(29, false);
                    set.wavepacket->init(p, set.point.context());
                    break;
                case kItemByte14:
                    set.bytes =
                        std::make_unique<Bytes14v3>(item_sizes[i], true);
                    set.bytes->init(p, set.point.context());
                    break;
            }
            p += item_sizes[i];
        }
    }
    for (I64 k = 1; k < n_points; ++k) {
        U8* p = out + k * stride;
        U32 layer = 0;
        for (int i = 0; i < n_items; ++i) {
            // the non-POINT14 items follow the context POINT14 just
            // switched to for this point (POINT14 leads, validated)
            switch (item_types[i]) {
                case kItemPoint14:
                    set.point.read(dec.data() + layer, p);
                    layer += Point14v3::kNumLayers;
                    break;
                case kItemRgb14:
                    set.rgb->read(dec[layer], p, set.point.context());
                    layer += 1;
                    break;
                case kItemRgbNir14:
                    set.rgb->read(dec[layer], p, set.point.context());
                    put_u16(p + 6, set.nir->read(dec[layer + 1],
                                                 set.point.context()));
                    layer += 2;
                    break;
                case kItemWavePacket14:
                    set.wavepacket->read(dec.data() + layer, p,
                                         set.point.context());
                    layer += 1;
                    break;
                case kItemByte14:
                    set.bytes->read(dec.data() + layer, p,
                                    set.point.context());
                    layer += item_sizes[i];
                    break;
            }
            p += item_sizes[i];
        }
    }
    return off;
}

// Compress one layered chunk into `out` (capacity `out_cap`). Returns
// bytes written, or -1 on unsupported items / insufficient capacity.
int64_t pc_laz14_compress_chunk(const uint8_t* in, int64_t n_points,
                                const uint16_t* item_types,
                                const uint16_t* item_sizes, int n_items,
                                uint8_t* out, int64_t out_cap) {
    I64 stride;
    U32 n_layers;
    if (validate14(item_types, item_sizes, n_items, &stride, &n_layers) <
            0 ||
        n_points < 1 || out_cap < stride + 4 * static_cast<I64>(n_layers)) {
        return -1;
    }
    std::memcpy(out, in, stride);  // raw first point
    if (n_points == 1) return stride + 4 * n_layers;

    std::vector<std::vector<U8>> bufs(n_layers);
    std::vector<std::unique_ptr<ArithmeticEncoder>> owners;
    std::vector<ArithmeticEncoder*> enc;
    owners.reserve(n_layers);
    enc.reserve(n_layers);
    for (U32 i = 0; i < n_layers; ++i) {
        owners.push_back(std::make_unique<ArithmeticEncoder>(&bufs[i]));
        enc.push_back(owners.back().get());
    }

    ItemSet14 set;
    {
        const U8* p = in;
        for (int i = 0; i < n_items; ++i) {
            switch (item_types[i]) {
                case kItemPoint14:
                    set.point.init(p);
                    break;
                case kItemRgb14:
                    set.rgb = std::make_unique<Rgb14v3>();
                    set.rgb->init(p, set.point.context());
                    break;
                case kItemRgbNir14:
                    set.rgb = std::make_unique<Rgb14v3>();
                    set.rgb->init(p, set.point.context());
                    set.nir = std::make_unique<Nir14v3>();
                    set.nir->init(p + 6, set.point.context());
                    break;
                case kItemWavePacket14:
                    set.wavepacket =
                        std::make_unique<Bytes14v3>(29, false);
                    set.wavepacket->init(p, set.point.context());
                    break;
                case kItemByte14:
                    set.bytes =
                        std::make_unique<Bytes14v3>(item_sizes[i], true);
                    set.bytes->init(p, set.point.context());
                    break;
            }
            p += item_sizes[i];
        }
    }
    for (I64 k = 1; k < n_points; ++k) {
        const U8* p = in + k * stride;
        U32 layer = 0;
        for (int i = 0; i < n_items; ++i) {
            switch (item_types[i]) {
                case kItemPoint14:
                    set.point.write(enc.data() + layer, p);
                    layer += Point14v3::kNumLayers;
                    break;
                case kItemRgb14:
                    set.rgb->write(enc[layer], p, set.point.context());
                    layer += 1;
                    break;
                case kItemRgbNir14:
                    set.rgb->write(enc[layer], p, set.point.context());
                    set.nir->write(enc[layer + 1], get_u16(p + 6),
                                   set.point.context());
                    layer += 2;
                    break;
                case kItemWavePacket14:
                    set.wavepacket->write(enc.data() + layer, p,
                                          set.point.context());
                    layer += 1;
                    break;
                case kItemByte14:
                    set.bytes->write(enc.data() + layer, p,
                                     set.point.context());
                    layer += item_sizes[i];
                    break;
            }
            p += item_sizes[i];
        }
    }
    I64 off = stride;
    I64 total = 0;
    for (U32 i = 0; i < n_layers; ++i) {
        owners[i]->done();
        const U32 len = static_cast<U32>(bufs[i].size());
        if (off + 4 > out_cap) return -1;
        std::memcpy(out + off, &len, 4);
        off += 4;
        total += len;
    }
    if (off + total > out_cap) return -1;
    for (U32 i = 0; i < n_layers; ++i) {
        std::memcpy(out + off, bufs[i].data(), bufs[i].size());
        off += bufs[i].size();
    }
    return off;
}

// The chunk-size table (after the u32 version + u32 count header, which
// Python reads/writes): delta-coded with IntegerCompressor context 1.
int64_t pc_laz_decompress_chunk_table(const uint8_t* in, int64_t in_len,
                                      int64_t n_chunks,
                                      uint32_t* out_sizes) {
    if (n_chunks <= 0) return 0;
    ArithmeticDecoder dec(in, in_len);
    IntegerCompressor ic(32, 2);
    U32 prev = 0;
    for (I64 i = 0; i < n_chunks; ++i) {
        prev = static_cast<U32>(
            ic.decompress(&dec, static_cast<I32>(prev), 1));
        out_sizes[i] = prev;
    }
    return dec.consumed();
}

int64_t pc_laz_compress_chunk_table(const uint32_t* sizes,
                                    int64_t n_chunks, uint8_t* out,
                                    int64_t out_cap) {
    std::vector<U8> coded;
    ArithmeticEncoder enc(&coded);
    IntegerCompressor ic(32, 2);
    U32 prev = 0;
    for (I64 i = 0; i < n_chunks; ++i) {
        ic.compress(&enc, static_cast<I32>(prev),
                    static_cast<I32>(sizes[i]), 1);
        prev = sizes[i];
    }
    enc.done();
    if (static_cast<I64>(coded.size()) > out_cap) return -1;
    std::memcpy(out, coded.data(), coded.size());
    return static_cast<I64>(coded.size());
}

}  // extern "C"
