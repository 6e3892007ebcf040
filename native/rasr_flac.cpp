// Native FLAC decoder (subset of the format used for speech corpora).
//
// The reference reads FLAC through libflac behind its audio input nodes
// (src/Audio/Flac.hh, src/Audio/Node.hh); this is a dependency-free
// native decoder covering the full mainline format: STREAMINFO parsing,
// fixed + LPC subframes (orders up to 32), RICE/RICE2 residual
// partitions with escape codes, wasted bits, and all stereo
// decorrelation modes (left/side, right/side, mid/side).  Exported via
// ctypes like the WAV reader in rasr_io.cpp.
//
// Output convention matches audio.reader: 16-bit sources keep their
// integer sample values as float32; other bit depths are scaled by
// 2^(16-bps) into the same range.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

class BitReader {
  public:
    BitReader(const uint8_t* data, size_t len) : data_(data), len_(len) {}

    bool ok() const { return ok_; }
    size_t byte_pos() const { return pos_; }
    bool at_end() const { return pos_ >= len_ && nbits_ == 0; }

    // Reads up to 32 bits MSB-first.
    uint32_t bits(int n) {
        uint64_t v = 0;
        while (n > 0 && ok_) {
            if (nbits_ == 0) {
                if (pos_ >= len_) { ok_ = false; break; }
                cur_ = data_[pos_++];
                nbits_ = 8;
            }
            int take = n < nbits_ ? n : nbits_;
            v = (v << take) | ((cur_ >> (nbits_ - take)) & ((1u << take) - 1));
            nbits_ -= take;
            n -= take;
        }
        return ok_ ? (uint32_t)v : 0;
    }

    int32_t signed_bits(int n) {
        uint32_t v = bits(n);
        if (n == 0 || n == 32) return (int32_t)v;
        uint32_t sign = 1u << (n - 1);
        return (int32_t)((v ^ sign)) - (int32_t)sign;
    }

    // Counts 0 bits until (and consuming) the terminating 1 bit.
    uint32_t unary() {
        uint32_t q = 0;
        while (ok_) {
            if (nbits_ == 0) {
                if (pos_ >= len_) { ok_ = false; break; }
                cur_ = data_[pos_++];
                nbits_ = 8;
            }
            int bit = (cur_ >> (nbits_ - 1)) & 1;
            nbits_--;
            if (bit) return q;
            q++;
            if (q > (1u << 30)) { ok_ = false; break; }  // corrupt stream
        }
        return 0;
    }

    void align() { nbits_ = 0; }

    void skip_bytes(size_t n) {
        align();
        pos_ += n;
        if (pos_ > len_) ok_ = false;
    }

  private:
    const uint8_t* data_;
    size_t len_;
    size_t pos_ = 0;
    uint8_t cur_ = 0;
    int nbits_ = 0;
    bool ok_ = true;
};

struct StreamInfo {
    uint32_t sample_rate = 0;
    uint32_t channels = 0;
    uint32_t bps = 0;
    uint64_t total_samples = 0;  // 0 = unknown
};

// UTF-8 style coded number in frame headers (frame or sample index,
// up to 36 bits / 7 bytes).
bool read_coded_number(BitReader& br, uint64_t* out) {
    uint32_t b0 = br.bits(8);
    if (!br.ok()) return false;
    int extra;
    uint64_t v;
    if ((b0 & 0x80) == 0) { v = b0; extra = 0; }
    else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
    else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
    else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
    else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
    else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
    else if (b0 == 0xFE) { v = 0; extra = 6; }
    else return false;
    for (int i = 0; i < extra; ++i) {
        uint32_t b = br.bits(8);
        if (!br.ok() || (b & 0xC0) != 0x80) return false;
        v = (v << 6) | (b & 0x3F);
    }
    *out = v;
    return true;
}

// Rice-partitioned residual into res[0..blocksize-order).
bool read_residual(BitReader& br, uint32_t blocksize, uint32_t order,
                   int32_t* res) {
    uint32_t method = br.bits(2);
    if (method > 1) return false;
    int plen = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t porder = br.bits(4);
    uint32_t nparts = 1u << porder;
    if ((blocksize >> porder) << porder != blocksize) return false;
    uint32_t idx = 0;
    for (uint32_t p = 0; p < nparts; ++p) {
        uint32_t count = blocksize >> porder;
        if (p == 0) {
            if (count < order) return false;
            count -= order;
        }
        uint32_t param = br.bits(plen);
        if (!br.ok()) return false;
        if (param == escape) {
            uint32_t raw = br.bits(5);
            for (uint32_t i = 0; i < count; ++i)
                res[idx++] = raw ? br.signed_bits(raw) : 0;
        } else {
            for (uint32_t i = 0; i < count; ++i) {
                uint32_t q = br.unary();
                uint32_t r = param ? br.bits(param) : 0;
                uint32_t u = (q << param) | r;
                res[idx++] = (int32_t)(u >> 1) ^ -(int32_t)(u & 1);
            }
        }
        if (!br.ok()) return false;
    }
    return true;
}

// One subframe into out[0..blocksize); bps includes the +1 side-channel
// extension when applicable.
bool read_subframe(BitReader& br, uint32_t blocksize, uint32_t bps,
                   int64_t* out) {
    if (br.bits(1) != 0) return false;  // zero padding bit
    uint32_t type = br.bits(6);
    uint32_t wasted = 0;
    if (br.bits(1)) wasted = br.unary() + 1;
    if (!br.ok() || wasted >= bps) return false;
    bps -= wasted;

    std::vector<int32_t> res(blocksize);
    if (type == 0) {  // constant
        int32_t v = br.signed_bits(bps);
        for (uint32_t i = 0; i < blocksize; ++i) out[i] = v;
    } else if (type == 1) {  // verbatim
        for (uint32_t i = 0; i < blocksize; ++i)
            out[i] = br.signed_bits(bps);
    } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // fixed
        uint32_t order = type & 0x07;
        for (uint32_t i = 0; i < order; ++i) out[i] = br.signed_bits(bps);
        if (!read_residual(br, blocksize, order, res.data())) return false;
        for (uint32_t i = order; i < blocksize; ++i) {
            int64_t p;
            switch (order) {
                case 0: p = 0; break;
                case 1: p = out[i - 1]; break;
                case 2: p = 2 * out[i - 1] - out[i - 2]; break;
                case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
                    break;
                default: p = 4 * out[i - 1] - 6 * out[i - 2]
                             + 4 * out[i - 3] - out[i - 4];
            }
            out[i] = p + res[i - order];
        }
    } else if (type & 0x20) {  // LPC
        uint32_t order = (type & 0x1F) + 1;
        if (order > blocksize) return false;
        for (uint32_t i = 0; i < order; ++i) out[i] = br.signed_bits(bps);
        uint32_t prec = br.bits(4);
        if (prec == 0xF) return false;
        prec += 1;
        int32_t shift = br.signed_bits(5);
        if (shift < 0) return false;
        std::vector<int32_t> coef(order);
        for (uint32_t i = 0; i < order; ++i) coef[i] = br.signed_bits(prec);
        if (!read_residual(br, blocksize, order, res.data())) return false;
        for (uint32_t i = order; i < blocksize; ++i) {
            int64_t acc = 0;
            for (uint32_t j = 0; j < order; ++j)
                acc += (int64_t)coef[j] * out[i - 1 - j];
            out[i] = (acc >> shift) + res[i - order];
        }
    } else {
        return false;
    }
    if (!br.ok()) return false;
    if (wasted)
        for (uint32_t i = 0; i < blocksize; ++i)
            out[i] = out[i] << wasted;
    return true;
}

struct Frame {
    uint32_t blocksize = 0;
    uint32_t channels = 0;
    uint32_t assignment = 0;  // 0-7 independent, 8 L/S, 9 R/S, 10 M/S
    uint32_t bps = 0;
    uint32_t sample_rate = 0;
};

bool read_frame_header(BitReader& br, const StreamInfo& si, Frame* fr) {
    if (br.bits(14) != 0x3FFE) return false;  // sync
    br.bits(1);                                // reserved
    br.bits(1);                                // blocking strategy
    uint32_t bs_code = br.bits(4);
    uint32_t sr_code = br.bits(4);
    uint32_t ch_code = br.bits(4);
    uint32_t ss_code = br.bits(3);
    br.bits(1);  // reserved
    uint64_t coded;
    if (!read_coded_number(br, &coded)) return false;

    switch (bs_code) {
        case 0: return false;
        case 1: fr->blocksize = 192; break;
        case 6: fr->blocksize = br.bits(8) + 1; break;
        case 7: fr->blocksize = br.bits(16) + 1; break;
        default:
            fr->blocksize = bs_code <= 5 ? 576u << (bs_code - 2)
                                         : 256u << (bs_code - 8);
    }
    static const uint32_t kRates[12] = {0, 88200, 176400, 192000, 8000,
                                        16000, 22050, 24000, 32000, 44100,
                                        48000, 96000};
    if (sr_code == 0) fr->sample_rate = si.sample_rate;
    else if (sr_code <= 11) fr->sample_rate = kRates[sr_code];
    else if (sr_code == 12) fr->sample_rate = br.bits(8) * 1000;
    else if (sr_code == 13) fr->sample_rate = br.bits(16);
    else if (sr_code == 14) fr->sample_rate = br.bits(16) * 10;
    else return false;

    fr->assignment = ch_code;
    if (ch_code <= 7) fr->channels = ch_code + 1;
    else if (ch_code <= 10) fr->channels = 2;
    else return false;

    static const uint32_t kSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};
    if (ss_code == 0) fr->bps = si.bps;
    else if (ss_code == 3) return false;
    else fr->bps = kSizes[ss_code];

    br.bits(8);  // header CRC-8 (integrity delegated to frame structure)
    return br.ok();
}

struct Decoded {
    std::vector<float> samples;  // selected track
    StreamInfo info;
    bool ok = false;
};

bool decode_file(const char* path, int track, Decoded* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (fsize <= 42) { fclose(f); return false; }
    std::vector<uint8_t> buf(fsize);
    if (fread(buf.data(), 1, fsize, f) != (size_t)fsize) {
        fclose(f);
        return false;
    }
    fclose(f);

    if (memcmp(buf.data(), "fLaC", 4) != 0) return false;
    BitReader br(buf.data() + 4, buf.size() - 4);

    StreamInfo si;
    bool last = false, have_info = false;
    while (!last && br.ok()) {
        last = br.bits(1);
        uint32_t type = br.bits(7);
        uint32_t len = br.bits(24);
        if (type == 0 && len >= 34) {
            br.bits(16);  // min blocksize
            br.bits(16);  // max blocksize
            br.bits(24);  // min framesize
            br.bits(24);  // max framesize
            si.sample_rate = br.bits(20);
            si.channels = br.bits(3) + 1;
            si.bps = br.bits(5) + 1;
            si.total_samples = ((uint64_t)br.bits(4) << 32) | br.bits(32);
            br.skip_bytes(16 + (len - 34));  // MD5 + extensions
            have_info = true;
        } else {
            br.skip_bytes(len);
        }
    }
    if (!br.ok() || !have_info || si.channels == 0 || si.bps == 0)
        return false;
    if (track < 0 || (uint32_t)track >= si.channels) track = 0;

    out->info = si;
    if (si.total_samples)
        out->samples.reserve((size_t)si.total_samples);
    float scale = 1.0f;
    if (si.bps < 16) scale = (float)(1u << (16 - si.bps));
    else if (si.bps > 16) scale = 1.0f / (float)(1u << (si.bps - 16));

    std::vector<std::vector<int64_t>> ch;
    while (br.ok() && !br.at_end()) {
        Frame fr;
        if (!read_frame_header(br, si, &fr)) break;
        if (fr.channels != si.channels || fr.blocksize == 0) return false;
        ch.assign(fr.channels, std::vector<int64_t>(fr.blocksize));
        bool good = true;
        for (uint32_t c = 0; c < fr.channels && good; ++c) {
            uint32_t bps = fr.bps;
            // The difference (side) channel carries one extra bit.
            if ((fr.assignment == 8 && c == 1) ||
                (fr.assignment == 9 && c == 0) ||
                (fr.assignment == 10 && c == 1))
                bps += 1;
            good = read_subframe(br, fr.blocksize, bps, ch[c].data());
        }
        if (!good) return false;
        br.align();
        br.bits(16);  // frame CRC-16
        if (!br.ok()) return false;

        if (fr.assignment == 8) {          // left/side: r = l - s
            for (uint32_t i = 0; i < fr.blocksize; ++i)
                ch[1][i] = ch[0][i] - ch[1][i];
        } else if (fr.assignment == 9) {   // right/side: l = r + s
            for (uint32_t i = 0; i < fr.blocksize; ++i)
                ch[0][i] = ch[1][i] + ch[0][i];
        } else if (fr.assignment == 10) {  // mid/side
            for (uint32_t i = 0; i < fr.blocksize; ++i) {
                int64_t mid = ch[0][i], side = ch[1][i];
                mid = (mid << 1) | (side & 1);
                ch[0][i] = (mid + side) >> 1;
                ch[1][i] = (mid - side) >> 1;
            }
        }
        for (uint32_t i = 0; i < fr.blocksize; ++i)
            out->samples.push_back((float)ch[track][i] * scale);
        if (si.total_samples && out->samples.size() >= si.total_samples) {
            out->samples.resize((size_t)si.total_samples);
            break;
        }
    }
    out->ok = !out->samples.empty();
    return out->ok;
}

}  // namespace

extern "C" {

// Reads one FLAC file; returns per-channel sample count or -1.  Two-phase
// like rasr_wav_read: with a null buffer only the count + rate return.
int64_t rasr_flac_read(const char* path, int track, float* buffer,
                       int64_t capacity, uint32_t* sample_rate_out) {
    Decoded d;
    if (!decode_file(path, track, &d)) return -1;
    if (sample_rate_out) *sample_rate_out = d.info.sample_rate;
    int64_t n = (int64_t)d.samples.size();
    if (buffer) {
        int64_t copy = n < capacity ? n : capacity;
        memcpy(buffer, d.samples.data(), copy * sizeof(float));
    }
    return n;
}

}  // extern "C"
