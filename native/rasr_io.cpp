// Native IO runtime: SP_ARC1 archive scanning + feature-cache unpacking.
//
// The reference implements its archive/cache runtime in C++
// (src/Core/FileArchive.cc, src/Flow/Cache.cc); this library is the
// TPU framework's native data-loader path: it memory-reads a cache archive,
// inflates items and unpacks gathered vector-f32 frames into one contiguous
// float32 buffer ready for device upload — called from Python via ctypes
// (no pybind11 dependency).
//
// Build: g++ -O3 -shared -fPIC -o librasr_io.so rasr_io.cpp -lz

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

constexpr char kMagic[8] = {'S', 'P', '_', 'A', 'R', 'C', '1', '\0'};

struct Item {
    uint64_t position;  // offset of the sizes field
    uint32_t uncompressed;
    uint32_t compressed;  // 0 = stored
};

struct Archive {
    std::string path;
    FILE* file = nullptr;
    std::unordered_map<std::string, Item> items;
    std::vector<std::string> keys;
};

bool read_exact(FILE* f, void* buf, size_t n) {
    return fread(buf, 1, n, f) == n;
}

template <typename T>
bool read_pod(FILE* f, T* out) {
    return read_exact(f, out, sizeof(T));
}

}  // namespace

extern "C" {

// Opens an archive, parses the info table; returns an opaque handle or null.
void* rasr_archive_open(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    char magic[8];
    if (!read_exact(f, magic, 8) || memcmp(magic, kMagic, 8) != 0) {
        fclose(f);
        return nullptr;
    }
    unsigned char flag = 0;
    if (!read_pod(f, &flag) || !flag) {
        fclose(f);
        return nullptr;  // unfinished archives: Python fallback scans tags
    }
    if (fseek(f, -16, SEEK_END) != 0) { fclose(f); return nullptr; }
    uint64_t empty_pos = 0, table_pos = 0;
    if (!read_pod(f, &empty_pos) || !read_pod(f, &table_pos)) {
        fclose(f);
        return nullptr;
    }
    if (fseek(f, (long)table_pos, SEEK_SET) != 0) { fclose(f); return nullptr; }
    uint32_t count = 0;
    if (!read_pod(f, &count)) { fclose(f); return nullptr; }
    auto* ar = new Archive;
    ar->path = path;
    ar->file = f;
    ar->keys.reserve(count);
    for (uint32_t i = 0; i < count; ++i) {
        uint32_t nlen = 0;
        if (!read_pod(f, &nlen) || nlen > (1u << 20)) { break; }
        std::string name(nlen, '\0');
        if (!read_exact(f, name.data(), nlen)) break;
        Item item;
        if (!read_pod(f, &item.position) || !read_pod(f, &item.uncompressed)
            || !read_pod(f, &item.compressed)) break;
        ar->items.emplace(name, item);
        ar->keys.push_back(std::move(name));
    }
    return ar;
}

void rasr_archive_close(void* handle) {
    auto* ar = static_cast<Archive*>(handle);
    if (!ar) return;
    if (ar->file) fclose(ar->file);
    delete ar;
}

int64_t rasr_archive_n_items(void* handle) {
    auto* ar = static_cast<Archive*>(handle);
    return ar ? (int64_t)ar->keys.size() : -1;
}

// Copies the i-th key into buf (returns required length).
int64_t rasr_archive_key(void* handle, int64_t index, char* buf,
                         int64_t buf_len) {
    auto* ar = static_cast<Archive*>(handle);
    if (!ar || index < 0 || (size_t)index >= ar->keys.size()) return -1;
    const std::string& k = ar->keys[index];
    if (buf && buf_len > (int64_t)k.size()) {
        memcpy(buf, k.data(), k.size());
        buf[k.size()] = '\0';
    }
    return (int64_t)k.size();
}

// Reads + inflates an item; returns uncompressed size or -1.
// If out is null, only the size is returned (two-phase API).
int64_t rasr_archive_read(void* handle, const char* name, uint8_t* out,
                          int64_t out_len) {
    auto* ar = static_cast<Archive*>(handle);
    if (!ar) return -1;
    auto it = ar->items.find(name);
    if (it == ar->items.end()) return -1;
    const Item& item = it->second;
    if (!out) return (int64_t)item.uncompressed;
    if (out_len < (int64_t)item.uncompressed) return -1;
    if (fseek(ar->file, (long)item.position, SEEK_SET) != 0) return -1;
    uint32_t unc = 0, comp = 0, checksum = 0;
    if (!read_pod(ar->file, &unc) || !read_pod(ar->file, &comp)
        || !read_pod(ar->file, &checksum)) return -1;
    if (comp == 0) {
        if (!read_exact(ar->file, out, unc)) return -1;
        return (int64_t)unc;
    }
    std::vector<uint8_t> zbuf(comp);
    if (!read_exact(ar->file, zbuf.data(), comp)) return -1;
    uLongf dest_len = unc;
    if (uncompress(out, &dest_len, zbuf.data(), comp) != Z_OK
        || dest_len != unc) return -1;
    return (int64_t)unc;
}

// Parses a gathered vector-f32 cache item (datatype string + frames) into
// caller buffers.  Two-phase: with null outputs, returns n_frames and
// writes dim to *dim_out.  Returns -1 on malformed input.
int64_t rasr_cache_unpack(const uint8_t* data, int64_t data_len,
                          float* feats_out, double* starts_out,
                          double* ends_out, int64_t* dim_out) {
    const uint8_t* p = data;
    const uint8_t* end = data + data_len;
    auto need = [&](size_t n) { return (size_t)(end - p) >= n; };
    if (!need(4)) return -1;
    uint32_t nlen;
    memcpy(&nlen, p, 4);
    p += 4;
    if (!need(nlen)) return -1;
    p += nlen;  // datatype name (validated by the Python layer)
    if (!need(4)) return -1;
    uint32_t n_frames;
    memcpy(&n_frames, p, 4);
    p += 4;
    int64_t dim = -1;
    for (uint32_t t = 0; t < n_frames; ++t) {
        if (!need(4)) return -1;
        uint32_t d;
        memcpy(&d, p, 4);
        p += 4;
        if (dim < 0) {
            dim = d;
            if (dim_out) *dim_out = dim;
        } else if ((int64_t)d != dim) {
            return -1;
        }
        if (!need(4ull * d + 16)) return -1;
        if (feats_out) {
            memcpy(feats_out + (size_t)t * d, p, 4ull * d);
        }
        p += 4ull * d;
        if (starts_out) memcpy(starts_out + t, p, 8);
        if (ends_out) memcpy(ends_out + t, p + 8, 8);
        p += 16;
    }
    return (int64_t)n_frames;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched WAV reading (native data-loader front: RIFF parse + PCM->f32,
// multi-threaded over files).  Matches the Python audio.reader value
// conventions: 16-bit keeps integer range, 8-bit recentered *256,
// 32-bit /65536 (reference sample convention).
// ---------------------------------------------------------------------------

#include <thread>

namespace {

struct WavData {
    std::vector<float> samples;  // selected track
    uint32_t sample_rate = 0;
    bool ok = false;
};

bool parse_wav(const char* path, int track, WavData* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    char riff[4], wave_tag[4];
    uint32_t riff_size = 0;
    if (!read_exact(f, riff, 4) || memcmp(riff, "RIFF", 4) != 0 ||
        !read_pod(f, &riff_size) || !read_exact(f, wave_tag, 4) ||
        memcmp(wave_tag, "WAVE", 4) != 0) {
        fclose(f);
        return false;
    }
    uint16_t format = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    std::vector<unsigned char> data;
    while (true) {
        char id[4];
        uint32_t size = 0;
        if (!read_exact(f, id, 4) || !read_pod(f, &size)) break;
        if (memcmp(id, "fmt ", 4) == 0) {
            uint16_t block_align = 0;
            uint32_t byte_rate = 0;
            read_pod(f, &format);
            read_pod(f, &channels);
            read_pod(f, &rate);
            read_pod(f, &byte_rate);
            read_pod(f, &block_align);
            read_pod(f, &bits);
            if (size > 16) fseek(f, size - 16, SEEK_CUR);
        } else if (memcmp(id, "data", 4) == 0) {
            data.resize(size);
            if (!read_exact(f, data.data(), size)) {
                fclose(f);
                return false;
            }
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
        if (!data.empty() && rate) break;
    }
    fclose(f);
    if (data.empty() || channels == 0 || rate == 0) return false;
    if (format != 1 && format != 3) return false;  // PCM / IEEE float
    size_t bytes_per = bits / 8;
    size_t n_frames = data.size() / (bytes_per * channels);
    if (track >= channels) track = 0;
    out->samples.resize(n_frames);
    const unsigned char* p = data.data() + track * bytes_per;
    size_t stride = bytes_per * channels;
    if (format == 3 && bits == 32) {
        for (size_t i = 0; i < n_frames; ++i, p += stride) {
            float v;
            memcpy(&v, p, 4);
            out->samples[i] = v;
        }
    } else if (bits == 16) {
        for (size_t i = 0; i < n_frames; ++i, p += stride) {
            int16_t v;
            memcpy(&v, p, 2);
            out->samples[i] = static_cast<float>(v);
        }
    } else if (bits == 8) {
        for (size_t i = 0; i < n_frames; ++i, p += stride)
            out->samples[i] = (static_cast<float>(*p) - 128.0f) * 256.0f;
    } else if (bits == 32) {
        for (size_t i = 0; i < n_frames; ++i, p += stride) {
            int32_t v;
            memcpy(&v, p, 4);
            out->samples[i] = static_cast<float>(v) / 65536.0f;
        }
    } else {
        return false;
    }
    out->sample_rate = rate;
    out->ok = true;
    return true;
}

}  // namespace

extern "C" {

// Reads one WAV; returns sample count or -1.  Caller passes a buffer of
// `capacity` floats; sample_rate_out receives the rate.
int64_t rasr_wav_read(const char* path, int track, float* buffer,
                      int64_t capacity, uint32_t* sample_rate_out) {
    WavData w;
    if (!parse_wav(path, track, &w)) return -1;
    int64_t n = static_cast<int64_t>(w.samples.size());
    if (sample_rate_out) *sample_rate_out = w.sample_rate;
    if (buffer && capacity >= n)
        memcpy(buffer, w.samples.data(), n * sizeof(float));
    else if (buffer)
        memcpy(buffer, w.samples.data(), capacity * sizeof(float));
    return n;
}

// Batched multi-threaded read: n files into one padded (n, max_len)
// row-major buffer; lengths_out[i] = samples in row i (-1 = failed).
// Returns 0 on success (individual failures flagged in lengths_out).
int rasr_wav_read_batch(const char** paths, int n, int track,
                        float* buffer, int64_t max_len,
                        int64_t* lengths_out, uint32_t* rates_out,
                        int n_threads) {
    if (n_threads <= 0) n_threads = 4;
    std::vector<std::thread> workers;
    int per = (n + n_threads - 1) / n_threads;
    for (int w = 0; w < n_threads; ++w) {
        int lo = w * per, hi = lo + per < n ? lo + per : n;
        if (lo >= hi) break;
        workers.emplace_back([=]() {
            for (int i = lo; i < hi; ++i) {
                WavData wd;
                if (!parse_wav(paths[i], track, &wd)) {
                    lengths_out[i] = -1;
                    if (rates_out) rates_out[i] = 0;
                    continue;
                }
                int64_t len = static_cast<int64_t>(wd.samples.size());
                if (len > max_len) len = max_len;
                memcpy(buffer + i * max_len, wd.samples.data(),
                       len * sizeof(float));
                lengths_out[i] = len;
                if (rates_out) rates_out[i] = wd.sample_rate;
            }
        });
    }
    for (auto& t : workers) t.join();
    return 0;
}

}  // extern "C"
