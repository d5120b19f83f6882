// Native audio wire-format decoders for the device->host PCM fetch.
//
// IMA/DVI-4 ADPCM expansion of the fleet voice streams: the device step
// (dsdneo_tpu/ops/audio_wire.py adpcm_compress) emits 4-bit codes, two
// per byte, one independent stream per (channel[, slot]) row starting
// from the standard (predictor=0, index=0) state.  At C>=256 channels a
// block carries tens of millions of samples, so the expansion runs here
// (striped across threads) instead of in Python.
//
// Reference counterpart: none -- the reference plays 16-bit PCM to a
// local audio backend (src/core/audio/dsd_audio.c:798); the wire codec
// exists because the rebuild synthesizes on an accelerator behind a
// bandwidth-limited link.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

const int32_t kStepTable[89] = {
    7,     8,     9,     10,    11,    12,    13,    14,    16,    17,
    19,    21,    23,    25,    28,    31,    34,    37,    41,    45,
    50,    55,    60,    66,    73,    80,    88,    97,    107,   118,
    130,   143,   157,   173,   190,   209,   230,   253,   279,   307,
    337,   371,   408,   449,   494,   544,   598,   658,   724,   796,
    876,   963,   1060,  1166,  1282,  1411,  1552,  1707,  1878,  2066,
    2272,  2499,  2749,  3024,  3327,  3660,  4026,  4428,  4871,  5358,
    5894,  6484,  7132,  7845,  8630,  9493,  10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767};

const int32_t kIndexTable[16] = {-1, -1, -1, -1, 2, 4, 6, 8,
                                 -1, -1, -1, -1, 2, 4, 6, 8};

inline void decode_stream(const uint8_t* in, int64_t n_bytes, float* out) {
    int32_t pred = 0;
    int32_t idx = 0;
    const float kScale = 1.0f / 32767.0f;
    for (int64_t i = 0; i < n_bytes; ++i) {
        uint8_t byte = in[i];
        for (int half = 0; half < 2; ++half) {
            int32_t code = half ? (byte >> 4) : (byte & 0xF);
            int32_t step = kStepTable[idx];
            int32_t vpdiff = step >> 3;
            if (code & 4) vpdiff += step;
            if (code & 2) vpdiff += step >> 1;
            if (code & 1) vpdiff += step >> 2;
            pred += (code & 8) ? -vpdiff : vpdiff;
            if (pred > 32767) pred = 32767;
            if (pred < -32768) pred = -32768;
            idx += kIndexTable[code];
            if (idx < 0) idx = 0;
            if (idx > 88) idx = 88;
            *out++ = static_cast<float>(pred) * kScale;
        }
    }
}

}  // namespace

extern "C" {

// blob: [n_streams, n_bytes] row-major packed 4-bit codes;
// out:  [n_streams, 2*n_bytes] float32.
void dsd_adpcm_decode(const uint8_t* blob, int64_t n_streams,
                      int64_t n_bytes, float* out) {
    int64_t total = n_streams * n_bytes;
    unsigned hw = std::thread::hardware_concurrency();
    int n_threads = (total > (64 << 10) && hw > 1)
                        ? static_cast<int>(hw > 8 ? 8 : hw)
                        : 1;
    if (n_threads <= 1 || n_streams == 1) {
        for (int64_t s = 0; s < n_streams; ++s) {
            decode_stream(blob + s * n_bytes, n_bytes,
                          out + s * 2 * n_bytes);
        }
        return;
    }
    std::atomic<int64_t> next{0};
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) {
        threads.emplace_back([&]() {
            for (;;) {
                int64_t s = next.fetch_add(1);
                if (s >= n_streams) return;
                decode_stream(blob + s * n_bytes, n_bytes,
                              out + s * 2 * n_bytes);
            }
        });
    }
    for (auto& th : threads) th.join();
}

}  // extern "C"
