// p2io — native host-side IO core for the TPU data pipeline.
//
// The training hot path reads minimal chunk-aligned windows out of zarr
// stores (reference Dataset_ZarrTrain, sti_dataset.py:286-307). The Python
// fallback decompresses chunks serially under the GIL; this library does the
// chunk read + decode (zstd / blosc / zlib / raw) + window assembly in
// parallel C++ worker threads, writing straight into the caller's output
// buffer. Exposed via a plain C ABI for ctypes (no pybind dependency).
//
// Build: see p2igan_tpu/data/native.py (g++ -O3 -shared -fPIC -fopenmp,
// linked against the system libzstd / libblosc / libz sonames).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

#include <zlib.h>

// Declare the remaining codec entry points directly (dev headers for blosc
// are not installed; link against the sonames).
extern "C" {
size_t ZSTD_decompress(void* dst, size_t dstCap, const void* src, size_t srcSize);
unsigned ZSTD_isError(size_t code);
size_t ZSTD_compressBound(size_t srcSize);
size_t ZSTD_compress(void* dst, size_t dstCap, const void* src, size_t srcSize, int level);
int blosc_decompress_ctx(const void* src, void* dest, size_t destsize, int numinternalthreads);
}

namespace {

enum Codec { RAW = 0, ZLIB = 1, ZSTD = 2, BLOSC = 3 };

// Read an entire file; returns bytes read or -1. Must never throw: this
// runs inside an OpenMP parallel region, where an escaping exception calls
// std::terminate and kills the host process instead of falling back to the
// Python reader.
long read_file(const char* path, std::vector<uint8_t>& buf) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    long n = -1;
    if (std::fseek(f, 0, SEEK_END) == 0) n = std::ftell(f);
    if (n < 0 || std::fseek(f, 0, SEEK_SET) != 0) {
        std::fclose(f);
        return -1;
    }
    try {
        buf.resize(static_cast<size_t>(n));
    } catch (...) {
        std::fclose(f);
        return -1;
    }
    size_t got = n > 0 ? std::fread(buf.data(), 1, static_cast<size_t>(n), f) : 0;
    std::fclose(f);
    return static_cast<long>(got);
}

int decode(const uint8_t* src, size_t src_n, uint8_t* dst, size_t dst_n, int codec) {
    switch (codec) {
        case RAW:
            if (src_n != dst_n) return -1;
            std::memcpy(dst, src, dst_n);
            return 0;
        case ZLIB: {
            // windowBits 15+32: auto-detect zlib (RFC 1950) vs gzip
            // (RFC 1952) framing — the Python side maps both codec ids
            // ("zlib", "gzip") onto this case, and plain uncompress()
            // rejects gzip-framed chunks outright.
            z_stream zs;
            std::memset(&zs, 0, sizeof(zs));
            if (inflateInit2(&zs, 15 + 32) != Z_OK) return -1;
            zs.next_in = const_cast<Bytef*>(src);
            zs.avail_in = static_cast<uInt>(src_n);
            zs.next_out = dst;
            zs.avail_out = static_cast<uInt>(dst_n);
            int r = inflate(&zs, Z_FINISH);
            size_t out_n = zs.total_out;
            inflateEnd(&zs);
            return (r == Z_STREAM_END && out_n == dst_n) ? 0 : -1;
        }
        case ZSTD: {
            size_t r = ZSTD_decompress(dst, dst_n, src, src_n);
            return (!ZSTD_isError(r) && r == dst_n) ? 0 : -1;
        }
        case BLOSC: {
            // r is the decompressed byte count; a truncated/corrupt chunk can
            // succeed with fewer bytes, which must not pass as a full chunk
            int r = blosc_decompress_ctx(src, dst, dst_n, 1);
            return (r >= 0 && static_cast<size_t>(r) == dst_n) ? 0 : -1;
        }
        default:
            return -1;
    }
}

}  // namespace

extern "C" {

// Assemble the window [t0:t0+wt, y0:y0+wy, x0:x0+wx] of a C-order chunked
// uint8 (T, H, W) array into `out` (wt*wy*wx bytes). `paths` lists the
// overlapping chunk files (empty string => missing chunk, zero-filled);
// `chunk_idx` gives each chunk's (it, iy, ix) grid position. Chunks are
// processed in parallel (OpenMP).
int p2io_read_window_u8(const char** paths, const int32_t* chunk_idx,
                        int32_t n_chunks,
                        int32_t st, int32_t sy, int32_t sx,
                        int32_t t0, int32_t y0, int32_t x0,
                        int32_t wt, int32_t wy, int32_t wx,
                        int32_t codec, uint8_t* out) {
    const size_t chunk_bytes = static_cast<size_t>(st) * sy * sx;
    int status = 0;

#pragma omp parallel for schedule(dynamic)
    for (int32_t c = 0; c < n_chunks; ++c) {
      // An exception escaping an OpenMP region is std::terminate: the vector
      // allocations below may throw bad_alloc under memory pressure, which
      // must become status=-1 (Python-reader fallback), not a host abort.
      try {
        const int32_t it = chunk_idx[3 * c + 0];
        const int32_t iy = chunk_idx[3 * c + 1];
        const int32_t ix = chunk_idx[3 * c + 2];
        const int64_t ct0 = static_cast<int64_t>(it) * st;
        const int64_t cy0 = static_cast<int64_t>(iy) * sy;
        const int64_t cx0 = static_cast<int64_t>(ix) * sx;

        // overlap of this chunk with the window, in absolute coords
        const int64_t at0 = ct0 > t0 ? ct0 : t0;
        const int64_t at1 = (ct0 + st) < (t0 + wt) ? (ct0 + st) : (t0 + wt);
        const int64_t ay0 = cy0 > y0 ? cy0 : y0;
        const int64_t ay1 = (cy0 + sy) < (y0 + wy) ? (cy0 + sy) : (y0 + wy);
        const int64_t ax0 = cx0 > x0 ? cx0 : x0;
        const int64_t ax1 = (cx0 + sx) < (x0 + wx) ? (cx0 + sx) : (x0 + wx);
        if (at1 <= at0 || ay1 <= ay0 || ax1 <= ax0) continue;

        std::vector<uint8_t> chunk(chunk_bytes);
        bool have = false;
        if (paths[c] != nullptr && paths[c][0] != '\0') {
            std::vector<uint8_t> raw;
            long n = read_file(paths[c], raw);
            if (n >= 0 && decode(raw.data(), static_cast<size_t>(n),
                                 chunk.data(), chunk_bytes, codec) == 0) {
                have = true;
            } else {
#pragma omp atomic write
                status = -1;
            }
        }
        if (!have) std::memset(chunk.data(), 0, chunk_bytes);

        const int64_t span_x = ax1 - ax0;
        for (int64_t t = at0; t < at1; ++t) {
            for (int64_t y = ay0; y < ay1; ++y) {
                const uint8_t* src = chunk.data() +
                    ((t - ct0) * sy + (y - cy0)) * sx + (ax0 - cx0);
                uint8_t* dst = out +
                    ((t - t0) * wy + (y - y0)) * static_cast<int64_t>(wx) + (ax0 - x0);
                std::memcpy(dst, src, static_cast<size_t>(span_x));
            }
        }
      } catch (...) {
#pragma omp atomic write
        status = -1;
      }
    }
    return status;
}

// zstd compression helper (store writer fast path).
int64_t p2io_zstd_compress(const uint8_t* src, int64_t src_n, uint8_t* dst,
                           int64_t dst_cap, int32_t level) {
    size_t r = ZSTD_compress(dst, static_cast<size_t>(dst_cap), src,
                             static_cast<size_t>(src_n), level);
    if (ZSTD_isError(r)) return -1;
    return static_cast<int64_t>(r);
}

}  // extern "C"
