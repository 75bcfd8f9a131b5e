// SRTM .hgt tile reader: big-endian int16 grid -> float64, with no-data
// counting. Native replacement for the reference's numpy frombuffer path
// (real_world_datasets.py:527-572); called through ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libhgtio.so hgtio.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Reads n*n big-endian int16 samples from `path` into `out` (float64).
// Returns the number of no-data (-32768) samples, or -1 on IO error,
// -2 on short read.
long long read_hgt(const char* path, long long n, double* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;

    const long long total = n * n;
    const size_t chunk_elems = 1 << 20;
    uint16_t* buf = new uint16_t[chunk_elems];
    long long done = 0;
    long long nodata = 0;

    while (done < total) {
        size_t want = static_cast<size_t>(
            total - done < static_cast<long long>(chunk_elems) ? total - done
                                                               : chunk_elems);
        size_t got = std::fread(buf, sizeof(uint16_t), want, f);
        if (got != want) {
            delete[] buf;
            std::fclose(f);
            return -2;
        }
        for (size_t i = 0; i < got; ++i) {
            uint16_t be = buf[i];
            uint16_t le = static_cast<uint16_t>((be >> 8) | (be << 8));
            int16_t v = static_cast<int16_t>(le);
            if (v == -32768) ++nodata;
            out[done + static_cast<long long>(i)] = static_cast<double>(v);
        }
        done += static_cast<long long>(got);
    }
    delete[] buf;
    std::fclose(f);
    return nodata;
}

}  // extern "C"
