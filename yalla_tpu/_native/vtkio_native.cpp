// Fast legacy-VTK ASCII serialization/parsing.
//
// Native equivalent of the reference's C++ host I/O layer
// (/root/reference/include/vtk.cuh): at 500k cells x 500 frames the ASCII
// formatting is a genuine host-side hot path (the reference overlaps it
// with compute on a std::thread, examples/branching.cu:263-281; here it
// overlaps JAX's async dispatch).  Uses C++17 std::to_chars / from_chars --
// roughly an order of magnitude faster than Python string formatting.
//
// Plain C ABI; bound from Python via ctypes (no pybind11 in this image).

#include <charconv>
#include <cstdint>
#include <cstring>

namespace {

inline char* put_float(char* p, char* end, float v)
{
    auto res = std::to_chars(p, end, v);  // shortest round-trip form
    return res.ec == std::errc() ? res.ptr : nullptr;
}

inline char* put_int(char* p, char* end, long v)
{
    auto res = std::to_chars(p, end, v);
    return res.ec == std::errc() ? res.ptr : nullptr;
}

}  // namespace

extern "C" {

// n rows of `width` floats, space-separated, newline-terminated.
// Returns bytes written, or -1 if `cap` is too small.
long yt_format_rows(const float* data, long n, int width, char* out, long cap)
{
    char* p = out;
    char* end = out + cap;
    for (long i = 0; i < n; ++i) {
        for (int c = 0; c < width; ++c) {
            if (end - p < 64) return -1;
            p = put_float(p, end, data[i * width + c]);
            if (!p) return -1;
            *p++ = (c + 1 == width) ? '\n' : ' ';
        }
    }
    return p - out;
}

// One int per line.
long yt_format_ints(const int32_t* v, long n, char* out, long cap)
{
    char* p = out;
    char* end = out + cap;
    for (long i = 0; i < n; ++i) {
        if (end - p < 32) return -1;
        p = put_int(p, end, v[i]);
        if (!p) return -1;
        *p++ = '\n';
    }
    return p - out;
}

// VERTICES block: "1 i\n" per point (ref vtk.cuh:124-125).
long yt_format_vertices(long n, char* out, long cap)
{
    char* p = out;
    char* end = out + cap;
    for (long i = 0; i < n; ++i) {
        if (end - p < 32) return -1;
        *p++ = '1';
        *p++ = ' ';
        p = put_int(p, end, i);
        if (!p) return -1;
        *p++ = '\n';
    }
    return p - out;
}

// LINES block: "2 a b\n" per link (ref vtk.cuh:142-144).
long yt_format_lines(const int32_t* a, const int32_t* b, long n, char* out,
                     long cap)
{
    char* p = out;
    char* end = out + cap;
    for (long i = 0; i < n; ++i) {
        if (end - p < 48) return -1;
        *p++ = '2';
        *p++ = ' ';
        p = put_int(p, end, a[i]);
        if (!p) return -1;
        *p++ = ' ';
        p = put_int(p, end, b[i]);
        if (!p) return -1;
        *p++ = '\n';
    }
    return p - out;
}

// Parse up to `cap` whitespace-separated floats; returns count parsed.
long yt_parse_floats(const char* text, long len, float* out, long cap)
{
    const char* p = text;
    const char* end = text + len;
    long k = 0;
    while (p < end && k < cap) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' ||
                           *p == '\t')) ++p;
        if (p >= end) break;
        float v;
        auto res = std::from_chars(p, end, v);
        if (res.ec != std::errc()) break;
        out[k++] = v;
        p = res.ptr;
    }
    return k;
}

// Double-precision variant (int32 properties must round-trip exactly).
long yt_parse_doubles(const char* text, long len, double* out, long cap)
{
    const char* p = text;
    const char* end = text + len;
    long k = 0;
    while (p < end && k < cap) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' ||
                           *p == '\t')) ++p;
        if (p >= end) break;
        double v;
        auto res = std::from_chars(p, end, v);
        if (res.ec != std::errc()) break;
        out[k++] = v;
        p = res.ptr;
    }
    return k;
}

}  // extern "C"
