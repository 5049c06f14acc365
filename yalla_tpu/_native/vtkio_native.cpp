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

extern "C" {

// ---------------------------------------------------------------------------
// Mesh point-in-closed-mesh test (geometry service, not I/O).
//
// Native equivalent of the reference's Mesh::test_exclusion ray-triangle
// parity walk (/root/reference/include/mesh.cuh:379-419): for each point,
// count intersections of the fixed ray direction with the facet set; an
// even count means outside.  The vectorized numpy form materializes a
// [points, facets] block (O(P*F) memory); this is O(1) memory and
// parallel over points.
long yt_test_exclusion(const double* pts, long n_pts,
                       const double* verts,  // [n_f, 3, 3]
                       long n_f, const double* ray, unsigned char* out)
{
    const double dx = ray[0], dy = ray[1], dz = ray[2];
#pragma omp parallel for schedule(static)
    for (long i = 0; i < n_pts; ++i) {
        const double px = pts[i * 3], py = pts[i * 3 + 1],
                     pz = pts[i * 3 + 2];
        long hits = 0;
        for (long f = 0; f < n_f; ++f) {
            const double* V = verts + f * 9;
            const double ux = V[3] - V[0], uy = V[4] - V[1],
                         uz = V[5] - V[2];
            const double vx = V[6] - V[0], vy = V[7] - V[1],
                         vz = V[8] - V[2];
            // facet normal u x v
            const double nx = uy * vz - uz * vy;
            const double ny = uz * vx - ux * vz;
            const double nz = ux * vy - uy * vx;
            const double den = nx * dx + ny * dy + nz * dz;
            if (den == 0.0) continue;
            const double r = (nx * (V[0] - px) + ny * (V[1] - py)
                              + nz * (V[2] - pz)) / den;
            if (r < 0.0) continue;
            const double wx = px + dx * r - V[0];
            const double wy = py + dy * r - V[1];
            const double wz = pz + dz * r - V[2];
            const double uu = ux * ux + uy * uy + uz * uz;
            const double vv = vx * vx + vy * vy + vz * vz;
            const double uv = ux * vx + uy * vy + uz * vz;
            const double wu = wx * ux + wy * uy + wz * uz;
            const double wv = wx * vx + wy * vy + wz * vz;
            const double denom = uv * uv - uu * vv;
            if (denom == 0.0) continue;
            const double s = (uv * wv - vv * wu) / denom;
            const double t = (uv * wu - uu * wv) / denom;
            if (s >= 0.0 && s <= 1.0 && t >= 0.0 && s + t <= 1.0) ++hits;
        }
        out[i] = (hits % 2 == 0) ? 1 : 0;  // even = outside
    }
    return n_pts;
}

}  // extern "C" (reopened)
