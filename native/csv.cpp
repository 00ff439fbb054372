// Native numeric-CSV reader for MultiModN-TPU's data layer.
//
// The MIMIC workflow reads a ~1103-column float matrix CSV (the HAIM
// embeddings export and the framework's own cache files, see
// multimodn_tpu/data/mimic.py) — pandas' general-purpose parser is the
// slowest step of dataset construction there. This reader handles exactly
// the numeric-CSV shape those files have (one header row, comma-separated
// float fields, empty/NA cells as NaN) in one pass with no intermediate
// Python objects. Anything fancier (quoted fields, string columns) returns
// an error code and the caller falls back to pandas, so behavior never
// changes — only speed.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <limits>
#include <vector>

namespace {

struct FileBuf {
    char* data = nullptr;
    int64_t size = 0;
    bool ok = false;

    explicit FileBuf(const char* path) {
        FILE* f = std::fopen(path, "rb");
        if (!f) return;
        std::fseek(f, 0, SEEK_END);
        long sz = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        if (sz < 0) { std::fclose(f); return; }
        data = static_cast<char*>(std::malloc(static_cast<size_t>(sz) + 1));
        if (!data) { std::fclose(f); return; }
        size = static_cast<int64_t>(std::fread(data, 1, sz, f));
        std::fclose(f);
        data[size] = '\0';
        ok = true;
    }
    ~FileBuf() { std::free(data); }
};

// Fast decimal float parse (sign, digits, '.', digits, exponent),
// restricted to the PROVABLY-EXACT regime: <= 15 significant digits and
// |decimal exponent| <= 22, where the mantissa and the power of ten are
// both exactly representable doubles, so one multiply (or divide, for
// negative exponents) is correctly rounded — bit-identical to strtod and
// hence to pandas. Everything else falls back to strtod.
inline bool parse_f64_fast(const char* s, const char* e, double* out) {
    static double pow10_pos[23] = {0};
    if (pow10_pos[0] == 0) {
        double p = 1.0;
        for (int i = 0; i < 23; ++i) { pow10_pos[i] = p; p *= 10.0; }
    }
    if (s == e) return false;
    bool neg = false;
    if (*s == '+' || *s == '-') { neg = (*s == '-'); ++s; }
    uint64_t mant = 0;
    int digits = 0, exp10 = 0;
    bool any = false;
    while (s < e && *s >= '0' && *s <= '9') {
        if (digits < 16) { mant = mant * 10 + static_cast<uint64_t>(*s - '0'); ++digits; }
        else return false;                   // too many digits: strtod
        ++s; any = true;
    }
    if (s < e && *s == '.') {
        ++s;
        while (s < e && *s >= '0' && *s <= '9') {
            if (digits < 16) {
                mant = mant * 10 + static_cast<uint64_t>(*s - '0');
                ++digits; --exp10;
            } else {
                return false;                // too many digits: strtod
            }
            ++s; any = true;
        }
    }
    if (!any) return false;
    if (s < e && (*s == 'e' || *s == 'E')) {
        ++s;
        bool eneg = false;
        if (s < e && (*s == '+' || *s == '-')) { eneg = (*s == '-'); ++s; }
        if (s >= e || *s < '0' || *s > '9') return false;
        int ev = 0;
        while (s < e && *s >= '0' && *s <= '9') {
            ev = ev * 10 + (*s - '0');
            if (ev > 400) ev = 400;          // saturate; clamps to 0/inf below
            ++s;
        }
        exp10 += eneg ? -ev : ev;
    }
    if (s != e) return false;                // trailing junk -> slow path
    if (digits > 15 || exp10 > 22 || exp10 < -22) return false;  // strtod
    double v = static_cast<double>(mant);    // exact: mant < 10^16 <= 2^53+
    if (exp10 > 0) {
        v *= pow10_pos[exp10];               // exact power -> one rounding
    } else if (exp10 < 0) {
        v /= pow10_pos[-exp10];              // exact divisor -> one rounding
    }
    *out = neg ? -v : v;
    return true;
}

inline bool is_na_token(const char* s, int64_t len) {
    if (len == 0) return true;
    if (len == 2 && (std::memcmp(s, "NA", 2) == 0 || std::memcmp(s, "na", 2) == 0)) return true;
    if (len == 3 && (std::memcmp(s, "NaN", 3) == 0 || std::memcmp(s, "nan", 3) == 0)) return true;
    if (len == 4 && (std::memcmp(s, "None", 4) == 0 || std::memcmp(s, "null", 4) == 0)) return true;
    return false;
}

// Parse `n_rows` newline-separated numeric rows from the (mutable) buffer
// [p, end) into `out` (row-major n_rows x n_cols). Shared by the whole-file
// reader below and the streaming block reader. Returns 0 on success, 4 on
// an unparseable non-empty field under strict mode, 6 when the buffer held
// FEWER than n_rows data rows (e.g. the file shrank after csv_index —
// returning 0 would hand the caller uninitialized tail memory).
inline int64_t parse_rows(char* p, char* end, int64_t n_rows, int64_t n_cols,
                          double* out, int64_t strict) {
    const double nan64 = std::numeric_limits<double>::quiet_NaN();
    char* q = p;
    int64_t row = 0;
    while (q < end && row < n_rows) {
        char* line_end = q;
        while (line_end < end && *line_end != '\n') ++line_end;
        if (line_end == q) { q = line_end + 1; continue; }
        char saved_nl = (line_end < end) ? *line_end : '\0';
        *line_end = '\0';                    // in-buffer tokenization
        double* dst = out + row * n_cols;
        char* field = q;
        int64_t col = 0;
        while (col < n_cols) {
            char* field_end = field;
            while (*field_end != '\0' && *field_end != ',') ++field_end;
            char saved = *field_end;
            *field_end = '\0';
            char* s = field;
            char* e = field_end;
            while (s < e && (*s == ' ' || *s == '\t')) ++s;
            while (e > s && (e[-1] == ' ' || e[-1] == '\t' || e[-1] == '\r')) --e;
            int64_t len = static_cast<int64_t>(e - s);
            if (is_na_token(s, len)) {
                dst[col] = nan64;
            } else if (parse_f64_fast(s, e, &dst[col])) {
                // fast path handled it
            } else {
                char tmp = *e;
                *e = '\0';
                char* parse_end = nullptr;
                double v = std::strtod(s, &parse_end);
                if (parse_end != e) {
                    if (strict) return 4;
                    v = nan64;
                }
                *e = tmp;
                dst[col] = v;
            }
            *field_end = saved;
            ++col;
            if (saved == '\0') break;
            field = field_end + 1;
        }
        for (; col < n_cols; ++col) dst[col] = nan64;
        ++row;
        if (line_end < end) *line_end = saved_nl;
        q = line_end + 1;
    }
    return row < n_rows ? 6 : 0;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Streaming (bounded-memory) API: index the file once with a fixed-size
// buffer, then read arbitrary row BLOCKS (contiguous) or row LISTS
// (shuffled access) by byte span. Host memory stays O(buffer + batch) no
// matter the file size — the disk-backed loader's contract
// (multimodn_tpu/data/disk.py).
// ---------------------------------------------------------------------------

// Pass 1 (streaming, 1 MiB buffer): count data rows/columns and record each
// data row's byte offset into `offsets` (caller sizes it; pass rows_cap=0 +
// offsets=null to just count). offsets[n_rows] is set to the end-of-data
// byte so spans are offsets[i]..offsets[i+1]. Blank lines are skipped like
// csv_dims. Returns 0 ok, 1 unreadable, 2 quoted field, 3 ragged rows,
// 5 offsets capacity too small.
int64_t csv_index(const char* path, int64_t* n_rows, int64_t* n_cols,
                  int64_t* offsets, int64_t rows_cap) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    const size_t BUF = 1 << 20;
    std::vector<char> buf(BUF);
    int64_t file_pos = 0;       // absolute offset of buf[0]
    size_t have = 0, i = 0;
    bool in_header = true;
    int64_t cols = 1, row_cols = 1, rows = 0;
    int64_t line_start = 0;     // absolute offset of current line start
    bool line_has_data = false;
    int64_t last_data_end = 0;  // absolute end of the last counted row
    int64_t rc = 0;

    auto flush_line = [&](int64_t line_end_abs) -> int64_t {
        if (in_header) {
            in_header = false;
            *n_cols = cols;
        } else if (line_has_data || row_cols > 1) {
            if (row_cols != cols) return 3;
            if (offsets) {
                if (rows >= rows_cap) return 5;
                offsets[rows] = line_start;
            }
            ++rows;
            last_data_end = line_end_abs;
        }
        row_cols = 1;
        line_has_data = false;
        return 0;
    };

    for (;;) {
        if (i >= have) {
            file_pos += static_cast<int64_t>(have);
            have = std::fread(buf.data(), 1, BUF, f);
            i = 0;
            if (have == 0) break;
        }
        char c = buf[i];
        if (c == '"') { rc = 2; break; }
        if (c == '\n') {
            rc = flush_line(file_pos + static_cast<int64_t>(i) + 1);
            if (rc) break;
            line_start = file_pos + static_cast<int64_t>(i) + 1;
        } else if (c == ',') {
            if (in_header) ++cols; else ++row_cols;
        } else if (c != '\r') {
            line_has_data = true;
        }
        ++i;
    }
    if (!rc) {
        // Final unterminated line.
        int64_t end_abs = file_pos + static_cast<int64_t>(have);
        if (line_has_data || row_cols > 1) rc = flush_line(end_abs);
    }
    std::fclose(f);
    if (rc) return rc;
    // The in-loop capacity check guarantees rows <= rows_cap here, and the
    // caller allocates rows_cap + 1 slots, so the sentinel write is safe.
    if (offsets) offsets[rows] = last_data_end;
    *n_rows = rows;
    return 0;
}

// Read ONE contiguous byte span holding `n_rows` data rows and parse it.
// Memory: the span itself (one batch of rows). Returns 0 ok, 1 unreadable,
// 4 unparseable field under strict.
int64_t csv_read_block_f64(const char* path, int64_t byte_start,
                           int64_t byte_end, int64_t n_rows, int64_t n_cols,
                           double* out, int64_t strict) {
    if (byte_end < byte_start) return 1;
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    size_t span = static_cast<size_t>(byte_end - byte_start);
    std::vector<char> buf(span + 1);
    if (std::fseek(f, static_cast<long>(byte_start), SEEK_SET) != 0) {
        std::fclose(f);
        return 1;
    }
    size_t got = std::fread(buf.data(), 1, span, f);
    std::fclose(f);
    buf[got] = '\0';
    return parse_rows(buf.data(), buf.data() + got, n_rows, n_cols, out,
                      strict);
}

// Read `count` NON-contiguous rows (shuffled access): spans[2k], spans[2k+1]
// give row k's byte range. One fopen; per-row fseek+fread into a bounded
// row buffer. Returns 0 ok, 1 unreadable, 4 unparseable field under strict.
int64_t csv_read_rows_f64(const char* path, const int64_t* spans,
                          int64_t count, int64_t n_cols, double* out,
                          int64_t strict) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    std::vector<char> buf;
    for (int64_t k = 0; k < count; ++k) {
        int64_t s = spans[2 * k], e = spans[2 * k + 1];
        if (e < s) { std::fclose(f); return 1; }
        size_t span = static_cast<size_t>(e - s);
        if (buf.size() < span + 1) buf.resize(span + 1);
        if (std::fseek(f, static_cast<long>(s), SEEK_SET) != 0) {
            std::fclose(f);
            return 1;
        }
        size_t got = std::fread(buf.data(), 1, span, f);
        buf[got] = '\0';
        int64_t rc = parse_rows(buf.data(), buf.data() + got, 1, n_cols,
                                out + k * n_cols, strict);
        if (rc) { std::fclose(f); return rc; }
    }
    std::fclose(f);
    return 0;
}

// First pass: dimensions of the data portion (rows AFTER the header) and
// the header's byte length. Returns 0 on success, nonzero error codes:
//   1 file unreadable, 2 quoted field seen (unsupported), 3 ragged rows.
int64_t csv_dims(const char* path, int64_t* n_rows, int64_t* n_cols,
                 int64_t* header_len) {
    FileBuf fb(path);
    if (!fb.ok) return 1;
    const char* p = fb.data;
    const char* end = fb.data + fb.size;

    // Header: count columns, record its length.
    int64_t cols = 1;
    const char* h = p;
    while (h < end && *h != '\n') {
        if (*h == '"') return 2;
        if (*h == ',') ++cols;
        ++h;
    }
    *header_len = static_cast<int64_t>(h - p);
    *n_cols = cols;

    int64_t rows = 0;
    const char* q = (h < end) ? h + 1 : end;
    while (q < end) {
        int64_t c = 1;
        const char* line = q;
        while (q < end && *q != '\n') {
            if (*q == '"') return 2;
            if (*q == ',') ++c;
            ++q;
        }
        // Skip blank trailing line(s).
        if (q != line || c > 1) {
            int64_t len = static_cast<int64_t>(q - line);
            if (len > 0 || c > 1) {
                if (c != cols) return 3;
                ++rows;
            }
        }
        if (q < end) ++q;
    }
    *n_rows = rows;
    return 0;
}

// Second pass: fill `out` (n_rows * n_cols float64, row-major — doubles so
// integer ID columns up to 2^53 survive exactly, matching pandas) and copy the
// raw header line into header_buf (NUL-terminated; caller sizes it from
// csv_dims' header_len). Empty/NA/NaN/None/null cells and unparseable
// fields become NaN unless strict != 0, in which case an unparseable
// NON-empty field aborts with code 4 (caller falls back to pandas).
// Returns 0 on success.
int64_t csv_read_f64(const char* path, double* out,
                     int64_t n_rows, int64_t n_cols,
                     char* header_buf, int64_t header_cap,
                     int64_t strict) {
    FileBuf fb(path);
    if (!fb.ok) return 1;
    char* p = fb.data;
    char* end = fb.data + fb.size;

    // Header.
    char* h = p;
    while (h < end && *h != '\n') ++h;
    int64_t hlen = static_cast<int64_t>(h - p);
    if (header_buf && header_cap > 0) {
        int64_t n = hlen < header_cap - 1 ? hlen : header_cap - 1;
        std::memcpy(header_buf, p, static_cast<size_t>(n));
        header_buf[n] = '\0';
    }

    char* q = (h < end) ? h + 1 : end;
    return parse_rows(q, end, n_rows, n_cols, out, strict);
}

}  // extern "C"
