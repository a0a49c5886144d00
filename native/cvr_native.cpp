// cvr_native: native (C++/OpenMP) kernels for the cvr_tpu host runtime.
//
// TPU-native re-implementation of the reference's host-side native layer:
//   * MatrixMarket parsing (ref: readMatrix spmv.cpp:311-535 and the
//     vendored mmio.{h,cpp}) — here mmap + parallel newline-partitioned
//     parsing with C++17 from_chars.
//   * COO -> CSR assembly (ref: qsort + scan, spmv.cpp:485-526) — here a
//     parallel counting sort by row (stable within a row).
//   * CSR -> SELL-pack planning + fill (ref: the AVX-512 tracker converter
//     pre_processing, spmv.cpp:565-1014) — here segment splitting, a
//     parallel length sort, and an OpenMP fill of the slot-major planes.
//
// Exposed as a C ABI consumed via ctypes (cvr_tpu/_native.py).  All output
// buffers are allocated by the Python caller (NumPy) so ownership never
// crosses the library boundary; the two-phase plan/fill protocol lets the
// caller size buffers exactly.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdlib>
#include <cctype>
#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <memory>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#ifdef _OPENMP
#include <omp.h>
#else
static int omp_get_max_threads() { return 1; }
static int omp_get_thread_num() { return 0; }
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Error reporting
// ---------------------------------------------------------------------------
static thread_local char g_err[256];

const char* cvr_last_error() { return g_err; }

static int fail(const char* msg) {
  std::snprintf(g_err, sizeof(g_err), "%s", msg);
  return -1;
}

// ---------------------------------------------------------------------------
// MatrixMarket parser
// ---------------------------------------------------------------------------
// Header flags returned by cvr_mtx_open.
enum {
  CVR_FIELD_REAL = 0,
  CVR_FIELD_INTEGER = 1,
  CVR_FIELD_PATTERN = 2,
  CVR_FIELD_COMPLEX = 3,
};
enum {
  CVR_SYM_GENERAL = 0,
  CVR_SYM_SYMMETRIC = 1,
  CVR_SYM_SKEW = 2,
  CVR_SYM_HERMITIAN = 3,
};

struct MtxFile {
  int fd = -1;
  const char* data = nullptr;
  size_t size = 0;
  size_t body_off = 0;  // first data byte after the size line
  int64_t nrows = 0, ncols = 0, nnz = 0;
  int field = 0, symmetry = 0;
};

static bool ci_equal(const std::string& a, const char* b) {
  if (a.size() != std::strlen(b)) return false;
  for (size_t i = 0; i < a.size(); i++)
    if (std::tolower((unsigned char)a[i]) != b[i]) return false;
  return true;
}

// Opens + header-parses; returns a handle id (>=0) or -1.
static MtxFile g_files[64];
static std::atomic<int> g_nfiles{0};

int cvr_mtx_open(const char* path, int64_t* nrows, int64_t* ncols,
                 int64_t* nnz, int* field, int* symmetry) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return fail("open() failed");
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return fail("fstat() failed");
  }
  size_t size = (size_t)st.st_size;
  const char* data =
      (const char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (data == MAP_FAILED) {
    ::close(fd);
    return fail("mmap() failed");
  }

  // Parse banner: %%MatrixMarket matrix coordinate <field> <symmetry>
  // Every post-mmap failure must release the fd and the whole-file
  // mapping (a sweep over many bad files would otherwise exhaust fds).
  auto fail_open = [&](const char* msg) {
    munmap((void*)data, size);
    ::close(fd);
    return fail(msg);
  };
  size_t pos = 0;
  auto read_line = [&](std::string& out) -> bool {
    if (pos >= size) return false;
    size_t end = pos;
    while (end < size && data[end] != '\n') end++;
    out.assign(data + pos, end - pos);
    pos = end + 1;
    return true;
  };
  std::string line;
  if (!read_line(line)) return fail_open("empty file");
  {
    std::vector<std::string> tok;
    size_t i = 0;
    while (i < line.size()) {
      while (i < line.size() && std::isspace((unsigned char)line[i])) i++;
      size_t j = i;
      while (j < line.size() && !std::isspace((unsigned char)line[j])) j++;
      if (j > i) tok.push_back(line.substr(i, j - i));
      i = j;
    }
    if (tok.size() != 5 || tok[0] != "%%MatrixMarket")
      return fail_open("bad MatrixMarket banner");
    if (!ci_equal(tok[1], "matrix")) return fail_open("unsupported object");
    if (!ci_equal(tok[2], "coordinate"))
      return fail_open("native parser handles coordinate format only");
    MtxFile f;
    if (ci_equal(tok[3], "real")) f.field = CVR_FIELD_REAL;
    else if (ci_equal(tok[3], "integer")) f.field = CVR_FIELD_INTEGER;
    else if (ci_equal(tok[3], "pattern")) f.field = CVR_FIELD_PATTERN;
    else if (ci_equal(tok[3], "complex")) f.field = CVR_FIELD_COMPLEX;
    else return fail_open("unsupported field");
    if (ci_equal(tok[4], "general")) f.symmetry = CVR_SYM_GENERAL;
    else if (ci_equal(tok[4], "symmetric")) f.symmetry = CVR_SYM_SYMMETRIC;
    else if (ci_equal(tok[4], "skew-symmetric")) f.symmetry = CVR_SYM_SKEW;
    else if (ci_equal(tok[4], "hermitian")) f.symmetry = CVR_SYM_HERMITIAN;
    else return fail_open("unsupported symmetry");

    // Skip comments/blank lines to the size line.
    while (read_line(line)) {
      if (!line.empty() && line[0] != '%') {
        bool blank = true;
        for (char ch : line)
          if (!std::isspace((unsigned char)ch)) { blank = false; break; }
        if (!blank) break;
      }
    }
    const char* p = line.c_str();
    const char* e = p + line.size();
    auto skip_ws = [&]() { while (p < e && std::isspace((unsigned char)*p)) p++; };
    skip_ws();
    auto r1 = std::from_chars(p, e, f.nrows); p = r1.ptr; skip_ws();
    auto r2 = std::from_chars(p, e, f.ncols); p = r2.ptr; skip_ws();
    auto r3 = std::from_chars(p, e, f.nnz);
    if (r1.ec != std::errc() || r2.ec != std::errc() || r3.ec != std::errc())
      return fail_open("bad size line");

    f.fd = fd;
    f.data = data;
    f.size = size;
    f.body_off = pos;
    // reuse closed slots so long sweeps never exhaust the table
    int id = -1;
    int n = g_nfiles.load();
    for (int k = 0; k < n; k++)
      if (g_files[k].data == nullptr && g_files[k].fd < 0) { id = k; break; }
    if (id < 0) {
      id = g_nfiles.fetch_add(1);
      if (id >= 64) {
        g_nfiles.fetch_sub(1);
        return fail_open("too many open mtx files");
      }
    }
    g_files[id] = f;
    *nrows = f.nrows;
    *ncols = f.ncols;
    *nnz = f.nnz;
    *field = f.field;
    *symmetry = f.symmetry;
    return id;
  }
}

// Parses the body into caller-allocated rows/cols/vals (each length nnz).
// pattern matrices: vals filled with (index % 13) or 1.0 per mode.
// complex: real part kept.  1-based -> 0-based conversion applied.
int cvr_mtx_read(int handle, int32_t* rows, int32_t* cols, float* vals,
                 int pattern_mode /*0=mod13, 1=ones*/) {
  if (handle < 0 || handle >= g_nfiles.load()) return fail("bad handle");
  const MtxFile& f = g_files[handle];
  const char* base = f.data + f.body_off;
  size_t len = f.size - f.body_off;
  const int64_t nnz = f.nnz;
  const bool has_val =
      (f.field == CVR_FIELD_REAL || f.field == CVR_FIELD_INTEGER ||
       f.field == CVR_FIELD_COMPLEX);

  // Find the byte offset of every entry start: entries are separated by
  // newlines; comment lines inside the body are not allowed by the spec.
  // Chunked two-pass: count newlines per chunk, prefix-sum, then parse.
  const int T = std::max(1, omp_get_max_threads());
  std::vector<size_t> chunk_begin(T + 1, len);
  for (int t = 0; t <= T; t++) {
    size_t target = len * (size_t)t / (size_t)T;
    // advance to start of next line
    if (t == 0) { chunk_begin[0] = 0; continue; }
    size_t p = target;
    while (p < len && base[p] != '\n') p++;
    chunk_begin[t] = (p < len) ? p + 1 : len;
  }
  std::vector<int64_t> counts(T + 1, 0);
#pragma omp parallel for schedule(static)
  for (int t = 0; t < T; t++) {
    int64_t c = 0;
    const char* p = base + chunk_begin[t];
    const char* e = base + chunk_begin[t + 1];
    while (p < e) {
      // a line counts if it contains a non-space character
      const char* q = (const char*)memchr(p, '\n', (size_t)(e - p));
      const char* lineend = q ? q : e;
      for (const char* s = p; s < lineend; s++)
        if (!std::isspace((unsigned char)*s)) { c++; break; }
      p = q ? q + 1 : e;
    }
    counts[t + 1] = c;
  }
  for (int t = 0; t < T; t++) counts[t + 1] += counts[t];
  if (counts[T] < nnz) return fail("fewer entries than header nnz");

  std::atomic<int> err{0};
#pragma omp parallel for schedule(static)
  for (int t = 0; t < T; t++) {
    int64_t idx = counts[t];
    const char* p = base + chunk_begin[t];
    const char* e = base + chunk_begin[t + 1];
    while (p < e && idx < nnz) {
      const char* q = (const char*)memchr(p, '\n', (size_t)(e - p));
      const char* lineend = q ? q : e;
      // skip blank lines
      const char* s = p;
      while (s < lineend && std::isspace((unsigned char)*s)) s++;
      if (s < lineend) {
        int64_t r = 0, c = 0;
        auto rr = std::from_chars(s, lineend, r);
        s = rr.ptr;
        while (s < lineend && std::isspace((unsigned char)*s)) s++;
        auto rc = std::from_chars(s, lineend, c);
        s = rc.ptr;
        if (rr.ec != std::errc() || rc.ec != std::errc() ||
            r < 1 || c < 1 || r > f.nrows || c > f.ncols) {
          // range-validate HERE — indices flow unchecked into the
          // pack passes' histogram/flag writes, so an out-of-range
          // entry in an untrusted file must die as a parse error,
          // not as a heap write
          err.store(1);
        } else {
          rows[idx] = (int32_t)(r - 1);
          cols[idx] = (int32_t)(c - 1);
          if (has_val) {
            while (s < lineend && std::isspace((unsigned char)*s)) s++;
            if (s < lineend && *s == '+') s++;  // from_chars rejects '+'
            float v = 0.f;
            auto rv = std::from_chars(s, lineend, v);
            if (rv.ec != std::errc()) {
              // fall back for "1e3."-style oddities; copy to a bounded
              // NUL-terminated buffer — strtof on the raw mmap could
              // scan past the mapping when the file lacks a trailing
              // newline at a page boundary
              char buf[64];
              size_t bl = std::min(
                  (size_t)(lineend - s), sizeof(buf) - 1);
              std::memcpy(buf, s, bl);
              buf[bl] = 0;
              v = strtof(buf, nullptr);
            }
            vals[idx] = v;
          } else {
            vals[idx] = pattern_mode == 0 ? (float)(idx % 13) : 1.0f;
          }
          idx++;
        }
      }
      p = q ? q + 1 : e;
    }
  }
  if (err.load()) return fail("parse error in matrix body");
  return 0;
}

int cvr_mtx_close(int handle) {
  if (handle < 0 || handle >= g_nfiles.load()) return fail("bad handle");
  MtxFile& f = g_files[handle];
  if (f.data) munmap((void*)f.data, f.size);
  if (f.fd >= 0) ::close(f.fd);
  f.data = nullptr;
  f.fd = -1;
  return 0;
}

// ---------------------------------------------------------------------------
// COO -> CSR (parallel counting sort by row; stable, preserves file order
// within a row — same result as the reference's qsort by (row, col) only
// when input columns are presorted; we keep file order like scipy).
// ---------------------------------------------------------------------------
int cvr_coo_to_csr(int64_t nrows, int64_t nnz, const int32_t* rows,
                   const int32_t* cols, const float* vals, int64_t* rowptr,
                   int32_t* out_cols, float* out_vals) {
  std::vector<int64_t> count(nrows + 1, 0);
  for (int64_t i = 0; i < nnz; i++) {
    int32_t r = rows[i];
    if (r < 0 || r >= nrows) return fail("row index out of range");
    // negative cols would index before downstream histogram buffers
    // (the upper bound is checked against ncols by the parser / the
    // Python container; a negative here is always caller error)
    if (cols[i] < 0) return fail("column index out of range");
    count[r + 1]++;
  }
  for (int64_t r = 0; r < nrows; r++) count[r + 1] += count[r];
  std::memcpy(rowptr, count.data(), (size_t)(nrows + 1) * sizeof(int64_t));
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t i = 0; i < nnz; i++) {
    int64_t dst = cursor[rows[i]]++;
    out_cols[dst] = cols[i];
    out_vals[dst] = vals[i];
  }
  return 0;
}

// ---------------------------------------------------------------------------
// CSR -> SELL-pack
// ---------------------------------------------------------------------------
// Phase 1: count segments.  split_len <= 0 disables splitting.
int64_t cvr_sell_count_segments(int64_t nrows, const int64_t* rowptr,
                                int64_t split_len) {
  int64_t G = 0;
#pragma omp parallel for reduction(+ : G) schedule(static)
  for (int64_t r = 0; r < nrows; r++) {
    int64_t len = rowptr[r + 1] - rowptr[r];
    int64_t s = (split_len > 0) ? std::max<int64_t>(1, (len + split_len - 1) / split_len)
                                : 1;
    G += s;
  }
  return G;
}

// Phase 2: build the sorted segment table.
//   seg_row[G], seg_off[G], order[G] (positions sorted by desc seg length,
//   stable), sorted_len[G].
int cvr_sell_plan(int64_t nrows, const int64_t* rowptr, int64_t split_len,
                  int64_t G, int32_t* seg_row, int32_t* seg_off,
                  int32_t* sorted_len, int64_t* order) {
  // Emit segments row by row (sequential write; cheap).
  std::vector<int32_t> seg_len((size_t)G);
  int64_t g = 0;
  for (int64_t r = 0; r < nrows; r++) {
    int64_t len = rowptr[r + 1] - rowptr[r];
    if (split_len > 0 && len > split_len) {
      int64_t off = 0;
      while (off < len) {
        int64_t l = std::min(split_len, len - off);
        seg_row[g] = (int32_t)r;
        seg_off[g] = (int32_t)off;
        seg_len[(size_t)g] = (int32_t)l;
        off += split_len;
        g++;
      }
    } else {
      seg_row[g] = (int32_t)r;
      seg_off[g] = 0;
      seg_len[(size_t)g] = (int32_t)len;
      g++;
    }
  }
  if (g != G) return fail("segment count mismatch");

  // Stable sort positions by descending length.  Counting sort on length
  // (lengths are bounded by split_len or max row len) => O(G + L).
  int32_t maxlen = 0;
  for (int64_t i = 0; i < G; i++) maxlen = std::max(maxlen, seg_len[(size_t)i]);
  std::vector<int64_t> buckets((size_t)maxlen + 2, 0);
  for (int64_t i = 0; i < G; i++) buckets[(size_t)(maxlen - seg_len[(size_t)i])]++;
  int64_t acc = 0;
  for (size_t b = 0; b < buckets.size(); b++) {
    int64_t cnt = buckets[b];
    buckets[b] = acc;
    acc += cnt;
  }
  for (int64_t i = 0; i < G; i++) {
    int64_t dst = buckets[(size_t)(maxlen - seg_len[(size_t)i])]++;
    order[dst] = i;
    sorted_len[dst] = seg_len[(size_t)i];
  }
  return 0;
}

// Phase 3: fill the slot-major planes.
//   For sorted position p (0..G-1): lane = p % C, slice = p / C; the
//   segment's j-th nnz lands at flat ((slice_off[slice] + j) * C + lane).
int cvr_sell_fill(int64_t G, int64_t C, const int64_t* rowptr,
                  const int32_t* csr_cols, const float* csr_vals,
                  const int32_t* seg_row, const int32_t* seg_off,
                  const int32_t* sorted_len, const int64_t* order,
                  const int32_t* slice_offsets, float* vals_plane,
                  int32_t* cols_plane) {
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < G; p++) {
    int64_t seg = order[p];
    int64_t lane = p % C;
    int64_t slice = p / C;
    int64_t src = rowptr[seg_row[seg]] + seg_off[seg];
    int64_t base = (int64_t)slice_offsets[slice];
    int32_t len = sorted_len[p];
    for (int32_t j = 0; j < len; j++) {
      int64_t dst = (base + j) * C + lane;
      vals_plane[dst] = csr_vals[src + j];
      cols_plane[dst] = csr_cols[src + j];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// CSR -> SELL-window (identity row order; the locality fast path).
// The TPU kernel gathers x through a per-plane-row aligned column window
// (cvr_tpu/ops/pallas_window.py), the analogue of VHCC's 2D cache blocking
// (vhcc_matrix.h:300-375) pushed to pack time.  This fill keeps rows in
// natural order (slice i = rows [1024i, 1024(i+1))), records per-plane-row
// column min/max, and rewrites padding columns to the row's min so every
// plane row spans the tightest possible window.
// ---------------------------------------------------------------------------
// Pass 1: per-plane-row column min/max, straight from CSR (no plane
// materialization).  Parallel over slices — each slice owns a disjoint
// plane-row range, so there are no races.
// D = lane-duplication factor: each row occupies D consecutive lanes
// (its nnz cut into D chunks of L = ceil(len/D)), a slice covers C/D
// rows, and the per-plane-row column spread shrinks ~D-fold — the knob
// that buys W = 1024 (8 gathers) instead of 2048 (16) on banded inputs.
// perm maps plane position p (slice p / rps, lane block p % rps) to the
// CSR row stored there — identity for the natural-order pack, a
// block-local length sort for the sigma-sorted pack (road-class inputs).
int cvr_window_minmax(int64_t nrows, int64_t C, int64_t D,
                      const int64_t* rowptr, const int32_t* csr_cols,
                      const int64_t* slice_offsets, int64_t S,
                      const int32_t* perm,
                      int32_t* wmin, int32_t* wmax) {
  const int64_t rps = C / D;  // rows per slice
  const int64_t nslices = (nrows + rps - 1) / rps;
#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t i = 0; i < nslices; i++) {
    int64_t base = slice_offsets[i];
    int64_t width = slice_offsets[i + 1] - base;
    int32_t* lo = wmin + base;
    int32_t* hi = wmax + base;
    for (int64_t j = 0; j < width; j++) { lo[j] = INT32_MAX; hi[j] = -1; }
    int64_t rend = std::min(nrows, (i + 1) * rps);
    for (int64_t p = i * rps; p < rend; p++) {
      int64_t r = perm ? perm[p] : p;
      int64_t src = rowptr[r];
      int64_t len = rowptr[r + 1] - src;
      if (len == 0) continue;
      int64_t L = (len + D - 1) / D;
      for (int64_t j = 0; j < len; j++) {
        int32_t c = csr_cols[src + j];
        int64_t slot = j % L;
        lo[slot] = std::min(lo[slot], c);
        hi[slot] = std::max(hi[slot], c);
      }
    }
    for (int64_t j = 0; j < width; j++)
      if (hi[j] < 0) { lo[j] = 0; hi[j] = 0; }  // all-padding plane row
  }
  return 0;
}

// Pass 2: fill the value and in-window-offset planes directly in padded
// sublane-split stream layout (8, S_pad, 128).  rmap maps unpadded plane
// rows to padded rows; base_col is the per-unpadded-plane-row window
// base column.  Caller pre-zeroes both planes (padding: val 0, li 0 =
// the window base, a safe in-window gather).
int cvr_window_fill_ss(int64_t nrows, int64_t C, int64_t D,
                       const int64_t* rowptr, const int32_t* csr_cols,
                       const float* csr_vals,
                       const int64_t* slice_offsets, const int64_t* rmap,
                       const int32_t* base_col, int64_t S_pad,
                       const int32_t* perm,
                       float* vals_ss, int16_t* li_ss) {
  const int64_t rps = C / D;
  const int64_t nslices = (nrows + rps - 1) / rps;
#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t i = 0; i < nslices; i++) {
    int64_t base = slice_offsets[i];
    int64_t rend = std::min(nrows, (i + 1) * rps);
    for (int64_t p = i * rps; p < rend; p++) {
      int64_t r = perm ? perm[p] : p;
      int64_t src = rowptr[r];
      int64_t len = rowptr[r + 1] - src;
      if (len == 0) continue;
      int64_t L = (len + D - 1) / D;
      int64_t lane0 = (p - i * rps) * D;
      for (int64_t j = 0; j < len; j++) {
        int64_t lane = lane0 + j / L;
        int64_t slot = j % L;
        int64_t dst = (lane >> 7) * (S_pad * 128) + (lane & 127) +
                      rmap[base + slot] * 128;
        vals_ss[dst] = csr_vals[src + j];
        li_ss[dst] = (int16_t)(csr_cols[src + j] - base_col[base + slot]);
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Euler edge-coloring for the static routing engine (cvr_tpu/ops/route.py)
// ---------------------------------------------------------------------------
// k-edge-coloring of a k-regular bipartite multigraph (k a power of two) by
// recursive Euler splitting: all degrees are even, so the edge set
// decomposes into closed trails; orienting each trail and assigning
// alternate edges to the two halves splits every vertex degree exactly in
// half (bipartite trails have even length).  log2(k) levels end in perfect
// matchings = color classes.  König's theorem guarantees the coloring
// exists; this constructs it in O(E log k).
//
// src[i] in [0, n_tiles), dst[i] in [0, n_tiles): endpoint tile ids of
// edge i.  Every source tile and dest tile must have exactly k incident
// edges.  color_out[i] in [0, k).

// Walk state is compacted per subgraph (usrc/udst/gid arrays local to the
// call) so the deeper recursion levels — which dominate the O(E log k)
// total — run entirely in cache.  Single-threaded by design: the build
// host has one core; the walk is memory-latency bound.
static void euler_split(std::vector<int32_t>& usrc, std::vector<int32_t>& udst,
                        std::vector<int32_t>& gid, int64_t n_tiles,
                        int32_t kk, int32_t base, int32_t* color) {
  const int64_t m = (int64_t)gid.size();
  if (kk == 1) {
    for (int64_t i = 0; i < m; i++) color[gid[(size_t)i]] = base;
    return;
  }
  const int64_t nv = 2 * n_tiles;
  std::vector<int32_t> deg((size_t)nv, 0);
  for (int64_t i = 0; i < m; i++) {
    deg[(size_t)usrc[(size_t)i]]++;
    deg[(size_t)(n_tiles + udst[(size_t)i])]++;
  }
  std::vector<int64_t> off((size_t)nv + 1);
  off[0] = 0;
  for (int64_t vtx = 0; vtx < nv; vtx++)
    off[(size_t)vtx + 1] = off[(size_t)vtx] + deg[(size_t)vtx];
  std::vector<int32_t> adj((size_t)(2 * m));
  {
    std::vector<int64_t> cur(off.begin(), off.end() - 1);
    for (int64_t i = 0; i < m; i++) {
      adj[(size_t)cur[(size_t)usrc[(size_t)i]]++] = (int32_t)i;
      adj[(size_t)cur[(size_t)(n_tiles + udst[(size_t)i])]++] = (int32_t)i;
    }
  }
  std::vector<int64_t> ptr(off.begin(), off.end() - 1);
  std::vector<uint8_t> used((size_t)m, 0);
  std::vector<uint8_t> side((size_t)m, 0);
  for (int64_t s0 = 0; s0 < m; s0++) {
    if (used[(size_t)s0]) continue;
    int64_t e = s0;
    int64_t vert = usrc[(size_t)s0];  // start on the u side
    for (;;) {
      used[(size_t)e] = 1;
      bool from_u = vert < n_tiles;
      side[(size_t)e] = from_u ? 0 : 1;
      vert = from_u ? (n_tiles + udst[(size_t)e]) : usrc[(size_t)e];
      int64_t p = ptr[(size_t)vert];
      int64_t end = off[(size_t)vert + 1];
      int64_t nxt = -1;
      while (p < end) {
        int32_t cand = adj[(size_t)p];
        if (!used[(size_t)cand]) {
          nxt = cand;
          break;
        }
        p++;
      }
      ptr[(size_t)vert] = p;
      if (nxt < 0) break;  // trail closed (even degrees)
      e = nxt;
    }
  }
  // Partition into the two halves, compacted.
  int64_t na = 0;
  for (int64_t i = 0; i < m; i++) na += (side[(size_t)i] == 0);
  std::vector<int32_t> asrc((size_t)na), adst((size_t)na), agid((size_t)na);
  std::vector<int32_t> bsrc((size_t)(m - na)), bdst((size_t)(m - na)),
      bgid((size_t)(m - na));
  int64_t ia = 0, ib = 0;
  for (int64_t i = 0; i < m; i++) {
    if (side[(size_t)i] == 0) {
      asrc[(size_t)ia] = usrc[(size_t)i];
      adst[(size_t)ia] = udst[(size_t)i];
      agid[(size_t)ia] = gid[(size_t)i];
      ia++;
    } else {
      bsrc[(size_t)ib] = usrc[(size_t)i];
      bdst[(size_t)ib] = udst[(size_t)i];
      bgid[(size_t)ib] = gid[(size_t)i];
      ib++;
    }
  }
  usrc.clear(); usrc.shrink_to_fit();
  udst.clear(); udst.shrink_to_fit();
  gid.clear(); gid.shrink_to_fit();
  euler_split(asrc, adst, agid, n_tiles, kk / 2, base, color);
  asrc.clear(); asrc.shrink_to_fit();
  adst.clear(); adst.shrink_to_fit();
  agid.clear(); agid.shrink_to_fit();
  euler_split(bsrc, bdst, bgid, n_tiles, kk / 2, base + kk / 2, color);
}

// ---------------------------------------------------------------------------
// Fast Euler split for large levels: pairing + double-step cycles.
//
// Pair up the incident edges at every vertex (consecutive adjacency
// entries; degrees are even).  The pairings are involutions pu (at the
// u endpoint) and pv (at v).  Alternating pu/pv from any edge walks a
// closed Euler trail; the DOUBLE-step successor next2 = pu o pv is a
// static permutation of edges whose cycles are exactly the even- and
// odd-position halves of each trail.  Assigning side(edge) by comparing
// its cycle's leader with its companion cycle's leader (the cycle of
// pv[edge]) therefore gives every trail an alternating 2-coloring —
// every vertex's pairs split one/one, i.e. a perfect degree-halving —
// WITHOUT any mutable-state walk.
//
// Finding cycle leaders of a static permutation is latency-hidden with a
// ruling set: every R-th edge is a ruler; W interleaved cursors chase
// ruler->next-ruler segments with software prefetch (independent
// chains), ruler cycles are stitched sequentially (m/R elements), and a
// second interleaved pass writes leaders.  Cycles containing no ruler
// fall through to a sequential sweep (short cycles only).
// The mutable-walk variant (euler_split above) remains for small levels
// where everything is cache-resident.
// ---------------------------------------------------------------------------
static void euler_split_fast(std::vector<int32_t>& usrc,
                             std::vector<int32_t>& udst,
                             std::vector<int32_t>& gid, int64_t n_tiles,
                             int32_t kk, int32_t base, int32_t* color);

static const int64_t EULER_FAST_MIN = 1 << 16;  // use fast path above 64K edges

static void euler_dispatch(std::vector<int32_t>& usrc,
                           std::vector<int32_t>& udst,
                           std::vector<int32_t>& gid, int64_t n_tiles,
                           int32_t kk, int32_t base, int32_t* color) {
  if ((int64_t)gid.size() >= EULER_FAST_MIN && kk > 1)
    euler_split_fast(usrc, udst, gid, n_tiles, kk, base, color);
  else
    euler_split(usrc, udst, gid, n_tiles, kk, base, color);
}

static double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}
static bool euler_debug() {
  static int v = -1;
  if (v < 0) v = getenv("CVR_EULER_DEBUG") ? 1 : 0;
  return v;
}

static void euler_split_fast(std::vector<int32_t>& usrc,
                             std::vector<int32_t>& udst,
                             std::vector<int32_t>& gid, int64_t n_tiles,
                             int32_t kk, int32_t base, int32_t* color) {
  const int64_t m = (int64_t)gid.size();
  const int64_t nv = 2 * n_tiles;
  double t0 = euler_debug() ? now_s() : 0.0;

  // adjacency (counting sort over both endpoints)
  std::vector<int32_t> deg((size_t)nv, 0);
  for (int64_t i = 0; i < m; i++) {
    deg[(size_t)usrc[(size_t)i]]++;
    deg[(size_t)(n_tiles + udst[(size_t)i])]++;
  }
  std::vector<int64_t> off((size_t)nv + 1);
  off[0] = 0;
  for (int64_t v = 0; v < nv; v++) off[(size_t)v + 1] = off[(size_t)v] + deg[(size_t)v];
  std::vector<int32_t> adj((size_t)(2 * m));
  {
    std::vector<int64_t> cur(off.begin(), off.end() - 1);
    for (int64_t i = 0; i < m; i++) {
      adj[(size_t)cur[(size_t)usrc[(size_t)i]]++] = (int32_t)i;
      adj[(size_t)cur[(size_t)(n_tiles + udst[(size_t)i])]++] = (int32_t)i;
    }
  }
  deg.clear(); deg.shrink_to_fit();

  // pairing involutions
  std::vector<int32_t> pu((size_t)m), pv((size_t)m);
  for (int64_t v = 0; v < nv; v++) {
    int32_t* p = (v < n_tiles) ? pu.data() : pv.data();
    for (int64_t i = off[(size_t)v]; i + 1 < off[(size_t)v + 1]; i += 2) {
      int32_t a = adj[(size_t)i], b = adj[(size_t)(i + 1)];
      p[a] = b;
      p[b] = a;
    }
  }
  off.clear(); off.shrink_to_fit();
  adj.clear(); adj.shrink_to_fit();
  if (euler_debug()) {
    fprintf(stderr, "[euler m=%ld k=%d] adj+pair %.2fs\n", (long)m, kk,
            now_s() - t0);
    t0 = now_s();
  }

  // double-step successor (prefetched gather)
  std::vector<int32_t> next2((size_t)m);
  {
    const int64_t PF = 16;
    for (int64_t e = 0; e < m; e++) {
      if (e + PF < m) __builtin_prefetch(&pu[(size_t)pv[(size_t)(e + PF)]]);
      next2[(size_t)e] = pu[(size_t)pv[(size_t)e]];
    }
  }

  if (euler_debug()) {
    fprintf(stderr, "[euler m=%ld k=%d] next2 %.2fs\n", (long)m, kk,
            now_s() - t0);
    t0 = now_s();
  }
  // cycle leaders via ruling set
  std::vector<int32_t> leader((size_t)m, -1);
  const int64_t R = 256;  // ruler spacing
  const int W = 32;       // interleaved cursors
  const int64_t n_rulers = (m + R - 1) / R;
  std::vector<int32_t> succ_ruler((size_t)n_rulers, -1);
  {
    struct Cur { int64_t ruler; int32_t e; };
    std::vector<Cur> cs;
    cs.reserve(W);
    int64_t next_start = 0;
    auto refill = [&]() {
      while ((int64_t)cs.size() < W && next_start < n_rulers) {
        int64_t r = next_start++;
        cs.push_back({r, next2[(size_t)(r * R)]});
      }
    };
    refill();
    while (!cs.empty()) {
      for (size_t c = 0; c < cs.size();) {
        int32_t e = cs[c].e;
        if ((e % R) == 0) {  // hit a ruler: segment done
          succ_ruler[(size_t)cs[c].ruler] = (int32_t)(e / R);
          cs[c] = cs.back();
          cs.pop_back();
          continue;
        }
        int32_t nx = next2[(size_t)e];
        __builtin_prefetch(&next2[(size_t)nx]);
        cs[c].e = nx;
        c++;
      }
      refill();
    }
  }
  // stitch ruler cycles sequentially (n_rulers elements, cache-resident)
  std::vector<int32_t> ruler_leader((size_t)n_rulers, -1);
  {
    std::vector<int32_t> path;
    for (int64_t r = 0; r < n_rulers; r++) {
      if (ruler_leader[(size_t)r] != -1) continue;
      path.clear();
      int32_t lead = (int32_t)(r * R);
      int64_t x = r;
      while (ruler_leader[(size_t)x] == -1) {
        ruler_leader[(size_t)x] = -2;  // on path
        path.push_back((int32_t)x);
        x = succ_ruler[(size_t)x];
        if (ruler_leader[(size_t)x] == -1 && (int32_t)(x * R) < lead)
          lead = (int32_t)(x * R);
      }
      // succ_ruler is a permutation of rulers (segments partition each
      // cycle), so an unresolved chain always closes on itself (-2).
      int32_t final_lead =
          ruler_leader[(size_t)x] >= 0 ? ruler_leader[(size_t)x] : lead;
      for (int32_t pr : path) ruler_leader[(size_t)pr] = final_lead;
    }
  }
  // write leaders along ruler segments (interleaved)
  {
    struct Cur { int32_t lead; int32_t e; };
    std::vector<Cur> cs;
    cs.reserve(W);
    int64_t next_start = 0;
    auto refill = [&]() {
      while ((int64_t)cs.size() < W && next_start < n_rulers) {
        int64_t r = next_start++;
        int32_t lead = ruler_leader[(size_t)r];
        leader[(size_t)(r * R)] = lead;
        cs.push_back({lead, next2[(size_t)(r * R)]});
      }
    };
    refill();
    while (!cs.empty()) {
      for (size_t c = 0; c < cs.size();) {
        int32_t e = cs[c].e;
        if ((e % R) == 0) {  // next ruler: already written
          cs[c] = cs.back();
          cs.pop_back();
          continue;
        }
        leader[(size_t)e] = cs[c].lead;
        int32_t nx = next2[(size_t)e];
        __builtin_prefetch(&next2[(size_t)nx]);
        cs[c].e = nx;
        c++;
      }
      refill();
    }
  }
  if (euler_debug()) {
    fprintf(stderr, "[euler m=%ld k=%d] chases %.2fs\n", (long)m, kk,
            now_s() - t0);
    t0 = now_s();
  }
  // leftover cycles with no ruler (short): sequential sweep
  for (int64_t e = 0; e < m; e++) {
    if (leader[(size_t)e] >= 0) continue;
    int32_t x = (int32_t)e;
    while (leader[(size_t)x] < 0) {
      leader[(size_t)x] = (int32_t)e;
      x = next2[(size_t)x];
    }
  }
  next2.clear(); next2.shrink_to_fit();

  if (euler_debug()) {
    fprintf(stderr, "[euler m=%ld k=%d] leftovers %.2fs\n", (long)m, kk,
            now_s() - t0);
    t0 = now_s();
  }
  // side = (my cycle's leader > companion cycle's leader)
  int64_t na = 0;
  std::vector<uint8_t> side((size_t)m);
  {
    const int64_t PF = 16;
    for (int64_t e = 0; e < m; e++) {
      if (e + PF < m) __builtin_prefetch(&leader[(size_t)pv[(size_t)(e + PF)]]);
      uint8_t s = leader[(size_t)e] > leader[(size_t)pv[(size_t)e]];
      side[(size_t)e] = s;
      na += (s == 0);
    }
  }
  pu.clear(); pu.shrink_to_fit();
  pv.clear(); pv.shrink_to_fit();
  leader.clear(); leader.shrink_to_fit();

  if (euler_debug()) {
    fprintf(stderr, "[euler m=%ld k=%d] side %.2fs\n", (long)m, kk,
            now_s() - t0);
    t0 = now_s();
  }
  // partition into the two halves, compacted (as in euler_split)
  std::vector<int32_t> asrc((size_t)na), adst((size_t)na), agid((size_t)na);
  std::vector<int32_t> bsrc((size_t)(m - na)), bdst((size_t)(m - na)),
      bgid((size_t)(m - na));
  int64_t ia = 0, ib = 0;
  for (int64_t i = 0; i < m; i++) {
    if (side[(size_t)i] == 0) {
      asrc[(size_t)ia] = usrc[(size_t)i];
      adst[(size_t)ia] = udst[(size_t)i];
      agid[(size_t)ia] = gid[(size_t)i];
      ia++;
    } else {
      bsrc[(size_t)ib] = usrc[(size_t)i];
      bdst[(size_t)ib] = udst[(size_t)i];
      bgid[(size_t)ib] = gid[(size_t)i];
      ib++;
    }
  }
  usrc.clear(); usrc.shrink_to_fit();
  udst.clear(); udst.shrink_to_fit();
  gid.clear(); gid.shrink_to_fit();
  euler_dispatch(asrc, adst, agid, n_tiles, kk / 2, base, color);
  asrc.clear(); asrc.shrink_to_fit();
  adst.clear(); adst.shrink_to_fit();
  agid.clear(); agid.shrink_to_fit();
  euler_dispatch(bsrc, bdst, bgid, n_tiles, kk / 2, base + kk / 2, color);
}

int cvr_euler_color(int64_t n_edges, const int32_t* src, const int32_t* dst,
                    int64_t n_tiles, int32_t k, int32_t* color_out) {
  if (k <= 0 || (k & (k - 1))) return fail("k must be a power of two");
  if (n_edges != n_tiles * (int64_t)k) return fail("graph must be k-regular");
  if (n_edges >= (int64_t)1 << 31) return fail("edge count exceeds int32");
  std::vector<int32_t> usrc(src, src + n_edges);
  std::vector<int32_t> udst(dst, dst + n_edges);
  std::vector<int32_t> gid((size_t)n_edges);
  for (int64_t i = 0; i < n_edges; i++) gid[(size_t)i] = (int32_t)i;
  euler_dispatch(usrc, udst, gid, n_tiles, k, 0, color_out);
  return 0;
}

// Batched per-row coloring for the recursive (two-level Benes) middle
// stage: n_rows independent k-regular bipartite multigraphs with Tk tiles
// per side and Tk*k edges each, stored consecutively.
int cvr_euler_color_rows(int64_t n_rows, int64_t tk, int32_t k,
                         const int32_t* src, const int32_t* dst,
                         int32_t* color_out) {
  if (k <= 0 || (k & (k - 1))) return fail("k must be a power of two");
  const int64_t per = tk * (int64_t)k;
  for (int64_t r = 0; r < n_rows; r++) {
    const int32_t* s = src + r * per;
    const int32_t* d = dst + r * per;
    std::vector<int32_t> usrc(s, s + per);
    std::vector<int32_t> udst(d, d + per);
    std::vector<int32_t> gid((size_t)per);
    for (int64_t i = 0; i < per; i++) gid[(size_t)i] = (int32_t)i;
    euler_split(usrc, udst, gid, tk, k, 0, color_out + r * per);
  }
  return 0;
}

// Route plane construction (cvr_tpu/ops/route.py): one pass over the
// permutation builds all three gather-form stage planes.  The scatters
// are random-access; doing them in C avoids NumPy fancy-indexing
// overhead on this host's single slow core.
int cvr_route_planes(int64_t n, const int32_t* perm, const int32_t* colors,
                     int64_t T, int16_t* s1, int32_t* mid, int16_t* s3) {
  if (n != T * 1024) return fail("perm length must be T*1024");
  for (int64_t i = 0; i < n; i++) {
    int32_t p = perm[i];
    int32_t q = colors[i];
    int64_t a = (int64_t)(p >> 10);
    int64_t d = i >> 10;
    s1[a * 1024 + q] = (int16_t)(p & 1023);
    mid[(int64_t)q * T + d] = (int32_t)a;
    s3[d * 1024 + (i & 1023)] = (int16_t)q;
  }
  return 0;
}

// Recursive-middle planes: per-row chunk decomposition of mid (1024 x T).
// colors_rows holds the per-row chunk colorings (1024*T entries).
int cvr_mid_planes(int64_t T, const int32_t* mid, const int32_t* colors_rows,
                   int16_t* m1, int16_t* csel, int16_t* m3) {
  for (int64_t q = 0; q < 1024; q++) {
    const int32_t* mrow = mid + q * T;
    const int32_t* crow = colors_rows + q * T;
    for (int64_t d = 0; d < T; d++) {
      int64_t a = (int64_t)mrow[d];
      int64_t m = crow[d];
      int64_t ca = a >> 10;
      int64_t cd = d >> 10;
      m1[(ca * 1024 + q) * 1024 + m] = (int16_t)(a & 1023);
      csel[(cd * 1024 + q) * 1024 + m] = (int16_t)ca;
      m3[(cd * 1024 + q) * 1024 + (d & 1023)] = (int16_t)m;
    }
  }
  return 0;
}

// Chunk endpoints for the per-row colorings: ca = mid >> 10, cd = d >> 10.
int cvr_mid_edges(int64_t T, const int32_t* mid, int32_t* src, int32_t* dst) {
  for (int64_t q = 0; q < 1024; q++) {
    const int32_t* mrow = mid + q * T;
    int32_t* srow = src + q * T;
    int32_t* drow = dst + q * T;
    for (int64_t d = 0; d < T; d++) {
      srow[d] = (int32_t)(mrow[d] >> 10);
      drow[d] = (int32_t)(d >> 10);
    }
  }
  return 0;
}

// BSR-128 densification (formats/bsr.py): enumerate occupied 128x128
// bricks per 128-row block, CSR order exploited so no global sort is
// needed (the epoch-stamped map dedupes within a row block).
int64_t cvr_bsr_count(int64_t nrows, int64_t ncb, const int64_t* rowptr,
                      const int32_t* cols) {
  std::vector<int32_t> stamp((size_t)ncb, -1);
  int64_t nb = 0;
  int64_t nrb = (nrows + 127) >> 7;
  for (int64_t rb = 0; rb < nrb; rb++) {
    int64_t r1 = std::min(nrows, (rb + 1) << 7);
    for (int64_t i = rowptr[rb << 7]; i < rowptr[r1]; i++) {
      int32_t cb = cols[i] >> 7;
      if (stamp[cb] != (int32_t)rb) {
        stamp[cb] = (int32_t)rb;
        nb++;
      }
    }
  }
  return nb;
}

// Second pass: brick coordinates (sorted by (row block, col block)) and
// the dense value planes.  bvals must be zeroed by the caller.
int cvr_bsr_fill(int64_t nrows, int64_t ncb, const int64_t* rowptr,
                 const int32_t* cols, const float* vals, int64_t nbricks,
                 int32_t* brick_row, int32_t* brick_col, float* bvals) {
  std::vector<int32_t> stamp((size_t)ncb, -1);
  std::vector<int64_t> bidx((size_t)ncb, 0);
  std::vector<int32_t> local;
  local.reserve(256);
  int64_t nb = 0;
  int64_t nrb = (nrows + 127) >> 7;
  for (int64_t rb = 0; rb < nrb; rb++) {
    int64_t r0 = rb << 7;
    int64_t r1 = std::min(nrows, r0 + 128);
    local.clear();
    for (int64_t i = rowptr[r0]; i < rowptr[r1]; i++) {
      int32_t cb = cols[i] >> 7;
      if (stamp[cb] != (int32_t)rb) {
        stamp[cb] = (int32_t)rb;
        local.push_back(cb);
      }
    }
    std::sort(local.begin(), local.end());
    for (int32_t cb : local) {
      if (nb >= nbricks)
        return fail("bsr_fill: brick count changed between passes");
      brick_row[nb] = (int32_t)rb;
      brick_col[nb] = cb;
      bidx[cb] = nb;
      nb++;
    }
    for (int64_t r = r0; r < r1; r++) {
      for (int64_t i = rowptr[r]; i < rowptr[r + 1]; i++) {
        int32_t c = cols[i];
        bvals[(bidx[c >> 7] << 14) + ((r & 127) << 7) + (c & 127)] =
            vals[i];
      }
    }
  }
  if (nb != nbricks)
    return fail("bsr_fill: brick count changed between passes");
  return 0;
}

// ---------------------------------------------------------------------------
// v9: fast routed-converter path (formats/sell_routed.py).
//
// The routed pack's cost used to be numpy argsort + fancy-indexing plus a
// recursive, allocation-heavy Euler coloring — the pre-processing metric
// the reference treats as headline (CVR amortizes in ~2 SpMV iterations,
// paper Table 1; its converter is spmv.cpp:565-1014).  This block makes
// every O(nnz) pack stage a single native pass:
//
//   cvr_stream_count/fill  counting sort of plane elements by 1024-column
//                          window (within-window order is free — the
//                          expand kernel only needs window locality), with
//                          per-segment TB padding and the route perm
//                          emitted directly;
//   cvr_euler_color_perm   iterative, allocation-free Euler edge coloring
//                          (dst tile of edge i is i>>10, so only the src
//                          side is stored; ping-pong partition buffers);
//   cvr_route_planes_fused stage planes emitted straight in the
//                          sublane-split device layout with the stage-1
//                          composition (li gather) fused into the pass;
//   cvr_color_rows_cap     per-row mid colorings on the AGGREGATED Tk x Tk
//                          multiplicity matrix (capacitated Euler: even
//                          capacities split arithmetically, only odd
//                          entries walk) — O(entries) per level instead of
//                          O(edges).
// ---------------------------------------------------------------------------

// Pass 1: per-window element counts + padded tile accounting.
// Returns T_src_p (tiles incl. per-segment TB padding), fills wcnt.
int64_t cvr_stream_count(int64_t S, int64_t S_padded, const int64_t* rmap,
                         const int32_t* cols_plane, int64_t nwin_total,
                         int64_t segw, int64_t TB, int64_t* wcnt) {
  for (int64_t w = 0; w < nwin_total; w++) wcnt[w] = 0;
  wcnt[0] += 1024 * (S_padded - S);  // inserted zero rows carry col 0
  const int64_t n = S * 1024;
  for (int64_t i = 0; i < n; i++) wcnt[cols_plane[i] >> 10]++;
  const int64_t n_segs = (nwin_total + segw - 1) / segw;
  int64_t T_src_p = 0;
  for (int64_t s = 0; s < n_segs; s++) {
    int64_t tiles = 0;
    int64_t w1 = std::min(nwin_total, (s + 1) * segw);
    for (int64_t w = s * segw; w < w1; w++)
      tiles += (wcnt[w] + 1023) >> 10;
    T_src_p += ((tiles + TB - 1) / TB) * TB;
  }
  return T_src_p;
}

// Pass 2: stream arrays + the route permutation.
// perm[plane_pos] = stream position (dest -> source, plan_route form).
int cvr_stream_fill(int64_t S, int64_t S_padded, const int64_t* rmap,
                    const int32_t* cols_plane, int64_t nwin_total,
                    int64_t segw, int64_t TB, const int64_t* wcnt,
                    int64_t T, int32_t* perm, int16_t* li_flat,
                    int32_t* w8, int32_t* seg_blk) {
  const int64_t n_segs = (nwin_total + segw - 1) / segw;
  const int64_t NT = T * 1024;
  const int64_t N_plane = S_padded * 1024;
  // window -> first (padded) tile index; segment block map
  std::vector<int64_t> wtile((size_t)nwin_total + 1);
  {
    int64_t t = 0;
    for (int64_t s = 0; s < n_segs; s++) {
      int64_t t0 = t;
      int64_t w1 = std::min(nwin_total, (s + 1) * segw);
      for (int64_t w = s * segw; w < w1; w++) {
        wtile[(size_t)w] = t;
        t += (wcnt[w] + 1023) >> 10;
      }
      int64_t tp = t0 + ((t - t0 + TB - 1) / TB) * TB;  // segment pad
      for (int64_t b = t0 / TB; b < tp / TB; b++)
        seg_blk[b] = (int32_t)s;
      t = tp;
    }
    wtile[(size_t)nwin_total] = t;
    if (t > T) return fail("stream_fill: T too small");
    for (int64_t b = t / TB; b < T / TB; b++) seg_blk[b] = 0;
  }
  for (int64_t t = 0; t < T; t++) w8[t] = 0;
  for (int64_t w = 0; w < nwin_total; w++) {
    if (wcnt[w] == 0) continue;
    int64_t t1 = wtile[(size_t)w] + ((wcnt[w] + 1023) >> 10);
    int32_t rel = (int32_t)(w % segw);
    for (int64_t t = wtile[(size_t)w]; t < t1; t++) w8[t] = rel;
  }
  // stream fill: src_pos[stream] = plane position (or -1).  li defaults
  // to 0 (covers segment-pad tiles and the global tail).
  std::memset(li_flat, 0, (size_t)NT * sizeof(int16_t));
  std::vector<int32_t> src_pos((size_t)NT, -1);
  std::vector<int64_t> cursor((size_t)nwin_total);
  for (int64_t w = 0; w < nwin_total; w++)
    cursor[(size_t)w] = wtile[(size_t)w] * 1024;
  std::vector<uint8_t> covered((size_t)S_padded, 0);
  for (int64_t s = 0; s < S; s++) {
    covered[(size_t)rmap[s]] = 1;
    const int32_t* row = cols_plane + s * 1024;
    const int64_t base = rmap[s] * 1024;
    for (int64_t j = 0; j < 1024; j++) {
      int32_t c = row[j];
      int64_t w = c >> 10;
      int64_t pos = cursor[(size_t)w]++;
      src_pos[(size_t)pos] = (int32_t)(base + j);
      li_flat[pos] = (int16_t)(c & 1023);
    }
  }
  for (int64_t r = 0; r < S_padded; r++) {
    if (covered[(size_t)r]) continue;
    const int64_t base = r * 1024;
    for (int64_t j = 0; j < 1024; j++) {
      int64_t pos = cursor[0]++;
      src_pos[(size_t)pos] = (int32_t)(base + j);
      li_flat[pos] = 0;
    }
  }
  // fillers: pad each window's last tile with its last real offset
  for (int64_t w = 0; w < nwin_total; w++) {
    if (wcnt[w] == 0) continue;
    int64_t end = cursor[(size_t)w];
    int64_t tile_end = (wtile[(size_t)w] + ((wcnt[w] + 1023) >> 10)) * 1024;
    int16_t last = li_flat[end - 1];
    for (int64_t pos = end; pos < tile_end; pos++) li_flat[pos] = last;
  }
  // perm: dest plane position -> stream position; trash fills the tail
  int64_t jtrash = N_plane;
  for (int64_t pos = 0; pos < NT; pos++) {
    int32_t p = src_pos[(size_t)pos];
    if (p >= 0)
      perm[p] = (int32_t)pos;
    else
      perm[jtrash++] = (int32_t)pos;
  }
  if (jtrash != NT) return fail("stream_fill: trash count mismatch");
  return 0;
}

// ---------------------------------------------------------------------------
// v10 (round 3): subwindow-granular stream builder.
//
// The v9 builder cuts the column-sorted stream at aligned 1024-column
// window boundaries: every window boundary pads its last tile to 1024
// slots (~19% fillers on web-Google-like) and every tile needs the full
// 8 gather+select pairs in the expand kernel.  Column-sorted power-law
// tiles are much narrower than a window (mean ~2.7 of its 8 subwindows),
// so v10 slides tile bases at 128-column (subwindow) granularity:
//
//   * tiles cut ONLY when 1024 elements span more than 8 subwindows
//     (sparse column regions) or at x-segment boundaries — fillers all
//     but vanish and T (route size) shrinks with them;
//   * each tile records its CANDIDATE COUNT (subwindows spanned), which
//     the expand kernel dispatches per 8-tile group into 2/4/8
//     gather-class branches;
//   * w8 becomes a segment-relative SUBLANE index (128-column
//     granularity; the v9 aligned case is w8_v9 * 8).
// ---------------------------------------------------------------------------

// Pass 1: per-subwindow counts + padded tile count.  swcnt has
// nsw_total entries; segw8 = subwindows per x segment (a multiple of 8).
int64_t cvr_stream_count2(int64_t S, int64_t S_padded, const int64_t* rmap,
                          const int32_t* cols_plane, int64_t nsw_total,
                          int64_t segw8, int64_t TB, int64_t* swcnt) {
  (void)rmap;
  for (int64_t w = 0; w < nsw_total; w++) swcnt[w] = 0;
  swcnt[0] += 1024 * (S_padded - S);  // inserted zero rows carry col 0
  const int64_t n = S * 1024;
  for (int64_t i = 0; i < n; i++) swcnt[cols_plane[i] >> 7]++;
  const int64_t n_segs = (nsw_total + segw8 - 1) / segw8;
  int64_t T_src_p = 0;
  for (int64_t s = 0; s < n_segs; s++) {
    int64_t sw1 = std::min(nsw_total, (s + 1) * segw8);
    int64_t tiles = 0, filled = 0, base = -1;
    for (int64_t sw = s * segw8; sw < sw1; sw++) {
      int64_t c = swcnt[sw];
      while (c > 0) {
        if (filled > 0 && sw - base >= 8) {
          tiles++;  // close short (fillers)
          filled = 0;
        }
        if (filled == 0) base = sw;
        int64_t take = std::min((int64_t)1024 - filled, c);
        filled += take;
        c -= take;
        if (filled == 1024) {
          tiles++;
          filled = 0;
        }
      }
    }
    if (filled > 0) tiles++;
    T_src_p += ((tiles + TB - 1) / TB) * TB;
  }
  return T_src_p;
}

// Pass 2: stream arrays + route perm at subwindow granularity.
// w8[t] = segment-relative sublane base; cand[t] = subwindows spanned.
// Tiles come out CLASS-SORTED within their segment (stable by gather
// class 1/2/4/8) so 8-tile groups dispatch homogeneous expand branches:
// the walk assigns sequential tile ids, tile_out[] remaps every write
// to the sorted position (the route perm absorbs any tile order).
int cvr_stream_fill2(int64_t S, int64_t S_padded, const int64_t* rmap,
                     const int32_t* cols_plane, int64_t nsw_total,
                     int64_t segw8, int64_t TB, const int64_t* swcnt,
                     int64_t T, int32_t* perm, int16_t* li_flat,
                     int32_t* w8, int8_t* cand, int32_t* seg_blk) {
  const int64_t n_segs = (nsw_total + segw8 - 1) / segw8;
  const int64_t NT = T * 1024;
  const int64_t N_plane = S_padded * 1024;
  std::vector<int64_t> swpos((size_t)nsw_total, -1);
  std::vector<int32_t> tbase((size_t)T, 0);  // absolute base subwindow, seq id
  std::vector<int64_t> seg_t0(n_segs + 1, 0), seg_tp(n_segs + 1, 0);
  for (int64_t t = 0; t < T; t++) {
    w8[t] = 0;
    cand[t] = 1;
  }
  int64_t t = 0;
  for (int64_t s = 0; s < n_segs; s++) {
    const int64_t t0 = t;
    const int64_t sw1 = std::min(nsw_total, (s + 1) * segw8);
    int64_t filled = 0, base = -1;
    for (int64_t sw = s * segw8; sw < sw1; sw++) {
      int64_t c = swcnt[sw];
      bool first_chunk = true;
      while (c > 0) {
        if (filled > 0 && sw - base >= 8) {
          t++;
          filled = 0;
        }
        if (filled == 0) {
          base = sw;
          if (t >= T) return fail("stream_fill2: T too small");
          tbase[(size_t)t] = (int32_t)base;
          w8[t] = (int32_t)(base - s * segw8);
          cand[t] = 1;
        }
        if (first_chunk) {
          swpos[(size_t)sw] = t * 1024 + filled;
          first_chunk = false;
        }
        int8_t cd = (int8_t)(sw - base + 1);
        if (cd > cand[t]) cand[t] = cd;
        int64_t take = std::min((int64_t)1024 - filled, c);
        filled += take;
        c -= take;
        if (filled == 1024) {
          t++;
          filled = 0;
        }
      }
    }
    if (filled > 0) t++;
    const int64_t tp = t0 + ((t - t0 + TB - 1) / TB) * TB;
    if (tp > T) return fail("stream_fill2: T too small (segment pad)");
    for (int64_t b = t0 / TB; b < tp / TB; b++) seg_blk[b] = (int32_t)s;
    seg_t0[s] = t0;
    seg_tp[s] = tp;
    t = tp;
  }
  for (int64_t b = t / TB; b < T / TB; b++) seg_blk[b] = 0;

  // Stable class sort within each segment (pad tiles keep cand=1 and
  // land at the head of the class-1 bucket after the real class-1
  // tiles they trail in walk order... i.e. in walk order, which is the
  // stable order).  tile_out: sequential tile id -> sorted position.
  std::vector<int32_t> tile_out((size_t)T);
  for (int64_t tt = 0; tt < T; tt++) tile_out[(size_t)tt] = (int32_t)tt;
  auto cls_of = [](int8_t c) {
    return c <= 1 ? 0 : (c <= 2 ? 1 : (c <= 4 ? 2 : 3));
  };
  for (int64_t s = 0; s < n_segs; s++) {
    const int64_t t0 = seg_t0[s], tp = seg_tp[s];
    int64_t cnt[4] = {0, 0, 0, 0};
    for (int64_t tt = t0; tt < tp; tt++) cnt[cls_of(cand[tt])]++;
    int64_t off[4] = {t0, t0 + cnt[0], t0 + cnt[0] + cnt[1],
                      t0 + cnt[0] + cnt[1] + cnt[2]};
    for (int64_t tt = t0; tt < tp; tt++)
      tile_out[(size_t)tt] = (int32_t)off[cls_of(cand[tt])]++;
  }
  {  // permute the small per-tile outputs into sorted order
    std::vector<int32_t> w8s((size_t)T);
    std::vector<int8_t> cs((size_t)T);
    for (int64_t tt = 0; tt < T; tt++) {
      w8s[(size_t)tile_out[(size_t)tt]] = w8[tt];
      cs[(size_t)tile_out[(size_t)tt]] = cand[tt];
    }
    std::memcpy(w8, w8s.data(), (size_t)T * sizeof(int32_t));
    std::memcpy(cand, cs.data(), (size_t)T * sizeof(int8_t));
  }

  // Pass 3: element scatter.  Within one subwindow, stream positions are
  // contiguous (1024-fill closes keep the cursor running into the next
  // tile; short closes only happen at a subwindow's first chunk).  The
  // cursor runs in sequential-tile coordinates; writes remap through
  // tile_out so li/src land at the class-sorted stream positions.
  std::memset(li_flat, 0, (size_t)NT * sizeof(int16_t));
  std::vector<int32_t> src_pos((size_t)NT, -1);
  std::vector<int64_t> cursor(swpos);
  std::vector<uint8_t> covered((size_t)S_padded, 0);
  for (int64_t r = 0; r < S; r++) {
    covered[(size_t)rmap[r]] = 1;
    const int32_t* row = cols_plane + r * 1024;
    const int64_t pbase = rmap[r] * 1024;
    for (int64_t j = 0; j < 1024; j++) {
      const int32_t c = row[j];
      const int64_t sw = c >> 7;
      const int64_t pos = cursor[(size_t)sw]++;
      const int64_t fpos =
          ((int64_t)tile_out[(size_t)(pos >> 10)] << 10) | (pos & 1023);
      src_pos[(size_t)fpos] = (int32_t)(pbase + j);
      li_flat[fpos] = (int16_t)(c - (tbase[(size_t)(pos >> 10)] << 7));
    }
  }
  for (int64_t r = 0; r < S_padded; r++) {
    if (covered[(size_t)r]) continue;
    const int64_t pbase = r * 1024;
    for (int64_t j = 0; j < 1024; j++) {
      const int64_t pos = cursor[0]++;
      const int64_t fpos =
          ((int64_t)tile_out[(size_t)(pos >> 10)] << 10) | (pos & 1023);
      src_pos[(size_t)fpos] = (int32_t)(pbase + j);
      li_flat[fpos] = (int16_t)(-(tbase[(size_t)(pos >> 10)] << 7));
    }
  }
  // fillers: repeat the tile's last real offset (keeps gathers in-window)
  for (int64_t tt = 0; tt < T; tt++) {
    int16_t last = 0;
    const int64_t p0 = tt * 1024;
    for (int64_t p = p0; p < p0 + 1024; p++) {
      if (src_pos[(size_t)p] >= 0)
        last = li_flat[p];
      else
        li_flat[p] = last;
    }
  }
  // perm: dest plane position -> stream position; trash fills the tail
  int64_t jtrash = N_plane;
  for (int64_t pos = 0; pos < NT; pos++) {
    const int32_t p = src_pos[(size_t)pos];
    if (p >= 0)
      perm[p] = (int32_t)pos;
    else
      perm[jtrash++] = (int32_t)pos;
  }
  if (jtrash != NT) return fail("stream_fill2: trash count mismatch");
  return 0;
}

// Iterative Euler edge coloring where dst(edge e) = orig_id(e) >> 10.
// Stores only (usrc, gid) per edge; partition ping-pongs through scratch.
//
// Leader finding is single-chase: during the (interleaved, prefetched)
// ruler chase every edge records its ruler SEGMENT id; segments are
// stitched into cycles over the tiny ruler table and the side test reads
// leaders through that table — no second chase and no materialized
// next2 array (the double-step successor pu[pv[e]] is gathered lazily).
static void euler_iter_perm(int64_t m, int32_t* usrc, int32_t* gid,
                            int64_t n_tiles, int32_t k, int32_t* color) {
  // v2 (round 3): the dst-side pairing is POSITIONAL at every level, not
  // just the top one.  Invariant: each recursion segment holds its edges
  // sorted by gid (dst position) — true at the top (gid = identity) and
  // preserved because the side partition below is stable.  In gid order
  // one dst tile's edges are consecutive, every dst tile has exactly k
  // edges in the segment (the graph is k-regular at every level, k
  // even, and Euler halving is exact), and segment starts stay even, so
  // consecutive (even, odd) slots are exactly the dst-side Euler pairs:
  //
  //     pv(e) = e ^ 1        (never materialized)
  //
  // This removes the pv array (half the chase footprint), the dst
  // pairing pass, one of the two dependent random reads per chase step
  // (next2(e) = pu[e ^ 1]), and — since halving is exact — the side
  // counting pass (na = ms / 2 always).  Measured ~2.5x on the
  // converter's whale phase at web scale; the win grows with size
  // because the footprint halves.
  std::vector<int32_t> usrc2((size_t)m), gid2((size_t)m);
  std::vector<int32_t> pu((size_t)m), seg_of((size_t)m);
  std::vector<int32_t> pend((size_t)n_tiles, -1);
  std::vector<int32_t> pend_ep((size_t)n_tiles, -1);
  std::vector<int32_t> ruler_leader;
  std::vector<int32_t> succ_ruler;
  int32_t epoch = 0;
  struct Seg {
    int64_t start, end;
    int32_t k, base;
  };
  std::vector<Seg> stack;
  stack.push_back({0, m, k, 0});
  while (!stack.empty()) {
    Seg sg = stack.back();
    stack.pop_back();
    const int64_t s0 = sg.start, s1 = sg.end, ms = s1 - s0;
    if (sg.k == 1) {
      for (int64_t e = s0; e < s1; e++) color[gid[(size_t)e]] = sg.base;
      continue;
    }
    // pairing at the src side via pending pointers (epoch-stamped)
    epoch++;
    for (int64_t e = s0; e < s1; e++) {
      int32_t u = usrc[(size_t)e];
      if (pend_ep[(size_t)u] != epoch) {
        pend_ep[(size_t)u] = epoch;
        pend[(size_t)u] = (int32_t)e;
      } else if (pend[(size_t)u] < 0) {
        pend[(size_t)u] = (int32_t)e;
      } else {
        int32_t o = pend[(size_t)u];
        pu[(size_t)e] = o;
        pu[(size_t)o] = (int32_t)e;
        pend[(size_t)u] = -1;
      }
    }
    // single chase: every edge records its ruler segment id
    const int64_t R = 256;
    const int W = 32;
    auto next2 = [&](int32_t e) { return pu[(size_t)(e ^ 1)]; };
    if (ms >= (int64_t)1 << 15) {
      const int64_t n_rulers = (ms + R - 1) / R;
      succ_ruler.assign((size_t)n_rulers, -1);
      for (int64_t e = s0; e < s1; e++) seg_of[(size_t)e] = -1;
      {
        struct Cur {
          int64_t ruler;
          int32_t e;
        };
        std::vector<Cur> cs;
        cs.reserve(W);
        int64_t next_start = 0;
        auto refill = [&]() {
          while ((int64_t)cs.size() < W && next_start < n_rulers) {
            int64_t r = next_start++;
            seg_of[(size_t)(s0 + r * R)] = (int32_t)r;
            cs.push_back({r, next2((int32_t)(s0 + r * R))});
          }
        };
        refill();
        while (!cs.empty()) {
          for (size_t c = 0; c < cs.size();) {
            int32_t e = cs[c].e;
            if (((e - s0) % R) == 0) {  // reached the next ruler
              succ_ruler[(size_t)cs[c].ruler] = (int32_t)((e - s0) / R);
              cs[c] = cs.back();
              cs.pop_back();
              continue;
            }
            seg_of[(size_t)e] = (int32_t)cs[c].ruler;
            int32_t nx = pu[(size_t)(e ^ 1)];
            __builtin_prefetch(&pu[(size_t)(nx ^ 1)]);
            cs[c].e = nx;
            c++;
          }
          refill();
        }
      }
      // stitch ruler segments into cycles (tiny, cache-resident)
      ruler_leader.assign((size_t)n_rulers, -1);
      {
        std::vector<int32_t> path;
        for (int64_t r = 0; r < n_rulers; r++) {
          if (ruler_leader[(size_t)r] != -1) continue;
          path.clear();
          int32_t lead = (int32_t)(s0 + r * R);
          int64_t x = r;
          while (ruler_leader[(size_t)x] == -1) {
            ruler_leader[(size_t)x] = -2;
            path.push_back((int32_t)x);
            x = succ_ruler[(size_t)x];
            if (ruler_leader[(size_t)x] == -1 &&
                (int32_t)(s0 + x * R) < lead)
              lead = (int32_t)(s0 + x * R);
          }
          int32_t fl =
              ruler_leader[(size_t)x] >= 0 ? ruler_leader[(size_t)x] : lead;
          for (int32_t pr : path) ruler_leader[(size_t)pr] = fl;
        }
      }
      // leftover cycles containing no ruler: sequential sweep with
      // pseudo-ruler ids appended to the leader table
      for (int64_t e = s0; e < s1; e++) {
        if (seg_of[(size_t)e] >= 0) continue;
        int32_t rid = (int32_t)ruler_leader.size();
        ruler_leader.push_back((int32_t)e);
        int32_t x = (int32_t)e;
        while (seg_of[(size_t)x] < 0) {
          seg_of[(size_t)x] = rid;
          x = next2(x);
        }
      }
    } else {
      // small segment: direct sweep, one pseudo-ruler per cycle
      ruler_leader.clear();
      for (int64_t e = s0; e < s1; e++) seg_of[(size_t)e] = -1;
      for (int64_t e = s0; e < s1; e++) {
        if (seg_of[(size_t)e] >= 0) continue;
        int32_t rid = (int32_t)ruler_leader.size();
        ruler_leader.push_back((int32_t)e);
        int32_t x = (int32_t)e;
        while (seg_of[(size_t)x] < 0) {
          seg_of[(size_t)x] = rid;
          x = next2(x);
        }
      }
    }
    // stable partition into scratch.  Euler halving is exact, so the
    // side counts are known (na = ms/2) and the whole pass streams:
    // seg_of[e] and seg_of[e ^ 1] are adjacent reads, the leader table
    // is tiny, and no counting pre-pass is needed.
    const int64_t na = ms / 2;
    {
      int64_t ia = s0, ib = s0 + na;
      for (int64_t e = s0; e < s1; e++) {
        int32_t la = ruler_leader[(size_t)seg_of[(size_t)e]];
        int32_t lb = ruler_leader[(size_t)seg_of[(size_t)(e ^ 1)]];
        int64_t d = (la > lb) ? ib++ : ia++;
        if (__builtin_expect(d >= m, 0)) {
          std::fprintf(stderr,
                       "cvr_native: euler positional-pv invariant "
                       "violated (segment [%lld,%lld))\n",
                       (long long)s0, (long long)s1);
          std::abort();
        }
        usrc2[(size_t)d] = usrc[(size_t)e];
        gid2[(size_t)d] = gid[(size_t)e];
      }
      if (ia != s0 + na || ib != s1) {
        std::fprintf(stderr,
                     "cvr_native: euler halving imbalance (%lld vs %lld)\n",
                     (long long)(ia - s0), (long long)na);
        std::abort();
      }
    }
    std::memcpy(usrc + s0, usrc2.data() + s0, (size_t)ms * 4);
    std::memcpy(gid + s0, gid2.data() + s0, (size_t)ms * 4);
    stack.push_back({s0 + na, s1, sg.k / 2, (int32_t)(sg.base + sg.k / 2)});
    stack.push_back({s0, s0 + na, sg.k / 2, sg.base});
  }
}

int cvr_euler_color_perm(int64_t n, const int32_t* perm, int64_t T,
                         int32_t* color) {
  if (n != T * 1024) return fail("perm length must be T*1024");
  std::vector<int32_t> usrc((size_t)n), gid((size_t)n);
  for (int64_t i = 0; i < n; i++) {
    usrc[(size_t)i] = perm[i] >> 10;
    gid[(size_t)i] = (int32_t)i;
  }
  euler_iter_perm(n, usrc.data(), gid.data(), T, 1024, color);
  return 0;
}

// ---------------------------------------------------------------------------
// Fused route compile (round 3): Euler coloring + plane emission in one.
//
// Differences from cvr_euler_color_perm + cvr_route_planes_fused:
//   * BFS level order with buffer SWAP — the DFS version memcpy'd the
//     partition back into place at every level (16 B/edge/level);
//   * the full perm value p rides in the edge arrays (src tile = p >> 10
//     on the fly), so the final level can emit the stage planes without
//     re-reading perm;
//   * the k == 2 level computes sides and EMITS directly — the k == 1
//     color write, the final partition, the materialized colors array
//     and the separate plane pass (~4 random accesses/edge over ~85 MB)
//     all disappear.  Emission order is gid-ascending per color pair, so
//     the p3 writes are 8 ascending strided streams, mid writes are two
//     interleaved sequential streams, and the s1 writes for one color
//     stay inside a T*256 B region (L2/L3-resident).
//
// li_flat == NULL emits s1 offsets (p & 1023) — the y-route case; else
// the stage-1 li composition li_flat[p] (the expand-plane case).
// Planes: s1_ss (8, Tp, 128) i16 (tiles [T, Tp) identity),
// mid (1024, T) i32, p3_ss (8, S_dst, 128) i16 (rows [T, S_dst) identity).
// ---------------------------------------------------------------------------

// Per-edge chase state: the pairing pointer and the segment id live in
// ONE interleaved struct so a chase step touches a single random cache
// line — next2 reads ps[e^1].pu and the seg write hits ps[e].seg, and
// e^1 is always line-adjacent to e (measured ~2x on the DRAM-bound
// levels vs split pu[]/seg_of[] arrays).
struct EdgePS {
  int32_t pu;
  int32_t seg;
};

// Chase all double-step cycles of a segment, filling ps[].seg with a
// per-edge segment id and leaders with the cycle leader per id.
// next2(e) = ps[e ^ 1].pu (positional dst pairing — see euler_iter_perm).
static void chase_leaders(EdgePS* ps, int64_t s0,
                          int64_t s1, std::vector<int32_t>& ruler_leader,
                          std::vector<int32_t>& succ_ruler) {
  const int64_t ms = s1 - s0;
  const int64_t R = 256;
  const int W = 32;
  auto next2 = [&](int32_t e) { return ps[(size_t)(e ^ 1)].pu; };
  if (ms >= (int64_t)1 << 15) {
    const int64_t n_rulers = (ms + R - 1) / R;
    succ_ruler.assign((size_t)n_rulers, -1);
    for (int64_t e = s0; e < s1; e++) ps[(size_t)e].seg = -1;
    struct Cur {
      int64_t ruler;
      int32_t e;
    };
    std::vector<Cur> cs;
    cs.reserve(W);
    int64_t next_start = 0;
    auto refill = [&]() {
      while ((int64_t)cs.size() < W && next_start < n_rulers) {
        int64_t r = next_start++;
        ps[(size_t)(s0 + r * R)].seg = (int32_t)r;
        cs.push_back({r, next2((int32_t)(s0 + r * R))});
      }
    };
    refill();
    while (!cs.empty()) {
      for (size_t c = 0; c < cs.size();) {
        int32_t e = cs[c].e;
        if (((e - s0) % R) == 0) {  // reached the next ruler
          succ_ruler[(size_t)cs[c].ruler] = (int32_t)((e - s0) / R);
          cs[c] = cs.back();
          cs.pop_back();
          continue;
        }
        int32_t nx = ps[(size_t)(e ^ 1)].pu;
        ps[(size_t)e].seg = (int32_t)cs[c].ruler;
        __builtin_prefetch(&ps[(size_t)(nx ^ 1)]);
        cs[c].e = nx;
        c++;
      }
      refill();
    }
    // stitch ruler segments into cycles (tiny, cache-resident)
    ruler_leader.assign((size_t)n_rulers, -1);
    {
      std::vector<int32_t> path;
      for (int64_t r = 0; r < n_rulers; r++) {
        if (ruler_leader[(size_t)r] != -1) continue;
        path.clear();
        int32_t lead = (int32_t)(s0 + r * R);
        int64_t x = r;
        while (ruler_leader[(size_t)x] == -1) {
          ruler_leader[(size_t)x] = -2;
          path.push_back((int32_t)x);
          x = succ_ruler[(size_t)x];
          if (ruler_leader[(size_t)x] == -1 && (int32_t)(s0 + x * R) < lead)
            lead = (int32_t)(s0 + x * R);
        }
        int32_t fl =
            ruler_leader[(size_t)x] >= 0 ? ruler_leader[(size_t)x] : lead;
        for (int32_t pr : path) ruler_leader[(size_t)pr] = fl;
      }
    }
    // leftover cycles containing no ruler
    for (int64_t e = s0; e < s1; e++) {
      if (ps[(size_t)e].seg >= 0) continue;
      int32_t rid = (int32_t)ruler_leader.size();
      ruler_leader.push_back((int32_t)e);
      int32_t x = (int32_t)e;
      while (ps[(size_t)x].seg < 0) {
        ps[(size_t)x].seg = rid;
        x = next2(x);
      }
    }
  } else {
    ruler_leader.clear();
    for (int64_t e = s0; e < s1; e++) ps[(size_t)e].seg = -1;
    for (int64_t e = s0; e < s1; e++) {
      if (ps[(size_t)e].seg >= 0) continue;
      int32_t rid = (int32_t)ruler_leader.size();
      ruler_leader.push_back((int32_t)e);
      int32_t x = (int32_t)e;
      while (ps[(size_t)x].seg < 0) {
        ps[(size_t)x].seg = rid;
        x = next2(x);
      }
    }
  }
}

// Core of the fused route compile.  Zone-A support (v4, "aligned
// stage-3"): plane rows < zrows whose row_slice[r] >= 0 belong to
// lambda-segment slices — slice s covers padded rows [zr0[s], zr0[s] +
// zw[s]), each of its 128 lanes holds ONE segment whose elements fill
// the (row, sublane) slots freely.  The first three Euler levels pair
// the dst side per (slice, lane) block (degree 8*zw[s], even at every
// level), so after three levels each block holds exactly zw[s] edges
// per top-3-bit class h; a positional re-scatter then assigns them to
// the block's rows with NEW sublane == h.  The remaining seven levels
// see a 128-regular graph (128 per dst tile: one per lane), so the
// final color q of every zone-A edge satisfies (q >> 7) == its slot
// sublane — the reduce kernel's stage-3 needs one lane-gather per
// sublane instead of 8 gather+select pairs (ops/pallas_route.py).
// r2[final_pos] = provisional_pos records the re-scatter so the caller
// can permute the value planes (identity outside zone A).
static int route_compile_core(int64_t n, const int32_t* perm, int64_t T,
                              int64_t Tp, int64_t S_dst,
                              const int16_t* li_flat, int16_t* s1_ss,
                              int32_t* mid, int16_t* p3_ss, int64_t nslA,
                              const int64_t* zr0, const int32_t* zw,
                              int64_t zrows, const int32_t* row_slice,
                              int32_t* r2) {
  if (n != T * 1024) return fail("perm length must be T*1024");
  if (Tp < T) return fail("Tp must be >= T");
  if (nslA && (!zr0 || !zw || !row_slice || !r2))
    return fail("zone tables required when nslA > 0");
  // The per-edge state carried through the levels is (src tile u, gid,
  // payload v) where v is the int16 the emission will write (li_flat[p]
  // for the expand plane, p & 1023 for the y-route) — gathered ONCE at
  // init instead of 1 random read/edge at emit.  Buffers are
  // deliberately uninitialized (new[], POD): every element is written
  // before it is read, and the zero-fill of ~24 B/edge was a measurable
  // cold-start cost at 25M+ nnz.
  auto ua = std::unique_ptr<int32_t[]>(new int32_t[(size_t)n]);
  auto ub = std::unique_ptr<int32_t[]>(new int32_t[(size_t)n]);
  auto ga = std::unique_ptr<int32_t[]>(new int32_t[(size_t)n]);
  auto gb = std::unique_ptr<int32_t[]>(new int32_t[(size_t)n]);
  auto va = std::unique_ptr<int16_t[]>(new int16_t[(size_t)n]);
  auto vb = std::unique_ptr<int16_t[]>(new int16_t[(size_t)n]);
  auto ps = std::unique_ptr<EdgePS[]>(new EdgePS[(size_t)n]);
  // Two pending tables: each level's src pairing is fused into the
  // PREVIOUS level's partition (edges pair in child-position order as
  // they are appended), and the two children interleave.  (epoch,
  // index) pack into one int64 per src tile: a single load/store and a
  // branchless pair test (see the partition loop).
  std::vector<uint64_t> pend64a((size_t)T, 0), pend64b((size_t)T, 0);
  std::vector<int32_t> ruler_leader, succ_ruler;
  int32_t epoch = 0;
  {  // init + the level-0 pairing in one pass.  With zone A the edge
     // sequence groups zone-A positions by (slice, lane) — the dst-side
     // positional pairing then pairs within those blocks for the first
     // three levels — followed by the remaining rows in position order.
    const uint64_t ep = (uint64_t)(++epoch) << 32;
    uint64_t* p64 = pend64a.data();
    int64_t e = 0;
    auto emit1 = [&](int64_t i) {
      const int32_t p = perm[i];
      const int32_t u = p >> 10;
      ua[(size_t)e] = u;
      ga[(size_t)e] = (int32_t)i;
      va[(size_t)e] = li_flat ? li_flat[p] : (int16_t)(p & 1023);
      const uint64_t pv = p64[(size_t)u];
      const int32_t o = (int32_t)pv;
      const bool do_pair = (pv & ~0xffffffffull) == ep && o >= 0;
      const int32_t partner = do_pair ? o : (int32_t)e;
      ps[(size_t)e].pu = partner;
      ps[(size_t)partner].pu = (int32_t)e;
      p64[(size_t)u] =
          ep | (uint32_t)(do_pair ? (int32_t)-1 : (int32_t)e);
      e++;
    };
    if (nslA) {
      for (int64_t s = 0; s < nslA; s++)
        for (int64_t lam = 0; lam < 128; lam++)
          for (int64_t jr = 0; jr < zw[s]; jr++)
            for (int64_t sub = 0; sub < 8; sub++)
              emit1((zr0[s] + jr) * 1024 + sub * 128 + lam);
      for (int64_t r = 0; r < T; r++) {
        if (r < zrows && row_slice[r] >= 0) continue;
        for (int64_t c = 0; c < 1024; c++) emit1(r * 1024 + c);
      }
      if (e != n) return fail("route_compile: zone edge count mismatch");
    } else {
      for (int64_t i = 0; i < n; i++) emit1(i);
    }
  }
  int32_t* cu = ua.get();
  int32_t* cg = ga.get();
  int16_t* cv = va.get();
  int32_t* ou = ub.get();
  int32_t* og = gb.get();
  int16_t* ov = vb.get();
  // zone A: compact slot-row index (padding rows excluded) for the
  // level-3 positional re-scatter
  std::vector<int32_t> compact_row;
  int64_t NA = 0;
  if (nslA) {
    compact_row.assign((size_t)zrows, -1);
    for (int64_t r = 0; r < zrows; r++)
      if (row_slice[r] >= 0) compact_row[(size_t)r] = (int32_t)NA++;
  }
  int64_t seg = n;
  for (int32_t k = 1024; k >= 2; k >>= 1) {
    double tl = euler_debug() ? now_s() : 0.0;
    const bool last = (k == 2);
    if (k == 128 && nslA) {
      // Zone-A re-scatter: assign each (slice, lane, class) block's
      // zw[s] edges to the block's rows with sublane == class, placing
      // them in (row, lane) order so levels 4-10 pair positionally;
      // the other edges append in stable order after the zone-A part.
      const int64_t NA128 = NA * 128;
      for (int64_t s0 = 0; s0 < n; s0 += seg) {
        const int64_t s1 = s0 + seg;
        const int32_t h = (int32_t)(s0 / seg);
        int64_t front = s0 + NA128;
        int32_t cur_key = -1, cnt = 0;
        // src pairing fused into the scatter (the chase only needs
        // SOME same-u involution within the segment — positional
        // adjacency matters on the dst side only, which the scattered
        // d order provides); partners are recorded at their d slots as
        // they appear, saving the separate full re-pair pass (~1
        // random pend access/edge, measured ~0.9 s at soc scale).
        const uint64_t ep = (uint64_t)(++epoch) << 32;
        uint64_t* p64 = pend64a.data();
        for (int64_t ee = s0; ee < s1; ee++) {
          const int32_t g0 = cg[(size_t)ee];
          const int64_t r0 = (int64_t)g0 >> 10;
          int64_t d;
          int32_t gnew = g0;
          if (r0 < zrows && row_slice[(size_t)r0] >= 0) {
            const int32_t sl = row_slice[(size_t)r0];
            const int32_t lam = g0 & 127;
            const int32_t key = sl * 128 + lam;
            if (key != cur_key) {
              cur_key = key;
              cnt = 0;
            }
            if (__builtin_expect(cnt >= zw[(size_t)sl], 0))
              return fail("route_compile: zone class overflow");
            const int64_t rn = zr0[(size_t)sl] + cnt++;
            gnew = (int32_t)(rn * 1024 + (int64_t)h * 128 + lam);
            d = s0 + (int64_t)compact_row[(size_t)rn] * 128 + lam;
          } else {
            d = front++;
          }
          const int32_t u = cu[(size_t)ee];
          ou[(size_t)d] = u;
          og[(size_t)d] = gnew;
          ov[(size_t)d] = cv[(size_t)ee];
          r2[(size_t)gnew] = g0;
          const uint64_t pv = p64[(size_t)u];
          const int32_t o = (int32_t)pv;
          const bool do_pair = (pv & ~0xffffffffull) == ep && o >= 0;
          const int32_t partner = do_pair ? o : (int32_t)d;
          ps[(size_t)d].pu = partner;
          ps[(size_t)partner].pu = (int32_t)d;
          p64[(size_t)u] =
              ep | (uint32_t)(do_pair ? (int32_t)-1 : (int32_t)d);
        }
        if (front != s1)
          return fail("route_compile: zone scatter imbalance");
      }
      std::swap(cu, ou);
      std::swap(cg, og);
      std::swap(cv, ov);
    }
    for (int64_t s0 = 0; s0 < n; s0 += seg) {
      const int64_t s1 = s0 + seg;
      chase_leaders(ps.get(), s0, s1, ruler_leader, succ_ruler);
      if (last) {
        // sides ARE the low color bit.  After 9 partition levels the
        // edge order is scrambled, so direct plane emission here makes
        // all three writes random over ~200 MB (measured 3.7 s at 25M
        // nnz).  Instead pack (color, payload) into ONE stream-ordered
        // int32 scatter (54 MB region); the planes are written after
        // the level loop in ascending-i order, where mid/p3 writes are
        // cache-friendly.  qv_of_i aliases the spent ua/ub buffer.
        int32_t* qv = (cu == ua.get()) ? ub.get() : ua.get();
        const int32_t base = (int32_t)((s0 / seg) * 2);
        for (int64_t e = s0; e < s1; e++) {
          if (e + 24 < s1)
            __builtin_prefetch(&qv[(size_t)cg[(size_t)(e + 24)]], 1);
          const int32_t la = ruler_leader[(size_t)ps[(size_t)e].seg];
          const int32_t lb =
              ruler_leader[(size_t)ps[(size_t)(e ^ 1)].seg];
          const int32_t q = base + (la > lb);
          qv[(size_t)cg[(size_t)e]] =
              (q << 16) | (uint16_t)cv[(size_t)e];
        }
        continue;
      }
      // partition into the out buffers, pairing each child as it fills.
      // Fully branchless body: the side pick is a 50/50 coin (a
      // mispredict per edge costs ~5 ns), so the write front comes from
      // an indexed pair and the 3-way pend chain collapses to cmovs —
      // a lone unpaired edge writes a harmless self-loop that its later
      // partner overwrites (per-(u, side) degrees are even, so every
      // edge pairs before the level ends).  pend packs (epoch, index)
      // in one int64 load/store.
      const int64_t na = seg / 2;
      int64_t fronts[2] = {s0, s0 + na};
      const int64_t ep2 = (int64_t)(epoch += 2);
      const int64_t epA = ep2 - 1, epB = ep2;
      uint64_t* p64A = pend64a.data();
      uint64_t* p64B = pend64b.data();
      for (int64_t e = s0; e < s1; e++) {
        const int32_t la = ruler_leader[(size_t)ps[(size_t)e].seg];
        const int32_t lb = ruler_leader[(size_t)ps[(size_t)(e ^ 1)].seg];
        const int sideB = la > lb;
        const int64_t d = fronts[sideB]++;
        if (__builtin_expect(d >= n, 0))
          return fail("route_compile: halving invariant violated");
        const int32_t u = cu[(size_t)e];
        ou[(size_t)d] = u;
        og[(size_t)d] = cg[(size_t)e];
        ov[(size_t)d] = cv[(size_t)e];
        uint64_t* p64 = sideB ? p64B : p64A;
        const uint64_t ep = (uint64_t)(sideB ? epB : epA) << 32;
        const uint64_t pv = p64[(size_t)u];
        const int32_t o = (int32_t)pv;
        const bool do_pair = (pv & ~0xffffffffull) == ep && o >= 0;
        const int32_t partner = do_pair ? o : (int32_t)d;
        ps[(size_t)d].pu = partner;
        ps[(size_t)partner].pu = (int32_t)d;
        p64[(size_t)u] =
            ep | (uint32_t)(do_pair ? (int32_t)-1 : (int32_t)d);
      }
      if (fronts[0] != s0 + na || fronts[1] != s1)
        return fail("route_compile: halving imbalance");
    }
    if (euler_debug())
      std::fprintf(stderr, "route_compile k=%d: %.3fs\n", k, now_s() - tl);
    if (!last) {
      std::swap(cu, ou);
      std::swap(cg, og);
      std::swap(cv, ov);
      seg >>= 1;
    }
  }
  {  // stream-ordered plane emission: d/o ascend with i, so the p3
     // writes stream and the mid writes stay within one L2-sized
     // column window; only the s1_ss write (random a) misses.
    const int32_t* qv = (cu == ua.get()) ? ub.get() : ua.get();
    for (int64_t i = 0; i < n; i++) {
      if (i + 16 < n) {
        const int32_t qn = qv[(size_t)(i + 16)] >> 16;
        const int64_t pn = nslA ? (int64_t)r2[(size_t)(i + 16)] : i + 16;
        const int64_t an = (int64_t)(perm[pn] >> 10);
        __builtin_prefetch(
            &s1_ss[((int64_t)(qn >> 7) * Tp + an) * 128 + (qn & 127)], 1);
        __builtin_prefetch(&mid[(int64_t)qn * T + ((i + 16) >> 10)], 1);
      }
      const int32_t q = qv[(size_t)i] >> 16;
      const int16_t v = (int16_t)(qv[(size_t)i] & 0xffff);
      const int64_t a =
          (int64_t)(perm[nslA ? (int64_t)r2[(size_t)i] : i] >> 10);
      const int64_t d = i >> 10;
      const int64_t o = i & 1023;
      s1_ss[((int64_t)(q >> 7) * Tp + a) * 128 + (q & 127)] = v;
      mid[(int64_t)q * T + d] = (int32_t)a;
      if (d < S_dst)
        p3_ss[((o >> 7) * S_dst + d) * 128 + (o & 127)] = (int16_t)q;
    }
  }
  for (int64_t t = T; t < Tp; t++)
    for (int64_t q = 0; q < 1024; q++)
      s1_ss[((q >> 7) * Tp + t) * 128 + (q & 127)] = (int16_t)q;
  for (int64_t d = T; d < S_dst; d++)
    for (int64_t o = 0; o < 1024; o++)
      p3_ss[((o >> 7) * S_dst + d) * 128 + (o & 127)] = (int16_t)o;
  return 0;
}

int cvr_route_compile(int64_t n, const int32_t* perm, int64_t T, int64_t Tp,
                      int64_t S_dst, const int16_t* li_flat, int16_t* s1_ss,
                      int32_t* mid, int16_t* p3_ss) {
  return route_compile_core(n, perm, T, Tp, S_dst, li_flat, s1_ss, mid,
                            p3_ss, 0, nullptr, nullptr, 0, nullptr,
                            nullptr);
}

int cvr_route_compile_zone(int64_t n, const int32_t* perm, int64_t T,
                           int64_t Tp, int64_t S_dst,
                           const int16_t* li_flat, int16_t* s1_ss,
                           int32_t* mid, int16_t* p3_ss, int64_t nslA,
                           const int64_t* zr0, const int32_t* zw,
                           int64_t zrows, const int32_t* row_slice,
                           int32_t* r2) {
  return route_compile_core(n, perm, T, Tp, S_dst, li_flat, s1_ss, mid,
                            p3_ss, nslA, zr0, zw, zrows, row_slice, r2);
}

// Zone-aware plane refill (v4): scatter the SELL planes (old layout:
// slice = 1024 segments, segment g at lane g & 1023 of slice g >> 10,
// element j of the segment at row oldoff[g >> 10] + j) into the routed
// provisional layout.  Zone A (the first zsl_old OLD slices, i.e. the
// longest segments): new slice s' = 8 * (g >> 10) + ((g & 1023) >> 7)
// holds 128 segments at lanes g & 127; element j lands at padded row
// zr0[s'] + (j >> 3), sublane j & 7.  Elements beyond the segment
// length (old padding slots) are skipped so the new width can be
// ceil(max_128_group_len / 8) instead of the old 1024-group max.
// Zone-B rows copy whole, shifted to rmapB[r].  cols and vals move in
// one pass; outputs are zero-initialized (padding: col 0 / val 0).
int cvr_zone_scatter(int64_t S_old, int64_t nsl_old, const int64_t* oldoff,
                     int64_t zsl_old, const int64_t* zr0,
                     const int32_t* lane_len, const int64_t* rmapB,
                     int64_t S_padded, const int32_t* cols,
                     const float* vals, int32_t* cols_out,
                     float* vals_out) {
  std::memset(cols_out, 0, sizeof(int32_t) * (size_t)(S_padded * 1024));
  std::memset(vals_out, 0, sizeof(float) * (size_t)(S_padded * 1024));
  const int64_t zrows_old = zsl_old ? oldoff[zsl_old] : 0;
  int64_t so = 0;
  for (int64_t r = 0; r < S_old; r++) {
    const int32_t* cr = cols + r * 1024;
    const float* vr = vals + r * 1024;
    if (r < zrows_old) {
      while (r >= oldoff[so + 1]) so++;
      const int64_t j = r - oldoff[so];
      const int64_t jr = j >> 3;
      const int64_t js = (j & 7) * 128;
      const int32_t* Lrow = lane_len + so * 1024;
      for (int64_t c = 0; c < 1024; c++) {
        if (j >= Lrow[c]) continue;  // old padding slot
        const int64_t sp = so * 8 + (c >> 7);
        const int64_t pos = (zr0[sp] + jr) * 1024 + js + (c & 127);
        cols_out[pos] = cr[c];
        vals_out[pos] = vr[c];
      }
    } else {
      const int64_t base = rmapB[r] * 1024;
      std::memcpy(cols_out + base, cr, 1024 * sizeof(int32_t));
      std::memcpy(vals_out + base, vr, 1024 * sizeof(float));
    }
  }
  (void)nsl_old;
  return 0;
}

// Route planes with stage-1 composition fused, emitted in sublane-split
// device layout: li_ss/p3_ss are (8, rows, 128) with element (tile, pos)
// at [pos>>7, tile, pos&127].
int cvr_route_planes_fused(int64_t n, const int32_t* perm,
                           const int32_t* colors, int64_t T, int64_t S_pad,
                           const int16_t* li_flat, int16_t* li_ss,
                           int32_t* mid, int16_t* p3_ss) {
  if (n != T * 1024) return fail("perm length must be T*1024");
  for (int64_t i = 0; i < n; i++) {
    int32_t p = perm[i];
    int32_t q = colors[i];
    int64_t a = (int64_t)(p >> 10);
    int64_t d = i >> 10;
    li_ss[((int64_t)(q >> 7) * T + a) * 128 + (q & 127)] = li_flat[p];
    mid[(int64_t)q * T + d] = (int32_t)a;
    if (d < S_pad) {
      int64_t o = i & 1023;
      p3_ss[((o >> 7) * S_pad + d) * 128 + (o & 127)] = (int16_t)q;
    }
  }
  return 0;
}

// Birkhoff-von-Neumann per-row colorings for small Tk: decompose the
// doubly-k-regular Tk x Tk multiplicity matrix into weighted perfect
// matchings (Kuhn augmenting paths, incremental re-match after an entry
// empties).  #matchings <= #nonzero entries; each extraction assigns a
// RANGE of colors at once — far below the capacitated-Euler node count.
static int bvn_color_row(int64_t T, int64_t tk, const int32_t* mrow,
                         int32_t* crow, std::vector<int32_t>& cap,
                         std::vector<int64_t>& off,
                         std::vector<int32_t>& cur,
                         std::vector<int32_t>& colors_of_pair,
                         std::vector<int32_t>& match_u,
                         std::vector<int32_t>& match_v,
                         std::vector<uint8_t>& vis) {
  const int64_t np = tk * tk;
  std::fill(cap.begin(), cap.end(), 0);
  for (int64_t d = 0; d < T; d++)
    cap[(size_t)((mrow[d] >> 10) * tk + (d >> 10))]++;
  off[0] = 0;
  for (int64_t p = 0; p < np; p++)
    off[(size_t)p + 1] = off[(size_t)p] + cap[(size_t)p];
  colors_of_pair.resize((size_t)off[(size_t)np]);
  std::fill(cur.begin(), cur.end(), 0);

  match_u.assign((size_t)tk, -1);
  match_v.assign((size_t)tk, -1);
  vis.assign((size_t)tk, 0);
  // Kuhn augment for one left vertex over entries with cap > 0
  std::function<bool(int32_t)> tryk = [&](int32_t u) -> bool {
    for (int32_t v = 0; v < (int32_t)tk; v++) {
      if (cap[(size_t)(u * tk + v)] <= 0 || vis[(size_t)v]) continue;
      vis[(size_t)v] = 1;
      if (match_v[(size_t)v] < 0 || tryk(match_v[(size_t)v])) {
        match_u[(size_t)u] = v;
        match_v[(size_t)v] = u;
        return true;
      }
    }
    return false;
  };
  for (int32_t u = 0; u < (int32_t)tk; u++) {
    std::fill(vis.begin(), vis.end(), 0);
    if (!tryk(u)) return fail("bvn: no perfect matching (not regular?)");
  }
  int64_t remaining = 1024;
  int32_t base = 0;
  while (remaining > 0) {
    int32_t mu = INT32_MAX;
    for (int32_t u = 0; u < (int32_t)tk; u++)
      mu = std::min(mu, cap[(size_t)(u * tk + match_u[(size_t)u])]);
    if (mu <= 0) return fail("bvn: zero matching weight");
    if (mu > remaining) mu = (int32_t)remaining;
    for (int32_t u = 0; u < (int32_t)tk; u++) {
      int64_t p = u * tk + match_u[(size_t)u];
      int64_t at = off[(size_t)p] + cur[(size_t)p];
      for (int32_t c = 0; c < mu; c++)
        colors_of_pair[(size_t)(at + c)] = base + c;
      cur[(size_t)p] += mu;
      cap[(size_t)p] -= mu;
    }
    base += mu;
    remaining -= mu;
    if (remaining == 0) break;
    // re-augment the vertices whose matched entry emptied
    for (int32_t u = 0; u < (int32_t)tk; u++) {
      if (cap[(size_t)(u * tk + match_u[(size_t)u])] > 0) continue;
      match_v[(size_t)match_u[(size_t)u]] = -1;
      match_u[(size_t)u] = -1;
      std::fill(vis.begin(), vis.end(), 0);
      if (!tryk(u)) return fail("bvn: re-augment failed");
    }
  }
  std::fill(cur.begin(), cur.end(), 0);
  for (int64_t d = 0; d < T; d++) {
    int64_t p = (mrow[d] >> 10) * tk + (d >> 10);
    crow[d] = colors_of_pair[(size_t)(off[(size_t)p] + cur[(size_t)p]++)];
  }
  return 0;
}

// Full route planes in sublane-split device layout (the y-route path):
// s1/s3 for Tp >= T tiles (padded tiles identity), mid logical (1024, T).
int cvr_route_planes_ss2(int64_t n, const int32_t* perm,
                         const int32_t* colors, int64_t T, int64_t Tp,
                         int16_t* s1_ss, int32_t* mid, int16_t* s3_ss) {
  if (n != T * 1024) return fail("perm length must be T*1024");
  for (int64_t i = 0; i < n; i++) {
    int32_t p = perm[i];
    int32_t q = colors[i];
    int64_t a = (int64_t)(p >> 10);
    int64_t d = i >> 10;
    int64_t o = i & 1023;
    s1_ss[((int64_t)(q >> 7) * Tp + a) * 128 + (q & 127)] =
        (int16_t)(p & 1023);
    mid[(int64_t)q * T + d] = (int32_t)a;
    s3_ss[((o >> 7) * Tp + d) * 128 + (o & 127)] = (int16_t)q;
  }
  for (int64_t t = T; t < Tp; t++) {
    for (int64_t q = 0; q < 1024; q++) {
      int64_t at = ((q >> 7) * Tp + t) * 128 + (q & 127);
      s1_ss[at] = (int16_t)q;
      s3_ss[at] = (int16_t)q;
    }
  }
  return 0;
}

// Capacitated per-row colorings for the recursive middle stage.
// mid is (1024, T) int32; for row q, edge d has src chunk mid[q,T]>>10 and
// dst chunk d>>10.  Aggregate into a tk x tk capacity matrix, split
// capacities recursively (even part arithmetic, odd entries via an Euler
// walk on the entry multigraph), and expand leaf matchings back to edges.
int cvr_color_rows_cap(int64_t T, int64_t tk, const int32_t* mid,
                       int32_t* color_out) {
  const int64_t np = tk * tk;
  // BvN measured: 1.2 s at Tk=25, 1.9 s at Tk=40; at Tk=90 it matches
  // the capacitated path (~26 s — extraction x re-augment cost catches
  // up), so the cutoff stays where BvN clearly wins
  if (tk <= 64) {
    // BvN wins while #entries (<= tk^2) x augment cost stays small
    std::vector<int32_t> cap((size_t)np), cur((size_t)np);
    std::vector<int64_t> off((size_t)np + 1);
    std::vector<int32_t> colors_of_pair, match_u, match_v;
    std::vector<uint8_t> vis;
    for (int64_t q = 0; q < 1024; q++) {
      if (bvn_color_row(T, tk, mid + q * T, color_out + q * T, cap, off,
                        cur, colors_of_pair, match_u, match_v, vis) != 0)
        return -1;
    }
    return 0;
  }
  struct Node {
    int64_t start, end;  // into entry pool
    int32_t k, base;
  };
  // entry pool: (pair, cap) per entry; children written past the parent
  // slice, so the pool only grows monotonically within a node
  std::vector<int32_t> pool_pair, pool_cap;
  std::vector<int32_t> cap0((size_t)np);
  std::vector<int64_t> off((size_t)np + 1);
  std::vector<int32_t> cur((size_t)np);
  std::vector<int32_t> colors_of_pair;
  // odd-walk scratch (vertices = 2*tk), all hoisted out of the node loop
  const int64_t nv = 2 * tk;
  std::vector<int32_t> odeg((size_t)nv), optr((size_t)nv);
  std::vector<int64_t> ooff((size_t)nv + 1);
  std::vector<int32_t> oadj_e, oid;
  std::vector<uint8_t> used, ou;
  std::vector<Node> stack;
  // pair -> endpoint lookup (kills the runtime divisions in hot loops)
  std::vector<int32_t> ca_of((size_t)np), cd_of((size_t)np);
  for (int64_t p = 0; p < np; p++) {
    ca_of[(size_t)p] = (int32_t)(p / tk);
    cd_of[(size_t)p] = (int32_t)(tk + p % tk);
  }
  for (int64_t q = 0; q < 1024; q++) {
    const int32_t* mrow = mid + q * T;
    int32_t* crow = color_out + q * T;
    std::fill(cap0.begin(), cap0.end(), 0);
    for (int64_t d = 0; d < T; d++)
      cap0[(size_t)((mrow[d] >> 10) * tk + (d >> 10))]++;
    off[0] = 0;
    for (int64_t p = 0; p < np; p++)
      off[(size_t)p + 1] = off[(size_t)p] + cap0[(size_t)p];
    colors_of_pair.resize((size_t)off[(size_t)np]);
    std::fill(cur.begin(), cur.end(), 0);
    pool_pair.clear();
    pool_cap.clear();
    for (int64_t p = 0; p < np; p++) {
      if (cap0[(size_t)p]) {
        pool_pair.push_back((int32_t)p);
        pool_cap.push_back(cap0[(size_t)p]);
      }
    }
    stack.clear();
    stack.push_back({0, (int64_t)pool_pair.size(), 1024, 0});
    while (!stack.empty()) {
      Node nd = stack.back();
      stack.pop_back();
      if (nd.k == 1) {
        for (int64_t e = nd.start; e < nd.end; e++) {
          int32_t p = pool_pair[(size_t)e];
          colors_of_pair[(size_t)(off[(size_t)p] + cur[(size_t)p]++)] =
              nd.base;
        }
        continue;
      }
      // tag odd entries with their walk side (1 = A, 2 = B)
      std::fill(odeg.begin(), odeg.end(), 0);
      int64_t nodd = 0, nhalf = 0;
      for (int64_t e = nd.start; e < nd.end; e++) {
        if (pool_cap[(size_t)e] >> 1) nhalf++;
        if (pool_cap[(size_t)e] & 1) {
          int32_t p = pool_pair[(size_t)e];
          odeg[(size_t)ca_of[(size_t)p]]++;
          odeg[(size_t)cd_of[(size_t)p]]++;
          nodd++;
        }
      }
      used.assign((size_t)(nd.end - nd.start), 0);
      int64_t na_odd = 0;
      if (nodd) {
        ooff[0] = 0;
        for (int64_t v = 0; v < nv; v++)
          ooff[(size_t)v + 1] = ooff[(size_t)v] + odeg[(size_t)v];
        if ((int64_t)oadj_e.size() < 2 * nodd)
          oadj_e.resize((size_t)(2 * nodd));
        std::copy(ooff.begin(), ooff.end() - 1, optr.begin());
        oid.clear();
        for (int64_t e = nd.start; e < nd.end; e++) {
          if (pool_cap[(size_t)e] & 1) {
            int32_t p = pool_pair[(size_t)e];
            int32_t lid = (int32_t)oid.size();
            oid.push_back((int32_t)e);
            oadj_e[(size_t)optr[(size_t)ca_of[(size_t)p]]++] = lid;
            oadj_e[(size_t)optr[(size_t)cd_of[(size_t)p]]++] = lid;
          }
        }
        std::copy(ooff.begin(), ooff.end() - 1, optr.begin());
        ou.assign((size_t)nodd, 0);
        for (int64_t st = 0; st < nodd; st++) {
          if (ou[(size_t)st]) continue;
          int64_t lid = st;
          int64_t vert = ca_of[(size_t)pool_pair[(size_t)oid[(size_t)lid]]];
          for (;;) {
            ou[(size_t)lid] = 1;
            bool from_u = vert < tk;
            int32_t e = oid[(size_t)lid];
            if (from_u) {
              used[(size_t)(e - nd.start)] = 1;
              na_odd++;
            } else {
              used[(size_t)(e - nd.start)] = 2;
            }
            int32_t p = pool_pair[(size_t)e];
            vert = from_u ? cd_of[(size_t)p] : ca_of[(size_t)p];
            int64_t pp = optr[(size_t)vert];
            int64_t end = ooff[(size_t)vert + 1];
            int64_t nxt = -1;
            while (pp < end) {
              int32_t cand = oadj_e[(size_t)pp];
              if (!ou[(size_t)cand]) {
                nxt = cand;
                break;
              }
              pp++;
            }
            optr[(size_t)vert] = pp;
            if (nxt < 0) break;
            lid = nxt;
          }
        }
      }
      // children written directly past the parent slice: A then B,
      // each = arithmetic halves + that side's odd singles
      const int64_t a0 = (int64_t)pool_pair.size();
      const int64_t asz = nhalf + na_odd;
      const int64_t bsz = nhalf + (nodd - na_odd);
      pool_pair.resize((size_t)(a0 + asz + bsz));
      pool_cap.resize((size_t)(a0 + asz + bsz));
      int64_t ia = a0, ib = a0 + asz;
      for (int64_t e = nd.start; e < nd.end; e++) {
        int32_t p = pool_pair[(size_t)e];
        int32_t h = pool_cap[(size_t)e] >> 1;
        if (h) {
          pool_pair[(size_t)ia] = p;
          pool_cap[(size_t)ia++] = h;
          pool_pair[(size_t)ib] = p;
          pool_cap[(size_t)ib++] = h;
        }
        uint8_t tag = used[(size_t)(e - nd.start)];
        if (tag == 1) {
          pool_pair[(size_t)ia] = p;
          pool_cap[(size_t)ia++] = 1;
        } else if (tag == 2) {
          pool_pair[(size_t)ib] = p;
          pool_cap[(size_t)ib++] = 1;
        }
      }
      stack.push_back({a0 + asz, a0 + asz + bsz, nd.k / 2,
                       (int32_t)(nd.base + nd.k / 2)});
      stack.push_back({a0, a0 + asz, nd.k / 2, nd.base});
    }
    // expand to per-edge colors in d order
    std::fill(cur.begin(), cur.end(), 0);
    for (int64_t d = 0; d < T; d++) {
      int32_t p = (int32_t)((mrow[d] >> 10) * tk + (d >> 10));
      crow[d] = colors_of_pair[(size_t)(off[(size_t)p] + cur[(size_t)p]++)];
    }
  }
  return 0;
}

// Recursive-middle planes emitted straight in the sublane-split device
// layout: each plane is (8, Tk*1024, 128) with logical element
// (tile t, pos o) at [o >> 7, t, o & 127].
int cvr_mid_planes_ss(int64_t T, const int32_t* mid,
                      const int32_t* colors_rows, int16_t* m1,
                      int16_t* csel, int16_t* m3) {
  const int64_t R = T;  // rows per sublane plane slab (Tk*1024 == T)
  for (int64_t q = 0; q < 1024; q++) {
    const int32_t* mrow = mid + q * T;
    const int32_t* crow = colors_rows + q * T;
    for (int64_t d = 0; d < T; d++) {
      int64_t a = (int64_t)mrow[d];
      int64_t m = crow[d];
      int64_t ca = a >> 10;
      int64_t cd = d >> 10;
      int64_t t1 = ca * 1024 + q;  // m1 tile
      int64_t t2 = cd * 1024 + q;  // csel/m3 tile
      m1[((m >> 7) * R + t1) * 128 + (m & 127)] = (int16_t)(a & 1023);
      csel[((m >> 7) * R + t2) * 128 + (m & 127)] = (int16_t)ca;
      int64_t f = d & 1023;
      m3[((f >> 7) * R + t2) * 128 + (f & 127)] = (int16_t)m;
    }
  }
  return 0;
}

// DIA offset detection: mark every distinct diagonal (col - row) in a
// flag array of length nrows + ncols (index off + nrows).
int cvr_dia_offsets(int64_t nrows, int64_t nnz, const int64_t* rowptr,
                    const int32_t* cols, uint8_t* flags) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < nrows; r++) {
    for (int64_t i = rowptr[r]; i < rowptr[r + 1]; i++)
      flags[(int64_t)cols[i] - r + nrows] = 1;
  }
  return 0;
}

// DIA band fill (formats/dia.py): bands[k, r] = A[r, r + offsets[k]].
// One streaming pass over CSR; the diagonal index per element comes from
// a binary search over the (tiny, sorted) offsets table.
int cvr_dia_fill(int64_t nrows, int64_t nnz, const int64_t* rowptr,
                 const int32_t* cols, const float* vals, int64_t nd,
                 const int64_t* offsets, float* bands) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < nrows; r++) {
    for (int64_t i = rowptr[r]; i < rowptr[r + 1]; i++) {
      int64_t off = (int64_t)cols[i] - r;
      const int64_t* it =
          std::lower_bound(offsets, offsets + nd, off);
      bands[(int64_t)(it - offsets) * nrows + r] = vals[i];
    }
  }
  return 0;
}

int cvr_version() { return 16; }

// ---------------------------------------------------------------------------
// BELL (banded-ELL) converter passes — single streaming walks over the
// CSR, no O(nnz) temporaries (the numpy formulation spent 10+ s in
// first-touch page faults on the 1-core host for road-scale inputs).
// ---------------------------------------------------------------------------

// Per-row count of entries within the reach cap; returns the largest
// |offset| among them (the achieved reach, which sets the kernel's
// candidate count).
int64_t cvr_bell_stats(int64_t nrows, const int64_t* rowptr,
                       const int32_t* cols, int64_t cap,
                       int32_t* near_lens) {
  int64_t reach = 0;
  for (int64_t r = 0; r < nrows; r++) {
    int32_t c = 0;
    for (int64_t i = rowptr[r]; i < rowptr[r + 1]; i++) {
      int64_t off = (int64_t)cols[i] - r;
      if (off < 0) off = -off;
      if (off <= cap) {
        c++;
        if (off > reach) reach = off;
      }
    }
    near_lens[r] = c;
  }
  return reach;
}

// Fill the k (li, val) planes (row-major (k, R_sub*128) each) and the
// compact spill COO.  li = col - 1024*(r>>10) + 128*cr.  Returns the
// spill count, or -1 if it would exceed spill_cap.
int64_t cvr_bell_fill(int64_t nrows, const int64_t* rowptr,
                      const int32_t* cols, const float* vals, int64_t k,
                      int64_t cap, int64_t cr, int64_t R128,
                      int16_t* li_out, float* vals_out,
                      int64_t spill_cap, int32_t* spill_rows,
                      int32_t* spill_cols, float* spill_vals) {
  int64_t ns = 0;
  for (int64_t r = 0; r < nrows; r++) {
    int64_t rank = 0;
    const int64_t base = -((r >> 10) << 10) + 128 * cr;
    for (int64_t i = rowptr[r]; i < rowptr[r + 1]; i++) {
      const int64_t c = (int64_t)cols[i];
      const int64_t off = c - r;
      if (off <= cap && off >= -cap && rank < k) {
        li_out[rank * R128 + r] = (int16_t)(c + base);
        vals_out[rank * R128 + r] = vals[i];
        rank++;
      } else {
        if (ns >= spill_cap) return -1;
        spill_rows[ns] = (int32_t)r;
        spill_cols[ns] = cols[i];
        spill_vals[ns] = vals[i];
        ns++;
      }
    }
  }
  return ns;
}

}  // extern "C"
