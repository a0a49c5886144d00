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
  if (!read_line(line)) return fail("empty file");
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
      return fail("bad MatrixMarket banner");
    if (!ci_equal(tok[1], "matrix")) return fail("unsupported object");
    if (!ci_equal(tok[2], "coordinate"))
      return fail("native parser handles coordinate format only");
    MtxFile f;
    if (ci_equal(tok[3], "real")) f.field = CVR_FIELD_REAL;
    else if (ci_equal(tok[3], "integer")) f.field = CVR_FIELD_INTEGER;
    else if (ci_equal(tok[3], "pattern")) f.field = CVR_FIELD_PATTERN;
    else if (ci_equal(tok[3], "complex")) f.field = CVR_FIELD_COMPLEX;
    else return fail("unsupported field");
    if (ci_equal(tok[4], "general")) f.symmetry = CVR_SYM_GENERAL;
    else if (ci_equal(tok[4], "symmetric")) f.symmetry = CVR_SYM_SYMMETRIC;
    else if (ci_equal(tok[4], "skew-symmetric")) f.symmetry = CVR_SYM_SKEW;
    else if (ci_equal(tok[4], "hermitian")) f.symmetry = CVR_SYM_HERMITIAN;
    else return fail("unsupported symmetry");

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
      return fail("bad size line");

    f.fd = fd;
    f.data = data;
    f.size = size;
    f.body_off = pos;
    int id = g_nfiles.fetch_add(1);
    if (id >= 64) return fail("too many open mtx files");
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
        if (rr.ec != std::errc() || rc.ec != std::errc()) {
          err.store(1);
        } else {
          rows[idx] = (int32_t)(r - 1);
          cols[idx] = (int32_t)(c - 1);
          if (has_val) {
            while (s < lineend && std::isspace((unsigned char)*s)) s++;
            float v = 0.f;
            auto rv = std::from_chars(s, lineend, v);
            if (rv.ec != std::errc()) {
              // fall back for "1e3."-style oddities
              v = strtof(s, nullptr);
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
int cvr_window_minmax(int64_t nrows, int64_t C, int64_t D,
                      const int64_t* rowptr, const int32_t* csr_cols,
                      const int64_t* slice_offsets, int64_t S,
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
    for (int64_t r = i * rps; r < rend; r++) {
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
                       float* vals_ss, int16_t* li_ss) {
  const int64_t rps = C / D;
  const int64_t nslices = (nrows + rps - 1) / rps;
#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t i = 0; i < nslices; i++) {
    int64_t base = slice_offsets[i];
    int64_t rend = std::min(nrows, (i + 1) * rps);
    for (int64_t r = i * rps; r < rend; r++) {
      int64_t src = rowptr[r];
      int64_t len = rowptr[r + 1] - src;
      if (len == 0) continue;
      int64_t L = (len + D - 1) / D;
      int64_t lane0 = (r - i * rps) * D;
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

int cvr_version() { return 8; }

}  // extern "C"
