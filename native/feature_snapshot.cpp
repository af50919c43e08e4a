// feature_snapshot — zero-copy mmap'd feature-table snapshot.
//
// The reference warms its online store by bulk-writing ~(n_users+n_items)
// msgpack blobs into Redis (feature_store.py:156-228) — minutes at the
// 100M-user config. This snapshot keeps both tables as one binary file:
// sorted id arrays + row-major float32 matrices. Opening is one mmap (no
// deserialization, no per-row Python objects); lookups are a binary
// search over the id array directly against the page cache, so serving
// processes share the physical pages. Exposed to Python via ctypes
// (recommendit_tpu/features/snapshot.py), which also holds a pure-numpy
// fallback with identical semantics for environments without a toolchain.
//
// Layout (little-endian):
//   magic  "FSNAP001"                      8 bytes
//   n_sections int64                        (2: users, items)
//   per section: n_rows, n_cols, ids_off, data_off   (4 x int64)
//   payload: per section, int64 ids[n_rows] (ascending), then
//            float32 data[n_rows * n_cols]
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'F', 'S', 'N', 'A', 'P', '0', '0', '1'};
constexpr int64_t kMaxSections = 16;

struct Section {
  int64_t n_rows;
  int64_t n_cols;
  const int64_t* ids;
  const float* data;
};

struct Snapshot {
  const char* base;
  size_t size;
  int64_t n_sections;
  Section sections[kMaxSections];
};

// Binary search over the sorted id array; returns row or -1.
int64_t find_row(const Section& s, int64_t id) {
  int64_t lo = 0, hi = s.n_rows - 1;
  while (lo <= hi) {
    int64_t mid = lo + (hi - lo) / 2;
    int64_t v = s.ids[mid];
    if (v == id) return mid;
    if (v < id) lo = mid + 1;
    else hi = mid - 1;
  }
  return -1;
}

}  // namespace

extern "C" {

// Open a snapshot file. Returns an opaque handle or nullptr on error
// (missing file, bad magic, truncated payload).
void* fsnap_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) {
    close(fd);
    return nullptr;
  }
  size_t size = static_cast<size_t>(st.st_size);
  const char* base = static_cast<const char*>(
      mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (base == MAP_FAILED) return nullptr;
  if (memcmp(base, kMagic, 8) != 0) {
    munmap(const_cast<char*>(base), size);
    return nullptr;
  }
  int64_t n_sections;
  memcpy(&n_sections, base + 8, 8);
  if (n_sections < 1 || n_sections > kMaxSections) {
    munmap(const_cast<char*>(base), size);
    return nullptr;
  }
  Snapshot* snap = new Snapshot();
  snap->base = base;
  snap->size = size;
  snap->n_sections = n_sections;
  const char* hdr = base + 16;
  for (int64_t i = 0; i < n_sections; ++i) {
    int64_t vals[4];
    memcpy(vals, hdr + i * 32, 32);
    Section& s = snap->sections[i];
    s.n_rows = vals[0];
    s.n_cols = vals[1];
    int64_t ids_off = vals[2], data_off = vals[3];
    int64_t ids_end = ids_off + s.n_rows * 8;
    int64_t data_end = data_off + s.n_rows * s.n_cols * 4;
    if (s.n_rows < 0 || s.n_cols < 0 ||
        ids_end > static_cast<int64_t>(size) ||
        data_end > static_cast<int64_t>(size)) {
      munmap(const_cast<char*>(base), size);
      delete snap;
      return nullptr;
    }
    s.ids = reinterpret_cast<const int64_t*>(base + ids_off);
    s.data = reinterpret_cast<const float*>(base + data_off);
  }
  return snap;
}

int64_t fsnap_n_sections(void* h) {
  return static_cast<Snapshot*>(h)->n_sections;
}

int64_t fsnap_rows(void* h, int64_t section) {
  Snapshot* s = static_cast<Snapshot*>(h);
  if (section < 0 || section >= s->n_sections) return -1;
  return s->sections[section].n_rows;
}

int64_t fsnap_cols(void* h, int64_t section) {
  Snapshot* s = static_cast<Snapshot*>(h);
  if (section < 0 || section >= s->n_sections) return -1;
  return s->sections[section].n_cols;
}

// Pointer to one row's floats, or nullptr if the id is absent.
const float* fsnap_lookup(void* h, int64_t section, int64_t id) {
  Snapshot* s = static_cast<Snapshot*>(h);
  if (section < 0 || section >= s->n_sections) return nullptr;
  const Section& sec = s->sections[section];
  int64_t row = find_row(sec, id);
  if (row < 0) return nullptr;
  return sec.data + row * sec.n_cols;
}

// Gather n rows into out (n x n_cols, caller-allocated). Missing ids get
// `fill` in every column and 0 in found[i]. Returns the number found.
int64_t fsnap_gather(void* h, int64_t section, const int64_t* ids,
                     int64_t n, float* out, uint8_t* found, float fill) {
  Snapshot* s = static_cast<Snapshot*>(h);
  if (section < 0 || section >= s->n_sections) return -1;
  const Section& sec = s->sections[section];
  int64_t hits = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t row = find_row(sec, ids[i]);
    float* dst = out + i * sec.n_cols;
    if (row >= 0) {
      memcpy(dst, sec.data + row * sec.n_cols, sec.n_cols * 4);
      if (found) found[i] = 1;
      ++hits;
    } else {
      for (int64_t c = 0; c < sec.n_cols; ++c) dst[c] = fill;
      if (found) found[i] = 0;
    }
  }
  return hits;
}

void fsnap_close(void* h) {
  Snapshot* s = static_cast<Snapshot*>(h);
  munmap(const_cast<char*>(s->base), s->size);
  delete s;
}

}  // extern "C"
