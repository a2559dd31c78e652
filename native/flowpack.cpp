// flowpack: packed per-video optical-flow shards with an mmap'd reader.
//
// Native IO runtime for the precomputed-flow training path. The reference
// stores one torch-pickle per video and unpickles the WHOLE file to slice a
// handful of flows per sample (contrast/data/dataset.py:343-370) — ~20x IO
// amplification against a 5.8 TB corpus. A flowpack shard holds many videos
// contiguously with a fixed-size index, so a sample's flow window is one
// page-aligned mmap read, no deserialization, served zero-copy to NumPy.
//
// Layout (little endian):
//   [0:8)    magic "FLOWPAK1"
//   [8:12)   u32 num_videos
//   [12:16)  u32 h
//   [16:20)  u32 w
//   [20:24)  u32 dtype (0 = f32, 1 = f16)
//   [24:28)  u32 name_len (fixed, zero-padded names)
//   [28:32)  u32 reserved
//   index: num_videos * { char name[name_len]; u64 offset; u32 num_flows;
//                         u32 pad; }   (sorted by name)
//   data:  per video, num_flows * h * w * 2 elements
//
// C ABI only; bound from Python via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

constexpr char kMagic[8] = {'F', 'L', 'O', 'W', 'P', 'A', 'K', '1'};

struct IndexEntry {
  std::string name;
  uint64_t offset;
  uint32_t num_flows;
};

struct Pack {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint32_t h = 0, w = 0, dtype = 0, name_len = 0;
  std::vector<IndexEntry> index;
  const uint8_t* data = nullptr;
};

inline size_t elem_size(uint32_t dtype) { return dtype == 1 ? 2 : 4; }

}  // namespace

extern "C" {

void* fp_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 32) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(mem, st.st_size, MADV_RANDOM);

  auto* p = new Pack();
  p->fd = fd;
  p->base = static_cast<const uint8_t*>(mem);
  p->size = st.st_size;

  if (memcmp(p->base, kMagic, 8) != 0) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete p;
    return nullptr;
  }
  uint32_t num_videos;
  memcpy(&num_videos, p->base + 8, 4);
  memcpy(&p->h, p->base + 12, 4);
  memcpy(&p->w, p->base + 16, 4);
  memcpy(&p->dtype, p->base + 20, 4);
  memcpy(&p->name_len, p->base + 24, 4);

  // header validation: every field comes straight from the file, so a
  // truncated or corrupt pack must fail open() cleanly instead of walking
  // an index that extends past the mapping (fuzz-pinned,
  // tools/fuzz_native.py). All arithmetic in u64 to rule out wrap; the
  // 65536 dimension cap bounds flow_bytes <= 2^35, which (with the
  // per-entry region check below) makes every product in fp_read provably
  // wrap-free and stops a corrupt header from driving the Python binding
  // into multi-GB host allocations.
  const uint64_t fsize = (uint64_t)p->size;
  const uint64_t entry_bytes64 = (uint64_t)p->name_len + 8 + 4 + 4;
  if (p->name_len == 0 || p->name_len > 4096 || p->dtype > 1 ||
      p->h == 0 || p->w == 0 || p->h > 65536 || p->w > 65536 ||
      (uint64_t)num_videos * entry_bytes64 > fsize - 32) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete p;
    return nullptr;
  }

  const size_t entry_bytes = (size_t)entry_bytes64;
  const uint8_t* idx = p->base + 32;
  const uint64_t data_size = fsize - 32 - (uint64_t)num_videos * entry_bytes64;
  const uint64_t flow_bytes = (uint64_t)p->h * p->w * 2 * elem_size(p->dtype);
  p->index.reserve(num_videos);
  for (uint32_t i = 0; i < num_videos; ++i) {
    const uint8_t* e = idx + i * entry_bytes;
    IndexEntry entry;
    entry.name.assign(reinterpret_cast<const char*>(e),
                      strnlen(reinterpret_cast<const char*>(e), p->name_len));
    memcpy(&entry.offset, e + p->name_len, 8);
    memcpy(&entry.num_flows, e + p->name_len + 8, 4);
    // the whole video [offset, offset + num_flows*flow_bytes) must lie in
    // the data region: no read through a valid handle can then exceed the
    // mapping, and num_flows*flow_bytes <= data_size < 2^63 caps every
    // later count*flow_bytes product
    if (entry.offset > data_size ||
        (uint64_t)entry.num_flows > (data_size - entry.offset) / flow_bytes) {
      munmap(mem, st.st_size);
      ::close(fd);
      delete p;
      return nullptr;
    }
    p->index.push_back(std::move(entry));
  }
  p->data = idx + num_videos * entry_bytes;
  return p;
}

void fp_close(void* handle) {
  auto* p = static_cast<Pack*>(handle);
  if (!p) return;
  munmap(const_cast<uint8_t*>(p->base), p->size);
  ::close(p->fd);
  delete p;
}

int32_t fp_num_videos(void* handle) {
  return static_cast<Pack*>(handle)->index.size();
}

void fp_meta(void* handle, uint32_t* h, uint32_t* w, uint32_t* dtype) {
  auto* p = static_cast<Pack*>(handle);
  *h = p->h;
  *w = p->w;
  *dtype = p->dtype;
}

// binary search over the sorted name index; -1 if absent
int32_t fp_find(void* handle, const char* name) {
  auto* p = static_cast<Pack*>(handle);
  int32_t lo = 0, hi = static_cast<int32_t>(p->index.size()) - 1;
  while (lo <= hi) {
    int32_t mid = lo + (hi - lo) / 2;
    int c = p->index[mid].name.compare(name);
    if (c == 0) return mid;
    if (c < 0) lo = mid + 1; else hi = mid - 1;
  }
  return -1;
}

int32_t fp_video_num_flows(void* handle, int32_t idx) {
  auto* p = static_cast<Pack*>(handle);
  if (idx < 0 || idx >= (int32_t)p->index.size()) return -1;
  return p->index[idx].num_flows;
}

const char* fp_video_name(void* handle, int32_t idx) {
  auto* p = static_cast<Pack*>(handle);
  if (idx < 0 || idx >= (int32_t)p->index.size()) return nullptr;
  return p->index[idx].name.c_str();
}

// copy flows [start, start+count) of video idx into out (caller-allocated,
// count*h*w*2 elements of the pack's dtype). returns elements copied, <0 on
// error.
int64_t fp_read(void* handle, int32_t idx, int32_t start, int32_t count,
                void* out) {
  auto* p = static_cast<Pack*>(handle);
  if (idx < 0 || idx >= (int32_t)p->index.size()) return -1;
  const IndexEntry& e = p->index[idx];
  if (start < 0 || count < 0 ||
      (int64_t)start + count > (int64_t)e.num_flows)
    return -2;
  const uint64_t flow_bytes =
      (uint64_t)p->h * p->w * 2 * elem_size(p->dtype);
  // e.offset is untrusted (straight from the file index): bound the whole
  // [offset + start*flow, offset + (start+count)*flow) window against the
  // data region with overflow-safe u64 arithmetic before touching memory
  const uint64_t data_size = (uint64_t)(p->base + p->size - p->data);
  const uint64_t begin = (uint64_t)start * flow_bytes;
  const uint64_t bytes = (uint64_t)count * flow_bytes;
  if (e.offset > data_size || begin > data_size - e.offset ||
      bytes > data_size - e.offset - begin)
    return -3;
  memcpy(out, p->data + e.offset + begin, bytes);
  return (int64_t)count * (uint64_t)p->h * p->w * 2;
}

}  // extern "C"
