// Native data-path kernels for dalle_mtf_tpu.
//
// The reference got its data path from tf.data's C++ runtime (TFRecordDataset,
// decode_jpeg, crop_and_resize — src/input_fns.py). This library supplies the
// equivalent native components for the JAX framework, exposed over a C ABI and
// loaded via ctypes (dalle_mtf_tpu/data/native.py):
//   - hardware-accelerated crc32c (SSE4.2) for TFRecord framing checksums
//   - a streaming TFRecord reader
//   - JPEG decode + center-square-crop + bilinear resize + [-1,1] normalize
//     in one pass (libjpeg), producing the exact tensor the model consumes.
//
// Build: g++ -O3 -march=x86-64-v2 -shared -fPIC dataloader.cpp -o libdalle_data.so -ljpeg

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>

#if defined(__SSE4_2__) || defined(__x86_64__)
#include <nmmintrin.h>
#define DMT_HAVE_SSE42 1
#endif

extern "C" {

// ------------------------------------------------------------------ crc32c

static uint32_t crc_table[256];
static bool crc_table_init_done = false;

static void crc_table_init() {
  if (crc_table_init_done) return;
  const uint32_t poly = 0x82F63B78u;  // Castagnoli, reflected
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int k = 0; k < 8; ++k) crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    crc_table[i] = crc;
  }
  crc_table_init_done = true;
}

uint32_t dmt_crc32c(const uint8_t* data, uint64_t len) {
#ifdef DMT_HAVE_SSE42
  uint64_t crc = 0xFFFFFFFFull;
  while (len >= 8) {
    uint64_t chunk;
    memcpy(&chunk, data, 8);
    crc = _mm_crc32_u64(crc, chunk);
    data += 8;
    len -= 8;
  }
  uint32_t crc32 = (uint32_t)crc;
  while (len--) crc32 = _mm_crc32_u8(crc32, *data++);
  return crc32 ^ 0xFFFFFFFFu;
#else
  crc_table_init();
  uint32_t crc = 0xFFFFFFFFu;
  for (uint64_t i = 0; i < len; ++i)
    crc = (crc >> 8) ^ crc_table[(crc ^ data[i]) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
#endif
}

uint32_t dmt_crc32c_masked(const uint8_t* data, uint64_t len) {
  uint32_t crc = dmt_crc32c(data, len);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// ---------------------------------------------------------- tfrecord reader

struct TfrHandle {
  FILE* f;
  uint8_t* buf;
  uint64_t cap;
};

void* dmt_tfr_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  TfrHandle* h = new TfrHandle{f, nullptr, 0};
  return h;
}

// Returns record length and sets *out to an internal buffer valid until the
// next call; -1 on clean EOF, -2 on corruption/IO error.
int64_t dmt_tfr_next(void* handle, uint8_t** out, int verify_crc) {
  TfrHandle* h = (TfrHandle*)handle;
  uint8_t header[8];
  size_t n = fread(header, 1, 8, h->f);
  if (n == 0) return -1;
  if (n != 8) return -2;
  uint64_t len;
  memcpy(&len, header, 8);  // little-endian host assumed (x86/arm64)
  uint32_t len_crc;
  if (fread(&len_crc, 1, 4, h->f) != 4) return -2;
  if (verify_crc && len_crc != dmt_crc32c_masked(header, 8)) return -2;
  if (len > (1ull << 40)) return -2;  // sanity: corrupt length
  if (h->cap < len) {
    h->buf = (uint8_t*)realloc(h->buf, len);
    h->cap = len;
  }
  if (fread(h->buf, 1, len, h->f) != len) return -2;
  uint32_t data_crc;
  if (fread(&data_crc, 1, 4, h->f) != 4) return -2;
  if (verify_crc && data_crc != dmt_crc32c_masked(h->buf, len)) return -2;
  *out = h->buf;
  return (int64_t)len;
}

void dmt_tfr_close(void* handle) {
  TfrHandle* h = (TfrHandle*)handle;
  if (h->f) fclose(h->f);
  free(h->buf);
  delete h;
}

// ------------------------------------------------- jpeg decode + crop/resize

struct DmtJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void dmt_jpeg_error_exit(j_common_ptr cinfo) {
  DmtJpegErr* err = (DmtJpegErr*)cinfo->err;
  longjmp(err->jb, 1);
}

// Decode JPEG bytes, center-crop to a square, bilinear-resize to
// out_size x out_size x channels, normalize to [-1, 1] ((x - 127.5) / 127.5,
// reference input_fns.py:21). Returns 0 on success.
int dmt_decode_jpeg(const uint8_t* data, uint64_t len, int out_size,
                    int channels, float* out) {
  jpeg_decompress_struct cinfo;
  DmtJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = dmt_jpeg_error_exit;
  uint8_t* pixels = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    free(pixels);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, hgt = cinfo.output_height;
  const int c = cinfo.output_components;
  pixels = (uint8_t*)malloc((size_t)w * hgt * c);
  while ((int)cinfo.output_scanline < hgt) {
    uint8_t* row = pixels + (size_t)cinfo.output_scanline * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // center square crop
  const int side = w < hgt ? w : hgt;
  const int left = (w - side) / 2, top = (hgt - side) / 2;

  // bilinear resize side->out_size (align_corners=false convention, matching
  // PIL/tf bilinear)
  const float scale = (float)side / out_size;
  for (int y = 0; y < out_size; ++y) {
    float sy = (y + 0.5f) * scale - 0.5f;
    if (sy < 0) sy = 0;
    int y0 = (int)sy;
    int y1 = y0 + 1 < side ? y0 + 1 : side - 1;
    float fy = sy - y0;
    for (int x = 0; x < out_size; ++x) {
      float sx = (x + 0.5f) * scale - 0.5f;
      if (sx < 0) sx = 0;
      int x0 = (int)sx;
      int x1 = x0 + 1 < side ? x0 + 1 : side - 1;
      float fx = sx - x0;
      for (int ch = 0; ch < channels; ++ch) {
        int cc = ch < c ? ch : c - 1;
        const uint8_t* base = pixels + ((size_t)(top) * w + left) * c;
        float v00 = base[((size_t)y0 * w + x0) * c + cc];
        float v01 = base[((size_t)y0 * w + x1) * c + cc];
        float v10 = base[((size_t)y1 * w + x0) * c + cc];
        float v11 = base[((size_t)y1 * w + x1) * c + cc];
        float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                  v10 * fy * (1 - fx) + v11 * fy * fx;
        out[((size_t)y * out_size + x) * channels + ch] = (v - 127.5f) / 127.5f;
      }
    }
  }
  free(pixels);
  return 0;
}

}  // extern "C"

// ---------------------------------------- io_uring interleaved shard reader
//
// The reference's input pipeline used tf.data's parallel_interleave
// (cycle_length=4, input_fns.py:87-92) — its C++ runtime keeps several shard
// streams in flight so the shuffle window mixes shards AND reads overlap.
// This is the equivalent for the JAX framework: one io_uring drives
// chunked reads of up to `cycle` shard files concurrently (double-buffered
// per stream), a per-stream assembler splits TFRecord frames across chunk
// boundaries, and records are yielded round-robin — byte-identical order to
// data/pipeline.py's Python interleave, at raw-syscall I/O depth.
// Falls back cleanly (open returns null) where io_uring is unavailable.

#include <cerrno>
#include <fcntl.h>
#include <linux/io_uring.h>
#include <sys/mman.h>
#include <sys/syscall.h>
#include <unistd.h>

#include <atomic>
#include <string>
#include <vector>

namespace {

struct Uring {
  int fd = -1;
  unsigned sq_entries = 0, cq_entries = 0;
  unsigned *sq_head = nullptr, *sq_tail = nullptr, *sq_mask = nullptr;
  unsigned* sq_array = nullptr;
  io_uring_sqe* sqes = nullptr;
  unsigned *cq_head = nullptr, *cq_tail = nullptr, *cq_mask = nullptr;
  io_uring_cqe* cqes = nullptr;
  void *sq_ptr = nullptr, *cq_ptr = nullptr, *sqe_ptr = nullptr;
  size_t sq_len = 0, cq_len = 0, sqe_len = 0;
  bool single_mmap = false;

  bool init(unsigned depth) {
    io_uring_params p;
    memset(&p, 0, sizeof(p));
    fd = (int)syscall(__NR_io_uring_setup, depth, &p);
    if (fd < 0) return false;
    sq_entries = p.sq_entries;
    cq_entries = p.cq_entries;
    single_mmap = p.features & IORING_FEAT_SINGLE_MMAP;
    sq_len = p.sq_off.array + p.sq_entries * sizeof(unsigned);
    cq_len = p.cq_off.cqes + p.cq_entries * sizeof(io_uring_cqe);
    if (single_mmap && cq_len > sq_len) sq_len = cq_len;
    sq_ptr = mmap(nullptr, sq_len, PROT_READ | PROT_WRITE,
                  MAP_SHARED | MAP_POPULATE, fd, IORING_OFF_SQ_RING);
    if (sq_ptr == MAP_FAILED) return false;
    cq_ptr = single_mmap
                 ? sq_ptr
                 : mmap(nullptr, cq_len, PROT_READ | PROT_WRITE,
                        MAP_SHARED | MAP_POPULATE, fd, IORING_OFF_CQ_RING);
    if (cq_ptr == MAP_FAILED) return false;
    sqe_len = p.sq_entries * sizeof(io_uring_sqe);
    sqe_ptr = mmap(nullptr, sqe_len, PROT_READ | PROT_WRITE,
                   MAP_SHARED | MAP_POPULATE, fd, IORING_OFF_SQES);
    if (sqe_ptr == MAP_FAILED) return false;
    auto* base = (uint8_t*)sq_ptr;
    sq_head = (unsigned*)(base + p.sq_off.head);
    sq_tail = (unsigned*)(base + p.sq_off.tail);
    sq_mask = (unsigned*)(base + p.sq_off.ring_mask);
    sq_array = (unsigned*)(base + p.sq_off.array);
    sqes = (io_uring_sqe*)sqe_ptr;
    auto* cbase = (uint8_t*)cq_ptr;
    cq_head = (unsigned*)(cbase + p.cq_off.head);
    cq_tail = (unsigned*)(cbase + p.cq_off.tail);
    cq_mask = (unsigned*)(cbase + p.cq_off.ring_mask);
    cqes = (io_uring_cqe*)(cbase + p.cq_off.cqes);
    return true;
  }

  void submit_read(int file_fd, void* buf, unsigned len, uint64_t off,
                   uint64_t user_data) {
    unsigned tail = *sq_tail;
    unsigned idx = tail & *sq_mask;
    io_uring_sqe* sqe = &sqes[idx];
    memset(sqe, 0, sizeof(*sqe));
    sqe->opcode = IORING_OP_READ;
    sqe->fd = file_fd;
    sqe->addr = (uint64_t)buf;
    sqe->len = len;
    sqe->off = off;
    sqe->user_data = user_data;
    sq_array[idx] = idx;
    std::atomic_thread_fence(std::memory_order_release);
    *sq_tail = tail + 1;
    syscall(__NR_io_uring_enter, fd, 1, 0, 0, nullptr, 0);
  }

  // blocks for one completion; returns (user_data, result)
  bool wait_cqe(uint64_t* user_data, int32_t* res) {
    while (true) {
      unsigned head = *cq_head;
      std::atomic_thread_fence(std::memory_order_acquire);
      if (head != *cq_tail) {
        io_uring_cqe* cqe = &cqes[head & *cq_mask];
        *user_data = cqe->user_data;
        *res = cqe->res;
        std::atomic_thread_fence(std::memory_order_release);
        *cq_head = head + 1;
        return true;
      }
      if (syscall(__NR_io_uring_enter, fd, 0, 1, IORING_ENTER_GETEVENTS,
                  nullptr, 0) < 0)
        return false;
    }
  }

  void destroy() {
    if (sqe_ptr && sqe_ptr != MAP_FAILED) munmap(sqe_ptr, sqe_len);
    if (cq_ptr && cq_ptr != MAP_FAILED && cq_ptr != sq_ptr)
      munmap(cq_ptr, cq_len);
    if (sq_ptr && sq_ptr != MAP_FAILED) munmap(sq_ptr, sq_len);
    if (fd >= 0) close(fd);
  }
};

struct IlStream {
  int fd = -1;
  uint64_t file_off = 0;
  std::string pending;   // assembled bytes not yet parsed
  size_t parse_off = 0;  // consumed prefix of pending
  std::vector<uint8_t> chunk;
  bool read_inflight = false;
  bool eof = false;
  bool dead = false;   // exhausted with no replacement file left
  bool error = false;  // I/O error (NOT EOF) — surfaces as -2, never silent
  int transient_retries = 0;  // EINTR/EAGAIN resubmits since last success
};

struct IlHandle {
  Uring ring;
  std::vector<std::string> paths;
  size_t next_path = 0;
  std::vector<IlStream> streams;
  size_t cursor = 0;
  int verify = 0;
  size_t chunk_bytes = 1 << 20;
  std::string record;  // returned record storage (stable until next call)
};

// open the next unopened path into stream slot s; false if none left.
// An open() failure (EACCES, EMFILE, a file deleted after the Python-side
// isfile pre-check, ...) marks the stream error — the Python interleave
// this reader claims byte-identical order with would raise, so silently
// skipping the shard would make its records vanish from the epoch.
bool il_refill(IlHandle* h, size_t s) {
  IlStream& st = h->streams[s];
  while (h->next_path < h->paths.size()) {
    int fd = open(h->paths[h->next_path++].c_str(), O_RDONLY);
    if (fd < 0) {
      st.eof = true;
      st.error = true;  // surfaces as -2 at the cursor, not a silent skip
      return true;      // slot occupied (by the error), not exhausted
    }
    st.fd = fd;
    st.file_off = 0;
    st.eof = false;
    st.chunk.resize(h->chunk_bytes);
    h->ring.submit_read(fd, st.chunk.data(), (unsigned)h->chunk_bytes,
                        st.file_off, s);
    st.read_inflight = true;
    return true;
  }
  return false;
}

// try to parse one full record out of stream s's pending bytes.
// 1 = got record (into h->record), 0 = need more data, -2 = corrupt.
int il_parse(IlHandle* h, IlStream& st) {
  const uint8_t* base = (const uint8_t*)st.pending.data() + st.parse_off;
  size_t avail = st.pending.size() - st.parse_off;
  if (avail < 12) return 0;
  uint64_t len;
  memcpy(&len, base, 8);
  if (len > (1ull << 40)) return -2;
  if (h->verify) {
    uint32_t len_crc;
    memcpy(&len_crc, base + 8, 4);
    if (len_crc != dmt_crc32c_masked(base, 8)) return -2;
  }
  if (avail < 12 + len + 4) return 0;
  if (h->verify) {
    uint32_t data_crc;
    memcpy(&data_crc, base + 12 + len, 4);
    if (data_crc != dmt_crc32c_masked(base + 12, len)) return -2;
  }
  h->record.assign((const char*)base + 12, len);
  st.parse_off += 12 + len + 4;
  if (st.parse_off > (h->chunk_bytes * 2) &&
      st.parse_off > st.pending.size() / 2) {
    st.pending.erase(0, st.parse_off);
    st.parse_off = 0;
  }
  return 1;
}

// absorb one completion into its stream and resubmit the next read
void il_complete(IlHandle* h, uint64_t s_idx, int32_t res) {
  IlStream& st = h->streams[s_idx];
  st.read_inflight = false;
  if (res == -EINTR || res == -EAGAIN) {  // transient: bounded resubmit
    if (++st.transient_retries > 64) {  // persistent EAGAIN = error, not a
      close(st.fd);                     // livelock in the wait loop
      st.fd = -1;
      st.eof = true;
      st.error = true;
      return;
    }
    h->ring.submit_read(st.fd, st.chunk.data(), (unsigned)h->chunk_bytes,
                        st.file_off, s_idx);
    st.read_inflight = true;
    return;
  }
  if (res < 0) {  // real I/O error — must NOT look like clean EOF
    close(st.fd);
    st.fd = -1;
    st.eof = true;
    st.error = true;
    return;
  }
  if (res == 0) {  // EOF
    close(st.fd);
    st.fd = -1;
    st.eof = true;
    return;
  }
  st.transient_retries = 0;
  st.pending.append((const char*)st.chunk.data(), (size_t)res);
  st.file_off += (uint64_t)res;
  h->ring.submit_read(st.fd, st.chunk.data(), (unsigned)h->chunk_bytes,
                      st.file_off, s_idx);
  st.read_inflight = true;
}

}  // namespace

extern "C" {

void* dmt_il_open(const char* const* paths, int n_paths, int cycle,
                  int verify_crc, int chunk_kb) {
  if (n_paths <= 0 || cycle <= 0) return nullptr;
  IlHandle* h = new IlHandle;
  h->verify = verify_crc;
  if (chunk_kb > 0) h->chunk_bytes = (size_t)chunk_kb << 10;
  for (int i = 0; i < n_paths; ++i) h->paths.emplace_back(paths[i]);
  size_t n_streams = (size_t)(cycle < n_paths ? cycle : n_paths);
  if (!h->ring.init((unsigned)(2 * n_streams + 2))) {
    delete h;
    return nullptr;  // io_uring unavailable -> caller falls back
  }
  h->streams.resize(n_streams);
  for (size_t s = 0; s < n_streams; ++s) il_refill(h, s);
  return h;
}

// Next record in strict round-robin order across the cycle window — the
// EXACT order of pipeline.py's Python interleave (deque rotate semantics:
// an exhausted file's replacement joins the BACK of the rotation). Waits on
// the cursor stream's I/O rather than skipping ahead, so the order is
// deterministic regardless of I/O timing. Returns length with *out set;
// -1 on clean end-of-data, -2 on corruption.
int64_t dmt_il_next(void* handle, uint8_t** out) {
  IlHandle* h = (IlHandle*)handle;
  size_t n = h->streams.size();
  if (n == 0) return -1;
  while (true) {
    bool any_alive = false;
    for (size_t k = 0; k < n; ++k)
      if (!h->streams[k].dead) any_alive = true;
    if (!any_alive) return -1;

    IlStream& st = h->streams[h->cursor];
    if (st.dead) {
      h->cursor = (h->cursor + 1) % n;
      continue;
    }
    int rc = il_parse(h, st);
    if (rc == 1) {
      h->cursor = (h->cursor + 1) % n;
      *out = (uint8_t*)h->record.data();
      return (int64_t)h->record.size();
    }
    if (rc == -2) return -2;
    if (st.eof && !st.read_inflight) {
      if (st.error) return -2;  // read error, not clean exhaustion
      if (st.parse_off < st.pending.size()) return -2;  // partial frame
      st.pending.clear();
      st.parse_off = 0;
      if (!il_refill(h, h->cursor)) st.dead = true;
      h->cursor = (h->cursor + 1) % n;  // replacement joins the back
      continue;
    }
    // cursor stream's read still in flight: absorb ANY completion and retry
    uint64_t ud;
    int32_t res;
    if (!h->ring.wait_cqe(&ud, &res)) return -2;
    il_complete(h, ud, res);
  }
}

void dmt_il_close(void* handle) {
  IlHandle* h = (IlHandle*)handle;
  for (auto& st : h->streams)
    if (st.fd >= 0) close(st.fd);
  h->ring.destroy();
  delete h;
}

}  // extern "C" (dmt_il_*)

// --------------------------- parallel parse+decode pool (tf.data C++ map
// equivalent). The Python pipeline's per-record overhead — proto walk,
// bytes copies, executor bookkeeping — dominates single-image cost once the
// decode itself is native; this pool takes raw TFRecord payloads and
// returns decoded float images + caption ids, with the proto walk AND the
// jpeg decode in C++ worker threads. Results come back in STRICT submission
// order (the shuffle window downstream relies on deterministic order).

#include <condition_variable>
#include <deque>
#include <map>
#include <mutex>
#include <thread>

namespace {

// minimal proto varint; false on truncation
static bool pv_varint(const uint8_t*& p, const uint8_t* end, uint64_t* v) {
  uint64_t out = 0;
  int shift = 0;
  while (p < end && shift < 64) {
    uint8_t b = *p++;
    out |= (uint64_t)(b & 0x7f) << shift;
    if (!(b & 0x80)) {
      *v = out;
      return true;
    }
    shift += 7;
  }
  return false;
}

// skip one field of the given wire type
static bool pv_skip(const uint8_t*& p, const uint8_t* end, int wire) {
  uint64_t v;
  switch (wire) {
    case 0: return pv_varint(p, end, &v);
    case 1: if (end - p < 8) return false; p += 8; return true;
    case 2:
      if (!pv_varint(p, end, &v) || (uint64_t)(end - p) < v) return false;
      p += v;
      return true;
    case 5: if (end - p < 4) return false; p += 4; return true;
    default: return false;
  }
}

struct ExampleView {
  const uint8_t* img = nullptr;
  uint64_t img_len = 0;
  const uint8_t* ints = nullptr;   // packed varint int64 payload ("caption")
  uint64_t ints_len = 0;
  bool ints_unpacked = false;      // repeated unpacked varints instead
};

// Walk Example{1: Features{1: repeated MapEntry{1: key, 2: Feature}}};
// Feature{1: BytesList{1: bytes}, 3: Int64List{1: int64s}}. Mirrors the
// Python codec in data/tfrecord.py:134-213. Returns false on malformed
// input (caller falls back to the Python parser).
static bool parse_example_view(const uint8_t* rec, uint64_t len,
                               ExampleView* out) {
  const uint8_t* p = rec;
  const uint8_t* end = rec + len;
  while (p < end) {
    uint64_t tag;
    if (!pv_varint(p, end, &tag)) return false;
    if ((tag >> 3) != 1 || (tag & 7) != 2) {  // Example.features
      if (!pv_skip(p, end, tag & 7)) return false;
      continue;
    }
    uint64_t flen;
    if (!pv_varint(p, end, &flen) || (uint64_t)(end - p) < flen) return false;
    const uint8_t* fend = p + flen;
    while (p < fend) {  // Features: repeated map entries
      uint64_t etag;
      if (!pv_varint(p, fend, &etag)) return false;
      if ((etag >> 3) != 1 || (etag & 7) != 2) {
        if (!pv_skip(p, fend, etag & 7)) return false;
        continue;
      }
      uint64_t elen;
      if (!pv_varint(p, fend, &elen) || (uint64_t)(fend - p) < elen) return false;
      const uint8_t* eend = p + elen;
      const uint8_t* key = nullptr;
      uint64_t key_len = 0;
      const uint8_t* feat = nullptr;
      uint64_t feat_len = 0;
      while (p < eend) {  // MapEntry
        uint64_t mtag;
        if (!pv_varint(p, eend, &mtag)) return false;
        uint64_t mlen;
        if ((mtag & 7) != 2) {
          if (!pv_skip(p, eend, mtag & 7)) return false;
          continue;
        }
        if (!pv_varint(p, eend, &mlen) || (uint64_t)(eend - p) < mlen) return false;
        if ((mtag >> 3) == 1) { key = p; key_len = mlen; }
        else if ((mtag >> 3) == 2) { feat = p; feat_len = mlen; }
        p += mlen;
      }
      if (key && feat) {
        bool is_img = key_len == 5 && memcmp(key, "image", 5) == 0;
        bool is_cap = key_len == 7 && memcmp(key, "caption", 7) == 0;
        if (is_img || is_cap) {
          const uint8_t* q = feat;
          const uint8_t* qend = feat + feat_len;
          while (q < qend) {  // Feature oneof
            uint64_t ftag;
            if (!pv_varint(q, qend, &ftag)) return false;
            if ((ftag & 7) != 2) {
              if (!pv_skip(q, qend, ftag & 7)) return false;
              continue;
            }
            uint64_t list_len;
            if (!pv_varint(q, qend, &list_len) || (uint64_t)(qend - q) < list_len)
              return false;
            const uint8_t* list = q;
            const uint8_t* lend = q + list_len;
            q += list_len;
            if (is_img && (ftag >> 3) == 1) {  // BytesList: first value
              const uint8_t* r = list;
              uint64_t btag, blen;
              if (!pv_varint(r, lend, &btag) || (btag >> 3) != 1) return false;
              if (!pv_varint(r, lend, &blen) || (uint64_t)(lend - r) < blen)
                return false;
              out->img = r;
              out->img_len = blen;
            } else if (is_cap && (ftag >> 3) == 3) {  // Int64List
              const uint8_t* r = list;
              uint64_t itag;
              const uint8_t* save = r;
              if (pv_varint(r, lend, &itag) && (itag >> 3) == 1) {
                if ((itag & 7) == 2) {  // packed
                  uint64_t plen;
                  if (!pv_varint(r, lend, &plen) || (uint64_t)(lend - r) < plen)
                    return false;
                  out->ints = r;
                  out->ints_len = plen;
                } else {  // repeated unpacked varints incl. their tags
                  out->ints = save;
                  out->ints_len = lend - save;
                  out->ints_unpacked = true;
                }
              }
            }
          }
        }
      }
      p = eend;
    }
    p = fend;
  }
  return true;
}

static int decode_caption(const ExampleView& v, int32_t* cap, int cap_max) {
  if (!v.ints || cap_max <= 0) return 0;
  const uint8_t* p = v.ints;
  const uint8_t* end = v.ints + v.ints_len;
  int n = 0;
  while (p < end && n < cap_max) {
    uint64_t val;
    if (v.ints_unpacked) {  // skip the per-element tag
      uint64_t tag;
      if (!pv_varint(p, end, &tag)) break;
    }
    if (!pv_varint(p, end, &val)) break;
    cap[n++] = (int32_t)(int64_t)val;
  }
  return n;
}

struct DecJob {
  const uint8_t* rec;
  uint64_t len;
  float* out;
  int32_t* cap;
  int cap_max;
  uint64_t seq;
};

struct DecDone {
  int rc;     // 0 ok; 1 bad jpeg; 2 malformed/missing image feature
  int cap_n;
};

struct DecPool {
  int size, channels;
  std::vector<std::thread> threads;
  std::mutex mu;
  std::condition_variable cv_in, cv_out;
  std::deque<DecJob> inq;
  std::map<uint64_t, DecDone> done;
  bool closing = false;

  void worker() {
    for (;;) {
      DecJob job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_in.wait(lk, [&] { return closing || !inq.empty(); });
        if (inq.empty()) return;  // closing
        job = inq.front();
        inq.pop_front();
      }
      DecDone d{2, 0};
      ExampleView v;
      if (parse_example_view(job.rec, job.len, &v) && v.img) {
        d.cap_n = decode_caption(v, job.cap, job.cap_max);
        d.rc = dmt_decode_jpeg(v.img, v.img_len, size, channels, job.out);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        done[job.seq] = d;
      }
      cv_out.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* dmt_pool_open(int n_threads, int size, int channels) {
  if (n_threads < 1) n_threads = 1;
  DecPool* p = new DecPool;
  p->size = size;
  p->channels = channels;
  for (int i = 0; i < n_threads; ++i)
    p->threads.emplace_back([p] { p->worker(); });
  return p;
}

void dmt_pool_submit(void* handle, const uint8_t* rec, uint64_t len,
                     uint64_t seq, float* out, int32_t* cap, int cap_max) {
  DecPool* p = (DecPool*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->inq.push_back(DecJob{rec, len, out, cap, cap_max, seq});
  }
  p->cv_in.notify_one();
}

// Blocks until job `seq` is finished; returns rc and writes *cap_n.
// The caller collects seqs in submission order for deterministic output.
int dmt_pool_wait(void* handle, uint64_t seq, int* cap_n) {
  DecPool* p = (DecPool*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_out.wait(lk, [&] { return p->done.count(seq) != 0; });
  DecDone d = p->done[seq];
  p->done.erase(seq);
  *cap_n = d.cap_n;
  return d.rc;
}

void dmt_pool_close(void* handle) {
  DecPool* p = (DecPool*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->closing = true;
    p->inq.clear();  // outstanding jobs are dropped; caller drained first
  }
  p->cv_in.notify_all();
  for (auto& t : p->threads) t.join();
  delete p;
}

}  // extern "C" (dmt_pool_*)
