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
