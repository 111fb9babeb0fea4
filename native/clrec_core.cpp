// clrec_core: native data-plane for clip_lite_tpu.
//
// The reference leans on LMDB (C) + OpenCV (C++) for its record store and
// image decode (reference: data/readers.py:115-118, :64). This library is
// the framework's own native equivalent:
//
//   * mmap'd CLRec record access (zero-copy payload views);
//   * a threaded batch kernel fusing JPEG decode -> crop -> bilinear
//     resize -> horizontal flip straight into the caller's output buffer
//     (one pass, no full-size RGB intermediate resize chain), releasing
//     the GIL for the entire batch.
//
// C ABI only; Python binds via ctypes (clip_lite_tpu/data/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread -ljpeg)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <algorithm>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// CLRec mmap reader
// ---------------------------------------------------------------------------

struct ClrecHandle {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  uint64_t count = 0;
  std::vector<uint64_t> offsets;  // count entries: offset of each record
};

static const char kMagic[8] = {'C', 'L', 'R', 'E', 'C', '0', '0', '1'};

ClrecHandle* clrec_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) { ::close(fd); return nullptr; }

  auto* h = new ClrecHandle();
  h->fd = fd;
  h->data = static_cast<const uint8_t*>(mem);
  h->size = st.st_size;
  if (h->size < 16 || memcmp(h->data, kMagic, 8) != 0) {
    munmap(mem, st.st_size); ::close(fd); delete h; return nullptr;
  }
  memcpy(&h->count, h->data + 8, 8);
  h->offsets.reserve(h->count);
  uint64_t pos = 16;
  for (uint64_t i = 0; i < h->count; ++i) {
    if (pos + 8 > h->size) { munmap(mem, st.st_size); ::close(fd); delete h; return nullptr; }
    h->offsets.push_back(pos);
    uint64_t len;
    memcpy(&len, h->data + pos, 8);
    pos += 8 + len;
  }
  return h;
}

uint64_t clrec_count(ClrecHandle* h) { return h ? h->count : 0; }

// Zero-copy view of record i's payload. Returns 0 on success.
int clrec_record(ClrecHandle* h, uint64_t i, const uint8_t** out,
                 uint64_t* len) {
  if (!h || i >= h->count) return -1;
  uint64_t pos = h->offsets[i];
  memcpy(len, h->data + pos, 8);
  *out = h->data + pos + 8;
  return 0;
}

void clrec_close(ClrecHandle* h) {
  if (!h) return;
  if (h->data) munmap(const_cast<uint8_t*>(h->data), h->size);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

// ---------------------------------------------------------------------------
// Fused JPEG decode -> crop -> bilinear resize -> flip
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG to an RGB buffer, using libjpeg's DCT-domain scaled
// decode (1/2, 1/4, 1/8) when the requested crop will be downsampled
// anyway (the FFCV-style decode shortcut: a 640px source cropped to
// ~60% and resized to 224 decodes at half resolution for ~2-3x less
// IDCT + color-convert work, with no quality loss after bilinear).
//
// crop_frac: min(normalized crop height, width) of the region that will
// be resampled to out_size (<=0 means full image). Returns 0 on success.
static int decode_jpeg(const uint8_t* data, size_t len,
                       std::vector<uint8_t>& rgb, int* w, int* h,
                       float crop_frac, int out_size) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // force RGB (gray/CMYK sources too)

  if (out_size > 0) {
    float frac = crop_frac > 0 ? crop_frac : 1.0f;
    // Smallest source extent that will feed the resampler.
    float crop_px = frac * float(std::min(cinfo.image_width,
                                          cinfo.image_height));
    // Keep >= 1.3x out_size after scaling for bilinear quality.
    unsigned denom = 1;
    while (denom < 8 && crop_px / float(denom * 2) >= 1.3f * out_size) {
      denom *= 2;
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }

  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb.resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb.data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear-sample a crop box of src into a (size x size x 3) uint8 tile,
// optionally mirrored. Box in pixel coords (y0, x0, y1, x1), end-exclusive.
static void sample_crop(const uint8_t* src, int sw, int sh,
                        float y0, float x0, float y1, float x1,
                        int size, int flip, uint8_t* out) {
  const float sy = (y1 - y0) / size;
  const float sx = (x1 - x0) / size;
  for (int oy = 0; oy < size; ++oy) {
    float fy = y0 + (oy + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = float(sh - 1);
    int iy = int(fy);
    int iy1 = iy + 1 < sh ? iy + 1 : iy;
    float wy = fy - iy;
    for (int ox = 0; ox < size; ++ox) {
      int tx = flip ? (size - 1 - ox) : ox;
      float fx = x0 + (tx + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > sw - 1) fx = float(sw - 1);
      int ix = int(fx);
      int ix1 = ix + 1 < sw ? ix + 1 : ix;
      float wx = fx - ix;
      const uint8_t* p00 = src + (size_t(iy) * sw + ix) * 3;
      const uint8_t* p01 = src + (size_t(iy) * sw + ix1) * 3;
      const uint8_t* p10 = src + (size_t(iy1) * sw + ix) * 3;
      const uint8_t* p11 = src + (size_t(iy1) * sw + ix1) * 3;
      uint8_t* dst = out + (size_t(oy) * size + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] * (1 - wx) + p01[c] * wx;
        float bot = p10[c] * (1 - wx) + p11[c] * wx;
        float v = top * (1 - wy) + bot * wy;
        dst[c] = uint8_t(v + 0.5f);
      }
    }
  }
}

// Batched fused op. crop_boxes are NORMALIZED (y0, x0, y1, x1) in [0, 1]
// relative to each source image (scaled to pixels after decode); a
// negative y0 requests a full-image resize. Returns the number of failed
// decodes (those tiles are zero-filled).
int decode_crop_batch(const uint8_t** jpegs, const uint64_t* lens, int n,
                      int out_size, const float* crop_boxes,
                      const uint8_t* flips, uint8_t* out, int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t tile = size_t(out_size) * out_size * 3;

  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      const float* bb = crop_boxes + size_t(i) * 4;
      float frac = bb[0] < 0 ? 1.0f
                   : std::min(bb[2] - bb[0], bb[3] - bb[1]);
      if (decode_jpeg(jpegs[i], lens[i], rgb, &w, &h, frac,
                      out_size) != 0 || w == 0) {
        memset(out + size_t(i) * tile, 0, tile);
        failures.fetch_add(1);
        continue;
      }
      const float* b = crop_boxes + size_t(i) * 4;
      float y0 = b[0] * h, x0 = b[1] * w, y1 = b[2] * h, x1 = b[3] * w;
      if (b[0] < 0) { y0 = 0; x0 = 0; y1 = float(h); x1 = float(w); }
      sample_crop(rgb.data(), w, h, y0, x0, y1, x1, out_size, flips[i],
                  out + size_t(i) * tile);
    }
  };

  if (num_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failures.load();
}

}  // extern "C"
