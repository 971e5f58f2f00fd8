// Native host-side I/O kernels for sdpl_slam_tpu.
//
// The reference's data loading is synchronous C++ in the example driver
// (/root/reference/example/sdpl_slam.cc:99-153): per frame it reads a
// semantic mask as a whitespace-separated integer text matrix
// (LoadMask, :269-466) and a Middlebury .flo file.  Python-side parsing of
// the ~466k-integer mask text dominates host time; this module provides
// mmap-based scanners exposed through ctypes (pybind11 is not available in
// this environment).
//
// Build: make -C native   (produces libsdpl_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <png.h>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Parse a whitespace-separated integer matrix with exactly rows*cols
// entries into out (int32, row-major).  Returns number of parsed values,
// or -1 on I/O error.
int64_t sdpl_parse_int_matrix(const char* path, int32_t* out,
                              int64_t rows, int64_t cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t n = static_cast<size_t>(st.st_size);
  const char* data =
      static_cast<const char*>(mmap(nullptr, n, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) return -1;

  const int64_t want = rows * cols;
  int64_t count = 0;
  const char* p = data;
  const char* end = data + n;
  while (p < end && count < want) {
    // skip whitespace
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
      ++p;
    if (p >= end) break;
    bool neg = false;
    if (*p == '-') { neg = true; ++p; }
    int32_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      ++p;
    }
    out[count++] = neg ? -v : v;
  }
  munmap(const_cast<char*>(data), n);
  return count;
}

// Read a Middlebury .flo file into out (float32, H*W*2).  Returns 0 on
// success; fills width/height.  -1: open failure, -2: bad magic,
// -3: size mismatch with the provided capacity.
int32_t sdpl_read_flo(const char* path, float* out, int64_t capacity,
                      int32_t* width, int32_t* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  float magic = 0.f;
  if (fread(&magic, 4, 1, f) != 1 || magic != 202021.25f) {
    fclose(f);
    return -2;
  }
  int32_t w = 0, h = 0;
  if (fread(&w, 4, 1, f) != 1 || fread(&h, 4, 1, f) != 1) {
    fclose(f);
    return -2;
  }
  *width = w;
  *height = h;
  const int64_t n = static_cast<int64_t>(w) * h * 2;
  if (n > capacity) { fclose(f); return -3; }
  size_t got = fread(out, 4, static_cast<size_t>(n), f);
  fclose(f);
  return got == static_cast<size_t>(n) ? 0 : -2;
}

// KITTI disparity->depth conversion fused with negative clamping
// (Tracking.cc:195-219): out = bf / (d / factor) for d > 0 else 0.
void sdpl_depth_kitti(const float* in, float* out, int64_t n, float bf,
                      float factor) {
  for (int64_t i = 0; i < n; ++i) {
    float d = in[i];
    out[i] = d > 0.f ? bf / (d / factor) : 0.f;
  }
}

void sdpl_depth_scale(const float* in, float* out, int64_t n, float factor) {
  for (int64_t i = 0; i < n; ++i) {
    float d = in[i];
    out[i] = d > 0.f ? d / factor : 0.f;
  }
}

// PNG decode via libpng (replaces cv2.imread on the loader hot path;
// the reference reads images with cv::imread UNCHANGED,
// /root/reference/example/sdpl_slam.cc:104-113).
//
// out receives the decoded rows packed little-endian:
//   8-bit:  channels bytes per pixel
//   16-bit: channels uint16 per pixel (network order swapped to LE)
// Palette images expand to RGB; 1/2/4-bit gray expands to 8-bit.
// Returns 0 on success; fills w/h/channels/bitdepth.
//   -1 open/parse failure, -3 capacity too small.
int32_t sdpl_read_png(const char* path, uint8_t* out, int64_t cap_bytes,
                      int32_t* w, int32_t* h, int32_t* channels,
                      int32_t* bitdepth) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_byte sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) {
    fclose(f);
    return -1;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(f); return -1; }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(f);
    return -1;
  }
  int32_t rc = 0;
  // volatile: modified between setjmp and a potential longjmp from inside
  // libpng (corrupt PNG body) — without it the error-branch read is UB.
  png_bytep* volatile rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    delete[] rows;
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -1;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int ctype = png_get_color_type(png, info);

  if (ctype == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (ctype == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (depth == 16) png_set_swap(png);   // big-endian file -> LE host
  png_read_update_info(png, info);

  depth = png_get_bit_depth(png, info);
  int nch = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  const int64_t need = static_cast<int64_t>(rowbytes) * height;
  if (need > cap_bytes) {
    rc = -3;
  } else {
    rows = new png_bytep[height];
    for (png_uint_32 y = 0; y < height; ++y)
      rows[y] = out + static_cast<size_t>(y) * rowbytes;
    png_read_image(png, rows);
    *w = static_cast<int32_t>(width);
    *h = static_cast<int32_t>(height);
    *channels = nch;
    *bitdepth = depth;
  }
  delete[] rows;
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return rc;
}

}  // extern "C"
