// Native JPEG decode for the host input pipeline.
//
// TPU-native equivalent of the reference's TF C++ image decode
// (src/data/data_utils.py:185-206 ran tf.io.decode_image inside
// tf.data's C++ runtime).  Decodes baseline/progressive JPEG straight
// to RGB8 with libjpeg-turbo; the Python loader falls back to PIL for
// PNG and for anything this decoder reports as unsupported, so parity
// is preserved by construction and verified by tests
// (tests/test_native_image.py pins byte-parity against PIL).
//
// Exposed C ABI (ctypes-bound in mmt_tpu/data/native.py):
//   mmt_jpeg_probe(data, len, &w, &h)   -> 0 ok / <0 not-a-jpeg
//   mmt_jpeg_decode(data, len, out, cap, &w, &h)
//       -> bytes written (w*h*3) or <0 on error; `out` is RGB8
//          row-major.

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

constexpr int64_t kErrNotJpeg = -1;
constexpr int64_t kErrDecode = -2;
constexpr int64_t kErrCapacity = -3;
constexpr int64_t kErrUnsupported = -4;

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void silence_output(j_common_ptr) {}

}  // namespace

extern "C" {

int64_t mmt_jpeg_probe(const uint8_t* data, int64_t len, int32_t* w,
                       int32_t* h) {
  if (len < 3 || data[0] != 0xFF || data[1] != 0xD8 || data[2] != 0xFF)
    return kErrNotJpeg;
  jpeg_decompress_struct cinfo;
  ErrMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  err.pub.output_message = silence_output;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  *w = (int32_t)cinfo.image_width;
  *h = (int32_t)cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int64_t mmt_jpeg_decode(const uint8_t* data, int64_t len, uint8_t* out,
                        int64_t cap, int32_t* w, int32_t* h) {
  if (len < 3 || data[0] != 0xFF || data[1] != 0xD8 || data[2] != 0xFF)
    return kErrNotJpeg;
  jpeg_decompress_struct cinfo;
  ErrMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  err.pub.output_message = silence_output;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  // Force RGB output: libjpeg converts grayscale and YCbCr natively.
  // CMYK/YCCK need PIL's own conversion -- report unsupported so the
  // caller falls back (rare; keeps byte-parity exact).
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return kErrUnsupported;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int64_t row = (int64_t)cinfo.output_width * cinfo.output_components;
  const int64_t need = row * cinfo.output_height;
  if (cinfo.output_components != 3 || need > cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return cinfo.output_components != 3 ? kErrUnsupported : kErrCapacity;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rows[1] = {out + (int64_t)cinfo.output_scanline * row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  *w = (int32_t)cinfo.output_width;
  *h = (int32_t)cinfo.output_height;
  // Truncated/corrupt streams decode with warnings (libjpeg pads the
  // tail); PIL raises instead.  Decline so the caller's PIL fallback
  // defines the behavior -- parity by construction.
  const long warnings = cinfo.err->num_warnings;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (warnings > 0) return kErrDecode;
  return need;
}

}  // extern "C"
