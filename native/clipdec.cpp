// Native clip decoder: fused JPEG decode + resize (+ normalize) for the
// host-side video input pipeline.
//
// The reference decodes 32 JPEG frames/sample with PIL in Python loader
// workers — the host-side bottleneck that starves accelerators (SURVEY §7
// hard part 5). This library gives the loader a C path:
//   * libjpeg(-turbo) decode with DCT-domain prescaling (M/8 fractions), so
//     a 1920x1080 frame headed for short-side 288 is IDCT'd at ~1/4 size;
//   * fused bilinear resize to the exact target;
//   * optional fused float32 ImageNet normalization into a padded canvas.
//
// Python binds via ctypes (tubelet_transformer_tpu/data/native.py); calls
// release the GIL, so the existing thread-pool loader parallelizes them.
//
// Build: native/build.sh (emits libclipdec.so next to this file).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize HWC uint8 RGB. align_corners=false (half-pixel centers),
// matching the convention of PIL/cv2 linear resampling.
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                     int dh) {
  if (sw == dw && sh == dh) {
    std::memcpy(dst, src, static_cast<size_t>(sw) * sh * 3);
    return;
  }
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> fx(dw);
  for (int x = 0; x < dw; ++x) {
    float cx = (x + 0.5f) * sx - 0.5f;
    cx = std::max(cx, 0.0f);
    int ix = static_cast<int>(cx);
    x0[x] = std::min(ix, sw - 1);
    x1[x] = std::min(ix + 1, sw - 1);
    fx[x] = cx - ix;
  }
  for (int y = 0; y < dh; ++y) {
    float cy = (y + 0.5f) * sy - 0.5f;
    cy = std::max(cy, 0.0f);
    int iy = static_cast<int>(cy);
    int y0 = std::min(iy, sh - 1);
    int y1 = std::min(iy + 1, sh - 1);
    float fy = cy - iy;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p00 = r0 + x0[x] * 3;
      const uint8_t* p01 = r0 + x1[x] * 3;
      const uint8_t* p10 = r1 + x0[x] * 3;
      const uint8_t* p11 = r1 + x1[x] * 3;
      float wx = fx[x];
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        float v = top + (bot - top) * fy;
        out[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Decode a JPEG at the smallest libjpeg prescale that still covers
// (min_w, min_h); returns decoded buffer + dims.
bool decode_prescaled(const uint8_t* buf, unsigned long len, int min_w,
                      int min_h, std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // choose scale M/8 so that output >= requested min dims
  int num = 8;
  if (min_w > 0 && min_h > 0) {
    for (int m = 1; m <= 8; ++m) {
      if (static_cast<long>(cinfo.image_width) * m / 8 >= min_w &&
          static_cast<long>(cinfo.image_height) * m / 8 >= min_h) {
        num = m;
        break;
      }
    }
  }
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);

  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) *
                                     *w * 3;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace

extern "C" {

// Read JPEG dimensions without full decode. Returns 0 on success.
int tuber_jpeg_dims(const uint8_t* buf, unsigned long len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode + resize to exactly (target_w, target_h), RGB HWC uint8.
// Returns 0 on success.
int tuber_decode_jpeg(const uint8_t* buf, unsigned long len, int target_w,
                      int target_h, uint8_t* out) {
  std::vector<uint8_t> dec;
  int w, h;
  if (!decode_prescaled(buf, len, target_w, target_h, &dec, &w, &h)) return 1;
  resize_bilinear(dec.data(), w, h, out, target_w, target_h);
  return 0;
}

// Fused: decode -> resize to (valid_w, valid_h) -> ImageNet-normalize ->
// write into a zero-padded float32 canvas (canvas_h, canvas_w, 3) at the
// top-left. The caller owns zeroing the canvas once per clip. Returns 0 on
// success.
int tuber_decode_to_canvas(const uint8_t* buf, unsigned long len, int valid_w,
                           int valid_h, int canvas_w, int canvas_h,
                           const float* mean, const float* std, float* out) {
  std::vector<uint8_t> dec;
  int w, h;
  if (!decode_prescaled(buf, len, valid_w, valid_h, &dec, &w, &h)) return 1;
  std::vector<uint8_t> resized(static_cast<size_t>(valid_w) * valid_h * 3);
  resize_bilinear(dec.data(), w, h, resized.data(), valid_w, valid_h);
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.0f / std[0], 1.0f / std[1], 1.0f / std[2]};
  for (int y = 0; y < valid_h; ++y) {
    const uint8_t* src = resized.data() + static_cast<size_t>(y) * valid_w * 3;
    float* dst = out + (static_cast<size_t>(y) * canvas_w) * 3;
    for (int x = 0; x < valid_w; ++x) {
      for (int c = 0; c < 3; ++c) {
        dst[x * 3 + c] = (src[x * 3 + c] * inv255 - mean[c]) * inv_std[c];
      }
    }
  }
  return 0;
}

}  // extern "C"
