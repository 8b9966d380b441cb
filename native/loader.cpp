// Native host data pipeline: paired JPEG decode + bilinear letterbox into
// preallocated batch buffers, multithreaded.
//
// This is the framework's C++ runtime component feeding the TPU serving/eval
// path (the reference leans on cv2's C++ for the same work — SURVEY §2.9): one
// C call fills a fixed-shape uint8 batch pair with letterboxed RGB/IR images,
// no per-image Python, no intermediate copies.
//
// Letterbox semantics match reference utils/datasets.py:1404-1444 (auto=False):
//   r = min(S/h, S/w) (clamped to 1 when scaleup=0), resize bilinear
//   (half-pixel centers, cv2.INTER_LINEAR-compatible), center pad with 114
//   using the round(d -/+ 0.1) split rule.
//
// Build: native/build.sh  ->  libicafusion_host.so  (ctypes-loaded by
// icafusion_tpu/data/native.py)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode a JPEG file to packed RGB8. Returns false on any error.
bool decode_jpeg(const char* path, std::vector<uint8_t>& out, int& w, int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  out.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear RGB8 resize with half-pixel centers (cv2.INTER_LINEAR-compatible).
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                     int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max(x0, 0);
      for (int c = 0; c < 3; ++c) {
        float top = r0[x0 * 3 + c] * (1 - wx) + r0[x1 * 3 + c] * wx;
        float bot = r1[x0 * 3 + c] * (1 - wx) + r1[x1 * 3 + c] * wx;
        float v = top * (1 - wy) + bot * wy;
        drow[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Letterbox one decoded image into out (SH*SW*3), pad value 114. The canvas
// may be rectangular (SH != SW) — the minimal-rectangle serving geometry.
// ratio/pad written for coordinate rescaling (dw, dh are half-pads).
bool letterbox_into(const std::vector<uint8_t>& img, int w, int h, int SH,
                    int SW, int scaleup, uint8_t* out, float* ratio,
                    float* pad) {
  float r = std::min(static_cast<float>(SH) / h, static_cast<float>(SW) / w);
  if (!scaleup) r = std::min(r, 1.0f);
  int nw = static_cast<int>(std::lround(w * r));
  int nh = static_cast<int>(std::lround(h * r));
  float dw = (SW - nw) / 2.0f;
  float dh = (SH - nh) / 2.0f;
  int top = static_cast<int>(std::lround(dh - 0.1f));
  int left = static_cast<int>(std::lround(dw - 0.1f));

  std::memset(out, 114, static_cast<size_t>(SH) * SW * 3);
  std::vector<uint8_t> resized;
  const uint8_t* src = img.data();
  if (nw != w || nh != h) {
    resized.resize(static_cast<size_t>(nw) * nh * 3);
    resize_bilinear(img.data(), w, h, resized.data(), nw, nh);
    src = resized.data();
  }
  for (int y = 0; y < nh; ++y) {
    std::memcpy(out + (static_cast<size_t>(y + top) * SW + left) * 3,
                src + static_cast<size_t>(y) * nw * 3,
                static_cast<size_t>(nw) * 3);
  }
  ratio[0] = r;
  ratio[1] = r;
  pad[0] = dw;
  pad[1] = dh;
  return true;
}

}  // namespace

extern "C" {

// Bumped when the exported signatures change; icafusion_tpu/data/native.py
// refuses to bind an .so reporting an older ABI (a stale binary whose rebuild
// failed would otherwise be called with the wrong argument layout).
int icaf_abi_version() { return 2; }

// Fill out_rgb/out_ir (n, SH, SW, 3) uint8 with letterboxed pairs; the canvas
// may be rectangular (SH != SW — minimal-rectangle serving geometry).
// ratios: (n, 2), pads: (n, 2), orig_hw: (n, 2). Returns the number of
// successfully decoded pairs; failed slots are left gray with orig_hw = 0.
int icaf_decode_letterbox_batch(const char** rgb_paths, const char** ir_paths,
                                int n, int SH, int SW, int scaleup,
                                uint8_t* out_rgb, uint8_t* out_ir,
                                float* ratios, float* pads, int* orig_hw,
                                int n_threads) {
  std::atomic<int> ok_count{0};
  std::atomic<int> next{0};
  const size_t canvas = static_cast<size_t>(SH) * SW * 3;
  auto worker = [&]() {
    std::vector<uint8_t> buf_rgb, buf_ir;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      uint8_t* orgb = out_rgb + static_cast<size_t>(i) * canvas;
      uint8_t* oir = out_ir + static_cast<size_t>(i) * canvas;
      int w0, h0, w1, h1;
      bool ok = decode_jpeg(rgb_paths[i], buf_rgb, w0, h0) &&
                decode_jpeg(ir_paths[i], buf_ir, w1, h1);
      if (!ok) {
        std::memset(orgb, 114, canvas);
        std::memset(oir, 114, canvas);
        ratios[i * 2] = ratios[i * 2 + 1] = 1.0f;
        pads[i * 2] = pads[i * 2 + 1] = 0.0f;
        orig_hw[i * 2] = orig_hw[i * 2 + 1] = 0;
        continue;
      }
      letterbox_into(buf_rgb, w0, h0, SH, SW, scaleup, orgb, ratios + i * 2,
                     pads + i * 2);
      // callers rescale boxes with the RGB stream's ratio/pad against the RGB
      // orig_hw; the IR letterbox must not clobber those slots when the pair
      // differs in resolution, so it writes to scratch
      float ir_ratio[2], ir_pad[2];
      letterbox_into(buf_ir, w1, h1, SH, SW, scaleup, oir, ir_ratio, ir_pad);
      orig_hw[i * 2] = h0;
      orig_hw[i * 2 + 1] = w0;
      ok_count.fetch_add(1);
    }
  };
  int nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok_count.load();
}

}  // extern "C"
