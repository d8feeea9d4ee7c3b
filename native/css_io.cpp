// css_io — native image-decode runtime for the css_tpu data pipeline.
//
// The reference delegates decode to PIL inside torch DataLoader worker
// *processes* (dataset_helpers/VOC.py:21-22).  Here decode is a C library
// driven from Python *threads*: ctypes releases the GIL for the duration of
// the call, so a thread pool gets true parallelism without process forks,
// pickling, or shared-memory shuttling.  Decoded pixels are written straight
// into the caller-provided canvas buffer (the batch array), so there is no
// intermediate copy on the host path device <- canvas <- decode.
//
// Exposed C API (see css_tpu/data/native_io.py):
//   css_decode_jpeg_canvas    — JPEG file -> RGB uint8 canvas (padded 0)
//   css_decode_png_canvas     — PNG file  -> single-channel int32 canvas
//                               (palette/gray label maps; padded with `fill`)
//   css_decode_png_rgb_canvas — PNG file  -> RGB uint8 canvas (Cityscapes
//                               leftImg8bit 2048x1024 images — the biggest
//                               decode cost in the pipeline,
//                               reference Cityscapes.py:219-225)
//   css_version
//
// Build: make -C native (g++ -O3 -shared, links libjpeg/libpng/zlib).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

int css_version() { return 1; }

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

}  // namespace

// Decode a JPEG file into an RGB uint8 canvas of canvas_h x canvas_w
// (row-major, 3 channels).  Pixels outside the image stay untouched (caller
// pre-fills).  Writes the true height/width into out_h/out_w.
// Returns 0 on success, nonzero on failure.
int css_decode_jpeg_canvas(const char* path, uint8_t* canvas, int canvas_h,
                           int canvas_w, int* out_h, int* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  // declared before setjmp: longjmp from inside libjpeg must not skip the
  // destructor (a corrupt file re-read every epoch would leak unboundedly)
  std::vector<uint8_t> row;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  if (h > canvas_h || w > canvas_w) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  row.resize(static_cast<size_t>(w) * cinfo.output_components);
  JSAMPROW rowptr = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = static_cast<int>(cinfo.output_scanline);
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    std::memcpy(canvas + (static_cast<size_t>(y) * canvas_w) * 3, row.data(),
                static_cast<size_t>(w) * 3);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *out_h = h;
  *out_w = w;
  return 0;
}

// Decode a paletted/grayscale PNG label map into an int32 canvas; pixels
// outside the image are set to `fill` only within [0,h)x[0,w)?  No — the
// caller pre-fills the canvas; this writes the valid region only.
int css_decode_png_canvas(const char* path, int32_t* canvas, int canvas_h,
                          int canvas_w, int* out_h, int* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  png_byte header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(f);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(f);
    return 7;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(f);
    return 7;
  }
  // declared before setjmp: longjmp from inside libpng must not skip the
  // destructors (a corrupt file re-read every epoch would leak unboundedly)
  std::vector<png_byte> buf;
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 3;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const int h = static_cast<int>(png_get_image_height(png, info));
  const int w = static_cast<int>(png_get_image_width(png, info));
  if (h > canvas_h || w > canvas_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 4;
  }
  const png_byte color = png_get_color_type(png, info);
  const png_byte depth = png_get_bit_depth(png, info);
  // normalize label encodings to 8-bit single channel: palette PNGs keep
  // their palette *indices* (class ids), gray stays gray.  16-bit depth is
  // refused (return 6 -> PIL fallback reads exact int values): strip_16
  // keeps the HIGH byte, which would map every label id < 256 to 0.
  if (depth == 16) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 6;
  }
  if (depth < 8) png_set_packing(png);
  if (color == PNG_COLOR_TYPE_GRAY_ALPHA || color == PNG_COLOR_TYPE_RGB_ALPHA)
    png_set_strip_alpha(png);
  const bool interlaced =
      png_get_interlace_type(png, info) != PNG_INTERLACE_NONE;
  // libpng requires interlace handling to be registered BEFORE
  // png_read_update_info when png_read_image will run the Adam7 passes;
  // omitting it is an application error (warning spam, fatal on
  // benign-error-disabled builds)
  if (interlaced) png_set_interlace_handling(png);
  png_read_update_info(png, info);
  const int channels = static_cast<int>(png_get_channels(png, info));

  const size_t rowbytes = png_get_rowbytes(png, info);
  if (interlaced) {
    // Adam7 passes touch sparse pixels per row, so streaming png_read_row
    // would decode garbage; read the whole image (png_read_image handles
    // interlace internally), then widen row by row.
    buf.resize(rowbytes * static_cast<size_t>(h));
    rows.resize(static_cast<size_t>(h));
    for (int y = 0; y < h; ++y) rows[y] = buf.data() + rowbytes * y;
    png_read_image(png, rows.data());
  } else {
    buf.resize(rowbytes);
  }
  for (int y = 0; y < h; ++y) {
    png_byte* row = buf.data() + (interlaced ? rowbytes * y : 0);
    if (!interlaced) png_read_row(png, row, nullptr);
    int32_t* dst = canvas + static_cast<size_t>(y) * canvas_w;
    if (channels == 1) {
      for (int x = 0; x < w; ++x) dst[x] = row[x];
    } else {
      // RGB label maps: take the first channel (trainIds are replicated)
      for (int x = 0; x < w; ++x) dst[x] = row[static_cast<size_t>(x) * channels];
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  *out_h = h;
  *out_w = w;
  return 0;
}

// Decode an RGB(A)/palette/gray PNG image into an RGB uint8 canvas of
// canvas_h x canvas_w (row-major, 3 channels).  libpng transforms normalize
// every color type to 8-bit RGB; rows are written directly into the canvas
// (one memcpy-free scanline pass).  Returns 0 on success.
int css_decode_png_rgb_canvas(const char* path, uint8_t* canvas, int canvas_h,
                              int canvas_w, int* out_h, int* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  png_byte header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(f);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(f);
    return 7;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(f);
    return 7;
  }
  // declared before setjmp: longjmp must not skip the destructors (leak)
  std::vector<png_byte> buf;
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 3;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const int h = static_cast<int>(png_get_image_height(png, info));
  const int w = static_cast<int>(png_get_image_width(png, info));
  if (h > canvas_h || w > canvas_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 4;
  }
  const png_byte color = png_get_color_type(png, info);
  const png_byte depth = png_get_bit_depth(png, info);
  // (16-bit is fine here: images are intensity data, the stripped high
  // byte is the standard 8-bit approximation, matching PIL's convert)
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  const bool interlaced =
      png_get_interlace_type(png, info) != PNG_INTERLACE_NONE;
  // see css_decode_png_canvas: must be registered before update_info
  if (interlaced) png_set_interlace_handling(png);
  png_read_update_info(png, info);
  if (png_get_channels(png, info) != 3 || png_get_bit_depth(png, info) != 8) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 5;
  }
  if (w == canvas_w) {
    // canvas rows are contiguous with image rows: single sequential pass
    // (png_read_image also runs the Adam7 passes itself when interlaced)
    rows.resize(static_cast<size_t>(h));
    for (int y = 0; y < h; ++y)
      rows[y] = canvas + static_cast<size_t>(y) * canvas_w * 3;
    png_read_image(png, rows.data());
  } else if (interlaced) {
    // streaming rows would interleave Adam7 passes into garbage; decode the
    // whole image into a packed temp, then place rows at the canvas pitch
    buf.resize(static_cast<size_t>(h) * w * 3);
    rows.resize(static_cast<size_t>(h));
    for (int y = 0; y < h; ++y) rows[y] = buf.data() + static_cast<size_t>(y) * w * 3;
    png_read_image(png, rows.data());
    for (int y = 0; y < h; ++y)
      std::memcpy(canvas + static_cast<size_t>(y) * canvas_w * 3, rows[y],
                  static_cast<size_t>(w) * 3);
  } else {
    for (int y = 0; y < h; ++y) {
      png_bytep dst = canvas + static_cast<size_t>(y) * canvas_w * 3;
      png_read_row(png, dst, nullptr);
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  *out_h = h;
  *out_w = w;
  return 0;
}

}  // extern "C"
