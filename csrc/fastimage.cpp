// fastimage — native JPEG decode + crop + resize + normalize for the host
// data pipeline.
//
// The reference's input hot path is torch DataLoader workers running
// PIL decode -> torchvision RandomResizedCrop -> normalize
// (deps/open_clip/src/training/data.py:35-53, open_clip/transform.py:274).
// This extension fuses the whole per-sample pipeline into one C++ pass:
// libjpeg decode (with DCT-domain prescaling: scale_denom lets us decode
// directly to ~the crop resolution), bilinear crop+resize, and
// mean/std normalization into a float32 HWC buffer. Exposed via the raw
// CPython C API (no pybind11 in this image); see
// xclip_tpu/data/fastimage.py for the Python wrapper and PIL fallback.

#include <Python.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG byte buffer to RGB. Uses libjpeg's scale_num/scale_denom to
// decode at reduced resolution when the target is much smaller than the
// source (large win: IDCT cost scales with output size).
bool decode_jpeg(const uint8_t* data, size_t size, int min_dim_hint,
                 std::vector<uint8_t>* out, int* width, int* height) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;

  if (min_dim_hint > 0) {
    // choose the largest denominator that keeps min(dim) >= hint
    int src_min = std::min<int>(cinfo.image_width, cinfo.image_height);
    for (int denom : {8, 4, 2}) {
      if (src_min / denom >= min_dim_hint) {
        cinfo.scale_num = 1;
        cinfo.scale_denom = denom;
        break;
      }
    }
  }

  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int stride = cinfo.output_width * cinfo.output_components;
  out->resize(static_cast<size_t>(stride) * cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  if (cinfo.output_components != 3) {
    // expand grayscale to RGB
    if (cinfo.output_components == 1) {
      std::vector<uint8_t> rgb(static_cast<size_t>(*width) * *height * 3);
      for (size_t i = 0; i < static_cast<size_t>(*width) * *height; ++i) {
        rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = (*out)[i];
      }
      out->swap(rgb);
    } else {
      return false;
    }
  }
  return true;
}

// Bilinear sample of crop box [y0, y0+ch) x [x0, x0+cw) resized to
// out_h x out_w, normalized to (v/255 - mean)/std, float32 HWC output.
void crop_resize_normalize(const uint8_t* src, int src_w, int src_h,
                           double x0, double y0, double cw, double ch,
                           int out_w, int out_h, const float* mean,
                           const float* inv_std, float* dst) {
  const double sx = cw / out_w;
  const double sy = ch / out_h;
  for (int oy = 0; oy < out_h; ++oy) {
    // pixel-center mapping (matches PIL's affine convention closely)
    double fy = y0 + (oy + 0.5) * sy - 0.5;
    fy = std::min(std::max(fy, 0.0), static_cast<double>(src_h - 1));
    int y1 = static_cast<int>(fy);
    int y2 = std::min(y1 + 1, src_h - 1);
    float wy = static_cast<float>(fy - y1);
    for (int ox = 0; ox < out_w; ++ox) {
      double fx = x0 + (ox + 0.5) * sx - 0.5;
      fx = std::min(std::max(fx, 0.0), static_cast<double>(src_w - 1));
      int x1 = static_cast<int>(fx);
      int x2 = std::min(x1 + 1, src_w - 1);
      float wx = static_cast<float>(fx - x1);
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * src_w + x1) * 3;
      const uint8_t* p12 = src + (static_cast<size_t>(y1) * src_w + x2) * 3;
      const uint8_t* p21 = src + (static_cast<size_t>(y2) * src_w + x1) * 3;
      const uint8_t* p22 = src + (static_cast<size_t>(y2) * src_w + x2) * 3;
      float* out_px = dst + (static_cast<size_t>(oy) * out_w + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p11[c] + wx * (p12[c] - p11[c]);
        float bot = p21[c] + wx * (p22[c] - p21[c]);
        float v = (top + wy * (bot - top)) * (1.0f / 255.0f);
        out_px[c] = (v - mean[c]) * inv_std[c];
      }
    }
  }
}

// Same bilinear resample, but emits rounded uint8 (no normalize): the
// post-resize quantization matches the reference PIL pipeline, whose
// resize returns uint8 before ToTensor()/Normalize. Used for on-device
// normalization (4x smaller host->device transfers).
void crop_resize_u8(const uint8_t* src, int src_w, int src_h,
                    double x0, double y0, double cw, double ch,
                    int out_w, int out_h, uint8_t* dst) {
  const double sx = cw / out_w;
  const double sy = ch / out_h;
  for (int oy = 0; oy < out_h; ++oy) {
    double fy = y0 + (oy + 0.5) * sy - 0.5;
    fy = std::min(std::max(fy, 0.0), static_cast<double>(src_h - 1));
    int y1 = static_cast<int>(fy);
    int y2 = std::min(y1 + 1, src_h - 1);
    float wy = static_cast<float>(fy - y1);
    for (int ox = 0; ox < out_w; ++ox) {
      double fx = x0 + (ox + 0.5) * sx - 0.5;
      fx = std::min(std::max(fx, 0.0), static_cast<double>(src_w - 1));
      int x1 = static_cast<int>(fx);
      int x2 = std::min(x1 + 1, src_w - 1);
      float wx = static_cast<float>(fx - x1);
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * src_w + x1) * 3;
      const uint8_t* p12 = src + (static_cast<size_t>(y1) * src_w + x2) * 3;
      const uint8_t* p21 = src + (static_cast<size_t>(y2) * src_w + x1) * 3;
      const uint8_t* p22 = src + (static_cast<size_t>(y2) * src_w + x2) * 3;
      uint8_t* out_px = dst + (static_cast<size_t>(oy) * out_w + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p11[c] + wx * (p12[c] - p11[c]);
        float bot = p21[c] + wx * (p22[c] - p21[c]);
        float v = top + wy * (bot - top);
        int q = static_cast<int>(v + 0.5f);
        out_px[c] = static_cast<uint8_t>(std::min(std::max(q, 0), 255));
      }
    }
  }
}

// decode_crop_resize(data: bytes, x0, y0, cw, ch, out_w, out_h,
//                    mean3, std3) -> (bytes_f32_hwc, src_w, src_h)
// Negative crop box => full image. Crop coords are in ORIGINAL image
// coordinates; DCT-domain prescale is applied whenever the crop is much
// larger than the output, and the box is rescaled to the decoded frame.
PyObject* decode_crop_resize_impl(PyObject* args, bool u8_out) {
  Py_buffer buf;
  double x0, y0, cw, ch;
  int out_w, out_h;
  float mean[3] = {0.f, 0.f, 0.f}, stdv[3] = {1.f, 1.f, 1.f};
  if (u8_out) {
    if (!PyArg_ParseTuple(args, "y*ddddii", &buf, &x0, &y0, &cw, &ch,
                          &out_w, &out_h)) {
      return nullptr;
    }
  } else if (!PyArg_ParseTuple(args, "y*ddddii(fff)(fff)", &buf, &x0, &y0, &cw, &ch,
                        &out_w, &out_h, &mean[0], &mean[1], &mean[2],
                        &stdv[0], &stdv[1], &stdv[2])) {
    return nullptr;
  }

  // prescale hint: never decode more resolution than ~2x what the
  // crop->output resampling needs. For the full image decode_jpeg derives
  // the denom from min(dim) directly; for a crop the constraint is on the
  // *crop* size, so the denom is computed here from a header probe and
  // re-expressed as a full-image min_dim hint.
  int hint = (x0 < 0) ? std::max(out_w, out_h) * 2 : 0;

  std::vector<uint8_t> rgb;
  int src_w = 0, src_h = 0;
  int orig_w = 0, orig_h = 0;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  if (x0 >= 0) {
    // header probe to learn the original size for denom computation
    jpeg_decompress_struct cinfo;
    ErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit;
    if (!setjmp(jerr.setjmp_buffer)) {
      jpeg_create_decompress(&cinfo);
      jpeg_mem_src(&cinfo, static_cast<uint8_t*>(buf.buf), buf.len);
      if (jpeg_read_header(&cinfo, TRUE) == JPEG_HEADER_OK) {
        orig_w = cinfo.image_width;
        orig_h = cinfo.image_height;
      }
      jpeg_destroy_decompress(&cinfo);
    }
    if (orig_w > 0) {
      double crop_min = std::min(cw, ch);
      int target = std::max(out_w, out_h) * 2;
      for (int denom : {8, 4, 2}) {
        if (crop_min / denom >= target) {
          // express as a min_dim hint on the full image that yields this denom
          int src_min = std::min(orig_w, orig_h);
          hint = src_min / denom;  // decode_jpeg picks the largest denom with
                                   // src_min/denom >= hint, i.e. this denom
          break;
        }
      }
    }
  }
  ok = decode_jpeg(static_cast<const uint8_t*>(buf.buf), buf.len, hint, &rgb,
                   &src_w, &src_h);
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "fastimage: JPEG decode failed");
    return nullptr;
  }
  PyBuffer_Release(&buf);

  if (x0 < 0) {  // full image
    x0 = 0;
    y0 = 0;
    cw = src_w;
    ch = src_h;
  } else if (orig_w > 0 && src_w != orig_w) {
    // crop box given in original coords; rescale into the prescaled frame
    double sx = static_cast<double>(src_w) / orig_w;
    double sy = static_cast<double>(src_h) / orig_h;
    x0 *= sx; cw *= sx;
    y0 *= sy; ch *= sy;
  }
  float inv_std[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};

  PyObject* out_bytes = PyBytes_FromStringAndSize(
      nullptr, static_cast<Py_ssize_t>(out_w) * out_h * 3 * (u8_out ? 1 : 4));
  if (!out_bytes) return nullptr;
  Py_BEGIN_ALLOW_THREADS;
  if (u8_out) {
    crop_resize_u8(rgb.data(), src_w, src_h, x0, y0, cw, ch, out_w, out_h,
                   reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out_bytes)));
  } else {
    crop_resize_normalize(rgb.data(), src_w, src_h, x0, y0, cw, ch, out_w, out_h,
                          mean, inv_std,
                          reinterpret_cast<float*>(PyBytes_AS_STRING(out_bytes)));
  }
  Py_END_ALLOW_THREADS;
  return Py_BuildValue("(Nii)", out_bytes, src_w, src_h);
}

PyObject* py_decode_crop_resize(PyObject*, PyObject* args) {
  return decode_crop_resize_impl(args, false);
}

PyObject* py_decode_crop_resize_u8(PyObject*, PyObject* args) {
  return decode_crop_resize_impl(args, true);
}

// probe_size(data: bytes) -> (w, h): header-only size read for computing
// RandomResizedCrop boxes before decoding.
PyObject* py_probe_size(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "fastimage: bad JPEG header");
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, static_cast<uint8_t*>(buf.buf), buf.len);
  jpeg_read_header(&cinfo, TRUE);
  int w = cinfo.image_width, h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  PyBuffer_Release(&buf);
  return Py_BuildValue("(ii)", w, h);
}

PyMethodDef methods[] = {
    {"decode_crop_resize", py_decode_crop_resize, METH_VARARGS,
     "JPEG decode + crop + bilinear resize + normalize -> float32 HWC bytes"},
    {"decode_crop_resize_u8", py_decode_crop_resize_u8, METH_VARARGS,
     "JPEG decode + crop + bilinear resize -> uint8 HWC bytes (no normalize)"},
    {"probe_size", py_probe_size, METH_VARARGS, "JPEG header size probe"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_fastimage",
                      "native JPEG decode/resize pipeline", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__fastimage(void) { return PyModule_Create(&module); }
