// mfcnet_native — C++ host-side kernels for the data layer.
//
// The reference's native code (models/sync_bn/inplace_abn CUDA/C++ and the
// CuPy correlation kernels) maps to TPU-native equivalents (GSPMD BatchNorm
// and the Pallas cost-volume kernel). This extension covers the host-side
// hot loops that remain CPU-bound in the data path:
//
//   * compose_mask_{tooltip,toolpose,endovis15}: the left/right pose-map
//     color-channel -> class-ID cascade (reference:
//     utils/dataloader_utils.py:36-85). NumPy needs ~8 full-image boolean
//     passes + temporaries; this is one fused pass per pixel.
//   * window_gather_u8: assemble a (T, H, W, 3) frame window from a list of
//     decoded frames with a single memcpy pass (multi-frame collate).
//
// Built with plain setuptools (CPython C API; no pybind11 dependency).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>

namespace {

struct U8Buf {
  Py_buffer view{};
  const uint8_t* data = nullptr;
  Py_ssize_t len = 0;
  bool ok = false;
  explicit U8Buf(PyObject* obj) {
    if (PyObject_GetBuffer(obj, &view, PyBUF_C_CONTIGUOUS) == 0) {
      data = static_cast<const uint8_t*>(view.buf);
      len = view.len;
      ok = true;
    }
  }
  ~U8Buf() {
    if (ok) PyBuffer_Release(&view);
  }
};

// Shared driver: given two H*W*3 BGR pose maps, write one uint8 class map.
// `fn` maps (bgr_left, bgr_right, has_l, has_r) -> class id.
template <typename Fn>
PyObject* compose(PyObject* args, Fn fn) {
  PyObject *left_obj, *right_obj;
  Py_ssize_t h, w;
  if (!PyArg_ParseTuple(args, "OOnn", &left_obj, &right_obj, &h, &w)) {
    return nullptr;
  }
  U8Buf left(left_obj), right(right_obj);
  if (!left.ok || !right.ok) return nullptr;
  if (left.len < h * w * 3 || right.len < h * w * 3) {
    PyErr_SetString(PyExc_ValueError, "pose map buffer too small");
    return nullptr;
  }
  // has_l / has_r replicate the reference's np.amax gate: a side whose map
  // is entirely zero contributes nothing (dataloader_utils.py:42,45).
  bool has_l = false, has_r = false;
  for (Py_ssize_t i = 0; i < h * w * 3; ++i) {
    if (left.data[i]) { has_l = true; break; }
  }
  for (Py_ssize_t i = 0; i < h * w * 3; ++i) {
    if (right.data[i]) { has_r = true; break; }
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, h * w);
  if (!out) return nullptr;
  uint8_t* dst = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out));
  for (Py_ssize_t i = 0; i < h * w; ++i) {
    const uint8_t* l = left.data + 3 * i;
    const uint8_t* r = right.data + 3 * i;
    dst[i] = fn(l, r, has_l, has_r);
  }
  return out;
}

// tooltip (dataloader_utils.py:37-48): L tips(B>0 or R>0)->255, R->127; /127
PyObject* compose_mask_tooltip(PyObject*, PyObject* args) {
  return compose(args, [](const uint8_t* l, const uint8_t* r, bool hl,
                          bool hr) -> uint8_t {
    // reference order: left writes 255 first, right then overwrites with
    // 127 (dataloader_utils.py:42-47)
    double v = 0;
    if (hl && (l[0] > 0 || l[2] > 0)) v = 255;
    if (hr && (r[0] > 0 || r[2] > 0)) v = 127;
    return static_cast<uint8_t>(v / 127);
  });
}

// toolpose (dataloader_utils.py:66-78). Assignment order matters: within a
// side, B/R channels write first, then G overwrites.
PyObject* compose_mask_toolpose(PyObject*, PyObject* args) {
  return compose(args, [](const uint8_t* l, const uint8_t* r, bool hl,
                          bool hr) -> uint8_t {
    double v = 0;
    if (hl) {
      if (l[0] > 0 || l[2] > 0) v = 255;
      if (l[1] > 0) v = 191;
    }
    if (hr) {
      if (r[0] > 0 || r[2] > 0) v = 127;
      if (r[1] > 0) v = 63;
    }
    return static_cast<uint8_t>(v / 63);
  });
}

// endovis15 (dataloader_utils.py:49-65): thresholds on B/R then exact G
// matches at 255/127/63, left side written first then right overwrites.
PyObject* compose_mask_endovis15(PyObject*, PyObject* args) {
  return compose(args, [](const uint8_t* l, const uint8_t* r, bool hl,
                          bool hr) -> uint8_t {
    double v = 0;
    if (hl) {
      if (l[0] > 0) v = 250;
      if (l[2] > 0) v = 225;
      if (l[1] == 255) v = 200;
      if (l[1] == 127) v = 175;
      if (l[1] == 63) v = 150;
    }
    if (hr) {
      if (r[0] > 0) v = 125;
      if (r[2] > 0) v = 100;
      if (r[1] == 255) v = 75;
      if (r[1] == 127) v = 50;
      if (r[1] == 63) v = 25;
    }
    return static_cast<uint8_t>(v / 25);
  });
}

// window_gather_u8(frames_bytes_list, T, frame_bytes) -> bytes
// Concatenates T equally-sized uint8 frame buffers into one contiguous
// window (the multi-frame collate memcpy pass).
PyObject* window_gather_u8(PyObject*, PyObject* args) {
  PyObject* list_obj;
  Py_ssize_t t, frame_bytes;
  if (!PyArg_ParseTuple(args, "Onn", &list_obj, &t, &frame_bytes)) {
    return nullptr;
  }
  if (!PyList_Check(list_obj) || PyList_Size(list_obj) != t) {
    PyErr_SetString(PyExc_ValueError, "expected list of length T");
    return nullptr;
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, t * frame_bytes);
  if (!out) return nullptr;
  uint8_t* dst = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out));
  for (Py_ssize_t i = 0; i < t; ++i) {
    U8Buf f(PyList_GET_ITEM(list_obj, i));
    if (!f.ok || f.len < frame_bytes) {
      Py_DECREF(out);
      PyErr_SetString(PyExc_ValueError, "bad frame buffer");
      return nullptr;
    }
    std::memcpy(dst + i * frame_bytes, f.data, frame_bytes);
  }
  return out;
}

PyMethodDef kMethods[] = {
    {"compose_mask_tooltip", compose_mask_tooltip, METH_VARARGS,
     "tooltip pose-map pair -> class-ID mask bytes"},
    {"compose_mask_toolpose", compose_mask_toolpose, METH_VARARGS,
     "toolpose pose-map pair -> class-ID mask bytes"},
    {"compose_mask_endovis15", compose_mask_endovis15, METH_VARARGS,
     "endovis15 pose-map pair -> class-ID mask bytes"},
    {"window_gather_u8", window_gather_u8, METH_VARARGS,
     "concatenate T frame buffers into one window"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "mfcnet_native",
    "C++ host-side kernels for the mfcnet_tpu data layer", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_mfcnet_native() { return PyModule_Create(&kModule); }
