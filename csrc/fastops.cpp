/* fastops: native host-side data-pipeline kernels.
 *
 * The reference feeds its models from torch DataLoader worker processes
 * computing per-item numpy transforms (moving-average envelope via
 * np.apply_along_axis + np.convolve, /root/reference/tqdne/
 * representation.py:41-60; validity scans as per-sample Python loops in
 * scripts/preprocessing/05_raw_data_filter_indices.py).  This extension
 * gives the TPU input pipeline C++/OpenMP equivalents so batch
 * preparation never starves the accelerator:
 *
 *   envelope_representation: fused |x| -> sliding-mean envelope ->
 *       (waveform/(env+eps), log(env+log_eps)-log(log_eps)/2), the
 *       MovingAverageEnvelope forward, one pass, parallel over traces.
 *   validity_indices: last-oscillating-sample scan (zero-crossing
 *       windows with adaptive threshold), parallel over records.
 *   transpose_scrub: (B, T, C) -> (B, C, T) with NaN/Inf scrubbing
 *       (build_dataset's rearrange + nan_to_num in one pass).
 *
 * Exposed via the CPython C API (no pybind11 in the image); the Python
 * callers in tqdne_tpu.data fall back to numpy when the extension is
 * not built.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Sliding mean of |x| with np.convolve(..., 'same') window placement:
// window [i - w/2, i + w - w/2 - 1], zero-padded, divided by w.
void envelope_1d(const float* x, double* env, int64_t n, int w) {
  const int left = w / 2;
  const int right = w - left - 1;
  double acc = 0.0;
  // prime: window for i = 0 covers [-left, right] -> [0, right]
  for (int64_t j = 0; j <= std::min<int64_t>(right, n - 1); ++j) acc += std::fabs(x[j]);
  for (int64_t i = 0; i < n; ++i) {
    env[i] = acc / w;
    const int64_t add = i + right + 1;
    const int64_t drop = i - left;
    if (add < n) acc += std::fabs(x[add]);
    if (drop >= 0) acc -= std::fabs(x[drop]);
  }
}

PyObject* envelope_representation(PyObject*, PyObject* args) {
  PyObject* in_obj;
  int window = 128;
  double log_eps = 1e-6, eps = 1e-6;
  if (!PyArg_ParseTuple(args, "O|idd", &in_obj, &window, &log_eps, &eps)) return nullptr;

  PyArrayObject* in = (PyArrayObject*)PyArray_FROM_OTF(
      in_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!in) return nullptr;
  if (PyArray_NDIM(in) != 3) {
    Py_DECREF(in);
    PyErr_SetString(PyExc_ValueError, "expected (N, C, T) float32 array");
    return nullptr;
  }
  const npy_intp n = PyArray_DIM(in, 0), c = PyArray_DIM(in, 1), t = PyArray_DIM(in, 2);
  npy_intp out_dims[3] = {n, 2 * c, t};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(3, out_dims, NPY_FLOAT32);
  if (!out) {
    Py_DECREF(in);
    return nullptr;
  }
  const float* src = (const float*)PyArray_DATA(in);
  float* dst = (float*)PyArray_DATA(out);
  const double half_log_le = 0.5 * std::log(log_eps);

  Py_BEGIN_ALLOW_THREADS
#pragma omp parallel
  {
    std::vector<double> env(t);
#pragma omp for collapse(2) schedule(static)
    for (npy_intp b = 0; b < n; ++b) {
      for (npy_intp ch = 0; ch < c; ++ch) {
        const float* xs = src + (b * c + ch) * t;
        float* scaled = dst + (b * 2 * c + ch) * t;
        float* logenv = dst + (b * 2 * c + c + ch) * t;
        envelope_1d(xs, env.data(), t, window);
        for (npy_intp i = 0; i < t; ++i) {
          scaled[i] = (float)(xs[i] / (env[i] + eps));
          logenv[i] = (float)(std::log(env[i] + log_eps) - half_log_le);
        }
      }
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(in);
  return (PyObject*)out;
}

// last-oscillating-sample for one trace (quality.py semantics)
int64_t last_oscillating(const float* x, int64_t t, int window, int min_crossings) {
  if (t <= 2 * window) return t / 2;
  float peak = 0.f;
  for (int64_t i = 0; i < t; ++i) peak = std::max(peak, std::fabs(x[i]));
  const float thr = std::max(1e-10f, peak * 0.001f);

  // sign-change markers vs previous nonzero sign
  std::vector<uint8_t> change(t, 0);
  int prev_sign = 0;
  for (int64_t i = 0; i < t; ++i) {
    int s = (x[i] > thr) ? 1 : (x[i] < -thr ? -1 : 0);
    if (s != 0) {
      if (prev_sign != 0 && s != prev_sign) change[i] = 1;
      prev_sign = s;
    }
  }
  // scan windows from the end
  int count = 0;
  for (int64_t i = t - window; i < t; ++i) count += change[i];
  for (int64_t start = t - window;; --start) {
    if (count >= min_crossings) return start + window - 1;
    if (start == 0) break;
    count += change[start - 1];
    count -= change[start + window - 1];
  }
  return t / 2;
}

PyObject* validity_indices(PyObject*, PyObject* args) {
  PyObject* in_obj;
  int window = 20, min_crossings = 2;
  if (!PyArg_ParseTuple(args, "O|ii", &in_obj, &window, &min_crossings)) return nullptr;
  PyArrayObject* in = (PyArrayObject*)PyArray_FROM_OTF(
      in_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!in) return nullptr;
  if (PyArray_NDIM(in) != 3) {
    Py_DECREF(in);
    PyErr_SetString(PyExc_ValueError, "expected (N, C, T) float32 array");
    return nullptr;
  }
  const npy_intp n = PyArray_DIM(in, 0), c = PyArray_DIM(in, 1), t = PyArray_DIM(in, 2);
  npy_intp out_dims[1] = {n};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(1, out_dims, NPY_INT64);
  const float* src = (const float*)PyArray_DATA(in);
  int64_t* dst = (int64_t*)PyArray_DATA(out);

  Py_BEGIN_ALLOW_THREADS
#pragma omp parallel for schedule(static)
  for (npy_intp b = 0; b < n; ++b) {
    int64_t best = 0;
    for (npy_intp ch = 0; ch < c; ++ch) {
      best = std::max(best, last_oscillating(src + (b * c + ch) * t, t, window, min_crossings));
    }
    dst[b] = best;
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(in);
  return (PyObject*)out;
}

PyObject* transpose_scrub(PyObject*, PyObject* args) {
  PyObject* in_obj;
  if (!PyArg_ParseTuple(args, "O", &in_obj)) return nullptr;
  PyArrayObject* in = (PyArrayObject*)PyArray_FROM_OTF(
      in_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!in) return nullptr;
  if (PyArray_NDIM(in) != 3) {
    Py_DECREF(in);
    PyErr_SetString(PyExc_ValueError, "expected (B, T, C) float32 array");
    return nullptr;
  }
  const npy_intp b = PyArray_DIM(in, 0), t = PyArray_DIM(in, 1), c = PyArray_DIM(in, 2);
  npy_intp out_dims[3] = {b, c, t};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(3, out_dims, NPY_FLOAT32);
  const float* src = (const float*)PyArray_DATA(in);
  float* dst = (float*)PyArray_DATA(out);

  Py_BEGIN_ALLOW_THREADS
#pragma omp parallel for collapse(2) schedule(static)
  for (npy_intp i = 0; i < b; ++i) {
    for (npy_intp ch = 0; ch < c; ++ch) {
      const float* s = src + i * t * c + ch;
      float* d = dst + (i * c + ch) * t;
      for (npy_intp j = 0; j < t; ++j) {
        float v = s[j * c];
        d[j] = std::isfinite(v) ? v : 0.0f;
      }
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(in);
  return (PyObject*)out;
}

PyMethodDef methods[] = {
    {"envelope_representation", envelope_representation, METH_VARARGS,
     "Fused MovingAverageEnvelope forward: (N,C,T) f32 -> (N,2C,T) f32."},
    {"validity_indices", validity_indices, METH_VARARGS,
     "Last-oscillating-sample validity index per record: (N,C,T) f32 -> (N,) i64."},
    {"transpose_scrub", transpose_scrub, METH_VARARGS,
     "(B,T,C) f32 -> (B,C,T) f32 with NaN/Inf -> 0."},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastops",
    "Native host-side data-pipeline kernels (OpenMP).", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastops(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
