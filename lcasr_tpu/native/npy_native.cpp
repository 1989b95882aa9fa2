// Native data-loader core: parallel .npy batch reader.
//
// The reference framework's input pipeline rides torch's native DataLoader
// workers (C++ under the hood); this is the lcasr_tpu equivalent for the
// precomputed-spectrogram path (reference lcasr/utils/preprocess.py writes
// one spectrogram file per recording; this repo's data/preprocess.py writes
// .npy).  read_npy_batch(paths, threads) parses the npy headers with the
// GIL held (tiny), then releases the GIL and fans the bulk file reads out
// over a C++ thread pool — a duration-sorted training batch of B podcasts
// loads with B-way I/O parallelism instead of sequentially through Python.
//
// Supported: npy v1/v2, C-order, little-endian descr in {<f4, <f2, <i4,
// <i2, |i1, |u1} (fp16 matches the reference's fp16 .spec.pt artifacts).
// Fortran order or other dtypes raise ValueError.
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  std::string path;
  long data_offset = 0;
  size_t nbytes = 0;
  void* dest = nullptr;  // PyArray data pointer (filled with GIL held)
  std::string error;     // non-empty on failure
};

// Parse "'descr': '<f4', 'fortran_order': False, 'shape': (80, 12345)," from
// the header dict literal.  Returns typenum or -1.
int descr_to_typenum(const std::string& descr) {
  if (descr == "<f4") return NPY_FLOAT32;
  if (descr == "<f2") return NPY_FLOAT16;
  if (descr == "<i4") return NPY_INT32;
  if (descr == "<i2") return NPY_INT16;
  if (descr == "|i1") return NPY_INT8;
  if (descr == "|u1") return NPY_UINT8;
  return -1;
}

bool find_str_value(const std::string& hdr, const char* key, std::string* out) {
  size_t k = hdr.find(key);
  if (k == std::string::npos) return false;
  size_t q1 = hdr.find('\'', k + strlen(key) + 1);
  // value is quoted: 'descr': '<f4'
  size_t colon = hdr.find(':', k);
  if (colon == std::string::npos) return false;
  size_t a = hdr.find('\'', colon);
  if (a == std::string::npos) return false;
  size_t b = hdr.find('\'', a + 1);
  if (b == std::string::npos) return false;
  (void)q1;
  *out = hdr.substr(a + 1, b - a - 1);
  return true;
}

// Parses header; on success fills typenum/shape/data_offset.
bool parse_header(FILE* f, const std::string& path, int* typenum,
                  std::vector<npy_intp>* shape, long* data_offset,
                  std::string* err) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    *err = path + ": not a .npy file";
    return false;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) { *err = path + ": truncated header"; return false; }
    hlen = b[0] | (b[1] << 8);
    *data_offset = 10 + hlen;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { *err = path + ": truncated header"; return false; }
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    *data_offset = 12 + hlen;
  }
  std::string hdr(hlen, '\0');
  if (fread(&hdr[0], 1, hlen, f) != hlen) { *err = path + ": truncated header"; return false; }

  std::string descr;
  if (!find_str_value(hdr, "'descr'", &descr)) { *err = path + ": no descr"; return false; }
  *typenum = descr_to_typenum(descr);
  if (*typenum < 0) { *err = path + ": unsupported descr " + descr; return false; }
  if (hdr.find("'fortran_order': True") != std::string::npos) {
    *err = path + ": fortran_order not supported";
    return false;
  }
  size_t sh = hdr.find("'shape':");
  if (sh == std::string::npos) { *err = path + ": no shape"; return false; }
  size_t open_p = hdr.find('(', sh), close_p = hdr.find(')', sh);
  if (open_p == std::string::npos || close_p == std::string::npos) {
    *err = path + ": bad shape";
    return false;
  }
  std::string dims = hdr.substr(open_p + 1, close_p - open_p - 1);
  shape->clear();
  const char* p = dims.c_str();
  while (*p) {
    while (*p == ' ' || *p == ',') p++;
    if (!*p) break;
    char* end = nullptr;
    long v = strtol(p, &end, 10);
    if (end == p) break;
    shape->push_back((npy_intp)v);
    p = end;
  }
  return true;
}

void read_worker(std::vector<NpyInfo>* jobs, std::atomic<size_t>* next) {
  for (;;) {
    size_t i = next->fetch_add(1);
    if (i >= jobs->size()) return;
    NpyInfo& job = (*jobs)[i];
    if (!job.error.empty() || job.dest == nullptr) continue;
    FILE* f = fopen(job.path.c_str(), "rb");
    if (!f) { job.error = job.path + ": cannot open"; continue; }
    if (fseek(f, job.data_offset, SEEK_SET) != 0) {
      job.error = job.path + ": seek failed";
      fclose(f);
      continue;
    }
    size_t got = fread(job.dest, 1, job.nbytes, f);
    if (got != job.nbytes) job.error = job.path + ": short read";
    fclose(f);
  }
}

PyObject* read_npy_batch(PyObject* self, PyObject* args) {
  PyObject* path_list;
  int n_threads = 4;
  if (!PyArg_ParseTuple(args, "O|i", &path_list, &n_threads)) return nullptr;
  if (!PyList_Check(path_list)) {
    PyErr_SetString(PyExc_TypeError, "expected a list of paths");
    return nullptr;
  }
  Py_ssize_t n = PyList_Size(path_list);
  std::vector<NpyInfo> jobs((size_t)n);
  PyObject* out = PyList_New(n);
  if (!out) return nullptr;

  // pass 1 (GIL held): parse headers, allocate destination arrays
  for (Py_ssize_t i = 0; i < n; i++) {
    PyObject* item = PyList_GetItem(path_list, i);
    const char* cpath = PyUnicode_AsUTF8(item);
    if (!cpath) { Py_DECREF(out); return nullptr; }
    NpyInfo& job = jobs[(size_t)i];
    job.path = cpath;
    FILE* f = fopen(cpath, "rb");
    if (!f) {
      Py_DECREF(out);
      PyErr_Format(PyExc_FileNotFoundError, "%s", cpath);
      return nullptr;
    }
    int typenum = 0;
    std::vector<npy_intp> shape;
    std::string err;
    bool ok = parse_header(f, job.path, &typenum, &shape, &job.data_offset, &err);
    fclose(f);
    if (!ok) {
      Py_DECREF(out);
      PyErr_SetString(PyExc_ValueError, err.c_str());
      return nullptr;
    }
    PyObject* arr = PyArray_SimpleNew((int)shape.size(), shape.data(), typenum);
    if (!arr) { Py_DECREF(out); return nullptr; }
    job.dest = PyArray_DATA((PyArrayObject*)arr);
    job.nbytes = (size_t)PyArray_NBYTES((PyArrayObject*)arr);
    PyList_SET_ITEM(out, i, arr);  // steals ref
  }

  // pass 2 (GIL released): parallel bulk reads
  if (n_threads < 1) n_threads = 1;
  if ((Py_ssize_t)n_threads > n) n_threads = (int)n;
  Py_BEGIN_ALLOW_THREADS
  std::atomic<size_t> next(0);
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(read_worker, &jobs, &next);
  for (auto& th : pool) th.join();
  Py_END_ALLOW_THREADS

  for (auto& job : jobs) {
    if (!job.error.empty()) {
      Py_DECREF(out);
      PyErr_SetString(PyExc_IOError, job.error.c_str());
      return nullptr;
    }
  }
  return out;
}

PyMethodDef methods[] = {
    {"read_npy_batch", read_npy_batch, METH_VARARGS,
     "read_npy_batch(paths, threads=4) -> list[ndarray]; parallel C++ reads"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "npy_native", nullptr, -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_npy_native(void) {
  PyObject* m = PyModule_Create(&moduledef);
  if (!m) return nullptr;
  import_array();
  return m;
}
