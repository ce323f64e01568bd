// C API shim for dlaf_tpu (see dlaf_tpu_c.h): embeds a CPython interpreter
// and dispatches into dlaf_tpu.native.c_entry, which does all the numpy
// buffer wrapping. The analog of the reference's src/c_api/*.cpp layer
// (grid registry src/c_api/grid.cpp:1-93, typed wrappers
// src/c_api/factorization/cholesky.cpp) over the TPU-native library.
//
// Build: make -C dlaf_tpu/native libdlaf_tpu_c.so  (links libpython).
#include "dlaf_tpu_c.h"

#include <Python.h>

#include <dlfcn.h>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

PyThreadState* g_main_tstate = nullptr;
bool g_we_initialized = false;

std::string repo_root() {
  // the package root is two directories above this shared object
  Dl_info info;
  if (dladdr(reinterpret_cast<void*>(&dlaf_initialize), &info) &&
      info.dli_fname) {
    std::string p(info.dli_fname);
    for (int up = 0; up < 3; ++up) {
      auto k = p.find_last_of('/');
      if (k == std::string::npos) break;
      p.erase(k);
    }
    if (!p.empty()) return p;
  }
  return ".";
}

PyObject* entry_module() {
  PyObject* mod = PyImport_ImportModule("dlaf_tpu.native.c_entry");
  if (!mod) PyErr_Print();
  return mod;
}

// Build a Python tuple of 9 ints from a ScaLAPACK descriptor.
PyObject* desc_tuple(const int* desca) {
  PyObject* t = PyTuple_New(9);
  for (int i = 0; i < 9; ++i)
    PyTuple_SET_ITEM(t, i, PyLong_FromLong(desca[i]));
  return t;
}

int call_int(const char* fn, PyObject* args) {
  // takes ownership of args; returns the int result or -1
  int rc = -1;
  PyObject* mod = entry_module();
  if (mod) {
    PyObject* f = PyObject_GetAttrString(mod, fn);
    if (f) {
      PyObject* r = PyObject_CallObject(f, args);
      if (r) {
        rc = static_cast<int>(PyLong_AsLong(r));
        Py_DECREF(r);
      }
      else {
        PyErr_Print();
      }
      Py_DECREF(f);
    }
    Py_DECREF(mod);
  }
  Py_XDECREF(args);
  return rc;
}

}  // namespace

extern "C" {

int dlaf_initialize(void) {
  if (Py_IsInitialized()) {
    // embedding host already runs Python (or we are dlopen'ed from a
    // Python process): still make the package importable and warm it
    PyGILState_STATE g = PyGILState_Ensure();
    std::string root = repo_root();
    std::string code =
        "import sys\n(sys.path.insert(0, '" + root +
        "') if '" + root + "' not in sys.path else None)\n";
    int rc = PyRun_SimpleString(code.c_str());
    PyObject* mod = rc == 0 ? entry_module() : nullptr;
    Py_XDECREF(mod);
    PyGILState_Release(g);
    return (rc == 0 && mod) ? 0 : -1;
  }
  Py_InitializeEx(0);
  if (!Py_IsInitialized()) return -1;
  g_we_initialized = true;
  std::string root = repo_root();
  std::string code = "import sys\nsys.path.insert(0, '" + root + "')\n";
  if (PyRun_SimpleString(code.c_str()) != 0) return -1;
  // import eagerly so the first compute call doesn't pay import latency
  PyObject* mod = entry_module();
  if (!mod) return -1;
  Py_DECREF(mod);
  g_main_tstate = PyEval_SaveThread();
  return 0;
}

int dlaf_finalize(void) {
  if (!g_we_initialized || !Py_IsInitialized()) return 0;
  if (g_main_tstate) PyEval_RestoreThread(g_main_tstate);
  Py_Finalize();
  g_main_tstate = nullptr;
  g_we_initialized = false;
  return 0;
}

int dlaf_create_grid(int nprow, int npcol) {
  PyGILState_STATE g = PyGILState_Ensure();
  int rc = call_int("c_create_grid", Py_BuildValue("(ii)", nprow, npcol));
  PyGILState_Release(g);
  return rc;
}

int dlaf_free_grid(int ctx) {
  PyGILState_STATE g = PyGILState_Ensure();
  int rc = call_int("c_free_grid", Py_BuildValue("(i)", ctx));
  PyGILState_Release(g);
  return rc;
}

static int ppotrf(char uplo, int n, void* a, int ia, int ja, const int* desca,
                  int ctx, const char* dt) {
  PyGILState_STATE g = PyGILState_Ensure();
  char u[2] = {uplo, 0};
  PyObject* args =
      Py_BuildValue("(siKiiNis)", u, n, (unsigned long long)(uintptr_t)a, ia,
                    ja, desc_tuple(desca), ctx, dt);
  int rc = call_int("c_ppotrf", args);
  PyGILState_Release(g);
  return rc;
}

int dlaf_pspotrf(char uplo, int n, float* a, int ia, int ja, const int* desca,
                 int ctx) {
  return ppotrf(uplo, n, a, ia, ja, desca, ctx, "float32");
}

int dlaf_pdpotrf(char uplo, int n, double* a, int ia, int ja,
                 const int* desca, int ctx) {
  return ppotrf(uplo, n, a, ia, ja, desca, ctx, "float64");
}

int dlaf_pcpotrf(char uplo, int n, void* a, int ia, int ja, const int* desca,
                 int ctx) {
  return ppotrf(uplo, n, a, ia, ja, desca, ctx, "complex64");
}

int dlaf_pzpotrf(char uplo, int n, void* a, int ia, int ja, const int* desca,
                 int ctx) {
  return ppotrf(uplo, n, a, ia, ja, desca, ctx, "complex128");
}

static int psyevd(char uplo, int n, void* a, const int* desca, void* w,
                  void* z, int ctx, const char* dt) {
  PyGILState_STATE g = PyGILState_Ensure();
  char u[2] = {uplo, 0};
  PyObject* args = Py_BuildValue(
      "(siKNKKis)", u, n, (unsigned long long)(uintptr_t)a, desc_tuple(desca),
      (unsigned long long)(uintptr_t)w, (unsigned long long)(uintptr_t)z, ctx,
      dt);
  int rc = call_int("c_psyevd", args);
  PyGILState_Release(g);
  return rc;
}

int dlaf_pssyevd(char uplo, int n, float* a, const int* desca, float* w,
                 float* z, int ctx) {
  return psyevd(uplo, n, a, desca, w, z, ctx, "float32");
}

int dlaf_pdsyevd(char uplo, int n, double* a, const int* desca, double* w,
                 double* z, int ctx) {
  return psyevd(uplo, n, a, desca, w, z, ctx, "float64");
}

int dlaf_pcheevd(char uplo, int n, void* a, const int* desca, float* w,
                 void* z, int ctx) {
  return psyevd(uplo, n, a, desca, w, z, ctx, "complex64");
}

int dlaf_pzheevd(char uplo, int n, void* a, const int* desca, double* w,
                 void* z, int ctx) {
  return psyevd(uplo, n, a, desca, w, z, ctx, "complex128");
}

}  // extern "C"
