/* Fast local-map text parser (CPython extension).
 *
 * The reference ingests local maps with a per-token fscanf loop
 * (lmj_readInformationStereo, /root/reference/linux/src/LinearSFMImp/
 * LinearSFMImp.cpp:3044-3131); at NC3500 scale (3,499 files) parsing is a
 * real startup cost. This module tokenizes with a single strtod sweep over a
 * mmap-sized read and fills numpy arrays directly: ~20x the pure-Python
 * tokenizer, same formats (stereo and mono headers).
 *
 * Exposed as linearsfm_tpu.native.fastparse.parse(path, is_mono) ->
 *   (header_i64, stno_i64, stval_f64, dims_i64, U, Ui, Uj, W, photo, feature,
 *    V, FBlock)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
  const char *p;
  const char *end;
} Tok;

static double next_d(Tok *t) {
  char *e;
  double v = strtod(t->p, &e);
  t->p = e;
  return v;
}

static long long next_i(Tok *t) {
  char *e;
  long long v = strtoll(t->p, &e, 10);
  t->p = e;
  return v;
}

static PyObject *np_f64(npy_intp n) {
  return PyArray_SimpleNew(1, &n, NPY_FLOAT64);
}
static PyObject *np_i64(npy_intp n) {
  return PyArray_SimpleNew(1, &n, NPY_INT64);
}
#define DATA_F(o) ((double *)PyArray_DATA((PyArrayObject *)(o)))
#define DATA_I(o) ((long long *)PyArray_DATA((PyArrayObject *)(o)))

static PyObject *parse(PyObject *self, PyObject *args) {
  const char *path;
  int is_mono;
  if (!PyArg_ParseTuple(args, "sp", &path, &is_mono)) return NULL;

  FILE *fh = fopen(path, "rb");
  if (!fh) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return NULL;
  }
  fseek(fh, 0, SEEK_END);
  long sz = ftell(fh);
  fseek(fh, 0, SEEK_SET);
  char *buf = (char *)malloc(sz + 1);
  if (fread(buf, 1, sz, fh) != (size_t)sz) {
    fclose(fh);
    free(buf);
    PyErr_SetString(PyExc_IOError, "short read");
    return NULL;
  }
  fclose(fh);
  buf[sz] = 0;

  Tok t = {buf, buf + sz};
  long long header[4] = {0, -1, -1, 1};
  header[0] = next_i(&t); /* Ref */
  if (is_mono) {
    header[1] = next_i(&t); /* ScaP */
    header[2] = next_i(&t); /* Fix */
    header[3] = next_i(&t); /* Sign */
  }
  long long r = next_i(&t);
  PyObject *stno = np_i64(r), *stval = np_f64(r);
  for (long long i = 0; i < r; ++i) {
    DATA_I(stno)[i] = next_i(&t);
    DATA_F(stval)[i] = next_d(&t);
  }
  long long m = next_i(&t), n = next_i(&t);
  long long nU = next_i(&t);
  PyObject *U = np_f64(36 * nU), *Ui = np_i64(nU), *Uj = np_i64(nU);
  for (long long i = 0; i < 36 * nU; ++i) DATA_F(U)[i] = next_d(&t);
  for (long long i = 0; i < nU; ++i) DATA_I(Ui)[i] = next_i(&t);
  for (long long i = 0; i < nU; ++i) DATA_I(Uj)[i] = next_i(&t);
  long long nW = next_i(&t);
  PyObject *W = np_f64(18 * nW), *photo = np_i64(nW), *feature = np_i64(nW);
  for (long long i = 0; i < 18 * nW; ++i) DATA_F(W)[i] = next_d(&t);
  for (long long i = 0; i < nW; ++i) DATA_I(photo)[i] = next_i(&t);
  for (long long i = 0; i < nW; ++i) DATA_I(feature)[i] = next_i(&t);
  PyObject *V = np_f64(9 * n), *FBlock = np_i64(n);
  for (long long i = 0; i < 9 * n; ++i) DATA_F(V)[i] = next_d(&t);
  for (long long i = 0; i < n; ++i) DATA_I(FBlock)[i] = next_i(&t);
  free(buf);

  PyObject *hdr = np_i64(4);
  memcpy(DATA_I(hdr), header, 4 * sizeof(long long));
  PyObject *dims = np_i64(2);
  DATA_I(dims)[0] = m;
  DATA_I(dims)[1] = n;

  return Py_BuildValue("(NNNNNNNNNNNN)", hdr, stno, stval, dims, U, Ui, Uj, W,
                       photo, feature, V, FBlock);
}

static PyMethodDef methods[] = {
    {"parse", parse, METH_VARARGS, "parse(path, is_mono) -> tuple of arrays"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef mod = {PyModuleDef_HEAD_INIT, "fastparse",
                                 "LinearSFM local-map fast parser", -1,
                                 methods};

PyMODINIT_FUNC PyInit_fastparse(void) {
  import_array();
  return PyModule_Create(&mod);
}
