/* C API implementation: embeds the CPython runtime hosting the JAX/TPU
 * compute core (the reference wraps its Rust core with cbindgen; here the
 * native boundary is the CPython C API).  Thread-safety: calls grab the GIL.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include "tfhe_c.h"

static PyObject *g_mod_hlapi = NULL;

int tfhe_c_init(void) {
    if (Py_IsInitialized()) return 0;
    Py_Initialize();
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *mod = PyImport_ImportModule("tfhe_tpu");
    if (!mod) { PyErr_Print(); PyGILState_Release(st); return 1; }
    g_mod_hlapi = mod;
    PyGILState_Release(st);
    return 0;
}

int tfhe_c_deinit(void) {
    if (!Py_IsInitialized()) return 0;
    Py_XDECREF(g_mod_hlapi);
    g_mod_hlapi = NULL;
    return Py_FinalizeEx() == 0 ? 0 : 1;
}

static int call_store(PyObject *res, void **out) {
    if (!res) { PyErr_Print(); return 1; }
    *out = (void *)res; /* handle = owned PyObject* */
    return 0;
}

int tfhe_generate_keys(int config_kind, uint64_t seed,
                       TfheClientKey **client_key, TfheServerKey **server_key) {
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = 1;
    PyObject *code = PyUnicode_FromFormat(
        "import tfhe_tpu as t\n"
        "from tfhe_tpu import shortint\n"
        "_p = shortint.TEST_PARAM_MESSAGE_2_CARRY_2 if %d == 0 else shortint.DEFAULT_PARAMS\n"
        "_cfg = t.ConfigBuilder().use_custom_parameters(_p).build()\n"
        "_ck, _sk = t.generate_keys(_cfg, seed=%llu)\n",
        config_kind, (unsigned long long)seed);
    PyObject *globals = PyDict_New();
    PyDict_SetItemString(globals, "__builtins__", PyEval_GetBuiltins());
    PyObject *r = PyRun_String(PyUnicode_AsUTF8(code), Py_file_input, globals, globals);
    if (r) {
        PyObject *ck = PyDict_GetItemString(globals, "_ck");
        PyObject *sk = PyDict_GetItemString(globals, "_sk");
        if (ck && sk) {
            Py_INCREF(ck); Py_INCREF(sk);
            *client_key = (TfheClientKey *)ck;
            *server_key = (TfheServerKey *)sk;
            rc = 0;
        }
        Py_DECREF(r);
    } else {
        PyErr_Print();
    }
    Py_DECREF(globals);
    Py_DECREF(code);
    PyGILState_Release(st);
    return rc;
}

int tfhe_set_server_key(TfheServerKey *server_key) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(g_mod_hlapi, "set_server_key", "O",
                                      (PyObject *)server_key);
    PyGILState_Release(st);
    if (!r) { PyErr_Print(); return 1; }
    Py_DECREF(r);
    return 0;
}

static int destroy(void *h) {
    if (!h) return 0;
    PyGILState_STATE st = PyGILState_Ensure();
    Py_DECREF((PyObject *)h);
    PyGILState_Release(st);
    return 0;
}

int tfhe_client_key_destroy(TfheClientKey *k) { return destroy(k); }
int tfhe_server_key_destroy(TfheServerKey *k) { return destroy(k); }
int tfhe_fheuint8_destroy(TfheFheUint8 *c) { return destroy(c); }

int tfhe_fheuint8_try_encrypt_with_client_key_u8(uint8_t value,
                                                 TfheClientKey *key,
                                                 TfheFheUint8 **out) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *cls = PyObject_GetAttrString(g_mod_hlapi, "FheUint8");
    PyObject *r = cls ? PyObject_CallMethod(cls, "encrypt", "iO", (int)value,
                                            (PyObject *)key) : NULL;
    Py_XDECREF(cls);
    int rc = call_store(r, (void **)out);
    PyGILState_Release(st);
    return rc;
}

int tfhe_fheuint8_decrypt(TfheFheUint8 *ct, TfheClientKey *key, uint8_t *out) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod((PyObject *)ct, "decrypt", "O",
                                      (PyObject *)key);
    int rc = 1;
    if (r) {
        long v = PyLong_AsLong(r);
        if (v != -1 || !PyErr_Occurred()) { *out = (uint8_t)v; rc = 0; }
        Py_DECREF(r);
    } else {
        PyErr_Print();
    }
    PyGILState_Release(st);
    return rc;
}

static int binop(void *lhs, void *rhs, const char *name, void **out) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod((PyObject *)lhs, name, "O",
                                      (PyObject *)rhs);
    int rc = call_store(r, out);
    PyGILState_Release(st);
    return rc;
}

int tfhe_fheuint8_add(TfheFheUint8 *a, TfheFheUint8 *b, TfheFheUint8 **o)
{ return binop(a, b, "__add__", (void **)o); }
int tfhe_fheuint8_sub(TfheFheUint8 *a, TfheFheUint8 *b, TfheFheUint8 **o)
{ return binop(a, b, "__sub__", (void **)o); }
int tfhe_fheuint8_mul(TfheFheUint8 *a, TfheFheUint8 *b, TfheFheUint8 **o)
{ return binop(a, b, "__mul__", (void **)o); }
int tfhe_fheuint8_bitand(TfheFheUint8 *a, TfheFheUint8 *b, TfheFheUint8 **o)
{ return binop(a, b, "__and__", (void **)o); }
int tfhe_fheuint8_eq(TfheFheUint8 *a, TfheFheUint8 *b, TfheFheUint8 **o)
{ return binop(a, b, "eq", (void **)o); }

int tfhe_fheuint8_scalar_add(TfheFheUint8 *a, uint8_t s, TfheFheUint8 **o) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod((PyObject *)a, "__add__", "i", (int)s);
    int rc = call_store(r, (void **)o);
    PyGILState_Release(st);
    return rc;
}
