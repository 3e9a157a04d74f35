#!/bin/bash
# Build the C API shared library + test binary and run it
# (scripts/c_api_tests.sh analog).
set -e
cd "$(dirname "$0")"
PY=python3
CFLAGS=$($PY -c "import sysconfig; print('-I' + sysconfig.get_paths()['include'])")
LDFLAGS=$($PY -c "import sysconfig, os; lib = sysconfig.get_config_var('LIBDIR'); v = sysconfig.get_config_var('LDVERSION'); print(f'-L{lib} -lpython{v}')")
gcc -shared -fPIC $CFLAGS tfhe_c.c -o libtfhe_tpu_c.so $LDFLAGS
gcc $CFLAGS test_c_api.c -o test_c_api -L. -ltfhe_tpu_c $LDFLAGS -Wl,-rpath,"$PWD"
# the axon TPU plugin only resolves from the repo root; CPU is fine for the
# C-surface test
JAX_PLATFORMS=cpu PYTHONPATH=$(dirname "$PWD") ./test_c_api
