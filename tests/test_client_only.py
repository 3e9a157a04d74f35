"""Client-only (no-JAX) import test: the client role — keygen, encrypt,
decrypt, compact-list encryption, ZK prove, serialization — must work with
jax completely unavailable (the WASM/Pyodide client story; reference
capability: tfhe/src/js_on_wasm_api/)."""

import subprocess
import sys

SCRIPT = r"""
import sys

import importlib.abc

class _JaxBlocker(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name == "jax" or name.startswith(("jax.", "jaxlib")):
            raise ImportError(f"jax blocked for client-only test ({name})")
        return None

sys.meta_path.insert(0, _JaxBlocker())
for m in list(sys.modules):
    if m == "jax" or m.startswith(("jax.", "jaxlib")):
        del sys.modules[m]

import tfhe_tpu as t
assert not t._HAS_JAX

# shortint client: keygen + encrypt + decrypt (no server, no jax)
ck = t.ShortintClientKey(t.TEST_PARAM_MESSAGE_2_CARRY_2, seed=42)
ct = ck.encrypt(3)
assert ck.decrypt(ct) == 3

# integer client: radix encrypt/decrypt
ick = t.IntegerClientKey(t.TEST_PARAM_MESSAGE_2_CARRY_2, seed=42)
r = ick.encrypt_radix(123, 4)
assert ick.decrypt_radix(r) == 123

# serialization round-trip
blob = t.safe_serialize(ct)
ct2 = t.safe_deserialize(blob)
assert ck.decrypt(ct2) == 3

# ZK machinery (client proves): CRS generation + curve arithmetic, no jax
from tfhe_tpu.zk import curve446 as cv
from tfhe_tpu.zk import pke
crs = pke.crs_gen(16, 2, 64, 0, 8, 1, seed=7)
p1 = cv.g1_mul(cv.G1_GEN, 12345)
assert cv.g1_is_on_curve(p1)
print("CLIENT-ONLY OK")
"""


def test_client_role_imports_without_jax():
    out = subprocess.run([sys.executable, "-c", SCRIPT], capture_output=True,
                         text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CLIENT-ONLY OK" in out.stdout
