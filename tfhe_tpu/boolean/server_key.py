"""Boolean server key: gates as linear combinations + one batched sign PBS.

Gate formulas (boolean/engine/mod.rs:558-593 AND et al.):
  AND:  a + b - q/8     OR:  a + b + q/8    XOR: 2(a+b) + q/4
  NAND/NOR/XNOR: negated linear forms; NOT: -a (no PBS);
  MUX(c,a,b) = OR(AND(c,a), AND(not c, b)) — 3 gates, first two batched.

Each gate ends with a sign-extracting PBS (constant q/8 accumulator — the
negacyclic rotation itself produces the +-q/8 output) through the fused
ks_pbs_batch pipeline.  `*_packed` variants run many independent gates in a
single device call (the TPU-native replacement for rayon gate parallelism).
"""

from __future__ import annotations

import secrets

import jax.numpy as jnp
import numpy as np

from ..core import keygen as kg
from ..ops import server as srv
from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator
from .client_key import Ciphertext, ClientKey

Q8 = np.uint64(1 << 61)
Q4 = np.uint64(1 << 62)


class ServerKey:
    def __init__(self, client_key: ClientKey, seed: int | None = None):
        p = client_key.params
        self.params = p
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed ^ 0xA4093822299F31D0,
                                        DeterministicSeeder(seed ^ 0x082EFA98EC4E6C89))
        core = p.core
        ksk = kg.generate_lwe_keyswitch_key(
            client_key.big_lwe_secret_key, client_key.lwe_secret_key,
            core.ks_decomp, p.lwe_noise, gen,
        )
        bsk = kg.generate_lwe_bootstrap_key(
            client_key.lwe_secret_key, client_key.glwe_secret_key,
            core.pbs_decomp, p.glwe_noise, gen,
        )
        bsk_mont, plan = kg.bootstrap_key_to_ntt(bsk)
        self.ksk = jnp.asarray(ksk.data)
        self.bsk_mont = jnp.asarray(bsk_mont)
        self.plan = plan
        # constant sign accumulator: all coefficients q/8, zero mask
        acc = np.zeros((p.glwe_dimension + 1, p.polynomial_size), dtype=np.uint64)
        acc[-1, :] = Q8
        self._sign_lut = acc

    # -- internals ---------------------------------------------------------

    def _bootstrap_batch(self, lin_batch: np.ndarray) -> np.ndarray:
        p = self.params
        b = lin_batch.shape[0]
        n_pad = 1 << (b - 1).bit_length() if b > 1 else 1
        if n_pad != b:
            lin_batch = np.concatenate([lin_batch, np.repeat(lin_batch[:1], n_pad - b, 0)])
        lut_b = jnp.broadcast_to(jnp.asarray(self._sign_lut)[None],
                                 (n_pad,) + self._sign_lut.shape)
        out = srv.ks_pbs_batch(
            jnp.asarray(lin_batch), lut_b, self.ksk, self.bsk_mont, self.plan,
            p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
        )
        return np.asarray(out)[:b]

    def _gate_batch(self, lin_fns: list) -> list:
        """Evaluate a list of prepared linear vectors through one PBS call."""
        batch = np.stack(lin_fns)
        out = self._bootstrap_batch(batch)
        return [Ciphertext(out[i]) for i in range(len(lin_fns))]

    def _materialize(self, ct: Ciphertext) -> np.ndarray:
        """Trivial -> plaintext constant vector (mask 0, body +-q/8)."""
        if ct.trivial is None:
            return np.asarray(ct.data)
        data = np.zeros(self.params.big_lwe_dimension + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            data[-1] = Q8 if ct.trivial else np.uint64(0) - Q8
        return data

    # -- gates -------------------------------------------------------------

    def not_(self, a: Ciphertext) -> Ciphertext:
        if a.trivial is not None:
            return Ciphertext.new_trivial(not a.trivial)
        return Ciphertext(np.zeros_like(np.asarray(a.data)) - np.asarray(a.data))

    @staticmethod
    def _add_body(data: np.ndarray, offset: np.uint64) -> np.ndarray:
        out = np.array(data)
        with np.errstate(over="ignore"):
            out[..., -1] = out[..., -1] + offset
        return out

    def _binary_lin(self, kind: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # wrapping mod 2^64 is the torus semantics; numpy's scalar-overflow
        # warnings on the negated constants are silenced deliberately
        with np.errstate(over="ignore"):
            neg = np.uint64(0) - np.uint64(1)  # -1 (wrapping)
            if kind == "and":
                return self._add_body(a + b, np.uint64(0) - Q8)
            if kind == "or":
                return self._add_body(a + b, Q8)
            if kind == "xor":
                return self._add_body((a + b) * np.uint64(2), Q4)
            if kind == "nand":
                return self._add_body((a + b) * neg, Q8)
            if kind == "nor":
                return self._add_body((a + b) * neg, np.uint64(0) - Q8)
            if kind == "xnor":
                return self._add_body((a + b) * (neg - np.uint64(1)),
                                      np.uint64(0) - Q4)
        raise ValueError(kind)

    _TRIVIAL = {
        "and": lambda x, y: x and y,
        "or": lambda x, y: x or y,
        "xor": lambda x, y: x != y,
        "nand": lambda x, y: not (x and y),
        "nor": lambda x, y: not (x or y),
        "xnor": lambda x, y: x == y,
    }

    def gates_packed(self, kinds: list, lhs: list, rhs: list) -> list:
        """Many independent binary gates in one fused PBS call."""
        outs: list = [None] * len(kinds)
        lin, idx = [], []
        for i, (k, a, b) in enumerate(zip(kinds, lhs, rhs)):
            if a.trivial is not None and b.trivial is not None:
                outs[i] = Ciphertext.new_trivial(self._TRIVIAL[k](a.trivial, b.trivial))
            else:
                lin.append(self._binary_lin(k, self._materialize(a), self._materialize(b)))
                idx.append(i)
        if lin:
            res = self._gate_batch(lin)
            for i, r in zip(idx, res):
                outs[i] = r
        return outs

    def _gate(self, kind: str, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return self.gates_packed([kind], [a], [b])[0]

    def and_(self, a, b):
        return self._gate("and", a, b)

    def or_(self, a, b):
        return self._gate("or", a, b)

    def xor_(self, a, b):
        return self._gate("xor", a, b)

    def nand(self, a, b):
        return self._gate("nand", a, b)

    def nor(self, a, b):
        return self._gate("nor", a, b)

    def xnor(self, a, b):
        return self._gate("xnor", a, b)

    def mux(self, c: Ciphertext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        if c.trivial is not None:
            return a if c.trivial else b
        t1, t2 = self.gates_packed(["and", "and"], [c, self.not_(c)], [a, b])
        return self.or_(t1, t2)
