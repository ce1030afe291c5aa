"""ctypes loader for the native host library (libapmath.so).

Build with `make native`.  All users degrade gracefully to pure-python when
the library is absent; tests assert parity when present.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libapmath.so")
_lib = None


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ap_field_init.restype = ctypes.c_int
    lib.ap_version.restype = ctypes.c_long
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


CTX_U64S = 2 + 3 * 6


class NativeField:
    """64-bit-limb Montgomery field (host golden reference / fast path)."""

    def __init__(self, modulus: int, nbytes: int):
        lib = load()
        if lib is None:
            raise RuntimeError("libapmath.so not built; run `make native`")
        self.lib = lib
        self.nbytes = nbytes
        self.L = (nbytes + 7) // 8
        self.modulus = modulus
        self.ctx = np.zeros(CTX_U64S, dtype=np.uint64)
        mod_be = np.frombuffer(modulus.to_bytes(nbytes, "big"), dtype=np.uint8)
        rc = lib.ap_field_init(
            mod_be.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            nbytes,
            self.ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        if rc != 0:
            raise RuntimeError("ap_field_init failed")

    def _ptr(self, arr):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))

    def encode(self, values) -> np.ndarray:
        """Canonical ints -> [n, L] u64 little-endian limb array (raw form)."""
        n = len(values)
        out = np.zeros((n, self.L), dtype=np.uint64)
        for i, v in enumerate(values):
            for j in range(self.L):
                out[i, j] = (v >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
        return out

    def decode(self, arr) -> list:
        out = []
        for row in arr:
            v = 0
            for j in range(arr.shape[1]):
                v |= int(row[j]) << (64 * j)
            out.append(v)
        return out

    def _binop(self, fname, a, b):
        n = a.shape[0]
        out = np.zeros_like(a)
        getattr(self.lib, fname)(
            self._ptr(self.ctx), self._ptr(a), self._ptr(b), self._ptr(out),
            ctypes.c_long(n),
        )
        return out

    def mont_mul(self, a, b):
        return self._binop("ap_mont_mul_batch", a, b)

    def add(self, a, b):
        return self._binop("ap_add_batch", a, b)

    def sub(self, a, b):
        return self._binop("ap_sub_batch", a, b)

    def _unop(self, fname, a):
        n = a.shape[0]
        out = np.zeros_like(a)
        getattr(self.lib, fname)(
            self._ptr(self.ctx), self._ptr(a), self._ptr(out), ctypes.c_long(n)
        )
        return out

    def to_mont(self, a):
        return self._unop("ap_to_mont_batch", a)

    def from_mont(self, a):
        return self._unop("ap_from_mont_batch", a)


def be_to_limbs12(be_bytes: bytes, nbytes: int, nlimbs: int) -> np.ndarray:
    """Batch canonical big-endian -> 12-bit device limb arrays."""
    lib = load()
    n = len(be_bytes) // nbytes
    src = np.frombuffer(be_bytes, dtype=np.uint8)
    out = np.zeros((n, nlimbs), dtype=np.int32)
    lib.ap_be_to_limbs12(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nbytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nlimbs,
        ctypes.c_long(n),
    )
    return out


def limbs12_to_be(limbs: np.ndarray, nbytes: int) -> bytes:
    lib = load()
    limbs = np.ascontiguousarray(limbs, dtype=np.int32)
    n, nlimbs = limbs.shape
    out = np.zeros(n * nbytes, dtype=np.uint8)
    lib.ap_limbs12_to_be(
        limbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nlimbs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nbytes,
        ctypes.c_long(n),
    )
    return out.tobytes()
