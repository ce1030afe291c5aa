"""Host-side conversions between integers, bytes, and device limb arrays.

Device representation: ``[..., L]`` int32 arrays, little-endian 12-bit limbs
(see fields/params.py).  These converters are vectorized numpy; the byte-level
canonical encodings (big-endian, gnark-compatible) live in host/serialize.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import numpy as np

from .params import LIMB_BITS, LIMB_MASK, FieldParams

assert LIMB_BITS == 12, "byte packing below assumes 12-bit limbs"


def le_bytes_needed(nlimbs: int) -> int:
    return (nlimbs * LIMB_BITS + 7) // 8


def _native():
    try:
        from .. import native

        return native if native.available() else None
    except Exception:  # pragma: no cover
        return None


def ints_to_limbs(values: Sequence[int] | Iterable[int], fp: FieldParams) -> np.ndarray:
    """Pack python ints (canonical, NOT Montgomery) into [N, L] int32 limbs."""
    values = list(values)
    n = len(values)
    nat = _native() if n >= 1024 else None
    if nat is not None:
        be = b"".join(v.to_bytes(fp.nbytes, "big") for v in values)
        return nat.be_to_limbs12(be, fp.nbytes, fp.nlimbs)
    nbytes = le_bytes_needed(fp.nlimbs)
    buf = b"".join(v.to_bytes(nbytes, "little") for v in values)
    le = np.frombuffer(buf, dtype=np.uint8).reshape(n, nbytes).astype(np.int32)
    return _le_bytes_to_limbs(le, fp.nlimbs)


def _le_bytes_to_limbs(le: np.ndarray, nlimbs: int) -> np.ndarray:
    """[..., B] little-endian uint8-ish int32 -> [..., L] 12-bit limbs."""
    out = np.zeros(le.shape[:-1] + (nlimbs,), dtype=np.int32)
    for k in range(nlimbs):
        bit0 = k * LIMB_BITS
        byte0, off = divmod(bit0, 8)
        if off == 0:
            lo = le[..., byte0]
            hi = le[..., byte0 + 1] if byte0 + 1 < le.shape[-1] else 0
            out[..., k] = lo | ((hi & 0xF) << 8)
        else:  # off == 4
            lo = le[..., byte0] >> 4
            hi = le[..., byte0 + 1] if byte0 + 1 < le.shape[-1] else 0
            out[..., k] = lo | (hi << 4)
    return out


def limbs_to_ints(limbs: np.ndarray) -> list[int]:
    """[..., L] 12-bit limbs -> flat list of python ints (row-major)."""
    arr = np.asarray(limbs)
    flat = arr.reshape(-1, arr.shape[-1])
    nl = arr.shape[-1]
    nat = _native() if flat.shape[0] >= 1024 else None
    if nat is not None:
        nbytes = le_bytes_needed(nl)
        be = nat.limbs12_to_be(flat, nbytes)
        return [
            int.from_bytes(be[i * nbytes : (i + 1) * nbytes], "big")
            for i in range(flat.shape[0])
        ]
    shifts = [LIMB_BITS * k for k in range(nl)]
    out = []
    for row in flat:
        v = 0
        for k, s in enumerate(shifts):
            v |= int(row[k]) << s
        out.append(v)
    return out


def limbs_to_int(limbs: np.ndarray) -> int:
    """Single element [L] -> python int."""
    return limbs_to_ints(np.asarray(limbs).reshape(1, -1))[0]


def int_to_limbs(value: int, fp: FieldParams) -> np.ndarray:
    """Single python int -> [L] int32 limbs."""
    return ints_to_limbs([value], fp)[0]


def ints_to_mont_limbs(values: Sequence[int], fp: FieldParams) -> np.ndarray:
    """Canonical ints -> Montgomery-form limb array [N, L]."""
    return ints_to_limbs([fp.to_mont(v % fp.modulus) for v in values], fp)


def mont_limbs_to_ints(limbs: np.ndarray, fp: FieldParams) -> list[int]:
    """Montgomery-form limb array -> canonical python ints."""
    return [fp.from_mont(v) for v in limbs_to_ints(limbs)]
