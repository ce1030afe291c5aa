"""C++ native library parity tests (golden triangle: python ints <-> C++
Montgomery <-> limb packing).  Skipped when libapmath.so is not built."""

import numpy as np
import pytest

from algoplonk_tpu import native
from algoplonk_tpu.fields import limbs as L
from algoplonk_tpu.fields.params import BLS12_381_FP, BN254_FR

pytestmark = pytest.mark.skipif(
    not native.available(), reason="run `make native` to build libapmath.so"
)

FIELDS = [BN254_FR, BLS12_381_FP]


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_native_field_parity(rng, fp):
    nf = native.NativeField(fp.modulus, fp.nbytes)
    xs = [rng.randrange(fp.modulus) for _ in range(64)] + [0, 1, fp.modulus - 1]
    ys = [rng.randrange(fp.modulus) for _ in range(64)] + [fp.modulus - 1, 0, 1]
    a = nf.to_mont(nf.encode(xs))
    b = nf.to_mont(nf.encode(ys))
    assert nf.decode(nf.from_mont(nf.mont_mul(a, b))) == [
        x * y % fp.modulus for x, y in zip(xs, ys)
    ]
    assert nf.decode(nf.add(nf.encode(xs), nf.encode(ys))) == [
        (x + y) % fp.modulus for x, y in zip(xs, ys)
    ]
    assert nf.decode(nf.sub(nf.encode(xs), nf.encode(ys))) == [
        (x - y) % fp.modulus for x, y in zip(xs, ys)
    ]


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_native_limb_packing_parity(rng, fp):
    xs = [rng.randrange(fp.modulus) for _ in range(40)] + [0, fp.modulus - 1]
    want = L.ints_to_limbs(xs, fp)
    be = b"".join(x.to_bytes(fp.nbytes, "big") for x in xs)
    got = native.be_to_limbs12(be, fp.nbytes, fp.nlimbs)
    assert (got == want).all()
    nbytes = L.le_bytes_needed(fp.nlimbs)
    back = native.limbs12_to_be(got, nbytes)
    vals = [
        int.from_bytes(back[i * nbytes : (i + 1) * nbytes], "big")
        for i in range(len(xs))
    ]
    assert vals == xs
