"""Golden tests of the batched field arithmetic against exact python ints.

Pattern follows the reference's tier-1 golden-vector strategy
(/root/reference/setup/trusted_setup_test.go): every device op is compared
bit-for-bit against arbitrary-precision host arithmetic.
"""

import numpy as np
import pytest

from algoplonk_tpu.fields import limbs as L
from algoplonk_tpu.fields.params import (
    BN254,
    BLS12_381,
    BN254_FP,
    BN254_FR,
    BLS12_381_FP,
    BLS12_381_FR,
    domain_generator,
)
from algoplonk_tpu.ops.field import field_ops

FIELDS = [BN254_FP, BN254_FR, BLS12_381_FP, BLS12_381_FR]


def rand_elems(rng, fp, n):
    return [rng.randrange(fp.modulus) for _ in range(n)]


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_limb_roundtrip(rng, fp):
    xs = rand_elems(rng, fp, 17) + [0, 1, fp.modulus - 1]
    arr = L.ints_to_limbs(xs, fp)
    assert arr.dtype == np.int32
    assert L.limbs_to_ints(arr) == xs


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_mont_constants(fp):
    # n_prime * p == -1 mod R
    assert (fp.n_prime * fp.modulus) % fp.R == fp.R - 1
    assert fp.r == fp.R % fp.modulus
    assert fp.nlimbs * 12 - fp.nbits >= 6


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_mul_add_sub(rng, fp):
    ops = field_ops(fp)
    n = 64
    a_int = rand_elems(rng, fp, n - 3) + [0, 1, fp.modulus - 1]
    b_int = rand_elems(rng, fp, n - 3) + [fp.modulus - 1, 0, 1]
    a = ops.encode(a_int)
    b = ops.encode(b_int)

    got_mul = ops.decode(ops.mul(a, b))
    want_mul = [(x * y) % fp.modulus for x, y in zip(a_int, b_int)]
    assert got_mul == want_mul

    got_add = ops.decode(ops.add(a, b))
    assert got_add == [(x + y) % fp.modulus for x, y in zip(a_int, b_int)]

    got_sub = ops.decode(ops.sub(a, b))
    assert got_sub == [(x - y) % fp.modulus for x, y in zip(a_int, b_int)]

    got_neg = ops.decode(ops.neg(a))
    assert got_neg == [(-x) % fp.modulus for x in a_int]


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_square(rng, fp):
    """Dedicated squaring column generator vs exact host squares."""
    ops = field_ops(fp)
    xs = rand_elems(rng, fp, 61) + [0, 1, fp.modulus - 1]
    a = ops.encode(xs)
    got = ops.decode(ops.square(a))
    assert got == [x * x % fp.modulus for x in xs]


@pytest.mark.parametrize("fp", [BN254_FR, BLS12_381_FP], ids=lambda f: f.name)
def test_inv_pow(rng, fp):
    ops = field_ops(fp)
    xs = rand_elems(rng, fp, 8) + [1, fp.modulus - 1]
    a = ops.encode(xs)
    got_inv = ops.decode(ops.inv(a))
    assert got_inv == [pow(x, -1, fp.modulus) for x in xs]

    got_pow = ops.decode(ops.pow_fixed(a, 12345))
    assert got_pow == [pow(x, 12345, fp.modulus) for x in xs]


@pytest.mark.parametrize("fp", [BN254_FR], ids=lambda f: f.name)
def test_mont_roundtrip_device(rng, fp):
    ops = field_ops(fp)
    xs = rand_elems(rng, fp, 9)
    canon = np.asarray(L.ints_to_limbs(xs, fp))
    mont = ops.to_mont(canon)
    back = ops.from_mont(mont)
    assert L.limbs_to_ints(np.asarray(back)) == xs


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_domain_generator(curve):
    r = curve.fr.modulus
    for log_n in (1, 4, 10):
        w = domain_generator(curve.name, log_n)
        n = 1 << log_n
        assert pow(w, n, r) == 1
        assert pow(w, n // 2, r) == r - 1  # exact order n
    # coset shift: k1^n != 1 and k1^n != k1^{2n} for the largest domain we use
    n = 1 << curve.two_adicity
    k1 = curve.coset_shift
    assert pow(k1, n, r) != 1
    assert pow(k1, n, r) != pow(k1 * k1 % r, n, r)


@pytest.mark.parametrize("mode", ["gather", "pad", "conv"])
def test_mul_cols_modes(monkeypatch, mode):
    """All three column-sum formulations (backend default, TPU alternative,
    experimental conv — ADVICE r2) agree with exact host arithmetic."""
    import algoplonk_tpu.ops.field as field_mod

    fp = BN254.fr
    fresh = field_mod.FieldOps(fp)
    fresh._cols_mode = mode
    xs = [0, 1, fp.modulus - 1, 0xA1607 % fp.modulus, 3**100 % fp.modulus]
    ys = [fp.modulus - 1, 12345, 1, 7**77 % fp.modulus, 0]
    got = fresh.decode(fresh.mul(fresh.encode(xs), fresh.encode(ys)))
    assert got == [x * y % fp.modulus for x, y in zip(xs, ys)]
