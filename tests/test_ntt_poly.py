"""Golden tests for NTT and polynomial scan utilities."""

import numpy as np
import pytest

from algoplonk_tpu.fields.params import BN254, BLS12_381, domain_generator
from algoplonk_tpu.fields import limbs as L
from algoplonk_tpu.ops.field import field_ops
from algoplonk_tpu.ops.ntt import ntt_plan
from algoplonk_tpu.ops import poly


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_ntt_roundtrip_and_naive(rng, curve):
    log_n = 4
    n = 1 << log_n
    r = curve.fr.modulus
    plan = ntt_plan(curve.name, log_n)
    f = plan.f
    coeffs_int = [rng.randrange(r) for _ in range(n)]
    coeffs = f.encode(coeffs_int)

    evals = plan.ntt(coeffs)
    w = domain_generator(curve.name, log_n)
    want = [
        sum(c * pow(w, i * j, r) for j, c in enumerate(coeffs_int)) % r
        for i in range(n)
    ]
    assert f.decode(evals) == want

    back = plan.intt(evals)
    assert f.decode(back) == coeffs_int


def test_coset_ntt(rng):
    curve = BN254
    log_n, n, r = 3, 8, curve.fr.modulus
    plan = ntt_plan(curve.name, log_n)
    f = plan.f
    shift = curve.coset_shift
    coeffs_int = [rng.randrange(r) for _ in range(n)]
    coeffs = f.encode(coeffs_int)
    evals = plan.coset_ntt(coeffs, shift)
    w = domain_generator(curve.name, log_n)
    want = [
        sum(c * pow(shift * pow(w, i, r) % r, j, r) for j, c in enumerate(coeffs_int))
        % r
        for i in range(n)
    ]
    assert f.decode(evals) == want
    assert f.decode(plan.coset_intt(evals, shift)) == coeffs_int


def test_prefix_products_and_batch_inverse(rng):
    curve = BN254
    f = field_ops(curve.fr)
    r = curve.fr.modulus
    n = 64
    xs = [rng.randrange(1, r) for _ in range(n)]
    xs[5] = 0  # batch_inverse zero lane
    v = f.encode(xs)

    pre = f.decode(poly.prefix_products(f, v))
    want, acc = [], 1
    for x in xs:
        acc = acc * x % r
        want.append(acc)
    assert pre == want

    inv = f.decode(poly.batch_inverse(f, v))
    assert inv == [pow(x, -1, r) if x else 0 for x in xs]


def test_powers_and_eval_and_quotient(rng):
    curve = BN254
    f = field_ops(curve.fr)
    r = curve.fr.modulus
    n = 32
    x = rng.randrange(r)
    tbl = f.decode(poly.powers(f, f.encode([x])[0], n))
    assert tbl == [pow(x, i, r) for i in range(n)]

    coeffs_int = [rng.randrange(r) for _ in range(n)]
    z = rng.randrange(r)
    coeffs = f.encode(coeffs_int)
    z_l = f.encode([z])[0]

    got_eval = f.decode(poly.poly_eval(f, coeffs, z_l)[None])[0]
    want_eval = sum(c * pow(z, i, r) for i, c in enumerate(coeffs_int)) % r
    assert got_eval == want_eval

    q, p_at_z = poly.kzg_quotient(f, coeffs, z_l)
    assert f.decode(p_at_z[None])[0] == want_eval
    q_int = f.decode(q)
    # check (X - z) * q(X) + p(z) == p(X)
    recon = [0] * n
    for i, qc in enumerate(q_int):
        recon[i] = (recon[i] - z * qc) % r
        if i + 1 < n:
            recon[i + 1] = (recon[i + 1] + qc) % r
    recon[0] = (recon[0] + want_eval) % r
    assert recon == coeffs_int
