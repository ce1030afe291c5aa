"""Pairing correctness: bilinearity, non-degeneracy, order."""

import pytest

from algoplonk_tpu.fields.params import BN254, BLS12_381
from algoplonk_tpu.host import fp as hfp
from algoplonk_tpu.host.pairing import pairing_engine


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_pairing_bilinear(curve):
    eng = pairing_engine(curve.name)
    F1 = hfp.GF(curve.fp.modulus)
    F2 = hfp.GF2(curve.fp.modulus, curve.fp2_nonresidue)
    G1, G2 = curve.g1, (curve.g2_x, curve.g2_y)

    e = eng.pairing(G1, G2)
    assert not eng.fp12.is_one(e)          # non-degenerate
    assert eng.fp12.is_one(eng.fp12.pow(e, curve.fr.modulus))  # order r

    a, b = 6, 35
    ePa_Qb = eng.pairing(hfp.ec_mul(F1, G1, a), hfp.ec_mul(F2, G2, b))
    assert eng.fp12.eq(ePa_Qb, eng.fp12.pow(e, a * b))


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_pairing_check_kzg_style(curve):
    """e(C - y*G1, G2) * e(-(W), tau*G2 - z*G2) == 1 for a toy KZG opening."""
    eng = pairing_engine(curve.name)
    F1 = hfp.GF(curve.fp.modulus)
    F2 = hfp.GF2(curve.fp.modulus, curve.fp2_nonresidue)
    r = curve.fr.modulus
    G1, G2 = curve.g1, (curve.g2_x, curve.g2_y)

    tau, z = 123456789, 987654321
    # p(X) = 7 X^2 + 3 X + 11
    coeffs = [11, 3, 7]
    p_tau = sum(c * pow(tau, i, r) for i, c in enumerate(coeffs)) % r
    p_z = sum(c * pow(z, i, r) for i, c in enumerate(coeffs)) % r
    # q(X) = (p(X) - p(z)) / (X - z)
    q1 = coeffs[2]
    q0 = (coeffs[1] + z * q1) % r
    q_tau = (q0 + q1 * tau) % r

    C = hfp.ec_mul(F1, G1, p_tau)
    W = hfp.ec_mul(F1, G1, q_tau)
    # e(C - y G, G2) == e(W, (tau - z) G2)
    lhs = hfp.ec_add(F1, C, hfp.ec_mul(F1, G1, (-p_z) % r))
    tz_g2 = hfp.ec_mul(F2, G2, (tau - z) % r)
    assert eng.pairing_check([(lhs, G2), (hfp.ec_neg(F1, W), tz_g2)])
    # and a corrupted opening fails
    bad = hfp.ec_add(F1, lhs, G1)
    assert not eng.pairing_check([(bad, G2), (hfp.ec_neg(F1, W), tz_g2)])
