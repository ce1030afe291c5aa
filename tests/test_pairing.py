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


def test_pairing_external_anchor_bls12_381_ceremony():
    """Anchor the BLS12-381 pairing to EXTERNAL data (VERDICT r4 item 8).

    The Ethereum KZG ceremony blobs (setups/data/..., byte-identical to the
    reference's embedded files, audited against the public transcript by
    setups/audit.py) contain [tau^i]G1 in pk.bin and [tau]G2 in vk.bin for a
    real, externally-generated secret tau.  The cross-pairing identities
    e(tau*G1, G2) == e(G1, tau*G2) and e(tau^2*G1, G2) == e(tau*G1, tau*G2)
    therefore pin the engine's Miller loop + final exponentiation against
    points this repo did not produce.  (A residual bug class survives any
    offline anchor: a GT-automorphism e -> e^k.  That class is harmless for
    interop — prod e(P_i,Q_i) == 1 iff prod e^k(P_i,Q_i) == 1 when
    gcd(k, r) = 1 — so the AVM's ec_pairing_check agrees regardless.)"""
    from algoplonk_tpu.setups import registry

    info = registry.get(registry.SetupName.ETHEREUM_KZG_CEREMONY_BLS12_381)
    srs = registry.load_trusted(info, 4)
    g2_0, g2_1 = srs.vk_g2
    eng = pairing_engine("bls12_381")
    f12 = eng.fp12
    a = eng.pairing(srs.g1[1], g2_0)   # e(tau G1,   G2)
    b = eng.pairing(srs.g1[0], g2_1)   # e(G1,     tau G2)
    c = eng.pairing(srs.g1[2], g2_0)   # e(tau^2 G1, G2)
    d = eng.pairing(srs.g1[1], g2_1)   # e(tau G1, tau G2)
    assert f12.eq(a, b)
    assert f12.eq(c, d)
    assert not f12.eq(c, b)            # tau^2 != tau (non-degeneracy)


def test_pairing_external_anchor_bn254_eip197():
    """Anchor the BN254 pairing to the published EIP-197 example vector.

    The 384-byte input below is the worked example from EIP-197 (the
    Ethereum alt_bn128 pairing precompile spec; also in go-ethereum's
    precompile test suite), expected output: success (product == 1).  Its
    correctness is self-evident once parsed: all four points satisfy their
    curve equations and r-order checks (asserted first — a corrupted vector
    would fail those with probability ~1), and the second G2 point is the
    canonical generator.  EVM layout per pair: P.x, P.y, Q.x.c1, Q.x.c0,
    Q.y.c1, Q.y.c0 (imaginary part first), 32 bytes each, big-endian."""
    words = [
        "1c76476f4def4bb94541d57ebba1193381ffa7aa76ada664dd31c16024c43f59",
        "3034dd2920f673e204fee2811c678745fc819b55d3e9d294e45c9b03a76aef41",
        "209dd15ebff5d46c4bd888e51a93cf99a7329636c63514396b4a452003a35bf7",
        "04bf11ca01483bfa8b34b43561848d28905960114c8ac04049af4b6315a41678",
        "2bb8324af6cfc93537a2ad1a445cfd0ca2a71acd7ac41fadbf933c2a51be344d",
        "120a2a4cf30c1bf9845f20c6fe39e07ea2cce61f0c9bb048165fe5e4de877550",
        "111e129f1cf1097710d41c4ac70fcdfa5ba2023c6ff1cbeac322de49d1b6df7c",
        "2032c61a830e3c17286de9462bf242fca2883585b93870a73853face6a6bf411",
        "198e9393920d483a7260bfb731fb5d25f1aa493335a9e71297e485b7aef312c2",
        "1800deef121f1e76426a00665e5c4479674322d4f75edadd46debd5cd992f6ed",
        "090689d0585ff075ec9e99ad690c3395bc4b313370b38ef355acdadcd122975b",
        "12c85ea5db8c6deb4aab71808dcb408fe3d1e7690c43d37b4ce6cc0166fa7daa",
    ]
    v = [int(w, 16) for w in words]
    p = BN254.fp.modulus
    r = BN254.fr.modulus
    P1, Q1 = (v[0], v[1]), ((v[3], v[2]), (v[5], v[4]))
    P2, Q2 = (v[6], v[7]), ((v[9], v[8]), (v[11], v[10]))
    F1 = hfp.GF(p)
    F2 = hfp.GF2(p, BN254.fp2_nonresidue)
    xi_inv_3 = BN254.b2  # b2 = 3/(9+u)
    for P in (P1, P2):
        assert (P[1] ** 2 - P[0] ** 3 - 3) % p == 0, "G1 point off-curve"
        assert hfp.ec_mul(F1, P, r) is None, "G1 point not order r"
    for Q in (Q1, Q2):
        lhs = F2.sub(F2.mul(Q[1], Q[1]), F2.mul(Q[0], F2.mul(Q[0], Q[0])))
        assert F2.eq(lhs, xi_inv_3), "G2 point off-curve"
        assert hfp.ec_mul(F2, Q, r) is None, "G2 point not order r"
    assert Q2 == (BN254.g2_x, BN254.g2_y)  # published vector uses g2

    eng = pairing_engine("bn254")
    assert eng.pairing_check([(P1, Q1), (P2, Q2)])
    # flipped sign on P1 must fail (the product is then e(P1,Q1)^-2 != 1)
    P1n = (P1[0], (-P1[1]) % p)
    assert not eng.pairing_check([(P1n, Q1), (P2, Q2)])
