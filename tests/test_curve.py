"""Golden tests of batched G1 kernels against exact host arithmetic."""

import numpy as np
import pytest

from algoplonk_tpu.fields.params import BN254, BLS12_381
from algoplonk_tpu.host import fp as hfp
from algoplonk_tpu.host.serialize import PointCodec
from algoplonk_tpu.ops.curve import curve_ops

CURVES = [BN254, BLS12_381]



def sample_points(rng, curve, n):
    F = hfp.GF(curve.fp.modulus)
    pts = []
    for _ in range(n):
        k = rng.randrange(1, 1 << 64)
        pts.append(hfp.ec_mul(F, curve.g1, k))
    return pts


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generators_on_curve(curve):
    F1 = hfp.GF(curve.fp.modulus)
    F2 = hfp.GF2(curve.fp.modulus, curve.fp2_nonresidue)
    assert hfp.ec_is_on_curve(F1, curve.g1, curve.b)
    assert hfp.ec_is_on_curve(F2, (curve.g2_x, curve.g2_y), curve.b2)
    # generators have order r
    assert hfp.ec_mul(F1, curve.g1, curve.fr.modulus) is None
    assert hfp.ec_mul(F2, (curve.g2_x, curve.g2_y), curve.fr.modulus) is None


@pytest.mark.parametrize("curve", [BN254], ids=lambda c: c.name)
def test_add_double_mixed(rng, curve):
    ops = curve_ops(curve)
    F = hfp.GF(curve.fp.modulus)
    n = 8
    P = sample_points(rng, curve, n)
    Q = sample_points(rng, curve, n)
    # exercise special cases in some lanes
    P[0] = None                       # inf + Q
    Q[1] = None                       # P + inf
    Q[2] = P[2]                       # doubling path
    Q[3] = hfp.ec_neg(F, P[3])        # P + (-P) = inf

    pj = ops.affine_to_jac(ops.encode_affine(P))
    qj = ops.affine_to_jac(ops.encode_affine(Q))
    got = ops.decode_affine(ops.to_affine(ops.jac_add(pj, qj)))
    want = [hfp.ec_add(F, p, q) for p, q in zip(P, Q)]
    assert got == want

    got_dbl = ops.decode_affine(ops.to_affine(ops.jac_double(pj)))
    assert got_dbl == [hfp.ec_add(F, p, p) for p in P]

    got_mixed = ops.decode_affine(
        ops.to_affine(ops.jac_add_affine(pj, ops.encode_affine(Q)))
    )
    assert got_mixed == want


@pytest.mark.parametrize("curve", [BN254], ids=lambda c: c.name)
def test_aff_add_aff(rng, curve):
    """The MSM tree's level-1 formula, incl. every special case lane."""
    ops = curve_ops(curve)
    F = hfp.GF(curve.fp.modulus)
    n = 8
    P = sample_points(rng, curve, n)
    Q = sample_points(rng, curve, n)
    P[0] = None                       # inf + Q
    Q[1] = None                       # P + inf
    Q[2] = P[2]                       # doubling path
    Q[3] = hfp.ec_neg(F, P[3])        # P + (-P) = inf
    P[4] = None
    Q[4] = None                       # inf + inf

    got = ops.decode_affine(
        ops.to_affine(
            ops.aff_add_aff(ops.encode_affine(P), ops.encode_affine(Q))
        )
    )
    want = [hfp.ec_add(F, p, q) for p, q in zip(P, Q)]
    assert got == want


@pytest.mark.parametrize(
    "curve",
    # BLS12-381's 381-bit double-and-add chain costs ~1 min of CPU compile;
    # the add/double formulas it composes are curve-parametrized and stay
    # default-tier via test_add_double_mixed — demote only the chain test
    [
        pytest.param(
            c,
            id=c.name,
            marks=[pytest.mark.slow] if c.name == "bls12_381" else [],
        )
        for c in CURVES
    ],
)
def test_scalar_mul(rng, curve):
    ops = curve_ops(curve)
    F = hfp.GF(curve.fp.modulus)
    pts = sample_points(rng, curve, 4)
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(3)] + [0]
    bits = ops.scalar_bits_array(scalars)
    got = ops.decode_affine(
        ops.to_affine(ops.scalar_mul(ops.encode_affine(pts), bits))
    )
    want = [hfp.ec_mul(F, p, s) for p, s in zip(pts, scalars)]
    assert got == want


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_serialization_roundtrip(rng, curve):
    codec = PointCodec(curve)
    pts = sample_points(rng, curve, 6) + [None]
    for P in pts:
        raw = codec.g1_raw_bytes(P)
        assert len(raw) == 2 * curve.fp.nbytes
        assert codec.g1_from_raw_bytes(raw) == P
        comp = codec.g1_compressed(P)
        assert len(comp) == curve.fp.nbytes
        assert codec.g1_from_compressed(comp) == P

    F2 = hfp.GF2(curve.fp.modulus, curve.fp2_nonresidue)
    g2 = (curve.g2_x, curve.g2_y)
    for Q in [g2, hfp.ec_mul(F2, g2, 12345), None]:
        raw = codec.g2_raw_bytes(Q)
        assert codec.g2_from_raw_bytes(raw) == Q
        comp = codec.g2_compressed(Q)
        assert codec.g2_from_compressed(comp) == Q


def test_bls_g1_generator_compressed_golden():
    """The compressed BLS12-381 generator must match the ceremony files' first
    point (reference setup/trusted_setup_test.go:54,184)."""
    codec = PointCodec(BLS12_381)
    got = codec.g1_compressed(BLS12_381.g1).hex()
    assert (
        got
        == "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
        "6c55e83ff97a1aeffb3af00adb22c6bb"
    )


def test_bls_g2_generator_compressed_golden():
    """Compressed G2 generator matches vk.bin's first point
    (reference setup/trusted_setup_test.go:94,221)."""
    codec = PointCodec(BLS12_381)
    got = codec.g2_compressed((BLS12_381.g2_x, BLS12_381.g2_y)).hex()
    assert got == (
        "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
        "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
        "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
    )
