"""Standalone KZG + G1-NTT (ToLagrangeG1) component tests."""

import jax.numpy as jnp
import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.field import field_ops
from algoplonk_tpu.ops.gntt import to_lagrange_g1
from algoplonk_tpu.ops.kzg import KZG
from algoplonk_tpu.ops.ntt import ntt_plan
from algoplonk_tpu.setups import registry as reg


@pytest.fixture(scope="module")
def srs8():
    return reg.test_only_srs(ap.BN254, 11)  # 8 + 3


def test_kzg_commit_open_verify(rng, srs8):
    curve = ap.BN254
    ops = curve_ops(curve)
    f = field_ops(curve.fr)
    srs_dev = ops.encode_affine(srs8.g1)
    kzg = KZG(curve, srs_dev, srs8.vk_g1, srs8.vk_g2)

    coeffs_int = [rng.randrange(curve.fr.modulus) for _ in range(8)]
    coeffs = jnp.asarray(f.encode(coeffs_int))
    C = kzg.commit(coeffs)

    z = rng.randrange(curve.fr.modulus)
    opening = kzg.open(coeffs, z)
    want = sum(
        c * pow(z, i, curve.fr.modulus) for i, c in enumerate(coeffs_int)
    ) % curve.fr.modulus
    assert opening.value == want
    assert kzg.verify_opening(C, opening, z)
    # wrong value rejected
    import dataclasses

    bad = dataclasses.replace(opening, value=(opening.value + 1) % curve.fr.modulus)
    assert not kzg.verify_opening(C, bad, z)


@pytest.mark.slow  # Lagrange conversion is an optional capability (commits
# are monomial-basis); KZG core stays default via test_kzg_commit_open_verify
def test_to_lagrange_g1_matches_monomial_commit(rng, srs8):
    """commit_monomial(coeffs) == commit_lagrange(evals) after ToLagrangeG1
    (the property gnark's SRS conversion guarantees, setup/setup.go:124-142)."""
    curve = ap.BN254
    ops = curve_ops(curve)
    f = field_ops(curve.fr)
    log_n, n = 3, 8
    srs_dev = ops.encode_affine(srs8.g1)
    kzg = KZG(curve, srs_dev, srs8.vk_g1, srs8.vk_g2)

    lag = to_lagrange_g1("bn254", srs_dev[:n], log_n)

    plan = ntt_plan("bn254", log_n)
    coeffs_int = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    coeffs = jnp.asarray(f.encode(coeffs_int))
    evals = plan.ntt(coeffs)

    assert kzg.commit(coeffs) == kzg.commit_lagrange(evals, lag)
