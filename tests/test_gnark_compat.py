"""gnark-constants compatibility mode (VERDICT r3 item 6).

The protocol-free constants — domain root of unity, PLONK coset shift, MiMC
round constants — default to self-consistent derivations.  set_gnark_compat
switches them to gnark's documented rules; these tests pin the switched
values against published constants (hard-coded hex, the same style the
reference uses for SRS goldens in
/root/reference/setup/trusted_setup_test.go).
"""

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.fields.params import (
    GNARK_FR_GENERATOR,
    domain_generator,
    set_gnark_compat,
)
from algoplonk_tpu.host.keccak import keccak256


@pytest.fixture()
def gnark_mode():
    set_gnark_compat(True)
    yield
    set_gnark_compat(False)


def test_keccak256_known_vectors():
    # the two canonical public legacy-Keccak vectors (pre-NIST padding)
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block absorb (> 136-byte rate)
    assert len(keccak256(b"x" * 300)) == 32


def test_bn254_gnark_root_of_unity_published_value(gnark_mode):
    # gnark-crypto / circom BN254 Fr: generator 5, 2-adicity 28; the 2^28
    # root of unity is the widely published constant below
    w = ap.BN254.root_of_unity
    assert w == int(
        "19103219067921713944291392827692070036145651957329286315305642004821462161904"
    )
    assert pow(w, 1 << 28, ap.BN254.fr.modulus) == 1
    assert pow(w, 1 << 27, ap.BN254.fr.modulus) != 1
    # BN254's smallest QNR IS gnark's generator, so native == gnark
    set_gnark_compat(False)
    assert ap.BN254.root_of_unity == w
    assert ap.BN254.coset_shift == 5


def test_bls12_381_gnark_root_of_unity_published_value(gnark_mode):
    # zkcrypto/gnark BLS12-381 Fr: GENERATOR = 7, 2-adicity 32; ROOT_OF_UNITY
    # is the published zkcrypto constant
    w = ap.BLS12_381.root_of_unity
    assert w == int(
        "16a2a19edfe81f20d09b681922c813b4b63683508c2280b93829971f439f0d2b", 16
    )
    assert ap.BLS12_381.coset_shift == 7
    r = ap.BLS12_381.fr.modulus
    assert pow(w, 1 << 32, r) == 1
    assert pow(w, 1 << 31, r) != 1
    # native mode differs (smallest-QNR derivation picks 5)
    set_gnark_compat(False)
    assert ap.BLS12_381.root_of_unity != w
    assert ap.BLS12_381.coset_shift == 5


def test_domain_generator_switches_with_mode(gnark_mode):
    r = ap.BLS12_381.fr.modulus
    w8 = domain_generator("bls12_381", 3)
    # w8 must be w^(2^29) for gnark's 2^32 root w
    assert w8 == pow(ap.BLS12_381.root_of_unity, 1 << 29, r)
    set_gnark_compat(False)
    assert domain_generator("bls12_381", 3) != w8
    set_gnark_compat(True)
    assert domain_generator("bls12_381", 3) == w8


def test_mimc_constants_gnark_chain(gnark_mode):
    from algoplonk_tpu.host import mimc

    cs = mimc.round_constants("bn254", ap.BN254.fr.modulus)
    assert len(cs) == 110
    # c_0 = Keccak256(Keccak256("seed")) mod r — gnark-crypto initConstants
    want0 = int.from_bytes(
        keccak256(keccak256(b"seed")), "big"
    ) % ap.BN254.fr.modulus
    assert cs[0] == want0
    # chain property: c_{i+1} = Keccak256(c_i digest)
    d = keccak256(keccak256(b"seed"))
    for i in range(3):
        assert cs[i] == int.from_bytes(d, "big") % ap.BN254.fr.modulus
        d = keccak256(d)
    # native constants differ (and start with the fixed 0)
    set_gnark_compat(False)
    native = mimc.round_constants("bn254", ap.BN254.fr.modulus)
    assert native[0] == 0 and native != cs


def test_mimc_hash_differs_by_mode(gnark_mode):
    from algoplonk_tpu.host.mimc import mimc_hash

    h_gnark = mimc_hash(ap.BN254, [1, 2])
    set_gnark_compat(False)
    h_native = mimc_hash(ap.BN254, [1, 2])
    assert h_gnark != h_native


@pytest.mark.mid
@pytest.mark.slow
def test_gnark_mode_e2e_prove_verify(gnark_mode):
    """Full pipeline under gnark constants on BLS12-381 (the curve where the
    domain constants actually change): compile -> prove -> self-verify."""
    from algoplonk_tpu.frontend import witness as witness_mod
    from algoplonk_tpu.plonk import verify as verify_mod
    from algoplonk_tpu.plonk.prove import Prover

    class Pyth(ap.Circuit):
        a = ap.PublicInput()
        b = ap.PublicInput()
        c = ap.SecretInput()

        def define(self, api):
            api.assert_is_equal(
                api.add(api.mul(self.a, self.a), api.mul(self.b, self.b)),
                api.mul(self.c, self.c),
            )

    cc = ap.compile(Pyth, ap.BLS12_381, ap.SetupName.TEST_ONLY_BLS12_381)
    assert cc.vk.coset_shift == 7
    wit = witness_mod.solve(cc.ccs, Pyth(a=3, b=4, c=5))
    proof = Prover(cc.pk, cc.ccs, rng=False).prove(wit)
    assert verify_mod.verify(cc.vk, proof, wit.public_values)
