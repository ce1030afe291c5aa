"""Gadget tests: MiMC host/circuit consistency and Merkle inclusion e2e
(the reference's examples/merkle configuration, reduced depth for CI)."""

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.frontend.gadgets.merkle import verify_merkle_proof
from algoplonk_tpu.frontend.gadgets.mimc import mimc_hash_gadget
from algoplonk_tpu.host import mimc as hm


def test_host_mimc_properties():
    h1 = hm.mimc_hash(ap.BN254, [1, 2])
    h2 = hm.mimc_hash(ap.BN254, [2, 1])
    assert h1 != h2
    assert h1 == hm.mimc_hash(ap.BN254, [1, 2])
    assert 0 < h1 < ap.BN254.fr.modulus
    # both curves have invertible x^5
    hm.round_constants("bn254", ap.BN254.fr.modulus)
    hm.round_constants("bls12_381", ap.BLS12_381.fr.modulus)


def test_merkle_path_host():
    leaves = [10, 20, 30, 40]
    root = hm.merkle_root(ap.BN254, leaves)
    for i, leaf in enumerate(leaves):
        sibs, dirs = hm.merkle_path(ap.BN254, leaves, i)
        cur = leaf
        for s, d in zip(sibs, dirs):
            cur = hm.mimc_hash(ap.BN254, [s, cur] if d else [cur, s])
        assert cur == root


class MimcCircuit(ap.Circuit):
    x = ap.SecretInput()
    h = ap.PublicInput()

    def define(self, api):
        api.assert_is_equal(mimc_hash_gadget(api, ap.BN254, [self.x]), self.h)


@pytest.mark.slow
def test_mimc_circuit_e2e():
    cc = ap.compile(MimcCircuit, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    digest = hm.mimc_hash(ap.BN254, [42])
    vp = cc.verify(MimcCircuit(x=42, h=digest))
    assert vp.marshal_public_inputs() == digest.to_bytes(32, "big")
    with pytest.raises(ValueError, match="not satisfied"):
        cc.verify(MimcCircuit(x=43, h=digest))


DEPTH = 2


class MerkleCircuit(ap.Circuit):
    """Merkle-inclusion (reference examples/merkle/*/main.go:34-61 shape)."""

    root = ap.PublicInput()
    leaf = ap.SecretInput()
    siblings = ap.SecretInput(shape=DEPTH)
    directions = ap.SecretInput(shape=DEPTH)

    def define(self, api):
        verify_merkle_proof(
            api, ap.BN254, self.root, self.leaf, self.siblings, self.directions
        )


@pytest.mark.slow
def test_merkle_circuit_e2e():
    leaves = [7, 11, 13, 17]
    root = hm.merkle_root(ap.BN254, leaves)
    sibs, dirs = hm.merkle_path(ap.BN254, leaves, 2)
    cc = ap.compile(MerkleCircuit, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    vp = cc.verify(
        MerkleCircuit(root=root, leaf=13, siblings=sibs, directions=dirs)
    )
    assert len(vp.marshal_proof()) == 24 * 32
    # wrong leaf fails
    with pytest.raises(ValueError, match="not satisfied"):
        cc.verify(MerkleCircuit(root=root, leaf=14, siblings=sibs, directions=dirs))
