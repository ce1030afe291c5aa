"""End-to-end: compile -> prove -> native-verify the Pythagorean circuit
(the reference's examples/basic circuit: public a, b; secret c; a^2+b^2=c^2)."""

import pytest

import algoplonk_tpu as ap


class Pythagorean(ap.Circuit):
    a = ap.PublicInput()
    b = ap.PublicInput()
    c = ap.SecretInput()

    def define(self, api):
        a2 = api.mul(self.a, self.a)
        b2 = api.mul(self.b, self.b)
        c2 = api.mul(self.c, self.c)
        api.assert_is_equal(api.add(a2, b2), c2)


@pytest.fixture(scope="module")
def compiled_bn254():
    return ap.compile(Pythagorean, ap.BN254, ap.SetupName.TEST_ONLY_BN254)


def test_compile_shapes(compiled_bn254):
    cc = compiled_bn254
    assert cc.ccs.nb_public == 2
    assert cc.ccs.nb_secret == 1
    assert cc.vk.nb_public == 2
    assert cc.vk.size >= cc.ccs.nb_constraints + 2
    # vk domain data consistency
    r = ap.BN254.fr.modulus
    assert pow(cc.vk.generator, cc.vk.size, r) == 1
    assert cc.vk.size_inv * cc.vk.size % r == 1


def test_prove_and_verify(compiled_bn254):
    vp = compiled_bn254.verify(Pythagorean(a=3, b=4, c=5))
    assert vp.proof.l_com is not None
    # proof blob has the documented size (24 words, no commitments)
    blob = vp.marshal_proof()
    assert len(blob) == 24 * 32
    pub = vp.marshal_public_inputs()
    assert len(pub) == 2 * 32
    assert int.from_bytes(pub[:32], "big") == 3
    assert int.from_bytes(pub[32:], "big") == 4


def test_bad_witness_rejected(compiled_bn254):
    with pytest.raises(ValueError, match="not satisfied"):
        compiled_bn254.verify(Pythagorean(a=3, b=4, c=6))


def test_tampered_proof_rejected(compiled_bn254):
    from algoplonk_tpu.plonk import verify as V

    vp = compiled_bn254.verify(Pythagorean(a=5, b=12, c=13))
    ok = V.verify(compiled_bn254.vk, vp.proof, [5, 12])
    assert ok
    # flip a public input
    assert not V.verify(compiled_bn254.vk, vp.proof, [5, 13])
    # corrupt an evaluation
    import dataclasses

    bad = dataclasses.replace(vp.proof, l_at_z=(vp.proof.l_at_z + 1) % ap.BN254.fr.modulus)
    assert not V.verify(compiled_bn254.vk, bad, [5, 12])
