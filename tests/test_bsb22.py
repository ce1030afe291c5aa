"""BSB22 commitment circuits: prove/verify + the serialization contract test
(reference bsb22_test.go:46-123 — proof blob layout asserted positionally)."""

import dataclasses

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.plonk import verify as V
from algoplonk_tpu.plonk.marshal import expected_proof_len


class OneCommit(ap.Circuit):
    x = ap.PublicInput()
    y = ap.SecretInput()

    def define(self, api):
        t = api.mul(self.y, self.y)
        v = api.commit(t)
        api.assert_is_different(v, 0)  # use the challenge-like value
        api.assert_is_equal(t, self.x)


class TwoCommits(ap.Circuit):
    x = ap.PublicInput()
    y = ap.SecretInput()

    def define(self, api):
        t = api.mul(self.y, self.y)
        v1 = api.commit(t)
        u = api.add(t, v1)
        v2 = api.commit(u, t)
        api.assert_is_different(v2, 0)
        api.assert_is_equal(t, self.x)


@pytest.mark.slow
@pytest.mark.parametrize("circuit,ncom", [(OneCommit, 1), (TwoCommits, 2)])
def test_bsb22_prove_verify_and_layout(circuit, ncom):
    cc = ap.compile(circuit, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    assert len(cc.vk.qcp) == ncom
    assert len(cc.vk.commitment_indexes) == ncom

    vp = cc.verify(circuit(x=49, y=7))
    proof = vp.proof
    assert len(proof.bsb_commitments) == ncom
    assert len(proof.qcp_at_z) == ncom

    blob = vp.marshal_proof()
    assert len(blob) == expected_proof_len(ap.BN254, ncom)
    # positional layout (reference helper.go / MarshalSolidity):
    # qcp_i(z) scalars at word 24, then the commitment points
    base = 24 * 32
    for i, qz in enumerate(proof.qcp_at_z):
        assert blob[base + 32 * i : base + 32 * (i + 1)] == qz.to_bytes(32, "big")
    pbase = base + 32 * ncom
    from algoplonk_tpu.host.serialize import PointCodec

    codec = PointCodec(ap.BN254)
    for i, com in enumerate(proof.bsb_commitments):
        assert (
            blob[pbase + 64 * i : pbase + 64 * (i + 1)]
            == codec.g1_raw_bytes(com)
        )

    # tampering with a BSB commitment must break verification
    bad = dataclasses.replace(
        proof, bsb_commitments=[proof.bsb_commitments[0]] * ncom
    )
    if ncom == 2:
        assert not V.verify(cc.vk, bad, [49])
    bad2 = dataclasses.replace(
        proof, qcp_at_z=[(q + 1) % ap.BN254.fr.modulus for q in proof.qcp_at_z]
    )
    assert not V.verify(cc.vk, bad2, [49])


@pytest.mark.slow
def test_bsb22_codegen_structure():
    import ast
    import io

    from algoplonk_tpu.verifier.codegen import ContractType, write_python_code

    cc = ap.compile(OneCommit, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    buf = io.StringIO()
    write_python_code(cc.vk, ContractType.LOGIC_SIG, buf)
    src = buf.getvalue()
    ast.parse(src)
    idx = cc.vk.commitment_indexes[0]
    for needle in [
        "assert proof.length == 27 * 32",
        "QCP_0_AT_Z = proof[768:800]",
        "BSB_COM_0 = proof[800:864]",
        "def hash_fr(",
        f"w_pow = expmod(VK_OMEGA, BigUInt({cc.vk.nb_public + idx}), q)",
        "VK_QCP_0 = Bytes.from_hex(",
    ]:
        assert needle in src, f"missing: {needle}"
