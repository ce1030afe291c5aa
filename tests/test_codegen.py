"""Codegen structure tests, mirroring the reference's golden-substring
strategy (/root/reference/verifier/bsb22_test.go:71-208): assert exact proof
offsets, Fiat-Shamir insertion order, and length asserts in the emitted code."""

import ast
import io

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.verifier.codegen import ContractType, write_python_code


class Square(ap.Circuit):
    x = ap.PublicInput()
    y = ap.SecretInput()

    def define(self, api):
        api.assert_is_equal(api.mul(self.y, self.y), self.x)


@pytest.fixture(scope="module")
def cc_bn254():
    return ap.compile(Square, ap.BN254, ap.SetupName.TEST_ONLY_BN254)


def render(cc, ctype):
    buf = io.StringIO()
    write_python_code(cc.vk, ctype, buf)
    return buf.getvalue()


def test_bn254_logicsig_structure(cc_bn254):
    src = render(cc_bn254, ContractType.LOGIC_SIG)
    ast.parse(src)
    for needle in [
        "assert proof.length == 24 * 32",
        f"assert public_inputs.length == 1 * 32",
        "L_COM = proof[0:64]",
        "H_2 = proof[320:384]",
        "L_AT_Z = proof[384:416]",
        "GRAND_PRODUCT = proof[544:608]",
        "BATCH_OPENING_AT_Z = proof[640:704]",
        "OPENING_AT_Z_OMEGA = proof[704:768]",
        "gamma_pre = sha256(b'gamma' + VK_S1 + VK_S2 + VK_S3 + VK_QL + VK_QR",
        "beta_pre = sha256(b'beta' + gamma_pre)",
        "zeta_pre = sha256(b'zeta' + alpha_pre + H_0 + H_1 + H_2)",
        "assert py.Txn.rekey_to == py.Global.zero_address",
        "ec.pairing_check(EC.BN254g1, digest + quotient, g2)",
        f"VK_DOMAIN_SIZE = BigUInt({cc_bn254.vk.size})",
        f"VK_OMEGA = BigUInt({cc_bn254.vk.generator})",
    ]:
        assert needle in src, f"missing: {needle}"
    assert "hash_fr" not in src  # no BSB22 commitments in this circuit


def test_bn254_smart_contract_structure(cc_bn254):
    src = render(cc_bn254, ContractType.SMART_CONTRACT)
    ast.parse(src)
    for needle in [
        "class Verifier(arc4.ARC4Contract):",
        "def make_immutable(self) -> None:",
        "-> arc4.Bool:",
        "return arc4.Bool(check)",
    ]:
        assert needle in src, f"missing: {needle}"


def test_vk_constants_are_valid_points(cc_bn254):
    src = render(cc_bn254, ContractType.LOGIC_SIG)
    from algoplonk_tpu.host.serialize import PointCodec
    codec = PointCodec(ap.BN254)
    for line in src.splitlines():
        line = line.strip()
        if line.startswith("VK_Q") or line.startswith("VK_S"):
            if 'Bytes.from_hex("' in line:
                hexstr = line.split('"')[1]
                codec.g1_from_raw_bytes(bytes.fromhex(hexstr))  # raises if invalid
