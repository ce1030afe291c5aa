"""BLS12-381 end-to-end: test-only setup AND the real Ethereum KZG ceremony
(reference configs: examples/basic smartContractVerifier uses EthKZG)."""

import io

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.verifier.codegen import ContractType, write_python_code


class Basic(ap.Circuit):
    a = ap.PublicInput()
    b = ap.PublicInput()
    c = ap.SecretInput()

    def define(self, api):
        api.assert_is_equal(
            api.add(api.mul(self.a, self.a), api.mul(self.b, self.b)),
            api.mul(self.c, self.c),
        )


@pytest.mark.mid
@pytest.mark.slow
def test_bls12_381_ethereum_kzg_e2e():
    cc = ap.compile(
        Basic, ap.BLS12_381, ap.SetupName.ETHEREUM_KZG_CEREMONY_BLS12_381
    )
    vp = cc.verify(Basic(a=3, b=4, c=5))
    blob = vp.marshal_proof()
    assert len(blob) == 33 * 32  # BLS proof layout (reference helper.go:27-88)

    from algoplonk_tpu.plonk import verify as V

    assert V.verify(cc.vk, vp.proof, [3, 4])
    assert not V.verify(cc.vk, vp.proof, [3, 5])

    # codegen emits both variants with BLS-specific plumbing
    import ast

    for ctype, needles in [
        (
            ContractType.LOGIC_SIG,
            ["assert proof.length == 33 * 32", "VK_QL_fs", "def fs(",
             "EC.BLS12_381g1", "L_COM = proof[0:96]"],
        ),
        (ContractType.SMART_CONTRACT, ["class Verifier(arc4.ARC4Contract):"]),
    ]:
        buf = io.StringIO()
        write_python_code(cc.vk, ctype, buf)
        src = buf.getvalue()
        ast.parse(src)
        for n in needles:
            assert n in src, f"missing {n}"
