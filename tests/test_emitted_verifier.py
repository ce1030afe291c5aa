"""EXECUTE the emitted PuyaPy verifiers against real marshalled proofs.

The reference's Tier-2 integration tests run the generated TEAL on a
localnet and mutate inputs to prove rejection
(/root/reference/testutils/verifier_integration_test.go:188-256,
bsb22_integration_test.go).  Offline equivalent: run the emitted source as
plain Python under the AVM-faithful algopy mock
(algoplonk_tpu/chain/algopy_mock.py) — accept valid blobs, reject a flipped
public-input byte, reject a swapped G1 point, reject rekeying."""

import io

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.chain import algopy_mock as mock
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


class WithCommitment(ap.Circuit):
    a = ap.PublicInput()
    x = ap.SecretInput()

    def define(self, api):
        com = api.commit(self.x)
        api.assert_is_equal(api.mul(com, self.x), api.mul(com, self.a))


class WithTwoCommitments(ap.Circuit):
    a = ap.PublicInput()
    x = ap.SecretInput()
    y = ap.SecretInput()

    def define(self, api):
        c1 = api.commit(self.x)
        c2 = api.commit(self.y)
        api.assert_is_equal(api.mul(c1, self.x), api.mul(c1, self.a))
        api.assert_is_equal(api.mul(c2, self.y), api.mul(c2, self.a))


CONFIGS = {
    "bn254": (ap.BN254, ap.SetupName.TEST_ONLY_BN254),
    "bls12_381": (ap.BLS12_381, ap.SetupName.TEST_ONLY_BLS12_381),
}


@pytest.fixture(
    scope="module",
    params=["bn254", pytest.param("bls12_381",
                              marks=[pytest.mark.slow, pytest.mark.mid])],
    ids=lambda k: k,
)
def proven(request):
    """One compiled+proven Basic circuit per curve for the whole module."""
    curve, setup = CONFIGS[request.param]
    cc = ap.compile(Basic, curve, setup)
    vp = cc.verify(Basic(a=3, b=4, c=5))
    return curve, cc, vp.marshal_proof(), vp.marshal_public_inputs()


def emit(cc, contract_type) -> dict:
    buf = io.StringIO()
    write_python_code(cc.vk, contract_type, buf)
    return mock.exec_verifier_source(buf.getvalue())


def mutate(blob: bytes, pos: int) -> bytes:
    return blob[:pos] + bytes([blob[pos] ^ 1]) + blob[pos + 1 :]


def test_emitted_logicsig_executes(proven):
    curve, cc, proof, publics = proven
    ns = emit(cc, ContractType.LOGIC_SIG)
    mock.budget.reset()
    assert mock.run_logicsig(ns, proof, publics) is True
    _check_budget(curve, "logicsig")

    # flipped public input byte -> rejected
    assert mock.run_logicsig(ns, proof, mutate(publics, 31)) is False
    # first G1 commitment overwritten with the second -> rejected
    point = 64 if curve is ap.BN254 else 96
    swapped = proof[point : 2 * point] * 2 + proof[2 * point :]
    assert mock.run_logicsig(ns, swapped, publics) is False
    # rekey attempt -> rejected (assert in the program)
    with pytest.raises(AssertionError):
        mock.run_logicsig(ns, proof, publics, rekey=True)


def test_emitted_smart_contract_executes(proven):
    curve, cc, proof, publics = proven
    ns = emit(cc, ContractType.SMART_CONTRACT)
    mock.budget.reset()
    assert mock.run_contract_verify(ns, proof, publics) is True
    _check_budget(curve, "smart_contract")
    assert mock.run_contract_verify(ns, mutate(proof, 600), publics) is False


# Reference published budgets per (curve, BSB22 commitment count)
# (/root/reference/README.md:25-30).  The mock charges go-algorand langspec
# costs for every metered op plus a calibrated per-op linear-TEAL overhead
# (OpBudget.OP_OVERHEAD — calibrated ONCE on the BN254/0 figure, validated
# against the other five variants); modeled totals must land within +-15%
# of every published figure (recorded per variant in PARITY.md).
_PUBLISHED = {
    ("bn254", 0): 145_000, ("bn254", 1): 175_000, ("bn254", 2): 210_000,
    ("bls12_381", 0): 185_000, ("bls12_381", 1): 221_000,
    ("bls12_381", 2): 261_000,
}


def _check_budget(curve, variant, ncom=0):
    used = mock.budget.consumed()
    name = "bn254" if curve is ap.BN254 else "bls12_381"
    ref = _PUBLISHED[(name, ncom)]
    print(f"[opcode budget] {name} {variant} ncom={ncom}: {used} "
          f"(published on-chain total ~{ref}, {used / ref - 1:+.1%})")
    assert 0.85 * ref < used < 1.15 * ref, (name, variant, ncom, used, ref)


@pytest.mark.mid
@pytest.mark.slow  # extra prove+execute pass; BSB22 proof-layout coverage
# stays default-tier via tests/test_bsb22.py, plain emitted execution above
@pytest.mark.parametrize("key", ["bn254", "bls12_381"])
def test_emitted_bsb22_executes(key):
    """BSB22 path: exercises hash_fr + qcp parsing in the emitted program."""
    curve, setup = CONFIGS[key]
    cc = ap.compile(WithCommitment, curve, setup)
    vp = cc.verify(WithCommitment(a=7, x=7))
    proof, publics = vp.marshal_proof(), vp.marshal_public_inputs()
    words = 24 if curve is ap.BN254 else 33
    point = 64 if curve is ap.BN254 else 96
    assert len(proof) == words * 32 + 32 + point  # 1 commitment

    ns = emit(cc, ContractType.LOGIC_SIG)
    mock.budget.reset()
    assert mock.run_logicsig(ns, proof, publics) is True
    _check_budget(curve, "logicsig", ncom=1)
    # corrupt the BSB22 commitment point -> rejected
    assert mock.run_logicsig(ns, mutate(proof, len(proof) - 5), publics) is False


@pytest.mark.mid
@pytest.mark.slow  # two extra proves; budget parity for the 2-commitment row
@pytest.mark.parametrize("key", ["bn254", "bls12_381"])
def test_emitted_two_commitments_budget(key):
    """2-commitment variant: proof layout (2 qcp scalars + 2 points) and the
    published ~210k / ~261k budgets (/root/reference/README.md:25-30)."""
    curve, setup = CONFIGS[key]
    cc = ap.compile(WithTwoCommitments, curve, setup)
    vp = cc.verify(WithTwoCommitments(a=7, x=7, y=7))
    proof, publics = vp.marshal_proof(), vp.marshal_public_inputs()
    words = 24 if curve is ap.BN254 else 33
    point = 64 if curve is ap.BN254 else 96
    assert len(proof) == words * 32 + 2 * 32 + 2 * point  # 2 commitments

    ns = emit(cc, ContractType.LOGIC_SIG)
    mock.budget.reset()
    assert mock.run_logicsig(ns, proof, publics) is True
    _check_budget(curve, "logicsig", ncom=2)


def test_mock_is_not_circular():
    """The mock's EC ops come from host/fp + host/pairing — different code
    than the prover's device kernels — so acceptance is a genuine
    cross-check; sanity-check the mock's own EC ops."""
    from algoplonk_tpu.host import fp as hfp

    F = hfp.GF(ap.BN254.fp.modulus)
    g = ap.BN254.g1
    g2 = hfp.ec_double(F, g)
    enc = mock._encode_g1(mock.EC.BN254g1, g)
    assert mock._decode_g1(mock.EC.BN254g1, enc) == g
    out = mock.EllipticCurve.add(mock.EC.BN254g1, enc, enc)
    assert mock._decode_g1(mock.EC.BN254g1, out) == g2


def test_emitted_invert_preserves_x_width(proven):
    """Regression guard from the reference (verifier/templates_test.go:8-59,
    CHANGELOG.md:31): point negation must keep the fixed-width x bytes.
    Here we go further than the reference's string test: execute the emitted
    `invert` subroutine under the mock and check widths and values."""
    curve, cc, _, _ = proven
    if curve is not ap.BN254:
        pytest.skip("BN254 generator has the leading-zero x")
    ns = emit(cc, ContractType.LOGIC_SIG)
    invert = ns["invert"]

    from algoplonk_tpu.host import fp as hfp

    F = hfp.GF(curve.fp.modulus)
    # a point whose x has leading zero bytes would be corrupted by a
    # minimal-bytes implementation
    g = curve.g1  # generator x = 1 -> 31 leading zero bytes
    enc = mock._encode_g1(mock.EC.BN254g1, g)
    out = invert(enc)
    assert out.length == 64
    assert mock._decode_g1(mock.EC.BN254g1, out) == hfp.ec_neg(F, g)
    # infinity passes through unchanged
    zero = mock.bzero(64)
    assert invert(zero) == zero
