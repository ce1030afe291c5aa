"""Basic example: Pythagorean circuit with a logicsig verifier.

Mirrors the reference's examples/basic/logicsigVerifier/main.go end to end:
compile -> write verifier -> (optionally) puyapy-compile -> prove -> export
blobs -> (optionally) simulate the on-chain verification on a localnet.

The chain steps run only when algokit / py-algorand-sdk / a localnet are
available; otherwise the example stops after exporting artifacts.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import algoplonk_tpu as ap
from algoplonk_tpu.utils import toolchain
from algoplonk_tpu.verifier.codegen import ContractType


class BasicCircuit(ap.Circuit):
    """Prove we know c such that a^2 + b^2 = c^2 (a, b public; c secret)."""

    a = ap.PublicInput()
    b = ap.PublicInput()
    c = ap.SecretInput()

    def define(self, api):
        api.assert_is_equal(
            api.add(api.mul(self.a, self.a), api.mul(self.b, self.b)),
            api.mul(self.c, self.c),
        )


def main():
    outdir = os.path.join(os.path.dirname(__file__), "generated")
    os.makedirs(outdir, exist_ok=True)

    print("compiling circuit (BLS12-381, test-only setup)...")
    cc = ap.compile(BasicCircuit, ap.BLS12_381, ap.SetupName.TEST_ONLY_BLS12_381)

    verifier_py = os.path.join(outdir, "BasicVerifier.py")
    cc.write_puyapy_verifier(verifier_py, ContractType.LOGIC_SIG)
    print(f"wrote {verifier_py}")

    print("proving a=3, b=4, c=5 ...")
    vp = cc.verify(BasicCircuit(a=3, b=4, c=5))
    proof_path = os.path.join(outdir, "proof.bin")
    pi_path = os.path.join(outdir, "public_inputs.bin")
    vp.export_proof_and_public_inputs(proof_path, pi_path)
    print(f"wrote {proof_path} ({os.path.getsize(proof_path)} B), "
          f"{pi_path} ({os.path.getsize(pi_path)} B)")

    # offline execution of the emitted verifier under the AVM-faithful
    # algopy mock — the no-localnet equivalent of the reference's simulate
    from algoplonk_tpu.chain import algopy_mock as mock

    with open(verifier_py) as fh:
        ns = mock.exec_verifier_source(fh.read())
    with open(proof_path, "rb") as fh:
        proof_blob = fh.read()
    with open(pi_path, "rb") as fh:
        pi_blob = fh.read()
    if "Verifier" in ns and isinstance(ns.get("Verifier"), type):
        ok = mock.run_contract_verify(ns, proof_blob, pi_blob)
    else:
        ok = mock.run_logicsig(ns, proof_blob, pi_blob)
    print(f"offline mock execution of the emitted verifier: accepted={ok}")
    assert ok

    if toolchain.have_algokit():
        print("compiling verifier with puyapy...")
        toolchain.compile_with_puyapy(verifier_py)
        toolchain.rename_puyapy_output("Verifier", "BasicVerifier", outdir)
        print("TEAL written; run the localnet flow via chain/testutils.py")
    else:
        print("algokit not installed - skipping on-chain steps")
    print("done")


if __name__ == "__main__":
    main()
