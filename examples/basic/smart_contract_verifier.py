"""Basic example, smart-contract verifier variant (reference
examples/basic/smartContractVerifier/main.go): BLS12-381 on the real
Ethereum KZG ceremony setup, ARC4 contract output."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import algoplonk_tpu as ap
from algoplonk_tpu.verifier.codegen import ContractType
from logicsig_verifier import BasicCircuit  # same circuit


def main():
    outdir = os.path.join(os.path.dirname(__file__), "generated")
    os.makedirs(outdir, exist_ok=True)
    print("compiling circuit (BLS12-381, Ethereum KZG ceremony)...")
    cc = ap.compile(
        BasicCircuit, ap.BLS12_381, ap.SetupName.ETHEREUM_KZG_CEREMONY_BLS12_381
    )
    path = os.path.join(outdir, "BasicSmartContractVerifier.py")
    cc.write_puyapy_verifier(path, ContractType.SMART_CONTRACT)
    print(f"wrote {path}")
    vp = cc.verify(BasicCircuit(a=3, b=4, c=5))
    vp.export_proof_and_public_inputs(
        os.path.join(outdir, "sc_proof.bin"),
        os.path.join(outdir, "sc_public_inputs.bin"),
    )

    # offline execution of the emitted verifier under the AVM-faithful
    # algopy mock — the no-localnet equivalent of the reference's simulate
    from algoplonk_tpu.chain import algopy_mock as mock

    with open(path) as fh:
        ns = mock.exec_verifier_source(fh.read())
    with open(os.path.join(outdir, "sc_proof.bin"), "rb") as fh:
        proof_blob = fh.read()
    with open(os.path.join(outdir, "sc_public_inputs.bin"), "rb") as fh:
        pi_blob = fh.read()
    ok = mock.run_contract_verify(ns, proof_blob, pi_blob)
    print(f"offline mock execution of the emitted verifier: accepted={ok}")
    assert ok

    print("done")


if __name__ == "__main__":
    main()
