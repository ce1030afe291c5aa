"""Merkle example, smart-contract verifier variant (reference
examples/merkle/smartContractVerifier/main.go): BN254, test-only setup."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import algoplonk_tpu as ap
from algoplonk_tpu.host import mimc as hm
from algoplonk_tpu.verifier.codegen import ContractType
from logicsig_verifier import DEPTH, MerkleCircuit


def main():
    outdir = os.path.join(os.path.dirname(__file__), "generated")
    os.makedirs(outdir, exist_ok=True)
    n_leaves = 1 << DEPTH
    leaves = list(range(1, n_leaves + 1))
    root = hm.merkle_root(ap.BN254, leaves)
    sibs, dirs = hm.merkle_path(ap.BN254, leaves, 3)
    print("compiling circuit (BN254, test-only setup)...")
    cc = ap.compile(MerkleCircuit, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    path = os.path.join(outdir, "MerkleSmartContractVerifier.py")
    cc.write_puyapy_verifier(path, ContractType.SMART_CONTRACT)
    print(f"wrote {path}")
    vp = cc.verify(
        MerkleCircuit(root=root, leaf=leaves[3], siblings=sibs, directions=dirs)
    )
    vp.export_proof_and_public_inputs(
        os.path.join(outdir, "merkle_sc_proof.bin"),
        os.path.join(outdir, "merkle_sc_public_inputs.bin"),
    )

    # offline execution of the emitted verifier under the AVM-faithful
    # algopy mock — the no-localnet equivalent of the reference's simulate
    from algoplonk_tpu.chain import algopy_mock as mock

    with open(path) as fh:
        ns = mock.exec_verifier_source(fh.read())
    with open(os.path.join(outdir, "merkle_sc_proof.bin"), "rb") as fh:
        proof_blob = fh.read()
    with open(os.path.join(outdir, "merkle_sc_public_inputs.bin"), "rb") as fh:
        pi_blob = fh.read()
    ok = mock.run_contract_verify(ns, proof_blob, pi_blob)
    print(f"offline mock execution of the emitted verifier: accepted={ok}")
    assert ok

    print("done")


if __name__ == "__main__":
    main()
