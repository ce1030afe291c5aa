"""Merkle example: prove inclusion of a secret leaf in a public Merkle root
(MiMC hashing), BN254 — mirrors the reference's examples/merkle flow
(examples/merkle/logicsigVerifier/main.go) with a 16-level tree.

Set MERKLE_DEPTH to a smaller value for quick runs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import algoplonk_tpu as ap
from algoplonk_tpu.frontend.gadgets.merkle import verify_merkle_proof
from algoplonk_tpu.host import mimc as hm
from algoplonk_tpu.verifier.codegen import ContractType

DEPTH = int(os.environ.get("MERKLE_DEPTH", "16"))


class MerkleCircuit(ap.Circuit):
    root = ap.PublicInput()
    leaf = ap.SecretInput()
    siblings = ap.SecretInput(shape=DEPTH)
    directions = ap.SecretInput(shape=DEPTH)

    def define(self, api):
        verify_merkle_proof(
            api, ap.BN254, self.root, self.leaf, self.siblings, self.directions
        )


def main():
    outdir = os.path.join(os.path.dirname(__file__), "generated")
    os.makedirs(outdir, exist_ok=True)

    n_leaves = 1 << DEPTH
    print(f"building a depth-{DEPTH} MiMC Merkle tree ({n_leaves} leaves)...")
    leaves = list(range(1, n_leaves + 1))
    root = hm.merkle_root(ap.BN254, leaves)
    index = 5
    sibs, dirs = hm.merkle_path(ap.BN254, leaves, index)

    print("compiling circuit (BN254, test-only setup)...")
    cc = ap.compile(MerkleCircuit, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    print(f"constraints: {cc.ccs.nb_constraints}, domain: {cc.vk.size}")

    verifier_py = os.path.join(outdir, "MerkleVerifier.py")
    cc.write_puyapy_verifier(verifier_py, ContractType.LOGIC_SIG)
    print(f"wrote {verifier_py}")

    print(f"proving inclusion of leaf {leaves[index]} ...")
    vp = cc.verify(
        MerkleCircuit(
            root=root, leaf=leaves[index], siblings=sibs, directions=dirs
        )
    )
    vp.export_proof_and_public_inputs(
        os.path.join(outdir, "merkle_proof.bin"),
        os.path.join(outdir, "merkle_public_inputs.bin"),
    )

    # offline execution of the emitted verifier under the AVM-faithful
    # algopy mock — the no-localnet equivalent of the reference's simulate
    from algoplonk_tpu.chain import algopy_mock as mock

    with open(verifier_py) as fh:
        ns = mock.exec_verifier_source(fh.read())
    with open(os.path.join(outdir, "merkle_proof.bin"), "rb") as fh:
        proof_blob = fh.read()
    with open(os.path.join(outdir, "merkle_public_inputs.bin"), "rb") as fh:
        pi_blob = fh.read()
    ok = mock.run_logicsig(ns, proof_blob, pi_blob)
    print(f"offline mock execution of the emitted verifier: accepted={ok}")
    assert ok

    print("done")


if __name__ == "__main__":
    main()
