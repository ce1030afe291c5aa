"""algoplonk_tpu — a TPU-native PLONK proving stack with the capabilities of
AlgoPlonk (reference: /root/reference).

Top-level API mirrors the reference's orchestration layer
(/root/reference/algoplonk.go):

    cc = compile_circuit_for_chain(MyCircuit, BN254, SetupName.TEST_ONLY_BN254)
    vp = cc.verify(MyCircuit(a=3, b=4, c=5))     # prove + self-verify
    cc.write_puyapy_verifier("Verifier.py", ContractType.LOGIC_SIG)
    vp.export_proof_and_public_inputs("proof.bin", "public_inputs.bin")

The crypto backend underneath (field/curve/NTT/MSM/KZG/prover) is built
TPU-first on JAX/XLA — see ops/ and plonk/.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from .fields.params import (
    BLS12_381,
    BN254,
    CurveParams,
    gnark_compat_enabled,
    set_gnark_compat,
)
from .frontend.api import (
    Circuit,
    CompiledConstraintSystem,
    PublicInput,
    SecretInput,
    compile_circuit,
)
from .frontend import witness as witness_mod
from .plonk.keys import ProvingKey, VerifyingKey
from .plonk.prove import Proof, Prover
from .plonk import verify as verify_mod
from .plonk import marshal as marshal_mod
from .setups.registry import SetupName, get as get_setup, run_setup, test_only_setup
from .verifier.codegen import ContractType, write_python_code

__all__ = [
    "BN254",
    "BLS12_381",
    "Circuit",
    "PublicInput",
    "SecretInput",
    "SetupName",
    "ContractType",
    "CompiledCircuit",
    "VerifiedProof",
    "compile",
    "test_only_setup",
    "set_gnark_compat",
    "gnark_compat_enabled",
]


@dataclass
class CompiledCircuit:
    """Compiled circuit with its proving and verifying keys
    (reference algoplonk.go:20-25)."""

    ccs: CompiledConstraintSystem
    pk: ProvingKey
    vk: VerifyingKey
    curve: CurveParams

    def verify(self, assignment) -> "VerifiedProof":
        """Prove + self-verify (reference algoplonk.go:79-98: every proof is
        checked with the native verifier before export)."""
        prover = Prover(self.pk, self.ccs)
        wit = witness_mod.solve(
            self.ccs, assignment, commitment_solver=prover.bsb_solver
        )
        proof = prover.prove(wit)
        if not verify_mod.verify(self.vk, proof, wit.public_values):
            raise RuntimeError("proof failed native verification")
        return VerifiedProof(proof, wit, self.curve)

    def write_puyapy_verifier(self, filepath: str, output_type: "ContractType"):
        """Emit PuyaPy verifier source (reference algoplonk.go:63-76)."""
        with open(filepath, "w") as fh:
            write_python_code(self.vk, output_type, fh)


@dataclass
class VerifiedProof:
    """A proof plus its witness (reference algoplonk.go:28-31)."""

    proof: Proof
    witness: witness_mod.Witness
    curve: CurveParams

    def marshal_proof(self) -> bytes:
        return marshal_mod.marshal_proof(self.curve, self.proof)

    def marshal_public_inputs(self) -> bytes:
        return self.witness.public_inputs_blob()

    def export_proof_and_public_inputs(
        self, proof_path: str, public_inputs_path: str
    ):
        """Write the AVM binary blobs (reference algoplonk.go:103-132)."""
        if proof_path:
            with open(proof_path, "wb") as fh:
                fh.write(self.marshal_proof())
        if public_inputs_path:
            with open(public_inputs_path, "wb") as fh:
                fh.write(self.marshal_public_inputs())


def compile(circuit_cls, curve: CurveParams, setup_name: SetupName) -> CompiledCircuit:
    """Compile a circuit and run the (trusted or test-only) setup
    (reference algoplonk.go:37-59)."""
    if curve.name not in ("bn254", "bls12_381"):
        raise ValueError(f"unsupported curve: {curve.name}")
    info = get_setup(setup_name)
    if info is None:
        raise ValueError(f"unknown setup: {setup_name}")
    if info.curve.name != curve.name:
        raise ValueError(
            f"setup curve {info.curve.name} does not match circuit curve {curve.name}"
        )
    ccs = compile_circuit(circuit_cls, curve)
    srs = run_setup(curve, setup_name, ccs.nb_constraints, ccs.nb_public)
    from .plonk.setup import setup as plonk_setup

    pk, vk = plonk_setup(ccs, srs)
    return CompiledCircuit(ccs=ccs, pk=pk, vk=vk, curve=curve)
