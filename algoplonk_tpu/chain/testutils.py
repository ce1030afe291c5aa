"""Test orchestration helpers (reference testutils/testutils.go).

`test_circuit_native` is the no-chain path (pure prove/verify, reference
TestCircuitWithGnark, testutils.go:29-57).  The on-chain helpers mirror the
reference flow: generate verifier -> puyapy -> deploy dummy app -> call the
logicsig verifier with 15 fee-pooling dummy transactions in simulate mode.
They require algokit + py-algorand-sdk + a running localnet and raise
ChainUnavailable otherwise.
"""

from __future__ import annotations

import os

from .. import CompiledCircuit, VerifiedProof, compile as ap_compile
from ..utils import toolchain
from . import algosdk_wrapper as sdkw

# Dummy always-approving ARC4 app so logicsig verifiers have an app call to
# sign (reference testutils/testutils.go:155-183)
DUMMY_APP_SOURCE = '''\
import typing
from algopy import arc4
from algopy.arc4 import DynamicArray, StaticArray, Byte

Bytes32: typing.TypeAlias = StaticArray[Byte, typing.Literal[32]]


class DummyVerifiedApp(arc4.ARC4Contract):
    @arc4.abimethod(create="require")
    def create(self) -> None:
        pass

    @arc4.abimethod()
    def verify(
        self,
        proof: DynamicArray[Bytes32],
        public_inputs: DynamicArray[Bytes32],
    ) -> arc4.Bool:
        return arc4.Bool(True)
'''


def test_circuit_native(circuit_cls, curve, setup_name, assignment) -> VerifiedProof:
    """Compile + prove + natively verify, no chain (reference
    TestCircuitWithGnark, testutils/testutils.go:29-57)."""
    cc = ap_compile(circuit_cls, curve, setup_name)
    return cc.verify(assignment)


def call_logicsig_verifier(
    clients, lsig, app_id: int, method, proof: bytes, public_inputs: bytes,
    funded_addr: str, funded_signer,
):
    """Call an app with the logicsig verifier as signer, padding the group to
    16 transactions for the 320k logicsig budget
    (reference testutils/testutils.go:101-147)."""
    from algosdk.atomic_transaction_composer import LogicSigTransactionSigner

    args = toolchain.proof_and_public_inputs_for_atomic_composer(
        proof, public_inputs
    )
    dummies = sdkw.add_dummy_transactions(clients, funded_addr, funded_signer)
    return sdkw.execute_abi_call(
        clients, app_id, method, args,
        sender=lsig.address(),
        signer=LogicSigTransactionSigner(lsig),
        simulate=True,
        extra_txns=dummies,
    )


def write_dummy_app(directory: str) -> str:
    path = os.path.join(directory, "dummy_app.py")
    with open(path, "w") as fh:
        fh.write(DUMMY_APP_SOURCE)
    return path
