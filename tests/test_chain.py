"""Chain-layer units that run offline: ARC56 schema parsing, ABI method
selectors, SDK gating (reference algosdkwrapper/interact.go:147-184; the
networked flows require a localnet and are exercised by examples)."""

import json

import pytest

from algoplonk_tpu.chain import algosdk_wrapper as sdkw

ARC56_DOC = {
    "name": "Arc4AppWithVerifyMethod",
    "state": {
        "schema": {
            "global": {"ints": 0, "bytes": 1},
            "local": {"ints": 0, "bytes": 0},
        }
    },
    "source": {"approval": "YXBw", "clear": "Y2xy"},
    "methods": [
        {
            "name": "create",
            "args": [{"type": "string", "name": "name"}],
            "returns": {"type": "void"},
        },
        {
            "name": "verify",
            "args": [
                {"type": "byte[32][]", "name": "proof"},
                {"type": "byte[32][]", "name": "public_inputs"},
            ],
            "returns": {"type": "bool"},
        },
    ],
}


def test_read_arc56_schema(tmp_path):
    p = tmp_path / "app.arc56.json"
    p.write_text(json.dumps(ARC56_DOC))
    s = sdkw.read_arc56_schema(str(p))
    assert s.name == "Arc4AppWithVerifyMethod"
    assert s.global_bytes == 1 and s.global_ints == 0
    assert s.approval_b64 == "YXBw" and s.clear_b64 == "Y2xy"
    v = s.method("verify")
    assert v.signature == "verify(byte[32][],byte[32][])bool"
    assert len(v.selector) == 4
    # ARC4 selector = sha512/256(signature)[:4] — stable golden
    import hashlib

    want = hashlib.new(
        "sha512_256", b"verify(byte[32][],byte[32][])bool"
    ).digest()[:4]
    assert v.selector == want
    with pytest.raises(KeyError):
        s.method("nope")


def test_sdk_gating():
    """Without py-algorand-sdk installed, every networked entry point raises
    ChainUnavailable with an actionable message."""
    if sdkw.HAVE_ALGOSDK:
        pytest.skip("algosdk installed; gating not applicable")
    with pytest.raises(sdkw.ChainUnavailable):
        sdkw.get_clients()
    with pytest.raises(sdkw.ChainUnavailable):
        sdkw.get_indexer_client()
    with pytest.raises(sdkw.ChainUnavailable):
        sdkw.deploy_arc4_app_if_needed(None, "x", ".", "addr", "sk")


def test_verify_app_source_shape():
    """The inline app source mirrors the reference's
    Arc4AppWithVerifyMethod (testutils/testutils.go:155-183)."""
    from algoplonk_tpu.chain import testutils as tu

    src = tu.VERIFY_APP_SOURCE
    assert "class Arc4AppWithVerifyMethod" in src
    assert 'abimethod(create="require")' in src
    assert "UpdateApplication" in src and "DeleteApplication" in src
    assert "def verify(" in src and "Bool(True)" in src
    import ast

    ast.parse(src)
