"""Ceremony-audit tests (reference setup/*/audit.go behavior).

The Ethereum KZG audit runs against the *real bundled blobs* by synthesizing
the sequencer transcript from them (the inverse of the audit direction, so
byte-comparison exercises the true artifacts).  Dusk and PPoT audits run on
synthetic small-scale artifacts in a temp data dir.
"""

import json
import os
import shutil
import struct

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.host import fp as hfp
from algoplonk_tpu.host.serialize import PointCodec
from algoplonk_tpu.setups import audit
from algoplonk_tpu.setups.registry import DATA_DIR

ETH_DIR = os.path.join(DATA_DIR, "EthereumKzgCeremonyBLS12_381")


def _eth_transcript(tmp_path, tamper=False):
    pk = open(os.path.join(ETH_DIR, "pk.bin"), "rb").read()
    vk = open(os.path.join(ETH_DIR, "vk.bin"), "rb").read()
    n = struct.unpack(">I", pk[:4])[0]
    g1 = [pk[4 + i * 48 : 4 + (i + 1) * 48] for i in range(n)]
    if tamper:
        g1[5] = bytes([g1[5][0]]) + bytes([g1[5][1] ^ 1]) + g1[5][2:]
    g2 = [vk[:96], vk[96:192]]
    doc = {
        "transcripts": [
            {  # decoy with the wrong size must be skipped
                "numG1Powers": 4096,
                "numG2Powers": 65,
                "powersOfTau": {"G1Powers": [], "G2Powers": []},
            },
            {
                "numG1Powers": n,
                "numG2Powers": 65,
                "powersOfTau": {
                    "G1Powers": ["0x" + b.hex() for b in g1],
                    "G2Powers": ["0x" + b.hex() for b in g2],
                },
            },
        ]
    }
    p = tmp_path / "transcript.json"
    p.write_text(json.dumps(doc))
    return str(p)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ETH_DIR, "pk.bin")),
    reason="bundled Ethereum KZG pk.bin absent",
)
def test_audit_ethereum_kzg_real_blobs(tmp_path):
    pk, vk = audit.audit_ethereum_kzg(
        _eth_transcript(tmp_path), log=lambda *a: None
    )
    assert pk == open(os.path.join(ETH_DIR, "pk.bin"), "rb").read()
    assert vk == open(os.path.join(ETH_DIR, "vk.bin"), "rb").read()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ETH_DIR, "pk.bin")),
    reason="bundled Ethereum KZG pk.bin absent",
)
def test_audit_ethereum_kzg_detects_tamper(tmp_path):
    with pytest.raises(audit.AuditError, match="pk mismatch"):
        audit.audit_ethereum_kzg(
            _eth_transcript(tmp_path, tamper=True), log=lambda *a: None
        )


def test_audit_ethereum_kzg_missing_transcript(tmp_path):
    p = tmp_path / "transcript.json"
    p.write_text(json.dumps({"transcripts": []}))
    with pytest.raises(audit.AuditError, match="numG1Powers"):
        audit.audit_ethereum_kzg(str(p), log=lambda *a: None)


def test_audit_dusk_synthetic(tmp_path, monkeypatch):
    """Small-scale Dusk response layout: 64B hash ‖ G1 powers ‖ (at the
    fixed offset) 2 G2 points; vk = G2_0 ‖ G2_1 ‖ G1_0."""
    n_tau = 8
    monkeypatch.setattr(audit, "DUSK_MAX_TAU_POWERS", n_tau)
    data = tmp_path / "data"
    (data / "DuskBLS12_381").mkdir(parents=True)
    monkeypatch.setattr(audit, "DATA_DIR", str(data))

    codec = PointCodec(ap.BLS12_381)
    F = hfp.GF(ap.BLS12_381.fp.modulus)
    F2 = hfp.GF2(ap.BLS12_381.fp.modulus, ap.BLS12_381.fp2_nonresidue)
    tau = 7919
    g1 = [
        codec.g1_compressed(hfp.ec_mul(F, ap.BLS12_381.g1, pow(tau, i, ap.BLS12_381.fr.modulus)))
        for i in range(n_tau + 1)
    ]
    g2_gen = (ap.BLS12_381.g2_x, ap.BLS12_381.g2_y)
    g2 = [
        codec.g2_compressed(g2_gen),
        codec.g2_compressed(hfp.ec_mul(F2, g2_gen, tau)),
    ]
    g2_off = ((n_tau << 1) - 1) * 48 + 64
    resp = bytearray(g2_off + 192)
    resp[0:64] = b"\x11" * 64
    at = 64
    for b in g1:
        resp[at : at + 48] = b
        at += 48
    resp[g2_off : g2_off + 96] = g2[0]
    resp[g2_off + 96 : g2_off + 192] = g2[1]
    rp = tmp_path / "response"
    rp.write_bytes(bytes(resp))

    vk_bytes = g2[0] + g2[1] + g1[0]
    (data / "DuskBLS12_381" / "vk.bin").write_bytes(vk_bytes)
    pk_bytes = struct.pack(">I", n_tau + 1) + b"".join(g1)
    (data / "DuskBLS12_381" / "pk.bin").write_bytes(pk_bytes)

    pk, vk = audit.audit_dusk(str(rp), log=lambda *a: None)
    assert pk == pk_bytes and vk == vk_bytes

    # tamper: flip a byte in the stored vk
    bad = bytearray(vk_bytes)
    bad[-1] ^= 1
    (data / "DuskBLS12_381" / "vk.bin").write_bytes(bytes(bad))
    with pytest.raises(audit.AuditError, match="vk mismatch"):
        audit.audit_dusk(str(rp), log=lambda *a: None)


def _write_ptau(path, power, tau):
    """Synthesize a snarkjs .ptau: LE Montgomery coordinates."""
    q = ap.BN254.fp.modulus
    n8 = 32
    R = 1 << (8 * n8)
    F = hfp.GF(q)
    F2 = hfp.GF2(q, ap.BN254.fp2_nonresidue)
    r_mod = ap.BN254.fr.modulus

    def mont(v):
        return (v * R % q).to_bytes(n8, "little")

    n_g1 = (1 << power) * 2 - 1
    g1_data = b""
    for i in range(n_g1):
        P = hfp.ec_mul(F, ap.BN254.g1, pow(tau, i, r_mod))
        g1_data += mont(P[0]) + mont(P[1])
    g2_gen = (ap.BN254.g2_x, ap.BN254.g2_y)
    g2_data = b""
    for i in range(1 << power):
        Q = hfp.ec_mul(F2, g2_gen, pow(tau, i, r_mod))
        g2_data += mont(Q[0][0]) + mont(Q[0][1]) + mont(Q[1][0]) + mont(Q[1][1])

    header = struct.pack("<I", n8) + q.to_bytes(n8, "little") + struct.pack(
        "<II", power, power
    )
    blob = b"ptau" + struct.pack("<II", 1, 3)
    for sid, data in ((1, header), (2, g1_data), (3, g2_data)):
        blob += struct.pack("<IQ", sid, len(data)) + data
    path.write_bytes(blob)


def test_audit_ppot_synthetic(tmp_path, monkeypatch):
    data = tmp_path / "data"
    (data / "PerpetualPowersOfTauBN254").mkdir(parents=True)
    monkeypatch.setattr(audit, "DATA_DIR", str(data))

    power, tau = 3, 1234577
    pt = tmp_path / "tiny.ptau"
    _write_ptau(pt, power, tau)

    codec = PointCodec(ap.BN254)
    F = hfp.GF(ap.BN254.fp.modulus)
    F2 = hfp.GF2(ap.BN254.fp.modulus, ap.BN254.fp2_nonresidue)
    r_mod = ap.BN254.fr.modulus
    g1c = [
        codec.g1_compressed(hfp.ec_mul(F, ap.BN254.g1, pow(tau, i, r_mod)))
        for i in range(1 << power)
    ]
    g2_gen = (ap.BN254.g2_x, ap.BN254.g2_y)
    vk_bytes = (
        codec.g2_compressed(g2_gen)
        + codec.g2_compressed(hfp.ec_mul(F2, g2_gen, tau))
        + g1c[0]
    )
    pk_bytes = struct.pack(">I", len(g1c)) + b"".join(g1c)
    (data / "PerpetualPowersOfTauBN254" / "vk.bin").write_bytes(vk_bytes)
    (data / "PerpetualPowersOfTauBN254" / "pk.bin").write_bytes(pk_bytes)

    pk, vk = audit.audit_ppot(str(pt), log=lambda *a: None)
    assert pk == pk_bytes and vk == vk_bytes


def test_audit_ppot_writes_pk_audit_when_blob_absent(tmp_path, monkeypatch):
    data = tmp_path / "data"
    (data / "PerpetualPowersOfTauBN254").mkdir(parents=True)
    monkeypatch.setattr(audit, "DATA_DIR", str(data))

    power, tau = 2, 31337
    pt = tmp_path / "tiny.ptau"
    _write_ptau(pt, power, tau)

    codec = PointCodec(ap.BN254)
    F2 = hfp.GF2(ap.BN254.fp.modulus, ap.BN254.fp2_nonresidue)
    g2_gen = (ap.BN254.g2_x, ap.BN254.g2_y)
    vk_bytes = (
        codec.g2_compressed(g2_gen)
        + codec.g2_compressed(hfp.ec_mul(F2, g2_gen, tau))
        + codec.g1_compressed(ap.BN254.g1)
    )
    (data / "PerpetualPowersOfTauBN254" / "vk.bin").write_bytes(vk_bytes)

    pk, vk = audit.audit_ppot(str(pt), log=lambda *a: None)
    out = data / "PerpetualPowersOfTauBN254" / "pk.audit"
    assert out.exists() and out.read_bytes() == pk


def test_audit_cli_usage():
    assert audit.main([]) == 2
    assert audit.main(["nope", "x"]) == 2
