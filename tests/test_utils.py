"""Utils: ABI encoding, toolchain staleness logic, circuit cache roundtrip."""

import os

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.utils import cache, toolchain


def test_chunks_and_abi_encoding():
    blob = bytes(range(64))
    cs = toolchain.chunks32(blob)
    assert len(cs) == 2 and cs[0] == blob[:32]
    with pytest.raises(ValueError):
        toolchain.chunks32(b"x" * 33)

    enc = toolchain.abi_encode_byte32_array(blob)
    assert enc[:2] == (2).to_bytes(2, "big")
    assert enc[2:] == blob

    proof_args = toolchain.abi_encode_proof_and_public_inputs(blob, blob[:32])
    assert proof_args[1][:2] == (1).to_bytes(2, "big")

    composer = toolchain.proof_and_public_inputs_for_atomic_composer(blob, blob[:32])
    assert len(composer[0]) == 2 and len(composer[1]) == 1


def test_should_recompile(tmp_path):
    src = tmp_path / "v.py"
    art = tmp_path / "v.teal"
    src.write_text("x")
    assert toolchain.should_recompile(str(src), str(art))  # artifact missing
    art.write_text("y")
    os.utime(str(art), (src.stat().st_mtime + 10, src.stat().st_mtime + 10))
    assert not toolchain.should_recompile(str(src), str(art))
    os.utime(str(src), (src.stat().st_mtime + 100, src.stat().st_mtime + 100))
    assert toolchain.should_recompile(str(src), str(art))


def test_rename_puyapy_output(tmp_path):
    (tmp_path / "Verifier.teal").write_text("t")
    (tmp_path / "Verifier.arc56.json").write_text("{}")
    toolchain.rename_puyapy_output("Verifier", "MyV", str(tmp_path))
    assert (tmp_path / "MyV.teal").exists()
    assert (tmp_path / "MyV.arc56.json").exists()
    assert not (tmp_path / "Verifier.teal").exists()


class Tiny(ap.Circuit):
    x = ap.PublicInput()
    y = ap.SecretInput()

    def define(self, api):
        api.assert_is_equal(api.mul(self.y, self.y), self.x)


@pytest.mark.slow
def test_circuit_cache_roundtrip(tmp_path):
    cc = ap.compile(Tiny, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    path = tmp_path / "tiny.ccc"
    cache.write_compiled_circuit(cc, str(path))
    cc2 = cache.read_compiled_circuit(str(path))
    assert cc2.vk.size == cc.vk.size
    assert cc2.vk.ql == cc.vk.ql
    vp = cc2.verify(Tiny(x=9, y=3))
    assert len(vp.marshal_proof()) == 24 * 32
