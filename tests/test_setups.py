"""SRS loader golden tests against the original ceremony vectors.

Golden hex strings are the ones the reference pins in
/root/reference/setup/trusted_setup_test.go:53-58,93-96,132,183-222,256.
"""

import pytest

from algoplonk_tpu.fields.params import BLS12_381, BN254
from algoplonk_tpu.host.serialize import PointCodec
from algoplonk_tpu.setups import registry as reg

ETH_G1_GOLDEN = [
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb",
    "abb83706b7f96c1ef21649124cd01ac58ec3cf19fbe7ba8e172b5f9e0facb354f3da4877946c24f17411cb551e0c24df",
    "a15cb49e7b66d0c94e46613780adcbe141adf7e2c16ec29e996a6be41c92bfc11bfee4188cbb6bdfe90ef4eb8268f1db",
    "8c5e0672d24677f430d729fc8e96cae3a62b1c67997e88d71600d8e1f1954ec04742d79f804345f8e60d11873d18d0d4",
    "b0feedf1a6c84c6470dcecf26cd95c1258c6c744eb3556ae9e864545d4d4e1c1cb9aaf52265e0df4e0c726b2e9d00045",
]

ETH_G2_GOLDEN = [
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049334cf11213945d57e5ac7d055d042b7e"
    "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8",
    "a78b94342f7d47a92f8618d0cf60cd3f8c77279ffafb2f0d71e4be074979f1b2f536007e9dcd236abaabcac376993079"
    "1224556839c0c3b5bf3f3bad9727dfc5c3326539883a6b798bef5302776ede7b939374a236e96658b269c3f4a2ea859e",
]

ETH_LAST_32768 = (
    "b2cd3d87b1af48bb6f3c23d765d6ef21a7c6ca2e5e23b0c4feb20559aaf8b06f69d5a0ff7df5f90f7e3aa0225e7ddff6"
)


def test_ethereum_kzg_srs_small():
    info = reg.get(reg.SetupName.ETHEREUM_KZG_CEREMONY_BLS12_381)
    srs = reg.load_trusted(info, 5)
    codec = PointCodec(BLS12_381)
    assert len(srs.g1) == 5
    for P, want in zip(srs.g1, ETH_G1_GOLDEN):
        assert codec.g1_compressed(P).hex() == want
    assert srs.g1[0] == BLS12_381.g1
    assert srs.vk_g2[0] == (BLS12_381.g2_x, BLS12_381.g2_y)
    for Q, want in zip(srs.vk_g2, ETH_G2_GOLDEN):
        assert codec.g2_compressed(Q).hex() == want
    assert srs.vk_g1 == BLS12_381.g1


@pytest.mark.slow
def test_ethereum_kzg_srs_full():
    info = reg.get(reg.SetupName.ETHEREUM_KZG_CEREMONY_BLS12_381)
    srs = reg.load_trusted(info, 32768)
    codec = PointCodec(BLS12_381)
    assert len(srs.g1) == 32768
    assert codec.g1_compressed(srs.g1[-1]).hex() == ETH_LAST_32768


def test_missing_blob_error():
    info = reg.get(reg.SetupName.DUSK_BLS12_381)
    with pytest.raises(FileNotFoundError, match="ceremony"):
        reg.load_trusted(info, 5)


def test_unknown_and_mismatched_setup():
    assert reg.get(reg.SetupName.TEST_ONLY_BN254).trusted is False
    with pytest.raises(ValueError, match="does not match"):
        reg.run_setup(BN254, reg.SetupName.ETHEREUM_KZG_CEREMONY_BLS12_381, 4, 1)


def test_srs_sizing_rule():
    assert reg.srs_size_for(5, 2) == 8 + 3
    assert reg.srs_size_for(30, 2) == 32 + 3


@pytest.mark.slow  # ~25 s device SRS generation; the same generator is
# exercised implicitly by every TEST_ONLY compile in the default tier
def test_test_only_srs_consistency():
    srs = reg.test_only_srs(BN254, 8)
    from algoplonk_tpu.host import fp as hfp

    F1 = hfp.GF(BN254.fp.modulus)
    tau = reg._test_tau(BN254)
    assert srs.g1[0] == BN254.g1
    assert srs.g1[1] == hfp.ec_mul(F1, BN254.g1, tau)
    assert srs.g1[3] == hfp.ec_mul(F1, BN254.g1, pow(tau, 3, BN254.fr.modulus))
