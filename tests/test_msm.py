"""MSM correctness: the prefix-scan device pipeline and the host Pippenger
against naive host EC (reference role: gnark-crypto's bucket MSM behind
plonk.Prove, /root/reference/algoplonk.go:89)."""

import jax.numpy as jnp
import numpy as np
import pytest

from algoplonk_tpu.fields.params import BLS12_381, BN254
from algoplonk_tpu.host import fp as hfp
from algoplonk_tpu.ops import msm as M
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.field import field_ops

CURVES = [BN254, BLS12_381]


def sample_points(rng, curve, n):
    F = hfp.GF(curve.fp.modulus)
    return [hfp.ec_mul(F, curve.g1, rng.randrange(1, 1 << 64)) for _ in range(n)]


def naive(curve, pts, scalars):
    F = hfp.GF(curve.fp.modulus)
    return hfp.ec_msm(F, pts, scalars)


def scan_msm(curve, pts, scalars, c=4):
    """Force the device (XLA) prefix-scan pipeline + host fold.  Small c
    keeps the CPU compile proportionate (same code path as c = 11)."""
    ops = curve_ops(curve)
    ctx = M.msm_ctx(curve)
    points = jnp.asarray(ops.encode_affine(pts))
    digits = jnp.asarray(M.scalar_digits(scalars, c=c))
    inf = jnp.zeros((1, 2, ops.L), jnp.int32)
    ws = M.window_sums_scan(
        ops, jnp.concatenate([points, inf]), digits, c=c, k_block=4
    )
    return ctx._host_fold(ws, c)


@pytest.mark.parametrize(
    "curve",
    [CURVES[0], pytest.param(CURVES[1], marks=pytest.mark.slow)],
    ids=lambda c: c.name,
)
def test_scan_pipeline_random(rng, curve):
    n = 13  # not a multiple of the block size
    pts = sample_points(rng, curve, n)
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    scalars[0] = 0
    pts[1] = None
    assert scan_msm(curve, pts, scalars) == naive(curve, pts, scalars)


@pytest.mark.slow
def test_scan_pipeline_concentrated(rng):
    """All scalars equal — every digit of a window lands in ONE bucket (the
    round-2 design's pathological case: data-dependent capacity M = N)."""
    curve = BN254
    n = 24
    pts = sample_points(rng, curve, n)
    s = rng.randrange(curve.fr.modulus)
    scalars = [s] * n
    assert scan_msm(curve, pts, scalars) == naive(curve, pts, scalars)


@pytest.mark.slow
def test_scan_pipeline_zero_and_tiny(rng):
    curve = BN254
    pts = sample_points(rng, curve, 3)
    assert scan_msm(curve, pts, [0, 0, 0]) is None
    assert scan_msm(curve, pts, [1, 0, 0]) == pts[0]
    got = scan_msm(curve, pts, [1, 1, curve.fr.modulus - 1])
    F = hfp.GF(curve.fp.modulus)
    want = hfp.ec_add(F, hfp.ec_add(F, pts[0], pts[1]), hfp.ec_neg(F, pts[2]))
    assert got == want


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_host_msm(rng, curve):
    for n in (1, 2, 7, 40):
        pts = sample_points(rng, curve, n)
        scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
        if n > 2:
            pts[2] = None
            scalars[1] = 0
        assert M.host_msm(curve, pts, scalars) == naive(curve, pts, scalars)


@pytest.mark.slow
def test_ctx_kinds(rng):
    """msm_to_affine_int accepts ints / mont limbs / digit arrays and
    agrees across the host-threshold boundary."""
    curve = BN254
    ops = curve_ops(curve)
    f = field_ops(curve.fr)
    ctx = M.msm_ctx(curve)
    n = 9
    pts = sample_points(rng, curve, n)
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    points = jnp.asarray(ops.encode_affine(pts))
    want = naive(curve, pts, scalars)

    assert ctx.msm_to_affine_int(points, scalars) == want          # ints/host
    mont = jnp.asarray(f.encode(scalars))
    assert ctx.msm_to_affine_int(points, mont, kind="mont") == want
    digits = M.scalar_digits(scalars, c=3)
    assert ctx.msm_to_affine_int(
        points, digits, kind="digits", window_bits=3
    ) == want                                                      # device

    import algoplonk_tpu.ops.msm as msm_mod
    old = msm_mod.HOST_MSM_MAX
    try:
        msm_mod.HOST_MSM_MAX = 0                                   # force device
        assert ctx.msm_to_affine_int(points, scalars) == want
        assert ctx.msm_to_affine_int(points, mont, kind="mont") == want
    finally:
        msm_mod.HOST_MSM_MAX = old


def test_chunked_msm_matches_naive(rng, monkeypatch):
    """Above 2^AP_MSM_CHUNK_LOG points the MSM runs chunk-wise through ONE
    compiled pipeline with per-window projective sums added across chunks
    (the path every large prover commit takes).  Forced small here: 13
    points with chunk = 8 -> a full chunk + a bucketed remainder."""
    monkeypatch.setenv("AP_MSM_CHUNK_LOG", "3")
    monkeypatch.setattr(M, "HOST_MSM_MAX", 0)
    curve = BN254
    n = 13
    pts = sample_points(rng, curve, n)
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    scalars[2] = 0
    pts[5] = None
    ops = curve_ops(curve)
    ctx = M.MsmCtx(curve)
    points = jnp.asarray(ops.encode_affine(pts))
    got = ctx.msm_to_affine_int(points, scalars, kind="ints", window_bits=4)
    assert got == naive(curve, pts, scalars)


@pytest.mark.slow  # device fold is off the prover path (prover uses
# _host_fold, covered by test_scan_pipeline_random); ~2 min of compile
def test_fold_windows_matches_host_fold(rng):
    curve = BN254
    ops = curve_ops(curve)
    ctx = M.msm_ctx(curve)
    n = 6
    pts = sample_points(rng, curve, n)
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    points = jnp.asarray(ops.encode_affine(pts))
    digits = jnp.asarray(M.scalar_digits(scalars, c=4))
    inf = jnp.zeros((1, 2, ops.L), jnp.int32)
    ws = M.window_sums_scan(ops, jnp.concatenate([points, inf]), digits, c=4)
    dev = ops.decode_affine(ops.to_affine(M.fold_windows(ops, ws, 4)[None]))[0]
    assert dev == ctx._host_fold(ws, 4)
