"""Pallas fused kernels vs the XLA reference path.

On CPU the kernels run in pallas interpret mode (the factories interpret
whenever the backend is not TPU), so these tests validate the kernel bodies
everywhere; on real TPU the same code runs natively as the MSM inner loop
(ops/msm.py window_sums_scan with use_pallas=True)."""

import jax.numpy as jnp
import numpy as np
import pytest

# interpret-mode lowering is slow on the 2-vCPU host — out of the default tier
pytestmark = pytest.mark.slow

from algoplonk_tpu.fields.params import BN254
from algoplonk_tpu.host import fp as hfp
from algoplonk_tpu.ops import msm as msm_mod
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.curve_pallas import pallas_field_mul, pallas_mixed_add
from algoplonk_tpu.ops.field import field_ops


def sample_points(rng, curve, n):
    F = hfp.GF(curve.fp.modulus)
    return [hfp.ec_mul(F, curve.g1, rng.randrange(1, 1 << 64)) for _ in range(n)]


def test_pallas_field_mul(rng):
    fp = BN254.fr
    f = field_ops(fp)
    xs = [rng.randrange(fp.modulus) for _ in range(10)] + [0, fp.modulus - 1]
    ys = [rng.randrange(fp.modulus) for _ in range(10)] + [fp.modulus - 1, 0]
    a, b = f.encode(xs), f.encode(ys)
    got = f.decode(pallas_field_mul(fp, tile=8)(a, b))
    assert got == [x * y % fp.modulus for x, y in zip(xs, ys)]


def test_pallas_mixed_add_complete(rng):
    """The fused RCB mixed add handles generic, doubling, inverse and
    infinity lanes — the exact mix the MSM bucket loop feeds it."""
    curve = BN254
    ops = curve_ops(curve)
    F = hfp.GF(curve.fp.modulus)
    P = sample_points(rng, curve, 8)
    Q = sample_points(rng, curve, 8)
    P[0] = None                       # inf acc
    Q[1] = None                       # inf point (bucket padding)
    Q[2] = P[2]                       # doubling
    Q[3] = hfp.ec_neg(F, P[3])        # cancellation

    accT = jnp.transpose(ops.affine_to_jac(ops.encode_affine(P)), (1, 2, 0))
    ptsT = jnp.transpose(ops.encode_affine(Q), (1, 2, 0))
    out = pallas_mixed_add(curve, tile=8)(accT, ptsT)
    got = ops.decode_affine(ops.to_affine(jnp.transpose(out, (2, 0, 1))))
    want = [hfp.ec_add(F, p, q) for p, q in zip(P, Q)]
    assert got == want


def test_pallas_jac_add_complete(rng):
    """The fused RCB projective add handles generic, doubling, inverse and
    infinity lanes — the exact mix the scan pipeline feeds it."""
    from algoplonk_tpu.ops.curve_pallas import pallas_jac_add

    curve = BN254
    ops = curve_ops(curve)
    F = hfp.GF(curve.fp.modulus)
    P = sample_points(rng, curve, 8)
    Q = sample_points(rng, curve, 8)
    P[0] = None
    Q[1] = None
    Q[2] = P[2]                       # doubling
    Q[3] = hfp.ec_neg(F, P[3])        # cancellation

    pT = jnp.transpose(ops.affine_to_jac(ops.encode_affine(P)), (1, 2, 0))
    qT = jnp.transpose(ops.affine_to_jac(ops.encode_affine(Q)), (1, 2, 0))
    out = pallas_jac_add(curve, tile=8)(pT, qT)
    got = ops.decode_affine(ops.to_affine(jnp.transpose(out, (2, 0, 1))))
    want = [hfp.ec_add(F, p, q) for p, q in zip(P, Q)]
    assert got == want


def test_window_sums_scan_pallas_matches_xla(rng):
    """The full prefix-scan MSM with pallas adders (interpret mode) == the
    XLA adder path."""
    import algoplonk_tpu.ops.curve_pallas as cp

    curve = BN254
    ops = curve_ops(curve)
    n, k = 10, 4
    pts = sample_points(rng, curve, n)
    points_pad = jnp.concatenate(
        [ops.encode_affine(pts), jnp.zeros((1, 2, ops.L), jnp.int32)]
    )
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    digits = jnp.asarray(msm_mod.scalar_digits(scalars, c=4))
    # shrink the pallas lane tile so interpret mode stays fast
    old_tile = msm_mod._TILE
    msm_mod._TILE = 64
    try:
        got = np.asarray(ops.to_affine(msm_mod.window_sums_scan(
            ops, points_pad, digits, c=4, k_block=k, use_pallas=True
        )))
    finally:
        msm_mod._TILE = old_tile
    want = np.asarray(ops.to_affine(msm_mod.window_sums_scan(
        ops, points_pad, digits, c=4, k_block=k, use_pallas=False
    )))
    assert (got == want).all()
