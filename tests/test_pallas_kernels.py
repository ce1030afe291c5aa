"""Pallas fused kernels vs the XLA reference path.

On CPU the kernels run in pallas interpret mode (the factories interpret
whenever the backend is not TPU), so these tests validate the kernel bodies
everywhere; on real TPU the same code runs natively as the MSM inner loop
(ops/msm.py bucket_accumulate_pallas)."""

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


def test_bucket_accumulate_pallas_matches_xla(rng):
    """The full pallas bucket loop (interpret mode) == the XLA fallback."""
    curve = BN254
    ops = curve_ops(curve)
    n, nw, m = 32, 2, 8
    pts = sample_points(rng, curve, n)
    points_pad = jnp.concatenate(
        [ops.encode_affine(pts), jnp.zeros((1, 2, ops.L), jnp.int32)]
    )
    digits = jnp.asarray(
        np.asarray(
            [[rng.randrange(256) for _ in range(n)] for _ in range(nw)],
            dtype=np.int32,
        )
    )
    mc = int(msm_mod.msm_ctx(curve)._max_count(digits))
    m = max(m, mc)
    want = np.asarray(
        ops.to_affine(msm_mod.bucket_accumulate(ops, points_pad, digits, m))
    )
    got = np.asarray(
        ops.to_affine(
            msm_mod.bucket_accumulate_pallas(ops, points_pad, digits, m,
                                             tile=64)
        )
    )
    assert (got == want).all()
