"""Pallas fused kernels vs the XLA reference path.

On CPU the kernels run in pallas interpret mode (the factories default to
interpret whenever the backend is not TPU), so these tests validate the
kernel bodies everywhere; on real TPU the same code runs natively via
AP_PALLAS=1 (A/B switch in CurveOps).
"""

import numpy as np
import pytest

# interpret-mode lowering of the giant unrolled limb kernels takes tens of
# minutes on the 2-vCPU host — keep out of the default tier
pytestmark = pytest.mark.slow

from algoplonk_tpu.fields.params import BN254
from algoplonk_tpu.host import fp as hfp
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.curve_pallas import (
    pallas_aff_add_aff,
    pallas_jac_add,
    pallas_jac_double,
)
from algoplonk_tpu.ops.field import field_ops
from algoplonk_tpu.ops.field_pallas import pallas_mul


def sample_points(rng, curve, n):
    F = hfp.GF(curve.fp.modulus)
    return [hfp.ec_mul(F, curve.g1, rng.randrange(1, 1 << 64)) for _ in range(n)]


def test_pallas_field_mul(rng):
    fp = BN254.fr
    f = field_ops(fp)
    xs = [rng.randrange(fp.modulus) for _ in range(16)]
    ys = [rng.randrange(fp.modulus) for _ in range(16)]
    a, b = f.encode(xs), f.encode(ys)
    got = f.decode(pallas_mul(fp)(a, b))
    assert got == [x * y % fp.modulus for x, y in zip(xs, ys)]


def test_pallas_point_kernels_match_xla(rng):
    curve = BN254
    ops = curve_ops(curve)
    F = hfp.GF(curve.fp.modulus)
    n = 8
    P = sample_points(rng, curve, n)
    Q = sample_points(rng, curve, n)
    P[0] = None                       # inf lanes + doubling + cancellation
    Q[1] = None
    Q[2] = P[2]
    Q[3] = hfp.ec_neg(F, P[3])

    pa, qa = ops.encode_affine(P), ops.encode_affine(Q)
    pj, qj = ops.affine_to_jac(pa), ops.affine_to_jac(qa)
    want_add = [hfp.ec_add(F, p, q) for p, q in zip(P, Q)]
    want_dbl = [hfp.ec_add(F, p, p) for p in P]

    got_add = ops.decode_affine(ops.to_affine(pallas_jac_add(curve)(pj, qj)))
    assert got_add == want_add

    got_aff = ops.decode_affine(
        ops.to_affine(pallas_aff_add_aff(curve)(pa, qa))
    )
    assert got_aff == want_add

    got_dbl = ops.decode_affine(ops.to_affine(pallas_jac_double(curve)(pj)))
    assert got_dbl == want_dbl


def test_ap_pallas_env_switch(rng, monkeypatch):
    """AP_PALLAS=1 swaps the hot binary ops for pallas kernels; results must
    be identical through the flatten wrappers (multi-dim batches)."""
    from algoplonk_tpu.fields.params import CurveParams
    from algoplonk_tpu.ops import curve as curve_mod

    monkeypatch.setenv("AP_PALLAS", "1")
    ops_p = curve_mod.CurveOps(BN254)   # bypass the lru cache
    ops_x = curve_ops(BN254)

    P = sample_points(rng, BN254, 6)
    Q = sample_points(rng, BN254, 6)
    pa = ops_x.encode_affine(P)
    qa = ops_x.encode_affine(Q)
    # 2-D leading batch [2, 3]
    pj = ops_x.affine_to_jac(pa).reshape(2, 3, 3, -1)
    qj = ops_x.affine_to_jac(qa).reshape(2, 3, 3, -1)

    got = np.asarray(ops_p.jac_add(pj, qj))
    want = np.asarray(ops_x.jac_add(pj, qj))
    assert (got == want).all()

    # rank-2 (no leading batch) call, as _fold_step issues
    got1 = np.asarray(ops_p.jac_add(pj[0, 0], qj[0, 0]))
    want1 = np.asarray(ops_x.jac_add(pj[0, 0], qj[0, 0]))
    assert (got1 == want1).all()

    got_d = np.asarray(ops_p.jac_double(pj))
    want_d = np.asarray(ops_x.jac_double(pj))
    assert (got_d == want_d).all()

    got_a = np.asarray(ops_p.aff_add_aff(pa, qa))
    want_a = np.asarray(ops_x.aff_add_aff(pa, qa))
    assert (got_a == want_a).all()
