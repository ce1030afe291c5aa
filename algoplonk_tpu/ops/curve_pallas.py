"""Fused Pallas TPU kernels for the MSM inner loop.

The MSM bucket accumulation (ops/msm.py) spends its whole life in one
operation: acc <- acc + P with acc projective and P affine (complete RCB
mixed addition, ~12 field muls).  Composed from XLA primitives, every field
multiply round-trips its [*, 2L] intermediates through HBM at fusion
boundaries, capping throughput near ~27M field muls/s on a v5e chip.  These
kernels run entire point additions — all multiplies, carries and selects —
inside one pallas_call with every intermediate in VMEM.

Layout: limbs-major [coord, L, B] (batch minor), so the batch axis fills the
128-lane VPU dimension and limb shifts are sublane moves — see
ops/field_pallas.py.  The grid tiles the batch axis; B must be a multiple of
the tile (ops/msm.py pads bucket lanes with the point at infinity, which the
complete formula absorbs).

Lazy-reduction discipline (round 4): inside the kernels no value is ever
reduced below p.  Muls skip the Kogge-Stone carry + conditional subtract
(FieldVals.mul_lazy), adds and subs are single relax passes (add_lazy /
sub_lazy with a borrow-biased +k*p), so accumulator coordinates ride between
loop steps as lazy residues (< 34p worst case, bounded by the headroom
R >= 2^10 p).  ops/msm.py canonicalizes once per MSM with pallas_canon
before any XLA-side math touches the values.

The *_multi variants fuse several sequential addition steps into one
pallas_call with the accumulator resident in VMEM across steps — the MSM
phase loops (ops/msm.py phases 1/2a/2c/3) dispatch one kernel per K-step
block instead of K kernels, killing the per-step HBM round trip of the
accumulator.

Also provides pallas_field_mul, the standalone transposed field multiply
used by tests and other pipelines (the NTT stage kernel builds on the same
FieldVals core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import CurveParams, FieldParams
from ..fields import limbs as limbs_mod
from .field_pallas import FieldVals, field_consts, field_mats


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _curve_consts(curve: CurveParams) -> np.ndarray:
    """[5, L]: p, -p^-1, one (Montgomery), sub_lazy bias, 3b (Montgomery)."""
    b3 = limbs_mod.ints_to_mont_limbs(
        [3 * curve.b % curve.fp.modulus], curve.fp
    )[0]
    return np.concatenate(
        [field_consts(curve.fp), np.asarray(b3, np.int32)[None]]
    )


def _mixed_add_body(f: FieldVals, b3, acc, pts, q_inf=None):
    """RCB complete mixed add (a=0) in limbs-major lazy values.
    acc: (X1, Y1, Z1) each [L, T]; pts: (X2, Y2).  Returns (x3, y3, z3).

    Lazy discipline (no strict reduction anywhere): muls are mul_lazy
    (output < 1.3p), adds add_lazy (sum of values), subs sub_lazy (+k*p
    bias; every subtrahend here is a mul output or a sum of two, < 4p as
    sub_lazy requires).  Inductive value bounds per coordinate for k = 8
    (BN254; k = 32 for BLS12-381 scales the same way inside its 2^15 p
    headroom): X < 1.3p + kp, Y, Z < 2.6p; point operands X2 < p,
    Y2 < p + kp (a signed gather may have lazy-negated Y2).  Worst product
    (X1+Y1)(X2+Y2) < 12p * 11p / R * ... stays far under the R*p REDC
    ceiling (R >= 2^10 p).

    q_inf: optional precomputed [T] bool mask of identity points; when the
    caller lazily negates Y2 it MUST precompute q_inf from the raw
    coordinates (a lazy-negated 0 is k*p, which is_zero cannot see).
    """
    X1, Y1, Z1 = acc
    X2, Y2 = pts
    if q_inf is None:
        q_inf = f.is_zero(X2) & f.is_zero(Y2)        # [T]
    t0 = f.mul_lazy(X1, X2)
    t1 = f.mul_lazy(Y1, Y2)
    t3 = f.mul_lazy(f.add_lazy(X1, Y1), f.add_lazy(X2, Y2))
    t3 = f.sub_lazy(t3, f.add_lazy(t0, t1))          # X1Y2 + X2Y1 (mod p)
    t4 = f.add_lazy(f.mul_lazy(Y2, Z1), Y1)          # Y1 + Y2Z1
    t5 = f.add_lazy(f.mul_lazy(X2, Z1), X1)          # X1 + X2Z1
    t0 = f.add_lazy(f.add_lazy(t0, t0), t0)          # 3 X1X2
    t2 = f.mul_lazy(b3, Z1)                          # b3 Z1
    z3 = f.add_lazy(t1, t2)
    t1 = f.sub_lazy(t1, t2)
    y3 = f.mul_lazy(b3, t5)
    x3 = f.sub_lazy(f.mul_lazy(t3, t1), f.mul_lazy(t4, y3))
    y3 = f.add_lazy(f.mul_lazy(t1, z3), f.mul_lazy(y3, t0))
    z3 = f.add_lazy(f.mul_lazy(z3, t4), f.mul_lazy(t0, t3))
    x3 = jnp.where(q_inf[None], X1, x3)
    y3 = jnp.where(q_inf[None], Y1, y3)
    z3 = jnp.where(q_inf[None], Z1, z3)
    return x3, y3, z3


def _jac_add_body(f: FieldVals, b3, p, q):
    """RCB complete projective + projective add (a=0, 12M) in limbs-major
    lazy values.  p, q: (X, Y, Z) each [L, T].  Mirrors ops/curve.py
    jac_add.  Same lazy discipline and bounds as _mixed_add_body (both
    operands may carry the full lazy accumulator bound)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = f.mul_lazy(X1, X2)
    t1 = f.mul_lazy(Y1, Y2)
    t2 = f.mul_lazy(Z1, Z2)
    t3 = f.mul_lazy(f.add_lazy(X1, Y1), f.add_lazy(X2, Y2))
    t3 = f.sub_lazy(t3, f.add_lazy(t0, t1))          # X1Y2 + X2Y1
    t4 = f.mul_lazy(f.add_lazy(Y1, Z1), f.add_lazy(Y2, Z2))
    t4 = f.sub_lazy(t4, f.add_lazy(t1, t2))          # Y1Z2 + Y2Z1
    t5 = f.mul_lazy(f.add_lazy(X1, Z1), f.add_lazy(X2, Z2))
    t5 = f.sub_lazy(t5, f.add_lazy(t0, t2))          # X1Z2 + X2Z1
    t0 = f.add_lazy(f.add_lazy(t0, t0), t0)          # 3 X1X2
    t2 = f.mul_lazy(b3, t2)                          # b3 Z1Z2
    z3 = f.add_lazy(t1, t2)
    t1 = f.sub_lazy(t1, t2)
    y3 = f.mul_lazy(b3, t5)
    x3 = f.sub_lazy(f.mul_lazy(t3, t1), f.mul_lazy(t4, y3))
    y3 = f.add_lazy(f.mul_lazy(t1, z3), f.mul_lazy(y3, t0))
    z3 = f.add_lazy(f.mul_lazy(z3, t4), f.mul_lazy(t0, t3))
    return x3, y3, z3


def _mk_pallas_call(kernel, n_pt_rows, L, tile, b, extra_specs=()):
    """Shared pallas_call builder: consts [5, L], mats [6L, L], b3 [L, tile],
    then ``extra_specs``, then the positional array operands."""
    grid = (b // tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, L, b), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, L), lambda i: (0, 0)),
            pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
            pl.BlockSpec((L, tile), lambda i: (0, 0)),
            *extra_specs,
            pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((n_pt_rows, L, tile), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
        interpret=_interpret(),
    )


@functools.lru_cache(maxsize=None)
def pallas_mixed_add(curve: CurveParams, tile: int = 512):
    """Jittable fused complete mixed add:
    (acc [3, L, B], pts [2, L, B]) -> [3, L, B], B a multiple of ``tile``.
    Output coordinates are lazy residues (see module doc)."""
    L = curve.fp.nlimbs
    # numpy, NOT jnp: this closure is lru_cached and may first be invoked
    # inside a jit trace — a jnp constant created there would leak that
    # trace's tracer into every later jit (observed UnexpectedTracerError
    # when two MSM bucket capacities were jitted in one process).  Staging
    # from numpy inside `run` gives each trace its own constant.
    consts_np = _curve_consts(curve)
    mats_np = field_mats(curve.fp)  # [6L, L] float32 (staged as bf16)

    # b3 travels as a pre-broadcast [L, tile] operand: slicing a row out of
    # the consts ref in-kernel (c_ref[4], or loading then slicing) crashes
    # libtpu ("Check failed: limits[i] <= dim(i)"), and broadcasting the
    # resulting [1, 1]/[L, 1] vector inside kara_cols is the round-2 Mosaic
    # "Broadcast in both sublanes and lanes" failure.  45 KB of VMEM well
    # spent.
    b3_np = np.broadcast_to(consts_np[4][:, None], (L, tile)).copy()

    def kernel(consts_ref, mats_ref, b3_ref, acc_ref, pts_ref, out_ref):
        f = FieldVals(curve.fp, consts_ref[:], mats_ref[:])
        x3, y3, z3 = _mixed_add_body(
            f,
            b3_ref[:],
            (acc_ref[0], acc_ref[1], acc_ref[2]),
            (pts_ref[0], pts_ref[1]),
        )
        out_ref[0] = x3
        out_ref[1] = y3
        out_ref[2] = z3

    def run(acc, pts):
        consts = jnp.asarray(consts_np[:4])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = acc.shape[-1]
        assert b % tile == 0, (b, tile)
        return _mk_pallas_call(kernel, 2, L, tile, b)(consts, mats, b3, acc, pts)

    return run


@functools.lru_cache(maxsize=None)
def pallas_mixed_add_signed(curve: CurveParams, tile: int = 512):
    """Fused complete mixed add with in-kernel conditional negation:
    (acc [3, L, B], pts [2, L, B], neg [1, B]) -> [3, L, B].

    The MSM gathers raw affine rows (fast row gather) and defers the
    digit-sign y -> -y to VMEM: the XLA formulation (field sub + select on
    batch-major [B, 2, L]) costs ~13 ms per 196k lanes because the 22-wide
    minor dim wastes 5/6 of every VREG; here it is two vector ops.  The
    negation is lazy (k*p - y), so the identity mask is computed from the
    raw coordinates first."""
    L = curve.fp.nlimbs
    consts_np = _curve_consts(curve)  # numpy — see pallas_mixed_add
    mats_np = field_mats(curve.fp)
    b3_np = np.broadcast_to(consts_np[4][:, None], (L, tile)).copy()

    def kernel(consts_ref, mats_ref, b3_ref, neg_ref, acc_ref, pts_ref,
               out_ref):
        f = FieldVals(curve.fp, consts_ref[:], mats_ref[:])
        x2, y2 = pts_ref[0], pts_ref[1]
        q_inf = f.is_zero(x2) & f.is_zero(y2)
        y2 = jnp.where(
            neg_ref[:] != 0, f.sub_lazy(jnp.zeros_like(y2), y2), y2
        )
        x3, y3, z3 = _mixed_add_body(
            f,
            b3_ref[:],
            (acc_ref[0], acc_ref[1], acc_ref[2]),
            (x2, y2),
            q_inf=q_inf,
        )
        out_ref[0] = x3
        out_ref[1] = y3
        out_ref[2] = z3

    def run(acc, pts, neg):
        consts = jnp.asarray(consts_np[:4])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = acc.shape[-1]
        assert b % tile == 0, (b, tile)
        extra = (pl.BlockSpec((1, tile), lambda i: (0, i)),)
        return _mk_pallas_call(kernel, 2, L, tile, b, extra)(
            consts, mats, b3, neg, acc, pts
        )

    return run


@functools.lru_cache(maxsize=None)
def pallas_mixed_add_signed_multi(curve: CurveParams, tile: int, steps: int):
    """``steps`` sequential signed mixed adds fused into one pallas_call:
    (acc [3, L, B], pts [steps*2, L, B], neg [steps, B]) -> [3, L, B].

    The accumulator stays in VMEM across all steps — one kernel dispatch
    and one acc HBM round trip per block of steps instead of per step
    (the MSM phase-1/3 loops, ops/msm.py)."""
    L = curve.fp.nlimbs
    consts_np = _curve_consts(curve)  # numpy — see pallas_mixed_add
    mats_np = field_mats(curve.fp)
    b3_np = np.broadcast_to(consts_np[4][:, None], (L, tile)).copy()

    def kernel(consts_ref, mats_ref, b3_ref, neg_ref, acc_ref, pts_ref,
               out_ref):
        f = FieldVals(curve.fp, consts_ref[:], mats_ref[:])
        b3 = b3_ref[:]
        acc = (acc_ref[0], acc_ref[1], acc_ref[2])
        for k in range(steps):
            x2, y2 = pts_ref[2 * k], pts_ref[2 * k + 1]
            q_inf = f.is_zero(x2) & f.is_zero(y2)
            y2 = jnp.where(
                neg_ref[k][None] != 0, f.sub_lazy(jnp.zeros_like(y2), y2), y2
            )
            acc = _mixed_add_body(f, b3, acc, (x2, y2), q_inf=q_inf)
        out_ref[0], out_ref[1], out_ref[2] = acc

    def run(acc, pts, neg):
        consts = jnp.asarray(consts_np[:4])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = acc.shape[-1]
        assert b % tile == 0, (b, tile)
        assert pts.shape[0] == 2 * steps and neg.shape[0] == steps
        extra = (pl.BlockSpec((steps, tile), lambda i: (0, i)),)
        return _mk_pallas_call(kernel, 2 * steps, L, tile, b, extra)(
            consts, mats, b3, neg, acc, pts
        )

    return run


@functools.lru_cache(maxsize=None)
def pallas_jac_add(curve: CurveParams, tile: int = 512):
    """Jittable fused complete projective add:
    (p [3, L, B], q [3, L, B]) -> [3, L, B], B a multiple of ``tile``."""
    L = curve.fp.nlimbs
    consts_np = _curve_consts(curve)  # numpy — see pallas_mixed_add
    mats_np = field_mats(curve.fp)
    b3_np = np.broadcast_to(consts_np[4][:, None], (L, tile)).copy()

    def kernel(consts_ref, mats_ref, b3_ref, p_ref, q_ref, out_ref):
        f = FieldVals(curve.fp, consts_ref[:], mats_ref[:])
        x3, y3, z3 = _jac_add_body(
            f,
            b3_ref[:],
            (p_ref[0], p_ref[1], p_ref[2]),
            (q_ref[0], q_ref[1], q_ref[2]),
        )
        out_ref[0] = x3
        out_ref[1] = y3
        out_ref[2] = z3

    def run(p, q):
        consts = jnp.asarray(consts_np[:4])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = p.shape[-1]
        assert b % tile == 0, (b, tile)
        return _mk_pallas_call(kernel, 3, L, tile, b)(consts, mats, b3, p, q)

    return run


@functools.lru_cache(maxsize=None)
def pallas_jac_add_multi(curve: CurveParams, tile: int, steps: int):
    """``steps`` sequential projective adds fused into one pallas_call:
    (acc [3, L, B], qs [steps*3, L, B]) -> [3, L, B], accumulator resident
    in VMEM across steps (MSM phases 2a/2c, ops/msm.py)."""
    L = curve.fp.nlimbs
    consts_np = _curve_consts(curve)  # numpy — see pallas_mixed_add
    mats_np = field_mats(curve.fp)
    b3_np = np.broadcast_to(consts_np[4][:, None], (L, tile)).copy()

    def kernel(consts_ref, mats_ref, b3_ref, acc_ref, qs_ref, out_ref):
        f = FieldVals(curve.fp, consts_ref[:], mats_ref[:])
        b3 = b3_ref[:]
        acc = (acc_ref[0], acc_ref[1], acc_ref[2])
        for k in range(steps):
            q = (qs_ref[3 * k], qs_ref[3 * k + 1], qs_ref[3 * k + 2])
            acc = _jac_add_body(f, b3, acc, q)
        out_ref[0], out_ref[1], out_ref[2] = acc

    def run(acc, qs):
        consts = jnp.asarray(consts_np[:4])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = acc.shape[-1]
        assert b % tile == 0, (b, tile)
        assert qs.shape[0] == 3 * steps
        return _mk_pallas_call(kernel, 3 * steps, L, tile, b)(
            consts, mats, b3, acc, qs
        )

    return run


@functools.lru_cache(maxsize=None)
def pallas_jac_add_multi_scan(curve: CurveParams, tile: int, steps: int):
    """Like pallas_jac_add_multi, but emits the accumulator AFTER EVERY
    step: (acc [3, L, B], qs [steps*3, L, B]) -> [steps*3, L, B] where
    out[3k:3k+3] = acc (+) qs[0..k].  Inclusive scans of block sums stay in
    VMEM for the whole pass; MSM phase 2a materializes them so the 2c
    rescan collapses to one row gather (ops/msm.py round-5 redesign)."""
    L = curve.fp.nlimbs
    consts_np = _curve_consts(curve)  # numpy — see pallas_mixed_add
    mats_np = field_mats(curve.fp)
    b3_np = np.broadcast_to(consts_np[4][:, None], (L, tile)).copy()

    def kernel(consts_ref, mats_ref, b3_ref, acc_ref, qs_ref, out_ref):
        f = FieldVals(curve.fp, consts_ref[:], mats_ref[:])
        b3 = b3_ref[:]
        acc = (acc_ref[0], acc_ref[1], acc_ref[2])
        for k in range(steps):
            q = (qs_ref[3 * k], qs_ref[3 * k + 1], qs_ref[3 * k + 2])
            acc = _jac_add_body(f, b3, acc, q)
            out_ref[3 * k], out_ref[3 * k + 1], out_ref[3 * k + 2] = acc

    def run(acc, qs):
        consts = jnp.asarray(consts_np[:4])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = acc.shape[-1]
        assert b % tile == 0, (b, tile)
        assert qs.shape[0] == 3 * steps
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3 * steps, L, b), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, L), lambda i: (0, 0)),
                pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
                pl.BlockSpec((L, tile), lambda i: (0, 0)),
                pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
                pl.BlockSpec((3 * steps, L, tile), lambda i: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((3 * steps, L, tile), lambda i: (0, 0, i)),
            interpret=_interpret(),
        )(consts, mats, b3, acc, qs)

    return run


@functools.lru_cache(maxsize=None)
def pallas_canon(fp: FieldParams, tile: int = 512):
    """Canonicalize lazy limbs-major coordinates: [R, L, B] -> [R, L, B]
    with every element reduced to canonical Montgomery form (< p, limbs
    < 2^12).  One strict Montgomery multiply by the Montgomery one (= R mod
    p): mont_mul(x, R mod p) = x mod p exactly, for any lazy x < R/p * p.
    Applied once per MSM before XLA-side math consumes kernel outputs
    (ops/msm.py phase 4)."""
    L = fp.nlimbs
    consts_np = field_consts(fp)  # numpy — see pallas_mixed_add
    mats_np = field_mats(fp)
    one_np = np.broadcast_to(consts_np[2][:, None], (L, tile)).copy()

    def kernel(consts_ref, mats_ref, one_ref, x_ref, out_ref):
        f = FieldVals(fp, consts_ref[:], mats_ref[:])
        one = one_ref[:]
        for i in range(x_ref.shape[0]):
            out_ref[i] = f.mul(x_ref[i], one)

    def run(x):
        consts = jnp.asarray(consts_np)
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        one = jnp.asarray(one_np)
        rows, b = x.shape[0], x.shape[-1]
        assert b % tile == 0, (b, tile)
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, L, b), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, L), lambda i: (0, 0)),
                pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
                pl.BlockSpec((L, tile), lambda i: (0, 0)),
                pl.BlockSpec((rows, L, tile), lambda i: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((rows, L, tile), lambda i: (0, 0, i)),
            interpret=_interpret(),
        )(consts, mats, one, x)

    return run


@functools.lru_cache(maxsize=None)
def pallas_field_mul(fp: FieldParams, tile: int = 2048):
    """Standalone fused strict Montgomery multiply in the standard [N, L]
    layout (transposed to limbs-major internally): validates the kernel
    field pipeline against ops/field.py and serves as the template for
    fusing other pipelines."""
    L = fp.nlimbs
    consts_np = field_consts(fp)  # numpy — see pallas_mixed_add
    mats_np = field_mats(fp)

    def kernel(consts_ref, mats_ref, a_ref, b_ref, out_ref):
        f = FieldVals(fp, consts_ref[:], mats_ref[:])
        out_ref[:] = f.mul(a_ref[:], b_ref[:])

    def run(a, b):
        # a, b: [N, L] canonical Montgomery
        consts = jnp.asarray(consts_np)
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        n = a.shape[0]
        pad = (-n) % tile
        aT = jnp.pad(a, [(0, pad), (0, 0)]).T
        bT = jnp.pad(b, [(0, pad), (0, 0)]).T
        grid = ((n + pad) // tile,)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n + pad), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, L), lambda i: (0, 0)),
                pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
                pl.BlockSpec((L, tile), lambda i: (0, i)),
                pl.BlockSpec((L, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((L, tile), lambda i: (0, i)),
            interpret=_interpret(),
        )(consts, mats, aT, bT)
        return out.T[:n]

    return jax.jit(run)
