"""Fused Pallas TPU kernels for the MSM inner loop.

The MSM bucket accumulation (ops/msm.py) spends its whole life in one
operation: acc <- acc + P with acc projective and P affine (complete RCB
mixed addition, ~12 field muls).  Composed from XLA primitives, every field
multiply round-trips its [*, 2L] intermediates through HBM at fusion
boundaries, capping throughput near ~27M field muls/s on a v5e chip.  This
kernel runs the entire mixed addition — all twelve multiplies, carries and
selects — inside one pallas_call with every intermediate in VMEM.

Layout: limbs-major [coord, L, B] (batch minor), so the batch axis fills the
128-lane VPU dimension and limb shifts are sublane moves — see
ops/field_pallas.py.  The grid tiles the batch axis; B must be a multiple of
the tile (ops/msm.py pads bucket lanes with the point at infinity, which the
complete formula absorbs).

Also provides pallas_field_mul, the standalone transposed field multiply
used by tests and available to other pipelines (NTT butterflies are next).
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
    """[4, L]: p, -p^-1, one (Montgomery), 3b (Montgomery)."""
    b3 = limbs_mod.ints_to_mont_limbs(
        [3 * curve.b % curve.fp.modulus], curve.fp
    )[0]
    return np.concatenate(
        [field_consts(curve.fp), np.asarray(b3, np.int32)[None]]
    )


def _mixed_add_body(f: FieldVals, b3, acc, pts):
    """RCB complete mixed add (a=0) in limbs-major values.
    acc: (X1, Y1, Z1) each [L, T]; pts: (X2, Y2).  Returns (x3, y3, z3).

    Lazy-add discipline: adds whose results feed only multiplications (or
    the outputs y3/z3) use add_lazy — no modular reduction, value < 4p,
    which Montgomery REDC absorbs (ab < R*p holds comfortably).  Adds
    feeding a strict subtraction stay strict (the sub needs operands < p),
    as do all muls (canonical output < p).  Inputs may therefore be < 2p
    (a previous call's lazy y3/z3): every input use here is a mul or a
    lazy add, so the bound holds inductively."""
    X1, Y1, Z1 = acc
    X2, Y2 = pts
    t0 = f.mul(X1, X2)
    t1 = f.mul(Y1, Y2)
    t3 = f.mul(f.add_lazy(X1, Y1), f.add_lazy(X2, Y2))
    t3 = f.sub(t3, f.add(t0, t1))            # X1Y2 + X2Y1
    t4 = f.add_lazy(f.mul(Y2, Z1), Y1)       # Y1 + Y2Z1
    t5 = f.add_lazy(f.mul(X2, Z1), X1)       # X1 + X2Z1
    t0 = f.add_lazy(f.add_lazy(t0, t0), t0)  # 3 X1X2
    t2 = f.mul(b3, Z1)                       # b3 Z1
    z3 = f.add_lazy(t1, t2)
    t1 = f.sub(t1, t2)
    y3 = f.mul(b3, t5)
    x3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
    y3 = f.add_lazy(f.mul(t1, z3), f.mul(y3, t0))
    z3 = f.add_lazy(f.mul(z3, t4), f.mul(t0, t3))
    q_inf = f.is_zero(X2) & f.is_zero(Y2)    # [T]
    x3 = jnp.where(q_inf[None], X1, x3)
    y3 = jnp.where(q_inf[None], Y1, y3)
    z3 = jnp.where(q_inf[None], Z1, z3)
    return x3, y3, z3


@functools.lru_cache(maxsize=None)
def pallas_mixed_add(curve: CurveParams, tile: int = 512):
    """Jittable fused complete mixed add:
    (acc [3, L, B], pts [2, L, B]) -> [3, L, B], B a multiple of ``tile``."""
    L = curve.fp.nlimbs
    # numpy, NOT jnp: this closure is lru_cached and may first be invoked
    # inside a jit trace — a jnp constant created there would leak that
    # trace's tracer into every later jit (observed UnexpectedTracerError
    # when two MSM bucket capacities were jitted in one process).  Staging
    # from numpy inside `run` gives each trace its own constant.
    consts_np = _curve_consts(curve)
    mats_np = field_mats(curve.fp)  # [6L, L] float32 (staged as bf16)

    # b3 travels as a pre-broadcast [L, tile] operand: slicing a row out of
    # the consts ref in-kernel (c_ref[3], or loading then slicing) crashes
    # libtpu ("Check failed: limits[i] <= dim(i)"), and broadcasting the
    # resulting [1, 1]/[L, 1] vector inside kara_cols is the round-2 Mosaic
    # "Broadcast in both sublanes and lanes" failure.  45 KB of VMEM well
    # spent.
    b3_np = np.broadcast_to(consts_np[3][:, None], (L, tile)).copy()

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
        consts = jnp.asarray(consts_np[:3])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = acc.shape[-1]
        assert b % tile == 0, (b, tile)
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, L, b), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, L), lambda i: (0, 0)),
                pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
                pl.BlockSpec((L, tile), lambda i: (0, 0)),
                pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
                pl.BlockSpec((2, L, tile), lambda i: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
            interpret=_interpret(),
        )(consts, mats, b3, acc, pts)

    return run


@functools.lru_cache(maxsize=None)
def pallas_mixed_add_signed(curve: CurveParams, tile: int = 512):
    """Fused complete mixed add with in-kernel conditional negation:
    (acc [3, L, B], pts [2, L, B], neg [1, B]) -> [3, L, B].

    The MSM gathers raw affine rows (fast row gather) and defers the
    digit-sign y -> -y to VMEM: the XLA formulation (field sub + select on
    batch-major [B, 2, L]) costs ~13 ms per 196k lanes because the 22-wide
    minor dim wastes 5/6 of every VREG; here it is two vector ops."""
    L = curve.fp.nlimbs
    consts_np = _curve_consts(curve)  # numpy — see pallas_mixed_add
    mats_np = field_mats(curve.fp)
    b3_np = np.broadcast_to(consts_np[3][:, None], (L, tile)).copy()

    def kernel(consts_ref, mats_ref, b3_ref, neg_ref, acc_ref, pts_ref,
               out_ref):
        f = FieldVals(curve.fp, consts_ref[:], mats_ref[:])
        y2 = pts_ref[1]
        y2 = jnp.where(
            neg_ref[:] != 0, f.sub(jnp.zeros_like(y2), y2), y2
        )
        x3, y3, z3 = _mixed_add_body(
            f,
            b3_ref[:],
            (acc_ref[0], acc_ref[1], acc_ref[2]),
            (pts_ref[0], y2),
        )
        out_ref[0] = x3
        out_ref[1] = y3
        out_ref[2] = z3

    def run(acc, pts, neg):
        consts = jnp.asarray(consts_np[:3])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = acc.shape[-1]
        assert b % tile == 0, (b, tile)
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, L, b), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, L), lambda i: (0, 0)),
                pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
                pl.BlockSpec((L, tile), lambda i: (0, 0)),
                pl.BlockSpec((1, tile), lambda i: (0, i)),
                pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
                pl.BlockSpec((2, L, tile), lambda i: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
            interpret=_interpret(),
        )(consts, mats, b3, neg, acc, pts)

    return run


def _jac_add_body(f: FieldVals, b3, p, q):
    """RCB complete projective + projective add (a=0, 12M) in limbs-major
    values.  p, q: (X, Y, Z) each [L, T].  Mirrors ops/curve.py jac_add.
    Lazy-add discipline as in _mixed_add_body (inputs < 2p tolerated)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = f.mul(X1, X2)
    t1 = f.mul(Y1, Y2)
    t2 = f.mul(Z1, Z2)
    t3 = f.mul(f.add_lazy(X1, Y1), f.add_lazy(X2, Y2))
    t3 = f.sub(t3, f.add(t0, t1))            # X1Y2 + X2Y1
    t4 = f.mul(f.add_lazy(Y1, Z1), f.add_lazy(Y2, Z2))
    t4 = f.sub(t4, f.add(t1, t2))            # Y1Z2 + Y2Z1
    t5 = f.mul(f.add_lazy(X1, Z1), f.add_lazy(X2, Z2))
    t5 = f.sub(t5, f.add(t0, t2))            # X1Z2 + X2Z1
    t0 = f.add_lazy(f.add_lazy(t0, t0), t0)  # 3 X1X2
    t2 = f.mul(b3, t2)                       # b3 Z1Z2
    z3 = f.add_lazy(t1, t2)
    t1 = f.sub(t1, t2)
    y3 = f.mul(b3, t5)
    x3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
    y3 = f.add_lazy(f.mul(t1, z3), f.mul(y3, t0))
    z3 = f.add_lazy(f.mul(z3, t4), f.mul(t0, t3))
    return x3, y3, z3


@functools.lru_cache(maxsize=None)
def pallas_jac_add(curve: CurveParams, tile: int = 512):
    """Jittable fused complete projective add:
    (p [3, L, B], q [3, L, B]) -> [3, L, B], B a multiple of ``tile``."""
    L = curve.fp.nlimbs
    consts_np = _curve_consts(curve)  # numpy — see pallas_mixed_add
    mats_np = field_mats(curve.fp)
    b3_np = np.broadcast_to(consts_np[3][:, None], (L, tile)).copy()

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
        consts = jnp.asarray(consts_np[:3])
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        b3 = jnp.asarray(b3_np)
        b = p.shape[-1]
        assert b % tile == 0, (b, tile)
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, L, b), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, L), lambda i: (0, 0)),
                pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
                pl.BlockSpec((L, tile), lambda i: (0, 0)),
                pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
                pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((3, L, tile), lambda i: (0, 0, i)),
            interpret=_interpret(),
        )(consts, mats, b3, p, q)

    return run


@functools.lru_cache(maxsize=None)
def pallas_field_mul(fp: FieldParams, tile: int = 2048):
    """Standalone fused Montgomery multiply in the standard [N, L] layout
    (transposed to limbs-major internally): validates the kernel field
    pipeline against ops/field.py and serves as the template for fusing
    other pipelines."""
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
                pl.BlockSpec((3, L), lambda i: (0, 0)),
                pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
                pl.BlockSpec((L, tile), lambda i: (0, i)),
                pl.BlockSpec((L, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((L, tile), lambda i: (0, i)),
            interpret=_interpret(),
        )(consts, mats, aT, bT)
        return out.T[:n]

    return jax.jit(run)
