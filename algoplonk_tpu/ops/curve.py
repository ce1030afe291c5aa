"""Batched G1 elliptic-curve arithmetic on TPU (homogeneous projective).

Replaces gnark-crypto's multicore CPU point arithmetic (the native layer under
plonk.Prove, reference algoplonk.go:89) with the Renes-Costello-Batina (2015)
*complete* projective formulas for a = 0 short Weierstrass curves: a single
branch-free polynomial formula handles every input combination — generic adds,
doublings, inverses, and the point at infinity (0 : 1 : 0) — with no selects
and no embedded doubling path.  Completeness requires the Fp-rational point
group to have odd order, which holds for both BN254 (prime order) and
BLS12-381 G1 (odd cofactor times prime), the same property the batch-affine
MSM path already relies on.

This is both faster (12M complete add vs ~16M+5S plus an embedded doubling
for select-based complete Jacobian) and far cheaper to compile — graph size
is a first-class constraint on this host (see ops/field.py).

Representation: projective [..., 3, L] int32 (X, Y, Z limbs, Montgomery
form); Z == 0 marks the point at infinity (canonically (0, 1, 0)).  Affine
points are [..., 2, L]; (0, 0) marks affine infinity, matching the
serialization convention.  Method names retain the jac_* prefix of the
earlier Jacobian implementation so call sites read unchanged; the coordinate
convention is an internal detail (decode goes through to_affine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from ..fields import limbs as limbs_mod
from .field import FieldOps, field_ops


class CurveOps:
    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.f: FieldOps = field_ops(curve.fp)
        self.L = curve.fp.nlimbs
        self.b_mont = jnp.asarray(
            limbs_mod.ints_to_mont_limbs([curve.b], curve.fp)[0]
        )
        self.b3_mont = jnp.asarray(
            limbs_mod.ints_to_mont_limbs([3 * curve.b % curve.fp.modulus],
                                         curve.fp)[0]
        )
        g = curve.g1
        self.g1_gen_affine = jnp.asarray(
            limbs_mod.ints_to_mont_limbs([g[0], g[1]], curve.fp)
        )  # [2, L]
        self.jac_add = jax.jit(self.jac_add)
        self.jac_double = jax.jit(self.jac_double)
        self.jac_add_affine = jax.jit(self.jac_add_affine)
        self.aff_add_aff = jax.jit(self.aff_add_aff)
        self.to_affine = jax.jit(self.to_affine)
        self.scalar_mul = jax.jit(self.scalar_mul)

    # -------------------------------------------------------------- converts

    def affine_to_jac(self, pts):
        """[..., 2, L] affine -> [..., 3, L] projective ((0,0) -> (0,1,0))."""
        f = self.f
        x, y = pts[..., 0, :], pts[..., 1, :]
        is_inf = f.is_zero(x) & f.is_zero(y)
        one = jnp.broadcast_to(f.one, x.shape)
        z = f.select(is_inf, jnp.zeros_like(x), one)
        y = f.select(is_inf, one, y)
        return jnp.stack([x, y, z], axis=-2)

    def jac_infinity(self, shape=()):
        """The identity (0 : 1 : 0), broadcast over leading ``shape``."""
        f = self.f
        x = jnp.zeros(shape + (self.L,), jnp.int32)
        y = jnp.broadcast_to(f.one, shape + (self.L,)).astype(jnp.int32)
        return jnp.stack([x, y, x], axis=-2)

    # ------------------------------------------------------------------- ops

    def jac_double(self, p):
        """Complete projective doubling, a = 0 (EFD dbl-2015-rcb: 6M+2S)."""
        f = self.f
        X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        b3 = self.b3_mont  # [L]; field ops broadcast
        t0 = f.square(Y)
        z3 = f.add(t0, t0)
        z3 = f.add(z3, z3)
        z3 = f.add(z3, z3)
        t1 = f.mul(Y, Z)
        t2 = f.square(Z)
        t2 = f.mul(b3, t2)
        x3 = f.mul(t2, z3)
        y3 = f.add(t0, t2)
        z3 = f.mul(t1, z3)
        t1 = f.add(t2, t2)
        t2 = f.add(t1, t2)
        t0 = f.sub(t0, t2)
        y3 = f.mul(t0, y3)
        y3 = f.add(x3, y3)
        t1 = f.mul(X, Y)
        x3 = f.mul(t0, t1)
        x3 = f.add(x3, x3)
        return jnp.stack([x3, y3, z3], axis=-2)

    def jac_add(self, p, q):
        """Complete projective + projective addition, a = 0
        (EFD add-2015-rcb: 12M, branch-free, handles infinity/doubling)."""
        f = self.f
        X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
        b3 = self.b3_mont  # [L]; field ops broadcast
        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t2 = f.mul(Z1, Z2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))            # X1Y2 + X2Y1
        t4 = f.mul(f.add(Y1, Z1), f.add(Y2, Z2))
        t4 = f.sub(t4, f.add(t1, t2))            # Y1Z2 + Y2Z1
        t5 = f.mul(f.add(X1, Z1), f.add(X2, Z2))
        t5 = f.sub(t5, f.add(t0, t2))            # X1Z2 + X2Z1
        t0 = f.add(f.add(t0, t0), t0)            # 3 X1X2
        t2 = f.mul(b3, t2)                       # b3 Z1Z2
        z3 = f.add(t1, t2)                       # Y1Y2 + b3 Z1Z2
        t1 = f.sub(t1, t2)                       # Y1Y2 - b3 Z1Z2
        y3 = f.mul(b3, t5)                       # b3 (X1Z2 + X2Z1)
        x3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
        y3 = f.add(f.mul(t1, z3), f.mul(y3, t0))
        z3 = f.add(f.mul(z3, t4), f.mul(t0, t3))
        return jnp.stack([x3, y3, z3], axis=-2)

    def jac_add_affine(self, p, q_affine):
        """Projective + affine mixed addition (affine (0,0) = infinity):
        the RCB mixed formula (11M) plus one select for the affine-infinity
        lanes (the only case Z2 = 1 cannot represent)."""
        f = self.f
        X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        X2, Y2 = q_affine[..., 0, :], q_affine[..., 1, :]
        b3 = self.b3_mont  # [L]; field ops broadcast
        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))            # X1Y2 + X2Y1
        t4 = f.add(f.mul(Y2, Z1), Y1)            # Y1 + Y2Z1
        t5 = f.add(f.mul(X2, Z1), X1)            # X1 + X2Z1
        t0 = f.add(f.add(t0, t0), t0)            # 3 X1X2
        t2 = f.mul(b3, Z1)                       # b3 Z1
        z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        y3 = f.mul(b3, t5)
        x3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
        y3 = f.add(f.mul(t1, z3), f.mul(y3, t0))
        z3 = f.add(f.mul(z3, t4), f.mul(t0, t3))
        out = jnp.stack([x3, y3, z3], axis=-2)
        q_inf = f.is_zero(X2) & f.is_zero(Y2)
        return jnp.where(q_inf[..., None, None], p, out)

    def aff_add_aff(self, p_affine, q_affine):
        """Complete affine + affine addition -> projective (via the complete
        mixed formula; (0,0) = affine infinity on either side)."""
        return self.jac_add_affine(self.affine_to_jac(p_affine), q_affine)

    def aff_add_denominator(self, p_affine, q_affine):
        """Denominator of the affine chord/tangent slope for P+Q, with 1
        substituted on degenerate lanes (infinity / P = -Q) so a shared batch
        inversion never sees zero.  Returns ([..., L] denoms, flags tuple).

        Used by the MSM bucket tree: one tree level = one batched inversion
        (poly.batch_inverse_tree) + aff_add_with_inv — ~2S+5M+3M(inv share)
        per add vs ~12M for the complete projective formulas.  Completeness
        relies on BN254/BLS12-381 G1 having no 2-torsion over Fp (odd group
        order), so doubling a y = 0 point cannot occur.
        """
        f = self.f
        x1, y1 = p_affine[..., 0, :], p_affine[..., 1, :]
        x2, y2 = q_affine[..., 0, :], q_affine[..., 1, :]
        p_inf = f.is_zero(x1) & f.is_zero(y1)
        q_inf = f.is_zero(x2) & f.is_zero(y2)
        same_x = f.eq(x1, x2)
        same_y = f.eq(y1, y2)
        both = ~p_inf & ~q_inf
        dbl = both & same_x & same_y
        opp = both & same_x & ~same_y
        den = f.select(dbl, f.add(y1, y1), f.sub(x2, x1))
        degenerate = p_inf | q_inf | opp
        den = f.select(degenerate, jnp.broadcast_to(f.one, den.shape), den)
        return den, (p_inf, q_inf, dbl, opp)

    def aff_add_with_inv(self, p_affine, q_affine, inv_den, flags):
        """Complete affine + affine -> affine given the precomputed inverse
        of aff_add_denominator's output.  Infinity encodes as (0, 0)."""
        f = self.f
        p_inf, q_inf, dbl, opp = flags
        x1, y1 = p_affine[..., 0, :], p_affine[..., 1, :]
        x2, y2 = q_affine[..., 0, :], q_affine[..., 1, :]
        x1sq = f.square(x1)
        num = f.select(dbl, f.add(f.add(x1sq, x1sq), x1sq), f.sub(y2, y1))
        lam = f.mul(num, inv_den)
        x3 = f.sub(f.sub(f.square(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        out = jnp.stack([x3, y3], axis=-2)
        out = jnp.where(opp[..., None, None], jnp.zeros_like(out), out)
        out = jnp.where(p_inf[..., None, None], q_affine, out)
        out = jnp.where(q_inf[..., None, None], p_affine, out)
        return out

    def to_affine(self, p):
        """Projective -> affine; infinity maps to (0, 0)."""
        f = self.f
        X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        is_inf = f.is_zero(Z)
        # avoid inv(0): substitute 1 for infinity lanes
        z_safe = f.select(is_inf, jnp.broadcast_to(f.one, Z.shape), Z)
        zi = f.inv(z_safe)
        x = f.mul(X, zi)
        y = f.mul(Y, zi)
        x = f.select(is_inf, jnp.zeros_like(x), x)
        y = f.select(is_inf, jnp.zeros_like(y), y)
        return jnp.stack([x, y], axis=-2)

    def scalar_mul(self, pts_affine, scalar_bits):
        """Batched variable-base scalar mul, MSB-first double-and-add.

        pts_affine: [..., 2, L]; scalar_bits: [..., nbits] int32 (MSB first).
        Returns projective [..., 3, L].
        """
        nbits = scalar_bits.shape[-1]
        acc0 = self.jac_infinity(pts_affine.shape[:-2])

        def body(i, acc):
            acc = self.jac_double(acc)
            added = self.jac_add_affine(acc, pts_affine)
            bit = scalar_bits[..., i]
            return jnp.where((bit == 1)[..., None, None], added, acc)

        return jax.lax.fori_loop(0, nbits, body, acc0)

    # ---------------------------------------------------------- host helpers

    def encode_affine(self, points) -> jnp.ndarray:
        """List of affine int tuples (or None) -> [N, 2, L] Montgomery limbs."""
        xs, ys = [], []
        for P in points:
            if P is None:
                xs.append(0)
                ys.append(0)
            else:
                xs.append(P[0])
                ys.append(P[1])
        fp = self.curve.fp
        x_arr = limbs_mod.ints_to_mont_limbs(xs, fp)
        y_arr = limbs_mod.ints_to_mont_limbs(ys, fp)
        return jnp.asarray(np.stack([x_arr, y_arr], axis=1))

    def decode_affine(self, arr) -> list:
        """[N, 2, L] affine Montgomery limbs -> list of int tuples / None."""
        a = np.asarray(arr)
        fp = self.curve.fp
        xs = limbs_mod.mont_limbs_to_ints(a[:, 0, :], fp)
        ys = limbs_mod.mont_limbs_to_ints(a[:, 1, :], fp)
        out = []
        for x, y in zip(xs, ys):
            out.append(None if (x == 0 and y == 0) else (x, y))
        return out

    def scalar_bits_array(self, scalars, nbits=None) -> jnp.ndarray:
        """Python ints -> [N, nbits] int32 MSB-first bit array."""
        r = self.curve.fr.modulus
        nbits = nbits or r.bit_length()
        rows = []
        for s in scalars:
            s %= r
            rows.append([(s >> (nbits - 1 - i)) & 1 for i in range(nbits)])
        return jnp.asarray(rows, jnp.int32)


@functools.lru_cache(maxsize=None)
def curve_ops(curve: CurveParams) -> CurveOps:
    return CurveOps(curve)
