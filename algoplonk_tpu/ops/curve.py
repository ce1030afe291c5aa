"""Batched G1 elliptic-curve arithmetic on TPU (Jacobian coordinates).

Replaces gnark-crypto's multicore CPU point arithmetic (the native layer under
plonk.Prove, reference algoplonk.go:89) with select-based *complete* batched
formulas: every lane computes both the generic-add and the doubling path and
selects, so a single vectorized op handles arbitrary point mixtures (including
padding lanes holding the point at infinity) with no data-dependent branching —
exactly what XLA/TPU want.

Representation: Jacobian [..., 3, L] int32 (X, Y, Z limbs, Montgomery form);
Z == 0 marks the point at infinity.  Affine points are [..., 2, L]; (0, 0)
marks affine infinity, matching the serialization convention.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from ..fields import limbs as limbs_mod
from .field import FieldOps, field_ops


def _flatten_leading_2(fn):
    """Adapt a [N, rows, L]-shaped binary pallas kernel to the CurveOps
    calling convention: arbitrary (broadcastable) leading batch dims."""

    def wrapped(p, q):
        lead = jnp.broadcast_shapes(p.shape[:-2], q.shape[:-2])
        p = jnp.broadcast_to(p, lead + p.shape[-2:])
        q = jnp.broadcast_to(q, lead + q.shape[-2:])
        n = int(np.prod(lead)) if lead else 1
        out = fn(p.reshape((n,) + p.shape[-2:]), q.reshape((n,) + q.shape[-2:]))
        return out.reshape(lead + out.shape[-2:])

    return wrapped


def _flatten_leading_1(fn):
    def wrapped(p):
        lead = p.shape[:-2]
        n = int(np.prod(lead)) if lead else 1
        out = fn(p.reshape((n,) + p.shape[-2:]))
        return out.reshape(lead + out.shape[-2:])

    return wrapped


class CurveOps:
    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.f: FieldOps = field_ops(curve.fp)
        self.L = curve.fp.nlimbs
        self.b_mont = jnp.asarray(
            limbs_mod.ints_to_mont_limbs([curve.b], curve.fp)[0]
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
        if os.environ.get("AP_PALLAS") == "1":
            # A/B switch: fused Pallas point kernels (ops/curve_pallas.py)
            # replace the XLA-composed formulas for the hot binary ops; the
            # XLA path stays the reference implementation.
            from .curve_pallas import (
                pallas_aff_add_aff,
                pallas_jac_add,
                pallas_jac_double,
            )

            self.jac_add = _flatten_leading_2(pallas_jac_add(curve))
            self.aff_add_aff = _flatten_leading_2(pallas_aff_add_aff(curve))
            self.jac_double = _flatten_leading_1(pallas_jac_double(curve))

    # -------------------------------------------------------------- converts

    def affine_to_jac(self, pts):
        """[..., 2, L] affine -> [..., 3, L] jacobian ((0,0) -> infinity)."""
        f = self.f
        x, y = pts[..., 0, :], pts[..., 1, :]
        is_inf = f.is_zero(x) & f.is_zero(y)
        one = jnp.broadcast_to(f.one, x.shape)
        z = f.select(is_inf, jnp.zeros_like(x), one)
        return jnp.stack([x, y, z], axis=-2)

    def jac_infinity(self, shape=()):
        return jnp.zeros(shape + (3, self.L), jnp.int32)

    # ------------------------------------------------------------------- ops

    def jac_double(self, p):
        """Complete Jacobian doubling (a = 0 curves)."""
        f = self.f
        X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        A = f.square(X)
        B = f.square(Y)
        C = f.square(B)
        t = f.square(f.add(X, B))
        D = f.add(f.sub(f.sub(t, A), C), f.sub(f.sub(t, A), C))  # 2((X+B)^2-A-C)
        E = f.add(f.add(A, A), A)
        F = f.square(E)
        X3 = f.sub(F, f.add(D, D))
        C8 = f.add(f.add(f.add(C, C), f.add(C, C)), f.add(f.add(C, C), f.add(C, C)))
        Y3 = f.sub(f.mul(E, f.sub(D, X3)), C8)
        Z3 = f.add(f.mul(Y, Z), f.mul(Y, Z))
        return jnp.stack([X3, Y3, Z3], axis=-2)

    def jac_add(self, p, q):
        """Complete Jacobian + Jacobian addition via branchless select."""
        f = self.f
        X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
        Z1Z1 = f.square(Z1)
        Z2Z2 = f.square(Z2)
        U1 = f.mul(X1, Z2Z2)
        U2 = f.mul(X2, Z1Z1)
        S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
        S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
        H = f.sub(U2, U1)
        R = f.sub(S2, S1)
        HH = f.square(H)
        HHH = f.mul(H, HH)
        V = f.mul(U1, HH)
        RR = f.square(R)
        X3 = f.sub(f.sub(RR, HHH), f.add(V, V))
        Y3 = f.sub(f.mul(R, f.sub(V, X3)), f.mul(S1, HHH))
        Z3 = f.mul(f.mul(Z1, Z2), H)
        generic = jnp.stack([X3, Y3, Z3], axis=-2)

        dbl = self.jac_double(p)
        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(Z2)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(R)
        both = ~p_inf & ~q_inf

        out = generic
        # same x: either doubling (same y) or P + (-P) = infinity
        out = jnp.where((both & h_zero & r_zero)[..., None, None], dbl, out)
        out = jnp.where(
            (both & h_zero & ~r_zero)[..., None, None], jnp.zeros_like(out), out
        )
        out = jnp.where(p_inf[..., None, None], q, out)
        out = jnp.where(q_inf[..., None, None], p, out)
        return out

    def jac_add_affine(self, p, q_affine):
        """Jacobian + affine mixed addition (affine (0,0) = infinity)."""
        f = self.f
        X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        X2, Y2 = q_affine[..., 0, :], q_affine[..., 1, :]
        Z1Z1 = f.square(Z1)
        U2 = f.mul(X2, Z1Z1)
        S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
        H = f.sub(U2, X1)
        R = f.sub(S2, Y1)
        HH = f.square(H)
        HHH = f.mul(H, HH)
        V = f.mul(X1, HH)
        RR = f.square(R)
        X3 = f.sub(f.sub(RR, HHH), f.add(V, V))
        Y3 = f.sub(f.mul(R, f.sub(V, X3)), f.mul(Y1, HHH))
        Z3 = f.mul(Z1, H)
        generic = jnp.stack([X3, Y3, Z3], axis=-2)

        dbl = self.jac_double(p)
        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(X2) & f.is_zero(Y2)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(R)
        both = ~p_inf & ~q_inf

        out = generic
        out = jnp.where((both & h_zero & r_zero)[..., None, None], dbl, out)
        out = jnp.where(
            (both & h_zero & ~r_zero)[..., None, None], jnp.zeros_like(out), out
        )
        out = jnp.where(p_inf[..., None, None], self.affine_to_jac(q_affine), out)
        out = jnp.where(q_inf[..., None, None], p, out)
        return out

    def aff_add_aff(self, p_affine, q_affine):
        """Complete affine + affine addition -> Jacobian.

        The cheapest add in the repertoire (Z1 = Z2 = 1 drops all the Z
        algebra: 4M+2S generic path vs 11M+5S for jac+jac) — used for the
        first level of the MSM bucket tree, where all inputs are still the
        gathered affine SRS points."""
        f = self.f
        X1, Y1 = p_affine[..., 0, :], p_affine[..., 1, :]
        X2, Y2 = q_affine[..., 0, :], q_affine[..., 1, :]
        H = f.sub(X2, X1)
        R = f.sub(Y2, Y1)
        HH = f.square(H)
        HHH = f.mul(H, HH)
        V = f.mul(X1, HH)
        RR = f.square(R)
        X3 = f.sub(f.sub(RR, HHH), f.add(V, V))
        Y3 = f.sub(f.mul(R, f.sub(V, X3)), f.mul(Y1, HHH))
        generic = jnp.stack([X3, Y3, H], axis=-2)

        dbl = self.jac_double(self.affine_to_jac(p_affine))
        p_inf = f.is_zero(X1) & f.is_zero(Y1)
        q_inf = f.is_zero(X2) & f.is_zero(Y2)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(R)
        both = ~p_inf & ~q_inf

        out = generic
        out = jnp.where((both & h_zero & r_zero)[..., None, None], dbl, out)
        out = jnp.where(
            (both & h_zero & ~r_zero)[..., None, None], jnp.zeros_like(out), out
        )
        out = jnp.where(
            p_inf[..., None, None], self.affine_to_jac(q_affine), out
        )
        out = jnp.where(
            q_inf[..., None, None], self.affine_to_jac(p_affine), out
        )
        return out

    def aff_add_denominator(self, p_affine, q_affine):
        """Denominator of the affine chord/tangent slope for P+Q, with 1
        substituted on degenerate lanes (infinity / P = -Q) so a shared batch
        inversion never sees zero.  Returns ([..., L] denoms, flags tuple).

        Used by the MSM bucket tree: one tree level = one batched inversion
        (poly.batch_inverse_tree) + aff_add_with_inv — ~2S+5M per add vs
        ~16M+9S for the complete Jacobian formulas.  Completeness relies on
        BN254/BLS12-381 G1 having no 2-torsion over Fp (odd group order), so
        doubling a y = 0 point cannot occur.
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
        """Jacobian -> affine; infinity maps to (0, 0)."""
        f = self.f
        X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        is_inf = f.is_zero(Z)
        # avoid inv(0): substitute 1 for infinity lanes
        z_safe = f.select(is_inf, jnp.broadcast_to(f.one, Z.shape), Z)
        zi = f.inv(z_safe)
        zi2 = f.square(zi)
        x = f.mul(X, zi2)
        y = f.mul(Y, f.mul(zi, zi2))
        x = f.select(is_inf, jnp.zeros_like(x), x)
        y = f.select(is_inf, jnp.zeros_like(y), y)
        return jnp.stack([x, y], axis=-2)

    def scalar_mul(self, pts_affine, scalar_bits):
        """Batched variable-base scalar mul, MSB-first double-and-add.

        pts_affine: [..., 2, L]; scalar_bits: [..., nbits] int32 (MSB first).
        Returns Jacobian [..., 3, L].
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
