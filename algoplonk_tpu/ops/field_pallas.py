"""Value-level field arithmetic for Pallas TPU kernel bodies.

These helpers implement the same 12-bit-limb Montgomery pipeline as
ops/field.py, but in the *limbs-major* layout ``[L, T]``: the batch axis T is
minor, so it maps onto the 128-wide VPU lane dimension at full utilization
(L = 22/32 as the lane axis would waste 5/6 of every vector op), and limb
shifts become sublane moves.  Carries use the same relaxation + Kogge-Stone
structure as the XLA path (see ops/field.py module docs for the bound
analysis; the math is identical, only the axis changes).

They are plain jnp functions on loaded values, so a composite kernel
(ops/curve_pallas.py) can inline a whole point formula into one pallas_call
with every intermediate resident in VMEM — the XLA path round-trips HBM
between fusions, which is the dominant cost of the field pipeline at batch
sizes past a few thousand.

Field constants cannot be captured as array closures inside Pallas kernels;
they travel as one ``[3, L]`` int32 operand (`consts`), rebound in-kernel via
``FieldVals(fp, consts_ref[:])``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import LIMB_BITS, LIMB_MASK, FieldParams
from ..fields import limbs as limbs_mod


def sub_bias_limbs(fp: FieldParams) -> tuple[np.ndarray, int]:
    """Borrow-biased limb representation of k*p for the lazy subtraction.

    ``sub_lazy(a, b) = relax(a - b + B, 1)`` needs every limb of the bias B
    to dominate the corresponding limb of b so the per-limb differences stay
    non-negative (negative limbs would break the exact 0-or-R carry-out test
    inside ``mul``).  Construction: take the canonical limbs of k*p and move
    2^13 of headroom into every limb below the top (B_i += 2^13, B_{i+1} -= 2
    — value preserved since 2^13 * 2^(12 i) = 2 * 2^(12 (i+1))).  Mid limbs
    then carry >= 2^13 - 2 of headroom, enough for any relaxed limb
    (<= 2^12 + 96); the top limb cannot be biased (p's top limb is tiny), so
    k is grown until k*p's top limb covers the top limb of any subtrahend of
    value < 4p, plus the -2 borrow.  Returns (B [L] int32, k).
    """
    L = fp.nlimbs
    top = LIMB_BITS * (L - 1)
    b_top_max = (4 * fp.modulus) >> top   # max top limb of a value < 4p
    k = 1
    while ((k * fp.modulus) >> top) < b_top_max + 2:
        k *= 2
    kp = k * fp.modulus
    assert kp < fp.R, (fp.name, k)
    c = np.asarray(limbs_mod.int_to_limbs(kp, fp), np.int64)
    bias = c.copy()
    bias[: L - 1] += 1 << (LIMB_BITS + 1)
    bias[1:] -= 2
    assert (bias[:-1] >= (1 << LIMB_BITS) + 96 + 2).all() and \
        bias[L - 1] >= b_top_max, (fp.name, bias)
    assert sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(bias)) == kp
    return bias.astype(np.int32), k


def field_consts(fp: FieldParams) -> np.ndarray:
    """[4, L]: modulus limbs, -p^-1 mod R limbs, Montgomery one, and the
    borrow-biased k*p limbs consumed by ``FieldVals.sub_lazy``."""
    return np.stack(
        [
            np.asarray(limbs_mod.int_to_limbs(fp.modulus, fp), np.int32),
            np.asarray(limbs_mod.int_to_limbs(fp.n_prime, fp), np.int32),
            np.asarray(limbs_mod.int_to_limbs(fp.r, fp), np.int32),
            sub_bias_limbs(fp)[0],
        ]
    )


def field_mats(fp: FieldParams) -> np.ndarray:
    """[6L, L] bf16 constant-Toeplitz matrices for the MXU REDC path.

    Montgomery REDC multiplies by two *constants*: m = t_low * (-p^-1 mod R)
    (low half) and m * p (full) — as limbs-major matrix products these are
    out[k, t] = sum_i C[k, i] x[i, t] with C[k, i] = const_{k-i}, i.e. plain
    [nk, L] @ [L, T] matmuls with data-independent matrices, which belong on
    the MXU, not the VPU.  For bf16 exactness each 12-bit constant limb is
    split 6/6: C = C_lo + 64 C_hi (entries <= 63), and the kernel splits the
    data likewise, so every dot accumulates integers < 2^24 exactly in fp32.

    Row layout: M1_lo [L], M1_hi [L] (np' Toeplitz, low half),
                M2_lo [2L], M2_hi [2L] (p Toeplitz, full).
    """
    L = fp.nlimbs
    np_limbs = np.asarray(limbs_mod.int_to_limbs(fp.n_prime, fp), np.int64)
    p_limbs = np.asarray(limbs_mod.int_to_limbs(fp.modulus, fp), np.int64)

    def toeplitz(c, nk):
        M = np.zeros((nk, L), np.int64)
        for k in range(nk):
            for i in range(max(0, k - len(c) + 1), min(L, k + 1)):
                M[k, i] = c[k - i]
        return M

    m1 = toeplitz(np_limbs, L)
    m2 = toeplitz(p_limbs, 2 * L)
    rows = [m1 & 63, m1 >> 6, m2 & 63, m2 >> 6]
    # float32 here; callers stage it as bf16 (entries <= 63 are exact)
    return np.concatenate(rows).astype(np.float32)


def _shift_up0(x, s: int):
    """Limb k -> limb k+s along axis 0 (drops the top s limbs; dropped
    carries are provably zero — ops/field.py _relax)."""
    pads = [(s, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads)[: x.shape[0]]


class FieldVals:
    """Limbs-major ([L, T]) field ops on in-kernel values, bound to one
    field's constants (a loaded [3, L] array).

    ``mats_val``: optional loaded [6L, L] bf16 array (field_mats) — when
    present, ``mul`` runs the two constant REDC products on the MXU and the
    data product via limb Karatsuba; otherwise everything is VPU schoolbook.
    """

    def __init__(self, fp: FieldParams, consts_val, mats_val=None):
        self.fp = fp
        self.L = fp.nlimbs
        self.p = consts_val[0][:, None]       # [L, 1]
        self.np_ = consts_val[1][:, None]
        self.one = consts_val[2][:, None]
        # borrow-biased k*p limbs for sub_lazy ([L, 1]; lane-only broadcast
        # in adds is safe — only products with [L, 1] operands upset Mosaic)
        self.bias = (
            consts_val[3][:, None] if consts_val.shape[0] > 3 else None
        )
        if mats_val is not None:
            L = self.L
            self.m1_lo = mats_val[:L]
            self.m1_hi = mats_val[L : 2 * L]
            self.m2_lo = mats_val[2 * L : 4 * L]
            self.m2_hi = mats_val[4 * L : 6 * L]
        else:
            self.m1_lo = None

    # ------------------------------------------------------------- carries

    @staticmethod
    def relax(x, passes: int):
        for _ in range(passes):
            x = (x & LIMB_MASK) + _shift_up0(x >> LIMB_BITS, 1)
        return x

    @staticmethod
    def _ks_chain(g, pr, nl: int):
        c = g
        s = 1
        while s < nl:
            c = c | (pr & _shift_up0(c, s))
            pr = pr & _shift_up0(pr, s)
            s *= 2
        return c

    def ks_carry(self, x):
        nl = x.shape[0]
        low = x & LIMB_MASK
        g = x >> LIMB_BITS
        pr = (low == LIMB_MASK).astype(jnp.int32)
        c = self._ks_chain(g, pr, nl)
        return (low + _shift_up0(c, 1)) & LIMB_MASK

    def sub_borrow(self, a, b):
        nl = a.shape[0]
        d = a - b
        g = (d < 0).astype(jnp.int32)
        pr = (d == 0).astype(jnp.int32)
        c = self._ks_chain(g, pr, nl)
        out = (d - _shift_up0(c, 1)) & LIMB_MASK
        # nl - 1, not -1: negative indices lower to dynamic_slice, which
        # Pallas TPU cannot lower
        return out, c[nl - 1]

    def cond_sub_p(self, x):
        diff, borrow = self.sub_borrow(x, self.p)
        return jnp.where((borrow == 1)[None], x, diff)

    # ----------------------------------------------------------------- ops

    def mul_cols(self, a, b, nk: int):
        """out[k] = sum_{i+j=k} a_i b_j for k < nk; a, b [L or fewer, T]."""
        La, Lb = a.shape[0], b.shape[0]
        prod = None
        for i in range(La):
            hi = min(Lb, nk - i)
            if hi <= 0:
                break
            term = a[i : i + 1] * b[:hi]
            pads = [(i, nk - i - hi)] + [(0, 0)] * (term.ndim - 1)
            term = jnp.pad(term, pads)
            prod = term if prod is None else prod + term
        return prod

    def kara_cols(self, a, b):
        """Column sums of a*b via one level of limb Karatsuba: split at
        h = ceil(L/2); 3 half-size convolutions instead of one full one
        (~25% fewer VPU multiplies).  The cross term zm - z0 - z2 is
        column-wise non-negative (it equals sum a0_i b1_j + a1_i b0_j), so
        every assembled column stays a non-negative int32.

        Bounds under the lazy-operand discipline (limbs <= 2^12 + 96,
        non-negative; worst case L = 33 for BLS12-381): lo/hi limb sums
        a0+a1 <= 2(2^12 + 96) < 2^13.1, so zm columns <= 17 * 2^26.2 < 2^30.3
        and the assembled columns equal the true convolution sums
        <= 33 * (2^12 + 96)^2 < 2^29.2 — every intermediate fits int32."""
        L = self.L
        h = (L + 1) // 2
        a0, a1 = a[:h], a[h:]
        b0, b1 = b[:h], b[h:]
        pad_tail = [(0, 0)] * (a.ndim - 1)
        z0 = self.mul_cols(a0, b0, 2 * h)            # [2h]
        z2 = self.mul_cols(a1, b1, 2 * (L - h))      # [2(L-h)]
        # odd L (BLS12-381's 33): the high half is one limb short — zero-pad
        # it for the cross-term sums
        if L - h < h:
            tail = [(0, 2 * h - L)] + pad_tail
            a1s = a0 + jnp.pad(a1, tail)
            b1s = b0 + jnp.pad(b1, tail)
        else:
            a1s, b1s = a0 + a1, b0 + b1
        # lo/hi sums < 2^13.1; zm columns < 2^30.3 (class docstring): int32 ok
        zm = self.mul_cols(a1s, b1s, 2 * h)
        z1 = zm - z0 - jnp.pad(
            z2, [(0, 2 * h - 2 * (L - h))] + pad_tail
        )
        # assemble cols[k] = z0[k] + z1[k-h] + z2[k-2h] over [2L]
        cols = jnp.pad(z0, [(0, 2 * L - 2 * h)] + pad_tail)
        cols = cols + jnp.pad(z1, [(h, 2 * L - h - 2 * h)] + pad_tail)
        cols = cols + jnp.pad(
            z2, [(2 * h, 2 * L - 2 * h - 2 * (L - h))] + pad_tail
        )
        return cols

    def const_mul_mxu(self, x, c_lo, c_hi):
        """MXU product with a 6/6-split constant Toeplitz matrix:
        out[k, t] = sum_i C[k, i] x[i, t], x limbs <= 2^12 + eps.
        Four bf16 [nk, L] @ [L, T] dots, each exact in fp32 (< 2^24)."""
        x_lo = (x & 63).astype(jnp.bfloat16)
        x_hi = (x >> 6).astype(jnp.bfloat16)

        def dot(c, v):
            return jax.lax.dot_general(
                c, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        d00 = dot(c_lo, x_lo)
        d01 = dot(c_lo, x_hi)
        d10 = dot(c_hi, x_lo)
        d11 = dot(c_hi, x_hi)
        return d00 + ((d01 + d10) << 6) + (d11 << 12)

    def _redc_hi(self, a, b):
        """Montgomery REDC high half in relaxed limbs (<= 2^12 + 96,
        non-negative): the shared core of mul / mul_lazy.

        With mats bound: data product via Karatsuba columns, both constant
        REDC products (by -p^-1 and by p) on the MXU.  Two relaxation passes
        suffice under the lazy-operand discipline (input limbs <= 2^12 + 96):
        columns < 2^30.3 (kara_cols bound) relax to limbs <= 2^12 + 40, which
        (a) keeps all downstream products in int32/fp32 range and (b)
        preserves the low-half value < 1.02 R < 2R, so the 0-or-R carry-out
        test below stays exact (limbs are non-negative throughout — the
        sub_lazy bias construction guarantees it).

        Value of the result: t = (a*b + m*p) / R <= a*b/R + 1.01 p, defined
        whenever a*b < R*p.  The headroom R >= 2^10 p (BN254) / 2^15 p
        (BLS12-381, params._mk_field) admits lazy operands of tens of p."""
        L = self.L
        if self.m1_lo is not None:
            cols = self.kara_cols(a, b)
            t_low = self.relax(cols[:L], 2)
            m = self.relax(self.const_mul_mxu(t_low, self.m1_lo, self.m1_hi), 2)
            s = self.relax(
                self.const_mul_mxu(m, self.m2_lo, self.m2_hi) + cols, 2
            )
        else:
            cols = self.mul_cols(a, b, 2 * L)
            t_low = self.relax(cols[:L], 3)
            m = self.relax(self.mul_cols(t_low, self.np_, L), 3)
            s = self.relax(self.mul_cols(m, self.p, 2 * L) + cols, 3)
        c_out = jnp.any(s[:L] != 0, axis=0).astype(jnp.int32)
        return s[L:] + jnp.pad(
            c_out[None], [(0, L - 1)] + [(0, 0)] * c_out.ndim
        )

    def mul(self, a, b):
        """Strict Montgomery product: canonical limbs, value < p (requires
        a*b < R*p; tolerates lazy operands — one cond_sub suffices because
        t < a*b/R + 1.01p < 2p whenever a*b < 0.99 R*p)."""
        return self.cond_sub_p(self.ks_carry(self._redc_hi(a, b)))

    def mul_lazy(self, a, b):
        """Montgomery product WITHOUT the carry tail: skips the Kogge-Stone
        carry and the conditional subtract (~40% of a mul's vector work).
        Output in relaxed limbs (<= 2^12 + 96), value < a*b/R + 1.01p — under
        the point-formula discipline (ops/curve_pallas.py) always < 1.3p.
        Safe wherever the consumer tolerates relaxed limbs and lazy values:
        another mul, add_lazy, or sub_lazy."""
        return self._redc_hi(a, b)

    def square(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return self.cond_sub_p(self.ks_carry(a + b))

    def add_lazy(self, a, b):
        """Non-reducing add: value a + b (NOT brought below p), limbs
        re-bounded to <= 2^12 + 4 by one relaxation pass.  Safe wherever the
        consumer is a multiplication (REDC tolerates lazy values: a*b < R*p
        holds for operands of tens of p because _mk_field forces R >= 2^10 p
        for BN254 and R >= 2^15 p for BLS12-381 — see _redc_hi) or another
        bounded lazy add/sub; the full Kogge-Stone carry + conditional
        subtract of the strict add is ~20x the vector work of the single
        relax pass."""
        return self.relax(a + b, 1)

    def sub(self, a, b):
        diff, borrow = self.sub_borrow(a, b)
        plus_p = self.ks_carry(diff + self.p)
        return jnp.where((borrow == 1)[None], plus_p, diff)

    def sub_lazy(self, a, b):
        """Non-reducing subtract: value a - b + k*p (k = sub_bias_limbs'
        multiplier: 8 for BN254, 32 for BLS12-381), limbs re-bounded to
        <= 2^12 + 4 by one relaxation pass.  Requires value(b) < 4p with
        non-negative relaxed limbs (then every per-limb difference
        a_i - b_i + B_i is non-negative — see sub_bias_limbs); a may be any
        lazy value.  One relax pass instead of the strict sub's two
        Kogge-Stone chains."""
        return self.relax(a - b + self.bias, 1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)
