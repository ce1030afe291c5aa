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

import jax.numpy as jnp
import numpy as np

from ..fields.params import LIMB_BITS, LIMB_MASK, FieldParams
from ..fields import limbs as limbs_mod


def field_consts(fp: FieldParams) -> np.ndarray:
    """[3, L]: modulus limbs, -p^-1 mod R limbs, Montgomery one."""
    return np.stack(
        [
            np.asarray(limbs_mod.int_to_limbs(fp.modulus, fp), np.int32),
            np.asarray(limbs_mod.int_to_limbs(fp.n_prime, fp), np.int32),
            np.asarray(limbs_mod.int_to_limbs(fp.r, fp), np.int32),
        ]
    )


def _shift_up0(x, s: int):
    """Limb k -> limb k+s along axis 0 (drops the top s limbs; dropped
    carries are provably zero — ops/field.py _relax)."""
    pads = [(s, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads)[: x.shape[0]]


class FieldVals:
    """Limbs-major ([L, T]) field ops on in-kernel values, bound to one
    field's constants (a loaded [3, L] array)."""

    def __init__(self, fp: FieldParams, consts_val):
        self.fp = fp
        self.L = fp.nlimbs
        self.p = consts_val[0][:, None]       # [L, 1]
        self.np_ = consts_val[1][:, None]
        self.one = consts_val[2][:, None]

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
        L = self.L
        prod = None
        for i in range(L):
            hi = min(L, nk - i)
            if hi <= 0:
                break
            term = a[i : i + 1] * b[:hi]
            pads = [(i, nk - i - hi)] + [(0, 0)] * (term.ndim - 1)
            term = jnp.pad(term, pads)
            prod = term if prod is None else prod + term
        return prod

    def mul(self, a, b):
        """Montgomery product (bounds as in ops/field.py FieldOps.mul)."""
        L = self.L
        cols = self.mul_cols(a, b, 2 * L)
        t_low = self.relax(cols[:L], 3)
        m = self.relax(self.mul_cols(t_low, self.np_, L), 3)
        s = self.relax(self.mul_cols(m, self.p, 2 * L) + cols, 3)
        c_out = jnp.any(s[:L] != 0, axis=0).astype(jnp.int32)
        hi = s[L:] + jnp.pad(
            c_out[None], [(0, L - 1)] + [(0, 0)] * c_out.ndim
        )
        return self.cond_sub_p(self.ks_carry(hi))

    def square(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return self.cond_sub_p(self.ks_carry(a + b))

    def sub(self, a, b):
        diff, borrow = self.sub_borrow(a, b)
        plus_p = self.ks_carry(diff + self.p)
        return jnp.where((borrow == 1)[None], plus_p, diff)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)
