"""Batched modular field arithmetic on TPU via JAX/XLA.

Replaces gnark-crypto's hand-written amd64/arm64 Montgomery assembly (the
reference's hot native layer, invoked from /root/reference/algoplonk.go:89 via
plonk.Prove) with a TPU-native design:

* field elements are ``[..., L]`` int32 arrays of 12-bit little-endian limbs
  (Montgomery form) — every intermediate of the schoolbook multiplier and the
  coarse REDC fits an int32 vector lane, so the whole pipeline runs on the VPU
  with no emulated 64-bit arithmetic;
* all operations are batched over leading axes, so a single op processes an
  entire polynomial/point vector — this is what keeps the TPU busy.

The inner limb loops are static Python loops (L is a compile-time constant),
so XLA sees straight-line vector code and fuses aggressively.  A fused Pallas
variant for the hottest call sites lives in ops/field_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import LIMB_BITS, LIMB_MASK, FieldParams
from ..fields import limbs as limbs_mod


class FieldOps:
    """Batched field arithmetic bound to one prime field.

    All inputs/outputs are int32 arrays shaped ``[..., L]`` holding Montgomery
    residues unless a method says otherwise.
    """

    def __init__(self, fp: FieldParams):
        self.fp = fp
        self.L = fp.nlimbs
        self.p_limbs = jnp.asarray(limbs_mod.int_to_limbs(fp.modulus, fp))
        self.np_limbs = jnp.asarray(limbs_mod.int_to_limbs(fp.n_prime, fp))
        self.one = jnp.asarray(limbs_mod.int_to_limbs(fp.r, fp))  # 1 in Mont form
        self.r2 = jnp.asarray(limbs_mod.int_to_limbs(fp.r2, fp))
        self.zero = jnp.zeros((self.L,), jnp.int32)
        # modulus - 2 bits (msb first) for Fermat inversion
        e = fp.modulus - 2
        self.inv_exp_bits = jnp.asarray(
            [int(b) for b in bin(e)[2:]], dtype=jnp.int32
        )
        # jit the hot entry points (they are also freely traceable from inside
        # larger jitted pipelines — nested jit inlines)
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mul = jax.jit(self.mul)
        self.square = jax.jit(self.square)
        self.inv = jax.jit(self.inv)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)
        self.pow_fixed = jax.jit(self.pow_fixed, static_argnums=1)

    # ---------------------------------------------------------------- helpers

    def _carry(self, x, nl):
        """Propagate carries over ``nl`` limbs; drops the final carry (callers
        guarantee it is zero)."""
        outs = []
        c = jnp.zeros(x.shape[:-1], jnp.int32)
        for k in range(nl):
            t = x[..., k] + c
            outs.append(t & LIMB_MASK)
            c = t >> LIMB_BITS
        return jnp.stack(outs, axis=-1)

    @staticmethod
    def _pad_last(x, before, after):
        pads = [(0, 0)] * (x.ndim - 1) + [(before, after)]
        return jnp.pad(x, pads)

    def _mul_full(self, a, b):
        """Schoolbook product -> [..., 2L] un-carried columns (each < 2^31)."""
        L = self.L
        prod = self._pad_last(a[..., 0:1] * b, 0, L)
        for i in range(1, L):
            prod = prod + self._pad_last(a[..., i : i + 1] * b, i, L - i)
        return prod

    def _sq_full(self, a):
        """Squaring columns -> [..., 2L] un-carried: diagonal terms a_i^2 at
        column 2i plus doubled cross terms 2*a_i*a_j (i<j) at column i+j —
        L + L(L-1)/2 limb products vs L^2 for the generic multiplier.  Column
        sums stay < L/2 * 2^25 < 2^31 for 12-bit limbs."""
        L = self.L
        total = None
        for i in range(L):
            diag = a[..., i : i + 1] * a[..., i : i + 1]
            if i + 1 < L:
                cross = (a[..., i : i + 1] * a[..., i + 1 :]) * 2
                row = jnp.concatenate([diag, cross], axis=-1)  # len L - i
            else:
                row = diag
            padded = self._pad_last(row, 2 * i, L - i)
            total = padded if total is None else total + padded
        return total

    def _mul_low(self, a, b):
        """Low L limbs of a*b (mod R), carried."""
        L = self.L
        prod = a[..., 0:1] * b
        for i in range(1, L):
            prod = prod + self._pad_last(a[..., i : i + 1] * b[..., : L - i], i, 0)
        return self._carry(prod, L)

    def _sub_borrow(self, a, b):
        """(a - b) limbwise with borrow chain; returns (diff limbs, borrow)."""
        L = self.L
        outs = []
        br = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), jnp.int32)
        for k in range(L):
            t = a[..., k] - b[..., k] - br
            br = (t < 0).astype(jnp.int32)
            outs.append(t & LIMB_MASK)
        return jnp.stack(outs, axis=-1), br

    def _cond_sub_p(self, x):
        """x - p if x >= p else x (x < 2p)."""
        diff, borrow = self._sub_borrow(x, self.p_limbs)
        return jnp.where((borrow == 1)[..., None], x, diff)

    # ------------------------------------------------------------------- ops

    def add(self, a, b):
        s = self._carry(a + b, self.L)
        return self._cond_sub_p(s)

    def sub(self, a, b):
        diff, borrow = self._sub_borrow(a, b)
        plus_p = self._carry(diff + self.p_limbs, self.L)
        return jnp.where((borrow == 1)[..., None], plus_p, diff)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def _redc(self, t):
        """Coarse Montgomery reduction of carried columns t [..., 2L]."""
        L = self.L
        m = self._mul_low(t[..., :L], self.np_limbs)
        s = self._carry(self._mul_full(m, self.p_limbs) + t, 2 * L)
        return self._cond_sub_p(s[..., L:])

    def mul(self, a, b):
        """Montgomery product: a * b * R^-1 mod p (coarse REDC).

        With canonical inputs (< p): T = a*b < p^2 and T + m*p < p^2 + R*p,
        which fits 2L limbs with headroom (params guarantee R > 2^6 * p), so no
        carry escapes limb 2L-1 and the shifted result is < 2p.
        """
        return self._redc(self._carry(self._mul_full(a, b), 2 * self.L))

    def square(self, a):
        """Montgomery squaring — dedicated column generator (~half the limb
        products of mul); curve formulas are square-heavy."""
        return self._redc(self._carry(self._sq_full(a), 2 * self.L))

    def mul_const(self, a, c_limbs):
        """Multiply batch by a single Montgomery constant [L]."""
        return self.mul(a, jnp.broadcast_to(c_limbs, a.shape))

    def pow_fixed(self, a, exponent: int):
        """a^exponent for a static python-int exponent (square & multiply,
        MSB-first, using lax.fori_loop so the graph stays small)."""
        bits = jnp.asarray([int(b) for b in bin(exponent)[2:]], jnp.int32)
        nb = bits.shape[0]
        acc0 = jnp.broadcast_to(self.one, a.shape).astype(jnp.int32)

        def body(i, acc):
            acc = self.square(acc)
            return jnp.where((bits[i] == 1)[..., None], self.mul(acc, a), acc)

        return jax.lax.fori_loop(0, nb, body, acc0)

    def inv(self, a):
        """Fermat inverse a^(p-2); inv(0) = 0."""
        return self.pow_fixed(a, self.fp.modulus - 2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """cond: bool [...]; a, b: [..., L]."""
        return jnp.where(cond[..., None], a, b)

    def to_mont(self, a_canonical):
        return self.mul(a_canonical, jnp.broadcast_to(self.r2, a_canonical.shape))

    def from_mont(self, a):
        one_canon = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one_canon)

    # ---------------------------------------------------------- host helpers

    def encode(self, values) -> jnp.ndarray:
        """Canonical python ints -> Montgomery limb device array [N, L]."""
        return jnp.asarray(limbs_mod.ints_to_mont_limbs(list(values), self.fp))

    def decode(self, arr) -> list[int]:
        """Montgomery limb array -> canonical python ints."""
        return limbs_mod.mont_limbs_to_ints(np.asarray(arr), self.fp)


@functools.lru_cache(maxsize=None)
def field_ops(fp: FieldParams) -> FieldOps:
    return FieldOps(fp)
