"""Pallas TPU kernels for fused limb arithmetic.

The XLA path (ops/field.py) emits ~10 primitive ops per field multiply; XLA
fuses elementwise chains, but deep sequences of dependent REDC steps inside a
point addition can still round-trip HBM between fusions.  These kernels keep
an entire batch tile resident in VMEM and run the full limb pipeline on the
VPU in one pallas_call.

Value-level helpers (`mul_v`, `add_v`, `sub_v`) operate on loaded jnp values
so composite kernels (ops/curve_pallas.py) can inline many field ops in one
kernel body.  Layout note: tiles are [T, L] int32 with T a multiple of 8; the
L (=22/32) lane dimension is minor and underfills the 128-wide lane unit —
acceptable for v1 (the batch dimension provides the parallelism); a
lane-major relayout is the next optimization step.
"""

from __future__ import annotations

import copy
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import LIMB_BITS, LIMB_MASK, FieldParams
from .field import FieldOps, field_ops


def _carry_v(x, nl):
    outs = []
    c = jnp.zeros(x.shape[:-1], jnp.int32)
    for k in range(nl):
        t = x[..., k] + c
        outs.append(t & LIMB_MASK)
        c = t >> LIMB_BITS
    return jnp.stack(outs, axis=-1)


def _pad_last_v(x, before, after):
    pads = [(0, 0)] * (x.ndim - 1) + [(before, after)]
    return jnp.pad(x, pads)


class FieldKernels:
    """Value-level field ops bound to one field's constants (for use inside
    pallas kernel bodies).

    Pallas kernels may not capture array constants, so the field constants
    travel as a [3, L] operand: pass ``consts()`` to the pallas_call and
    rebind inside the kernel with ``bind(c_ref[:])``."""

    def __init__(self, fp: FieldParams):
        self.fp = fp
        self.L = fp.nlimbs
        f = field_ops(fp)
        self.p_limbs = np.asarray(f.p_limbs)
        self.np_limbs = np.asarray(f.np_limbs)
        self.one = np.asarray(f.one)

    def consts(self) -> np.ndarray:
        """[3, L]: modulus limbs, -p^-1 limbs, Montgomery one."""
        return np.stack([self.p_limbs, self.np_limbs, self.one])

    def bind(self, consts_val) -> "FieldKernels":
        """Copy with constants replaced by in-kernel loaded values."""
        b = copy.copy(self)
        b.p_limbs = consts_val[0]
        b.np_limbs = consts_val[1]
        b.one = consts_val[2]
        return b

    def mul_full_v(self, a, b):
        L = self.L
        prod = _pad_last_v(a[..., 0:1] * b, 0, L)
        for i in range(1, L):
            prod = prod + _pad_last_v(a[..., i : i + 1] * b, i, L - i)
        return prod

    def mul_low_v(self, a, b):
        L = self.L
        prod = a[..., 0:1] * b
        for i in range(1, L):
            prod = prod + _pad_last_v(a[..., i : i + 1] * b[..., : L - i], i, 0)
        return _carry_v(prod, L)

    def sub_borrow_v(self, a, b):
        L = self.L
        outs = []
        br = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), jnp.int32)
        for k in range(L):
            t = a[..., k] - b[..., k] - br
            br = (t < 0).astype(jnp.int32)
            outs.append(t & LIMB_MASK)
        return jnp.stack(outs, axis=-1), br

    def cond_sub_p_v(self, x):
        diff, borrow = self.sub_borrow_v(x, self.p_limbs)
        return jnp.where((borrow == 1)[..., None], x, diff)

    def mul_v(self, a, b):
        L = self.L
        t = _carry_v(self.mul_full_v(a, b), 2 * L)
        m = self.mul_low_v(t[..., :L], self.np_limbs)
        s = _carry_v(self.mul_full_v(m, self.p_limbs) + t, 2 * L)
        return self.cond_sub_p_v(s[..., L:])

    def sq_full_v(self, a):
        """Squaring columns: diagonal a_i^2 at 2i + doubled cross terms —
        ~half the limb products of mul_full_v (mirror of FieldOps._sq_full)."""
        L = self.L
        total = None
        for i in range(L):
            diag = a[..., i : i + 1] * a[..., i : i + 1]
            if i + 1 < L:
                cross = (a[..., i : i + 1] * a[..., i + 1 :]) * 2
                row = jnp.concatenate([diag, cross], axis=-1)
            else:
                row = diag
            padded = _pad_last_v(row, 2 * i, L - i)
            total = padded if total is None else total + padded
        return total

    def square_v(self, a):
        L = self.L
        t = _carry_v(self.sq_full_v(a), 2 * L)
        m = self.mul_low_v(t[..., :L], self.np_limbs)
        s = _carry_v(self.mul_full_v(m, self.p_limbs) + t, 2 * L)
        return self.cond_sub_p_v(s[..., L:])

    def add_v(self, a, b):
        return self.cond_sub_p_v(_carry_v(a + b, self.L))

    def sub_v(self, a, b):
        diff, borrow = self.sub_borrow_v(a, b)
        plus_p = _carry_v(diff + self.p_limbs, self.L)
        return jnp.where((borrow == 1)[..., None], plus_p, diff)

    def is_zero_v(self, a):
        return jnp.all(a == 0, axis=-1)

    def select_v(self, cond, a, b):
        return jnp.where(cond[..., None], a, b)


@functools.lru_cache(maxsize=None)
def field_kernels(fp: FieldParams) -> FieldKernels:
    return FieldKernels(fp)


def pallas_mul(fp: FieldParams, tile: int = 512, interpret: bool | None = None):
    """Standalone fused Montgomery multiply: [N, L] x [N, L] -> [N, L]."""
    fk = field_kernels(fp)
    L = fk.L
    consts = jnp.asarray(fk.consts())
    interp = (jax.default_backend() != "tpu") if interpret is None else interpret

    def kernel(c_ref, a_ref, b_ref, o_ref):
        fkb = fk.bind(c_ref[:])
        o_ref[:] = fkb.mul_v(a_ref[:], b_ref[:])

    @jax.jit
    def run(a, b):
        n = a.shape[0]
        grid = (pl.cdiv(n, tile),)
        tile_spec = pl.BlockSpec(
            (tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        const_spec = pl.BlockSpec(
            (3, L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, L), jnp.int32),
            grid=grid,
            in_specs=[const_spec, tile_spec, tile_spec],
            out_specs=tile_spec,
            interpret=interp,
        )(consts, a, b)

    return run
