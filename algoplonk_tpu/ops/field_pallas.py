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

import functools

import jax
import jax.numpy as jnp
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
    pallas kernel bodies)."""

    def __init__(self, fp: FieldParams):
        self.fp = fp
        self.L = fp.nlimbs
        f = field_ops(fp)
        # concrete constant arrays; become VMEM constants inside kernels
        self.p_limbs = f.p_limbs
        self.np_limbs = f.np_limbs
        self.one = f.one

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

    def square_v(self, a):
        return self.mul_v(a, a)

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


def pallas_mul(fp: FieldParams, tile: int = 512):
    """Standalone fused Montgomery multiply: [N, L] x [N, L] -> [N, L]."""
    fk = field_kernels(fp)
    L = fk.L

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = fk.mul_v(a_ref[:], b_ref[:])

    @jax.jit
    def run(a, b):
        n = a.shape[0]
        grid = (pl.cdiv(n, tile),)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, L), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(a, b)

    return run
