"""Pallas fused G1 point-operation kernels.

A Jacobian addition is ~16 dependent field multiplies; fusing the whole
formula into one pallas_call keeps every intermediate in VMEM and issues one
HBM read per input point and one write per output — the speed-of-light
pattern for this bandwidth-bound workload.

Enabled in CurveOps via the AP_PALLAS=1 environment variable (A/B against
the XLA path, which remains the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import CurveParams
from .field_pallas import field_kernels


def _jac_add_values(fk, p, q):
    """Complete Jacobian + Jacobian on loaded values [T, 3, L]."""
    X1, Y1, Z1 = p[:, 0], p[:, 1], p[:, 2]
    X2, Y2, Z2 = q[:, 0], q[:, 1], q[:, 2]
    Z1Z1 = fk.square_v(Z1)
    Z2Z2 = fk.square_v(Z2)
    U1 = fk.mul_v(X1, Z2Z2)
    U2 = fk.mul_v(X2, Z1Z1)
    S1 = fk.mul_v(fk.mul_v(Y1, Z2), Z2Z2)
    S2 = fk.mul_v(fk.mul_v(Y2, Z1), Z1Z1)
    H = fk.sub_v(U2, U1)
    R = fk.sub_v(S2, S1)
    HH = fk.square_v(H)
    HHH = fk.mul_v(H, HH)
    V = fk.mul_v(U1, HH)
    RR = fk.square_v(R)
    X3 = fk.sub_v(fk.sub_v(RR, HHH), fk.add_v(V, V))
    Y3 = fk.sub_v(fk.mul_v(R, fk.sub_v(V, X3)), fk.mul_v(S1, HHH))
    Z3 = fk.mul_v(fk.mul_v(Z1, Z2), H)
    generic = jnp.stack([X3, Y3, Z3], axis=1)

    dbl = _jac_double_values(fk, p)
    p_inf = fk.is_zero_v(Z1)
    q_inf = fk.is_zero_v(Z2)
    h_zero = fk.is_zero_v(H)
    r_zero = fk.is_zero_v(R)
    both = ~p_inf & ~q_inf

    out = generic
    out = jnp.where((both & h_zero & r_zero)[:, None, None], dbl, out)
    out = jnp.where(
        (both & h_zero & ~r_zero)[:, None, None], jnp.zeros_like(out), out
    )
    out = jnp.where(p_inf[:, None, None], q, out)
    out = jnp.where(q_inf[:, None, None], p, out)
    return out


def _jac_double_values(fk, p):
    X, Y, Z = p[:, 0], p[:, 1], p[:, 2]
    A = fk.square_v(X)
    B = fk.square_v(Y)
    C = fk.square_v(B)
    t = fk.square_v(fk.add_v(X, B))
    D2 = fk.sub_v(fk.sub_v(t, A), C)
    D = fk.add_v(D2, D2)
    E = fk.add_v(fk.add_v(A, A), A)
    F = fk.square_v(E)
    X3 = fk.sub_v(F, fk.add_v(D, D))
    C2 = fk.add_v(C, C)
    C4 = fk.add_v(C2, C2)
    C8 = fk.add_v(C4, C4)
    Y3 = fk.sub_v(fk.mul_v(E, fk.sub_v(D, X3)), C8)
    Z3 = fk.add_v(fk.mul_v(Y, Z), fk.mul_v(Y, Z))
    return jnp.stack([X3, Y3, Z3], axis=1)


@functools.lru_cache(maxsize=None)
def pallas_jac_add(curve: CurveParams, tile: int = 256):
    """Fused [N, 3, L] + [N, 3, L] -> [N, 3, L] Jacobian addition."""
    fk = field_kernels(curve.fp)
    L = fk.L

    def kernel(p_ref, q_ref, o_ref):
        o_ref[:] = _jac_add_values(fk, p_ref[:], q_ref[:])

    @jax.jit
    def run(p, q):
        n = p.shape[0]
        grid = (pl.cdiv(n, tile),)
        spec = pl.BlockSpec((tile, 3, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 3, L), jnp.int32),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
        )(p, q)

    return run


@functools.lru_cache(maxsize=None)
def pallas_jac_double(curve: CurveParams, tile: int = 256):
    fk = field_kernels(curve.fp)
    L = fk.L

    def kernel(p_ref, o_ref):
        o_ref[:] = _jac_double_values(fk, p_ref[:])

    @jax.jit
    def run(p):
        n = p.shape[0]
        grid = (pl.cdiv(n, tile),)
        spec = pl.BlockSpec((tile, 3, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 3, L), jnp.int32),
            grid=grid,
            in_specs=[spec],
            out_specs=spec,
        )(p)

    return run
