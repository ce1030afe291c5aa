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


def _affine_to_jac_values(fk, pts):
    """[T, 2, L] affine -> [T, 3, L] jacobian ((0,0) -> infinity)."""
    x, y = pts[:, 0], pts[:, 1]
    is_inf = fk.is_zero_v(x) & fk.is_zero_v(y)
    one = jnp.broadcast_to(fk.one, x.shape)
    z = fk.select_v(is_inf, jnp.zeros_like(x), one)
    return jnp.stack([x, y, z], axis=1)


def _aff_add_aff_values(fk, p, q):
    """Complete affine + affine -> Jacobian on loaded values [T, 2, L]
    (mirror of CurveOps.aff_add_aff: 4M+2S generic path)."""
    X1, Y1 = p[:, 0], p[:, 1]
    X2, Y2 = q[:, 0], q[:, 1]
    H = fk.sub_v(X2, X1)
    R = fk.sub_v(Y2, Y1)
    HH = fk.square_v(H)
    HHH = fk.mul_v(H, HH)
    V = fk.mul_v(X1, HH)
    RR = fk.square_v(R)
    X3 = fk.sub_v(fk.sub_v(RR, HHH), fk.add_v(V, V))
    Y3 = fk.sub_v(fk.mul_v(R, fk.sub_v(V, X3)), fk.mul_v(Y1, HHH))
    generic = jnp.stack([X3, Y3, H], axis=1)

    dbl = _jac_double_values(fk, _affine_to_jac_values(fk, p))
    p_inf = fk.is_zero_v(X1) & fk.is_zero_v(Y1)
    q_inf = fk.is_zero_v(X2) & fk.is_zero_v(Y2)
    h_zero = fk.is_zero_v(H)
    r_zero = fk.is_zero_v(R)
    both = ~p_inf & ~q_inf

    out = generic
    out = jnp.where((both & h_zero & r_zero)[:, None, None], dbl, out)
    out = jnp.where(
        (both & h_zero & ~r_zero)[:, None, None], jnp.zeros_like(out), out
    )
    out = jnp.where(p_inf[:, None, None], _affine_to_jac_values(fk, q), out)
    out = jnp.where(q_inf[:, None, None], _affine_to_jac_values(fk, p), out)
    return out


def _interpret_default() -> bool:
    """Pallas TPU kernels only execute natively on TPU; fall back to the
    interpreter elsewhere (CPU test meshes)."""
    return jax.default_backend() != "tpu"


def _binary_point_call(curve, values_fn, rows: int, tile: int,
                       interpret: bool | None):
    fk = field_kernels(curve.fp)
    L = fk.L
    consts = jnp.asarray(fk.consts())
    interp = _interpret_default() if interpret is None else interpret

    def kernel(c_ref, p_ref, q_ref, o_ref):
        fkb = fk.bind(c_ref[:])
        o_ref[:] = values_fn(fkb, p_ref[:], q_ref[:])

    @jax.jit
    def run(p, q):
        n = p.shape[0]
        grid = (pl.cdiv(n, tile),)
        const_spec = pl.BlockSpec(
            (3, L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        in_spec = pl.BlockSpec(
            (tile, rows, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (tile, 3, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 3, L), jnp.int32),
            grid=grid,
            in_specs=[const_spec, in_spec, in_spec],
            out_specs=out_spec,
            interpret=interp,
        )(consts, p, q)

    return run


@functools.lru_cache(maxsize=None)
def pallas_jac_add(curve: CurveParams, tile: int = 256,
                   interpret: bool | None = None):
    """Fused [N, 3, L] + [N, 3, L] -> [N, 3, L] Jacobian addition."""
    return _binary_point_call(curve, _jac_add_values, 3, tile, interpret)


@functools.lru_cache(maxsize=None)
def pallas_aff_add_aff(curve: CurveParams, tile: int = 256,
                       interpret: bool | None = None):
    """Fused [N, 2, L] affine + affine -> [N, 3, L] Jacobian."""
    return _binary_point_call(curve, _aff_add_aff_values, 2, tile, interpret)


@functools.lru_cache(maxsize=None)
def pallas_jac_double(curve: CurveParams, tile: int = 256,
                      interpret: bool | None = None):
    fk = field_kernels(curve.fp)
    L = fk.L
    consts = jnp.asarray(fk.consts())
    interp = _interpret_default() if interpret is None else interpret

    def kernel(c_ref, p_ref, o_ref):
        fkb = fk.bind(c_ref[:])
        o_ref[:] = _jac_double_values(fkb, p_ref[:])

    @jax.jit
    def run(p):
        n = p.shape[0]
        grid = (pl.cdiv(n, tile),)
        const_spec = pl.BlockSpec(
            (3, L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        spec = pl.BlockSpec((tile, 3, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 3, L), jnp.int32),
            grid=grid,
            in_specs=[const_spec, spec],
            out_specs=spec,
            interpret=interp,
        )(consts, p)

    return run
