"""Polynomial / scan utilities on device: prefix products, batch inversion,
Horner evaluation, and the KZG synthetic division (p(X) - p(z)) / (X - z).

Sequential recurrences are recast as two-level blocked scans so the TPU sees
wide batched field ops (block body vectorized over n/b lanes) plus one thin
carry chain of length n/b — the standard way to keep a linear recurrence off
the scalar unit.  These power the PLONK grand product and the KZG openings
that gnark runs on multicore CPU (reference algoplonk.go:89).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..fields.params import CurveParams
from ..fields import limbs as limbs_mod
from .field import FieldOps


def _block_size(n: int) -> int:
    """Largest power-of-two divisor of n, capped near sqrt(n)."""
    pow2 = n & -n  # largest power of two dividing n
    cap = 1 << (max(n.bit_length() - 1, 2) // 2)
    return max(1, min(pow2, cap, n))


def prefix_products(f: FieldOps, v):
    """Inclusive prefix products of v: out[i] = v[0] * ... * v[i].  [n, L]"""
    n, L = v.shape
    b = _block_size(n)
    nb = n // b
    assert nb * b == n, "n must be divisible by block size"
    vb = v.reshape(nb, b, L)

    # in-block inclusive prefix products (b steps, batched over nb)
    def body(t, acc):
        part, run = acc
        run = f.mul(run, vb[:, t])
        part = jax.lax.dynamic_update_index_in_dim(part, run, t, axis=1)
        return part, run

    part0 = jnp.zeros_like(vb)
    run0 = jnp.broadcast_to(f.one, (nb, L)).astype(jnp.int32)
    part, ends = jax.lax.fori_loop(0, b, body, (part0, run0))

    # thin scan over block totals
    def carry_body(j, acc):
        carries, c = acc
        carries = jax.lax.dynamic_update_index_in_dim(carries, c, j, axis=0)
        c = f.mul(c, ends[j])
        return carries, c

    carries0 = jnp.zeros((nb, L), jnp.int32)
    one = jnp.broadcast_to(f.one, (L,)).astype(jnp.int32)
    carries, _ = jax.lax.fori_loop(0, nb, carry_body, (carries0, one))

    out = f.mul(part, carries[:, None, :])
    return out.reshape(n, L)


def batch_inverse(f: FieldOps, v):
    """Elementwise inverse via the Montgomery trick (one Fermat inversion +
    O(n) multiplications).  inv(0) lanes return 0."""
    n, L = v.shape
    is_zero = f.is_zero(v)
    v_safe = f.select(is_zero, jnp.broadcast_to(f.one, v.shape), v)
    pre = prefix_products(f, v_safe)                     # P_i
    suf = prefix_products(f, v_safe[::-1])[::-1]         # S_i = prod_{j>=i}
    total_inv = f.inv(pre[-1])                           # 1 / prod all
    # inv_i = P_{i-1} * total_inv * S_{i+1}
    p_shift = jnp.concatenate([f.one[None], pre[:-1]], axis=0)
    s_shift = jnp.concatenate([suf[1:], f.one[None]], axis=0)
    inv = f.mul(f.mul(p_shift, s_shift), jnp.broadcast_to(total_inv, v.shape))
    return f.select(is_zero, jnp.zeros_like(v), inv)


def batch_inverse_tree(f: FieldOps, v, stop: int = 256):
    """Elementwise inverse via a product *tree* (Montgomery trick, log-depth).

    Unlike batch_inverse (blocked prefix scans — O(sqrt n) sequential steps),
    this runs 2*log2(n/stop) wide vector levels plus ONE batched Fermat
    inversion at width <= stop, so it is the right shape for latency-sensitive
    inner loops (the MSM bucket tree calls it once per level).  n is padded to
    a power of two internally.  inv(0) lanes return 0.
    """
    n, L = v.shape
    n_pad = 1 << (n - 1).bit_length() if n > 1 else 1
    is_zero = f.is_zero(v)
    x = f.select(is_zero, jnp.broadcast_to(f.one, v.shape), v)
    if n_pad != n:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(f.one, (n_pad - n, L)).astype(jnp.int32)], axis=0
        )
    levels = []
    while x.shape[0] > stop:
        levels.append(x)
        x = f.mul(x[0::2], x[1::2])
    inv = f.inv(x)
    for lev in reversed(levels):
        il = f.mul(inv, lev[1::2])
        ir = f.mul(inv, lev[0::2])
        inv = jnp.stack([il, ir], axis=1).reshape(lev.shape[0], L)
    inv = inv[:n]
    return f.select(is_zero, jnp.zeros_like(v), inv)


_TREE_INV_JITS: dict = {}


def batch_inverse_tree_jitted(f: FieldOps, v):
    """batch_inverse_tree under one cached jit per (field, n).

    Eagerly the tree's ~2 log2(n) levels cost a dispatch each (~26 ms on
    the tunnel); jitted they fuse into one program.  The blocked-scan
    batch_inverse is latency-bound on its ~sqrt(n) sequential carry steps
    (~560 ms at 2^18 on v5e); the jitted tree is ~wide-level-count bound.
    Same exact result (the modular inverse is unique)."""
    key = (id(f), v.shape)
    fn = _TREE_INV_JITS.get(key)
    if fn is None:
        fn = jax.jit(lambda x: batch_inverse_tree(f, x))
        _TREE_INV_JITS[key] = fn
    return fn(v)


def powers(f: FieldOps, x_limbs, n: int):
    """[n, L] table of 1, x, x^2, ..., x^(n-1) (x a single [L] element).
    Internally padded to a power of two to keep the scan blocked."""
    n_pad = 1 << (n - 1).bit_length() if n > 1 else 1
    v = jnp.broadcast_to(x_limbs, (n_pad, f.L)).astype(jnp.int32)
    v = jnp.concatenate([f.one[None], v[1:]], axis=0)
    return prefix_products(f, v)[:n]


def horner_scan(f: FieldOps, coeffs_desc, z_limbs):
    """All Horner intermediates y_k = y_{k-1} * z + c_k over coeffs given in
    DESCENDING degree order.  Returns [n, L] (y_0 .. y_{n-1});
    y_{n-1} = p(z)."""
    n, L = coeffs_desc.shape
    b = _block_size(n)
    nb = n // b
    assert nb * b == n
    cb = coeffs_desc.reshape(nb, b, L)
    z = z_limbs

    def body(t, acc):
        part, run = acc
        run = f.add(f.mul(run, jnp.broadcast_to(z, run.shape)), cb[:, t])
        part = jax.lax.dynamic_update_index_in_dim(part, run, t, axis=1)
        return part, run

    part0 = jnp.zeros_like(cb)
    run0 = jnp.zeros((nb, L), jnp.int32)
    part, _ = jax.lax.fori_loop(0, b, body, (part0, run0))
    ends = part[:, b - 1]

    # carry_j = true y entering block j: carry_{j+1} = carry_j * z^b + end_j
    zb = f.pow_fixed(z[None], b)[0] if b > 1 else z

    def carry_body(j, acc):
        carries, c = acc
        carries = jax.lax.dynamic_update_index_in_dim(carries, c, j, axis=0)
        c = f.add(f.mul(c, zb), ends[j])
        return carries, c

    carries0 = jnp.zeros((nb, L), jnp.int32)
    carries, _ = jax.lax.fori_loop(
        0, nb, carry_body, (carries0, jnp.zeros((L,), jnp.int32))
    )

    # correction: y[j, t] = part[j, t] + carry_j * z^{t+1}
    zp = powers(f, z, b + 1)[1:]  # z^1 .. z^b  [b, L]
    corr = f.mul(carries[:, None, :], zp[None])
    out = f.add(part, corr)
    return out.reshape(n, L)


def poly_eval(f: FieldOps, coeffs, z_limbs):
    """Evaluate polynomial (coeffs ascending) at z. Returns [L]."""
    n, L = coeffs.shape
    n_pad = 1 << (n - 1).bit_length() if n > 1 else 1
    if n_pad != n:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((n_pad - n, L), jnp.int32)], axis=0
        )
    return horner_scan(f, coeffs[::-1], z_limbs)[-1]


_EVAL_BLOCK_LOG = 16
_EVAL_SCAN_JITS: dict = {}


def _eval_scan_fn(f: FieldOps, k: int, nb: int, B: int):
    """One cached jit per (field, k, nb, B): scan over coefficient blocks,
    each step reducing [k, B, L] (bounded transient) into the accumulator."""
    key = (id(f), k, nb, B)
    fn = _EVAL_SCAN_JITS.get(key)
    if fn is not None:
        return fn

    def run(blocks, pows_b, zb_pows):
        # blocks [nb, k, B, L]; pows_b [B, L]; zb_pows [nb, L]
        def body(acc, inp):
            blk, zbj = inp
            x = f.mul(blk, jnp.broadcast_to(pows_b[None], blk.shape))
            while x.shape[1] > 1:
                h = x.shape[1] // 2
                x = f.add(x[:, :h], x[:, h:])
            val = x[:, 0]                       # [k, L]
            return f.add(acc, f.mul(val, jnp.broadcast_to(zbj[None], val.shape))), None

        acc0 = jnp.zeros((k, f.L), jnp.int32)
        acc, _ = jax.lax.scan(body, acc0, (blocks, zb_pows))
        return acc

    fn = jax.jit(run)
    _EVAL_SCAN_JITS[key] = fn
    return fn


def poly_eval_many(f: FieldOps, coeffs_seq, z_limbs):
    """Evaluate several (ascending-coefficient) polynomials at one point:
    one powers scan + one batched multiply + a log-depth add tree, instead
    of a sequential Horner scan per polynomial (the prover's round 4 paid
    ~1.8 s per evaluation at 2^18 in separate dispatches).  Returns [k, L].

    Above 2^16 coefficients the multiply runs as a lax.scan over blocks:
    the one-shot form's [k, n, L] transient tile-pads L -> 128 inside the
    program (~12 GB at k = 6, n = 2^20 — the remote compiler died on it),
    while the scan body's [k, B, L] peak is a few hundred MB.  Same exact
    field sums, so results are bit-identical.
    """
    n_max = max(c.shape[0] for c in coeffs_seq)
    n_pad = 1 << (n_max - 1).bit_length() if n_max > 1 else 1
    L = f.L
    padded = []
    for c in coeffs_seq:
        if c.shape[0] < n_pad:
            c = jnp.concatenate(
                [c, jnp.zeros((n_pad - c.shape[0], L), jnp.int32)], axis=0
            )
        padded.append(c)
    stack = jnp.stack(padded)                      # [k, n_pad, L]
    k = stack.shape[0]
    B = 1 << _EVAL_BLOCK_LOG
    if n_pad <= B:
        pows = powers(f, z_limbs, n_pad)           # [n_pad, L]
        x = f.mul(stack, jnp.broadcast_to(pows[None], stack.shape))
        while x.shape[1] > 1:
            h = x.shape[1] // 2
            x = f.add(x[:, :h], x[:, h:])
        return x[:, 0]
    nb = n_pad // B
    blocks = stack.reshape(k, nb, B, L).transpose(1, 0, 2, 3)
    pows_b1 = powers(f, z_limbs, B + 1)            # z^0 .. z^B
    pows_b = pows_b1[:B]
    zb = pows_b1[B]                                # z^B
    zb_pows = powers(f, zb, nb)                    # [nb, L]
    return _eval_scan_fn(f, k, nb, B)(blocks, pows_b, zb_pows)


def kzg_quotient(f: FieldOps, coeffs, z_limbs):
    """(p(X) - p(z)) / (X - z) for coeffs ascending [n, L].

    Returns (q_coeffs [n_padded, L] with top coefficients zero, p_at_z [L]).
    q_i = Horner intermediate y_{n-2-i}.  Input is zero-padded to a power of
    two so the blocked scan keeps its sqrt(n) block structure for any length.
    """
    n, L = coeffs.shape
    n_pad = 1 << (n - 1).bit_length()
    if n_pad != n:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((n_pad - n, L), jnp.int32)], axis=0
        )
    ys = horner_scan(f, coeffs[::-1], z_limbs)
    p_at_z = ys[-1]
    q = ys[:-1][::-1]  # y_{n-2} ... y_0 -> q_0..q_{n-2}
    q = jnp.concatenate([q, jnp.zeros((1, L), jnp.int32)], axis=0)
    return q, p_at_z
