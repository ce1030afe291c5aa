"""Radix-2 NTT / iNTT over the scalar field, with coset support.

Replaces gnark-crypto's multicore FFT (driving the quotient computation inside
plonk.Prove, reference algoplonk.go:89).  TPU-first design: the whole domain
lives on device as a ``[n, L]`` limb array; each butterfly stage is one batched
field-multiply + add/sub over n/2 elements, so a size-2^20 transform is just
20 fused VPU sweeps (no data-dependent control flow, static shapes).

The sharded multi-chip variant (four-step decomposition with all-to-all stage
exchange over ICI) lives in parallel/ntt_sharded.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CURVES, CurveParams, domain_generator
from ..fields import limbs as limbs_mod
from .field import field_ops


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _power_table(base: int, count: int, modulus: int) -> list[int]:
    out = [1] * count
    for i in range(1, count):
        out[i] = out[i - 1] * base % modulus
    return out


class NttPlan:
    """Precomputed twiddles and permutations for one (curve, n)."""

    def __init__(self, curve: CurveParams, log_n: int):
        self.curve = curve
        self.log_n = log_n
        self.n = 1 << log_n
        self.f = field_ops(curve.fr)
        r = curve.fr.modulus
        self.omega = domain_generator(curve.name, log_n)
        self.omega_inv = pow(self.omega, -1, r)
        self.n_inv = pow(self.n, -1, r)

        half = self.n // 2
        fwd = _power_table(self.omega, max(half, 1), r)
        inv = _power_table(self.omega_inv, max(half, 1), r)
        self.tw_fwd = jnp.asarray(limbs_mod.ints_to_mont_limbs(fwd, curve.fr))
        self.tw_inv = jnp.asarray(limbs_mod.ints_to_mont_limbs(inv, curve.fr))
        self.n_inv_mont = jnp.asarray(
            limbs_mod.ints_to_mont_limbs([self.n_inv], curve.fr)[0]
        )
        self.bitrev = jnp.asarray(_bit_reverse_perm(self.n))
        self._ntt_jit = jax.jit(self._transform, static_argnums=(1,))
        # Large transforms run the butterfly stages in GROUPS of separate
        # dispatches: the axon AOT compiler's buffer assignment keeps every
        # unrolled stage's [n, L] output alive inside one program (~9 GB
        # internal peak at 2^22 — observed RESOURCE_EXHAUSTED on v5e once
        # ambient HBM use passed a few GB), while grouped execution peaks at
        # ~(group+2) buffers and frees between groups.
        self._stage_group = (
            int(os.environ.get("AP_NTT_GROUP", "1"))
            if log_n >= int(os.environ.get("AP_NTT_GROUP_MIN_LOG", "21"))
            else 0
        )
        self._group_jits = {}

    def _stage_range(self, a, inverse: bool, s0: int, s1: int):
        f = self.f
        n, L = self.n, self.f.L
        tw = self.tw_inv if inverse else self.tw_fwd
        for s in range(s0, s1):
            half = 1 << s
            stride = n // (2 * half)
            w = tw[::stride][:half]  # [half, L]
            a = a.reshape(n // (2 * half), 2, half, L)
            u = a[:, 0]
            v = f.mul(a[:, 1], w[None])
            a = jnp.stack([f.add(u, v), f.sub(u, v)], axis=1).reshape(n, L)
        return a

    def _transform(self, a, inverse: bool):
        a = a[self.bitrev]
        a = self._stage_range(a, inverse, 0, self.log_n)
        if inverse:
            a = self.f.mul(
                a, jnp.broadcast_to(self.n_inv_mont, a.shape)
            )
        return a

    def _transform_grouped(self, a, inverse: bool):
        g = self._stage_group
        a = a[self.bitrev]
        for s0 in range(0, self.log_n, g):
            s1 = min(s0 + g, self.log_n)
            key = (inverse, s0, s1)
            jfn = self._group_jits.get(key)
            if jfn is None:
                jfn = jax.jit(
                    functools.partial(
                        self._stage_range, inverse=inverse, s0=s0, s1=s1
                    )
                )
                self._group_jits[key] = jfn
            a = jfn(a)
        if inverse:
            a = self.f.mul(
                a, jnp.broadcast_to(self.n_inv_mont, a.shape)
            )
        return a

    def ntt(self, coeffs):
        """Coefficients -> evaluations p(omega^i), natural order. [n, L]"""
        if self._stage_group:
            return self._transform_grouped(coeffs, False)
        return self._ntt_jit(coeffs, False)

    def intt(self, evals):
        """Evaluations -> coefficients. [n, L]"""
        if self._stage_group:
            return self._transform_grouped(evals, True)
        return self._ntt_jit(evals, True)

    # ------------------------------------------------------------ coset

    @functools.lru_cache(maxsize=8)
    def _shift_powers(self, shift: int, inverse: bool):
        r = self.curve.fr.modulus
        s = pow(shift, -1, r) if inverse else shift
        tbl = _power_table(s, self.n, r)
        return jnp.asarray(limbs_mod.ints_to_mont_limbs(tbl, self.curve.fr))

    def coset_ntt(self, coeffs, shift: int):
        """Evaluate on the coset shift * H (shift a python int)."""
        scaled = self.f.mul(coeffs, self._shift_powers(shift, False))
        return self.ntt(scaled)

    def coset_intt(self, evals, shift: int):
        coeffs = self.intt(evals)
        return self.f.mul(coeffs, self._shift_powers(shift, True))


@functools.lru_cache(maxsize=None)
def ntt_plan(curve_name: str, log_n: int) -> NttPlan:
    return NttPlan(CURVES[curve_name], log_n)
