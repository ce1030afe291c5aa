"""Multi-scalar multiplication (Pippenger) on TPU.

This is the north-star kernel (BASELINE.md): it replaces gnark-crypto's
multicore bucket MSM that executes every KZG commitment inside plonk.Prove
(reference algoplonk.go:89).

TPU-first reformulation of the bucket method (SURVEY.md section 7 hard part
#3 — "Pippenger without scatter"):

* window digits (c = 8, so digits are literally scalar bytes) are sorted per
  window — sorting turns the scatter-shaped bucket accumulation into a
  contiguous segment problem;
* per-bucket point lists become a dense ``[255, M]`` gather (M = max non-zero
  bucket population, padded with the point at infinity), and bucket sums are a
  log2(M) pairwise tree reduction — wide, branch-free, fully batched;
* the whole bucket tree runs in *affine* coordinates: each level performs one
  shared log-depth batch inversion (poly.batch_inverse_tree) and the complete
  chord/tangent formula (curve.aff_add_with_inv) — ~2S+5M+3M(inv share) per
  add versus ~16M+9S for complete Jacobian adds, the classic batch-affine
  Pippenger trick recast as wide vector levels;
* zero digits are excluded from M so sparse scalar vectors (common for
  selector polynomials) cost nothing;
* windows are processed in groups of G (HBM-budgeted) so the per-level batch
  inversions amortize across windows; the per-window weighted bucket sum
  (sum_d d * B_d) = sum of bucket suffix sums, computed as a log-depth
  associative scan + tree reduction, still in affine coordinates.

M is data-dependent: it is measured on device, pulled to host once per call,
and rounded up to the nearest 2^k or 3*2^k so the jitted kernel is reused
across calls (distinct (N, M, G) triples each compile once).

Multi-chip: the bucket decomposition distributes over point shards, so the
sharded MSM in parallel/msm_sharded.py runs this kernel per shard and
jac-adds the D partial results (one tiny collective).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from . import poly
from .curve import CurveOps, curve_ops

WINDOW_BITS = 8
NUM_BUCKETS = (1 << WINDOW_BITS) - 1  # digit 0 excluded
# HBM budget for one window group's gathered level-0 tree input
_GROUP_HBM_BUDGET = int(os.environ.get("AP_MSM_GROUP_HBM", str(1 << 30)))


def scalar_digits(scalars, nbytes: int = 32) -> np.ndarray:
    """Python ints -> [nw, N] uint8-in-int32 window digits, LSB window first."""
    buf = b"".join(int(s).to_bytes(nbytes, "little") for s in scalars)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), nbytes)
    return arr.T.astype(np.int32).copy()  # [nw, N]


def digits_from_mont_limbs(f, mont_limbs, nbytes: int = 32):
    """Montgomery [N, L] limb array -> [nw, N] window digits, on device.

    Avoids the device->host->device round trip when MSM scalars are already
    resident (every KZG commit in the prover).  Bytes are re-packed from the
    12-bit limbs with static shifts (limb offsets are 0/4/8 mod 12)."""
    canon = f.from_mont(mont_limbs)
    cols = []
    for j in range(nbytes):
        bit0 = 8 * j
        k, off = divmod(bit0, 12)
        if k >= f.L:
            cols.append(jnp.zeros(canon.shape[0], jnp.int32))
            continue
        b = canon[:, k] >> off
        if off > 4 and k + 1 < f.L:
            b = b | (canon[:, k + 1] << (12 - off))
        cols.append(b & 0xFF)
    return jnp.stack(cols, axis=0)


def _round_bucket_capacity(max_count: int) -> int:
    """Round M up to the nearest 2^k or 3*2^k — a finer grid than pure
    powers of two (padding waste <= 1/3 instead of <= 1/2) while keeping the
    set of jit-compiled (N, M) kernel variants small."""
    if max_count <= 2:
        return max(max_count, 1)
    p2 = 1 << (max_count - 1).bit_length()          # next power of two
    p15 = 3 * (p2 >> 2)                             # 1.5 * previous pow2
    return p15 if p15 >= max_count else p2


class MsmCtx:
    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.ops: CurveOps = curve_ops(curve)
        self._window_fn_cache: dict[tuple[int, int], callable] = {}
        self._max_count = jax.jit(self._max_count_impl)
        self._suffix_combine = jax.jit(self._suffix_combine_impl)
        self._fold_step = jax.jit(self._fold_step_impl)

    # ---------------------------------------------------------------- pieces

    def _max_count_impl(self, digits):
        """Max population over all non-zero buckets of all windows.
        digits: [nw, N] int32."""
        sorted_d = jnp.sort(digits, axis=1)
        # pos[:, k] = first index with digit >= k+1, for k = 0..255;
        # diff along k gives the population of buckets 1..255.
        edges = jnp.arange(1, (1 << WINDOW_BITS) + 1, dtype=jnp.int32)
        pos = jax.vmap(lambda row: jnp.searchsorted(row, edges, side="left"))(
            sorted_d
        )
        return jnp.max(jnp.diff(pos, axis=1))

    def _aff_tree_add(self, a, b):
        """Batch-affine complete add of two equally-shaped [..., 2, L] arrays
        sharing one log-depth batch inversion across all lanes."""
        ops = self.ops
        den, flags = ops.aff_add_denominator(a, b)
        flat = den.reshape(-1, den.shape[-1])
        inv = poly.batch_inverse_tree(ops.f, flat).reshape(den.shape)
        return ops.aff_add_with_inv(a, b, inv, flags)

    def _aff_reduce_axis(self, pts, axis: int):
        """Tree-reduce an axis of an affine [...]-array with batch-affine
        adds; odd levels are padded with one infinity column."""
        pts = jnp.moveaxis(pts, axis, 0)
        mm = pts.shape[0]
        while mm > 1:
            if mm % 2:
                pts = jnp.concatenate(
                    [pts, jnp.zeros((1,) + pts.shape[1:], jnp.int32)], axis=0
                )
                mm += 1
            h = mm // 2
            pts = self._aff_tree_add(pts[:h], pts[h:])
            mm = h
        return pts[0]

    def _window_buckets_fn(self, n: int, m: int, g: int):
        """Jitted bucket reduction over a group of g windows for static
        (N, M, G): [g, N] digits -> [g, 255, 2, L] affine bucket sums."""
        key = (n, m, g)
        if key in self._window_fn_cache:
            return self._window_fn_cache[key]
        ops = self.ops

        def gather_idx(digits_w):
            order = jnp.argsort(digits_w)
            sorted_d = digits_w[order]
            dvals = jnp.arange(1, 1 << WINDOW_BITS, dtype=jnp.int32)
            left = jnp.searchsorted(sorted_d, dvals, side="left")
            right = jnp.searchsorted(sorted_d, dvals, side="right")
            counts = right - left                      # [255]
            offs = jnp.arange(m, dtype=jnp.int32)
            idx = left[:, None] + offs[None]           # [255, M]
            valid = offs[None] < counts[:, None]
            return jnp.where(valid, order[jnp.clip(idx, 0, n - 1)], n)

        def fn(points_pad, digits_g):
            # points_pad: [N+1, 2, L] affine with points_pad[N] = (0,0) = inf
            gidx = jax.vmap(gather_idx)(digits_g)      # [g, 255, M]
            pts = points_pad[gidx]                     # [g, 255, M, 2, L]
            return self._aff_reduce_axis(pts, 2)       # [g, 255, 2, L]

        jfn = jax.jit(fn)
        self._window_fn_cache[key] = jfn
        return jfn

    def _suffix_combine_impl(self, buckets):
        """sum_d d * B_d per window = sum over k of the bucket suffix sums
        S_k = sum_{d >= k} B_d: a log-depth associative scan over the bucket
        axis followed by a tree reduction, all batch-affine.
        buckets: [nw, 255, 2, L] affine -> [nw, 3, L] jacobian."""
        suffix = jax.lax.associative_scan(
            self._aff_tree_add, buckets, axis=1, reverse=True
        )
        total = self._aff_reduce_axis(suffix, 1)       # [nw, 2, L]
        return self.ops.affine_to_jac(total)

    def _fold_step_impl(self, acc, window_sum):
        """acc = acc * 2^WINDOW_BITS + window_sum (Horner over windows)."""
        for _ in range(WINDOW_BITS):
            acc = self.ops.jac_double(acc)
        return self.ops.jac_add(acc, window_sum)

    # ------------------------------------------------------------------ API

    def msm(self, points_affine, scalars) -> jnp.ndarray:
        """MSM over G1: returns Jacobian [3, L].

        points_affine: [N, 2, L] device array (Montgomery affine limbs).
        scalars: sequence of python ints (canonical) or [nw, N] digit array.
        """
        n = points_affine.shape[0]
        if isinstance(scalars, (np.ndarray, jnp.ndarray)) and scalars.ndim == 2:
            digits = jnp.asarray(scalars)
        else:
            digits = jnp.asarray(scalar_digits(scalars))
        assert digits.shape[1] == n

        max_count = int(self._max_count(digits))
        if max_count == 0:
            return self.ops.jac_infinity()
        m = _round_bucket_capacity(max_count)

        inf_row = jnp.zeros((1, 2, self.ops.L), jnp.int32)
        points_pad = jnp.concatenate([points_affine, inf_row], axis=0)

        nw = digits.shape[0]
        # group windows so per-level batch inversions amortize, bounded by an
        # HBM budget on the gathered [G, 255, M, 2, L] level-0 tree input
        level0_bytes = NUM_BUCKETS * m * 2 * self.ops.L * 4
        g = max(1, min(nw, _GROUP_HBM_BUDGET // max(level0_bytes, 1)))
        while nw % g:
            g -= 1
        wfn = self._window_buckets_fn(n, m, g)

        buckets = jnp.concatenate(
            [wfn(points_pad, digits[w : w + g]) for w in range(0, nw, g)]
        )                                              # [nw, 255, 2, L] affine
        window_sums = self._suffix_combine(buckets)    # [nw, 3, L]

        acc = self.ops.jac_infinity()
        for w in range(nw - 1, -1, -1):
            acc = self._fold_step(acc, window_sums[w])
        return acc

    def msm_to_affine_int(self, points_affine, scalars):
        """Convenience: MSM -> host affine int tuple (or None)."""
        jac = self.msm(points_affine, scalars)
        aff = self.ops.to_affine(jac[None])
        return self.ops.decode_affine(aff)[0]


@functools.lru_cache(maxsize=None)
def msm_ctx(curve: CurveParams) -> MsmCtx:
    return MsmCtx(curve)
