"""Multi-scalar multiplication (Pippenger) on TPU.

This is the north-star kernel (BASELINE.md): it replaces gnark-crypto's
multicore bucket MSM that executes every KZG commitment inside plonk.Prove
(reference algoplonk.go:89).

TPU-first reformulation of the bucket method (SURVEY.md section 7 hard part
#3 — "Pippenger without scatter"):

* window digits (c = 8, so digits are literally scalar bytes) are sorted per
  window — sorting turns the scatter-shaped bucket accumulation into a
  contiguous segment problem: bucket d's members are a contiguous run of the
  sort order, materialized as a dense [255, M] index block (M = max non-zero
  bucket population, padded with an index pointing at the affine infinity row);
* bucket accumulation is a single lax.fori_loop over the M member slots: one
  step gathers one point per (window, bucket) lane and performs one batched
  complete mixed addition over all nw*255 lanes — wide, branch-free vector
  work with zero scatter;
* per-window weighted sums (sum_d d * B_d) use the classic two-accumulator
  suffix walk over the 255 buckets, and the window fold is a lax.scan Horner
  (acc = acc * 2^8 + S_w, MSB window first);
* zero digits are excluded from M so sparse scalar vectors (common for
  selector polynomials) cost nothing.

The ENTIRE msm — index build, accumulation loop, suffix walk, window fold —
is one jitted function per (N, M-grid, nw) triple.  This shape is dictated by
the host: compiles cost milliseconds *per HLO op* here (2-core CPU backend /
remote TPU compile tunnel), and each host->device dispatch costs ~10ms
through the tunnel, so the kernel must be a small closed graph (a few
fori/scan bodies, no unrolled tree levels) with no host round trips inside.
Total work is nw * 255 * M mixed adds; with M ~= 1.5x the mean bucket
population this sits within ~1.7x of scatter-based Pippenger's add count
while being fully vectorized.

M is data-dependent: it is measured on device, pulled to host once per call
(the only sync), and rounded up to the nearest 2^k or 3*2^k so the jitted
kernel is reused across calls.

Multi-chip: the bucket decomposition distributes over point shards, so the
sharded MSM in parallel/msm_sharded.py runs the same kernel shape per shard
inside shard_map and jac-adds the D partial results (one tiny collective).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from .curve import CurveOps, curve_ops

WINDOW_BITS = 8
NUM_BUCKETS = (1 << WINDOW_BITS) - 1  # digit 0 excluded


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
    set of jitted kernel variants small."""
    if max_count <= 2:
        return max(max_count, 1)
    p2 = 1 << (max_count - 1).bit_length()          # next power of two
    p15 = 3 * (p2 >> 2)                             # 1.5 * previous pow2
    return p15 if p15 >= max_count else p2


def _bucket_indices(digits, m: int, n: int):
    """[nw, N] digits -> [nw, 255, M] member indices into the infinity-padded
    point table (index n = padding)."""

    def window_indices(digits_w):
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

    return jax.vmap(window_indices)(digits)

def bucket_accumulate(ops: CurveOps, points_pad, digits, m: int):
    """Shared kernel body: [N+1, 2, L] infinity-padded points + [nw, N]
    digits -> [nw, 255, 3, L] bucket sums, with static member capacity m.

    Traceable (used inside the shard_map'd multi-chip step and as the CPU
    fallback of the single-chip path)."""
    n = points_pad.shape[0] - 1
    nw = digits.shape[0]
    gidx = _bucket_indices(digits, m, n)           # [nw, 255, M]

    def acc_body(j, acc):
        pts = points_pad[gidx[:, :, j]]            # [nw, 255, 2, L]
        return ops.jac_add_affine(acc, pts)

    acc0 = ops.jac_infinity((nw, NUM_BUCKETS))
    return jax.lax.fori_loop(0, m, acc_body, acc0)


def bucket_accumulate_pallas(ops: CurveOps, points_pad, digits, m: int,
                             tile: int = 512):
    """TPU fast path: same contract as bucket_accumulate, but the inner
    complete mixed addition runs as one fused Pallas kernel over a
    limbs-major [3, L, B] accumulator (see ops/curve_pallas.py)."""
    from .curve_pallas import pallas_mixed_add

    n = points_pad.shape[0] - 1
    nw = digits.shape[0]
    gidx = _bucket_indices(digits, m, n)           # [nw, 255, M]
    b = nw * NUM_BUCKETS
    b_pad = -(-b // tile) * tile
    gidx = jnp.concatenate(
        [
            gidx.reshape(b, m),
            jnp.full((b_pad - b, m), n, jnp.int32),
        ]
    )
    f = ops.f
    acc0 = jnp.zeros((3, ops.L, b_pad), jnp.int32)
    acc0 = acc0.at[1].set(jnp.broadcast_to(f.one[:, None], (ops.L, b_pad)))
    mixed = pallas_mixed_add(ops.curve, tile)

    def acc_body(j, acc):
        idx = jax.lax.dynamic_index_in_dim(gidx, j, axis=1, keepdims=False)
        pts = jnp.transpose(points_pad[idx], (1, 2, 0))  # [2, L, B]
        return mixed(acc, pts)

    acc = jax.lax.fori_loop(0, m, acc_body, acc0)
    return jnp.transpose(acc[:, :, :b], (2, 0, 1)).reshape(
        nw, NUM_BUCKETS, 3, ops.L
    )


def suffix_and_fold(ops: CurveOps, buckets):
    """[nw, 255, 3, L] bucket sums -> [3, L] final accumulator (traceable).

    Per window: S_w = sum_d d * B_d.  The naive suffix walk is 2*255
    sequential adds over only [nw] lanes — on TPU each tiny step pays the
    same latency as a wide one, so the walk is decomposed over the exact
    factorization 255 = 15 * 17: writing bucket index k = 17 h + l
    (digit d = k + 1),

      sum_k (k+1) B_k = 17 * sum_h h C_h + sum_l l D_l + sum_k B_k,
      C_h = sum_l B[h, l],   D_l = sum_h B[h, l],

    which is two short reductions plus two short weighted suffix walks —
    ~80 sequential steps at [nw * 15..17] lanes instead of 510 at [nw].
    Across windows: Horner fold acc = acc * 2^WINDOW_BITS + S_w (the ~250
    sequential doublings are inherent to any 256-bit MSM)."""
    nw = buckets.shape[0]
    assert NUM_BUCKETS == 15 * 17
    grid = buckets.reshape(nw, 15, 17, 3, ops.L)

    def red_l(i, acc):                         # C_h = sum_l B[h, l]
        return ops.jac_add(acc, grid[:, :, i])

    c = jax.lax.fori_loop(0, 17, red_l, ops.jac_infinity((nw, 15)))

    def red_h(i, acc):                         # D_l = sum_h B[h, l]
        return ops.jac_add(acc, grid[:, i])

    d = jax.lax.fori_loop(0, 15, red_h, ops.jac_infinity((nw, 17)))

    def wsuffix(arr, count):
        # sum_i i * arr[i] = sum of suffix sums arr[i:] for i >= 1
        def body(i, acc):
            running, total = acc
            running = ops.jac_add(running, arr[:, count - 1 - i])
            total = ops.jac_add(total, running)
            return running, total

        init = (ops.jac_infinity((nw,)), ops.jac_infinity((nw,)))
        _, total = jax.lax.fori_loop(0, count - 1, body, init)
        return total

    wh = wsuffix(c, 15)                        # sum_h h C_h
    wl = wsuffix(d, 17)                        # sum_l l D_l

    def red_c(i, acc):                         # sum_k B_k = sum_h C_h
        return ops.jac_add(acc, c[:, i])

    all_b = jax.lax.fori_loop(0, 15, red_c, ops.jac_infinity((nw,)))

    def dbl(_, a):
        return ops.jac_double(a)

    # S_w = 17 * wh + wl + all_b   (17 = 16 + 1: four doublings + one add)
    wh16 = jax.lax.fori_loop(0, 4, dbl, wh)
    window_sums = ops.jac_add(ops.jac_add(wh16, wh), ops.jac_add(wl, all_b))

    def fold(acc, wsum):
        # unrolled doublings: one scan body of 8 doubles + 1 add costs far
        # less wall-clock than a nested 8-iteration loop of tiny ops
        for _ in range(WINDOW_BITS):
            acc = ops.jac_double(acc)
        return ops.jac_add(acc, wsum), None

    acc, _ = jax.lax.scan(fold, ops.jac_infinity(), window_sums, reverse=True)
    return acc


class MsmCtx:
    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.ops: CurveOps = curve_ops(curve)
        self._msm_fn_cache: dict[int, callable] = {}
        self._max_count = jax.jit(self._max_count_impl)

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

    def _msm_fn(self, m: int):
        """One closed jit per bucket capacity m (shapes key the rest)."""
        if m in self._msm_fn_cache:
            return self._msm_fn_cache[m]
        ops = self.ops
        # fused Pallas inner loop on real TPU; XLA-composed elsewhere
        # (pallas interpret mode is far slower than XLA on CPU)
        use_pallas = (
            os.environ.get("AP_PALLAS", "1") == "1"
            and jax.default_backend() == "tpu"
        )

        def fn(points_pad, digits):
            if use_pallas:
                buckets = bucket_accumulate_pallas(ops, points_pad, digits, m)
            else:
                buckets = bucket_accumulate(ops, points_pad, digits, m)
            return suffix_and_fold(ops, buckets)

        jfn = jax.jit(fn)
        self._msm_fn_cache[m] = jfn
        return jfn

    # ------------------------------------------------------------------ API

    def msm(self, points_affine, scalars) -> jnp.ndarray:
        """MSM over G1: returns projective [3, L].

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
        return self._msm_fn(m)(points_pad, digits)

    def msm_to_affine_int(self, points_affine, scalars):
        """Convenience: MSM -> host affine int tuple (or None)."""
        jac = self.msm(points_affine, scalars)
        aff = self.ops.to_affine(jac[None])
        return self.ops.decode_affine(aff)[0]


@functools.lru_cache(maxsize=None)
def msm_ctx(curve: CurveParams) -> MsmCtx:
    return MsmCtx(curve)
