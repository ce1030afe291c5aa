"""Multi-scalar multiplication (Pippenger) on TPU.

This is the north-star kernel (BASELINE.md): it replaces gnark-crypto's
multicore bucket MSM that executes every KZG commitment inside plonk.Prove
(reference algoplonk.go:89).

TPU-first reformulation of the bucket method (SURVEY.md section 7 hard part
#3 — "Pippenger without scatter"):

* scalars are recoded into signed balanced c = 11 windows (d in [-1024,
  1024]); the bucket index is |d| with the sign folded into the point gather
  (y -> -y), so 254-bit scalars need nw = 24 windows of 1024 buckets —
  total accumulate work nw * N is ~2x less than unsigned 8-bit windows;
* digits are sorted per window by |d| — sorting turns the scatter-shaped
  bucket accumulation into a contiguous segment problem: bucket d's members
  are a contiguous run of the sort order, materialized as a dense
  [NUM_BUCKETS, M] packed index block (M = max non-zero bucket population,
  padded with an index pointing at the affine infinity row);
* bucket accumulation is a single lax.fori_loop over the M member slots: one
  step gathers one signed point per (window, bucket) lane and performs one
  batched complete mixed addition over all nw*NUM_BUCKETS lanes — wide,
  branch-free vector work with zero scatter;
* per-window weighted sums (sum_d d * B_d) use two-accumulator suffix walks
  over the 32 x 32 bucket-index factorization; the cross-window Horner fold
  (~250 sequential width-1 doublings) runs on HOST bigint EC (~2 ms) instead
  of paying ~100 ms of device dispatch latency (see MsmCtx._host_fold);
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

WINDOW_BITS = 11
# signed balanced digits d in [-2^(c-1), 2^(c-1)-1]: bucket index |d| in
# 1..2^(c-1) (digit 0 excluded), point negation folded into the gather —
# halves the bucket count per window AND cuts the window count from 32 to 24
# for 254-bit scalars, so total accumulate work (nw * buckets * M ~ nw * N *
# pad) drops ~2x vs unsigned 8-bit windows
NUM_BUCKETS = 1 << (WINDOW_BITS - 1)
_HALF = 1 << (WINDOW_BITS - 1)
FACT_H = 32  # NUM_BUCKETS = FACT_H * FACT_L (suffix-walk decomposition)
FACT_L = NUM_BUCKETS // FACT_H
SIGN_SHIFT = 26  # bit of the packed member index carrying the digit sign
_ROW_MASK = (1 << SIGN_SHIFT) - 1


def _num_windows(nbits: int) -> int:
    return -(-nbits // WINDOW_BITS)


def scalar_digits(scalars, nbytes: int = 32) -> np.ndarray:
    """Python ints -> [nw, N] signed balanced window digits (int32, LSB
    window first): sum_w d_w 2^(c w) = s with d_w in [-2^(c-1), 2^(c-1)]."""
    n = len(scalars)
    nb = nbytes + 2  # slack for 3-byte window reads
    buf = b"".join(int(s).to_bytes(nb, "little") for s in scalars)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, nb).astype(np.int64)
    nw = _num_windows(8 * nbytes)
    mask = (1 << WINDOW_BITS) - 1
    digs = np.zeros((nw, n), np.int64)
    for w in range(nw):
        k, off = divmod(WINDOW_BITS * w, 8)
        v = (arr[:, k] | (arr[:, k + 1] << 8) | (arr[:, k + 2] << 16)) >> off
        digs[w] = v & mask
    carry = np.zeros(n, np.int64)
    for w in range(nw):
        v = digs[w] + carry
        carry = (v >= _HALF).astype(np.int64)
        digs[w] = v - (carry << WINDOW_BITS)
    if carry.any():
        raise ValueError("scalar overflows the window decomposition")
    return digs.astype(np.int32)


def digits_from_mont_limbs(f, mont_limbs, nbytes: int = 32):
    """Montgomery [N, L] limb array -> [nw, N] signed window digits, on
    device (avoids the device->host->device round trip when MSM scalars are
    already resident — every KZG commit in the prover).  Windows are
    re-packed from the 12-bit limbs with static shifts; the balanced signed
    recode is a short static carry chain over the nw windows."""
    from ..fields.params import LIMB_BITS

    canon = f.from_mont(mont_limbs)
    nw = _num_windows(8 * nbytes)
    mask = (1 << WINDOW_BITS) - 1
    cols = []
    for w in range(nw):
        k, off = divmod(WINDOW_BITS * w, LIMB_BITS)
        if k >= f.L:
            cols.append(jnp.zeros(canon.shape[0], jnp.int32))
            continue
        b = canon[:, k] >> off
        if k + 1 < f.L and off + WINDOW_BITS > LIMB_BITS:
            b = b | (canon[:, k + 1] << (LIMB_BITS - off))
        cols.append(b & mask)
    carry = jnp.zeros(canon.shape[0], jnp.int32)
    out = []
    for w in range(nw):
        v = cols[w] + carry
        carry = (v >= _HALF).astype(jnp.int32)
        out.append(v - (carry << WINDOW_BITS))
    return jnp.stack(out, axis=0)


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
    """[nw, N] signed digits -> [nw, NUM_BUCKETS, M] packed member indices
    into the infinity-padded point table: low bits = point row (n = padding),
    bit SIGN_SHIFT = negate-the-point flag (digit was negative)."""

    def window_indices(digits_w):
        mag = jnp.abs(digits_w)
        order = jnp.argsort(mag)
        sorted_mag = mag[order]
        sign = (digits_w[order] < 0).astype(jnp.int32)
        packed = order | (sign << SIGN_SHIFT)
        dvals = jnp.arange(1, NUM_BUCKETS + 1, dtype=jnp.int32)
        left = jnp.searchsorted(sorted_mag, dvals, side="left")
        right = jnp.searchsorted(sorted_mag, dvals, side="right")
        counts = right - left                      # [NUM_BUCKETS]
        offs = jnp.arange(m, dtype=jnp.int32)
        idx = left[:, None] + offs[None]           # [NUM_BUCKETS, M]
        valid = offs[None] < counts[:, None]
        return jnp.where(valid, packed[jnp.clip(idx, 0, n - 1)], n)

    return jax.vmap(window_indices)(digits)


def _gather_signed(ops: CurveOps, points_pad, packed):
    """Packed member indices -> affine points with the sign applied
    (y -> -y on negative-digit lanes; the infinity row (0,0) is fixed by
    f.sub(0, 0) = 0)."""
    f = ops.f
    rows = packed & _ROW_MASK
    neg = (packed >> SIGN_SHIFT) == 1
    pts = points_pad[rows]                         # [..., 2, L]
    y = pts[..., 1, :]
    y = f.select(neg, f.sub(jnp.zeros_like(y), y), y)
    return jnp.concatenate(
        [pts[..., 0:1, :], y[..., None, :]], axis=-2
    )


def bucket_accumulate(ops: CurveOps, points_pad, digits, m: int):
    """Shared kernel body: [N+1, 2, L] infinity-padded points + [nw, N]
    signed digits -> [nw, NUM_BUCKETS, 3, L] bucket sums, with static member
    capacity m.

    Traceable (used inside the shard_map'd multi-chip step and as the CPU
    fallback of the single-chip path)."""
    n = points_pad.shape[0] - 1
    nw = digits.shape[0]
    gidx = _bucket_indices(digits, m, n)           # [nw, NUM_BUCKETS, M]

    def acc_body(j, acc):
        pts = _gather_signed(ops, points_pad, gidx[:, :, j])
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
    gidx = _bucket_indices(digits, m, n)           # [nw, NUM_BUCKETS, M]
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
        pts = jnp.transpose(
            _gather_signed(ops, points_pad, idx), (1, 2, 0)
        )  # [2, L, B]
        return mixed(acc, pts)

    acc = jax.lax.fori_loop(0, m, acc_body, acc0)
    return jnp.transpose(acc[:, :, :b], (2, 0, 1)).reshape(
        nw, NUM_BUCKETS, 3, ops.L
    )


def suffix_window_sums(ops: CurveOps, buckets):
    """[nw, NUM_BUCKETS, 3, L] bucket sums -> [nw, 3, L] window sums S_w
    (traceable).

    Per window: S_w = sum_d d * B_d, d = 1..NUM_BUCKETS.  The naive suffix
    walk is 2*NUM_BUCKETS sequential adds over only [nw] lanes — on TPU each
    tiny step pays the same latency as a wide one, so the walk is decomposed
    over NUM_BUCKETS = FACT_H * FACT_L: writing bucket index k = FACT_L*h + l
    (digit d = k + 1),

      sum_k (k+1) B_k = FACT_L * sum_h h C_h + sum_l l D_l + sum_k B_k,
      C_h = sum_l B[h, l],   D_l = sum_h B[h, l].

    Graph economy is the binding constraint here (compile cost ~= 1s per
    field-mul per *distinct* traced point-op body — BASELINE.md cost model),
    so the reductions/walks are batched into exactly four loop bodies:

      1. one joint reduction producing C and D together (grid and its
         transpose stacked on a leading axis of 2),
      2. one joint two-accumulator weighted suffix walk over the stacked
         [C; D] rows (running suffix + weighted total),
      3. five doublings of wh (FACT_L = 2^5),
      4. one stacked 4-way reduction computing
         S_w = wh*32 + wl + (running_C + C_0)   (running_C = sum_{h>=1} C_h,
         so running_C + C_0 = sum_k B_k).

    The cross-window Horner fold lives in MsmCtx._host_fold (single-chip) /
    suffix_and_fold (multi-chip)."""
    nw = buckets.shape[0]
    assert NUM_BUCKETS == FACT_H * FACT_L and FACT_H == FACT_L
    grid = buckets.reshape(nw, FACT_H, FACT_L, 3, ops.L)
    # stacked [2, nw, 32, 32, 3, L]: lane 0 reduces over l -> C, lane 1 over h -> D
    both = jnp.stack([grid, jnp.swapaxes(grid, 1, 2)])

    def red(i, acc):
        return ops.jac_add(acc, both[:, :, :, i])

    cd = jax.lax.fori_loop(
        0, FACT_L, red, ops.jac_infinity((2, nw, FACT_H))
    )  # cd[0] = C [nw, FACT_H], cd[1] = D [nw, FACT_L]

    def walk(i, acc):
        # sum_i i * arr[i] = sum of suffix sums arr[i:] for i >= 1
        running, total = acc
        running = ops.jac_add(running, cd[:, :, FACT_H - 1 - i])
        total = ops.jac_add(total, running)
        return running, total

    init = (ops.jac_infinity((2, nw)), ops.jac_infinity((2, nw)))
    running, total = jax.lax.fori_loop(0, FACT_H - 1, walk, init)
    wh, wl = total[0], total[1]                # sum_h h C_h, sum_l l D_l

    def dbl(_, a):
        return ops.jac_double(a)

    assert FACT_L == 32
    wh32 = jax.lax.fori_loop(0, 5, dbl, wh)    # FACT_L * wh
    # S_w = wh32 + wl + (running_C + C_0); one stacked reduction
    parts = jnp.stack([wh32, wl, running[0], cd[0, :, 0]])  # [4, nw, 3, L]

    def red4(i, acc):
        return ops.jac_add(acc, parts[i])

    return jax.lax.fori_loop(0, 4, red4, ops.jac_infinity((nw,)))


def suffix_and_fold(ops: CurveOps, buckets):
    """[nw, 255, 3, L] bucket sums -> [3, L] final accumulator (traceable).

    Device-resident Horner fold across windows — used where the result must
    stay on device (the shard_map'd multi-chip step).  The single-chip MsmCtx
    path folds on the host instead: ~250 sequential width-1 doublings cost
    ~100 ms of op-dispatch latency on device vs ~2 ms of host bigint EC."""
    window_sums = suffix_window_sums(ops, buckets)

    def fold(acc, wsum):
        # doublings via fori_loop: one traced jac_double body instead of
        # WINDOW_BITS unrolled copies (compile cost is per distinct body)
        acc = jax.lax.fori_loop(
            0, WINDOW_BITS, lambda _, a: ops.jac_double(a), acc
        )
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
        """Max population over all non-zero buckets (by |digit|) of all
        windows.  digits: [nw, N] signed int32."""
        sorted_d = jnp.sort(jnp.abs(digits), axis=1)
        # pos[:, k] = first index with |digit| >= k+1, k = 0..NUM_BUCKETS;
        # diff along k gives the population of buckets 1..NUM_BUCKETS.
        edges = jnp.arange(1, NUM_BUCKETS + 2, dtype=jnp.int32)
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
            return suffix_window_sums(ops, buckets)

        jfn = jax.jit(fn)
        self._msm_fn_cache[m] = jfn
        return jfn

    def _host_fold(self, window_sums) -> tuple | None:
        """[nw, 3, L] Montgomery projective window sums -> host affine int
        tuple (or None).  The cross-window Horner ladder is ~250 sequential
        width-1 point ops — host bigint EC does it in ~2 ms where the device
        pays ~100 ms of dispatch latency."""
        from ..fields import limbs as limbs_mod
        from ..host import fp as hfp

        fp = self.curve.fp
        p = fp.modulus
        ws = np.asarray(window_sums)
        nw = ws.shape[0]
        coords = limbs_mod.mont_limbs_to_ints(
            ws.reshape(nw * 3, self.ops.L), fp
        )
        F = hfp.GF(p)
        acc = None
        for w in range(nw - 1, -1, -1):
            X, Y, Z = coords[3 * w], coords[3 * w + 1], coords[3 * w + 2]
            if acc is not None:
                for _ in range(WINDOW_BITS):
                    acc = hfp.ec_double(F, acc)
            if Z != 0:
                zi = pow(Z, -1, p)
                acc = hfp.ec_add(F, acc, (X * zi % p, Y * zi % p))
        return acc

    # ------------------------------------------------------------------ API

    def msm_to_affine_int(self, points_affine, scalars):
        """MSM over G1 -> host affine int tuple (or None).

        points_affine: [N, 2, L] device array (Montgomery affine limbs).
        scalars: sequence of python ints (canonical) or [nw, N] digit array.

        Bucket accumulation + per-window suffix sums run as one closed jit;
        the final cross-window ladder folds on host (see _host_fold).
        """
        n = points_affine.shape[0]
        if isinstance(scalars, (np.ndarray, jnp.ndarray)) and scalars.ndim == 2:
            digits = jnp.asarray(scalars)
        else:
            digits = jnp.asarray(scalar_digits(scalars))
        assert digits.shape[1] == n

        max_count = int(self._max_count(digits))
        if max_count == 0:
            return None
        m = _round_bucket_capacity(max_count)

        inf_row = jnp.zeros((1, 2, self.ops.L), jnp.int32)
        points_pad = jnp.concatenate([points_affine, inf_row], axis=0)
        window_sums = self._msm_fn(m)(points_pad, digits)
        return self._host_fold(window_sums)

    def msm(self, points_affine, scalars) -> jnp.ndarray:
        """MSM over G1: returns projective [3, L] (device).  Thin wrapper
        over msm_to_affine_int for callers that want a device value."""
        aff = self.msm_to_affine_int(points_affine, scalars)
        return self.ops.affine_to_jac(
            jnp.asarray(self.ops.encode_affine([aff]))
        )[0]


@functools.lru_cache(maxsize=None)
def msm_ctx(curve: CurveParams) -> MsmCtx:
    return MsmCtx(curve)
