"""Multi-scalar multiplication on TPU — prefix-scan bucket method.

This is the north-star kernel (BASELINE.md): it replaces gnark-crypto's
multicore bucket MSM that executes every KZG commitment inside plonk.Prove
(reference algoplonk.go:89).

TPU-first reformulation of Pippenger (SURVEY.md section 7 hard part #3 —
"Pippenger without scatter"), round-3 design:

* scalars are recoded into signed balanced c = 11-bit windows (digit in
  [-1024, 1024]); the bucket index is |d| with the sign folded into the
  point gather (y -> -y), so 254-bit scalars need nw = 24 windows of
  D = 1024 buckets;
* per window, entries are sorted by |d| (argsort) — bucket d's members are
  then a contiguous run [e_{d-1}+1 .. e_d] of the sort order, where
  e_d = (last index with |digit| <= d);
* bucket sums come from *unsegmented inclusive prefix sums* of the sorted
  signed points: B_d = P[e_d] - P[e_{d-1}] (group subtraction is free:
  negate y).  The window sum telescopes —

      S_w = sum_d d * B_d  =  D * P[e_D]  -  sum_{d=0}^{D-1} P[e_d]

  so only the D+1 prefix values P[e_d] are ever needed, and the suffix
  bucket walk of classic Pippenger disappears;
* the prefix sums are computed block-decomposed, all shapes static:
    phase 1: K-entry in-block reduction (K steps of width nw*N/K mixed
             adds) -> per-block sums;
    phase 2: Kogge-Stone inclusive scan over the nw*N/K block sums
             (log2(N/K) complete-add steps);
    phase 3: for each of the nw*(D+1) targets e_d, re-scan just the block
             containing e_d (K masked mixed-add steps of width nw*(D+1))
             and add the preceding block's scan value;
    phase 4: tree-reduce the D prefix values per window (10 halvings),
             10 doublings for D*P[e_D], one subtraction -> S_w.
  Total sequential depth ~ 2K + log2(N/K) + 20 steps, *independent of the
  scalar distribution* — the round-2 design's data-dependent bucket
  capacity M (a host sync + a recompile per M, and M ~ N/4 for real
  254-bit scalars whose top window is concentrated) is gone;
* every step is wide branch-free vector work with zero scatter; the adds
  run as fused Pallas kernels on TPU (ops/curve_pallas.py: complete RCB
  mixed and projective adds with all intermediates in VMEM) and as
  XLA-composed ops elsewhere (CPU tests / fallback);
* the cross-window Horner fold (~250 sequential width-1 doublings) runs on
  HOST bigint EC (~2 ms) instead of paying device dispatch latency
  (MsmCtx._host_fold); the device-resident fold_windows exists for the
  shard_map'd multi-chip path.

The ENTIRE device pipeline — sort, searchsorted, scans, gathers — is one
jitted function per N: no data-dependent shapes, no host round trips.

Small N (every selector commit of a toy circuit, most of the test suite)
skips the device entirely: a host Pippenger over python bigints answers in
milliseconds where an XLA compile would cost seconds to minutes
(AP_HOST_MSM_MAX, default 1024).

Multi-chip: the window-sum decomposition distributes over point shards, so
parallel/msm_sharded.py runs the same traceable pipeline per shard inside
shard_map and folds the D projective partials with one tiny collective.
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
# signed balanced digits d in [-2^(c-1), 2^(c-1)]: bucket index |d| in
# 1..2^(c-1), point negation folded into the gather — halves the bucket
# count AND cuts the window count from 32 to 24 for 254-bit scalars
NUM_BUCKETS = 1 << (WINDOW_BITS - 1)
_HALF = 1 << (WINDOW_BITS - 1)
SIGN_SHIFT = 26  # bit of the packed member index carrying the digit sign
_ROW_MASK = (1 << SIGN_SHIFT) - 1
_TILE = 512      # pallas lane tile; lane counts pad up to a multiple


def _num_windows(nbits: int, c: int = WINDOW_BITS) -> int:
    return -(-nbits // c)


def num_windows(c: int = WINDOW_BITS) -> int:
    """Windows for a 256-bit scalar buffer, with one bit of headroom so the
    balanced signed recode's final carry always lands inside the top window
    (reachable for BLS12-381's 255-bit r when c divides 256)."""
    return _num_windows(257, c)


def pick_window_bits(n: int) -> int:
    """Window size from N (classic Pippenger c ~ log2(N) - slack): keeps
    the nw*(2^(c-1)+1) lane widths — and with them compile time and padding
    waste — proportional to the problem for small MSMs."""
    return max(2, min(WINDOW_BITS, n.bit_length() - 2))


def scalar_digits(scalars, nbytes: int = 32, c: int = WINDOW_BITS) -> np.ndarray:
    """Python ints -> [nw, N] signed balanced window digits (int32, LSB
    window first): sum_w d_w 2^(c w) = s with d_w in [-2^(c-1), 2^(c-1)]."""
    n = len(scalars)
    half = 1 << (c - 1)
    nb = nbytes + 3  # slack for 3-byte reads from the headroom window
    buf = b"".join(int(s).to_bytes(nb, "little") for s in scalars)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, nb).astype(np.int64)
    nw = num_windows(c)
    mask = (1 << c) - 1
    digs = np.zeros((nw, n), np.int64)
    for w in range(nw):
        k, off = divmod(c * w, 8)
        v = (arr[:, k] | (arr[:, k + 1] << 8) | (arr[:, k + 2] << 16)) >> off
        digs[w] = v & mask
    carry = np.zeros(n, np.int64)
    for w in range(nw):
        v = digs[w] + carry
        carry = (v >= half).astype(np.int64)
        digs[w] = v - (carry << c)
    if carry.any():
        raise ValueError("scalar overflows the window decomposition")
    return digs.astype(np.int32)


def digits_from_mont_limbs(f, mont_limbs, nbytes: int = 32,
                           c: int = WINDOW_BITS):
    """Montgomery [N, L] limb array -> [nw, N] signed window digits, on
    device (avoids the device->host->device round trip when MSM scalars are
    already resident — every KZG commit in the prover).  Windows are
    re-packed from the 12-bit limbs with static shifts (c <= 12 spans at
    most two limbs); the balanced signed recode is a short static carry
    chain over the nw windows."""
    from ..fields.params import LIMB_BITS

    half = 1 << (c - 1)
    canon = f.from_mont(mont_limbs)
    nw = num_windows(c)
    mask = (1 << c) - 1
    cols = []
    for w in range(nw):
        k, off = divmod(c * w, LIMB_BITS)
        if k >= f.L:
            cols.append(jnp.zeros(canon.shape[0], jnp.int32))
            continue
        b = canon[:, k] >> off
        if k + 1 < f.L and off + c > LIMB_BITS:
            b = b | (canon[:, k + 1] << (LIMB_BITS - off))
        cols.append(b & mask)
    carry = jnp.zeros(canon.shape[0], jnp.int32)
    out = []
    for w in range(nw):
        v = cols[w] + carry
        carry = (v >= half).astype(jnp.int32)
        out.append(v - (carry << c))
    return jnp.stack(out, axis=0)


def _gather_signed(ops: CurveOps, pts_flat, packed):
    """Packed member indices -> affine points with the sign applied
    (y -> -y on negative-digit lanes; the infinity row (0,0) is fixed by
    f.sub(0, 0) = 0).  ``pts_flat``: [N+1, 2L] row-flattened table."""
    f = ops.f
    rows = packed & _ROW_MASK
    neg = (packed >> SIGN_SHIFT) == 1
    pts = pts_flat[rows].reshape(*packed.shape, 2, ops.L)
    y = pts[..., 1, :]
    y = f.select(neg, f.sub(jnp.zeros_like(y), y), y)
    return jnp.concatenate(
        [pts[..., 0:1, :], y[..., None, :]], axis=-2
    )


class _Adders:
    """Point-add backends for the scan pipeline.

    All pipeline state is limbs-major [3, L, W] (batch minor -> 128-lane
    VPU axis, ops/field_pallas.py).  On TPU the adds are fused Pallas
    kernels; the XLA fallback transposes to batch-major around ops/curve.py
    (correctness path for CPU tests and for Mosaic-failure fallback)."""

    def __init__(self, ops: CurveOps, use_pallas: bool):
        self.ops = ops
        self.use_pallas = use_pallas
        if use_pallas:
            from .curve_pallas import (
                pallas_canon,
                pallas_jac_add,
                pallas_jac_add_multi,
                pallas_jac_add_multi_scan,
                pallas_mixed_add,
                pallas_mixed_add_signed,
                pallas_mixed_add_signed_multi,
            )

            self._mixed = pallas_mixed_add(ops.curve, _TILE)
            self._mixed_signed = pallas_mixed_add_signed(ops.curve, _TILE)
            self._jac = pallas_jac_add(ops.curve, _TILE)
            self._mixed_signed_multi = lambda g: pallas_mixed_add_signed_multi(
                ops.curve, _TILE, g
            )
            self._jac_multi = lambda g: pallas_jac_add_multi(
                ops.curve, _TILE, g
            )
            # the scan kernel holds 2 x [3g, L, tile] blocks in VMEM
            # (input steps + emitted scans, double-buffered); at L = 33 and
            # tile 512 that exceeds the 16 MB scoped-vmem limit (measured
            # 18.45 MB -> Mosaic OOM -> silent XLA fallback, 23x slower).
            # Halve the tile for wide fields.
            scan_tile = _TILE if ops.L <= 22 else _TILE // 2
            self._jac_multi_scan = lambda g: pallas_jac_add_multi_scan(
                ops.curve, scan_tile, g
            )
            self._canon = pallas_canon(ops.curve.fp, _TILE)

    def inf(self, w: int):
        """Limbs-major identity (0 : 1 : 0) at lane width w."""
        f = self.ops.f
        z = jnp.zeros((self.ops.L, w), jnp.int32)
        one = jnp.broadcast_to(f.one[:, None], (self.ops.L, w))
        return jnp.stack([z, one, z])

    def mixed(self, acc_lm, pts_bm):
        """acc [3, L, W] (+) pts [W, 2, L] -> [3, L, W]."""
        if self.use_pallas:
            return self._mixed(acc_lm, jnp.transpose(pts_bm, (1, 2, 0)))
        out = self.ops.jac_add_affine(
            jnp.transpose(acc_lm, (2, 0, 1)), pts_bm
        )
        return jnp.transpose(out, (1, 2, 0))

    def jac(self, a_lm, b_lm):
        """Complete projective add, both limbs-major [3, L, W]."""
        if self.use_pallas:
            return self._jac(a_lm, b_lm)
        out = self.ops.jac_add(
            jnp.transpose(a_lm, (2, 0, 1)), jnp.transpose(b_lm, (2, 0, 1))
        )
        return jnp.transpose(out, (1, 2, 0))

    def gather_mixed(self, acc_lm, pts_flat, packed):
        """acc [3, L, W] (+) signed-gathered points table[packed] (packed
        member indices, sign bit SIGN_SHIFT).

        ``pts_flat``: [N+1, 2L] row-flattened table — contiguous 2L-word
        rows gather at HBM speed where the [N+1, 2, L] form's tiny minor
        dims made XLA's gather superlinearly slow (round-5 fix: phase 1 at
        2^18 was 735 ms, ~640 ms of it the gather; flat rows + a 2D
        transpose are linear).  Sign applied in VMEM by the kernel."""
        rows = packed & _ROW_MASK
        if self.use_pallas:
            w = packed.shape[-1]
            pts = pts_flat[rows].T.reshape(2, self.ops.L, w)
            neg = ((packed >> SIGN_SHIFT) == 1).astype(jnp.int32)[None]
            return self._mixed_signed(acc_lm, pts, neg)
        return self.mixed(acc_lm, _gather_signed(self.ops, pts_flat, packed))

    def gather_mixed_multi(self, acc_lm, pts_flat, packed):
        """``g`` fused signed gather-adds: packed [g, W] -> acc after adding
        all g gathered point rows in sequence (pallas path only — callers
        keep the fori_loop formulation for XLA)."""
        g, w = packed.shape
        L = self.ops.L
        rows = (packed & _ROW_MASK).reshape(-1)
        mode = os.environ.get("AP_MSM_STAGE", "flat")
        if mode == "old":
            pts3 = pts_flat[rows].reshape(g, w, 2, L)
            pts = jnp.transpose(pts3, (0, 2, 3, 1)).reshape(2 * g, L, w)
        else:
            flat = pts_flat[rows]                    # [g*W, 2L] row gather
            t = flat.T.reshape(2, L, g, w)           # [(c,l), (g,w)] split
            pts = jnp.transpose(t, (2, 0, 1, 3)).reshape(2 * g, L, w)
        neg = ((packed >> SIGN_SHIFT) == 1).astype(jnp.int32)
        return self._mixed_signed_multi(g)(acc_lm, pts, neg)

    def jac_multi(self, acc_lm, qs):
        """``g`` fused projective adds: qs [g*3, L, W] added to acc in
        sequence (pallas path only)."""
        g = qs.shape[0] // 3
        return self._jac_multi(g)(acc_lm, qs)

    def jac_multi_scan(self, acc_lm, qs):
        """``g`` fused projective adds emitting every intermediate:
        returns [g*3, L, W] inclusive scans (pallas path only)."""
        g = qs.shape[0] // 3
        return self._jac_multi_scan(g)(acc_lm, qs)

    def canon(self, x_lm):
        """Canonicalize lazy kernel outputs [R, L, W] (pallas path; XLA
        values are already canonical)."""
        return self._canon(x_lm) if self.use_pallas else x_lm


def _pad_lanes(n: int) -> int:
    return -(-n // _TILE) * _TILE


def window_sums_scan(
    ops: CurveOps, points_pad, digits, c: int = WINDOW_BITS,
    k_block: int = 16, use_pallas: bool = False, stop_after: str | None = None,
):
    """[N+1, 2, L] infinity-padded affine points + [nw, N] signed digits
    (window size c) -> [nw, 3, L] batch-major window sums S_w = sum_d d*B_d.

    Fully traceable, all shapes static in N (module docstring has the
    algorithm).  Used by the single-chip MsmCtx and, per shard, by
    parallel/msm_sharded.py.

    ``stop_after`` ('sort' | 'p1' | 'p2' | 'p3'): return the named phase's
    live output instead of the window sums — profiling hook (bench_kernels
    attributes per-phase cost by differencing jitted prefixes)."""
    f = ops.f
    n = points_pad.shape[0] - 1
    # row-flattened table: contiguous 2L-word rows give the 16*nw random
    # row gathers below an HBM-friendly access pattern (the [N+1, 2, L]
    # form's (2, L) minor dims forced a layout whose gather cost grew
    # superlinearly in N — measured 43 ms @2^17 -> 296 ms @2^18 for the
    # same 7-step gather before this flattening)
    pts_flat = points_pad.reshape(n + 1, 2 * ops.L)
    nw = digits.shape[0]
    D = 1 << (c - 1)
    K = max(1, min(k_block, n))
    # two-level phase 2 once there are enough blocks for the full-width
    # Kogge-Stone scan to dominate: super-blocks of S blocks
    S = 16
    two_level = (-(-n // K)) >= 16 * S
    blk_quant = K * S if two_level else K
    n_pad = -(-n // blk_quant) * blk_quant
    nblk = n_pad // K
    nsb = nblk // S if two_level else 0
    add = _Adders(ops, use_pallas)

    # ---- sort each window by |digit|; pad with (mag > D, index n) entries.
    # The (|d|, sign, row) triple packs into ONE int32 key whenever
    # bits(D) + 1 + bits(n-1) <= 31 (always true under the <= 2^18 chunking)
    # — a single-operand sort moves half the bytes of the two-operand
    # key+payload form (measured 35 ms -> ~18 ms at [24, 2^17]).
    mag = jnp.abs(digits)
    rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None], (nw, n)
    )
    idx_bits = max(1, (n - 1).bit_length())
    if (D.bit_length() + 1 + idx_bits <= 31 and idx_bits <= SIGN_SHIFT
            and os.environ.get("AP_MSM_PACKED_SORT", "1") == "1"):
        combo = (
            (mag << (idx_bits + 1))
            | ((digits < 0).astype(jnp.int32) << idx_bits)
            | rows
        )
        scombo = jax.lax.sort(combo, dimension=1)
        smag = scombo >> (idx_bits + 1)
        packed = (scombo & ((1 << idx_bits) - 1)) | (
            ((scombo >> idx_bits) & 1) << SIGN_SHIFT
        )
    else:
        payload = rows | ((digits < 0).astype(jnp.int32) << SIGN_SHIFT)
        smag, packed = jax.lax.sort((mag, payload), dimension=1, num_keys=1)
    if n_pad > n:
        smag = jnp.concatenate(
            [smag, jnp.full((nw, n_pad - n), D + 1, jnp.int32)], axis=1
        )
        packed = jnp.concatenate(
            [packed, jnp.full((nw, n_pad - n), n, jnp.int32)], axis=1
        )
    # [K, nw, nblk]: member j of each block, contiguous per loop step
    packed_blk = jnp.transpose(packed.reshape(nw, nblk, K), (2, 0, 1))
    if stop_after == "sort":
        return smag, packed_blk

    # ---- phase 1: in-block reduction -> block sums [3, L, W1p].
    # Pallas: K steps fused into ceil(K/G) multi-step kernels (acc resident
    # in VMEM across each G-step block); G bounded by the HBM cost of the
    # staged gathers (G * W1p * 176 B) and by Mosaic kernel size.
    w1 = nw * nblk
    w1p = _pad_lanes(w1)
    # fused steps per kernel: 16 measured fastest on BN254 (L = 22).  For
    # the wider BLS12-381 limb count the 16-step fused mixed-add kernel
    # produced sparse data-dependent wrong lanes INSIDE the full pipeline
    # program (deterministic per data; the isolated kernel and the staged
    # gather both verify clean at g = 16, and g = 8 is correct everywhere
    # — see KNOWN_ISSUES.md "BLS12-381 16-step fused kernel miscompile").
    # Default to 8 for L > 22 until the Mosaic/XLA interaction is fixed.
    fuse = int(os.environ.get("AP_MSM_FUSE_STEPS",
                              "16" if ops.L <= 22 else "8"))

    def fused_gather_steps(acc, packed_steps, nsteps, lanes, lanes_pad):
        """packed_steps [nsteps, ...lanes]: apply in groups of <= ``fuse``."""
        per_step_bytes = lanes_pad * 2 * ops.L * 4
        g_max = max(1, min(fuse, (512 << 20) // max(per_step_bytes, 1)))
        flat = packed_steps.reshape(nsteps, lanes)
        flat = jnp.concatenate(
            [flat, jnp.full((nsteps, lanes_pad - lanes), n, jnp.int32)],
            axis=1,
        )
        j = 0
        while j < nsteps:
            g = min(g_max, nsteps - j)
            acc = add.gather_mixed_multi(acc, pts_flat, flat[j : j + g])
            j += g
        return acc

    if use_pallas:
        block_sums = fused_gather_steps(
            add.inf(w1p), packed_blk, K, w1, w1p
        )
    else:

        def p1_body(j, acc):
            idx = packed_blk[j].reshape(w1)
            idx = jnp.concatenate([idx, jnp.full((w1p - w1,), n, jnp.int32)])
            return add.gather_mixed(acc, pts_flat, idx)

        block_sums = jax.lax.fori_loop(0, K, p1_body, add.inf(w1p))

    if stop_after == "p1":
        return block_sums

    # ---- phase 3 target indices (shared by both phase-2 variants)
    dvals = jnp.arange(0, D + 1, dtype=jnp.int32)
    e = jax.vmap(
        lambda row: jnp.searchsorted(row, dvals, side="right")
    )(smag).astype(jnp.int32) - 1                  # [nw, D+1], in [-1, n-1]
    eb = jnp.where(e >= 0, e // K, -1)
    r = jnp.where(e >= 0, e - eb * K, -1)
    prev = eb - 1                                  # last block fully before e_d
    w_ids = jnp.broadcast_to(
        jnp.arange(nw, dtype=jnp.int32)[:, None], (nw, D + 1)
    )
    w2 = nw * (D + 1)
    w2p = _pad_lanes(w2)

    def gather_rows_lm(bm_with_inf, lane, invalid):
        """Rows of a batch-major [R+1, 3, L] table (last row = identity) at
        [nw, D+1] lane ids -> limbs-major [3, L, W2p] (invalid -> identity,
        as is the W2p padding).  Gathers through the row-flattened [R+1, 3L]
        view (same superlinear-gather fix as gather_mixed_multi)."""
        R1 = bm_with_inf.shape[0]
        idx = jnp.where(invalid, R1 - 1, lane).reshape(w2)
        idx = jnp.concatenate(
            [idx, jnp.full((w2p - w2,), R1 - 1, jnp.int32)]
        )
        flat = bm_with_inf.reshape(R1, 3 * ops.L)
        return flat[idx].T.reshape(3, ops.L, w2p)

    inf_row_bm = ops.jac_infinity((1,))

    if not two_level:
        # ---- phase 2 (single level): Kogge-Stone inclusive scan over block
        # sums per window.  lane layout w*nblk + b; a shift by s must not
        # cross window boundaries.  One traced body (dynamic shift s = 2^i).
        b_idx = jnp.asarray(np.concatenate(
            [np.tile(np.arange(nblk, dtype=np.int32), nw),
             np.full(w1p - w1, -1, np.int32)]
        ))
        inf_w1p = add.inf(w1p)

        def p2_body(i, scan):
            sh = 1 << i
            shifted = jnp.roll(scan, sh, axis=2)
            shifted = jnp.where((b_idx < sh)[None, None, :], inf_w1p, shifted)
            return add.jac(scan, shifted)

        n_steps = max(0, (nblk - 1).bit_length())
        scan = jax.lax.fori_loop(0, n_steps, p2_body, block_sums)

        scan_bm = jnp.concatenate(
            [jnp.transpose(scan, (2, 0, 1)), inf_row_bm]
        )                                          # [W1p+1, 3, L]
        lane = w_ids * nblk + jnp.clip(prev, 0, nblk - 1)
        base_lm = gather_rows_lm(scan_bm, lane, prev < 0)
    else:
        # ---- phase 2 (two level): the full-width KS scan costs
        # log2(nblk) complete adds over nw*nblk lanes; decomposing into
        # super-blocks of S cuts that to S + log2(nsb) steps at nw*nsb
        # lanes plus an S-step masked rescan at phase-3 width.
        # 2a: reduce each super-block of S block sums (narrow: [S] major)
        bs5 = block_sums[:, :, :w1].reshape(3, ops.L, nw, nsb, S)
        wsb = nw * nsb
        wsbp = _pad_lanes(wsb)
        # pad lanes once, outside the loop (zeros = junk points that never
        # feed a consulted lane — all gathers below clip to wsb)
        bs_steps = jnp.pad(
            jnp.moveaxis(bs5, 4, 0).reshape(S, 3, ops.L, wsb),
            ((0, 0), (0, 0), (0, 0), (0, wsbp - wsb)),
        )

        is_scan = None
        if use_pallas:
            # scan-emitting kernel: besides the super sums, materialize the
            # inclusive intra-super-block scans — the 2c rescan then
            # collapses to ONE 264-byte row gather below (was S masked
            # fused-add steps at w2p lanes, ~15 ms @2^17)
            qs = bs_steps.reshape(S * 3, ops.L, wsbp)
            is_scan = add.jac_multi_scan(add.inf(wsbp), qs)
            super_sums = is_scan[-3:]
        else:

            def p2a_body(j, acc):
                return add.jac(acc, bs_steps[j])

            super_sums = jax.lax.fori_loop(0, S, p2a_body, add.inf(wsbp))

        # 2b: KS scan over super sums per window
        sb_idx = jnp.asarray(np.concatenate(
            [np.tile(np.arange(nsb, dtype=np.int32), nw),
             np.full(wsbp - wsb, -1, np.int32)]
        ))
        inf_wsbp = add.inf(wsbp)

        def p2b_body(i, scan):
            sh = 1 << i
            shifted = jnp.roll(scan, sh, axis=2)
            shifted = jnp.where(
                (sb_idx < sh)[None, None, :], inf_wsbp, shifted
            )
            return add.jac(scan, shifted)

        if stop_after == "p2a":
            return super_sums
        sb_steps = max(0, (nsb - 1).bit_length())
        super_scan = jax.lax.fori_loop(0, sb_steps, p2b_body, super_sums)
        if stop_after == "p2b":
            return super_scan

        # base = super_scan[esb_prev - 1] (+) block_sums[esb_prev*S .. prev]
        esb_prev = jnp.where(prev >= 0, prev // S, -1)
        r2 = jnp.where(prev >= 0, prev - esb_prev * S, -1)
        ss_bm = jnp.concatenate(
            [jnp.transpose(super_scan, (2, 0, 1))[:wsb], inf_row_bm]
        )
        lane_ss = w_ids * nsb + jnp.clip(esb_prev - 1, 0, nsb - 1)
        base_lm = gather_rows_lm(ss_bm, lane_ss, esb_prev - 1 < 0)

        if use_pallas:
            # 2c as one gather: base (+) is_scan[r2] at the target's
            # super-block lane.  Row table [(lane, s), 3L] from one 2D
            # transpose of the kernel's scan output; identity row appended
            # for prev < 0 targets.
            flat_is = is_scan.reshape(S * 3 * ops.L, wsbp).T
            flat_is = flat_is.reshape(wsbp * S, 3 * ops.L)
            inf_flat = jnp.transpose(add.inf(1), (2, 0, 1)).reshape(
                1, 3 * ops.L
            )
            tbl = jnp.concatenate([flat_is, inf_flat], axis=0)
            lane_sb = w_ids * nsb + jnp.clip(esb_prev, 0, nsb - 1)
            idx = jnp.where(prev < 0, wsbp * S, lane_sb * S + r2).reshape(w2)
            idx = jnp.concatenate(
                [idx, jnp.full((w2p - w2,), wsbp * S, jnp.int32)]
            )
            rescan = tbl[idx].T.reshape(3, ops.L, w2p)
        else:
            bs_bm = jnp.concatenate(
                [jnp.transpose(block_sums, (2, 0, 1))[:w1], inf_row_bm]
            )
            lane_b0 = w_ids * nblk + jnp.clip(esb_prev * S, 0, nblk - 1)

            def p2c_body(j, acc):
                invalid = (j > r2) | (prev < 0)
                term = gather_rows_lm(bs_bm, lane_b0 + j, invalid)
                return add.jac(acc, term)

            rescan = jax.lax.fori_loop(0, S, p2c_body, add.inf(w2p))
        base_lm = add.jac(base_lm, rescan)

    if stop_after == "p2":
        return base_lm

    # ---- phase 3: in-block point rescan up to e_d, then P[e_d]
    # members of the block containing each e_d: [K, nw, D+1]
    blk_members = jnp.take_along_axis(
        jnp.transpose(packed_blk, (1, 2, 0)),      # [nw, nblk, K]
        jnp.clip(eb, 0, nblk - 1)[:, :, None],
        axis=1,
    )                                              # [nw, D+1, K]
    blk_members = jnp.transpose(blk_members, (2, 0, 1))

    if use_pallas:
        j_all = jnp.arange(K, dtype=jnp.int32)[:, None, None]
        live_all = (j_all <= r[None]) & (e[None] >= 0)   # [K, nw, D+1]
        idx_all = jnp.where(live_all, blk_members, n)
        in_block = fused_gather_steps(add.inf(w2p), idx_all, K, w2, w2p)
    else:

        def p3_body(j, acc):
            live = (j <= r) & (e >= 0)             # [nw, D+1]
            idx = jnp.where(live, blk_members[j], n).reshape(w2)
            idx = jnp.concatenate([idx, jnp.full((w2p - w2,), n, jnp.int32)])
            return add.gather_mixed(acc, pts_flat, idx)

        in_block = jax.lax.fori_loop(0, K, p3_body, add.inf(w2p))
    p_e = add.jac(base_lm, in_block)               # [3, L, W2p]

    if stop_after == "p3":
        return p_e

    # ---- phase 4: S_w = D * P[e_D] - sum_{d<D} P[e_d], limbs-major.
    # Tree-sum along d at constant shape: new[j] = old[j] + old[j + D/2^i];
    # only lane d = 0 of each window is consulted at the end, and its
    # sources stay inside the window's (D+1)-lane block.  One traced body.
    def p4_body(i, acc):
        h = D >> (i + 1)
        return add.jac(acc, jnp.roll(acc, -h, axis=2))

    tree = jax.lax.fori_loop(0, (D - 1).bit_length(), p4_body, p_e)
    # pallas kernel outputs are lazy residues (< 34p, relaxed limbs); the
    # XLA-side math below (jac_double, strict sub) needs canonical values —
    # one strict Montgomery multiply by one canonicalizes (pallas_canon)
    tree = add.canon(tree)
    p_e = add.canon(p_e)
    stride = D + 1
    prefix_sum = jnp.transpose(
        tree[:, :, 0 : nw * stride : stride], (2, 0, 1)
    )                                              # [nw, 3, L]
    top = jnp.transpose(
        p_e[:, :, D : nw * stride : stride], (2, 0, 1)
    )

    def dbl(_, a):
        return ops.jac_double(a)

    d_top = jax.lax.fori_loop(0, c - 1, dbl, top)  # D * P[e_D], D = 2^(c-1)
    neg_y = f.sub(jnp.zeros_like(prefix_sum[:, 1]), prefix_sum[:, 1])
    neg_sum = jnp.concatenate(
        [prefix_sum[:, 0:1], neg_y[:, None], prefix_sum[:, 2:3]], axis=1
    )
    return ops.jac_add(d_top, neg_sum)             # [nw, 3, L]


def fold_windows(ops: CurveOps, window_sums, c: int = WINDOW_BITS):
    """[nw, 3, L] window sums -> [3, L] final accumulator (traceable).

    Device-resident Horner fold across windows — used where the result must
    stay on device (the shard_map'd multi-chip step).  The single-chip
    MsmCtx folds on the host instead: ~250 sequential width-1 doublings
    cost ~100 ms of op-dispatch latency on device vs ~2 ms of host bigint
    EC."""

    def fold(acc, wsum):
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: ops.jac_double(a), acc
        )
        return ops.jac_add(acc, wsum), None

    acc, _ = jax.lax.scan(fold, ops.jac_infinity(), window_sums, reverse=True)
    return acc


# --------------------------------------------------------------- host MSM

def _host_digits(s: int, c: int) -> list:
    """Signed balanced base-2^c digits of a non-negative int."""
    out = []
    half, full = 1 << (c - 1), 1 << c
    while s:
        d = s & (full - 1)
        s >>= c
        if d > half:
            d -= full
            s += 1
        out.append(d)
    return out


def host_msm(curve: CurveParams, points: list, scalars: list):
    """Pippenger over host bigints: points = [(x, y) | None], scalars =
    python ints.  Returns affine int tuple or None.  Used below the
    AP_HOST_MSM_MAX threshold, where an XLA compile would dwarf the work —
    every selector commit of a small circuit, most of the test suite."""
    from ..host import fp as hfp

    F = hfp.GF(curve.fp.modulus)
    n = len(points)
    c = max(2, min(12, n.bit_length()))
    # +1: the balanced signed recode's final carry can spill one window
    nw = -(-curve.fr.modulus.bit_length() // c) + 1
    buckets = [dict() for _ in range(nw)]
    for p, s in zip(points, scalars):
        if p is None or s == 0:
            continue
        neg = (p[0], (-p[1]) % curve.fp.modulus)
        for w, d in enumerate(_host_digits(int(s), c)):
            if d == 0:
                continue
            q = p if d > 0 else neg
            b = buckets[w]
            k = abs(d)
            b[k] = hfp.ec_add(F, b.get(k), q) if k in b else q
    acc = None
    for w in range(nw - 1, -1, -1):
        if acc is not None:
            for _ in range(c):
                acc = hfp.ec_double(F, acc)
        run, tot = None, None
        for k in range(max(buckets[w], default=0), 0, -1):
            if k in buckets[w]:
                run = hfp.ec_add(F, run, buckets[w][k])
            if run is not None:
                tot = hfp.ec_add(F, tot, run)
        acc = hfp.ec_add(F, acc, tot) if tot is not None else acc
    return acc


HOST_MSM_MAX = int(os.environ.get("AP_HOST_MSM_MAX", "1024"))


class MsmCtx:
    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.ops: CurveOps = curve_ops(curve)
        self._msm_fn_cache: dict[tuple, callable] = {}
        self._pallas_broken = False

    def _use_pallas(self) -> bool:
        # fused Pallas adds on real TPU; XLA-composed elsewhere (pallas
        # interpret mode is far slower than XLA on CPU).  After a Mosaic /
        # libtpu compile failure the ctx permanently falls back to XLA —
        # kernel bugs must degrade throughput, never liveness (round-2
        # driver lesson).
        return (
            not self._pallas_broken
            and os.environ.get("AP_PALLAS", "1") == "1"
            and jax.default_backend() == "tpu"
        )

    def _msm_fn(self, m: int, m_bucket: int, c: int, kind: str,
                use_pallas: bool):
        """One closed jit per (m, m_bucket, c, scalar kind, backend path).

        The program takes RAW operands — points [m, 2, L] and either
        Montgomery scalars [m, L] (kind 'mont') or digits [nw, m] — and does
        everything inside one dispatch: digit recode, padding to m_bucket,
        the infinity table row, the scan.  Padding outside the jit cost two
        extra device dispatches per commit (~26 ms each over the remote
        tunnel, round-5 measurement: 195 ms -> 143 ms at 2^17).  The price
        is one compile per distinct m within a bucket; the prover only hits
        m in {n+2, n+3} per circuit size and the persistent cache absorbs
        repeats."""
        key = (m, m_bucket, c, kind, use_pallas)
        if key in self._msm_fn_cache:
            return self._msm_fn_cache[key]
        ops = self.ops
        k_block = int(os.environ.get("AP_MSM_K", "16"))

        def fn(pts, scalars):
            if kind == "mont":
                from .field import field_ops

                digs = digits_from_mont_limbs(
                    field_ops(self.curve.fr), scalars, c=c
                )
            else:
                digs = scalars
            pad = m_bucket - m
            pts_pad = jnp.concatenate(
                [pts, jnp.zeros((pad + 1, 2, ops.L), jnp.int32)], axis=0
            )
            if pad:
                digs = jnp.concatenate(
                    [digs, jnp.zeros((digs.shape[0], pad), jnp.int32)],
                    axis=1,
                )
            return window_sums_scan(
                ops, pts_pad, digs, c, k_block, use_pallas
            )

        jfn = jax.jit(fn)
        self._msm_fn_cache[key] = jfn
        return jfn

    def _run_msm_fn(self, m: int, m_bucket: int, c: int, kind: str,
                    pts, scalars):
        """Invoke the jitted pipeline, falling back Pallas -> XLA on any
        compile/lowering failure (jit compiles at first call, so the probe
        and the real call are the same call)."""
        if self._use_pallas():
            try:
                return self._msm_fn(m, m_bucket, c, kind, True)(pts, scalars)
            except Exception as e:  # Mosaic / libtpu lowering failures
                import sys

                print(
                    "algoplonk_tpu: Pallas MSM kernel failed; falling back "
                    f"to the XLA path ({type(e).__name__}: {str(e)[:200]})",
                    file=sys.stderr,
                )
                self._pallas_broken = True
        return self._msm_fn(m, m_bucket, c, kind, False)(pts, scalars)

    def _host_fold(self, window_sums, c: int = WINDOW_BITS) -> tuple | None:
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
                for _ in range(c):
                    acc = hfp.ec_double(F, acc)
            if Z != 0:
                zi = pow(Z, -1, p)
                acc = hfp.ec_add(F, acc, (X * zi % p, Y * zi % p))
        return acc

    def _points_to_host(self, points_affine) -> list:
        from ..fields import limbs as limbs_mod

        fp = self.curve.fp
        arr = np.asarray(points_affine)
        n = arr.shape[0]
        coords = limbs_mod.mont_limbs_to_ints(arr.reshape(2 * n, self.ops.L), fp)
        out = []
        for i in range(n):
            x, y = coords[2 * i], coords[2 * i + 1]
            out.append(None if x == 0 and y == 0 else (x, y))
        return out

    def _scalars_to_host(self, scalars) -> list:
        """Montgomery [N, L] Fr device limbs -> canonical python ints."""
        from ..fields import limbs as limbs_mod
        from .field import field_ops

        fr = field_ops(self.curve.fr)  # NOT ops.f — that's Fp
        return limbs_mod.limbs_to_ints(
            np.asarray(fr.from_mont(jnp.asarray(scalars)))
        )

    # ------------------------------------------------------------------ API

    def msm_to_affine_int(self, points_affine, scalars, kind: str = "auto",
                          window_bits: int | None = None):
        """MSM over G1 -> host affine int tuple (or None).

        points_affine: [N, 2, L] device array (Montgomery affine limbs).
        scalars, by ``kind``:
          'ints'   — sequence of canonical python ints;
          'mont'   — [N, L] Montgomery limb array (device-resident —
                     the prover's path, ops/kzg.py and plonk/prove.py);
          'digits' — [nw, N] signed window digit array;
          'auto'   — ints if a python sequence, digits if a 2D array whose
                     leading dim matches the window count, else mont.

        Below HOST_MSM_MAX points the MSM runs on host bigints (no XLA
        compile); above, the static-shape device pipeline runs as one
        closed jit and only the final cross-window ladder folds on host.
        """
        n = points_affine.shape[0]
        if kind == "auto":
            if isinstance(scalars, (list, tuple)):
                kind = "ints"
            elif scalars.ndim == 2 and scalars.shape == (
                num_windows(window_bits or WINDOW_BITS), n
            ):
                kind = "digits"
            else:
                kind = "mont"

        if n <= HOST_MSM_MAX and kind != "digits":
            ints = (
                [int(s) for s in scalars] if kind == "ints"
                else self._scalars_to_host(scalars)
            )
            return host_msm(self.curve, self._points_to_host(points_affine), ints)

        # precomputed digit arrays default to full width (c = WINDOW_BITS)
        c = window_bits or (
            WINDOW_BITS if kind == "digits" else pick_window_bits(n)
        )
        if kind == "ints":
            scal = jnp.asarray(scalar_digits(scalars, c=c))
            kind = "digits"
        else:
            scal = jnp.asarray(scalars)
        if kind == "digits":
            assert scal.shape == (num_windows(c), n), (scal.shape, c, n)
        # 'mont' scalars go into the jitted piece raw — the digit recode
        # runs inside the same program as the scan (one dispatch per piece)

        # Large MSMs run in CHUNKS of at most 2^AP_MSM_CHUNK_LOG points, the
        # per-window projective sums added across chunks on device.  Two
        # reasons: (1) one compiled chunk-size pipeline serves every large
        # commit size (a 2^20-point program would pay its own multi-minute
        # jit); (2) the pipeline's in-program peak — sorted [N, 2, L] point
        # copies tile-pad L->128 on TPU — stays bounded at ~1.2 GB instead
        # of growing past HBM (the 2^20 prove's first commit crashed the
        # v5e worker without this).
        chunk = 1 << int(os.environ.get("AP_MSM_CHUNK_LOG", "18"))

        def run_piece(pts, scal_piece):
            """MSM piece over pts [m, 2, L] + scalars (mont [m, L] or
            digits [nw, m]), m-bucketed so nearby sizes share one bucket
            (the prover commits to polynomials of n..n+3 coefficients; see
            _msm_fn on the per-m compile tradeoff).  Infinity rows with zero
            digits are exact no-ops for the scan (they sort to the zero-run,
            which the telescoped sum cancels)."""
            m = pts.shape[0]
            step = 1 << max(8, m.bit_length() - 5)
            m_bucket = min(-(-m // step) * step, chunk)
            return self._run_msm_fn(m, m_bucket, c, kind, pts, scal_piece)

        if n <= chunk:
            window_sums = run_piece(points_affine, scal)
        else:
            total = None
            for off in range(0, n, chunk):
                hi = min(off + chunk, n)
                piece = (
                    scal[off:hi] if kind == "mont" else scal[:, off:hi]
                )
                ws = run_piece(points_affine[off:hi], piece)
                total = ws if total is None else self.ops.jac_add(total, ws)
            window_sums = total
        return self._host_fold(window_sums, c)

    def msm(self, points_affine, scalars, kind: str = "auto",
            window_bits: int | None = None) -> jnp.ndarray:
        """MSM over G1: returns projective [3, L] (device).  Thin wrapper
        over msm_to_affine_int for callers that want a device value."""
        aff = self.msm_to_affine_int(points_affine, scalars, kind, window_bits)
        return self.ops.affine_to_jac(
            jnp.asarray(self.ops.encode_affine([aff]))
        )[0]


@functools.lru_cache(maxsize=None)
def msm_ctx(curve: CurveParams) -> MsmCtx:
    return MsmCtx(curve)
