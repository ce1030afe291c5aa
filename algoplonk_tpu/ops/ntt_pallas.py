"""Limbs-major four-step NTT with fused Pallas stage kernels.

Replaces the XLA butterfly pipeline (ops/ntt.py) for LARGE transforms.  The
XLA path keeps the polynomial batch-major [n, L]; on TPU any [.., L]-trailing
int32 array is physically tiled to [.., 128], a 5.8x memory blow-up that (with
several stage temps live) is what OOM'd the 2^20-constraint prove at its
4n = 2^22 coset transforms (BASELINE.md round 3).  Here every array is
limbs-major [L, n] — sublane dim L pads 22->24 / 33->40, lane dim n is large —
so physical == logical within ~10%.

Structure (classic four-step, n = n1 * n2, both <= 2^11 for n <= 2^22):

  forward (DIF sub-transforms):           inverse (DIT sub-transforms):
    x natural [L, (j1, j2)]                 E scrambled [L, (r1, r2)]
    T1 transpose    -> [L, (j2, j1)]        P2' iDIT over r2 -> [L, (r1, j2)]
    * coset scale C_f[j2, j1]   (entry)     T2 transpose     -> [L, (j2, r1)]
    P1 DIF over j1  -> [L, (j2, r1)]        * W_i[j2, r1] * 1/n       (entry)
    * cross W_f[j2, r1]          (exit)     P1' iDIT over r1 -> [L, (j2, j1)]
    T2 transpose    -> [L, (r1, j2)]        * coset scale C_i[j2, j1]  (exit)
    P2 DIF over j2  -> [L, (r1, r2)]        T1 transpose     -> natural coeffs

Each P-pass is ONE pallas_call: all log2(C) butterfly stages of the length-C
sub-transforms run unrolled inside the kernel with the tile resident in VMEM,
twiddles staged as per-stage [L, C] constant tiles; the optional entry/exit
pointwise multiplies are fused into the same kernel.

Scrambled evaluation order: DIF produces (and DIT consumes) bit-reversed
output for free, so NO bit-reversal permutation is ever materialized.  The
evaluation at domain index k = brev(r1) + brev(r2)*n1 is stored at position
p = r1*n2 + r2.  Pointwise consumers (the PLONK quotient construction) are
order-agnostic; order-DEPENDENT coset values (x, Z_H) are generated directly
in scrambled order via separable outer products (coset_x_scr / tile_by_k_mod4
below).  A round trip ntt_scr_lm -> intt_scr_lm is exactly the identity, and
scramble_perm exposes the permutation for tests and one-off consumers.

Cross twiddles W[a, b] = w^(+-a*brev(b)) are built ON DEVICE without any
gather: m1 host-built tables P_t[a] = w^(a*2^t) (each [n2] — tiny) combined
with log-doubling masked multiplies selected by the bits of brev(b).

Reference behavior replaced: gnark-crypto's multicore FFT driving the
quotient computation inside plonk.Prove (/root/reference/algoplonk.go:89).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..fields.params import CURVES, FieldParams, domain_generator
from ..fields import limbs as limbs_mod
from .field_pallas import FieldVals, field_consts, field_mats


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _brev(x: int, bits: int) -> int:
    return int(bin(x + (1 << bits))[3:][::-1], 2)


def fvals(fp: FieldParams) -> FieldVals:
    """Limbs-major field ops usable in plain XLA traces (FieldVals is plain
    jnp; stage constants from numpy so each trace gets its own)."""
    return FieldVals(
        fp,
        jnp.asarray(field_consts(fp)),
        jnp.asarray(field_mats(fp), jnp.bfloat16),
    )


def _roll_lanes(x, shift: int):
    """Static roll along axis 1 via concatenation (Mosaic-safe)."""
    if shift == 0:
        return x
    s = shift % x.shape[1]
    return jnp.concatenate([x[:, -s:], x[:, :-s]], axis=1)


def _stage_tiles(fr: FieldParams, modulus_root, C: int, inverse: bool):
    """Host-precomputed per-stage twiddle tiles for a length-C sub-transform.

    Returns (tw [nst*L, C] int32 Montgomery, up [nst, C] int32, halves).
    Forward (DIF): halves C/2 .. 1, twiddle applied AFTER the butterfly.
    Inverse (DIT): halves 1 .. C/2, twiddle applied BEFORE; the 1/2-per-stage
    of the exact inverse is folded into the caller's 1/n scale.
    Twiddle tile col q: one at u-positions (q mod 2h < h), else
    w_{2h}^(+-(q mod h)) — the mont-mul by one at u-positions doubles as the
    canonicality-preserving pass."""
    r = fr.modulus
    log_c = C.bit_length() - 1
    halves = [C >> (s + 1) for s in range(log_c)]
    if inverse:
        halves = halves[::-1]
    tw_rows, up_rows = [], []
    for h in halves:
        w2h = modulus_root(2 * h)
        if inverse:
            w2h = pow(w2h, -1, r)
        vals, ups = [], []
        for q in range(C):
            pos = q % (2 * h)
            if pos < h:
                vals.append(1)
                ups.append(1)
            else:
                vals.append(pow(w2h, pos - h, r))
                ups.append(0)
        tw_rows.append(
            np.asarray(limbs_mod.ints_to_mont_limbs(vals, fr), np.int32).T
        )
        up_rows.append(np.asarray(ups, np.int32))
    return np.concatenate(tw_rows), np.stack(up_rows), halves


# lane tile for the multi-stage kernel: stages with 2h <= _T_SMALL fuse into
# one kernel at this width; larger-h stages get single-stage kernels at
# T = 2h.  Bounds Mosaic body size: an op on [L, T] unrolls into
# T/128 * ceil(L/8) vregs, so wide tiles with many stages explode compile
# time (an 11-stage T=2048 kernel took > 16 min to build at 2^22).
_T_SMALL = 512


@functools.lru_cache(maxsize=None)
def _stages_kernel(curve_name: str, C: int, n: int, inverse: bool,
                   halves: tuple, T: int, has_entry: bool, has_exit: bool,
                   canon_out: bool):
    """Butterfly stages ``halves`` of length-C DIF/DIT sub-transforms over a
    [L, n] array, tiled at T lanes, with optional fused entry/exit
    pointwise multiplies.

    Lazy discipline: butterflies are add_lazy / sub_lazy, twiddle products
    mul_lazy — values stay bounded (DIF stage inputs < 1.3p since every
    stage ends in a mul; DIT out_v < 1.3p + k*p, reset by the next stage's
    mul), see field_pallas bounds.  ``canon_out``: finish with a strict
    multiply by one so the kernel's output is canonical (used when no exit
    table supplies the strict multiply).  Returns run(x, entry?, exit?)."""
    fr = CURVES[curve_name].fr
    L = fr.nlimbs
    consts_np = field_consts(fr)  # numpy — staged per trace (see curve_pallas)
    mats_np = field_mats(fr)
    one_np = np.broadcast_to(
        np.asarray(limbs_mod.int_to_limbs(fr.r, fr), np.int32)[:, None],
        (L, T),
    ).copy()

    def mk_root(m):
        return domain_generator(curve_name, m.bit_length() - 1)

    tw_all, up_all, all_halves = _stage_tiles(fr, mk_root, C, inverse)
    idx = [all_halves.index(h) for h in halves]
    tw_np = np.concatenate([tw_all[k * L : (k + 1) * L] for k in idx])
    up_np = up_all[list(idx)]
    nst = len(halves)
    reps = T // C if T >= C else 1
    if T < C:
        # tile narrower than the sub-transform: valid only when every
        # stage's butterfly distance stays inside the tile (2h <= T and
        # T % 2h == 0) — the twiddle pattern is 2h-periodic so slicing the
        # first T columns of the C-wide tile is exact
        assert all(2 * h <= T and T % (2 * h) == 0 for h in halves)
        tw_np = tw_np[:, :T]
        up_np = up_np[:, :T]
    else:
        tw_np = np.tile(tw_np, (1, reps))
        up_np = np.tile(up_np, (1, reps))

    def kernel(*refs):
        consts_ref, mats_ref, one_ref, tw_ref, up_ref = refs[:5]
        i = 5
        entry_ref = exit_ref = None
        if has_entry:
            entry_ref = refs[i]
            i += 1
        if has_exit:
            exit_ref = refs[i]
            i += 1
        x_ref, out_ref = refs[i], refs[i + 1]
        f = FieldVals(fr, consts_ref[:], mats_ref[:])
        x = x_ref[:]
        if entry_ref is not None:
            x = f.mul_lazy(x, entry_ref[:])
        for s, h in enumerate(halves):
            w = tw_ref[s * L : (s + 1) * L]
            up = (up_ref[s][None] != 0)
            if inverse:
                t = f.mul_lazy(x, w)
                x = jnp.where(
                    up,
                    f.add_lazy(t, _roll_lanes(t, -h)),
                    f.sub_lazy(_roll_lanes(t, h), t),
                )
            else:
                d = jnp.where(
                    up,
                    f.add_lazy(x, _roll_lanes(x, -h)),
                    f.sub_lazy(_roll_lanes(x, h), x),
                )
                x = f.mul_lazy(d, w)
        if exit_ref is not None:
            x = f.mul(x, exit_ref[:])
        elif canon_out:
            x = f.mul(x, one_ref[:])
        out_ref[:] = x

    def run(x, entry=None, exit_=None):
        assert x.shape == (L, n), (x.shape, L, n)
        consts = jnp.asarray(consts_np)
        mats = jnp.asarray(mats_np, jnp.bfloat16)
        one = jnp.asarray(one_np)
        tw = jnp.asarray(tw_np)
        up = jnp.asarray(up_np)
        specs = [
            pl.BlockSpec((4, L), lambda i: (0, 0)),
            pl.BlockSpec((6 * L, L), lambda i: (0, 0)),
            pl.BlockSpec((L, T), lambda i: (0, 0)),
            pl.BlockSpec((nst * L, T), lambda i: (0, 0)),
            pl.BlockSpec((nst, T), lambda i: (0, 0)),
        ]
        args = [consts, mats, one, tw, up]
        if has_entry:
            specs.append(pl.BlockSpec((L, T), lambda i: (0, i)))
            args.append(entry)
        if has_exit:
            specs.append(pl.BlockSpec((L, T), lambda i: (0, i)))
            args.append(exit_)
        specs.append(pl.BlockSpec((L, T), lambda i: (0, i)))
        args.append(x)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
            grid=(n // T,),
            in_specs=specs,
            out_specs=pl.BlockSpec((L, T), lambda i: (0, i)),
            interpret=_interpret(),
        )(*args)

    return run


def _pass_kernel(curve_name: str, C: int, n: int, inverse: bool,
                 has_entry: bool, has_exit: bool):
    """One four-step pass over [L, n]: all log2(C) stages of the length-C
    sub-transforms, split into a kernel SEQUENCE that bounds Mosaic body
    size: each stage with 2h > _T_SMALL runs alone at T = 2h; the remaining
    small-h stages fuse into one kernel at T = _T_SMALL.  The entry
    multiply rides the first kernel, the exit multiply the last; the last
    kernel canonicalizes (strict final multiply) either way."""
    log_c = C.bit_length() - 1
    all_halves = [C >> (s + 1) for s in range(log_c)]
    if inverse:
        all_halves = all_halves[::-1]
    t_small = min(_T_SMALL, C * max(1, min(n // C, _T_SMALL // C)))
    groups = []  # (halves tuple, T)
    small = tuple(h for h in all_halves if 2 * h <= t_small)
    for h in all_halves:
        if 2 * h > t_small:
            groups.append(((h,), 2 * h))
        elif small and (small[0] == h):
            groups.append((small, t_small))

    def run(x, entry=None, exit_=None):
        for gi, (halves, T) in enumerate(groups):
            first, last = gi == 0, gi == len(groups) - 1
            k = _stages_kernel(
                curve_name, C, n, inverse, halves, T,
                has_entry and first, has_exit and last, last,
            )
            kw = {}
            if has_entry and first:
                kw["entry"] = entry
            if has_exit and last:
                kw["exit_"] = exit_
            x = k(x, **kw)
        return x

    return run


class FourStepPlan:
    """Scrambled-order four-step NTT over Fr for one (curve, 2^log_n).

    All device data limbs-major [L, n].  Evaluation at domain index
    k = brev(r1) + brev(r2) * n1 is stored at p = r1 * n2 + r2 (see module
    doc); coefficient order is natural on both ends."""

    def __init__(self, curve_name: str, log_n: int):
        assert log_n >= 4, "four-step path is for large transforms"
        self.curve = CURVES[curve_name]
        self.curve_name = curve_name
        self.log_n = log_n
        self.n = 1 << log_n
        self.fr = self.curve.fr
        self.L = self.fr.nlimbs
        self.log_n1 = log_n // 2
        self.log_n2 = log_n - self.log_n1
        self.n1, self.n2 = 1 << self.log_n1, 1 << self.log_n2
        self.r = self.fr.modulus
        self.omega = domain_generator(curve_name, log_n)
        self._tables = {}  # (kind, *key) -> device array
        self._jits = {}

    # ------------------------------------------------------------- tables

    def _mont_lm(self, ints) -> jnp.ndarray:
        """Python ints -> [L, len] Montgomery limbs-major device array."""
        return jnp.asarray(
            np.asarray(limbs_mod.ints_to_mont_limbs(list(ints), self.fr),
                       np.int32).T
        )

    def drop_tables(self, inverse: bool | None = None) -> None:
        """Free the cached [L, n] cross/coset tables for one direction (or
        all).  At 2^22 each table is ~370 MB of HBM and they are rebuilt on
        device in ~100 ms at next use — the prover evicts the direction it
        is NOT about to run so only one direction's tables are ever
        resident (keeping all four OOM'd the warm 2^20 prove)."""
        for key in list(self._tables):
            if inverse is None or key[-1] == inverse:
                del self._tables[key]

    def _cross_table(self, inverse: bool) -> jnp.ndarray:
        """W[a, b] = w^(+-a*brev_{n1}(b)) over [n2 rows, n1 cols] as [L, n]
        (times 1/n when inverse).  Built on device: log2(n1) masked
        multiplies by host-built P_t[a] = w^(+-a*2^t) vectors — no gathers."""
        key = ("cross", inverse)
        if key in self._tables:
            return self._tables[key]
        r, n1, n2 = self.r, self.n1, self.n2
        w = pow(self.omega, -1, r) if inverse else self.omega
        # host: P_t[a] for a < n2, t < log2(n1) (each [L, n2] — tiny)
        p_np = []
        base = w
        for _ in range(self.log_n1):
            vals, cur = [1] * n2, 1
            for a in range(1, n2):
                cur = cur * base % r
                vals[a] = cur
            p_np.append(np.asarray(
                limbs_mod.ints_to_mont_limbs(vals, self.fr), np.int32
            ).T)
            base = base * base % r
        scale = pow(self.n, -1, r) if inverse else 1
        scale_np = np.asarray(
            limbs_mod.ints_to_mont_limbs([scale], self.fr), np.int32
        ).T                                            # [L, 1]
        masks_np = np.stack([
            (((np.arange(n1) >> (self.log_n1 - 1 - t)) & 1) != 0)
            for t in range(self.log_n1)
        ])  # bit t of brev_{n1}(b) == bit (log_n1 - 1 - t) of b

        def build():
            f = fvals(self.fr)
            W = jnp.broadcast_to(
                jnp.asarray(scale_np)[:, :, None], (self.L, n2, n1)
            ).reshape(self.L, self.n)
            for t in range(self.log_n1):
                Pt = jnp.broadcast_to(
                    jnp.asarray(p_np[t])[:, :, None], (self.L, n2, n1)
                ).reshape(self.L, self.n)
                prod = f.mul(W, Pt).reshape(self.L, n2, n1)
                W = jnp.where(
                    jnp.asarray(masks_np[t])[None, None, :], prod,
                    W.reshape(self.L, n2, n1),
                ).reshape(self.L, self.n)
            return W

        W = jax.jit(build)()
        self._tables[key] = W
        return W

    def _coset_table(self, shift: int, inverse: bool) -> jnp.ndarray:
        """C[a (row j2), b (col j1)] = g^(+-(b*n2 + a)) as [L, n] — separable
        outer product of two host power vectors."""
        key = ("coset", shift, inverse)
        if key in self._tables:
            return self._tables[key]
        r = self.r
        g = pow(shift, -1, r) if inverse else shift
        col = self._mont_lm(
            [pow(g, b * self.n2, r) for b in range(self.n1)]
        )                                              # [L, n1]
        row = self._mont_lm([pow(g, a, r) for a in range(self.n2)])  # [L, n2]
        C = jax.jit(self._outer)(row, col)
        self._tables[key] = C
        return C

    def _outer(self, row, col):
        """[L, n2] (+) [L, n1] -> elementwise product grid [L, n2*n1]."""
        f = fvals(self.fr)
        return f.mul(
            jnp.broadcast_to(
                row[:, :, None], (self.L, self.n2, self.n1)
            ).reshape(self.L, self.n),
            jnp.broadcast_to(
                col[:, None, :], (self.L, self.n2, self.n1)
            ).reshape(self.L, self.n),
        )

    # ---------------------------------------------------------- transforms

    def _fwd(self, x, entry, cross):
        L, n1, n2 = self.L, self.n1, self.n2
        x = jnp.swapaxes(x.reshape(L, n1, n2), 1, 2).reshape(L, self.n)  # T1
        p1 = _pass_kernel(
            self.curve_name, n1, self.n, False, entry is not None, True
        )
        x = p1(x, entry, cross) if entry is not None else p1(x, exit_=cross)
        x = jnp.swapaxes(x.reshape(L, n2, n1), 1, 2).reshape(L, self.n)  # T2
        p2 = _pass_kernel(self.curve_name, n2, self.n, False, False, False)
        return p2(x)

    def _inv(self, e, cross, exit_):
        L, n1, n2 = self.L, self.n1, self.n2
        p2 = _pass_kernel(self.curve_name, n2, self.n, True, False, False)
        x = p2(e)
        x = jnp.swapaxes(x.reshape(L, n1, n2), 1, 2).reshape(L, self.n)  # T2'
        p1 = _pass_kernel(
            self.curve_name, n1, self.n, True, True, exit_ is not None
        )
        x = p1(x, cross, exit_) if exit_ is not None else p1(x, cross)
        return jnp.swapaxes(x.reshape(L, n2, n1), 1, 2).reshape(L, self.n)

    def _run(self, kind, x, shift, donate=False):
        """Jit per direction; the [L, n] cross/coset tables are built
        EAGERLY (device arrays — lazy construction inside the trace would
        cache tracers in self._tables) and passed as jit ARGUMENTS: closing
        over them would embed two 370 MB constants in the HLO, which the
        remote-compile tunnel rejects (HTTP 413) after minutes of
        serialization.  ``donate``: donate the data operand's buffer (the
        caller discards it) — the tables are never donated."""
        key = (kind, donate)
        fn = self._jits.get(key)
        if fn is None:
            fn = jax.jit(
                self._fwd if kind == "fwd" else self._inv,
                donate_argnums=(0,) if donate else (),
            )
            self._jits[key] = fn
        if kind == "fwd":
            entry = (
                self._coset_table(shift, False) if shift is not None else None
            )
            return fn(x, entry, self._cross_table(False))
        exit_ = (
            self._coset_table(shift, True) if shift is not None else None
        )
        return fn(x, self._cross_table(True), exit_)

    def ntt_scr_lm(self, coeffs_lm, coset_shift: int | None = None,
                   donate: bool = False):
        """[L, n] natural coefficients -> [L, n] scrambled evaluations
        (on the coset shift*H when coset_shift is given)."""
        return self._run("fwd", coeffs_lm, coset_shift, donate)

    def intt_scr_lm(self, evals_scr_lm, coset_shift: int | None = None,
                    donate: bool = False):
        """[L, n] scrambled evaluations -> [L, n] natural coefficients."""
        return self._run("inv", evals_scr_lm, coset_shift, donate)

    # ------------------------------------------------- scrambled-order data

    def scramble_perm(self) -> np.ndarray:
        """perm with evals_scr[p] = evals_natural[perm[p]]."""
        n1, n2 = self.n1, self.n2
        out = np.empty(self.n, np.int64)
        for r1 in range(n1):
            b1 = _brev(r1, self.log_n1)
            for r2 in range(n2):
                out[r1 * n2 + r2] = b1 + _brev(r2, self.log_n2) * n1
        return out

    def _x_build_jit(self):
        """Cached jit for the scrambled-x outer product (a fresh jax.jit
        per call re-traced every prove — ~350 ms of the quotient phase)."""
        fn = self._jits.get("xbuild")
        if fn is None:
            def build(a, b):
                f = fvals(self.fr)
                return f.mul(
                    jnp.broadcast_to(
                        a[:, :, None], (self.L, self.n1, self.n2)
                    ).reshape(self.L, self.n),
                    jnp.broadcast_to(
                        b[:, None, :], (self.L, self.n1, self.n2)
                    ).reshape(self.L, self.n),
                )

            fn = jax.jit(build)
            self._jits["xbuild"] = fn
        return fn

    def coset_x_scr(self, shift: int) -> jnp.ndarray:
        """[L, n] of x-values shift * w^k(p) in scrambled storage order —
        separable outer product (no gather)."""
        r = self.r
        rowv = [
            shift * pow(self.omega, _brev(r1, self.log_n1), r) % r
            for r1 in range(self.n1)
        ]
        colv = [
            pow(self.omega, self.n1 * _brev(r2, self.log_n2), r)
            for r2 in range(self.n2)
        ]
        return self._x_build_jit()(self._mont_lm(rowv), self._mont_lm(colv))

    def tile_by_k_mod4(self, pattern4) -> jnp.ndarray:
        """[L, n] with value pattern4[k(p) mod 4] at scrambled position p.
        k(p) mod 4 = brev(r1) mod 4 (requires 4 | n1), constant per row."""
        assert self.n1 % 4 == 0
        rowv = [
            pattern4[_brev(r1, self.log_n1) % 4] for r1 in range(self.n1)
        ]
        return jnp.broadcast_to(
            self._mont_lm(rowv)[:, :, None], (self.L, self.n1, self.n2)
        ).reshape(self.L, self.n)


@functools.lru_cache(maxsize=None)
def four_step_plan(curve_name: str, log_n: int) -> FourStepPlan:
    return FourStepPlan(curve_name, log_n)


class LmOps:
    """Jitted limbs-major [L, T] elementwise field ops for XLA composition
    outside kernels (the prover's quotient phase, plonk/prove.py round 3).
    Batch-major [T, L] arrays on TPU physically pad the minor L dim to 128
    (5.8x at L=22); these keep every wide array limbs-major."""

    def __init__(self, fp: FieldParams):
        self.fp = fp
        self.L = fp.nlimbs
        consts_np = field_consts(fp)
        mats_np = field_mats(fp)

        def bind():
            return FieldVals(
                fp,
                jnp.asarray(consts_np),
                jnp.asarray(mats_np, jnp.bfloat16),
            )

        self.mul = jax.jit(lambda a, b: bind().mul(a, b))
        self.add = jax.jit(lambda a, b: bind().add(a, b))
        self.sub = jax.jit(lambda a, b: bind().sub(a, b))
        # donating variants — the quotient phase's [L, 4n] arrays are
        # ~370 MB each at 2^22, and donation lets XLA write the result into
        # a dead operand's buffer instead of growing the live set (the
        # 2^20 prove OOM'd without this).  Callers must not touch a donated
        # operand afterwards.
        self.mul_d0 = jax.jit(
            lambda a, b: bind().mul(a, b), donate_argnums=(0,)
        )
        self.sub_d = jax.jit(
            lambda a, b: bind().sub(a, b), donate_argnums=(0, 1)
        )
        self.add_d = jax.jit(
            lambda a, b: bind().add(a, b), donate_argnums=(0, 1)
        )
        self.sub_one_d = jax.jit(lambda x: (
            lambda f: f.sub(x, jnp.broadcast_to(f.one, x.shape))
        )(bind()), donate_argnums=(0,))
        self.mul_const_d0 = jax.jit(lambda a, c: (
            lambda f: f.mul(a, jnp.broadcast_to(c[:, None], a.shape))
        )(bind()), donate_argnums=(0,))
        # fused accumulate: acc + a*b (one round trip instead of two);
        # donates BOTH the accumulator and `a` (every prover call site
        # passes a freshly lifted selector as `a`)
        self.mul_add = jax.jit(lambda acc, a, b: (
            lambda f: f.add(acc, f.mul(a, b))
        )(bind()), donate_argnums=(0, 1))
        # (x + s) + c  with x, s [L, T], c a single element [L]
        self.add2 = jax.jit(lambda x, s, c: (
            lambda f: f.add(
                f.add(x, s), jnp.broadcast_to(c[:, None], x.shape)
            )
        )(bind()))
        self.mul_const = jax.jit(lambda a, c: (
            lambda f: f.mul(a, jnp.broadcast_to(c[:, None], a.shape))
        )(bind()))
        self.sub_one = jax.jit(lambda x: (
            lambda f: f.sub(x, jnp.broadcast_to(f.one, x.shape))
        )(bind()))


@functools.lru_cache(maxsize=None)
def lm_ops(fp: FieldParams) -> LmOps:
    return LmOps(fp)
