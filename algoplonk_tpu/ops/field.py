"""Batched modular field arithmetic on TPU via JAX/XLA.

Replaces gnark-crypto's hand-written amd64/arm64 Montgomery assembly (the
reference's hot native layer, invoked from /root/reference/algoplonk.go:89 via
plonk.Prove) with a TPU-native design:

* field elements are ``[..., L]`` int32 arrays of 12-bit little-endian limbs
  (Montgomery form, canonical: every limb < 2^12 and the value < p) — every
  intermediate of the multiplier and the coarse REDC fits an int32 vector
  lane, so the whole pipeline runs on the VPU with no emulated 64-bit
  arithmetic;
* all operations are batched over leading axes, so a single op processes an
  entire polynomial/point vector — this is what keeps the TPU busy.

HLO-graph economy is a first-class design constraint (this host compiles at
milliseconds *per op*, on the 2-core CPU backend and through the remote TPU
compile tunnel alike), so the classic schoolbook/ripple structure is replaced
by constructs that emit O(1)..O(log L) primitives instead of O(L)..O(L^2):

* limb products: either ONE broadcast outer product + a static anti-diagonal
  gather + sum (3 ops; best on the CPU backend) or L fused shift-and-add
  rounds (3L ops; measured ~5x faster at runtime on TPU, where the gather
  both bloats compile time and serializes) — selected per backend, see
  _mul_cols;
* carry handling: a few *relaxation* passes (x -> (x & mask) + (x >> 12)
  shifted up one limb; each pass shrinks the excess by 12 bits) bound every
  limb by 2^12, then ONE Kogge-Stone carry-lookahead (log2(L) steps over
  generate/propagate bits) produces the exact canonical form — ~40 ops
  instead of a 3L-op sequential ripple chain;
* borrows (comparison / conditional subtract) use the same Kogge-Stone
  structure on (negative, zero) flags.

The inner structure is static Python (L is a compile-time constant), so XLA
sees straight-line vector code and fuses aggressively.  A fused Pallas
variant for the hottest call sites lives in ops/field_pallas.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import LIMB_BITS, LIMB_MASK, FieldParams
from ..fields import limbs as limbs_mod


def _shift_up(x, s: int):
    """Move limb k to limb k+s (value * 2^(12 s)); drops the top s limbs
    (callers guarantee the dropped carries are zero — see _relax)."""
    pads = [(0, 0)] * (x.ndim - 1) + [(s, 0)]
    return jnp.pad(x, pads)[..., : x.shape[-1]]


def _antidiag_index(L: int) -> np.ndarray:
    """[2L, L] flat indices into an [L*L (+1 zero-slot)] outer product such
    that row k collects every t[i, j] with i + j == k (padded with the
    zero-slot index L*L)."""
    idx = np.full((2 * L, L), L * L, dtype=np.int32)
    for k in range(2 * L):
        cnt = 0
        for i in range(max(0, k - L + 1), min(L - 1, k) + 1):
            idx[k, cnt] = i * L + (k - i)
            cnt += 1
    return idx


class FieldOps:
    """Batched field arithmetic bound to one prime field.

    All inputs/outputs are int32 arrays shaped ``[..., L]`` holding canonical
    Montgomery residues unless a method says otherwise.
    """

    def __init__(self, fp: FieldParams):
        self.fp = fp
        self.L = fp.nlimbs
        self.p_limbs = jnp.asarray(limbs_mod.int_to_limbs(fp.modulus, fp))
        self.np_limbs = jnp.asarray(limbs_mod.int_to_limbs(fp.n_prime, fp))
        self.one = jnp.asarray(limbs_mod.int_to_limbs(fp.r, fp))  # 1 in Mont form
        self.r2 = jnp.asarray(limbs_mod.int_to_limbs(fp.r2, fp))
        self.zero = jnp.zeros((self.L,), jnp.int32)
        # backend-dependent column-sum strategy (see _mul_cols); overridable
        # for A/B testing via AP_FIELD_COLS=conv|gather|pad
        mode = os.environ.get("AP_FIELD_COLS", "")
        if mode not in ("gather", "pad", "conv"):
            # conv compiles fastest in isolation but XLA materializes grouped
            # convs densely at large batch (OOM) — gather stays the CPU default
            mode = "gather" if jax.default_backend() == "cpu" else "pad"
        self._cols_mode = mode
        self._adidx = jnp.asarray(_antidiag_index(self.L))       # [2L, L]
        # modulus - 2 bits (msb first) for Fermat inversion
        e = fp.modulus - 2
        self.inv_exp_bits = jnp.asarray(
            [int(b) for b in bin(e)[2:]], dtype=jnp.int32
        )
        # jit the hot entry points (they are also freely traceable from inside
        # larger jitted pipelines — nested jit inlines)
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mul = jax.jit(self.mul)
        self.square = jax.jit(self.square)
        self.inv = jax.jit(self.inv)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)
        self.pow_fixed = jax.jit(self.pow_fixed, static_argnums=1)

    # ---------------------------------------------------------------- helpers

    def _mul_cols(self, a, b, nk: int):
        """Column sums of the limb product: out[k] = sum_{i+j=k} a_i * b_j
        for k < nk (nk = 2L full / L low).  Inputs: limbs <= 2^12 (canonical
        or relaxed); each column sum < L * 2^24 + eps < 2^31.

        Three formulations, chosen per backend (measured, see module doc):
        * conv: ONE depthwise int32 convolution — the column sums are exactly
          the polynomial product of the limb sequences.  An experimental A/B
          mode (enable with AP_FIELD_COLS=conv): it compiles ~7x faster than
          the gather form on the CPU backend (0.09 s vs 0.66 s per mul), but
          XLA materializes grouped convs densely at large batch (OOM — see
          __init__), so no default uses it.
        * gather: one outer product + one static anti-diagonal gather + sum
          (3 ops).  On TPU the gather explodes compile time (minutes) and
          halves runtime throughput.
        * pad: L shift-and-add rounds (3L ops).  On TPU this compiles in
          seconds and runs ~5x faster than the gather form.
        """
        if self._cols_mode == "conv":
            L = self.L
            if b.ndim == 1:
                # one shared kernel (multiplying a batch by a field constant,
                # e.g. p or -p^-1 inside REDC): plain batched conv
                bshape = a.shape[:-1]
                x = a.reshape((-1, 1, L))      # [B, 1, L]
                out = jax.lax.conv_general_dilated(
                    x,
                    b[None, None, ::-1],       # [1, 1, L] (reversed: corr->conv)
                    (1,),
                    [(L - 1, L - 1)],
                    dimension_numbers=("NCH", "OIH", "NCH"),
                )[:, 0]                        # [B, 2L-1]
            else:
                a, b = jnp.broadcast_arrays(a, b)
                bshape = a.shape[:-1]
                x = a.reshape((-1, L))
                y = b.reshape((-1, L))
                bb = x.shape[0]
                out = jax.lax.conv_general_dilated(
                    x[None],                   # [1, B, L]
                    y[:, None, ::-1],          # [B, 1, L]
                    (1,),
                    [(L - 1, L - 1)],
                    feature_group_count=bb,
                    dimension_numbers=("NCH", "OIH", "NCH"),
                )[0]                           # [B, 2L-1]
            out = out[..., :nk] if nk <= 2 * L - 1 else jnp.pad(
                out, [(0, 0), (0, nk - (2 * L - 1))]
            )
            return out.reshape(bshape + (nk,))
        if self._cols_mode == "gather":
            t = a[..., :, None] * b[..., None, :]
            t = t.reshape(t.shape[:-2] + (-1,))
            t = jnp.concatenate(
                [t, jnp.zeros(t.shape[:-1] + (1,), jnp.int32)], axis=-1
            )
            return jnp.sum(t[..., self._adidx[:nk]], axis=-1)
        L = self.L
        prod = None
        for i in range(L):
            hi = min(L, nk - i)
            if hi <= 0:
                break
            term = a[..., i : i + 1] * b[..., :hi]
            pads = [(0, 0)] * (term.ndim - 1) + [(i, nk - i - hi)]
            term = jnp.pad(term, pads)
            prod = term if prod is None else prod + term
        return prod

    @staticmethod
    def _relax(x, passes: int):
        """Carry relaxation: each pass moves every limb's excess (>= 2^12)
        one limb up, dividing the excess by 2^12.  From column sums < 2^30,
        three passes bound every limb by 2^12 (note: 2^12 inclusive).  The
        carry shifted out of the top limb is provably zero whenever the
        represented value fits the limb array (positional bound: the top
        limb's value is <= value / 2^(12*(nl-1)) < 2^12)."""
        for _ in range(passes):
            x = (x & LIMB_MASK) + _shift_up(x >> LIMB_BITS, 1)
        return x

    @staticmethod
    def _ks_chain(g, pr, nl: int):
        """Kogge-Stone carry/borrow-lookahead: resolve c_k = g_k | (pr_k &
        c_{k-1}) in log2(nl) rounds.  g, pr: int32 0/1 arrays [..., nl]."""
        c = g
        s = 1
        while s < nl:
            c = c | (pr & _shift_up(c, s))
            pr = pr & _shift_up(pr, s)
            s *= 2
        return c

    def _ks_carry(self, x):
        """Exact canonical carry of limbs bounded by <= 2^13 - 2 via
        Kogge-Stone carry-lookahead: generate g = excess bit, propagate
        p = (limb's low bits == 2^12 - 1).  Output limbs < 2^12."""
        nl = x.shape[-1]
        low = x & LIMB_MASK
        g = x >> LIMB_BITS                       # 0/1 (inputs <= 2^13 - 2)
        pr = (low == LIMB_MASK).astype(jnp.int32)
        c = self._ks_chain(g, pr, nl)
        return (low + _shift_up(c, 1)) & LIMB_MASK

    def _sub_borrow(self, a, b):
        """(a - b) limbwise for canonical a, b; Kogge-Stone borrow chain.
        Returns (canonical diff limbs of a - b + borrow * 2^(12 nl), borrow)."""
        nl = a.shape[-1]
        d = a - b
        g = (d < 0).astype(jnp.int32)
        pr = (d == 0).astype(jnp.int32)
        c = self._ks_chain(g, pr, nl)
        borrow_in = _shift_up(c, 1)
        out = (d - borrow_in) & LIMB_MASK
        return out, c[..., -1]

    def _cond_sub_p(self, x):
        """x - p if x >= p else x (x < 2p, canonical limbs)."""
        diff, borrow = self._sub_borrow(x, self.p_limbs)
        return jnp.where((borrow == 1)[..., None], x, diff)

    # ------------------------------------------------------------------- ops

    def add(self, a, b):
        # canonical sums are <= 2^13 - 2, directly in Kogge-Stone range
        return self._cond_sub_p(self._ks_carry(a + b))

    def sub(self, a, b):
        diff, borrow = self._sub_borrow(a, b)
        plus_p = self._ks_carry(diff + self.p_limbs)
        return jnp.where((borrow == 1)[..., None], plus_p, diff)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def mul(self, a, b):
        """Montgomery product: a * b * R^-1 mod p (coarse REDC).

        T = a*b as 2L un-carried columns; m = (T mod R) * (-p^-1) mod R with
        relaxed (<= 2^12) limbs — its *value* may slightly exceed R, which
        coarse REDC tolerates: s = T + m*p < R*p*(1 + p/R + 2^-11) fits 2L
        limbs for both fields (params guarantee R >= 8p).  s is divisible by
        R; after relaxation the low half's value is exactly 0 or R, so the
        carry into the high half is simply "any low limb non-zero".
        """
        L = self.L
        cols = self._mul_cols(a, b, 2 * L)
        t_low = self._relax(cols[..., :L], 3)
        m = self._relax(self._mul_cols(t_low, self.np_limbs, L), 3)
        s = self._relax(self._mul_cols(m, self.p_limbs, 2 * L) + cols, 3)
        c_out = jnp.any(s[..., :L] != 0, axis=-1).astype(jnp.int32)
        hi = s[..., L:] + jnp.pad(
            c_out[..., None], [(0, 0)] * c_out.ndim + [(0, L - 1)]
        )
        return self._cond_sub_p(self._ks_carry(hi))

    def square(self, a):
        """Montgomery squaring (same column engine as mul — the outer
        product is a single fused primitive either way)."""
        return self.mul(a, a)

    def mul_const(self, a, c_limbs):
        """Multiply batch by a single Montgomery constant [L]."""
        return self.mul(a, jnp.broadcast_to(c_limbs, a.shape))

    def pow_fixed(self, a, exponent: int):
        """a^exponent for a static python-int exponent (square & multiply,
        MSB-first, using lax.fori_loop so the graph stays small)."""
        bits = jnp.asarray([int(b) for b in bin(exponent)[2:]], jnp.int32)
        nb = bits.shape[0]
        acc0 = jnp.broadcast_to(self.one, a.shape).astype(jnp.int32)

        def body(i, acc):
            acc = self.square(acc)
            return jnp.where((bits[i] == 1)[..., None], self.mul(acc, a), acc)

        return jax.lax.fori_loop(0, nb, body, acc0)

    def inv(self, a):
        """Fermat inverse a^(p-2); inv(0) = 0."""
        return self.pow_fixed(a, self.fp.modulus - 2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def bits_from_mont(self, limbs, nbits: int):
        """Montgomery [..., L] -> [..., nbits] MSB-first 0/1 bits, on device
        (feeds CurveOps.scalar_mul without a host round trip — the path that
        lets test_only_srs generate million-point SRSs)."""
        canon = self.from_mont(limbs)
        bits = (canon[..., :, None] >> jnp.arange(LIMB_BITS, dtype=jnp.int32)) & 1
        bits = bits.reshape(canon.shape[:-1] + (self.L * LIMB_BITS,))
        return bits[..., :nbits][..., ::-1]

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """cond: bool [...]; a, b: [..., L]."""
        return jnp.where(cond[..., None], a, b)

    def to_mont(self, a_canonical):
        return self.mul(a_canonical, jnp.broadcast_to(self.r2, a_canonical.shape))

    def from_mont(self, a):
        one_canon = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one_canon)

    # ---------------------------------------------------------- host helpers

    def encode(self, values) -> jnp.ndarray:
        """Canonical python ints -> Montgomery limb device array [N, L]."""
        return jnp.asarray(limbs_mod.ints_to_mont_limbs(list(values), self.fp))

    def encode_bytes(self, values) -> jnp.ndarray:
        """Canonical python ints -> Montgomery [N, L], device-side math.

        The host only packs little-endian byte rows (C-speed int.to_bytes);
        the device unpacks 12-bit limbs with static shifts and applies ONE
        Montgomery multiply by R^2.  Vs encode(): ~3x less tunnel traffic
        ([N, nb] uint8 instead of [N, L] int32) and none of the per-element
        python bigint to_mont/limb-split — the round-5 2^20 prove spent
        ~39 s/prove in those loops on the qk/wire vectors."""
        values = list(values)
        n = len(values)
        nb = limbs_mod.le_bytes_needed(self.fp.nlimbs)
        buf = b"".join(int(v).to_bytes(nb, "little") for v in values)
        rows = np.frombuffer(buf, dtype=np.uint8).reshape(n, nb)
        return self._unpack_mont_jit(self.fp.nlimbs, nb)(jnp.asarray(rows))

    @functools.lru_cache(maxsize=4)
    def _unpack_mont_jit(self, L: int, nb: int):
        from ..fields.params import LIMB_BITS

        def fn(rows):
            u = rows.astype(jnp.int32)
            cols = []
            for k in range(L):
                byte0, off = divmod(k * LIMB_BITS, 8)
                lo = u[:, byte0]
                hi = u[:, byte0 + 1] if byte0 + 1 < nb else 0
                if off == 0:
                    cols.append(lo | ((hi & 0xF) << 8))
                else:  # off == 4
                    cols.append((lo >> 4) | (hi << 4))
            return self.to_mont(jnp.stack(cols, axis=1))

        import jax

        return jax.jit(fn)

    def decode(self, arr) -> list[int]:
        """Montgomery limb array -> canonical python ints."""
        return limbs_mod.mont_limbs_to_ints(np.asarray(arr), self.fp)


@functools.lru_cache(maxsize=None)
def field_ops(fp: FieldParams) -> FieldOps:
    return FieldOps(fp)
