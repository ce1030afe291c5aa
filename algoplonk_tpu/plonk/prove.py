"""The PLONK prover, composed over the TPU kernel stack.

Replaces gnark's plonk.Prove (reference algoplonk.go:89) — the reference's
single hottest call — with a JAX pipeline over the device kernels:

  wire vectors -> iNTT -> 3 MSM commits -> grand product (prefix scan +
  batch inversion) -> MSM -> quotient on the 4n coset (batched coset NTTs,
  one fused evaluation sweep, pointwise Z_H division) -> 3 MSM commits ->
  openings (blocked Horner division) -> 2 MSM commits.

Fiat-Shamir challenges (sha256) run on host between device phases, matching
the generated verifiers byte-for-byte (see plonk/transcript.py).  All scalar
side-computation (linearization coefficients, public-input interpolation)
is exact host integer math.

The proof layout mirrors gnark so the marshalled blob (plonk/marshal.py) is
accepted by the on-chain verifiers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams, domain_generator
from ..fields import limbs as limbs_mod
from ..frontend.api import CompiledConstraintSystem
from ..frontend.witness import Witness, wire_values
from ..ops.field import field_ops
from ..ops.msm import msm_ctx
from ..ops.ntt import ntt_plan
from ..ops import poly as polyops
from .keys import ProvingKey
from .transcript import Transcript, hash_fr_bsb22


@dataclass
class Proof:
    """gnark-shaped PLONK proof (host affine points / canonical scalars)."""

    l_com: tuple
    r_com: tuple
    o_com: tuple
    h0: tuple
    h1: tuple
    h2: tuple
    l_at_z: int
    r_at_z: int
    o_at_z: int
    s1_at_z: int
    s2_at_z: int
    z_com: tuple
    z_omega_at_z: int
    batch_opening: tuple
    opening_z_omega: tuple
    qcp_at_z: list = field(default_factory=list)
    bsb_commitments: list = field(default_factory=list)


def _pad_to(arr, n):
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr[:n]
    return jnp.concatenate(
        [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0
    )


class Prover:
    """PLONK prover.

    ``rng``: source of blinding randomness.  Defaults to ``secrets`` (proper
    zero-knowledge hiding, matching gnark's blinded wire/Z polynomials);
    pass ``random.Random(seed)`` for deterministic test proofs or ``False``
    to disable blinding entirely.
    """

    def __init__(self, pk: ProvingKey, ccs: CompiledConstraintSystem, rng=None,
                 mesh=None, mesh_axis: str = "x"):
        self.pk = pk
        self.ccs = ccs
        # multi-chip: when a jax.sharding.Mesh is provided, every KZG commit
        # (the prover's dominant cost) runs the sharded MSM over the mesh —
        # points partitioned across chips, one collective to fold partials
        # (parallel/msm_sharded.py; SURVEY.md section 2c)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._sharded_msm_cache = {}
        # mesh NTTs: the quotient phase's coset transforms and the round-1/2
        # iNTTs run the four-step all_to_all NTT (parallel/ntt_sharded.py)
        # whenever the size shards evenly, splitting the HBM peak (the [4n]
        # coset arrays) across chips, not just the MSM flops
        self._sh_ntt_cache = {}
        self.sharded_ntt_hits = 0
        if rng is None:
            import secrets

            self._rand = lambda r: secrets.randbelow(r)
        elif rng is False:
            self._rand = lambda r: 0
        else:
            self._rand = lambda r: rng.randrange(r)
        self.curve = pk.curve
        # Fail loudly on a compat-mode mismatch: the prover derives its NTT
        # domains from the CURRENT global mode while pk bakes the mode it was
        # compiled under (e.g. a pk cached via utils/cache.py in one mode and
        # loaded in the other).  Mixing the two silently yields proofs that
        # fail verification.
        exp_omega = domain_generator(self.curve.name, pk.log_n)
        if pk.omega != exp_omega or pk.coset_shift != self.curve.coset_shift:
            from ..fields.params import gnark_compat_enabled

            raise ValueError(
                "proving key domain constants do not match the current "
                f"constants mode (gnark_compat={gnark_compat_enabled()}): "
                f"pk.omega {'==' if pk.omega == exp_omega else '!='} expected, "
                f"pk.coset_shift={pk.coset_shift} vs {self.curve.coset_shift}. "
                "Call set_gnark_compat(...) to the mode the circuit was "
                "compiled under BEFORE constructing the Prover."
            )
        # repeat proves of a circuit size skip the minutes-long jits
        # (no-op on CPU, where cache deserialization is broken — see module)
        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.f = field_ops(self.curve.fr)
        self._mark = lambda name, block_on=None: None  # set by prove()
        self.msm = msm_ctx(self.curve)
        self.plan = ntt_plan(self.curve.name, pk.log_n)
        self._plan4 = None  # built lazily: the limbs-major quotient path
        # never touches it, and its twiddle tables cost ~370 MB of HBM +
        # host table building at the 4n size (2^22 for the 2^20 prove)
        self.tr = Transcript(self.curve)
        r = self.curve.fr.modulus
        self.r = r
        n = pk.n
        self.coset_g = self.curve.coset_shift  # prover-internal coset shift
        # 1/Z_H on the 4n coset is a 4-periodic pattern; the coset X values
        # (g * w4^i) are computed on device per prove and freed before the
        # final 4n iNTT — keeping a [4n, L] array resident (370 MB at 2^20)
        # was part of the round-3 OOM
        w4 = domain_generator(self.curve.name, pk.log_n + 2)
        self.w4 = w4
        g = self.coset_g
        gn = pow(g, n, r)
        w4n = pow(w4, n, r)  # order 4
        zh_pat = [(gn * pow(w4n, i, r) - 1) % r for i in range(4)]
        inv_pat = [pow(v, -1, r) for v in zh_pat]
        # Z_H on the 4n coset is 4-periodic: store the patterns, tile at use
        self.zh_pat_ints = zh_pat
        self.inv_zh_pat_ints = inv_pat
        self.zh_pattern = self._enc(zh_pat)
        self.inv_zh_pattern = self._enc(inv_pat)
        self._bsb = []  # per-proof BSB22 state, filled by bsb_solver

    # ---------------------------------------------------------------- utils

    def _enc(self, ints):
        return jnp.asarray(limbs_mod.ints_to_mont_limbs(list(ints), self.curve.fr))

    def _enc_dev(self, ints):
        """Encode for LARGE vectors: byte-pack on host, limb-unpack +
        Montgomery multiply on device (ops/field.py encode_bytes)."""
        ints = list(ints)
        if len(ints) < 4096:
            return self._enc(ints)
        return self.f.encode_bytes(ints)

    def _dec1(self, limb_vec) -> int:
        return self.f.decode(np.asarray(limb_vec)[None])[0]

    def _commit(self, coeffs) -> tuple:
        """KZG commit (monomial basis) -> host affine int point.
        Scalar kind 'mont': digits extract on device above the host-MSM
        threshold.  With a mesh configured, the MSM shards over it."""
        if self.mesh is not None:
            return self._commit_sharded(coeffs)
        return self.msm.msm_to_affine_int(
            self.pk.srs_g1[: coeffs.shape[0]], coeffs, kind="mont"
        )

    def _commit_sharded(self, coeffs) -> tuple:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.msm import digits_from_mont_limbs, pick_window_bits
        from ..parallel.msm_sharded import sharded_msm_fn

        ops = self.msm.ops
        d = coeffs.shape[0]
        ndev = self.mesh.shape[self.mesh_axis]
        # bucket N (shards must divide evenly; nearby commit sizes share
        # one compiled step — same rationale as MsmCtx.msm_to_affine_int)
        step = max(256, 1 << max(8, d.bit_length() - 5))
        step = -(-step // ndev) * ndev
        n_b = -(-d // step) * step
        c = pick_window_bits(n_b)
        digits = digits_from_mont_limbs(self.f, coeffs, c=c)
        nw = digits.shape[0]
        if n_b > d:
            digits = jnp.concatenate(
                [digits, jnp.zeros((nw, n_b - d), jnp.int32)], axis=1
            )
        points = self.pk.srs_g1[:d]
        if n_b > d:
            points = jnp.concatenate(
                [points, jnp.zeros((n_b - d, 2, ops.L), jnp.int32)], axis=0
            )
        key = (n_b, nw, c)
        fn = self._sharded_msm_cache.get(key)
        if fn is None:
            fn = sharded_msm_fn(
                self.curve, self.mesh, self.mesh_axis, n_b, nw, c
            )
            self._sharded_msm_cache[key] = fn
        sh_p = NamedSharding(self.mesh, P(self.mesh_axis))
        sh_d = NamedSharding(self.mesh, P(None, self.mesh_axis))
        jac = fn(jax.device_put(points, sh_p), jax.device_put(digits, sh_d))
        return ops.decode_affine(ops.to_affine(jac[None]))[0]

    def _const(self, v: int):
        return self._enc([v % self.r])[0]

    @property
    def plan4(self):
        if self._plan4 is None:
            self._plan4 = ntt_plan(self.curve.name, self.pk.log_n + 2)
        return self._plan4

    def _sharded_transform(self, vec, log_sz: int, inverse: bool,
                           coset_shift: int | None):
        """Run one (i)NTT of size 2^log_sz over the mesh, or return None if
        the four-step factors don't shard evenly over the mesh axis.

        ``vec``: flat [m, L] limb array (coefficients for forward, natural-
        order evaluations for inverse), zero-padded to the transform size.
        Relayouts to/from the four-step [n2, n1] matrix convention are plain
        reshapes+transposes (under GSPMD these lower to all_to_alls when the
        operand is sharded).  Output is natural order, [2^log_sz, L]."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.ntt_sharded import sharded_ntt_fn

        n = 1 << log_sz
        ndev = self.mesh.shape[self.mesh_axis]
        n1 = 1 << (log_sz // 2)
        n2 = n // n1
        if n1 % ndev or n2 % ndev:
            return None
        key = (log_sz, inverse, coset_shift)
        fn = self._sh_ntt_cache.get(key)
        if fn is None:
            fn, _ = sharded_ntt_fn(
                self.curve.name, self.mesh, self.mesh_axis, log_sz,
                inverse=inverse, coset_shift=coset_shift,
            )
            self._sh_ntt_cache[key] = fn
        L = self.f.L
        # flat index j = j1*n2 + j2 -> matrix position [j2, j1] (both the
        # forward's coefficient input and the inverse's evaluation input use
        # this convention; outputs are natural row-major — see
        # parallel/ntt_sharded.py and tests/test_parallel.py roundtrips)
        x = _pad_to(vec, n).reshape(n1, n2, L).transpose(1, 0, 2)
        x = jax.device_put(x, NamedSharding(self.mesh, P(self.mesh_axis)))
        out = fn(x)
        self.sharded_ntt_hits += 1
        return out.reshape(n, L)

    def _intt_n(self, ev):
        """Size-n iNTT: sharded over the mesh when configured (rounds 1-3
        interpolate every wire/Z/qk vector through here)."""
        if self.mesh is not None:
            out = self._sharded_transform(
                ev, self.pk.log_n, inverse=True, coset_shift=None
            )
            if out is not None:
                return out
        return self.plan.intt(ev)

    def _blind(self, coeffs, nb: int):
        """coeffs + (b_0 + b_1 X + ... ) * (X^n - 1): hides the polynomial's
        evaluations outside H without changing them on H (zero-knowledge,
        gnark-style).  Output has n + nb coefficients."""
        r, n = self.r, self.pk.n
        bs = [self._rand(r) for _ in range(nb)]
        if all(b == 0 for b in bs):
            return coeffs
        ext = [0] * (n + nb)
        for i, b in enumerate(bs):
            ext[i] = (ext[i] - b) % r
            ext[n + i] = (ext[n + i] + b) % r
        f = self.f
        add_c = self._enc(ext)
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((nb, f.L), jnp.int32)], axis=0
        )
        return f.add(padded, add_c)

    # ------------------------------------------------------------- BSB22

    def bsb_solver(self, info, committed_values) -> int:
        """Witness-solver hook for frontend commitments: interpolate the
        committed polynomial c_i over the linking rows, KZG-commit it, and
        return hash_fr(commitment) as the commitment variable's value."""
        n, npub = self.pk.n, self.pk.nb_public
        rows = [npub + row for row in info.linking_rows]
        c_ev = jnp.zeros((n, self.f.L), jnp.int32)
        if rows:
            c_ev = c_ev.at[jnp.asarray(np.asarray(rows, np.int32))].set(
                self._enc([v % self.r for v in committed_values])
            )
        c_c = self._intt_n(c_ev)
        com = self._commit(c_c)
        self._bsb.append({"com": com, "c_c": c_c, "info": info})
        return hash_fr_bsb22(self.curve, self.tr.point(com))

    # -------------------------------------------------------- round 3 paths

    def _use_lm_quotient(self) -> bool:
        """Choose the limbs-major scrambled four-step quotient path.

        Batch-major [4n, L] arrays physically pad L -> 128 on TPU (5.8x),
        which is what OOM'd the 2^20 prove in round 3; the limbs-major path
        keeps physical ~= logical and runs the coset transforms as fused
        Pallas stage kernels (ops/ntt_pallas.py).  The XLA path remains for
        small circuits (its per-op dispatch is cheaper than Mosaic compiles
        at tiny n) and for CPU tests.  Force with AP_QUOTIENT_LM=0/1."""
        import jax
        import os

        forced = os.environ.get("AP_QUOTIENT_LM", "")
        if forced in ("0", "1"):
            return forced == "1"
        min_log = int(os.environ.get("AP_NTT_LM_MIN_LOG", "19"))
        return (
            self.pk.log_n + 2 >= min_log
            and self.mesh is None
            and jax.default_backend() == "tpu"
        )

    def _quotient_xla(self, l_c, r_c, o_c, z_c, qk_c_complete, bsb,
                      beta, gamma, alpha):
        """Round-3 quotient, batch-major XLA path: returns (h0_c, h1_c,
        h2_c) coefficient slices [n+2, L]."""
        f, r, n, pk = self.f, self.r, self.pk.n, self.pk
        plan4 = self.plan4
        k1 = self.curve.coset_shift
        k2 = k1 * k1 % r
        beta_l = self._const(beta)
        gamma_l = self._const(gamma)
        g = self.coset_g
        N4 = 4 * n

        def lift(coeffs):
            if self.mesh is not None:
                out = self._sharded_transform(
                    coeffs, self.pk.log_n + 2, inverse=False, coset_shift=g
                )
                if out is not None:
                    return out
            return plan4.coset_ntt(_pad_to(coeffs, N4), g)

        # HBM discipline (2^20 on a 16 GB chip OOM'd the all-at-once form:
        # 15 lifted polynomials at [4n, L] are ~370 MB each): lift each
        # selector just in time, accumulate, and drop the reference so the
        # buffer frees before the next lift.  Live set stays ~6 coset-wide
        # arrays plus NTT transients.
        l4, r4, o4 = lift(l_c), lift(r_c), lift(o_c)

        gate = f.mul(lift(pk.ql_c), l4)
        gate = f.add(gate, f.mul(lift(pk.qr_c), r4))
        gate = f.add(gate, f.mul(lift(pk.qm_c), f.mul(l4, r4)))
        gate = f.add(gate, f.mul(lift(pk.qo_c), o4))
        gate = f.add(gate, lift(qk_c_complete))
        for i, b in enumerate(bsb):
            gate = f.add(gate, f.mul(lift(pk.qcp_c[i]), lift(b["c_c"])))

        xs = f.mul(
            polyops.powers(f, self._const(self.w4), N4),
            jnp.broadcast_to(self._const(g), (N4, f.L)),
        )
        bl = jnp.broadcast_to(beta_l, xs.shape)
        gl = jnp.broadcast_to(gamma_l, xs.shape)
        bxs = f.mul(bl, xs)
        A = f.add(f.add(l4, bxs), gl)
        A = f.mul(A, f.add(
            f.add(r4, f.mul(bxs, jnp.broadcast_to(self._const(k1), xs.shape))),
            gl,
        ))
        A = f.mul(A, f.add(
            f.add(o4, f.mul(bxs, jnp.broadcast_to(self._const(k2), xs.shape))),
            gl,
        ))
        del bxs
        z4 = lift(z_c)
        ones = jnp.broadcast_to(f.one, xs.shape).astype(jnp.int32)
        z4m1 = f.sub(z4, ones)
        perm = f.mul(A, z4)
        del A, z4

        D = f.add(f.add(l4, f.mul(bl, lift(pk.s1_c))), gl)
        D = f.mul(D, f.add(f.add(r4, f.mul(bl, lift(pk.s2_c))), gl))
        D = f.mul(D, f.add(f.add(o4, f.mul(bl, lift(pk.s3_c))), gl))
        del l4, r4, o4, bl, gl
        # z(omega X): scale coefficients by omega^i
        zw_c = f.mul(
            z_c, polyops.powers(f, self._const(pk.omega), z_c.shape[0])
        )
        perm = f.sub(f.mul(D, lift(zw_c)), perm)
        del D, zw_c

        # L1 on the coset: (x^n - 1) / (n (x - 1)); Z_H values are a
        # 4-periodic pattern, tiled transiently (materializing them as
        # persistent [4n] state costs 2 x 370 MB at 2^20)
        zh_tiled = jnp.tile(self.zh_pattern, (n, 1))
        inv_zh_tiled = jnp.tile(self.inv_zh_pattern, (n, 1))
        # chunked batch inversion: the Montgomery trick is independent per
        # chunk; 4 chunks of n quarter the scan's transient [4n] buffers
        nconst = jnp.broadcast_to(self._const(n), (n, f.L))
        inv_parts = []
        for q in range(4):
            den_q = f.mul(
                f.sub(xs[q * n : (q + 1) * n], ones[:n]), nconst
            )
            inv_parts.append(polyops.batch_inverse_tree_jitted(f, den_q))
        L1 = f.mul(zh_tiled, jnp.concatenate(inv_parts, axis=0))
        del inv_parts, nconst, zh_tiled

        alpha_l = self._const(alpha)
        alpha2_l = self._const(alpha * alpha % r)
        num_total = f.add(
            gate,
            f.add(
                f.mul(jnp.broadcast_to(alpha_l, perm.shape), perm),
                f.mul(
                    jnp.broadcast_to(alpha2_l, L1.shape),
                    f.mul(L1, z4m1),
                ),
            ),
        )
        del gate, perm, L1, z4m1, xs, ones
        h_ev = f.mul(num_total, inv_zh_tiled)
        del num_total, inv_zh_tiled
        h_c = None
        if self.mesh is not None:
            h_c = self._sharded_transform(
                h_ev, self.pk.log_n + 2, inverse=True, coset_shift=g
            )
        if h_c is None:
            h_c = plan4.coset_intt(h_ev, g)
        del h_ev

        m = n + 2
        return h_c[:m], h_c[m : 2 * m], h_c[2 * m : 3 * m]

    def _quotient_lm(self, l_c, r_c, o_c, z_c, qk_c_complete, bsb,
                     beta, gamma, alpha):
        """Round-3 quotient, limbs-major scrambled four-step path.

        Same math as _quotient_xla; every [4n]-wide array is limbs-major
        [L, 4n] (no TPU minor-dim padding) and the coset transforms run the
        fused Pallas stage kernels (ops/ntt_pallas.py).  Evaluation-space
        data is in the four-step's scrambled order, which is transparent
        here because everything between the transforms is pointwise; the
        order-dependent inputs (coset x values, Z_H patterns) are generated
        directly in scrambled order.  Exact arithmetic -> bit-identical
        h polynomials (tests/test_plonk_e2e.py cross-checks)."""
        from ..ops.ntt_pallas import four_step_plan, lm_ops

        f, r, n, pk = self.f, self.r, self.pk.n, self.pk
        curve = self.curve
        lm = lm_ops(curve.fr)
        fsp = four_step_plan(curve.name, pk.log_n + 2)
        g = self.coset_g
        N4 = 4 * n
        k1 = curve.coset_shift
        k2 = k1 * k1 % r

        def c1(v):
            return self._const(v)  # [L] single element

        def to_lm(coeffs):
            t = jnp.asarray(coeffs).T  # [L, m] — transpose BEFORE padding
            return jnp.pad(t, ((0, 0), (0, N4 - t.shape[1])))

        def lift(coeffs):
            # donate the padded relayout buffer straight into the transform
            return fsp.ntt_scr_lm(to_lm(coeffs), coset_shift=g, donate=True)

        # HBM discipline (the 2^20 prove = 2^22-wide coset, ~370 MB per
        # [L, 4n] int32 array, OOM'd the all-at-once form): donating ops
        # reuse dead operands' buffers, the public-input inversion runs
        # while xs is already live (so xs can be freed before z4 lifts),
        # and z4 - 1 is formed at its single use by donating z4.
        #
        # sync(): bound the async in-flight window.  With every program
        # cache-hot the host enqueues the whole phase at once and the
        # runtime keeps each enqueued program's operands alive until it
        # executes — at 2^20 that transient pile-up OOM'd the SECOND
        # (warm) prove while the compile-throttled first one passed.  A
        # handful of barriers costs ~nothing (the device is busy anyway).
        import jax as _jax
        import os as _os

        # barriers + table eviction cost ~7 s of exposed dispatch gaps and
        # per-prove table rebuilds at 2^18; only the largest sizes need the
        # HBM headroom they buy
        big = self.pk.log_n + 2 >= int(
            _os.environ.get("AP_QUOTIENT_SYNC_MIN_LOG", "21")
        )

        def sync(x):
            if big:
                _jax.block_until_ready(x)
            return x

        self._mark("r3.qk+tables")
        if big:
            fsp.drop_tables(inverse=True)  # forward phase first
        l4, r4, o4 = lift(l_c), lift(r_c), lift(o_c)
        self._mark("r3.wire-lifts", o4)
        gate = lm.mul_d0(lift(pk.ql_c), l4)
        gate = lm.mul_add(gate, lift(pk.qr_c), r4)
        gate = lm.mul_add(gate, lift(pk.qm_c), lm.mul(l4, r4))
        gate = lm.mul_add(gate, lift(pk.qo_c), o4)
        gate = lm.add_d(gate, lift(qk_c_complete))
        for i, b in enumerate(bsb):
            gate = lm.mul_add(gate, lift(pk.qcp_c[i]), lift(b["c_c"]))
        sync(gate)
        self._mark("r3.gate(5 lifts+mul)", gate)

        xs = fsp.coset_x_scr(g)                    # [L, 4n], scrambled
        bxs = lm.mul_const(xs, c1(beta))
        gamma_l = c1(gamma)
        A = lm.add2(l4, bxs, gamma_l)
        A = lm.mul_d0(A, lm.add2(r4, lm.mul_const(bxs, c1(k1)), gamma_l))
        A = lm.mul_d0(A, lm.add2(o4, lm.mul_const_d0(bxs, c1(k2)), gamma_l))

        # L1 numerator inversion while xs is live: chunked batch inversion
        # (independent per chunk); chunks of <= 2^18 bound the batch-major
        # scan transients, which tile-pad L -> 128 inside the program
        n_l = c1(n)
        chunk = min(n, 1 << 18)
        inv_parts = []
        for q in range(N4 // chunk):
            den_lm = lm.mul_const_d0(
                lm.sub_one(xs[:, q * chunk : (q + 1) * chunk]), n_l
            )
            inv_parts.append(polyops.batch_inverse_tree_jitted(f, den_lm.T).T)
        del xs
        inv_all = sync(jnp.concatenate(inv_parts, axis=1))
        del inv_parts
        self._mark("r3.A+inversion", inv_all)

        z4 = lift(z_c)
        perm = lm.mul_d0(A, z4)
        del A

        D = lm.add2(l4, lm.mul_const_d0(lift(pk.s1_c), c1(beta)), gamma_l)
        D = lm.mul_d0(
            D, lm.add2(r4, lm.mul_const_d0(lift(pk.s2_c), c1(beta)), gamma_l)
        )
        D = lm.mul_d0(
            D, lm.add2(o4, lm.mul_const_d0(lift(pk.s3_c), c1(beta)), gamma_l)
        )
        del l4, r4, o4
        zw_c = f.mul(
            z_c, polyops.powers(f, self._const(pk.omega), z_c.shape[0])
        )
        perm = sync(lm.sub_d(lm.mul_d0(D, lift(zw_c)), perm))
        del D, zw_c
        self._mark("r3.perm(5 lifts)", perm)

        zh_tiled = fsp.tile_by_k_mod4(self.zh_pat_ints)
        inv_zh_tiled = fsp.tile_by_k_mod4(self.inv_zh_pat_ints)
        L1 = lm.mul_d0(lm.mul_d0(zh_tiled, inv_all), lm.sub_one_d(z4))
        del zh_tiled, inv_all, z4

        num_total = lm.add_d(
            gate,
            lm.add_d(
                lm.mul_const_d0(perm, c1(alpha)),
                lm.mul_const_d0(L1, c1(alpha * alpha % r)),
            ),
        )
        del gate, perm, L1
        h_ev = lm.mul_d0(num_total, inv_zh_tiled)
        del num_total, inv_zh_tiled
        self._mark("r3.L1+combine", h_ev)
        if big:
            sync(h_ev)
            fsp.drop_tables(inverse=False)  # done lifting; free fwd tables
        h_c = sync(fsp.intt_scr_lm(h_ev, coset_shift=g, donate=True))
        del h_ev
        self._mark("r3.4n-iNTT", h_c)

        m = n + 2
        return (
            h_c[:, :m].T, h_c[:, m : 2 * m].T, h_c[:, 2 * m : 3 * m].T
        )

    # ----------------------------------------------------------------- prove

    def prove(self, witness: Witness) -> Proof:
        import os as _os
        import sys as _sys
        import time as _time

        _prof = _os.environ.get("AP_PROVE_PROFILE", "") == "1"
        _t = [_time.perf_counter()]

        def _mark(name, block_on=None):
            if _prof:
                import jax as _jax

                if block_on is not None:
                    # per-sub-phase attribution is meaningless against the
                    # async dispatch queue; profile mode drains it at marks
                    _jax.block_until_ready(block_on)
                now = _time.perf_counter()
                mem = ""
                try:
                    st = _jax.local_devices()[0].memory_stats()
                    if st:
                        mem = (
                            f"  [hbm {st['bytes_in_use']/2**30:.2f} GiB in "
                            f"use, peak "
                            f"{st.get('peak_bytes_in_use', 0)/2**30:.2f}]"
                        )
                except Exception:
                    pass
                print(f"  prove phase {name}: {now - _t[0]:.2f}s{mem}",
                      file=_sys.stderr, flush=True)
                _t[0] = now

        # sub-phase marks inside _quotient_lm / _quotient_xla (VERDICT r4
        # item 2: attribute the 2^20 r3 wall-clock)
        self._mark = _mark

        pk, f, r, n = self.pk, self.f, self.r, self.pk.n
        curve = self.curve
        vk = pk.vk
        pub = witness.public_values
        bsb = self._bsb
        self._bsb = []
        if len(bsb) != len(self.ccs.commitments):
            raise RuntimeError(
                "BSB22 state mismatch: solve the witness through "
                "CompiledCircuit.verify (it wires bsb_solver into the solver)"
            )
        bsb_coms = [b["com"] for b in bsb]

        # ---- round 1: wire polynomials + commitments (blinded: + b(X)*Z_H)
        l_ints, r_ints, o_ints = wire_values(self.ccs, witness, n)
        l_ev, r_ev, o_ev = (
            self._enc_dev(l_ints), self._enc_dev(r_ints), self._enc_dev(o_ints)
        )
        l_c = self._blind(self._intt_n(l_ev), 2)
        r_c = self._blind(self._intt_n(r_ev), 2)
        o_c = self._blind(self._intt_n(o_ev), 2)
        l_com = self._commit(l_c)
        r_com = self._commit(r_c)
        o_com = self._commit(o_c)

        _mark("r1 wires+commits")
        gamma_d, gamma = self.tr.gamma(vk, pub, l_com, r_com, o_com)
        beta_d, beta = self.tr.beta(gamma_d)

        # ---- round 2: grand product
        k1 = curve.coset_shift
        k2 = k1 * k1 % r
        omega_pows = polyops.powers(f, self._const(pk.omega), n)
        beta_l = self._const(beta)
        gamma_l = self._const(gamma)

        def lin_term(w_ev, ids):
            return f.add(
                f.add(w_ev, f.mul(jnp.broadcast_to(beta_l, ids.shape), ids)),
                jnp.broadcast_to(gamma_l, w_ev.shape),
            )

        id1 = omega_pows
        id2 = f.mul(omega_pows, jnp.broadcast_to(self._const(k1), omega_pows.shape))
        id3 = f.mul(omega_pows, jnp.broadcast_to(self._const(k2), omega_pows.shape))
        num = f.mul(
            f.mul(lin_term(l_ev, id1), lin_term(r_ev, id2)), lin_term(o_ev, id3)
        )
        den = f.mul(
            f.mul(lin_term(l_ev, pk.s1_ev), lin_term(r_ev, pk.s2_ev)),
            lin_term(o_ev, pk.s3_ev),
        )
        ratio = f.mul(num, polyops.batch_inverse_tree_jitted(f, den))
        pp = polyops.prefix_products(f, ratio)
        one_row = jnp.broadcast_to(f.one, (1, f.L)).astype(jnp.int32)
        z_ev = jnp.concatenate([one_row, pp[:-1]], axis=0)
        z_c = self._blind(self._intt_n(z_ev), 3)
        z_com = self._commit(z_c)
        # free round-2 working set before the coset phase (HBM peak)
        del num, den, ratio, pp, z_ev, id1, id2, id3, omega_pows
        del l_ev, r_ev, o_ev

        _mark("r2 grand product")
        alpha_d, alpha = self.tr.alpha(beta_d, bsb_coms, z_com)

        # ---- round 3: quotient on the 4n coset
        # qk completion ON DEVICE: only the public rows (and BSB22
        # commitment rows — the commitment variable's value, hash_fr of the
        # point, enters like a public input at its constraint row) differ
        # from pk.qk_ev, so a tiny scatter replaces the full decode ->
        # python loop -> re-encode round trip (which cost ~39 s/prove at
        # 2^20: two 92 MB tunnel transfers + 2^20-element host bigint math)
        upd_rows = list(range(len(pub)))
        upd_vals = [p_val % r for p_val in pub]
        for b in bsb:
            info = b["info"]
            upd_rows.append(pk.nb_public + info.constraint_index)
            upd_vals.append(witness.values[info.commitment_var] % r)
        qk_ev_complete = pk.qk_ev
        if upd_rows:
            qk_ev_complete = jnp.asarray(qk_ev_complete).at[
                jnp.asarray(np.asarray(upd_rows, np.int32))
            ].set(self._enc(upd_vals))
        qk_c_complete = self._intt_n(qk_ev_complete)

        if self._use_lm_quotient():
            h0_c, h1_c, h2_c = self._quotient_lm(
                l_c, r_c, o_c, z_c, qk_c_complete, bsb, beta, gamma, alpha
            )
        else:
            h0_c, h1_c, h2_c = self._quotient_xla(
                l_c, r_c, o_c, z_c, qk_c_complete, bsb, beta, gamma, alpha
            )
        h0 = self._commit(h0_c)
        h1 = self._commit(h1_c)
        h2 = self._commit(h2_c)
        _mark("r3.H-commits x3")

        _mark("r3 quotient")
        zeta_d, zeta = self.tr.zeta(alpha_d, h0, h1, h2)

        # ---- round 4: evaluations (batched: one scan + one reduction +
        # ONE host sync for all openings at zeta)
        zl = self._const(zeta)
        evs = polyops.poly_eval_many(
            f, [l_c, r_c, o_c, pk.s1_c, pk.s2_c, *pk.qcp_c], zl
        )
        wzeta = pk.omega * zeta % r
        zw_ev = polyops.poly_eval_many(f, [z_c], self._const(wzeta))
        vals = self.f.decode(jnp.concatenate([evs, zw_ev], axis=0))
        l_z, r_z, o_z, s1_z, s2_z = vals[:5]
        qcp_z = vals[5:-1]
        zw_z = vals[-1]

        # ---- linearization polynomial
        m = n + 2
        zh_z = (pow(zeta, n, r) - 1) % r
        l1_z = zh_z * pow(n * (zeta - 1) % r, -1, r) % r
        pi = 0
        for i, p_val in enumerate(pub):
            wi = pow(pk.omega, i, r)
            li = zh_z * pow(n, -1, r) % r * wi % r * pow((zeta - wi) % r, -1, r) % r
            pi = (pi + li * p_val) % r
        for b in bsb:
            info = b["info"]
            idx = pk.nb_public + info.constraint_index
            wi = pow(pk.omega, idx, r)
            li = zh_z * pow(n, -1, r) % r * wi % r * pow((zeta - wi) % r, -1, r) % r
            pi = (pi + li * witness.values[info.commitment_var]) % r

        u = (l_z + beta * s1_z + gamma) % r
        v = (r_z + beta * s2_z + gamma) % r
        lin_at_z = (
            -(alpha * u % r * v % r * ((o_z + gamma) % r) % r * zw_z % r
              + pi - alpha * alpha % r * l1_z)
        ) % r

        s3_coef = alpha * beta % r * zw_z % r * u % r * v % r
        z_coef = (
            -(alpha * ((l_z + beta * zeta + gamma) % r) % r
              * ((r_z + beta * k1 % r * zeta + gamma) % r) % r
              * ((o_z + beta * k2 % r * zeta + gamma) % r) % r)
            + alpha * alpha % r * l1_z
        ) % r

        zeta_m = pow(zeta, m, r)  # zeta^(n+2), the H-part fold step
        mlin = n + 3              # max component degree+1 (blinded Z)
        lin = jnp.zeros((mlin, f.L), jnp.int32)

        def acc(lin_acc, coeffs, scalar):
            return f.add(
                lin_acc,
                f.mul(
                    _pad_to(coeffs, mlin),
                    jnp.broadcast_to(self._const(scalar), (mlin, f.L)),
                ),
            )

        lin = acc(lin, pk.ql_c, l_z)
        lin = acc(lin, pk.qr_c, r_z)
        lin = acc(lin, pk.qm_c, l_z * r_z % r)
        lin = acc(lin, pk.qo_c, o_z)
        lin = acc(lin, pk.qk_c, 1)
        for i, b in enumerate(bsb):
            lin = acc(lin, b["c_c"], qcp_z[i])
        lin = acc(lin, pk.s3_c, s3_coef)
        lin = acc(lin, z_c, z_coef)
        lin = acc(lin, h0_c, (-zh_z) % r)
        lin = acc(lin, h1_c, (-zh_z) % r * zeta_m % r)
        lin = acc(lin, h2_c, (-zh_z) % r * zeta_m % r * zeta_m % r)
        _mark("r4 evals+linearization")
        lin_com = self._commit(lin)

        # ---- round 5: batched opening at zeta
        fold_d, fold_r = self.tr.fold(
            zeta, lin_com, l_com, r_com, o_com, vk,
            lin_at_z, l_z, r_z, o_z, s1_z, s2_z, qcp_z, zw_z,
        )
        folded = lin
        rv = 1
        for coeffs in (l_c, r_c, o_c, pk.s1_c, pk.s2_c, *pk.qcp_c):
            rv = rv * fold_r % r
            folded = acc(folded, coeffs, rv)
        # quotients have degree < deg(folded); trim the scan's pow2 padding
        # back before committing (the SRS slice must match the digit count)
        q_coeffs, _ = polyops.kzg_quotient(f, folded, zl)
        batch_opening = self._commit(q_coeffs[:mlin])

        q2_coeffs, _ = polyops.kzg_quotient(f, z_c, self._const(wzeta))
        opening_z_omega = self._commit(q2_coeffs[:mlin])

        _mark("r5 openings")
        return Proof(
            l_com=l_com, r_com=r_com, o_com=o_com,
            h0=h0, h1=h1, h2=h2,
            l_at_z=l_z, r_at_z=r_z, o_at_z=o_z,
            s1_at_z=s1_z, s2_at_z=s2_z,
            z_com=z_com, z_omega_at_z=zw_z,
            batch_opening=batch_opening,
            opening_z_omega=opening_z_omega,
            qcp_at_z=qcp_z,
            bsb_commitments=bsb_coms,
        )
