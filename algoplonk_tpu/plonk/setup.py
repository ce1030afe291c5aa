"""PLONK setup: selector/permutation polynomials + verifying key.

Equivalent of gnark's plonk.Setup invoked by the reference
(/root/reference/setup/setup.go:107,149).  Construction (gnark conventions,
as consumed by the generated verifiers):

* domain size n = NextPow2(nb_constraints + nb_public);
* rows: nb_public public-input rows (ql = -1, qk = 0 — the prover completes
  qk with the public values), then the circuit gates, then zero padding;
* permutation sigma over the 3n wire slots (cycles over slots sharing a
  variable), encoded as s_col(w^row) = k_{col'} * w^{row'} with coset ids
  (1, k1, k1^2);
* commitments are monomial-basis KZG over the SRS via the device MSM.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields.params import CurveParams, domain_generator
from ..fields import limbs as limbs_mod
from ..frontend.api import CompiledConstraintSystem
from ..ops.field import field_ops
from ..ops.msm import msm_ctx, scalar_digits
from ..ops.ntt import ntt_plan
from ..ops.curve import curve_ops
from ..setups.registry import SRS, next_power_of_two
from .keys import ProvingKey, VerifyingKey


def _commit(curve: CurveParams, srs_dev, coeffs_limbs) -> tuple:
    """KZG commit to Montgomery-limb coefficients -> host affine int tuple.
    Scalar kind 'mont': digits extract on device above the host-MSM
    threshold (no host int round trip)."""
    ctx = msm_ctx(curve)
    return ctx.msm_to_affine_int(
        srs_dev[: coeffs_limbs.shape[0]], coeffs_limbs, kind="mont"
    )


def setup(ccs: CompiledConstraintSystem, srs: SRS) -> tuple[ProvingKey, VerifyingKey]:
    curve = ccs.curve
    r = curve.fr.modulus
    npub = ccs.nb_public
    n = next_power_of_two(ccs.nb_constraints + npub)
    log_n = n.bit_length() - 1
    omega = domain_generator(curve.name, log_n)
    k1 = curve.coset_shift
    k2 = k1 * k1 % r

    if srs.g1_count < n + 3:
        raise ValueError(
            f"SRS too small: need {n + 3} G1 points, have {srs.g1_count}"
        )

    # ------------------------------------------------------ selector vectors
    ql = [0] * n
    qr = [0] * n
    qm = [0] * n
    qo = [0] * n
    qk = [0] * n
    commitment_rows = {c.constraint_index: i for i, c in enumerate(ccs.commitments)}
    for i in range(npub):
        ql[i] = r - 1
    for j, g in enumerate(ccs.gates):
        row = npub + j
        ql[row], qr[row], qm[row], qo[row] = g.ql, g.qr, g.qm, g.qo
        qk[row] = 0 if j in commitment_rows else g.qc

    # BSB22 qcp selectors: indicator of the linking rows, where the committed
    # polynomial c_i carries each committed wire's value
    # (gate: -w + qcp_i * c_i = 0; see frontend.API.commit).
    qcp_vecs = []
    for c in ccs.commitments:
        v = [0] * n
        for row in c.linking_rows:
            v[npub + row] = 1
        qcp_vecs.append(v)

    # ------------------------------------------------------- wire slot table
    # slot (col, row) -> variable id (or -1 for padding)
    slots = np.full((3, n), -1, dtype=np.int64)
    for i in range(npub):
        slots[0, i] = i
        slots[1, i] = i
        slots[2, i] = i
    for j, g in enumerate(ccs.gates):
        row = npub + j
        slots[0, row] = g.l
        slots[1, row] = g.r
        slots[2, row] = g.o

    # ------------------------------------------------------------ sigma
    var_slots: dict[int, list[tuple[int, int]]] = {}
    for col in range(3):
        for row in range(n):
            v = slots[col, row]
            if v >= 0:
                var_slots.setdefault(int(v), []).append((col, row))

    sigma_col = np.tile(np.arange(3)[:, None], (1, n))
    sigma_row = np.tile(np.arange(n)[None, :], (3, 1))
    for slist in var_slots.values():
        m = len(slist)
        for t, (col, row) in enumerate(slist):
            ncol, nrow = slist[(t + 1) % m]
            sigma_col[col, row] = ncol
            sigma_row[col, row] = nrow

    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % r
    ks = [1, k1, k2]
    s_vecs = []
    for col in range(3):
        s_vecs.append(
            [ks[sigma_col[col, row]] * omega_pows[sigma_row[col, row]] % r
             for row in range(n)]
        )

    # --------------------------------------------------- device conversions
    f = field_ops(curve.fr)
    plan = ntt_plan(curve.name, log_n)

    def to_dev(ints):
        return jnp.asarray(limbs_mod.ints_to_mont_limbs(ints, curve.fr))

    evs = {}
    coeffs = {}
    for name, vec in [
        ("ql", ql), ("qr", qr), ("qm", qm), ("qo", qo), ("qk", qk),
        ("s1", s_vecs[0]), ("s2", s_vecs[1]), ("s3", s_vecs[2]),
    ]:
        ev = to_dev(vec)
        evs[name] = ev
        coeffs[name] = plan.intt(ev)

    qcp_ev, qcp_c = [], []
    for v in qcp_vecs:
        ev = to_dev(v)
        qcp_ev.append(ev)
        qcp_c.append(plan.intt(ev))

    # SRS on device
    if srs.g1_limbs is not None:
        srs_dev = jnp.asarray(srs.g1_limbs[: n + 3])
    else:
        cops = curve_ops(curve)
        srs_dev = cops.encode_affine(srs.g1[: n + 3])

    # ----------------------------------------------------------- commitments
    coms = {}
    for name in ("ql", "qr", "qm", "qo", "qk", "s1", "s2", "s3"):
        coms[name] = _commit(curve, srs_dev, coeffs[name])
    qcp_coms = [_commit(curve, srs_dev, c) for c in qcp_c]

    vk = VerifyingKey(
        curve=curve,
        size=n,
        size_inv=pow(n, -1, r),
        generator=omega,
        coset_shift=k1,
        nb_public=npub,
        ql=coms["ql"], qr=coms["qr"], qm=coms["qm"], qo=coms["qo"],
        qk=coms["qk"], s1=coms["s1"], s2=coms["s2"], s3=coms["s3"],
        qcp=qcp_coms,
        commitment_indexes=[c.constraint_index for c in ccs.commitments],
        kzg_g1=srs.vk_g1,
        kzg_g2=srs.vk_g2,
    )
    pk = ProvingKey(
        curve=curve,
        n=n,
        log_n=log_n,
        omega=omega,
        coset_shift=k1,
        nb_public=npub,
        qk_ev=evs["qk"],
        s1_ev=evs["s1"], s2_ev=evs["s2"], s3_ev=evs["s3"],
        ql_c=coeffs["ql"], qr_c=coeffs["qr"], qm_c=coeffs["qm"],
        qo_c=coeffs["qo"], qk_c=coeffs["qk"],
        s1_c=coeffs["s1"], s2_c=coeffs["s2"], s3_c=coeffs["s3"],
        srs_g1=srs_dev,
        qcp_ev=qcp_ev,
        qcp_c=qcp_c,
        vk=vk,
    )
    return pk, vk
