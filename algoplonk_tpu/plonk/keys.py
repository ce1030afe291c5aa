"""PLONK proving / verifying key structures.

The VerifyingKey carries exactly the fields the generated on-chain verifiers
consume (reference templateLogicSigBN254.go:21-72): domain size and inverse,
domain generator, coset shift, public-input count, the eight selector /
permutation commitments, BSB22 qcp commitments + constraint indexes, and the
KZG G1 generator + two G2 points.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from ..fields.params import CurveParams


@dataclass
class VerifyingKey:
    curve: CurveParams
    size: int                 # domain size n (power of two)
    size_inv: int             # 1/n mod r
    generator: int            # omega
    coset_shift: int          # k1
    nb_public: int
    ql: tuple                 # G1 affine commitments (host int tuples)
    qr: tuple
    qm: tuple
    qo: tuple
    qk: tuple                 # commitment to the *incomplete* qk
    s1: tuple
    s2: tuple
    s3: tuple
    qcp: list                 # BSB22 selector commitments
    commitment_indexes: list  # rows of commitment constraints
    kzg_g1: tuple             # [1] G1
    kzg_g2: tuple             # ([1] G2, [tau] G2)


@dataclass
class ProvingKey:
    """Device-resident proving data.

    Selector/permutation polynomials kept both in evaluation (Lagrange) and
    canonical coefficient form: evaluations feed the grand product and the
    coset quotient pipeline; coefficients feed commitments and openings.
    All arrays are [n, L] int32 Montgomery limbs.
    """

    curve: CurveParams
    n: int
    log_n: int
    omega: int
    coset_shift: int
    nb_public: int
    # evaluation-form selectors: only qk (completed with public inputs in
    # round 3) and the sigma columns are consumed by the prover; the other
    # selectors live in coefficient form only (dropping their eval forms
    # saves 4 x [n, L] of resident HBM — 370 MB at 2^20)
    qk_ev: jnp.ndarray
    s1_ev: jnp.ndarray
    s2_ev: jnp.ndarray
    s3_ev: jnp.ndarray
    # canonical coefficients
    ql_c: jnp.ndarray
    qr_c: jnp.ndarray
    qm_c: jnp.ndarray
    qo_c: jnp.ndarray
    qk_c: jnp.ndarray
    s1_c: jnp.ndarray
    s2_c: jnp.ndarray
    s3_c: jnp.ndarray
    # SRS [n+3, 2, L] device affine points (Montgomery)
    srs_g1: jnp.ndarray
    # BSB22: per-commitment qcp evaluation vectors [n, L]
    qcp_ev: list = field(default_factory=list)
    qcp_c: list = field(default_factory=list)
    vk: VerifyingKey | None = None
