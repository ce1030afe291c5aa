"""Four-step limbs-major Pallas NTT (ops/ntt_pallas.py) vs the XLA plan.

Interpret mode on CPU (kernels run natively on TPU).  The scrambled storage
order is unscrambled with scramble_perm for the comparisons."""

import jax.numpy as jnp
import numpy as np
import pytest

from algoplonk_tpu.fields.params import CURVES
from algoplonk_tpu.ops.field import field_ops
from algoplonk_tpu.ops.ntt import ntt_plan
from algoplonk_tpu.ops.ntt_pallas import four_step_plan


def _to_lm(f, ints):
    return jnp.asarray(np.asarray(f.encode(ints)).T)


def _from_lm(f, lm):
    return f.decode(np.asarray(lm).T)


@pytest.mark.slow
@pytest.mark.parametrize("curve_name", ["bn254", "bls12_381"])
@pytest.mark.parametrize("log_n", [5, 8])
def test_four_step_matches_xla(rng, curve_name, log_n):
    curve = CURVES[curve_name]
    f = field_ops(curve.fr)
    n = 1 << log_n
    coeffs = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    fs = four_step_plan(curve_name, log_n)
    xla = ntt_plan(curve_name, log_n)
    perm = fs.scramble_perm()

    evals_scr = fs.ntt_scr_lm(_to_lm(f, coeffs))
    got = _from_lm(f, evals_scr)
    want_nat = f.decode(xla.ntt(f.encode(coeffs)))
    assert got == [want_nat[k] for k in perm]

    # inverse round-trips to the exact coefficients
    back = _from_lm(f, fs.intt_scr_lm(evals_scr))
    assert back == coeffs


def test_four_step_coset(rng):
    curve = CURVES["bn254"]
    f = field_ops(curve.fr)
    log_n, n = 6, 64
    g = curve.coset_shift
    coeffs = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    fs = four_step_plan("bn254", log_n)
    xla = ntt_plan("bn254", log_n)
    perm = fs.scramble_perm()

    evals_scr = fs.ntt_scr_lm(_to_lm(f, coeffs), coset_shift=g)
    got = _from_lm(f, evals_scr)
    want_nat = f.decode(xla.coset_ntt(f.encode(coeffs), g))
    assert got == [want_nat[k] for k in perm]

    back = _from_lm(f, fs.intt_scr_lm(evals_scr, coset_shift=g))
    assert back == coeffs


def test_scrambled_order_helpers(rng):
    """coset_x_scr and tile_by_k_mod4 agree with the scramble permutation."""
    curve = CURVES["bn254"]
    f = field_ops(curve.fr)
    r = curve.fr.modulus
    log_n = 6
    fs = four_step_plan("bn254", log_n)
    perm = fs.scramble_perm()
    g = 5
    xs = _from_lm(f, fs.coset_x_scr(g))
    for p in (0, 1, 7, 63):
        assert xs[p] == g * pow(fs.omega, int(perm[p]), r) % r
    pat = [2, 3, 5, 7]
    tiled = _from_lm(f, fs.tile_by_k_mod4(pat))
    for p in (0, 3, 17, 40):
        assert tiled[p] == pat[int(perm[p]) % 4]


def test_lm_quotient_matches_xla_bytes(monkeypatch):
    """Prover round 3 limbs-major four-step path produces byte-identical
    proofs to the batch-major XLA path (same math, different layout and
    scrambled eval order)."""
    import algoplonk_tpu as ap
    from algoplonk_tpu.frontend import witness as witness_mod
    from algoplonk_tpu.plonk import marshal as marshal_mod
    from algoplonk_tpu.plonk.prove import Prover

    class Pyth(ap.Circuit):
        a = ap.PublicInput()
        b = ap.PublicInput()
        c = ap.SecretInput()

        def define(self, api):
            api.assert_is_equal(
                api.add(api.mul(self.a, self.a), api.mul(self.b, self.b)),
                api.mul(self.c, self.c),
            )

    cc = ap.compile(Pyth, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    wit = witness_mod.solve(cc.ccs, Pyth(a=3, b=4, c=5))
    monkeypatch.setenv("AP_QUOTIENT_LM", "0")
    p_xla = Prover(cc.pk, cc.ccs, rng=False).prove(wit)
    monkeypatch.setenv("AP_QUOTIENT_LM", "1")
    p_lm = Prover(cc.pk, cc.ccs, rng=False).prove(wit)
    assert marshal_mod.marshal_proof(ap.BN254, p_xla) == \
        marshal_mod.marshal_proof(ap.BN254, p_lm)
