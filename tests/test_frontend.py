"""Frontend API unit tests — solve-level (no proving), covering the gnark
api surface the reference's circuits can use (reference algoplonk.go:50 via
gnark frontend.API): arithmetic, booleans, comparisons, lookups, asserts.
"""

import pytest

import algoplonk_tpu as ap
from algoplonk_tpu.frontend.api import compile_circuit
from algoplonk_tpu.frontend.witness import solve

R = ap.BN254.fr.modulus


def run(circuit_cls, **values):
    ccs = compile_circuit(circuit_cls, ap.BN254)
    return ccs, solve(ccs, circuit_cls(**values))


def out_value(ccs, w, var):
    return w.values[var.idx]


def test_arith_ops():
    captured = {}

    class C(ap.Circuit):
        a = ap.PublicInput()
        b = ap.SecretInput()

        def define(self, api):
            captured["sum"] = api.add(self.a, self.b, 7)
            captured["dif"] = api.sub(self.a, self.b)
            captured["prd"] = api.mul(self.a, self.b, 3)
            captured["quo"] = api.div(self.a, self.b)
            captured["inv"] = api.inverse(self.b)
            captured["acc"] = api.mul_acc(captured["sum"], self.a, self.b)
            captured["acc_c"] = api.mul_acc(5, self.a, self.b)
            captured["neg"] = api.neg(self.a)

    ccs, w = run(C, a=10, b=4)
    assert out_value(ccs, w, captured["sum"]) == 21
    assert out_value(ccs, w, captured["dif"]) == 6
    assert out_value(ccs, w, captured["prd"]) == 120
    assert out_value(ccs, w, captured["quo"]) == 10 * pow(4, -1, R) % R
    assert out_value(ccs, w, captured["inv"]) == pow(4, -1, R)
    assert out_value(ccs, w, captured["acc"]) == 61
    assert out_value(ccs, w, captured["acc_c"]) == 45
    assert out_value(ccs, w, captured["neg"]) == R - 10


def test_bool_and_select():
    captured = {}

    class C(ap.Circuit):
        x = ap.PublicInput()
        y = ap.SecretInput()

        def define(self, api):
            api.assert_is_boolean(self.x)
            api.assert_is_boolean(self.y)
            captured["xor"] = api.xor(self.x, self.y)
            captured["and"] = api.and_(self.x, self.y)
            captured["or"] = api.or_(self.x, self.y)
            captured["sel"] = api.select(self.x, 11, 22)
            captured["isz"] = api.is_zero(self.y)

    for x, y in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        ccs, w = run(C, x=x, y=y)
        assert out_value(ccs, w, captured["xor"]) == x ^ y
        v_and = captured["and"]
        got_and = v_and if not hasattr(v_and, "idx") else out_value(ccs, w, v_and)
        assert got_and == (x & y)
        assert out_value(ccs, w, captured["or"]) == (x | y)
        assert out_value(ccs, w, captured["sel"]) == (11 if x else 22)
        got_isz = captured["isz"]
        if hasattr(got_isz, "idx"):
            got_isz = out_value(ccs, w, got_isz)
        assert got_isz == (1 if y == 0 else 0)

    with pytest.raises(ValueError, match="not satisfied"):
        run(C, x=2, y=0)


def test_lookup2():
    captured = {}
    table = [17, 23, 31, 47]

    class C(ap.Circuit):
        b0 = ap.PublicInput()
        b1 = ap.PublicInput()

        def define(self, api):
            api.assert_is_boolean(self.b0)
            api.assert_is_boolean(self.b1)
            captured["out"] = api.lookup2(self.b0, self.b1, *table)

    for b0 in (0, 1):
        for b1 in (0, 1):
            ccs, w = run(C, b0=b0, b1=b1)
            assert out_value(ccs, w, captured["out"]) == table[b1 * 2 + b0]


def test_cmp():
    captured = {}

    class C(ap.Circuit):
        a = ap.PublicInput()
        b = ap.SecretInput()

        def define(self, api):
            captured["c"] = api.cmp(self.a, self.b, nbits=16)

    cases = [(5, 3, 1), (3, 5, R - 1), (7, 7, 0), (0, 65535, R - 1),
             (65535, 0, 1)]
    for a, b, want in cases:
        ccs, w = run(C, a=a, b=b)
        assert out_value(ccs, w, captured["c"]) == want, (a, b)


def test_assert_is_less_or_equal():
    class C(ap.Circuit):
        v = ap.SecretInput()

        def define(self, api):
            api.assert_is_less_or_equal(self.v, 100)

    run(C, v=0)
    run(C, v=100)
    run(C, v=55)
    with pytest.raises(ValueError, match="not satisfied"):
        run(C, v=101)
    with pytest.raises(ValueError, match="not satisfied"):
        run(C, v=R - 1)  # wraparound must not pass


def test_assert_is_less_or_equal_variable_bound():
    class C(ap.Circuit):
        v = ap.SecretInput()
        bound = ap.PublicInput()

        def define(self, api):
            api.assert_is_less_or_equal(self.v, self.bound)

    run(C, v=5, bound=9)
    run(C, v=9, bound=9)
    with pytest.raises(ValueError, match="not satisfied"):
        run(C, v=10, bound=9)


def test_to_from_binary_roundtrip():
    captured = {}

    class C(ap.Circuit):
        a = ap.PublicInput()

        def define(self, api):
            bits = api.to_binary(self.a, 10)
            captured["back"] = api.from_binary(bits)

    ccs, w = run(C, a=777)
    assert out_value(ccs, w, captured["back"]) == 777
    with pytest.raises(ValueError, match="not satisfied"):
        run(C, a=1024)  # does not fit in 10 bits


def test_assert_is_different():
    class C(ap.Circuit):
        a = ap.PublicInput()
        b = ap.SecretInput()

        def define(self, api):
            api.assert_is_different(self.a, self.b)

    run(C, a=1, b=2)
    with pytest.raises(Exception):
        run(C, a=2, b=2)  # inverse of zero fails during solving


def test_compile_constant_folding():
    class C(ap.Circuit):
        a = ap.PublicInput()

        def define(self, api):
            x = api.add(3, 4)          # pure consts fold
            assert x == 7
            y = api.mul(x, 2)
            assert y == 14
            api.assert_is_equal(api.mul(self.a, 0), 0)

    run(C, a=123)
