"""End-to-end PLONK prove benchmark at 2^20 constraints (BN254).

Establishes the BASELINE.md north-star target "2^20-constraint BN254 PLONK
prove wall-clock on a TPU slice".  The circuit is a 2^20-gate squaring chain
(y = x^(2^k), x secret, y public) — every gate is a real multiplication
constraint, so the domain is a full 2^20 PLONK trace.

Prints ONE JSON line on stdout:
  {"metric": "bn254_plonk_prove_2^20_wall_s", "value": T, "unit": "s",
   "vs_baseline": 5.0 / T}

vs_baseline normalizes against ~5 s — the gnark-class multicore CPU PLONK
prover wall-clock for a 2^20 BN254 circuit (the reference publishes no prover
numbers of its own, BASELINE.md; gnark's published order of magnitude on a
modern 16-32 core x86).  >1 beats the CPU baseline.  Phase timings on stderr.

Env: BENCH_LOG_N (default 20), BENCH_PROVE_REPS (default 2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOG_N = int(os.environ.get("BENCH_LOG_N", "20"))
REPS = int(os.environ.get("BENCH_PROVE_REPS", "2"))
CURVE = os.environ.get("BENCH_CURVE", "bn254")          # bn254 | bls12_381
SETUP = os.environ.get("BENCH_SETUP", "test")           # test | ethereum
EMIT = os.environ.get("BENCH_EMIT", "0") == "1"         # run emitted verifier


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("AP_PROVE_PROFILE", "1")  # phase table on stderr
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import algoplonk_tpu as ap
    from algoplonk_tpu.frontend import witness as witness_mod
    from algoplonk_tpu.plonk.prove import Prover
    from algoplonk_tpu.plonk import verify as verify_mod

    curve = ap.BN254 if CURVE == "bn254" else ap.BLS12_381
    if SETUP == "ethereum":
        setup = ap.SetupName.ETHEREUM_KZG_CEREMONY_BLS12_381
    else:
        setup = (ap.SetupName.TEST_ONLY_BN254 if CURVE == "bn254"
                 else ap.SetupName.TEST_ONLY_BLS12_381)
    r = curve.fr.modulus
    # nb_constraints = chain + 1 (final equality gate); +2 public/secret
    # rows keep NextPow2(constraints + npub) exactly 2^LOG_N
    chain = (1 << LOG_N) - 3

    class SquareChain(ap.Circuit):
        y = ap.PublicInput()
        x = ap.SecretInput()

        def define(self, api):
            t = self.x
            for _ in range(chain):
                t = api.mul(t, t)
            api.assert_is_equal(t, self.y)

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    cc = ap.compile(SquareChain, curve, setup)
    log(f"compile+setup: {time.perf_counter() - t0:.1f}s "
        f"(n = {cc.pk.n}, constraints = {cc.ccs.nb_constraints})")
    assert cc.pk.n == 1 << LOG_N, cc.pk.n

    x = 0xA1607 % r
    y = pow(x, 1 << chain, r)
    assignment = SquareChain(x=x, y=y)

    t0 = time.perf_counter()
    prover = Prover(cc.pk, cc.ccs)
    wit = witness_mod.solve(cc.ccs, assignment,
                            commitment_solver=prover.bsb_solver)
    t_wit = time.perf_counter() - t0
    log(f"witness solve: {t_wit:.2f}s")

    log("warmup prove (compile)...")
    t0 = time.perf_counter()
    proof = prover.prove(wit)
    log(f"warmup prove: {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(REPS):
        prover = Prover(cc.pk, cc.ccs)
        wit = witness_mod.solve(cc.ccs, assignment,
                                commitment_solver=prover.bsb_solver)
        t0 = time.perf_counter()
        proof = prover.prove(wit)
        t = time.perf_counter() - t0
        times.append(t)
        log(f"rep {i}: prove {t:.2f}s")

    t0 = time.perf_counter()
    ok = verify_mod.verify(cc.vk, proof, wit.public_values)
    log(f"native verify: {time.perf_counter() - t0:.2f}s -> {ok}")
    assert ok, "proof failed native verification"

    if EMIT:
        import io

        from algoplonk_tpu.chain import algopy_mock as mock
        from algoplonk_tpu.verifier.codegen import ContractType, write_python_code

        from algoplonk_tpu.plonk.marshal import marshal_proof

        blob = marshal_proof(curve, proof)
        pibytes = wit.public_inputs_blob()
        buf = io.StringIO()
        write_python_code(cc.vk, ContractType.LOGIC_SIG, buf)
        ns = mock.exec_verifier_source(buf.getvalue())
        mock.budget.reset()
        accepted = mock.run_logicsig(ns, blob, pibytes)
        log(f"emitted logicsig verifier (offline mock): {accepted}, "
            f"budget {mock.budget.consumed()}")
        assert accepted is True

    best = min(times)
    print(
        json.dumps(
            {
                "metric": f"{CURVE}_plonk_prove_2^{LOG_N}_wall_s",
                "value": round(best, 2),
                "unit": "s",
                "vs_baseline": round(5.0 / best, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
