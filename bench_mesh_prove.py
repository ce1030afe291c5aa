"""Large mesh-prove demonstration (VERDICT r4 item 6 / SURVEY section 2c).

Runs ONE full PLONK prove at 2^MESH_LOG_N constraints with a
Prover(mesh=...) over an 8-virtual-device CPU mesh: every KZG commit runs
the shard_map'd MSM and every size-compatible NTT (round-1/2 iNTTs + the
quotient's four 4n coset transforms) runs the four-step all_to_all NTT.
Asserts sharded_ntt_hits > 0 and self-verifies the proof with the native
2-pairing check.  Real multi-chip hardware is unavailable in this
environment (BASELINE.md caveat); this validates that the multi-chip
program compiles, executes, and produces a VALID proof at a non-toy size —
the byte-equality-vs-sequential property is covered at n = 16 by
tests/test_parallel.py::test_sharded_prove_matches_sequential (mid tier).

Usage: python bench_mesh_prove.py     [MESH_LOG_N=16 MESH_NDEV=8]
Prints one JSON line on stdout; progress on stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOG_N = int(os.environ.get("MESH_LOG_N", "16"))
NDEV = int(os.environ.get("MESH_NDEV", "8"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={NDEV}"
        ).strip()
    import random

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")  # virtual mesh, never the TPU
    from jax.sharding import Mesh

    import algoplonk_tpu as ap
    from algoplonk_tpu.frontend import witness as witness_mod
    from algoplonk_tpu.plonk import verify as verify_mod
    from algoplonk_tpu.plonk.prove import Prover

    r = ap.BN254.fr.modulus
    chain = (1 << LOG_N) - 3

    class SquareChain(ap.Circuit):
        y = ap.PublicInput()
        x = ap.SecretInput()

        def define(self, api):
            t = self.x
            for _ in range(chain):
                t = api.mul(t, t)
            api.assert_is_equal(t, self.y)

    t0 = time.perf_counter()
    cc = ap.compile(SquareChain, ap.BN254, ap.SetupName.TEST_ONLY_BN254)
    log(f"compile+setup: {time.perf_counter() - t0:.1f}s (n = {cc.pk.n})")
    assert cc.pk.n == 1 << LOG_N

    mesh = Mesh(np.array(jax.devices()[:NDEV]), ("x",))
    x = 0xA1607 % r
    assignment = SquareChain(x=x, y=pow(x, 1 << chain, r))

    prover = Prover(cc.pk, cc.ccs, rng=random.Random(7), mesh=mesh)
    wit = witness_mod.solve(cc.ccs, assignment,
                            commitment_solver=prover.bsb_solver)
    log(f"mesh up: {NDEV} devices; proving (compile-heavy on CPU)...")
    t0 = time.perf_counter()
    proof = prover.prove(wit)
    t_prove = time.perf_counter() - t0
    log(f"mesh prove: {t_prove:.1f}s  sharded_ntt_hits = "
        f"{prover.sharded_ntt_hits}")
    assert prover.sharded_ntt_hits > 0, "no NTT actually sharded"

    t0 = time.perf_counter()
    ok = verify_mod.verify(cc.vk, proof, wit.public_values)
    log(f"native verify: {time.perf_counter() - t0:.2f}s -> {ok}")
    assert ok, "mesh proof failed verification"

    print(json.dumps({
        "metric": f"bn254_mesh_prove_2^{LOG_N}_{NDEV}dev_wall_s",
        "value": round(t_prove, 2),
        "unit": "s",
        "vs_baseline": round(prover.sharded_ntt_hits, 2),
    }))


if __name__ == "__main__":
    main()
