"""Per-kernel throughput / roofline report @ 1 chip (BASELINE.md deliverable:
"Field-arithmetic kernels vs roofline, report per kernel").

Measures the hot kernels underneath the prover — field mul/add/batch-inverse,
Jacobian curve add, NTT, MSM — and reports achieved element throughput plus
achieved HBM traffic, against a device-bandwidth roofline (these kernels are
memory-bound on TPU: int32 limb ops have low arithmetic intensity).

Prints a human table to stderr and one JSON object per kernel to stdout.
Env: BENCH_LOG_N (default 18 field / 16 curve), BENCH_REPS (default 3),
HBM_GBPS to override the roofline bandwidth (default 819 GB/s, TPU v5e).

Run standalone (claims the TPU): python bench_kernels.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

LOG_N = int(os.environ.get("BENCH_LOG_N", "18"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
HBM_GBPS = float(os.environ.get("HBM_GBPS", "819"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args):
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, n, secs, bytes_moved):
    gbps = bytes_moved / secs / 1e9
    pct = 100.0 * gbps / HBM_GBPS
    log(
        f"{name:24s} n=2^{int(np.log2(n)):2d}  {secs*1e3:9.3f} ms  "
        f"{n/secs:14,.0f} el/s  {gbps:8.1f} GB/s  {pct:5.1f}% of HBM roofline"
    )
    print(
        json.dumps(
            {
                "kernel": name,
                "n": n,
                "seconds": round(secs, 6),
                "elements_per_sec": round(n / secs, 1),
                "achieved_gbps": round(gbps, 2),
                "pct_hbm_roofline": round(pct, 2),
            }
        ),
        flush=True,
    )


def main():
    import jax
    import jax.numpy as jnp

    from algoplonk_tpu.fields.params import BN254
    from algoplonk_tpu.fields import limbs as limbs_mod
    from algoplonk_tpu.ops.curve import curve_ops
    from algoplonk_tpu.ops.field import field_ops
    from algoplonk_tpu.ops.msm import msm_ctx, scalar_digits
    from algoplonk_tpu.ops.ntt import ntt_plan
    from algoplonk_tpu.ops import poly as polyops

    log(f"devices: {jax.devices()}  roofline: {HBM_GBPS} GB/s HBM")
    f = field_ops(BN254.fr)
    n = 1 << LOG_N
    rng = np.random.default_rng(7)
    r = BN254.fr.modulus

    vals_a = [int.from_bytes(rng.bytes(31), "big") % r for _ in range(n)]
    vals_b = [int.from_bytes(rng.bytes(31), "big") % r for _ in range(n)]
    a = jnp.asarray(limbs_mod.ints_to_mont_limbs(vals_a, BN254.fr))
    b = jnp.asarray(limbs_mod.ints_to_mont_limbs(vals_b, BN254.fr))
    el = a.shape[1] * 4  # bytes per element (int32 limbs)

    mul = jax.jit(f.mul)
    report("fr_mulmod", n, timeit(mul, a, b), 3 * n * el)
    add = jax.jit(f.add)
    report("fr_addmod", n, timeit(add, a, b), 3 * n * el)
    binv = jax.jit(lambda x: polyops.batch_inverse(f, x))
    report("fr_batch_inverse", n, timeit(binv, a), 4 * n * el)

    plan = ntt_plan(BN254.name, LOG_N)
    ntt = jax.jit(plan.ntt)
    # log2(n) stages, each streaming the array in + out
    report("fr_ntt", n, timeit(ntt, a), 2 * LOG_N * n * el)

    ops = curve_ops(BN254)
    nc = 1 << max(LOG_N - 2, 10)
    base = jnp.asarray(np.asarray(ops.encode_affine([BN254.g1] * nc)))
    bits = ops.scalar_bits_array([i + 1 for i in range(nc)], nbits=20)
    pts_j = ops.scalar_mul(base, bits)
    pts_a = ops.to_affine(pts_j)
    pel = el * BN254.fp.nbytes // BN254.fr.nbytes  # fp element bytes on device
    add_fn = jax.jit(ops.jac_add_affine)
    report(
        "g1_mixed_add", nc, timeit(add_fn, pts_j, pts_a),
        (3 + 2) * nc * 3 * pel,
    )

    ctx = msm_ctx(BN254)
    scalars = [int.from_bytes(rng.bytes(31), "big") for _ in range(nc)]
    digits = jnp.asarray(scalar_digits(scalars))
    t = timeit(lambda p, d: ctx.msm(p, d), pts_a, digits)
    report("g1_msm", nc, t, nc * (2 * pel + digits.shape[0] * 4))


if __name__ == "__main__":
    main()
