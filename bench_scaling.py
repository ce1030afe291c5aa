"""Virtual-mesh scaling harness for the sharded MSM (SURVEY.md section 2c /
BASELINE.md "multi-host MSM scaling efficiency").

Real multi-chip hardware is unavailable in this environment (one v5e chip
behind a tunnel), so this measures the sharded pipeline on the virtual CPU
mesh: correctness of the collectives at every mesh size, communication
volume per MSM (one [3, L] all_gather per shard — O(D) points, independent
of N), and wall-clock per mesh size.  CAVEAT printed with the table: on a
2-vCPU host the virtual devices share cores, so wall-clock here measures
overhead, not speedup — the numbers to watch are the per-shard work item
counts, which halve per doubling exactly as they would on real chips.

Usage: python bench_scaling.py   (stderr table; one JSON line on stdout)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOG_N = int(os.environ.get("SCALING_LOG_N", "15"))
MESHES = (1, 2, 4, 8)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from algoplonk_tpu.fields.params import BN254
    from algoplonk_tpu.host import fp as hfp
    from algoplonk_tpu.ops.curve import curve_ops
    from algoplonk_tpu.ops.msm import pick_window_bits, scalar_digits
    from algoplonk_tpu.parallel.msm_sharded import sharded_msm_fn

    n = 1 << LOG_N
    ops = curve_ops(BN254)
    rng = np.random.default_rng(1)

    # fixture: n copies of small multiples of G (values don't affect timing
    # of branch-free kernels; distinctness doesn't matter for scaling)
    F = hfp.GF(BN254.fp.modulus)
    base_pts = [hfp.ec_mul(F, BN254.g1, k) for k in range(1, 65)]
    pts_host = [base_pts[i % 64] for i in range(n)]
    pts = jnp.asarray(np.asarray(ops.encode_affine(pts_host)))
    scalars = [
        int.from_bytes(rng.integers(0, 256, size=31, dtype=np.uint8).tobytes(),
                       "little")
        for i in range(n)
    ]
    c = pick_window_bits(n)
    digits = jnp.asarray(scalar_digits(scalars, c=c))
    nw = digits.shape[0]

    want_scalar = sum(
        s * pow(1 + i % 64, 1, BN254.fr.modulus)
        for i, s in enumerate(scalars)
    ) % BN254.fr.modulus
    want = hfp.ec_mul(F, BN254.g1, want_scalar)

    log(f"sharded MSM scaling, N = 2^{LOG_N}, c = {c}, nw = {nw}")
    log("CAVEAT: virtual CPU mesh on a 2-vCPU host — wall-clock measures "
        "sharding overhead, not speedup; per-shard work halves per doubling")
    rows = []
    for ndev in MESHES:
        devs = jax.devices("cpu")[:ndev]
        if len(devs) < ndev:
            log(f"D={ndev}: not enough virtual devices, skipping")
            continue
        mesh = Mesh(np.array(devs), ("x",))
        fn = sharded_msm_fn(BN254, mesh, "x", n, nw, c)
        pts_sh = jax.device_put(pts, NamedSharding(mesh, P("x")))
        dig_sh = jax.device_put(digits, NamedSharding(mesh, P(None, "x")))
        t0 = time.perf_counter()
        jac = jax.block_until_ready(fn(pts_sh, dig_sh))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        jac = jax.block_until_ready(fn(pts_sh, dig_sh))
        t_run = time.perf_counter() - t0
        got = ops.decode_affine(ops.to_affine(jac[None]))[0]
        ok = got == want
        per_shard = n // ndev
        log(f"D={ndev}: run {t_run:.2f}s (compile+run {t_compile:.1f}s)  "
            f"points/shard {per_shard}  collective 1x all_gather[{ndev},3,L]"
            f"  correct={ok}")
        assert ok, f"sharded MSM wrong at D={ndev}"
        rows.append({"ndev": ndev, "run_s": round(t_run, 3),
                     "points_per_shard": per_shard})

    print(json.dumps({
        "metric": f"sharded_msm_virtual_mesh_2^{LOG_N}",
        "value": rows[-1]["run_s"] if rows else None,
        "unit": "s @ D=8 (virtual)",
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
