"""Attribute MSM scan-pipeline cost per phase at growing N.

Times jitted PREFIXES of ops/msm.py:window_sums_scan (stop_after hook) and
differences them: sort, phase-1 block reduction, phase-2 scan, phase-3
rescan, phase-4 tree.  VERDICT r4 item 1: the pipeline goes 236 ms @2^17 ->
~1.0 s @2^18 (4.2x for 2x points) — this script localizes which phase.

Usage: python bench_msm_phases.py [logNs...]   (default 17 18)
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
from algoplonk_tpu.fields.params import BLS12_381, BN254
from algoplonk_tpu.ops.curve import curve_ops

CURVE = BN254 if os.environ.get("BENCH_CURVE", "bn254") == "bn254" else BLS12_381
from algoplonk_tpu.ops.msm import (
    WINDOW_BITS, num_windows, window_sums_scan,
)

PHASES = ["sort", "p1", "p2a", "p2b", "p2", "p3", None]
NAMES = {"sort": "sort", "p1": "phase1", "p2a": "p2a", "p2b": "p2b", "p2": "phase2", "p3": "phase3",
         None: "full"}


def bench(log_n: int, use_pallas: bool, reps: int = 3):
    ops = curve_ops(CURVE)
    n = 1 << log_n
    nw = num_windows(WINDOW_BITS)
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 1 << 12, (n + 1, 2, ops.L), dtype=np.int32)
    pts[n] = 0
    digs = rng.integers(-1024, 1025, (nw, n), dtype=np.int32)
    pts_d = jax.device_put(jnp.asarray(pts))
    digs_d = jax.device_put(jnp.asarray(digs))

    results = {}
    for ph in PHASES:
        fn = jax.jit(
            lambda p, d, _ph=ph: window_sums_scan(
                ops, p, d, WINDOW_BITS, 16, use_pallas, stop_after=_ph
            )
        )
        t_c = time.perf_counter()
        out = jax.block_until_ready(fn(pts_d, digs_d))
        compile_s = time.perf_counter() - t_c
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(pts_d, digs_d))
            best = min(best, time.perf_counter() - t0)
        results[ph] = best
        print(f"  2^{log_n} {NAMES[ph]:7s} cumulative {best*1e3:9.1f} ms"
              f"   (compile {compile_s:.1f}s)", flush=True)
        del out

    # cumulative -> marginal
    marg = {}
    prev = 0.0
    for ph in PHASES:
        marg[NAMES[ph]] = results[ph] - prev
        prev = results[ph]
    print(f"  2^{log_n} marginal: " + "  ".join(
        f"{k}={v*1e3:.0f}ms" for k, v in marg.items()))
    return results[None]


if __name__ == "__main__":
    logs = [int(a) for a in sys.argv[1:]] or [17, 18]
    use_pallas = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} pallas={use_pallas}")
    totals = {}
    for ln in logs:
        totals[ln] = bench(ln, use_pallas)
    for ln in logs:
        print(f"2^{ln}: total {totals[ln]*1e3:.1f} ms "
              f"({(1 << ln) / totals[ln] / 1e3:.0f}k pts/s)")
