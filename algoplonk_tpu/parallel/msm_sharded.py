"""Multi-chip MSM: points partitioned across the mesh, Pippenger per shard,
partial results combined with one tiny collective.

This is the project's data-parallel axis (SURVEY.md section 2c): the bucket
decomposition sum_d d*B_d distributes over point shards, so each chip runs
the full local bucket pipeline (ops/msm.py) on its N/D points and the D
Jacobian partials are all-gathered over ICI and tree-added — communication
is O(D) points per MSM, independent of N.

Validated on a virtual CPU mesh (tests) and via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.params import CurveParams
from ..ops.curve import curve_ops
from ..ops.msm import WINDOW_BITS, NUM_BUCKETS


def _local_msm(curve: CurveParams, points_local, digits_local, m: int):
    """Full Pippenger on the local shard with static bucket capacity m.
    points_local: [Nl, 2, L]; digits_local: [nw, Nl] -> jac [3, L]."""
    ops = curve_ops(curve)
    nl = points_local.shape[0]
    inf_row = jnp.zeros((1, 2, ops.L), jnp.int32)
    points_pad = jnp.concatenate([points_local, inf_row], axis=0)
    nw = digits_local.shape[0]

    def window(digits_w):
        order = jnp.argsort(digits_w)
        sorted_d = digits_w[order]
        dvals = jnp.arange(1, 1 << WINDOW_BITS, dtype=jnp.int32)
        left = jnp.searchsorted(sorted_d, dvals, side="left")
        right = jnp.searchsorted(sorted_d, dvals, side="right")
        counts = right - left
        offsets = jnp.arange(m, dtype=jnp.int32)
        idx = left[:, None] + offsets[None]
        valid = offsets[None] < counts[:, None]
        gidx = jnp.where(valid, order[jnp.clip(idx, 0, nl - 1)], nl)
        jac = ops.affine_to_jac(points_pad[gidx])
        mm = m
        while mm > 1:
            half = mm // 2
            jac = ops.jac_add(jac[:, :half], jac[:, half : 2 * half])
            mm = half
        return jac[:, 0]

    buckets = jax.lax.map(window, digits_local)  # [nw, 255, 3, L]

    def suffix_body(i, acc):
        running, total = acc
        running = ops.jac_add(running, buckets[:, NUM_BUCKETS - 1 - i])
        total = ops.jac_add(total, running)
        return running, total

    init = (ops.jac_infinity((nw,)), ops.jac_infinity((nw,)))
    _, window_sums = jax.lax.fori_loop(0, NUM_BUCKETS, suffix_body, init)

    acc = ops.jac_infinity()
    for w in range(nw - 1, -1, -1):
        for _ in range(WINDOW_BITS):
            acc = ops.jac_double(acc)
        acc = ops.jac_add(acc, window_sums[w])
    return acc


def sharded_msm_fn(curve: CurveParams, mesh: Mesh, axis: str, n: int, nw: int):
    """Build a jitted sharded MSM: (points [n,2,L] sharded on dim 0,
    digits [nw, n] sharded on dim 1) -> jac [3, L] replicated."""
    ops = curve_ops(curve)
    ndev = mesh.shape[axis]
    nl = n // ndev
    assert nl * ndev == n, "n must divide the mesh axis"
    m = nl  # conservative static bucket capacity; exact for any distribution

    def step(points_local, digits_local):
        partial = _local_msm(curve, points_local, digits_local, m)
        gathered = jax.lax.all_gather(partial, axis)  # [D, 3, L]
        d = gathered.shape[0]
        acc = gathered
        while d > 1:
            half = d // 2
            acc = ops.jac_add(acc[:half], acc[half : 2 * half])
            d = half
        return acc[0]

    smapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(smapped)
