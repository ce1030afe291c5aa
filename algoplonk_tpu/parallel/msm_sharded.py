"""Multi-chip MSM: points partitioned across the mesh, Pippenger per shard,
partial results combined with one tiny collective.

This is the project's data-parallel axis (SURVEY.md section 2c): the bucket
decomposition sum_d d*B_d distributes over point shards, so each chip runs
the full local bucket pipeline (the same traceable kernel body as the
single-chip ops/msm.py) on its N/D points and the D projective partials are
all-gathered over ICI and folded — communication is O(D) points per MSM,
independent of N.

Validated on a virtual CPU mesh (tests) and via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

import jax.numpy as jnp

from ..fields.params import CurveParams
from ..ops.curve import curve_ops
from ..ops.msm import WINDOW_BITS, fold_windows, window_sums_scan


def _local_msm(curve: CurveParams, points_local, digits_local,
               c: int = WINDOW_BITS):
    """Full prefix-scan MSM on the local shard (static shapes — see
    ops/msm.py window_sums_scan).  points_local: [Nl, 2, L];
    digits_local: [nw, Nl] (window size c) -> projective [3, L]."""
    ops = curve_ops(curve)
    inf_row = jnp.zeros((1, 2, ops.L), jnp.int32)
    points_pad = jnp.concatenate([points_local, inf_row], axis=0)
    ws = window_sums_scan(ops, points_pad, digits_local, c)
    return fold_windows(ops, ws, c)


def sharded_msm_fn(curve: CurveParams, mesh: Mesh, axis: str, n: int, nw: int,
                   c: int = WINDOW_BITS):
    """Build a jitted sharded MSM: (points [n,2,L] sharded on dim 0,
    digits [nw, n] (window size c) sharded on dim 1) -> projective [3, L]
    replicated."""
    ops = curve_ops(curve)
    ndev = mesh.shape[axis]
    nl = n // ndev
    assert nl * ndev == n, "n must divide the mesh axis"

    def step(points_local, digits_local):
        partial = _local_msm(curve, points_local, digits_local, c)
        gathered = jax.lax.all_gather(partial, axis)  # [D, 3, L]

        def fold_body(i, acc):
            return ops.jac_add(acc, gathered[i])

        return jax.lax.fori_loop(
            0, gathered.shape[0], fold_body, ops.jac_infinity()
        )

    smapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(smapped)
